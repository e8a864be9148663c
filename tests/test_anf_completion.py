"""ANF->CNF residual encoding (anf_error_structure.py): substitution,
AND-aux Tseitin, XOR chains, and CDCL completion round-trip."""

import numpy as np

from diffusionsat_tpu.sat.anf_completion import (
    encode_residual_cnf,
    eval_equations,
    free_inputs_of,
    input_anchored_complete,
)
from diffusionsat_tpu.sat.solvers import enumerate_models, solve


def brute_force_models(eqs, n_vars):
    out = []
    for m in range(1 << n_vars):
        bits = np.array([(m >> i) & 1 for i in range(n_vars)], dtype=np.int8)
        if (eval_equations(eqs, bits) == 1).all():
            out.append(tuple(bits))
    return set(out)


def cnf_models_projected(eqs, fixed, released, n_vars):
    enc = encode_residual_cnf(eqs, fixed, released)
    if enc is None:
        return None
    clauses, ncnf, var2cnf = enc
    models, complete = enumerate_models(clauses, ncnf, max_models=10_000)
    assert complete
    out = set()
    for m in models:
        bits = np.zeros(n_vars, dtype=np.int8)
        for v, b in fixed.items():
            bits[v] = b
        for v, c in var2cnf.items():
            bits[v] = int(m[c - 1])
        out.add(tuple(bits))
    return out


def test_encoding_equals_brute_force_full_release():
    # system over 4 vars: x0 ^ x1 ^ (x2&x3) = 0 ; 1 ^ x2 = 0 ; x3 = 0
    eqs = [(0, [("v", 0), ("v", 1), ("a", 2, 3)]),
           (1, [("v", 2)]),
           (0, [("v", 3)])]
    want = brute_force_models(eqs, 4)
    got = cnf_models_projected(eqs, {}, [0, 1, 2, 3], 4)
    assert got == want and len(want) > 0


def test_encoding_with_substitution():
    eqs = [(0, [("v", 0), ("v", 1), ("a", 1, 2)]),
           (1, [("v", 2), ("a", 0, 1)])]
    full = brute_force_models(eqs, 3)
    # fix x1 = 1: projected models must be exactly the full models with
    # x1 == 1
    got = cnf_models_projected(eqs, {1: 1}, [0, 2], 3)
    want = {m for m in full if m[1] == 1}
    assert got == want


def test_inconsistent_fixing_detected():
    eqs = [(1, [("v", 0)])]          # x0 = 1
    assert encode_residual_cnf(eqs, {0: 0}, []) is None


def test_duplicate_terms_cancel():
    # x0 ^ x0 ^ x1 = 0 reduces to x1 = 0
    eqs = [(0, [("v", 0), ("v", 0), ("v", 1)])]
    got = cnf_models_projected(eqs, {}, [0, 1], 2)
    assert got == {(0, 0), (1, 0)}


def test_free_input_identification_and_anchor():
    # feed-forward circuit: inputs 0,1; gates 2..5 defined from earlier
    rng = np.random.default_rng(11)
    truth = rng.integers(0, 2, size=6).astype(np.int8)
    eqs = []
    for j in range(2, 6):
        a, b = int(rng.integers(0, j)), int(rng.integers(0, j))
        parity = int(truth[j] ^ truth[a] ^ (truth[a] & truth[b]))
        eqs.append((parity, [("v", j), ("v", a), ("a", a, b)]))
    # output constraints pin every gate to its truth value
    for j in range(2, 6):
        eqs.append((int(truth[j]), [("v", j)]))
    vids = np.arange(6)
    assert free_inputs_of(eqs, vids) == [0, 1]

    # anchor with correct input predictions -> solved at release 0
    conf = np.ones(6)
    solved, spec, bits = input_anchored_complete(
        eqs, vids, truth, conf, ladder=(0, 2))
    assert solved and spec == 0
    # anchor with BOTH inputs wrong but low-confidence -> release-2 rung
    # must recover (it re-searches the inputs)
    pred = truth.copy()
    pred[0] ^= 1
    pred[1] ^= 1
    conf = np.ones(6)
    conf[0] = conf[1] = 0.01
    solved2, spec2, _ = input_anchored_complete(
        eqs, vids, pred, conf, ladder=(0, 2))
    assert solved2 and spec2 == 2


def test_completion_round_trip_random_systems():
    rng = np.random.default_rng(7)
    for trial in range(5):
        n = 8
        # random feed-forward circuit: var j>=2 defined from earlier vars
        eqs = []
        truth = rng.integers(0, 2, size=n).astype(np.int8)
        for j in range(2, n):
            a, b = rng.integers(0, j, size=2)
            parity = int(truth[j] ^ truth[a] ^ (truth[a] & truth[b]))
            eqs.append((parity, [("v", int(j)), ("v", int(a)),
                                 ("a", int(a), int(b))]))
        # fix the two inputs to the truth, CDCL the rest
        enc = encode_residual_cnf(eqs, {0: int(truth[0]), 1: int(truth[1])},
                                  list(range(2, n)))
        clauses, ncnf, var2cnf = enc
        sat, model = solve(clauses, ncnf)
        assert sat
        bits = np.array(truth)
        for v, c in var2cnf.items():
            bits[v] = 1 if model[c - 1] > 0 else 0
        assert (eval_equations(eqs, bits) == 1).all()
