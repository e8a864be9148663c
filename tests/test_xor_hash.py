"""XOR-hash counting/sampling tests (reference Unigen/approxmc slots)."""

import numpy as np
import pytest

from diffusionsat_tpu.sat.solvers import enumerate_models
from diffusionsat_tpu.sat.xor_hash import (
    HashUniformSampler,
    approx_count,
    random_xors,
    xor_to_cnf,
)


def _brute_solutions(clauses, n_vars):
    out = []
    for bits in range(1 << n_vars):
        a = [(bits >> i) & 1 for i in range(n_vars)]
        ok = all(any((a[abs(l) - 1] == 1) == (l > 0) for l in c)
                 for c in clauses)
        if ok:
            out.append(tuple(a))
    return out


def test_xor_to_cnf_bruteforce():
    rng = np.random.default_rng(0)
    for trial in range(20):
        n = int(rng.integers(1, 6))
        k = int(rng.integers(0, n + 1))
        var_ids = (rng.choice(n, size=k, replace=False) + 1).tolist()
        parity = int(rng.integers(0, 2))
        clauses, next_aux = xor_to_cnf(var_ids, parity, n + 1)
        if not var_ids and parity == 1:
            # falsified constraint: encoded CNF must be UNSAT
            models, complete = enumerate_models(clauses, next_aux - 1, 64)
            assert complete and len(models) == 0
            continue
        models, complete = enumerate_models(clauses, next_aux - 1,
                                            max_models=1 << (n + 2))
        assert complete
        got = {tuple(m[:n]) for m in models}
        want = {tuple((b >> i) & 1 for i in range(n))
                for b in range(1 << n)
                if sum((b >> (v - 1)) & 1 for v in var_ids) % 2 == parity}
        assert got == want, (var_ids, parity)


def test_xor_aux_vars_are_determined():
    # every original model extends to exactly one extended model
    clauses = [[1, 2, 3], [-1, -2], [2, 3]]
    n = 3
    xors = [([1, 2, 3], 1), ([1, 3], 0)]
    ext = [list(c) for c in clauses]
    next_aux = n + 1
    for v, p in xors:
        xc, next_aux = xor_to_cnf(v, p, next_aux)
        ext += xc
    models, complete = enumerate_models(ext, next_aux - 1, 256)
    assert complete
    projected = [tuple(m[:n]) for m in models]
    assert len(projected) == len(set(projected))


def test_approx_count_exact_small():
    clauses = [[1, 2], [-1, -2]]  # XOR: 2 models
    res = approx_count(clauses, 2, seed=0)
    assert res.exact and res.count == 2


def test_approx_count_large_space():
    # 24 free variables + 1 constrained pair: count = 3 * 2^22 = 12582912.
    # Exact enumeration is hopeless at the pivot budget; the XOR-hash
    # estimate must land within a small factor of truth.
    n = 24
    clauses = [[1, 2], [-1, -2, 3]]
    true = 0
    for a in range(8):  # brute-force the 3 constrained vars
        bits = [(a >> i) & 1 for i in range(3)]
        ok = all(any((bits[abs(l) - 1] == 1) == (l > 0) for l in c)
                 for c in clauses)
        true += (1 << (n - 3)) if ok else 0
    res = approx_count(clauses, n, epsilon=0.8, seed=3)
    assert not res.exact
    assert true / 3 <= res.count <= true * 3, (res.count, true)


def test_hash_sampler_covers_and_is_sat():
    rng = np.random.default_rng(1)
    # random 3-SAT with many solutions: 14 vars, few clauses
    n = 14
    clauses = []
    for _ in range(12):
        vs = rng.choice(n, size=3, replace=False) + 1
        clauses.append([int(v) if rng.random() < 0.5 else -int(v)
                        for v in vs])
    sols = set(_brute_solutions(clauses, n))
    assert len(sols) > 200
    sampler = HashUniformSampler(cell_target=24, seed=5)
    bits = sampler.sample_bits(clauses, n, 150)
    assert bits is not None and len(bits) == 150
    seen = set()
    for row in bits:
        t = tuple(int(x) for x in row)
        assert t in sols  # every sample satisfies the formula
        seen.add(t)
    assert len(seen) > 60  # diverse, not mode-collapsed


def test_hash_sampler_near_uniform_chi2():
    """Distribution check on a formula with a known moderate model set,
    forced through the XOR-hash path (cell_target < count)."""
    from diffusionsat_tpu.utils.chi_square import chi_square_likelihood

    rng = np.random.default_rng(2)
    n = 10
    clauses = []
    for _ in range(9):
        vs = rng.choice(n, size=3, replace=False) + 1
        clauses.append([int(v) if rng.random() < 0.5 else -int(v)
                        for v in vs])
    sols = _brute_solutions(clauses, n)
    S = len(sols)
    assert 80 < S < 600
    n_samples = 12 * S
    sampler = HashUniformSampler(cell_target=16, seed=11)
    bits = sampler.sample_bits(clauses, n, n_samples)
    counts = {}
    for row in bits:
        t = tuple(int(x) for x in row)
        counts[t] = counts.get(t, 0) + 1
    # coverage: near-uniform sampling at 12x oversampling should see
    # the large majority of solutions
    assert len(counts) > 0.7 * S
    # chi-square statistic vs uniform must be far below the CDCL
    # fallback's (which concentrates on solver-preferred models);
    # normalized chi2/cells for a uniform sampler ~ 1, allow slack
    exp = n_samples / S
    chi2 = sum((counts.get(tuple(s), 0) - exp) ** 2 / exp for s in sols)
    assert chi2 / S < 6.0, chi2 / S