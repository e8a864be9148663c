"""Golden tests of the SAT losses vs straightforward dense evaluation
(reference loss/sat.py math re-derived independently)."""

import numpy as np
import pytest

import jax.numpy as jnp

from diffusionsat_tpu.graph.batch import BucketSpec, build_batch
from diffusionsat_tpu.losses.sat import (
    is_batch_sat,
    is_graph_sat,
    sigmoid_log_loss,
    softplus_loss,
    softplus_mixed_loss,
    unsat_clause_count,
)

BUCKET = BucketSpec(max_vars=64, max_clauses=128, max_edges=512, max_graphs=4)


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def softplus(x):
    return np.logaddexp(0.0, x)


def make_batch(formulas, sols=None):
    return build_batch(formulas, BUCKET, solutions=sols)


@pytest.mark.parametrize("seed", range(3))
def test_softplus_loss_matches_reference_math(seed):
    rng = np.random.default_rng(seed)
    n, m = 8, 20
    clauses = []
    for _ in range(m):
        vs = rng.choice(n, size=3, replace=False) + 1
        clauses.append([int(v) if rng.random() < 0.5 else -int(v) for v in vs])
    batch = make_batch([(n, clauses)])
    K = 4
    logits = rng.normal(size=(n, K)).astype(np.float32)
    logits_padded = np.zeros((batch.V, K), np.float32)
    logits_padded[:n] = logits

    got = np.asarray(softplus_loss(jnp.asarray(logits_padded), batch))

    # dense: per clause exp(-sum softplus(lit-signed logits))
    want = np.zeros((m, K), np.float32)
    for ci, clause in enumerate(clauses):
        s = np.zeros(K, np.float32)
        for lit in clause:
            v = abs(lit) - 1
            s += softplus(logits[v] if lit > 0 else -logits[v])
        want[ci] = np.exp(-s)
    np.testing.assert_allclose(got[:m], want, rtol=5e-4, atol=1e-6)
    # padded clauses contribute exactly zero
    assert np.abs(got[m:]).max() == 0.0

    # mixed loss identity
    got_mixed = np.asarray(softplus_mixed_loss(jnp.asarray(logits_padded),
                                               batch))[:m]
    want_mixed = want * -(np.log(1 - want + 1e-8) - np.log(1 + 1e-8))
    np.testing.assert_allclose(got_mixed, want_mixed, rtol=5e-4, atol=1e-6)


def test_sigmoid_log_loss_matches_product_form():
    rng = np.random.default_rng(0)
    n = 6
    clauses = [[1, -2, 3], [-4, 5], [2, 6]]
    batch = make_batch([(n, clauses)])
    logits = rng.normal(size=(n, 1)).astype(np.float32)
    lp = np.zeros((batch.V, 1), np.float32)
    lp[:n] = logits
    got = np.asarray(sigmoid_log_loss(jnp.asarray(lp), batch))[:len(clauses)]
    p = sigmoid(logits[:, 0])
    for ci, clause in enumerate(clauses):
        prod = 1.0
        for lit in clause:
            v = abs(lit) - 1
            prod *= (1 - p[v]) if lit > 0 else p[v]
        want = -(np.log(1 - prod + 1e-8) - np.log(1 + 1e-8))
        np.testing.assert_allclose(got[ci, 0], want, rtol=5e-4, atol=1e-6)


def test_unsat_clause_count():
    clauses = [[1, 2], [-1, -2], [1, -2]]
    batch = make_batch([(2, clauses)])
    # assignment (T, T): clause 2 unsat, clause 3 sat via 1
    logits = np.zeros((batch.V, 1), np.float32)
    logits[:2] = 5.0
    got = float(unsat_clause_count(jnp.asarray(logits), batch))
    assert got == 1.0


def test_is_batch_sat_and_graph_sat():
    f1 = (2, [[1, 2], [-1, -2]])   # satisfied by (T,F)
    f2 = (2, [[1], [-1]])          # unsat
    batch = make_batch([f1, f2])
    logits = np.zeros((batch.V, 1), np.float32)
    logits[0] = 5.0   # f1 var1 = T
    logits[1] = -5.0  # f1 var2 = F
    logits[2] = 5.0
    logits[3] = 5.0
    assert float(is_batch_sat(jnp.asarray(logits), batch)) == 0.0
    gs = np.asarray(is_graph_sat(jnp.asarray(logits), batch))
    assert gs[0, 0] == 1.0 and gs[1, 0] == 0.0
    assert np.abs(gs[2:]).max() == 0.0  # padded graphs

    # make both sat: drop f2's contradiction by flipping to sat formula
    batch2 = make_batch([f1, (2, [[1], [1, 2]])])
    assert float(is_batch_sat(jnp.asarray(logits), batch2)) == 1.0
