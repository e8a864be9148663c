"""Property tests: edge-list graph ops vs dense incidence-matrix math.

Implements SURVEY.md §4's prescription: our segment-op "SpMM" must equal a
dense einsum with the literal-clause incidence matrix on random formulas,
including padding neutrality.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from diffusionsat_tpu.graph.batch import BucketSpec, SatBatch, build_batch
from diffusionsat_tpu.ops.graph_ops import (
    clause_degrees,
    clause_segment_sum,
    clause_to_lit,
    graph_gather_vars,
    lit_to_clause,
    literal_degrees,
    var_segment_sum,
)

BUCKET = BucketSpec(max_vars=128, max_clauses=256, max_edges=1024,
                    max_graphs=8)


def random_formulas(rng, n_formulas=3, max_vars=10):
    formulas = []
    for _ in range(n_formulas):
        n = rng.integers(3, max_vars + 1)
        m = int(4.0 * n)
        clauses = []
        for _ in range(m):
            k = int(rng.integers(1, 4))
            vs = rng.choice(n, size=min(k, n), replace=False) + 1
            clauses.append([int(v) if rng.random() < 0.5 else -int(v)
                            for v in vs])
        formulas.append((int(n), clauses))
    return formulas


def dense_incidence(batch: SatBatch) -> np.ndarray:
    """[2V, C] dense literal-clause incidence from the edge lists."""
    A = np.zeros((2 * batch.V, batch.C), dtype=np.float32)
    el = np.asarray(batch.edge_lit_c)
    ec = np.asarray(batch.edge_clause_c)
    em = np.asarray(batch.edge_mask_c)
    for l, c, m in zip(el, ec, em):
        if m > 0:
            A[l, c] += 1.0
    return A


@pytest.mark.parametrize("seed", range(3))
def test_lit_clause_spmm_matches_dense(seed):
    rng = np.random.default_rng(seed)
    formulas = random_formulas(rng)
    batch = build_batch(formulas, BUCKET)
    A = dense_incidence(batch)

    F = 7
    lit_feats = rng.normal(size=(2 * batch.V, F)).astype(np.float32)
    clause_feats = rng.normal(size=(batch.C, F)).astype(np.float32)

    got = np.asarray(lit_to_clause(batch, jnp.asarray(lit_feats)))
    want = A.T @ lit_feats
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    got = np.asarray(clause_to_lit(batch, jnp.asarray(clause_feats)))
    want = A @ clause_feats
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_degrees_match_dense():
    rng = np.random.default_rng(0)
    batch = build_batch(random_formulas(rng), BUCKET)
    A = dense_incidence(batch)
    np.testing.assert_allclose(
        np.asarray(literal_degrees(batch))[:, 0], A.sum(1), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(clause_degrees(batch))[:, 0], A.sum(0), atol=1e-6)


def test_graph_segments():
    rng = np.random.default_rng(1)
    formulas = random_formulas(rng, n_formulas=4)
    batch = build_batch(formulas, BUCKET)
    F = 3
    x = rng.normal(size=(batch.V, F)).astype(np.float32)
    x_masked = x * np.asarray(batch.var_mask)[:, None]
    got = np.asarray(var_segment_sum(batch, jnp.asarray(x_masked)))
    # manual per-graph sums
    vg = np.asarray(batch.var_graph)
    for g in range(len(formulas)):
        np.testing.assert_allclose(got[g], x_masked[vg == g].sum(0),
                                   rtol=1e-5, atol=1e-5)
    # padded graphs are zero
    assert np.abs(got[len(formulas):]).max() == 0

    # gather roundtrip
    gf = rng.normal(size=(batch.G, F)).astype(np.float32)
    back = np.asarray(graph_gather_vars(batch, jnp.asarray(gf)))
    for i in range(batch.V):
        if vg[i] < batch.G:
            np.testing.assert_allclose(back[i], gf[vg[i]])
        else:
            np.testing.assert_allclose(back[i], 0.0)


def test_solutions_packed_correctly():
    formulas = [(2, [[1, -2]]), (3, [[1, 2, 3], [-1]])]
    sols = [[1, 0], [0, 1, 1]]
    batch = build_batch(formulas, BUCKET, solutions=sols)
    got = np.asarray(batch.solutions)[:5]
    np.testing.assert_array_equal(got, [1, 0, 0, 1, 1])
    assert int(batch.n_vars) == 5
    assert int(batch.n_clauses) == 3
    assert int(batch.n_graphs) == 2
