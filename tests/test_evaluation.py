"""Tests for the evaluation harness transforms."""

import numpy as np

import jax

from diffusionsat_tpu.evaluation.harness import (
    extract_formulas,
    invert_batch_polarity,
    permute_batch_variables,
)
from diffusionsat_tpu.graph.batch import BucketSpec, build_batch
from diffusionsat_tpu.losses.sat import is_graph_sat
from diffusionsat_tpu.sat.cnf import check_assignment

BUCKET = BucketSpec(max_vars=32, max_clauses=64, max_edges=256, max_graphs=4)

FORMULAS = [(3, [[1, 2], [-1, 3], [-2, -3]]), (2, [[1, -2], [-1, 2]])]
SOLS = [[1, 0, 1], [1, 1]]


def test_extract_formulas_roundtrip():
    batch = build_batch(FORMULAS, BUCKET, solutions=SOLS)
    got = extract_formulas(batch)
    assert len(got) == 2
    for (n_want, cl_want), (n_got, cl_got) in zip(FORMULAS, got):
        assert n_want == n_got
        assert sorted(map(sorted, cl_want)) == sorted(map(sorted, cl_got))


def test_permute_preserves_satisfiability():
    batch = build_batch(FORMULAS, BUCKET, solutions=SOLS)
    permuted = permute_batch_variables(batch, seed=3)
    for (n, clauses), sol_slice in zip(
            extract_formulas(permuted),
            [np.asarray(permuted.solutions)[:3],
             np.asarray(permuted.solutions)[3:5]]):
        assert check_assignment(clauses, sol_slice.tolist())


def test_invert_polarity_flips_solutions():
    batch = build_batch(FORMULAS, BUCKET, solutions=SOLS)
    inverted = invert_batch_polarity(batch)
    # inverted formulas must be satisfied by the flipped solutions
    for (n, clauses), sol_slice in zip(
            extract_formulas(inverted),
            [np.asarray(inverted.solutions)[:3],
             np.asarray(inverted.solutions)[3:5]]):
        assert check_assignment(clauses, sol_slice.tolist())
    # graph-sat check with logits matching the flipped solutions
    import jax.numpy as jnp
    logits = (np.asarray(inverted.solutions).astype(np.float32) * 2 - 1
              )[:, None] * 5
    sat = np.asarray(is_graph_sat(jnp.asarray(logits), inverted))[:2, 0]
    assert sat.tolist() == [1.0, 1.0]
