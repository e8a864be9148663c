"""Pallas segmented-sum kernel vs jax.ops.segment_sum (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusionsat_tpu.graph.batch import BucketSpec, build_batch
from diffusionsat_tpu.ops.pallas_segsum import (
    build_segsum_plan,
    gather_segsum,
    segsum_pallas,
)

BUCKET = BucketSpec(max_vars=64, max_clauses=128, max_edges=512, max_graphs=8)


def random_batch(seed, n_formulas=4):
    rng = np.random.default_rng(seed)
    formulas = []
    for _ in range(n_formulas):
        n = int(rng.integers(4, 10))
        clauses = [[int(v) if rng.random() < 0.5 else -int(v)
                    for v in (rng.choice(n, size=3, replace=False) + 1)]
                   for _ in range(3 * n)]
        formulas.append((n, clauses))
    return build_batch(formulas, BUCKET)


@pytest.mark.parametrize("seed", range(3))
def test_matches_segment_sum(seed):
    batch = random_batch(seed)
    plan = build_segsum_plan(batch.edge_clause_c, batch.edge_mask_c,
                             num_segments=batch.C, tile_edges=64, window=32)
    assert plan is not None
    F = 8
    rng = np.random.default_rng(seed)
    src = jnp.asarray(rng.normal(size=(2 * batch.V, F)).astype(np.float32))

    got = np.asarray(gather_segsum(src, jnp.asarray(batch.edge_lit_c), plan))

    gathered = np.asarray(jnp.take(src, batch.edge_lit_c, axis=0)) * \
        np.asarray(batch.edge_mask_c)[:, None]
    want = np.zeros((batch.C, F), np.float32)
    np.add.at(want, np.asarray(batch.edge_clause_c), gathered)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_plan_rejects_oversized_segment():
    seg = np.zeros(100, dtype=np.int32)  # one segment with 100 edges
    mask = np.ones(100, dtype=np.float32)
    assert build_segsum_plan(seg, mask, num_segments=4, tile_edges=64,
                             window=32) is None
