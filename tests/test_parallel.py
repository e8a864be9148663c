"""Multi-device tests on the virtual 8-device CPU mesh: DP equivalence and
clause-partitioned SpMM equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusionsat_tpu.graph.batch import BucketSpec, build_batch
from diffusionsat_tpu.models.query_sat import QuerySATConfig, query_sat_init
from diffusionsat_tpu.ops.graph_ops import clause_to_lit, lit_to_clause
from diffusionsat_tpu.parallel.dp import (
    make_dp_train_step,
    shard_stacked_batch,
    stack_batches,
)
from diffusionsat_tpu.parallel.graph_partition import (
    make_sharded_spmm,
    place_sharded_batch,
    shard_batch_by_clause,
)
from diffusionsat_tpu.parallel.mesh import make_mesh
from diffusionsat_tpu.train.adabelief import adabelief
from diffusionsat_tpu.train.loop import TrainState

BUCKET = BucketSpec(max_vars=64, max_clauses=128, max_edges=512, max_graphs=4)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def random_batch(seed):
    rng = np.random.default_rng(seed)
    formulas = []
    for _ in range(3):
        n = int(rng.integers(4, 10))
        clauses = [[int(v) if rng.random() < 0.5 else -int(v)
                    for v in (rng.choice(n, size=3, replace=False) + 1)]
                   for _ in range(3 * n)]
        formulas.append((n, clauses))
    sols = [[int(b) for b in rng.integers(0, 2, size=n)]
            for n, _ in formulas]
    return build_batch(formulas, BUCKET, solutions=sols)


def test_dp_step_runs_and_replicates():
    mesh = make_mesh(n_data=8, n_graph=1, devices=jax.devices()[:8])
    cfg = QuerySATConfig(feature_maps=8, query_maps=8, train_rounds=2,
                         test_rounds=2)
    opt = adabelief(learning_rate=1e-3)
    params = query_sat_init(jax.random.key(0), cfg)
    state = TrainState(params=params, opt_state=opt.init(params),
                       step=jnp.zeros((), jnp.int32), key=jax.random.key(1))
    batches = [random_batch(i) for i in range(8)]
    stacked = shard_stacked_batch(stack_batches(batches), mesh)
    step = make_dp_train_step(cfg, opt, mesh)
    state, out = step(state, stacked)
    assert np.isfinite(float(out["loss"]))
    assert int(state.step) == 1


def test_sharded_spmm_matches_single_device():
    n_shards = 8
    mesh = make_mesh(n_data=1, n_graph=n_shards,
                     devices=jax.devices()[:8])
    batch = random_batch(42)
    sharded = shard_batch_by_clause(batch, n_shards)
    placed = place_sharded_batch(sharded, mesh)

    rng = np.random.default_rng(0)
    F = 16
    lit_feats = rng.normal(size=(2 * batch.V, F)).astype(np.float32)
    l2c, c2l = make_sharded_spmm(mesh, batch.V, batch.C, n_shards)

    got_c = np.asarray(l2c(jnp.asarray(lit_feats), placed.edge_lit_c,
                           placed.edge_clause_c, placed.edge_mask_c))
    want_c = np.asarray(lit_to_clause(batch, jnp.asarray(lit_feats)))
    np.testing.assert_allclose(got_c, want_c, rtol=1e-5, atol=1e-5)

    clause_feats = rng.normal(size=(batch.C, F)).astype(np.float32)
    got_l = np.asarray(c2l(jnp.asarray(clause_feats), placed.edge_lit_c,
                           placed.edge_clause_c, placed.edge_mask_c))
    want_l = np.asarray(clause_to_lit(batch, jnp.asarray(clause_feats)))
    np.testing.assert_allclose(got_l, want_l, rtol=1e-5, atol=1e-5)


def test_gspmd_graph_sharded_step_matches_single_device():
    from diffusionsat_tpu.parallel.graph_partition import (
        make_gp_train_step,
        shard_gp_batch,
    )

    cfg = QuerySATConfig(feature_maps=8, query_maps=8, train_rounds=2,
                         test_rounds=2)
    opt = adabelief(learning_rate=1e-3)
    params = query_sat_init(jax.random.key(0), cfg)
    batch = random_batch(5)

    def fresh_state():
        return TrainState(params=params, opt_state=opt.init(params),
                          step=jnp.zeros((), jnp.int32),
                          key=jax.random.key(7))

    from diffusionsat_tpu.train.loop import make_train_step
    s1, o1 = make_train_step(cfg, opt)(fresh_state(), batch)

    mesh = make_mesh(n_data=1, n_graph=8, devices=jax.devices()[:8])
    s2, o2 = make_gp_train_step(cfg, opt, mesh)(
        fresh_state(), shard_gp_batch(batch, mesh))

    np.testing.assert_allclose(float(o1["loss"]), float(o2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)
