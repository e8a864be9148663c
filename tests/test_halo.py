"""Halo-exchange graph partition: equivalence with the single-device step
and cut-proportional communication accounting (SURVEY §5.7 north star)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusionsat_tpu.graph.batch import BucketSpec, build_batch
from diffusionsat_tpu.models.query_sat import QuerySATConfig, query_sat_init
from diffusionsat_tpu.parallel.graph_partition import build_local_batches
from diffusionsat_tpu.parallel.halo import (
    build_halo_plan,
    halo_exchange,
    make_halo_gp_train_step,
)
from diffusionsat_tpu.parallel.mesh import make_mesh
from diffusionsat_tpu.train.adabelief import adabelief
from diffusionsat_tpu.train.loop import TrainState, make_train_step

BUCKET = BucketSpec(max_vars=64, max_clauses=128, max_edges=512,
                    max_graphs=8)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def random_batch(seed, n_graphs=6):
    rng = np.random.default_rng(seed)
    formulas = []
    for _ in range(n_graphs):
        n = int(rng.integers(4, 10))
        clauses = [[int(v) if rng.random() < 0.5 else -int(v)
                    for v in (rng.choice(n, size=3, replace=False) + 1)]
                   for _ in range(3 * n)]
        formulas.append((n, clauses))
    sols = [[int(b) for b in rng.integers(0, 2, size=n)]
            for n, _ in formulas]
    return build_batch(formulas, BUCKET, solutions=sols)


def test_halo_plan_is_cut_proportional():
    batch = random_batch(0)
    plan = build_halo_plan(batch, 4)
    # the halo is the straddling graphs' literals, far below full 2V
    assert 0 < plan.halo_rows < 2 * batch.V // 2
    # ownership covers every real graph exactly once
    om = np.asarray(plan.owner_mask)
    gm = np.asarray(batch.graph_mask)
    np.testing.assert_array_equal(om.sum(axis=0)[gm > 0], 1.0)


def test_halo_exchange_completes_closure_rows():
    """psum vs halo exchange agree on every shard's closure rows."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n = 4
    batch = random_batch(1)
    plan = build_halo_plan(batch, n)
    mesh = make_mesh(n_data=1, n_graph=n, devices=jax.devices()[:n])
    F = 5
    rng = np.random.default_rng(2)
    # per-shard partials, nonzero ONLY on the shard's closure rows (the
    # invariant the clause-sharded segment sum guarantees)
    closure = np.zeros((n, 2 * batch.V, 1), np.float32)
    si = np.asarray(plan.send_idx)
    sm = np.asarray(plan.send_mask)
    c_per = batch.C // n
    clause_graph = np.asarray(batch.clause_graph)
    nv = np.asarray(batch.n_vars_per_graph, np.int64)
    v_off = np.concatenate([[0], np.cumsum(nv)])
    for s in range(n):
        for g in np.unique(clause_graph[s * c_per:(s + 1) * c_per]):
            if g >= batch.G:
                continue
            vs = np.arange(v_off[g], v_off[g + 1])
            closure[s, vs] = 1.0
            closure[s, batch.V + vs] = 1.0
    partials = rng.normal(size=(n, 2 * batch.V, F)).astype(np.float32)
    partials *= closure

    def ex(p, idx, mask):
        return halo_exchange(p[0], idx[0], mask[0], "graph")

    got = shard_map(
        ex, mesh=mesh, in_specs=(P("graph"), P("graph"), P("graph")),
        out_specs=P("graph"), check_vma=False)(
            jnp.asarray(partials), plan.send_idx, plan.send_mask)
    got = np.asarray(got).reshape(n, 2 * batch.V, F)
    want = partials.sum(axis=0)
    for s in range(n):
        rows = closure[s, :, 0] > 0
        np.testing.assert_allclose(got[s][rows], want[rows],
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n_shards,supervised", [(4, True), (8, True),
                                                 (4, False)])
def test_halo_gp_step_matches_single_device(n_shards, supervised):
    cfg = QuerySATConfig(feature_maps=8, query_maps=8, train_rounds=3,
                         test_rounds=3, supervised=supervised)
    opt = adabelief(learning_rate=1e-3)
    params = query_sat_init(jax.random.key(0), cfg)
    batch = random_batch(5)

    def fresh_state():
        return TrainState(params=params, opt_state=opt.init(params),
                          step=jnp.zeros((), jnp.int32),
                          key=jax.random.key(7))

    s1, o1 = make_train_step(cfg, opt)(fresh_state(), batch)

    mesh = make_mesh(n_data=1, n_graph=n_shards,
                     devices=jax.devices()[:n_shards])
    locals_ = build_local_batches(batch, n_shards)
    plan = build_halo_plan(batch, n_shards)
    step = make_halo_gp_train_step(cfg, opt, mesh, plan)
    s2, o2 = step(fresh_state(), locals_)

    np.testing.assert_allclose(float(o1["loss"]), float(o2["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-5)
