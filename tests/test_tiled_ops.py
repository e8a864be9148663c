"""Flat-vs-tiled equivalence: the block-sparse tiled incidence layout
(ops/tiled_ops.py) must compute exactly the same SpMMs as the flat
edge-list path, op by op, through gradients, and end-to-end through the
model's `plans=` dispatch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusionsat_tpu.graph.batch import BucketSpec, build_batch
from diffusionsat_tpu.models.query_sat import (
    QuerySATConfig,
    query_sat_apply,
    query_sat_init,
)
from diffusionsat_tpu.ops import tiled_ops
from diffusionsat_tpu.ops.graph_ops import clause_to_lit, lit_to_clause
from diffusionsat_tpu.ops.tiled_ops import (
    build_tiled_incidence,
    tiled_clause_to_lit,
    tiled_lit_to_clause,
)


def _random_batch(seed=0, n_graphs=5, max_vars=12, dup_lit=True):
    rng = np.random.default_rng(seed)
    formulas, sols = [], []
    for gi in range(n_graphs):
        n = int(rng.integers(3, max_vars + 1))
        m = int(rng.integers(3, 4 * n))
        clauses = []
        for _ in range(m):
            k = int(rng.integers(1, min(4, n) + 1))
            vs = rng.choice(n, size=k, replace=False) + 1
            clauses.append([int(v) if rng.random() < 0.5 else -int(v)
                            for v in vs])
        if dup_lit and gi == 0:
            clauses.append([1, 1, -2])  # repeated literal: multiplicity 2
        formulas.append((n, clauses))
        sols.append(rng.integers(0, 2, size=n).tolist())
    bucket = BucketSpec(max_vars=128, max_clauses=256, max_edges=1024,
                        max_graphs=8)
    return build_batch(formulas, bucket, solutions=sols)


@pytest.fixture(autouse=True)
def _f32_tiles(monkeypatch):
    # exact-equality testing: force true-f32 tile matmuls (the TPU default
    # DEFAULT precision is bf16-input; values here are not bf16-exact)
    monkeypatch.setattr(tiled_ops, "TILE_PRECISION",
                        jax.lax.Precision.HIGHEST)


@pytest.mark.parametrize("tc,tl", [(8, 8), (16, 32), (128, 128)])
def test_tiled_lit_to_clause_matches_flat(tc, tl):
    batch = _random_batch(seed=1)
    ti = build_tiled_incidence(batch, tc=tc, tl=tl, pad_tiles=4)
    x = np.random.default_rng(2).normal(
        size=(2 * batch.V, 7)).astype(np.float32)
    ref = np.asarray(lit_to_clause(batch, jnp.asarray(x)))
    got = np.asarray(tiled_lit_to_clause(jnp.asarray(x), ti))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("tc,tl", [(8, 8), (16, 32), (128, 128)])
def test_tiled_clause_to_lit_matches_flat(tc, tl):
    batch = _random_batch(seed=3)
    ti = build_tiled_incidence(batch, tc=tc, tl=tl, pad_tiles=4)
    y = np.random.default_rng(4).normal(
        size=(batch.C, 5)).astype(np.float32)
    ref = np.asarray(clause_to_lit(batch, jnp.asarray(y)))
    got = np.asarray(tiled_clause_to_lit(jnp.asarray(y), ti))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_tiled_gradients_match_flat():
    batch = _random_batch(seed=5)
    ti = build_tiled_incidence(batch, tc=16, tl=16, pad_tiles=4)
    x = jnp.asarray(np.random.default_rng(6).normal(
        size=(2 * batch.V, 4)).astype(np.float32))
    w = jnp.asarray(np.random.default_rng(7).normal(
        size=(batch.C, 4)).astype(np.float32))

    def f_flat(x):
        return jnp.sum(lit_to_clause(batch, x) * w)

    def f_tiled(x):
        return jnp.sum(tiled_lit_to_clause(x, ti) * w)

    np.testing.assert_allclose(np.asarray(jax.grad(f_tiled)(x)),
                               np.asarray(jax.grad(f_flat)(x)),
                               rtol=1e-5, atol=1e-5)


def test_padding_tiles_contribute_zero():
    batch = _random_batch(seed=8)
    ti_small = build_tiled_incidence(batch, tc=16, tl=16, pad_tiles=1)
    ti_padded = build_tiled_incidence(batch, tc=16, tl=16, pad_tiles=64)
    assert ti_padded.n_tiles > ti_small.n_tiles
    x = jnp.asarray(np.random.default_rng(9).normal(
        size=(2 * batch.V, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(tiled_lit_to_clause(x, ti_small)),
        np.asarray(tiled_lit_to_clause(x, ti_padded)), rtol=1e-6)


def test_model_apply_tiled_plans_matches_unplanned():
    """query_sat_apply(plans=TiledIncidence) == plans=None end to end:
    logits, loss, and parameter gradients."""
    batch = _random_batch(seed=10)
    cfg = QuerySATConfig(feature_maps=16, query_maps=16, train_rounds=3,
                         test_rounds=3, msg_layers=1, update_layers=1)
    params = query_sat_init(jax.random.key(0), cfg)
    ti = build_tiled_incidence(batch, tc=32, tl=32, pad_tiles=4)
    key = jax.random.key(1)
    labels = batch.solutions

    def run(plans):
        def loss_fn(p):
            _, loss, _, _ = query_sat_apply(p, cfg, batch, key,
                                            training=True, labels=labels,
                                            plans=plans)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        logits, _, _, _ = query_sat_apply(params, cfg, batch, key,
                                          training=False, plans=plans)
        return loss, grads, logits

    loss_f, grads_f, logits_f = run(None)
    loss_t, grads_t, logits_t = run(ti)
    np.testing.assert_allclose(float(loss_t), float(loss_f), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(logits_t), np.asarray(logits_f),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(grads_f), jax.tree.leaves(grads_t)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def test_anf_apply_tiled_matches_flat():
    """ANF model with tiles == flat segment path: loss, logits, grads
    (generic bipartite tiling, ops/tiled_ops.build_anf_tiles)."""
    from diffusionsat_tpu.data.anf import RandomAnfInstances
    from diffusionsat_tpu.graph.anf_batch import ANFBucket, build_anf_batch
    from diffusionsat_tpu.models.anf_sat import (
        ANFSATConfig,
        anf_sat_apply,
        anf_sat_init,
    )
    from diffusionsat_tpu.ops.tiled_ops import build_anf_tiles

    gen = RandomAnfInstances(min_vars=4, max_vars=10, train_size=6,
                             test_size=1, seed=2).train_generator()
    tri = [next(gen) for _ in range(4)]
    bucket = ANFBucket(max_vars=64, max_ands=128, max_clauses=64,
                       max_edges=512, max_graphs=6)
    batch = build_anf_batch([(n, eqs) for n, eqs, _ in tri], bucket,
                            solutions=[bits for _, _, bits in tri])
    cfg = ANFSATConfig(feature_maps=16, query_maps=16, train_rounds=2,
                       test_rounds=2)
    params = anf_sat_init(jax.random.key(0), cfg)
    tiles = build_anf_tiles(batch, tc=16, tl=32, pad_tiles=4)
    key = jax.random.key(3)

    def run(t):
        def loss_fn(p):
            _, loss, _, _ = anf_sat_apply(p, cfg, batch, key,
                                          training=True, tiles=t)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        logits, _, _, _ = anf_sat_apply(params, cfg, batch, key,
                                        training=False, tiles=t)
        return loss, grads, logits

    loss_f, grads_f, logits_f = run(None)
    loss_t, grads_t, logits_t = run(tiles)
    np.testing.assert_allclose(float(loss_t), float(loss_f), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(logits_t), np.asarray(logits_f),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(grads_f), jax.tree.leaves(grads_t)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def test_anf_planned_train_step_descends():
    from diffusionsat_tpu.data.anf import RandomAnfInstances
    from diffusionsat_tpu.graph.anf_batch import ANFBucket, build_anf_batch
    from diffusionsat_tpu.models.anf_sat import (
        ANFSATConfig,
        anf_sat_apply,
        anf_sat_init,
    )
    from diffusionsat_tpu.ops.tiled_ops import build_anf_tiles
    from diffusionsat_tpu.train.adabelief import adabelief
    from diffusionsat_tpu.train.loop import (
        TrainState,
        make_planned_train_step_for,
    )

    gen = RandomAnfInstances(min_vars=4, max_vars=8, train_size=4,
                             test_size=1, seed=4).train_generator()
    tri = [next(gen) for _ in range(3)]
    bucket = ANFBucket(max_vars=32, max_ands=64, max_clauses=32,
                       max_edges=256, max_graphs=4)
    batch = build_anf_batch([(n, eqs) for n, eqs, _ in tri], bucket,
                            solutions=[bits for _, _, bits in tri])
    cfg = ANFSATConfig(feature_maps=16, query_maps=16, train_rounds=2,
                       test_rounds=2)
    params = anf_sat_init(jax.random.key(0), cfg)
    opt = adabelief(learning_rate=2e-3)
    state = TrainState(params=params, opt_state=opt.init(params),
                       step=jnp.zeros((), jnp.int32), key=jax.random.key(1))
    tiles = build_anf_tiles(batch, tc=16, tl=16, pad_tiles=4)
    step = make_planned_train_step_for(anf_sat_apply, cfg, opt,
                                       plan_kw="tiles")
    losses = []
    for _ in range(25):
        state, out = step(state, batch, tiles)
        losses.append(float(out["loss"]))
    assert losses[-1] < losses[0]
