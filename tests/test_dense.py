"""Flat-vs-dense equivalence suite.

The dense per-graph block path (graph/dense_batch.py, ops/dense_ops.py,
models/query_sat_dense.py) must compute exactly the same math as the flat
edge-list path — these tests lock that invariant op by op and end-to-end
(loss, logits, parameter gradients)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusionsat_tpu.graph.batch import BucketSpec, build_batch
from diffusionsat_tpu.graph.dense_batch import (
    dense_dims_for,
    dense_from_flat,
    densify_batches,
)
from diffusionsat_tpu.models.query_sat import (
    QuerySATConfig,
    query_sat_apply,
    query_sat_init,
)
from diffusionsat_tpu.models.query_sat_dense import query_sat_dense_apply
from diffusionsat_tpu.ops import dense_ops as dops
from diffusionsat_tpu import losses


def _random_formulas(rng, n_graphs=4, min_vars=3, max_vars=9):
    formulas, sols = [], []
    for _ in range(n_graphs):
        n = int(rng.integers(min_vars, max_vars + 1))
        m = int(rng.integers(2, 4 * n))
        clauses = []
        for _ in range(m):
            k = int(rng.integers(1, min(4, n) + 1))
            vs = rng.choice(n, size=k, replace=False) + 1
            clauses.append([int(v) if rng.random() < 0.5 else -int(v)
                            for v in vs])
        formulas.append((n, clauses))
        sols.append(rng.integers(0, 2, size=n).tolist())
    return formulas, sols


def _pair(seed=0, n_graphs=4):
    rng = np.random.default_rng(seed)
    formulas, sols = _random_formulas(rng, n_graphs)
    bucket = BucketSpec(max_vars=64, max_clauses=256, max_edges=1024,
                        max_graphs=8)
    flat = build_batch(formulas, bucket, solutions=sols)
    G, Vg, Cg = dense_dims_for([flat])
    dense = dense_from_flat(flat, G, Vg, Cg)
    return flat, dense


def _var_offsets(flat):
    nv = np.asarray(flat.n_vars_per_graph, np.int64)[:int(flat.n_graphs)]
    return np.concatenate([[0], np.cumsum(nv)]), nv


def _clause_offsets(flat):
    nc = np.asarray(flat.n_clauses_per_graph, np.int64)[:int(flat.n_graphs)]
    return np.concatenate([[0], np.cumsum(nc)]), nc


def _dense_vars_from_flat(x_flat, flat, dense):
    """[V, F] -> [G, Vg, F] on real rows (zeros elsewhere)."""
    off, nv = _var_offsets(flat)
    out = np.zeros((dense.G, dense.Vg) + x_flat.shape[1:], x_flat.dtype)
    for g in range(len(nv)):
        out[g, :nv[g]] = x_flat[off[g]:off[g + 1]]
    return out


def _flat_vars_from_dense(x_dense, flat, dense):
    """[G, Vg, F] -> [V, F] real rows."""
    off, nv = _var_offsets(flat)
    out = np.zeros((flat.V,) + x_dense.shape[2:], x_dense.dtype)
    for g in range(len(nv)):
        out[off[g]:off[g + 1]] = x_dense[g, :nv[g]]
    return out


def test_dense_from_flat_preserves_edges():
    flat, dense = _pair(0)
    assert float(jnp.sum(dense.incidence)) == float(
        jnp.sum(flat.edge_mask_c))
    assert int(dense.n_vars) == int(flat.n_vars)
    assert int(dense.n_clauses) == int(flat.n_clauses)


def test_lit_to_clause_equivalence():
    flat, dense = _pair(1)
    rng = np.random.default_rng(1)
    F = 5
    # dense literal features: [G, 2Vg, F]; map to flat [2V, F]
    xd = rng.normal(size=(dense.G, 2 * dense.Vg, F)).astype(np.float32)
    xd *= np.concatenate([dense.var_mask, dense.var_mask], 1)[..., None]
    pos = _flat_vars_from_dense(xd[:, :dense.Vg], flat, dense)
    neg = _flat_vars_from_dense(xd[:, dense.Vg:], flat, dense)
    xf = np.concatenate([pos, neg], axis=0)  # [2V, F]

    from diffusionsat_tpu.ops.graph_ops import clause_to_lit, lit_to_clause
    out_f = np.asarray(lit_to_clause(flat, jnp.asarray(xf)))
    out_d = np.asarray(dops.lit_to_clause(dense, jnp.asarray(xd)))
    c_off, nc = _clause_offsets(flat)
    for g in range(len(nc)):
        np.testing.assert_allclose(out_d[g, :nc[g]],
                                   out_f[c_off[g]:c_off[g + 1]],
                                   rtol=1e-5, atol=1e-5)

    # reverse direction on clause features
    yd = rng.normal(size=(dense.G, dense.Cg, F)).astype(np.float32)
    yd *= dense.clause_mask[..., None]
    yf = np.zeros((flat.C, F), np.float32)
    for g in range(len(nc)):
        yf[c_off[g]:c_off[g + 1]] = yd[g, :nc[g]]
    back_f = np.asarray(clause_to_lit(flat, jnp.asarray(yf)))
    back_d = np.asarray(dops.clause_to_lit(dense, jnp.asarray(yd)))
    off, nv = _var_offsets(flat)
    for g in range(len(nv)):
        np.testing.assert_allclose(back_d[g, :nv[g]],
                                   back_f[off[g]:off[g + 1]],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            back_d[g, dense.Vg:dense.Vg + nv[g]],
            back_f[flat.V + off[g]:flat.V + off[g + 1]],
            rtol=1e-5, atol=1e-5)


def test_softplus_loss_and_grad_equivalence():
    flat, dense = _pair(2)
    rng = np.random.default_rng(2)
    K = 3
    xd = rng.normal(size=(dense.G, dense.Vg, K)).astype(np.float32)
    xd *= dense.var_mask[..., None]
    xf = _flat_vars_from_dense(xd, flat, dense)

    loss_f, grad_f = losses.softplus_loss_and_grad(jnp.asarray(xf), flat)
    loss_d, grad_d = dops.softplus_loss_and_grad(jnp.asarray(xd), dense)
    c_off, nc = _clause_offsets(flat)
    off, nv = _var_offsets(flat)
    for g in range(len(nc)):
        np.testing.assert_allclose(np.asarray(loss_d)[g, :nc[g]],
                                   np.asarray(loss_f)[c_off[g]:c_off[g + 1]],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(grad_d)[g, :nv[g]],
                                   np.asarray(grad_f)[off[g]:off[g + 1]],
                                   rtol=1e-5, atol=1e-5)


def test_pair_norm_and_sat_equivalence():
    flat, dense = _pair(3)
    rng = np.random.default_rng(3)
    F = 6
    from diffusionsat_tpu.nn.normalization import pair_norm_vars
    from diffusionsat_tpu.losses.sat import is_batch_sat, is_graph_sat

    xd = rng.normal(size=(dense.G, dense.Vg, F)).astype(np.float32)
    xd *= dense.var_mask[..., None]
    xf = _flat_vars_from_dense(xd, flat, dense)
    pn_f = np.asarray(pair_norm_vars(jnp.asarray(xf), flat))
    pn_d = np.asarray(dops.pair_norm_vars(jnp.asarray(xd), dense))
    off, nv = _var_offsets(flat)
    for g in range(len(nv)):
        np.testing.assert_allclose(pn_d[g, :nv[g]], pn_f[off[g]:off[g + 1]],
                                   rtol=1e-4, atol=1e-5)

    logits_d = rng.normal(size=(dense.G, dense.Vg, 1)).astype(np.float32)
    logits_f = _flat_vars_from_dense(logits_d, flat, dense)
    np.testing.assert_allclose(
        float(is_batch_sat(jnp.asarray(logits_f), flat)),
        float(dops.is_batch_sat(jnp.asarray(logits_d), dense)))
    gs_f = np.asarray(is_graph_sat(jnp.asarray(logits_f), flat))
    gs_d = np.asarray(dops.is_graph_sat(jnp.asarray(logits_d), dense))
    np.testing.assert_allclose(gs_d[:len(nv)], gs_f[:len(nv)], atol=1e-6)


def _small_cfg(**kw):
    return QuerySATConfig(feature_maps=16, query_maps=8, train_rounds=4,
                          test_rounds=4, logit_maps=4,
                          debug_zero_noise=True, **kw)


@pytest.mark.parametrize("supervised", [True, False])
def test_full_apply_equivalence(supervised):
    flat, dense = _pair(4, n_graphs=5)
    cfg = _small_cfg(supervised=supervised)
    params = query_sat_init(jax.random.key(0), cfg)
    key = jax.random.key(7)

    labels_f = flat.solutions
    labels_d = dense.solutions
    # explicit noise inputs remove layout-dependent random draws
    noisy_f = jax.nn.one_hot(labels_f, 2, dtype=jnp.float32)
    noisy_d = jax.nn.one_hot(labels_d, 2, dtype=jnp.float32)
    ns = jnp.asarray(0.37)

    def run_flat(p):
        out, loss, steps, _ = query_sat_apply(
            p, cfg, flat, key, training=True, labels=labels_f,
            noise_scale=ns, noisy_num=noisy_f)
        return loss, (out, steps)

    def run_dense(p):
        out, loss, steps, _ = query_sat_dense_apply(
            p, cfg, dense, key, training=True, labels=labels_d,
            noise_scale=ns, noisy_num=noisy_d)
        return loss, (out, steps)

    (loss_f, (out_f, steps_f)), grads_f = jax.value_and_grad(
        run_flat, has_aux=True)(params)
    (loss_d, (out_d, steps_d)), grads_d = jax.value_and_grad(
        run_dense, has_aux=True)(params)

    np.testing.assert_allclose(float(loss_f), float(loss_d),
                               rtol=2e-4, atol=1e-5)
    assert int(steps_f) == int(steps_d)
    off, nv = _var_offsets(flat)
    out_d = np.asarray(out_d)
    out_f = np.asarray(out_f)
    for g in range(len(nv)):
        np.testing.assert_allclose(out_d[g, :nv[g]],
                                   out_f[off[g]:off[g + 1]],
                                   rtol=1e-3, atol=1e-4)
    # parameter gradients must match across layouts; elementwise fp
    # reordering noise compounds through rounds+backward, so the criterion
    # is global relative L2 error per leaf (a wrong formula is off by
    # orders of magnitude, reordering noise stays ~1e-4)
    # Absolute floor matters: e.g. update_gate's output-bias grad is
    # *exactly zero* in math (PairNorm mean-subtraction cancels per-graph
    # constants), so its "relative" error is noise/noise. The 2e-2 slack
    # absorbs discrete near-tie flips (argmin head select / SAT flag)
    # that amplify fp reordering after several rounds.
    for (pf, gf), (pd, gd) in zip(
            jax.tree_util.tree_leaves_with_path(grads_f),
            jax.tree_util.tree_leaves_with_path(grads_d)):
        gf, gd = np.asarray(gf), np.asarray(gd)
        err = np.linalg.norm(gf - gd)
        assert err < 2e-2 * np.linalg.norm(gf) + 1e-5, \
            f"{pf}: grad L2 error {err} vs norm {np.linalg.norm(gf)}"


def test_dense_train_step_runs():
    import optax

    from diffusionsat_tpu.train.adabelief import adabelief
    from diffusionsat_tpu.train.loop import TrainState, make_train_step_for

    flat, dense = _pair(5, n_graphs=4)
    cfg = QuerySATConfig(feature_maps=16, query_maps=8, train_rounds=3,
                         test_rounds=3, logit_maps=4)
    params = query_sat_init(jax.random.key(0), cfg)
    opt = adabelief(learning_rate=1e-3)
    state = TrainState(params=params, opt_state=opt.init(params),
                       step=jnp.zeros((), jnp.int32),
                       key=jax.random.key(1))
    step = make_train_step_for(query_sat_dense_apply, cfg, opt)
    losses_seen = []
    for _ in range(8):
        state, out = step(state, dense)
        losses_seen.append(float(out["loss"]))
    assert all(np.isfinite(l) for l in losses_seen)
    assert losses_seen[-1] < losses_seen[0] * 1.5  # trains without blowup


def test_densify_quantized_levels():
    from diffusionsat_tpu.graph.dense_batch import densify_batches_quantized

    bucket = BucketSpec(max_vars=128, max_clauses=512, max_edges=2048,
                        max_graphs=16)
    flats = []
    for s, (lo, hi) in enumerate([(3, 7), (3, 7), (10, 14), (20, 30)]):
        formulas, sols = _random_formulas(np.random.default_rng(s), 3,
                                          min_vars=lo, max_vars=hi)
        flats.append(build_batch(formulas, bucket, solutions=sols))
    denses = densify_batches_quantized(flats)
    # small-graph batches get small blocks; same-level batches share dims
    assert (denses[0].Vg, denses[0].Cg) == (denses[1].Vg, denses[1].Cg)
    assert denses[0].Vg < denses[3].Vg
    for f, d in zip(flats, denses):
        assert float(np.sum(d.incidence)) == float(np.sum(f.edge_mask_c))
        np.testing.assert_array_equal(
            np.asarray(d.solutions)[np.asarray(d.var_mask) > 0],
            np.asarray(f.solutions)[np.asarray(f.var_mask) > 0])


def test_densify_quantized_g_levels():
    """The graph dim is quantized per batch (rounded to g_quantum), not
    padded to the level-wide maximum."""
    from diffusionsat_tpu.graph.dense_batch import densify_batches_quantized

    bucket = BucketSpec(max_vars=512, max_clauses=2048, max_edges=8192,
                        max_graphs=64)
    rng = np.random.default_rng(0)
    small, ssols = _random_formulas(rng, 3, min_vars=3, max_vars=7)
    big_formulas = small * 15
    big_sols = ssols * 15
    flats = [build_batch(small, bucket, solutions=ssols),
             build_batch(big_formulas, bucket, solutions=big_sols)]
    denses = densify_batches_quantized(flats, g_quantum=8)
    assert (denses[0].Vg, denses[0].Cg) == (denses[1].Vg, denses[1].Cg)
    # 3 graphs -> G=8; 45 graphs -> G=48, not both padded to 48
    assert denses[0].G == 8
    assert denses[1].G == 48
    for f, d in zip(flats, denses):
        assert float(np.sum(d.incidence)) == float(np.sum(f.edge_mask_c))


def test_densify_batches_shared_dims():
    rng = np.random.default_rng(9)
    bucket = BucketSpec(max_vars=64, max_clauses=256, max_edges=1024,
                        max_graphs=8)
    flats = []
    for s in range(3):
        formulas, sols = _random_formulas(np.random.default_rng(s), 3)
        flats.append(build_batch(formulas, bucket, solutions=sols))
    denses = densify_batches(flats)
    dims = {(d.G, d.Vg, d.Cg) for d in denses}
    assert len(dims) == 1
    for f, d in zip(flats, denses):
        assert float(np.sum(d.incidence)) == float(np.sum(f.edge_mask_c))


def test_densify_fine_blocks(monkeypatch):
    """The (default) fine step-2 level table gives tighter blocks than
    the DSAT_FINE_BLOCKS=0 coarse table, with the same content (the
    padding-invariance the equivalence suite locks holds for any block
    dims that fit the graphs)."""
    from diffusionsat_tpu.graph.dense_batch import (
        _FINE_DIM_LEVELS,
        densify_batches_quantized,
    )

    # clause dims must cover threshold 3-SAT at every var level
    for v, c in _FINE_DIM_LEVELS:
        assert c >= 4.258 * v + 58.26 * v ** (-2.0 / 3.0) or v >= 48

    bucket = BucketSpec(max_vars=128, max_clauses=512, max_edges=2048,
                        max_graphs=16)
    flats = []
    for s, (lo, hi) in enumerate([(3, 6), (10, 13), (26, 30)]):
        formulas, sols = _random_formulas(np.random.default_rng(s), 3,
                                          min_vars=lo, max_vars=hi)
        flats.append(build_batch(formulas, bucket, solutions=sols))
    monkeypatch.setenv("DSAT_FINE_BLOCKS", "0")
    coarse = densify_batches_quantized(flats)
    monkeypatch.setenv("DSAT_FINE_BLOCKS", "1")
    fine = densify_batches_quantized(flats)
    # finer grid never pads more, usually less
    for c, f in zip(coarse, fine):
        assert f.Vg <= c.Vg and f.Cg <= c.Cg and f.G <= c.G
        assert float(np.sum(f.incidence)) == float(np.sum(c.incidence))
    # mid-size batch lands strictly tighter (10-13 vars: coarse 16, fine 14)
    assert fine[1].Vg < coarse[1].Vg


def test_block_bf16_matches_f32():
    """Block-level bf16 (params cast once, bf16 states/activations, f32
    accumulation + losses) stays numerically close to the f32 path and
    produces finite f32 master-param gradients."""
    import dataclasses as _dc

    from diffusionsat_tpu.graph.dense_batch import densify_batches
    from diffusionsat_tpu.models.query_sat import (
        QuerySATConfig, query_sat_init)
    from diffusionsat_tpu.models.query_sat_dense import query_sat_dense_apply

    bucket = BucketSpec(max_vars=64, max_clauses=256, max_edges=1024,
                        max_graphs=8)
    formulas, sols = _random_formulas(np.random.default_rng(3), 4)
    flat = build_batch(formulas, bucket, solutions=sols)
    (dense,) = densify_batches([flat])

    base = QuerySATConfig(feature_maps=32, query_maps=32, train_rounds=4,
                          test_rounds=4, debug_zero_noise=True)
    params = query_sat_init(jax.random.key(0), base)
    labels = jnp.asarray(np.asarray(dense.solutions), jnp.int32)

    outs = {}
    for bf16 in (False, True):
        cfg = _dc.replace(base, block_bf16=bf16)

        def loss_fn(p):
            logits, loss, steps, _ = query_sat_dense_apply(
                p, cfg, dense, jax.random.key(1), training=True,
                labels=labels, noise_scale=jnp.float32(0.4))
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        leaves = jax.tree.leaves(grads)
        assert all(l.dtype == jnp.float32 for l in leaves)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        outs[bf16] = (float(loss), np.asarray(logits, np.float32))

    # bf16 rounding over 4 recurrent rounds: expect percent-level drift,
    # not divergence
    f32_loss, f32_logits = outs[False]
    bf_loss, bf_logits = outs[True]
    assert abs(bf_loss - f32_loss) <= 0.05 * max(abs(f32_loss), 1.0)
    denom = np.maximum(np.abs(f32_logits), 1.0)
    assert np.max(np.abs(bf_logits - f32_logits) / denom) < 0.25
