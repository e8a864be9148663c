"""End-to-end training smoke tests: optimizer, train step, checkpointing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from diffusionsat_tpu.graph.batch import BucketSpec, build_batch
from diffusionsat_tpu.models.query_sat import QuerySATConfig, query_sat_init
from diffusionsat_tpu.train.adabelief import adabelief, cosine_decay_schedule
from diffusionsat_tpu.train.loop import TrainState, make_train_step
from diffusionsat_tpu.sat.solvers import solve

BUCKET = BucketSpec(max_vars=64, max_clauses=128, max_edges=512, max_graphs=8)
CFG = QuerySATConfig(feature_maps=16, query_maps=16, train_rounds=4,
                     test_rounds=8)


def small_batch(seed=0):
    rng = np.random.default_rng(seed)
    formulas, sols = [], []
    for _ in range(4):
        n = int(rng.integers(4, 8))
        m = int(3.5 * n)
        while True:
            clauses = []
            for _ in range(m):
                vs = rng.choice(n, size=3, replace=False) + 1
                clauses.append([int(v) if rng.random() < 0.5 else -int(v)
                                for v in vs])
            ok, model = solve(clauses, n, seed=seed)
            if ok:
                break
        formulas.append((n, clauses))
        sols.append([1 if l > 0 else 0 for l in model])
    return build_batch(formulas, BUCKET, solutions=sols)


def test_adabelief_matches_reference_structure():
    opt = adabelief(learning_rate=1e-3)
    params = {"w": jnp.ones((3, 2)), "b": jnp.zeros(2)}
    state = opt.init(params)
    grads = {"w": jnp.full((3, 2), 0.1), "b": jnp.full(2, -0.2)}
    updates, state2 = opt.update(grads, state, params)
    assert int(state2.count) == 1
    for leaf in jax.tree.leaves(updates):
        assert np.all(np.isfinite(np.asarray(leaf)))
    # reference first-step semantics: v=0 so the adaptive clip value is
    # clip_epsilon=0.01; the gradient is clipped per-tensor to norm 0.01,
    # and the sma gate (sma_t=1 < 5) passes m_hat through un-rectified:
    # update = -lr * g * 0.01/||g||
    g = np.asarray(grads["w"])
    want = -1e-3 * g * 0.01 / np.linalg.norm(g)
    np.testing.assert_allclose(np.asarray(updates["w"]), want, rtol=1e-4)


def test_cosine_decay_schedule():
    sched = cosine_decay_schedule(1e-3, decay_steps=100, alpha=0.5)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(100)) == pytest.approx(0.5e-3)
    assert float(sched(50)) == pytest.approx(0.75e-3, rel=1e-3)


def test_train_step_reduces_loss():
    batch = small_batch()
    params = query_sat_init(jax.random.key(0), CFG)
    opt = adabelief(learning_rate=2e-3)
    state = TrainState(params=params, opt_state=opt.init(params),
                       step=jnp.zeros((), jnp.int32), key=jax.random.key(42))
    train_step = make_train_step(CFG, opt)
    losses = []
    for _ in range(30):
        state, out = train_step(state, batch)
        losses.append(float(out["loss"]))
        assert np.isfinite(losses[-1])
    assert int(state.step) == 30
    # the optimizer should make progress on a single repeated batch
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_checkpoint_roundtrip(tmp_path):
    from diffusionsat_tpu.train.checkpoint import CheckpointManager

    params = query_sat_init(jax.random.key(0), CFG)
    opt = adabelief(learning_rate=1e-3)
    state = TrainState(params=params, opt_state=opt.init(params),
                       step=jnp.asarray(7, jnp.int32), key=jax.random.key(1))
    mgr = CheckpointManager(tmp_path / "ckpt", max_to_keep=2)
    mgr.save(state)
    assert mgr.latest_step() == 7

    template = TrainState(params=jax.tree.map(jnp.zeros_like, params),
                          opt_state=opt.init(params),
                          step=jnp.zeros((), jnp.int32),
                          key=jax.random.key(0))
    restored = mgr.restore(template)
    assert restored is not None
    assert int(restored.step) == 7
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    mgr.close()


def test_export_params_roundtrip(tmp_path):
    from diffusionsat_tpu.train.checkpoint import export_params, load_params

    params = query_sat_init(jax.random.key(3), CFG)
    path = tmp_path / "pretrained.npz"
    export_params(params, path, meta={"model": "query_sat", "step": 42})
    loaded, meta = load_params(path)
    assert meta == {"model": "query_sat", "step": 42}
    assert jax.tree_util.tree_structure(
        jax.tree.map(lambda x: 0, loaded)) == jax.tree_util.tree_structure(
        jax.tree.map(lambda x: 0, params))
    for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sampler_from_npz_params(tmp_path):
    from diffusionsat_tpu.diffusion.sampler import DiffusionSampler
    from diffusionsat_tpu.train.checkpoint import export_params

    params = query_sat_init(jax.random.key(5), CFG)
    path = tmp_path / "m.npz"
    export_params(params, path, meta={"model": "query_sat"})
    dimacs = tmp_path / "f.cnf"
    dimacs.write_text("p cnf 2 2\n1 2 0\n-1 2 0\n")
    sampler = DiffusionSampler.from_checkpoint(
        str(path), str(dimacs), cfg=CFG, diffusion_steps=4,
        graphs_per_batch=4)
    counts = sampler.samples(4, max_batches=2)
    assert all(isinstance(k, int) for k in counts)


def test_pretrained_artifacts():
    """Validate every committed pretrained npz (pretrained/README.md):
    loads without orbax, meta names a registered model, finite leaves."""
    import pathlib

    import pytest

    from diffusionsat_tpu.train.checkpoint import load_params

    files = sorted(pathlib.Path("pretrained").glob("*.npz"))
    if not files:
        pytest.skip("no pretrained artifacts committed")
    for f in files:
        params, meta = load_params(f)
        assert meta.get("model") in {"query_sat", "anf_sat"}, f
        assert meta.get("step", 0) > 0, f
        leaves = jax.tree.leaves(params)
        assert leaves, f
        assert all(np.isfinite(np.asarray(x)).all() for x in leaves), f


def test_multi_try_predict_accumulates():
    """Multi-try predict (reference model/query_sat.py:426-445): extra
    tries with fresh randomness can only add solved graphs, never lose
    one, and the pinned noise_scale reaches every try."""
    from diffusionsat_tpu.losses.sat import is_graph_sat
    from diffusionsat_tpu.train.loop import make_predict_step

    batch = small_batch(3)
    params = query_sat_init(jax.random.key(0), CFG)
    key = jax.random.key(7)

    from diffusionsat_tpu.models.query_sat import query_sat_apply

    many = make_predict_step(CFG, prediction_tries=4, noise_scale=1.0)
    logitsN = many(params, batch, key)["prediction"][:, None]
    # replicate the loop's first try (key split order is part of the
    # contract): every graph the first try solves stays solved after
    # accumulation — later tries only fill in unsolved graphs
    _, sub = jax.random.split(key)
    logits1, *_ = query_sat_apply(params, CFG, batch, sub, training=False,
                                  noise_scale=1.0)
    sat1 = np.asarray(is_graph_sat(logits1, batch))[:, 0]
    satN = np.asarray(is_graph_sat(logitsN, batch))[:, 0]
    G = int(batch.n_graphs)
    assert (satN[:G] >= sat1[:G]).all()
    assert np.isfinite(np.asarray(logitsN)).all()


def test_evaluate_metrics_prediction_tries():
    from diffusionsat_tpu.train.loop import evaluate_metrics
    from diffusionsat_tpu.train.metrics import SATAccuracy

    batch = small_batch(4)
    params = query_sat_init(jax.random.key(1), CFG)
    v1 = evaluate_metrics(params, CFG, [batch], [SATAccuracy()],
                          jax.random.key(2), noise_scale=1.0)
    v4 = evaluate_metrics(params, CFG, [batch], [SATAccuracy()],
                          jax.random.key(2), noise_scale=1.0,
                          prediction_tries=4)
    # an untrained model rarely solves anything either way; the contract
    # under test is that tries>1 runs and reports the same metric keys
    assert set(v1) == set(v4)
    assert 0.0 <= v4["total_accuracy"] <= 1.0
