"""ANF subsystem tests: batch packing, loss golden values, model smoke."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusionsat_tpu.data.anf import RandomAnfInstances
from diffusionsat_tpu.graph.anf_batch import (
    ANFBucket,
    build_anf_batch,
    evaluate_anf,
)
from diffusionsat_tpu.losses.anf import anf_value_cplx, anf_value_real
from diffusionsat_tpu.models.anf_sat import (
    ANFSATConfig,
    anf_sat_apply,
    anf_sat_init,
)

BUCKET = ANFBucket(max_vars=32, max_ands=32, max_clauses=32, max_edges=256,
                   max_graphs=4)


def sample_systems(n=2, seed=0):
    gen = RandomAnfInstances(min_vars=4, max_vars=8, train_size=n, seed=seed)
    items = list(gen.train_generator())
    systems = [(n_vars, eqs) for n_vars, eqs, _ in items]
    sols = [bits for _, _, bits in items]
    return systems, sols


def test_generator_systems_satisfied_by_hidden_assignment():
    systems, sols = sample_systems(5)
    assert evaluate_anf(systems, sols) == [True] * 5


def test_anf_value_real_matches_bruteforce():
    systems, sols = sample_systems(2, seed=1)
    batch = build_anf_batch(systems, BUCKET, solutions=sols)
    # hard logits matching the hidden assignment: bit b -> value (-1)^b,
    # i.e. logits = -10 for b=1 (tanh -> -1), +10 for b=0
    V = batch.V
    bits = np.asarray(batch.solutions)
    logits = np.where(bits == 1, -10.0, 10.0).astype(np.float32)[:, None]
    clause_val, _, _ = anf_value_real(jnp.asarray(logits), batch)
    cv = np.asarray(clause_val)[:, 0]
    n_clauses = int(batch.n_clauses)
    # every equation XORs to 0 => product of +/-1 values = +1
    np.testing.assert_allclose(cv[:n_clauses], 1.0, atol=1e-2)
    # padded clauses evaluate to +1 as well (zero loss (1-v)^2)
    np.testing.assert_allclose(cv[n_clauses:], 1.0, atol=1e-6)

    # complex variant agrees on the real axis
    logits2 = np.concatenate([logits, np.zeros_like(logits)], axis=-1)
    creal, cim, _, _ = anf_value_cplx(jnp.asarray(logits2), batch)
    np.testing.assert_allclose(np.asarray(creal)[:n_clauses, 0], 1.0,
                               atol=1e-2)
    np.testing.assert_allclose(np.asarray(cim)[:n_clauses, 0], 0.0,
                               atol=1e-2)


def test_anf_value_detects_violations():
    # single system: x1 XOR x2 = 0 -> bits (1, 0) violate it
    systems = [(2, [[(1,), (2,)]])]
    batch = build_anf_batch(systems, BUCKET, solutions=[[1, 0]])
    logits = jnp.asarray([[-10.0], [10.0]])  # x1=1, x2=0
    cv, _, _ = anf_value_real(logits, batch)
    assert float(cv[0, 0]) == pytest.approx(-1.0, abs=1e-2)


def test_anf_sat_model_smoke():
    systems, sols = sample_systems(2, seed=2)
    batch = build_anf_batch(systems, BUCKET, solutions=sols)
    cfg = ANFSATConfig(feature_maps=16, query_maps=16, train_rounds=3,
                       test_rounds=4)
    params = anf_sat_init(jax.random.key(0), cfg)

    def loss_fn(p):
        _, loss, _, _ = anf_sat_apply(p, cfg, batch, jax.random.key(1),
                                      training=True, labels=batch.solutions)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert sum(float(jnp.sum(jnp.abs(g))) for g in leaves) > 0

    # unsupervised path
    cfg2 = ANFSATConfig(feature_maps=16, query_maps=16, train_rounds=2,
                        test_rounds=2, supervised=False)
    params2 = anf_sat_init(jax.random.key(3), cfg2)
    logits, loss, steps, _ = anf_sat_apply(params2, cfg2, batch,
                                           jax.random.key(4), training=False)
    assert np.isfinite(float(loss))
    assert logits.shape == (batch.V, 1)


def test_anf_training_init_npz_warm_start(tmp_path):
    """anf_training --init_npz seeds params from a portable npz: an
    eval-only run warm-started from an exported checkpoint must reproduce
    the source run's full-testset metrics exactly (same params, same eval
    key), while orbax --restore still takes priority when present."""
    import anf_training
    from diffusionsat_tpu.models.anf_sat import ANFSATConfig, anf_sat_init
    from diffusionsat_tpu.train.checkpoint import (
        export_params,
        restore_model_params,
    )

    tiny = ["--rounds", "1", "--min_free_bits", "2", "--max_free_bits", "4",
            "--train_size", "4", "--test_size", "2",
            "--train_rounds", "2", "--test_rounds", "2",
            "--feature_maps", "16", "--eval_every", "2",
            "--max_vars", "1024", "--max_ands", "2048",
            "--max_clauses", "1088", "--max_edges", "8192",
            "--max_graphs", "4", "--train_dir", str(tmp_path)]
    src = anf_training.main(tiny + ["--train_steps", "2",
                                    "--label", "src"])
    ckpt = next((tmp_path).glob("anf_sat_r1_src_*/ckpt"))
    cfg = ANFSATConfig(feature_maps=16, query_maps=16)
    params = restore_model_params(ckpt, anf_sat_init, cfg)
    npz = tmp_path / "warm.npz"
    export_params(params, npz, meta={"model": "anf_sat", "step": 2})

    warm = anf_training.main(tiny + ["--train_steps", "0",
                                     "--label", "warm",
                                     "--init_npz", str(npz)])
    assert warm == src, (warm, src)


def test_is_graph_sat_anf_matches_metric():
    """Jit-side per-graph solved indicator (multi-try predict) agrees
    with the host-side ANFAccuracy check on correct and corrupted
    assignments."""
    from diffusionsat_tpu.losses.anf import is_graph_sat_anf

    systems, sols = sample_systems(3, seed=4)
    batch = build_anf_batch(systems, BUCKET, solutions=sols)
    bits = np.asarray(batch.solutions)
    # model-logit convention: sigmoid(logit) is the bit probability
    good = np.where(bits == 1, 10.0, -10.0).astype(np.float32)[:, None]
    sat = np.asarray(is_graph_sat_anf(jnp.asarray(good), batch))
    g_mask = np.asarray(batch.graph_mask) > 0
    assert np.all(sat[g_mask, 0] == 1.0)
    assert np.all(sat[~g_mask, 0] == 0.0)

    # flip one variable of graph 0 -> at least graph 0 must fail
    bad = good.copy()
    v0 = int(np.argmax(np.asarray(batch.var_graph) == 0))
    bad[v0, 0] = -bad[v0, 0]
    sat_bad = np.asarray(is_graph_sat_anf(jnp.asarray(bad), batch))
    assert sat_bad[0, 0] in (0.0, 1.0)
    assert sat_bad.sum() <= sat.sum()


def test_anf_multi_try_predict():
    """tries>1 with the ANF graph-sat hook: keeps first-solving logits,
    never reduces the solved count."""
    from diffusionsat_tpu.losses.anf import is_graph_sat_anf
    from diffusionsat_tpu.train.loop import make_predict_step
    from diffusionsat_tpu.train.metrics import ANFAccuracy

    systems, sols = sample_systems(2, seed=5)
    batch = build_anf_batch(systems, BUCKET, solutions=sols)
    cfg = ANFSATConfig(feature_maps=16, query_maps=16, train_rounds=2,
                       test_rounds=2)
    params = anf_sat_init(jax.random.key(0), cfg)

    outs = {}
    for tries in (1, 3):
        step = make_predict_step(cfg, anf_sat_apply,
                                 prediction_tries=tries,
                                 graph_sat_fn=is_graph_sat_anf)
        out = step(params, batch, jax.random.key(3))
        m = ANFAccuracy()
        m.update_state(out, batch)
        outs[tries] = m.get_values(reset_state=True)
    assert outs[3]["total_accuracy"] >= outs[1]["total_accuracy"]
