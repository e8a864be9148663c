"""Smoke + gradient tests for the non-flagship model family."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusionsat_tpu.graph.batch import BucketSpec, build_batch
from diffusionsat_tpu.models.attention_sat import (
    AttentionSATConfig,
    attention_sat_apply,
    attention_sat_init,
)
from diffusionsat_tpu.models.neuro_sat import (
    NeuroSATConfig,
    neuro_sat_apply,
    neuro_sat_init,
)
from diffusionsat_tpu.models.neurocore import (
    NeuroCoreConfig,
    neurocore_apply,
    neurocore_init,
)
from diffusionsat_tpu.models.query_sat_lit import (
    QuerySATLitConfig,
    query_sat_lit_apply,
    query_sat_lit_init,
)

BUCKET = BucketSpec(max_vars=32, max_clauses=64, max_edges=256, max_graphs=4)


def tiny_batch():
    formulas = [(3, [[1, 2], [-1, 3], [-2, -3]]),
                (2, [[1, -2], [-1, 2]])]
    sols = [[1, 0, 1], [1, 1]]
    return build_batch(formulas, BUCKET, solutions=sols)


MODELS = {
    "neuro_sat": (NeuroSATConfig(feature_maps=16, rounds=3),
                  neuro_sat_init, neuro_sat_apply),
    "neurocore": (NeuroCoreConfig(feature_maps=16, train_rounds=3,
                                  test_rounds=4),
                  neurocore_init, neurocore_apply),
    "simple_neurosat": (NeuroCoreConfig(feature_maps=16, train_rounds=3,
                                        test_rounds=4, use_query=True),
                        neurocore_init, neurocore_apply),
    "query_sat_lit": (QuerySATLitConfig(feature_maps=16, query_maps=8,
                                        train_rounds=3, test_rounds=4),
                      query_sat_lit_init, query_sat_lit_apply),
    "attention_sat": (AttentionSATConfig(feature_maps=16, query_maps=8,
                                         rounds=3),
                      attention_sat_init, attention_sat_apply),
}


@pytest.mark.parametrize("name", list(MODELS))
def test_forward_and_grads(name):
    cfg, init, apply = MODELS[name]
    batch = tiny_batch()
    params = init(jax.random.key(0), cfg)

    def loss_fn(p):
        logits, loss, steps, aux = apply(p, cfg, batch, jax.random.key(1),
                                         training=True)
        return loss, (logits, steps)

    (loss, (logits, steps)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss)), name
    assert logits.shape == (batch.V, 1)
    leaves = [g for g in jax.tree.leaves(grads)
              if isinstance(g, jnp.ndarray)]
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves), name
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert total > 0, name


@pytest.mark.parametrize("name", list(MODELS))
def test_eval_mode(name):
    cfg, init, apply = MODELS[name]
    batch = tiny_batch()
    params = init(jax.random.key(0), cfg)
    logits, loss, steps, aux = apply(params, cfg, batch, jax.random.key(2),
                                     training=False)
    assert np.isfinite(float(loss)), name
    assert logits.shape == (batch.V, 1)


def test_simple_neurosat_registry_distinct():
    """`simple_neurosat` resolves to a model distinct from `neurocore`:
    query mechanism on (reference model/simple_neurosat.py vs
    model/neurocore.py), different param tree, different outputs."""
    from diffusionsat_tpu.registry import MODEL_REGISTRY

    SCfg, s_init, s_apply = MODEL_REGISTRY.resolve("simple_neurosat")
    NCfg, n_init, n_apply = MODEL_REGISTRY.resolve("neurocore")
    scfg = SCfg(feature_maps=16, train_rounds=3, test_rounds=4)
    ncfg = NCfg(feature_maps=16, train_rounds=3, test_rounds=4)
    assert scfg.use_query and not ncfg.use_query

    batch = tiny_batch()
    sp = s_init(jax.random.key(0), scfg)
    np_ = n_init(jax.random.key(0), ncfg)
    # query MLP exists only in SimpleNeuroSAT
    assert "variables_query" in sp and "variables_query" not in np_
    s_logits, *_ = s_apply(sp, scfg, batch, jax.random.key(1),
                           training=False)
    n_logits, *_ = n_apply(np_, ncfg, batch, jax.random.key(1),
                           training=False)
    assert not np.allclose(np.asarray(s_logits), np.asarray(n_logits))


def test_simple_neurosat_query_diagnostics():
    """Diagnostics port of reference query_stats/log_differences
    (simple_neurosat.py:124-177): scalar stats at rounds 0/16/last and
    the per-round query agreement curve."""
    from diffusionsat_tpu.models.neurocore import SimpleNeuroSATConfig

    cfg = SimpleNeuroSATConfig(feature_maps=16, train_rounds=5,
                               test_rounds=5, diagnostics=True)
    batch = tiny_batch()
    params = neurocore_init(jax.random.key(0), cfg)
    logits, loss, steps, aux = neurocore_apply(
        params, cfg, batch, jax.random.key(1), training=False)
    qs = aux["query_stats"]
    for tag in ("0", "16", "last"):
        for k in ("query_logits_match", "sat_clauses", "matching_mean",
                  "not_matching_mean", "vars_in_clauses_matched",
                  "vars_in_clauses_not_matched"):
            v = float(qs[tag][k])
            assert np.isfinite(v), (tag, k)
        assert 0.0 <= float(qs[tag]["query_logits_match"]) <= 1.0
        assert 0.0 <= float(qs[tag]["sat_clauses"]) <= 1.0
    diffs = np.asarray(aux["queries_diff"])
    assert diffs.shape == (5,)
    # round 0 has no predecessor state worth comparing; later rounds'
    # agreement is a valid fraction
    assert np.all(diffs[1:] >= 0.0) and np.all(diffs <= 1.0)


def test_simple_neurosat_descent():
    """A few AdaBelief steps on one tiny batch reduce the loss — the
    query-path model actually trains (VERDICT round-2 item 6)."""
    from diffusionsat_tpu.models.neurocore import SimpleNeuroSATConfig
    from diffusionsat_tpu.train.adabelief import adabelief

    cfg = SimpleNeuroSATConfig(feature_maps=16, train_rounds=4,
                               test_rounds=4)
    batch = tiny_batch()
    params = neurocore_init(jax.random.key(0), cfg)
    opt = adabelief(learning_rate=3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            _, loss, _, _ = neurocore_apply(p, cfg, batch, key,
                                            training=True)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    losses = []
    key = jax.random.key(7)
    for i in range(25):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        losses.append(float(loss))
    assert min(losses[-5:]) < losses[0], losses
