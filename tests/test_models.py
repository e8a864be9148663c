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
