"""QuerySAT model smoke + semantics tests."""

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

BUCKET = BucketSpec(max_vars=64, max_clauses=128, max_edges=512, max_graphs=4)
CFG = QuerySATConfig(feature_maps=16, query_maps=16, train_rounds=4,
                     test_rounds=8)


def tiny_batch():
    formulas = [(3, [[1, 2], [-1, 3], [-2, -3]]),
                (2, [[1, -2], [-1, 2]])]
    sols = [[1, 0, 1], [1, 1]]
    return build_batch(formulas, BUCKET, solutions=sols)


def test_forward_shapes_and_finiteness():
    batch = tiny_batch()
    params = query_sat_init(jax.random.key(0), CFG)
    out_logits, loss, steps, aux = query_sat_apply(
        params, CFG, batch, jax.random.key(1), training=True,
        labels=batch.solutions)
    assert out_logits.shape == (batch.V, 1)
    assert np.isfinite(float(loss))
    assert 0 <= int(steps) < CFG.train_rounds
    assert aux["logits_all_heads"].shape == (batch.V, CFG.logit_maps)


def test_gradients_flow_and_are_finite():
    batch = tiny_batch()
    params = query_sat_init(jax.random.key(0), CFG)

    def loss_fn(p):
        _, loss, _, _ = query_sat_apply(p, CFG, batch, jax.random.key(1),
                                        training=True, labels=batch.solutions)
        return loss

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # at least some gradients are nonzero
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert total > 0


def test_predict_mode_runs_without_labels():
    batch = tiny_batch()
    params = query_sat_init(jax.random.key(0), CFG)
    out_logits, loss, steps, aux = query_sat_apply(
        params, CFG, batch, jax.random.key(2), training=False)
    assert out_logits.shape == (batch.V, 1)
    assert np.isfinite(float(loss))


def test_diffusion_conditioning_inputs():
    batch = tiny_batch()
    params = query_sat_init(jax.random.key(0), CFG)
    noisy = jnp.full((batch.V, 2), 0.5)
    denoised = jnp.full((batch.V, 1), 0.5)
    out, loss, steps, _ = query_sat_apply(
        params, CFG, batch, jax.random.key(3), training=False,
        noise_scale=jnp.asarray(0.7), noisy_num=noisy, denoised_num=denoised)
    assert out.shape == (batch.V, 1)
    assert np.isfinite(float(loss))


def test_jit_compiles_once_per_bucket():
    batch = tiny_batch()
    params = query_sat_init(jax.random.key(0), CFG)
    fn = jax.jit(lambda p, b, k: query_sat_apply(p, CFG, b, k, training=True,
                                                 labels=b.solutions)[1])
    l1 = fn(params, batch, jax.random.key(1))
    # a different batch with the same bucket must reuse the compilation
    batch2 = build_batch([(4, [[1, 2, 3], [-4, 1]])], BUCKET,
                         solutions=[[1, 1, 1, 0]])
    l2 = fn(params, batch2, jax.random.key(2))
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert fn._cache_size() == 1


def test_noise_skew_shifts_training_noise_distribution():
    """noise_skew>1 skews internal noise draws toward high noise: with the
    same key, the skewed config's drawn noise_scale is u**(1/s) >= u, so
    the two configs produce different (finite) losses, and the transform
    itself has the intended distribution."""
    import dataclasses

    batch = tiny_batch()
    params = query_sat_init(jax.random.key(0), CFG)
    cfg_skew = dataclasses.replace(CFG, noise_skew=3.0)
    _, loss_base, _, _ = query_sat_apply(
        params, CFG, batch, jax.random.key(1), training=True,
        labels=batch.solutions)
    _, loss_skew, _, _ = query_sat_apply(
        params, cfg_skew, batch, jax.random.key(1), training=True,
        labels=batch.solutions)
    assert np.isfinite(float(loss_base)) and np.isfinite(float(loss_skew))
    assert float(loss_base) != float(loss_skew)
    # distribution property of the transform: mean of u**(1/3) is 3/4
    u = jax.random.uniform(jax.random.key(2), (20000,))
    skewed = jnp.power(u, 1.0 / 3.0)
    assert abs(float(jnp.mean(skewed)) - 0.75) < 0.01
    assert float(jnp.mean(skewed > 0.8)) > float(jnp.mean(u > 0.8))
