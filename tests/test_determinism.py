"""Reproducibility: identical keys give identical results (explicit PRNG
threading — the property the reference's implicit tf.random state lacks)."""

import numpy as np

import jax
import jax.numpy as jnp

from diffusionsat_tpu.models.query_sat import (
    QuerySATConfig,
    query_sat_apply,
    query_sat_init,
)
from tests.test_query_sat import BUCKET, tiny_batch

CFG = QuerySATConfig(feature_maps=16, query_maps=16, train_rounds=3,
                     test_rounds=3)


def test_same_key_same_result():
    batch = tiny_batch()
    params = query_sat_init(jax.random.key(0), CFG)
    outs = [query_sat_apply(params, CFG, batch, jax.random.key(5),
                            training=True, labels=batch.solutions)
            for _ in range(2)]
    np.testing.assert_array_equal(np.asarray(outs[0][0]),
                                  np.asarray(outs[1][0]))
    assert float(outs[0][1]) == float(outs[1][1])


def test_different_key_different_result():
    batch = tiny_batch()
    params = query_sat_init(jax.random.key(0), CFG)
    l1 = float(query_sat_apply(params, CFG, batch, jax.random.key(5),
                               training=True, labels=batch.solutions)[1])
    l2 = float(query_sat_apply(params, CFG, batch, jax.random.key(6),
                               training=True, labels=batch.solutions)[1])
    assert l1 != l2
