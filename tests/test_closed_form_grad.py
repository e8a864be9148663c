"""Closed-form query gradient == jax.grad of the clause loss."""

import numpy as np

import jax
import jax.numpy as jnp

from diffusionsat_tpu.graph.batch import BucketSpec, build_batch
from diffusionsat_tpu.losses.sat import softplus_loss, softplus_loss_and_grad

BUCKET = BucketSpec(max_vars=64, max_clauses=128, max_edges=512, max_graphs=4)


def test_closed_form_matches_autodiff():
    rng = np.random.default_rng(0)
    formulas = []
    for _ in range(3):
        n = int(rng.integers(4, 10))
        clauses = [[int(v) if rng.random() < 0.5 else -int(v)
                    for v in (rng.choice(n, size=3, replace=False) + 1)]
                   for _ in range(3 * n)]
        formulas.append((n, clauses))
    batch = build_batch(formulas, BUCKET)

    K = 8
    q = jnp.asarray(rng.normal(size=(batch.V, K)).astype(np.float32))

    def loss_fn(x):
        return jnp.sum(softplus_loss(x, batch))

    want_grad = jax.grad(loss_fn)(q)
    got_loss, got_grad = softplus_loss_and_grad(q, batch)
    np.testing.assert_allclose(np.asarray(got_grad), np.asarray(want_grad),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_loss),
                               np.asarray(softplus_loss(q, batch)),
                               rtol=1e-6, atol=1e-7)

    # second-order: outer gradients through the closed form match outer
    # gradients through the nested jax.grad
    def outer_auto(x):
        g = jax.grad(loss_fn)(x)
        return jnp.sum(jnp.sin(g))

    def outer_closed(x):
        _, g = softplus_loss_and_grad(x, batch)
        return jnp.sum(jnp.sin(g))

    g1 = jax.grad(outer_auto)(q)
    g2 = jax.grad(outer_closed)(q)
    # the two programs are mathematically equal but structurally different
    # (nested autodiff vs first-order closed form), so summation order
    # differs: compare with an fp-noise absolute floor
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-3,
                               atol=5e-5)
