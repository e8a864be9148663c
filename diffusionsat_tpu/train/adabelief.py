"""AdaBelief optimizer as an optax gradient transformation.

Port of the reference's vendored AdaBelief (`optimization/AdaBelief.py:29`,
dense path `:183-259`) including its two non-standard features:

- adaptive per-tensor gradient clipping by
  sqrt(sum(v) / (1 - beta2^t)) * clip_multiplier + clip_epsilon
  (reference `:208-210`), applied BEFORE the moment updates;
- epsilon added into the belief accumulator every step (`:222-225`),
  not just in the denominator;

plus RAdam-style rectification with an SMA threshold gate (`:234-249`).
The reference diffusion driver uses lr = CosineDecay(1e-3, train_steps,
alpha=0.5), beta1=0.9, beta2=0.999, eps=1e-8, clip_gradients=True
(`diffusion_training.py:42-60`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class AdaBeliefState(NamedTuple):
    count: jnp.ndarray  # int32 step counter
    m: optax.Updates
    v: optax.Updates


def cosine_decay_schedule(initial_lr: float = 1e-3, decay_steps: int = 167_000,
                          alpha: float = 0.5) -> optax.Schedule:
    """Keras CosineDecay semantics (reference diffusion_training.py:51-54)."""
    def schedule(count):
        step = jnp.minimum(count, decay_steps).astype(jnp.float32)
        cosine = 0.5 * (1 + jnp.cos(jnp.pi * step / decay_steps))
        decayed = (1 - alpha) * cosine + alpha
        return initial_lr * decayed
    return schedule


def gradient_accumulator(inner: optax.GradientTransformation, every: int
                         ) -> optax.GradientTransformation:
    """Accumulate gradients over `every` steps, applying the inner update
    on the boundary (reference optimization/gradient_accumulator.py:8-81
    `GradientAccumulatorWrapper`)."""
    return optax.MultiSteps(inner, every_k_schedule=every)


def adabelief(learning_rate: float | optax.Schedule = 1e-3,
              b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
              weight_decay: float = 0.0, rectify: bool = True,
              sma_threshold: float = 5.0, clip_gradients: bool = True,
              clip_multiplier: float = 3.0, clip_epsilon: float = 1e-2,
              ) -> optax.GradientTransformation:
    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return AdaBeliefState(count=jnp.zeros([], jnp.int32),
                              m=zeros, v=jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        count = state.count + 1
        t = count.astype(jnp.float32)
        b1p = jnp.power(b1, t)
        b2p = jnp.power(b2, t)

        def clip(g, v):
            clip_val = jnp.sqrt(jnp.sum(v) / (1.0 - b2p)) * clip_multiplier \
                + clip_epsilon
            norm = jnp.sqrt(jnp.sum(jnp.square(g)))
            scale = jnp.where(norm > clip_val, clip_val / jnp.maximum(norm, 1e-30),
                              1.0)
            return g * scale

        if clip_gradients:
            grads = jax.tree.map(clip, updates, state.v)
        else:
            grads = updates

        new_m = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                             state.m, grads)
        # belief: deviation of the gradient from its running mean, with eps
        # folded into the accumulator each step (reference :222-225)
        new_v = jax.tree.map(
            lambda v, g, m: b2 * v + (1 - b2) * jnp.square(g - m) + eps,
            state.v, grads, new_m)

        m_corr = jax.tree.map(lambda m: m / (1 - b1p), new_m)
        v_corr = jax.tree.map(lambda v: jnp.sqrt(v / (1 - b2p)), new_v)

        sma_inf = 2.0 / (1.0 - b2) - 1.0
        sma_t = sma_inf - 2.0 * t * b2p / (1.0 - b2p)
        r_t = jnp.sqrt((sma_t - 4.0) / (sma_inf - 4.0) *
                       (sma_t - 2.0) / (sma_inf - 2.0) * sma_inf / sma_t)

        if rectify:
            def step_fn(mc, vc):
                return jnp.where(sma_t >= sma_threshold,
                                 r_t * mc / (vc + eps), mc)
        else:
            def step_fn(mc, vc):
                return mc / (vc + eps)

        var_t = jax.tree.map(step_fn, m_corr, v_corr)
        if weight_decay > 0 and params is not None:
            var_t = jax.tree.map(lambda u, p: u + weight_decay * p,
                                 var_t, params)

        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        new_updates = jax.tree.map(lambda u: -lr * u, var_t)
        return new_updates, AdaBeliefState(count=count, m=new_m, v=new_v)

    return optax.GradientTransformation(init_fn, update_fn)
