"""Multinomial (binary) diffusion schedule math.

Port of the reference's diffusion utilities in `model/query_sat.py:13-82`
(forward corruption, timestep embedding, normalized Bernoulli-KL training
loss) and the reverse posterior step in
`satuniformity/DiffusionSampler.py:29-37`. All functions are pure and take
explicit PRNG keys.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

T_POWER = 0.5  # reference model/query_sat.py:13


def distribution_at_time(x: jnp.ndarray, time_increment: jnp.ndarray
                         ) -> jnp.ndarray:
    """Blend toward the uniform 2-class distribution
    (reference model/query_sat.py:66-68)."""
    n_classes = 2
    return x * (1 - time_increment) + time_increment / n_classes


def randomized_rounding(key: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
    """Stochastic binarization of a 2-class distribution [N, 2] -> one-hot
    [N, 2] (reference model/query_sat.py:55-60)."""
    x0 = x[..., 0:1]
    noise = jax.random.uniform(key, x0.shape)
    rounded = jnp.floor(x0 + noise)
    return jnp.concatenate([rounded, 1 - rounded], axis=-1)


def add_t_emb(x: jnp.ndarray, noise_scale: jnp.ndarray) -> jnp.ndarray:
    """Append a constant noise-level column (reference model/query_sat.py:70-74).
    Works for any leading shape [..., F]."""
    t_col = jnp.zeros(x.shape[:-1] + (1,), x.dtype) + noise_scale
    return jnp.concatenate([x, t_col], axis=-1)


def construct_training_input(key: jax.Array, labels: jnp.ndarray,
                             noise_scale: jnp.ndarray) -> jnp.ndarray:
    """Corrupt the 0/1 label bits to time `noise_scale`: one-hot ->
    distribution_at_time(noise^T_POWER) -> randomized rounding
    (reference model/query_sat.py:76-82). Returns [V, 2]."""
    onehot = jax.nn.one_hot(labels, 2, dtype=jnp.float32)
    num_at_t = distribution_at_time(onehot, jnp.power(noise_scale, T_POWER))
    return randomized_rounding(key, num_at_t)


def _bernoulli_kl(p: jnp.ndarray, q: jnp.ndarray, eps: float = 1e-20
                  ) -> jnp.ndarray:
    """KL(Bernoulli(p) || Bernoulli(q))."""
    p = jnp.clip(p, eps, 1 - eps)
    q = jnp.clip(q, eps, 1 - eps)
    return p * (jnp.log(p) - jnp.log(q)) + \
        (1 - p) * (jnp.log1p(-p) - jnp.log1p(-q))


def diffusion_kl_loss(labels: jnp.ndarray, prediction_logits: jnp.ndarray,
                      t: jnp.ndarray, label_smoothing: float = 0.01
                      ) -> jnp.ndarray:
    """Normalized Bernoulli KL between labels and predictions both pushed to
    time t (reference `train_loss`, model/query_sat.py:40-53).

    labels: [V, K] in {0,1} (float); prediction_logits: [V, K]; t scalar.
    """
    t = jnp.power(t, T_POWER)
    labels_at_t = distribution_at_time(labels, jnp.minimum(t + label_smoothing, 1.0))
    probs = jax.nn.sigmoid(prediction_logits)
    probs_at_t = distribution_at_time(probs, t)
    loss = _bernoulli_kl(labels_at_t, probs_at_t)
    # normalizer: KL between fully-noised zero-label at t and at 1
    p_norm1 = distribution_at_time(0.0, jnp.minimum(t + label_smoothing, 1.0))
    p_norm2 = distribution_at_time(0.0, 1.0)
    norm = _bernoulli_kl(p_norm1, p_norm2)
    return loss / (norm + 1e-4)


def reverse_distribution_step_theoretic(x: jnp.ndarray, x0: jnp.ndarray,
                                        t: jnp.ndarray, t_increment: float
                                        ) -> jnp.ndarray:
    """One categorical reverse-posterior step
    (reference satuniformity/DiffusionSampler.py:29-37).

    x: current noisy distribution [V, 2]; x0: model's denoised distribution
    [V, 2]; t: current noise scale; t_increment: 1/N.
    """
    t1 = jnp.power(t, T_POWER)
    t2 = jnp.power(jnp.maximum(0.0, t - t_increment), T_POWER)
    x_new = distribution_at_time(x0, t1)
    alpha_t = (1 - t1) / (1 - t2)
    x_unnormed = distribution_at_time(x, 1 - alpha_t) * x_new
    return x_unnormed / (jnp.sum(x_unnormed, axis=-1, keepdims=True) + 1e-8)
