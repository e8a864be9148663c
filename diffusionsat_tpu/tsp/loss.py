"""TSP losses: supervised CE + unsupervised tour loss with subtour cuts.

Ports of reference `loss/tsp.py:7-37` and `loss/unsupervised_tsp.py:13-84`:
in/out-degree penalties, normalized tour length, and subtour-elimination
cuts fed back from the native finder (as sparse (cut, edge) pairs instead
of the reference's tf.SparseTensor).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diffusionsat_tpu.tsp import PADDING_VALUE
from diffusionsat_tpu.tsp.subtours import subtour_pairs_callback


def inverse_identity(size: int) -> jnp.ndarray:
    return jnp.ones((size, size)) - jnp.eye(size)


def sample_logistic(key, shape, eps=1e-20):
    u = jax.random.uniform(key, shape, minval=eps, maxval=1 - eps)
    return jnp.log(u / (1 - u))


def tsp_unsupervised_loss(predictions: jnp.ndarray,
                          adjacency_matrix: jnp.ndarray,
                          key: jax.Array | None = None,
                          noise: float = 0.0,
                          fast_inaccurate: bool = False,
                          max_cut_pairs: int | None = None) -> jnp.ndarray:
    """predictions: [B, P, P] logits; adjacency: [B, P, P] distances with
    PADDING_VALUE marking padding (reference unsupervised_tsp.py:13-75)."""
    b, p = predictions.shape[0], predictions.shape[1]
    mask = (adjacency_matrix != PADDING_VALUE).astype(jnp.float32) * \
        inverse_identity(p)

    if noise > 0 and key is not None:
        predictions = predictions + sample_logistic(key, predictions.shape) \
            * noise
    preds = jax.nn.sigmoid(predictions) * inverse_identity(p)

    cost_incoming = jnp.mean(jnp.square(1 - jnp.sum(preds * mask, axis=1)))
    cost_outgoing = jnp.mean(jnp.square(1 - jnp.sum(preds * mask, axis=2)))
    preds = preds / (jnp.sum(preds * mask, axis=1, keepdims=True) + 1e-6)
    preds = preds / (jnp.sum(preds * mask, axis=2, keepdims=True) + 1e-6)

    if fast_inaccurate:
        sum_rev = preds + jnp.transpose(preds, (0, 2, 1))
        cost_subtours = jnp.sum(jnp.square(jax.nn.relu(sum_rev - 1))) / b
    else:
        if max_cut_pairs is None:
            max_cut_pairs = 16 * b * p
        pairs, n_pairs = subtour_pairs_callback(
            jax.lax.stop_gradient(preds), adjacency_matrix, max_cut_pairs)
        flat = preds.reshape(-1)
        valid = pairs[:, 0] >= 0
        cut_ids = jnp.where(valid, pairs[:, 0], 0)
        edge_vals = jnp.where(valid, jnp.take(flat, jnp.maximum(pairs[:, 1],
                                                                0)), 0.0)
        n_cuts = max_cut_pairs  # static upper bound on distinct cut ids
        cut_weight = jax.ops.segment_sum(edge_vals, cut_ids,
                                         num_segments=n_cuts)
        has_cut = jax.ops.segment_sum(valid.astype(jnp.float32), cut_ids,
                                      num_segments=n_cuts) > 0
        cost_subtours = jnp.sum(
            jnp.where(has_cut, jnp.square(1 - cut_weight), 0.0)) / b

    adj_sq = jnp.mean(jnp.square(adjacency_matrix * mask), axis=(1, 2),
                      keepdims=True)
    adj_norm = adjacency_matrix * mask * jax.lax.rsqrt(adj_sq + 1e-6)
    cost_length = jnp.mean(preds * adj_norm * mask)

    return (cost_length * 5 + cost_incoming + cost_outgoing +
            cost_subtours * 0.05) / p


def tsp_supervised_loss(predictions: jnp.ndarray, labels: jnp.ndarray
                        ) -> jnp.ndarray:
    """Per-edge sigmoid CE against the optimal-tour edge labels
    (reference loss/tsp.py:24-33)."""
    p = predictions.shape[1]
    mask = (labels != PADDING_VALUE).astype(jnp.float32) * \
        inverse_identity(p)
    logits = predictions
    lbl = jnp.clip(labels, 0.0, 1.0)
    ce = jnp.maximum(logits, 0) - logits * lbl + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    ce = ce * mask
    item_loss = jnp.sum(ce, axis=(1, 2)) / jnp.maximum(
        jnp.sum(mask, axis=(1, 2)), 1.0)
    return jnp.mean(item_loss)


def tsp_loss(predictions, adjacency_matrix, labels=None, key=None,
             noise=0.0, fast_inaccurate=False, supervised=False,
             unsupervised=True):
    """Combined loss (reference loss/tsp.py:7-37). predictions may carry a
    trailing singleton feature axis."""
    if predictions.ndim == 4:
        predictions = predictions[..., 0]
    loss = 0.0
    if supervised:
        loss += tsp_supervised_loss(predictions, labels)
    if unsupervised:
        loss += tsp_unsupervised_loss(predictions, adjacency_matrix, key,
                                      noise, fast_inaccurate)
    return loss
