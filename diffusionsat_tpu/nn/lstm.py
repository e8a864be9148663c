"""Minimal LSTM cell with Keras LSTMCell semantics.

Used by NeuroSAT's literal/clause updates (reference `model/neuro_sat.py:24-25`
uses `tf.keras.layers.LSTMCell`): glorot-uniform input kernel, orthogonal
recurrent kernel, zero bias with unit forget-gate bias, gate order i,f,c,o.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _orthogonal(key, n, m):
    a = jax.random.normal(key, (max(n, m), min(n, m)))
    q, r = jnp.linalg.qr(a)
    q = q * jnp.sign(jnp.diag(r))
    return q[:n, :m] if n >= m else q[:m, :n].T


def lstm_init(key: jax.Array, in_dim: int, hidden: int) -> dict:
    k1, k2 = jax.random.split(key)
    limit = jnp.sqrt(6.0 / (in_dim + 4 * hidden))
    kernel = jax.random.uniform(k1, (in_dim, 4 * hidden), jnp.float32,
                                -limit, limit)
    recurrent = _orthogonal(k2, hidden, 4 * hidden)
    bias = jnp.zeros(4 * hidden).at[hidden:2 * hidden].set(1.0)  # forget=1
    return {"kernel": kernel, "recurrent": recurrent, "bias": bias}


def lstm_apply(params: dict, x: jnp.ndarray, state: tuple[jnp.ndarray, jnp.ndarray]
               ) -> tuple[jnp.ndarray, tuple[jnp.ndarray, jnp.ndarray]]:
    """state = (h, c); returns (h_new, (h_new, c_new))."""
    h, c = state
    z = jnp.dot(x, params["kernel"], preferred_element_type=jnp.float32) + \
        jnp.dot(h, params["recurrent"], preferred_element_type=jnp.float32) + \
        params["bias"]
    hid = h.shape[-1]
    i = jax.nn.sigmoid(z[..., :hid])
    f = jax.nn.sigmoid(z[..., hid:2 * hid])
    g = jnp.tanh(z[..., 2 * hid:3 * hid])
    o = jax.nn.sigmoid(z[..., 3 * hid:])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, (h_new, c_new)
