"""MLP as explicit param pytrees (init/apply pure functions).

Port of the reference `model/mlp.py:12` (Dense stack, leaky_relu hidden
activations, linear output). Explicit pytrees keep the recurrent models'
control flow (grad-inside-scan, while_loop inference) free of framework
machinery — everything is a pure function of (params, inputs).

Initialization matches Keras Dense defaults: glorot_uniform kernels, zero
biases.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp


def leaky_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Reference model/mlp.py:7-9."""
    sg = jax.nn.sigmoid(1.702 * x)
    return x * (0.8 * sg + 0.2)


def leaky_relu(x: jnp.ndarray) -> jnp.ndarray:
    """tf.nn.leaky_relu default (alpha=0.2), the reference MLP activation."""
    return jax.nn.leaky_relu(x, negative_slope=0.2)


class MLPConfig(NamedTuple):
    layer_count: int
    hidden: int
    out: int
    activation: str = "leaky_relu"  # hidden activation
    out_activation: str | None = None
    init_zero: bool = False
    out_bias: float | None = None
    # LayerNorm (no-bias first Dense + norm + activation) after the first
    # hidden layer, matching reference model/mlp.py:26-31
    do_layer_norm: bool = False
    norm_axis: int = 0


_ACTS = {
    "leaky_relu": leaky_relu,
    "leaky_gelu": leaky_gelu,
    "relu": jax.nn.relu,
    "relu6": lambda x: jnp.clip(x, 0.0, 6.0),
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    None: lambda x: x,
}


def _glorot(key, fan_in: int, fan_out: int) -> jnp.ndarray:
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, (fan_in, fan_out), jnp.float32,
                              -limit, limit)


def mlp_init(key: jax.Array, cfg: MLPConfig, in_dim: int) -> dict:
    """Create {'w': [kernels...], 'b': [biases...]} for the Dense stack."""
    dims = [in_dim] + [cfg.hidden] * (cfg.layer_count - 1) + [cfg.out]
    ws, bs = [], []
    keys = jax.random.split(key, len(dims) - 1)
    for i, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:])):
        last = i == len(dims) - 2
        if last and cfg.init_zero:
            ws.append(jnp.zeros((d_in, d_out), jnp.float32))
        else:
            ws.append(_glorot(keys[i], d_in, d_out))
        bias_val = cfg.out_bias if (last and cfg.out_bias is not None) else 0.0
        bs.append(jnp.full((d_out,), bias_val, jnp.float32))
    params = {"w": ws, "b": bs}
    if cfg.do_layer_norm and cfg.layer_count > 1:
        params["norm_bias"] = jnp.zeros((cfg.hidden,), jnp.float32)
    return params


def mlp_apply(params: dict, cfg: MLPConfig, x: jnp.ndarray,
              compute_dtype=None) -> jnp.ndarray:
    """Apply the Dense stack. With `compute_dtype` (e.g. jnp.bfloat16) the
    matmul operands are cast down while accumulation and activations stay
    float32 — the standard TPU mixed-precision recipe (MXU bf16 inputs,
    f32 accumulate)."""
    from diffusionsat_tpu.nn.normalization import layer_norm

    act = _ACTS[cfg.activation]
    out_act = _ACTS[cfg.out_activation]
    n = len(params["w"])
    # block-bf16 flow: bf16 inputs (+ bf16 params, cast once by the
    # caller) run native bf16 matmuls with f32 accumulation; hidden
    # activations are written back as bf16, the LAST layer's output stays
    # f32 for the loss chain. Unlike compute_dtype this adds no per-call
    # operand casts.
    bf_flow = (compute_dtype is None and x.dtype == jnp.bfloat16)

    def dot(a, w):
        if compute_dtype is not None:
            a = a.astype(compute_dtype)
            w = w.astype(compute_dtype)
        return jnp.dot(a, w, preferred_element_type=jnp.float32)

    for i, (w, b) in enumerate(zip(params["w"], params["b"])):
        last = i == n - 1
        if cfg.do_layer_norm and not last:
            # reference model/mlp.py:28-31: Dense (bias only for i>0) ->
            # LayerNorm after the first hidden layer -> activation
            x = dot(x, w)
            if i > 0:
                x = x + b
            if i == 0:
                x = layer_norm(x, axis=cfg.norm_axis, subtract_mean=True,
                               bias=params["norm_bias"])
            x = act(x)
        else:
            x = dot(x, w) + b
            x = out_act(x) if last else act(x)
            if bf_flow and not last:
                x = x.astype(jnp.bfloat16)
    return x
