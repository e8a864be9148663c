"""Dense-matrix TSP layers: DenseGNN and MatrixSE (2-D Benes network).

Ports of reference `layers/dense_gnn.py:9-66` (full-graph GNN step over a
[B, N, N, F] edge tensor with ReZero residual) and `layers/matrix_se.py`
(Matrix Shuffle-Exchange: Z-order flatten, quaternary shuffle Benes blocks
with shared switch units).
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from diffusionsat_tpu.nn.mlp import MLPConfig, mlp_apply, mlp_init
from diffusionsat_tpu.nn.normalization import layer_norm


def _inv_sigmoid(y: float) -> float:
    return math.log(y / (1 - y))


# ---------------------------------------------------------------------------
# DenseGNN


def dense_gnn_init(key: jax.Array, feature_maps: int) -> dict:
    h = feature_maps * 2
    ks = jax.random.split(key, 3)
    return {
        "incoming_edge_mlp": mlp_init(
            ks[0], MLPConfig(3, h, feature_maps, do_layer_norm=True),
            feature_maps),
        "outgoing_edge_mlp": mlp_init(
            ks[1], MLPConfig(3, h, feature_maps, do_layer_norm=True),
            feature_maps),
        "edge_mlp": mlp_init(
            ks[2], MLPConfig(3, h * 2, feature_maps, do_layer_norm=True),
            feature_maps * 5),
        "prev_weight": jnp.full((feature_maps,), _inv_sigmoid(0.5)),
        "candidate_weight": jnp.zeros((feature_maps,)),
    }


def dense_gnn_apply(params: dict, x: jnp.ndarray, mask: jnp.ndarray,
                    feature_maps: int) -> jnp.ndarray:
    """x: [B, N, N, F]; mask: [B, N, N] (1 = real edge). Reference
    layers/dense_gnn.py:33-66."""
    n = x.shape[1]
    sqrt_n = jnp.sqrt(jnp.asarray(n, jnp.float32))
    m = mask[..., None]
    h = feature_maps * 2
    in_cfg = MLPConfig(3, h, feature_maps, do_layer_norm=True, norm_axis=(1, 2))
    edge_cfg = MLPConfig(3, h * 2, feature_maps, do_layer_norm=True,
                         norm_axis=(1, 2))

    incoming = mlp_apply(params["incoming_edge_mlp"], in_cfg, x * m)
    outgoing = mlp_apply(params["outgoing_edge_mlp"], in_cfg, x * m)
    incoming_state = jnp.sum(incoming * m, axis=1) / sqrt_n  # [B, N, F]
    outgoing_state = jnp.sum(outgoing * m, axis=2) / sqrt_n
    vertex_state = jnp.concatenate([incoming_state, outgoing_state], axis=-1)

    tile_in = jnp.broadcast_to(vertex_state[:, None, :, :],
                               (x.shape[0], n, n, vertex_state.shape[-1]))
    tile_out = jnp.broadcast_to(vertex_state[:, :, None, :],
                                (x.shape[0], n, n, vertex_state.shape[-1]))
    edge_unit = jnp.concatenate([x, tile_in, tile_out], axis=-1)
    candidate = mlp_apply(params["edge_mlp"], edge_cfg, edge_unit)

    return x * jax.nn.sigmoid(params["prev_weight"]) + \
        candidate * params["candidate_weight"]


# ---------------------------------------------------------------------------
# MatrixSE: Z-order + quaternary shuffles (reference utils/shuffle.py)


def _z_order_indices(n: int) -> np.ndarray:
    """Z-order-curve readout of an n x n index matrix (utils/shuffle.py)."""
    def rec(x, y, length):
        if length == 1:
            return [x * n + y]
        mid = length // 2
        return (rec(x, y, mid) + rec(x, y + mid, mid) +
                rec(x + mid, y, mid) + rec(x + mid, y + mid, mid))
    return np.asarray(rec(0, 0, n), dtype=np.int32)


def _quaternary_digits(max_value: int) -> int:
    return max(1, math.ceil(math.log(max_value + 1, 4)))


def _qrol(x: int, digits: int, level: int) -> int:
    """Quaternary cyclic left shift of the digit string."""
    mask = (1 << (2 * digits)) - 1
    top = (x >> (2 * (digits - 1))) & 3
    return ((x << 2) & mask) | top


def _qror(x: int, digits: int, level: int) -> int:
    low = x & 3
    return (x >> 2) | (low << (2 * (digits - 1)))


def _shuffle_indices(length: int, left: bool) -> np.ndarray:
    digits = _quaternary_digits(length - 1)
    fn = _qrol if left else _qror
    return np.asarray([fn(i, digits, 0) for i in range(length)],
                      dtype=np.int32)


def switch_unit_init(key: jax.Array, num_units: int, channel_count: int = 4
                     ) -> dict:
    reshaped = num_units * channel_count
    k1, k2 = jax.random.split(key)
    residual_weight = 0.9
    scale_init = math.log(residual_weight / (1 - residual_weight))
    limit1 = math.sqrt(6.0 / (reshaped + reshaped * 2))
    limit2 = math.sqrt(6.0 / (reshaped * 2 + reshaped))
    return {
        "residual_scale": jnp.full((reshaped,), scale_init),
        "linear_one": jax.random.uniform(k1, (reshaped, reshaped * 2),
                                         jnp.float32, -limit1, limit1),
        "linear_two_w": jax.random.uniform(k2, (reshaped * 2, reshaped),
                                           jnp.float32, -limit2, limit2),
        "linear_two_b": jnp.zeros((reshaped,)),
        "norm_bias": jnp.zeros((reshaped * 2,)),
    }


def switch_unit_apply(params: dict, x: jnp.ndarray, channel_count: int = 4
                      ) -> jnp.ndarray:
    """Quaternary switch unit (reference layers/matrix_se.py:40-84).
    x: [B, L, U] -> groups of 4 positions processed jointly."""
    b, length, units = x.shape
    reshaped = units * channel_count
    candidate_weight = math.sqrt(1 - 0.9 ** 2) * 0.25
    h = x.reshape(b, length // channel_count, reshaped)
    first = jnp.dot(h, params["linear_one"],
                    preferred_element_type=jnp.float32)
    norm = layer_norm(first, axis=-1, subtract_mean=True,
                      bias=params["norm_bias"])
    gelu = jax.nn.gelu(norm)
    second = jnp.dot(gelu, params["linear_two_w"],
                     preferred_element_type=jnp.float32) + \
        params["linear_two_b"]
    residual_scale = jax.nn.sigmoid(params["residual_scale"])
    out = residual_scale * h + second * candidate_weight
    return out.reshape(b, length, units)


def benes_block_init(key: jax.Array, num_units: int) -> dict:
    ks = jax.random.split(key, 3)
    return {
        "forward": switch_unit_init(ks[0], num_units),
        "reverse": switch_unit_init(ks[1], num_units),
        "middle": switch_unit_init(ks[2], num_units),
    }


def benes_block_apply(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Benes block: log2(L)-1 forward-shuffled + reverse-shuffled switch
    layers with shared weights (reference layers/matrix_se.py:146-171)."""
    length = x.shape[1]
    level_count = int(math.floor(math.log2(length - 1)))
    fwd_idx = jnp.asarray(_shuffle_indices(length, left=False))
    rev_idx = jnp.asarray(_shuffle_indices(length, left=True))
    h = x
    for _ in range(level_count):
        h = switch_unit_apply(params["forward"], h)
        h = jnp.take(h, fwd_idx, axis=1)
    for _ in range(level_count):
        h = switch_unit_apply(params["reverse"], h)
        h = jnp.take(h, rev_idx, axis=1)
    return switch_unit_apply(params["middle"], h)


def matrix_se_init(key: jax.Array, num_units: int, block_count: int = 1
                   ) -> dict:
    ks = jax.random.split(key, block_count)
    return {"blocks": [benes_block_init(k, num_units) for k in ks]}


def matrix_se_apply(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """x: [B, N, N, F] with N a power of 2 (N*N a power of 4)."""
    b, n, _, f = x.shape
    z_idx = jnp.asarray(_z_order_indices(n))
    inv = np.empty(n * n, dtype=np.int32)
    inv[np.asarray(_z_order_indices(n))] = np.arange(n * n)
    inv_idx = jnp.asarray(inv)

    h = x.reshape(b, n * n, f)
    h = jnp.take(h, z_idx, axis=1)
    for block in params["blocks"]:
        h = benes_block_apply(block, h)
    h = jnp.take(h, inv_idx, axis=1)
    return h.reshape(b, n, n, f)
