"""TSPMatrixSE — dense-matrix TSP model (DenseGNN or MatrixSE core).

Port of reference `model/tsp_matrix_se.py:19-132`: normalized distance
matrix in, recurrent graph layer, per-edge logits with a 1/(n-1) prior
bias, unsupervised (or supervised CE) tour loss summed over rounds.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from diffusionsat_tpu.nn.mlp import MLPConfig, mlp_apply, mlp_init
from diffusionsat_tpu.tsp import PADDING_VALUE
from diffusionsat_tpu.tsp.layers import (
    dense_gnn_apply,
    dense_gnn_init,
    matrix_se_apply,
    matrix_se_init,
)
from diffusionsat_tpu.tsp.loss import inverse_identity, tsp_loss


@dataclasses.dataclass(frozen=True)
class TSPMatrixSEConfig:
    feature_maps: int = 64
    block_count: int = 1
    rounds: int = 16
    use_matrix_se: bool = False
    n_vertices_prior: int = 16
    supervised: bool = False

    def logits_cfg(self):
        return MLPConfig(2, self.feature_maps, 1, do_layer_norm=True,
                         norm_axis=(1, 2))


def tsp_matrix_se_init(key: jax.Array, cfg: TSPMatrixSEConfig) -> dict:
    ks = jax.random.split(key, 3)
    limit = math.sqrt(6.0 / (1 + cfg.feature_maps))
    params = {
        "input_layer_w": jax.random.uniform(
            ks[0], (1, cfg.feature_maps), jnp.float32, -limit, limit),
        "input_layer_b": jnp.zeros((cfg.feature_maps,)),
        "logits_layer": mlp_init(ks[1], cfg.logits_cfg(), cfg.feature_maps),
    }
    if cfg.use_matrix_se:
        params["graph_layer"] = matrix_se_init(ks[2], cfg.feature_maps,
                                               cfg.block_count)
    else:
        params["graph_layer"] = dense_gnn_init(ks[2], cfg.feature_maps)
    return params


def tsp_matrix_se_apply(params: dict, cfg: TSPMatrixSEConfig,
                        adj_matrix: jnp.ndarray, labels: jnp.ndarray,
                        key: jax.Array, training: bool = True):
    """adj_matrix: [B, P, P] distances (PADDING_VALUE-padded); labels:
    [B, P, P] optimal-tour edges or PADDING_VALUE. Returns
    (logits [B,P,P,1], total_loss, last_loss)."""
    p = adj_matrix.shape[1]
    mask = (labels != PADDING_VALUE).astype(jnp.float32) * \
        inverse_identity(p)

    adj_sq = jnp.mean(jnp.square(adj_matrix * mask), axis=(1, 2),
                      keepdims=True)
    inputs_norm = adj_matrix * mask * jax.lax.rsqrt(adj_sq + 1e-6)
    state = (inputs_norm[..., None] @ params["input_layer_w"] +
             params["input_layer_b"]) * 0.25

    logit_bias = math.log(1.0 / (cfg.n_vertices_prior - 1) /
                          (1 - 1.0 / (cfg.n_vertices_prior - 1)))

    total_loss = 0.0
    last_loss = 0.0
    logits = jnp.zeros((adj_matrix.shape[0], p, p, 1))
    keys = jax.random.split(key, cfg.rounds)
    for step in range(cfg.rounds):
        if cfg.use_matrix_se:
            state = matrix_se_apply(params["graph_layer"], state)
        else:
            state = dense_gnn_apply(params["graph_layer"], state, mask,
                                    cfg.feature_maps)
        logits = mlp_apply(params["logits_layer"], cfg.logits_cfg(), state) \
            + logit_bias
        if training:
            loss = tsp_loss(logits, adj_matrix, labels=labels,
                            key=keys[step], supervised=cfg.supervised,
                            unsupervised=not cfg.supervised)
            total_loss = total_loss + loss
            last_loss = loss
    return logits, total_loss, last_loss
