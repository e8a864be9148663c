"""Sparse graph attention over the literal-clause incidence edges.

Port of reference `layers/attention.py`: the SDDMM helper
(`matmul_with_sparse_mask:7` — per-edge dot of endpoint features) and the
three attention layers. tf.sparse softmax/matmul become masked segment ops
over the SatBatch edge lists (clause-sorted ordering throughout).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diffusionsat_tpu.graph.batch import SatBatch
from diffusionsat_tpu.nn.mlp import MLPConfig, mlp_apply, mlp_init


def edge_dot(a_lit: jnp.ndarray, b_clause: jnp.ndarray, batch: SatBatch,
             scale: float = 1.0) -> jnp.ndarray:
    """SDDMM (reference matmul_with_sparse_mask:7-16): per-edge dot product
    of literal-side and clause-side features. Returns [E]."""
    a_e = jnp.take(a_lit, batch.edge_lit_c, axis=0)
    b_e = jnp.take(b_clause, batch.edge_clause_c, axis=0)
    return jnp.sum(a_e * b_e, axis=-1) * scale * batch.edge_mask_c


def edge_softmax_by_clause(scores: jnp.ndarray, batch: SatBatch
                           ) -> jnp.ndarray:
    """Softmax of edge scores normalized within each clause
    (tf.sparse.softmax over the clause axis, reference :61)."""
    neg_inf = jnp.finfo(scores.dtype).min
    masked = jnp.where(batch.edge_mask_c > 0, scores, neg_inf)
    seg_max = jax.ops.segment_max(masked, batch.edge_clause_c,
                                  num_segments=batch.C,
                                  indices_are_sorted=True)
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
    ex = jnp.exp(masked - jnp.take(seg_max, batch.edge_clause_c)) * \
        batch.edge_mask_c
    denom = jax.ops.segment_sum(ex, batch.edge_clause_c,
                                num_segments=batch.C,
                                indices_are_sorted=True)
    return ex / jnp.maximum(jnp.take(denom, batch.edge_clause_c), 1e-20)


def _edge_weighted_clause_to_lit(weights_e: jnp.ndarray, values: jnp.ndarray,
                                 batch: SatBatch) -> jnp.ndarray:
    """sum over edges into literals of weight_e * values[clause]. [2V, F]."""
    v_e = jnp.take(values, batch.edge_clause_c, axis=0) * weights_e[:, None]
    return jax.ops.segment_sum(v_e, batch.edge_lit_c,
                               num_segments=2 * batch.V)


# ---------------------------------------------------------------------------
# Additive attention (reference layers/attention.py:83-117)

def additive_attention_init(key: jax.Array, hidden_maps: int, query_dim: int,
                            memory_dim: int, heads: int = 1) -> dict:
    k1, k2 = jax.random.split(key)
    pre_cfg = MLPConfig(3, hidden_maps, heads, do_layer_norm=True)
    mem_cfg = MLPConfig(3, hidden_maps, hidden_maps, do_layer_norm=True)
    return {
        "pre_process": mlp_init(k1, pre_cfg, query_dim + memory_dim),
        "memory_mlp": mlp_init(k2, mem_cfg, memory_dim),
    }


def additive_attention_apply(params: dict, query: jnp.ndarray,
                             memory: jnp.ndarray, batch: SatBatch,
                             hidden: int, heads: int = 1) -> jnp.ndarray:
    """query: [2V, dq] literal-side; memory: [C, dm] clause-side.
    Returns [2V, hidden]."""
    pre_cfg = MLPConfig(3, hidden, heads, do_layer_norm=True)
    mem_cfg = MLPConfig(3, hidden, hidden, do_layer_norm=True)

    q_e = jnp.take(query, batch.edge_lit_c, axis=0)
    k_e = jnp.take(memory, batch.edge_clause_c, axis=0)
    units = jnp.concatenate([q_e, k_e], axis=-1)
    units = jnp.tanh(mlp_apply(params["pre_process"], pre_cfg, units))
    units = units * batch.edge_mask_c[:, None]

    mem = mlp_apply(params["memory_mlp"], mem_cfg, memory)
    outs = []
    for h in range(heads):
        outs.append(_edge_weighted_clause_to_lit(units[:, h], mem, batch))
    return jnp.concatenate(outs, axis=-1)


# ---------------------------------------------------------------------------
# Scaled dot-product attention (reference layers/attention.py:19-80)

def dot_attention_init(key: jax.Array, hidden_nmaps: int, output_nmaps: int,
                       query_dim: int, memory_dim: int, heads: int = 4
                       ) -> dict:
    ks = jax.random.split(key, 4)
    mk = lambda k, i, o: mlp_init(k, MLPConfig(1, o, o), i)
    return {
        "query_layer": mk(ks[0], query_dim, hidden_nmaps),
        "key_layer": mk(ks[1], memory_dim, hidden_nmaps),
        "value_layer": mk(ks[2], memory_dim, output_nmaps),
        "output_weight": mk(ks[3], output_nmaps, output_nmaps),
    }


def dot_attention_apply(params: dict, query: jnp.ndarray, memory: jnp.ndarray,
                        batch: SatBatch, hidden: int, heads: int = 4
                        ) -> jnp.ndarray:
    """Multi-head dot attention: scores per edge, softmax per clause,
    aggregation per literal. query [2V, dq], memory [C, dm] -> [2V, out]."""
    act = jax.nn.leaky_relu

    def dense(p, x):
        return act(jnp.dot(x, p["w"][0],
                           preferred_element_type=jnp.float32) + p["b"][0])

    q = dense(params["query_layer"], query)
    k = dense(params["key_layer"], memory)
    v = dense(params["value_layer"], memory)

    q_h = jnp.split(q, heads, axis=-1)
    k_h = jnp.split(k, heads, axis=-1)
    v_h = jnp.split(v, heads, axis=-1)
    scale = 1.0 / jnp.sqrt(jnp.asarray(hidden // heads, jnp.float32))

    results = []
    for i in range(heads):
        scores = edge_dot(q_h[i], k_h[i], batch, scale)
        coef = edge_softmax_by_clause(scores, batch)
        results.append(_edge_weighted_clause_to_lit(coef, v_h[i], batch))
    output = jnp.concatenate(results, axis=-1)
    p = params["output_weight"]
    return jnp.dot(output, p["w"][0],
                   preferred_element_type=jnp.float32) + p["b"][0]


# ---------------------------------------------------------------------------
# Sigmoid attention (reference layers/attention.py:119-131)

def sigmoid_attention_init(key: jax.Array, hidden_maps: int, query_dim: int,
                           memory_dim: int) -> dict:
    cfg = MLPConfig(3, hidden_maps, hidden_maps, do_layer_norm=True)
    return {"unit_mlp": mlp_init(key, cfg, query_dim + memory_dim)}


def sigmoid_attention_apply(params: dict, query: jnp.ndarray,
                            memory: jnp.ndarray, batch: SatBatch,
                            hidden: int) -> jnp.ndarray:
    cfg = MLPConfig(3, hidden, hidden, do_layer_norm=True)
    q_e = jnp.take(query, batch.edge_lit_c, axis=0)
    k_e = jnp.take(memory, batch.edge_clause_c, axis=0)
    units = jnp.concatenate([q_e, k_e], axis=-1)
    weights = jax.nn.sigmoid(mlp_apply(params["unit_mlp"], cfg, units))
    weighted = k_e * weights * batch.edge_mask_c[:, None]
    return jax.ops.segment_sum(weighted, batch.edge_lit_c,
                               num_segments=2 * batch.V)
