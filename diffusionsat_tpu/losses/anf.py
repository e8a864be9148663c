"""Differentiable ANF (XOR of AND-terms) equation losses.

Port of reference `loss/anf.py`: equations are evaluated in a +/-1
encoding ("zero" -> +1, "one" -> -1) where XOR is multiplication. The
per-clause product is computed in log-magnitude + sign-parity form (real
variant, `anf_value_real:7`) or via complex angle/log-length accumulation
(`anf_value_cplx_adj:70`). The sparse membership SpMMs become masked
sorted segment sums over the ANFBatch edge lists.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diffusionsat_tpu.graph.anf_batch import ANFBatch


def real_and(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """AND in the +/-1 encoding (reference loss/anf.py:3-5)."""
    val = (1 - x) * (1 - y) / 4
    return 1 - 2 * val


def _node_values(logits: jnp.ndarray, batch: ANFBatch) -> jnp.ndarray:
    """[1+V, K] node values: row 0 = constant one (-1), rows 1.. = tanh."""
    n_maps = logits.shape[-1]
    one = -jnp.ones((1, n_maps), logits.dtype)
    return jnp.concatenate([one, jnp.tanh(logits)], axis=0)


def _seg_to_clause(x_nodes: jnp.ndarray, batch: ANFBatch) -> jnp.ndarray:
    """Sum node features over each clause's members: [1+V+A, K] -> [C, K]."""
    gathered = jnp.take(x_nodes, batch.edge_node_c, axis=0)
    gathered = gathered * batch.edge_mask_c[:, None]
    return jax.ops.segment_sum(gathered, batch.edge_clause_c,
                               num_segments=batch.C,
                               indices_are_sorted=True)


def anf_value_real(logits: jnp.ndarray, batch: ANFBatch
                   ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-clause product of member values via log-|.| + sign parity
    (reference loss/anf.py:7-28). Returns (clause_value [C,K], ands1,
    ands2). Padded clauses evaluate to +1 (zero loss downstream)."""
    values = _node_values(logits, batch)          # [1+V, K]
    ands1 = jnp.take(values, batch.and1, axis=0)  # [A, K]
    ands2 = jnp.take(values, batch.and2, axis=0)
    and_val = real_and(ands1, ands2)
    values_ands = jnp.concatenate([values, and_val], axis=0)  # [1+V+A, K]
    log_val = jnp.log(jnp.abs(values_ands) + 1e-16)
    signs = (1 - jnp.sign(values_ands)) / 2
    sum_logs = _seg_to_clause(log_val, batch)
    sum_signs = _seg_to_clause(signs, batch)
    sum_signs = 1 - 2 * jnp.mod(sum_signs, 2)
    clause_value = jnp.exp(sum_logs) * sum_signs
    return clause_value, ands1, ands2


def cplx_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """Clamp complex magnitude to <=1 (reference loss/anf.py:30-34)."""
    x_real, x_im = jnp.split(x, 2, axis=-1)
    inv_len = jax.lax.rsqrt(jnp.square(x_real) + jnp.square(x_im) + 1e-6)
    inv_len = jnp.minimum(inv_len, 1.0)
    return jnp.concatenate([x_real * inv_len, x_im * inv_len], axis=-1)


def cplx_and(a: jnp.ndarray, b: jnp.ndarray
             ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Complex-valued AND (reference loss/anf.py:36-45)."""
    a_real, a_im = jnp.split(a, 2, axis=-1)
    b_real, b_im = jnp.split(b, 2, axis=-1)
    a1_real = (1 - a_real) / 2
    b1_real = (1 - b_real) / 2
    a1_im = -a_im / 2
    b1_im = -b_im / 2
    re = a1_real * b1_real
    im = a1_real * b1_im + a1_im * b1_real
    return 1 - 2 * re, -2 * im


def anf_value_cplx(logits: jnp.ndarray, batch: ANFBatch,
                   use_norm: bool = False, tiles=None):
    """Complex per-clause evaluation via angle/log-length accumulation
    (reference `anf_value_cplx_adj`, loss/anf.py:70-94).

    logits: [V, 2K] (real halves then imaginary halves).
    Returns (clause_real [C,K], clause_im [C,K], ands1, ands2).
    """
    n_maps = logits.shape[-1] // 2
    one = jnp.concatenate([-jnp.ones((1, n_maps)), jnp.zeros((1, n_maps))],
                          axis=-1)
    values = jnp.tanh(logits)
    if use_norm:
        values = cplx_normalize(values)
    values = jnp.concatenate([one, values], axis=0)   # [1+V, 2K]
    ands1 = jnp.take(values, batch.and1, axis=0)
    ands2 = jnp.take(values, batch.and2, axis=0)
    and_real0, and_im0 = cplx_and(ands1, ands2)
    val_real, val_im = jnp.split(values, 2, axis=-1)
    and_real = jnp.concatenate([val_real, and_real0], axis=0)  # [1+V+A, K]
    and_im = jnp.concatenate([val_im, and_im0], axis=0)
    angle = jnp.arctan2(and_im, and_real)
    log_len = 0.5 * jnp.log(jnp.square(and_real) + jnp.square(and_im) + 1e-16)
    if tiles is not None:
        # tiled block-sparse aggregation (ops/tiled_ops.py). HIGHEST
        # precision: angle/log-length sums feed exp/cos, where the bf16
        # input rounding of the fast DEFAULT setting is not acceptable
        # (the 0/1 incidence itself is exact either way)
        from diffusionsat_tpu.ops.tiled_ops import tiled_lit_to_clause
        sum_angles = tiled_lit_to_clause(
            angle, tiles, precision=jax.lax.Precision.HIGHEST)
        sum_len = tiled_lit_to_clause(
            log_len, tiles, precision=jax.lax.Precision.HIGHEST)
    else:
        sum_angles = _seg_to_clause(angle, batch)
        sum_len = _seg_to_clause(log_len, batch)
    clause_real = jnp.exp(sum_len) * jnp.cos(sum_angles)
    clause_im = jnp.exp(sum_len) * jnp.sin(sum_angles)
    return clause_real, clause_im, ands1, ands2


def return_messages_cplx(batch: ANFBatch, loss_to_vars: jnp.ndarray
                         ) -> jnp.ndarray:
    """Clause->node complex message aggregation (reference
    loss/anf.py:96-106): per-node product of clause messages in
    angle/log-length form, length averaged by node degree."""
    val_real, val_im = jnp.split(loss_to_vars, 2, axis=-1)
    angle = jnp.arctan2(val_im, val_real)
    log_len = jnp.log(jnp.square(val_real) + jnp.square(val_im) + 1e-16)

    def node_seg(x_clauses):
        g = jnp.take(x_clauses, batch.edge_clause_n, axis=0)
        g = g * batch.edge_mask_n[:, None]
        return jax.ops.segment_sum(g, batch.edge_node_n,
                                   num_segments=batch.n_value_nodes,
                                   indices_are_sorted=True)

    sum_angles = node_seg(angle)
    sum_len = node_seg(log_len)
    degree = jax.ops.segment_sum(batch.edge_mask_n, batch.edge_node_n,
                                 num_segments=batch.n_value_nodes,
                                 indices_are_sorted=True)
    sum_len = sum_len / jnp.maximum(degree, 1.0)[:, None]
    exp_len = jnp.exp(sum_len)
    var_real = exp_len * jnp.cos(sum_angles)
    var_im = exp_len * jnp.sin(sum_angles)
    return jnp.concatenate([var_real, var_im], axis=-1)


def is_graph_sat_anf(logits: jnp.ndarray, batch: ANFBatch) -> jnp.ndarray:
    """[G, K] per-graph solved indicator: every equation of the graph
    evaluates to its target parity under the rounded assignment — the
    jit-side analog of metrics.ANFAccuracy's host check (reference
    metrics/anf_metrics.py:5-66), used by multi-try predict. Bit
    convention matches the model: bit 1 -> strongly negative logit."""
    import jax

    hard = jnp.where(jax.nn.sigmoid(logits) > 0.5, -10.0, 10.0)
    cv, _, _ = anf_value_real(hard, batch)        # [C, K]; padding -> +1
    ok = (cv > 0.5).astype(jnp.float32)
    ok_in_g = jax.ops.segment_sum(ok, batch.clause_graph,
                                  num_segments=batch.G + 1,
                                  indices_are_sorted=True)[:batch.G]
    total = batch.n_clauses_per_graph[:, None]
    return jnp.clip(ok_in_g + 1 - total, 0.0, 1.0) * \
        batch.graph_mask[:, None]
