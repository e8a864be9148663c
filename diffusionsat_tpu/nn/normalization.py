"""Graph-aware normalization layers (pure functions, no parameters).

Port of the reference `layers/normalization.py`: `PairNorm:27` subtracts the
per-graph mean (via the normalized membership matrix) and rescales each node
by the rms over its feature axis. The membership SpMMs become masked segment
means over the `var_graph`/`clause_graph` id vectors.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from diffusionsat_tpu.graph.batch import SatBatch
from diffusionsat_tpu.ops.graph_ops import (
    clause_segment_sum,
    graph_gather_clauses,
    graph_gather_vars,
    var_segment_sum,
)


def layer_norm(x: jnp.ndarray, axis: int | tuple = 1, epsilon: float = 1e-6,
               subtract_mean: bool = False, bias: jnp.ndarray | None = None
               ) -> jnp.ndarray:
    """RMS-style LayerNorm (reference layers/normalization.py:4-24)."""
    if subtract_mean:
        x = x - jnp.mean(x, axis=axis, keepdims=True)
        if bias is not None:
            x = x + bias
    variance = jnp.mean(jnp.square(x), axis=axis, keepdims=True)
    return x * lax.rsqrt(variance + epsilon)


def _pair_norm(x, mean_per_node, epsilon):
    x = x - mean_per_node
    variance = jnp.mean(jnp.square(x), axis=1, keepdims=True)
    return x * lax.rsqrt(variance + epsilon)


def pair_norm_vars(x: jnp.ndarray, batch: SatBatch, epsilon: float = 1e-6
                   ) -> jnp.ndarray:
    """PairNorm over variable nodes: subtract each variable's graph mean,
    then rms-normalize over the feature axis
    (reference layers/normalization.py:43-71 with subtract_mean=True)."""
    sums = var_segment_sum(batch, x * batch.var_mask[:, None])
    counts = jnp.maximum(batch.n_vars_per_graph, 1.0)[:, None]
    mean = graph_gather_vars(batch, sums / counts)
    return _pair_norm(x, mean, epsilon)


def pair_norm_clauses(x: jnp.ndarray, batch: SatBatch, epsilon: float = 1e-6,
                      axis_name: str | None = None) -> jnp.ndarray:
    """PairNorm over clause nodes (reference layers/normalization.py:43-71).
    Under clause-sharded execution the per-graph mean needs the global
    counts (batch.n_clauses_per_graph must carry global totals)."""
    sums = clause_segment_sum(batch, x * batch.clause_mask[:, None],
                              axis_name)
    counts = jnp.maximum(batch.n_clauses_per_graph, 1.0)[:, None]
    mean = graph_gather_clauses(batch, sums / counts)
    return _pair_norm(x, mean, epsilon)


def variables_neighbor_norm(variables: jnp.ndarray, batch: SatBatch,
                            epsilon: float = 1e-6) -> jnp.ndarray:
    """Subtract the two-hop neighbor mean from variable states, then
    rms-normalize (reference layers/normalization.py:73-100
    `VariablesNeighborNorm`): lit -> clause -> lit round trip with a ones
    column tracking the degree."""
    from diffusionsat_tpu.ops.graph_ops import clause_to_lit, lit_to_clause

    V = batch.V
    literals = jnp.concatenate([variables, variables], axis=0)
    ones = jnp.ones((literals.shape[0], 1), literals.dtype)
    lit1 = jnp.concatenate([literals, ones], axis=1)
    clauses_val = lit_to_clause(batch, lit1)
    lit_new = clause_to_lit(batch, clauses_val)
    var_new_deg = lit_new[:V] + lit_new[V:]
    var_new = var_new_deg[:, :-1]
    deg = var_new_deg[:, -1:]
    mean = var_new / jnp.maximum(deg, 2.0)
    out = variables - mean
    variance = jnp.mean(jnp.square(out), axis=1, keepdims=True)
    return out * lax.rsqrt(variance + epsilon)


def clauses_neighbor_norm(clauses: jnp.ndarray, batch: SatBatch,
                          epsilon: float = 1e-6) -> jnp.ndarray:
    """Clause-side analog (reference layers/normalization.py:102-125)."""
    from diffusionsat_tpu.ops.graph_ops import clause_to_lit, lit_to_clause

    ones = jnp.ones((clauses.shape[0], 1), clauses.dtype)
    cl1 = jnp.concatenate([clauses, ones], axis=1)
    lit_val = clause_to_lit(batch, cl1)
    clause_new_deg = lit_to_clause(batch, lit_val)
    clause_new = clause_new_deg[:, :-1]
    deg = clause_new_deg[:, -1:]
    mean = clause_new / jnp.maximum(deg, 2.0)
    out = clauses - mean
    variance = jnp.mean(jnp.square(out), axis=1, keepdims=True)
    return out * lax.rsqrt(variance + epsilon)


def edge_dropout(key, batch: SatBatch, rate: float) -> SatBatch:
    """Drop incidence edges at random (reference
    layers/regularization.py:5-17 `EdgeDropout` on sparse values): zero a
    fraction of the edge masks in both orderings consistently."""
    import jax

    keep = jax.random.bernoulli(key, 1.0 - rate,
                                batch.edge_mask_c.shape).astype(jnp.float32)
    # the literal-sorted ordering is a permutation of the clause-sorted
    # one; apply the SAME per-edge draw through the stored permutation so
    # an edge drops in both directions (the reference drops values of the
    # single sparse tensor used for both SpMM directions)
    keep_l = jnp.take(keep, batch.edge_perm_l)
    return batch.replace(edge_mask_c=batch.edge_mask_c * keep,
                         edge_mask_l=batch.edge_mask_l * keep_l)
