"""Core sparse graph aggregation ops over a SatBatch.

These are the TPU-native replacements for the reference's
`tf.sparse.sparse_dense_matmul` calls on the literal-clause incidence
matrix (`model/query_sat.py:255,269`, `loss/sat.py:134`). The incidence is
kept as two sorted edge orderings (see graph/batch.py); each "SpMM" is a
mask, gather, and sorted segment-sum — the shape XLA tiles well on TPU.
All shapes are static; padding is neutralized by the edge masks and the
dummy graph segment.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diffusionsat_tpu.graph.batch import SatBatch


def lit_to_clause(batch: SatBatch, lit_features: jnp.ndarray) -> jnp.ndarray:
    """Aggregate literal features into clauses: out[c] = sum_{lit in c} x[lit].

    `lit_features`: [2V, F]. Returns [C, F]. Equivalent to the reference
    `tf.sparse.sparse_dense_matmul(cl_adj_matrix, literals)`
    (model/query_sat.py:255) with transposed-incidence semantics.
    """
    gathered = jnp.take(lit_features, batch.edge_lit_c, axis=0)
    gathered = gathered * batch.edge_mask_c[:, None]
    return jax.ops.segment_sum(gathered, batch.edge_clause_c,
                               num_segments=batch.C,
                               indices_are_sorted=True)


def clause_to_lit(batch: SatBatch, clause_features: jnp.ndarray,
                  axis_name: str | None = None,
                  halo: dict | None = None) -> jnp.ndarray:
    """Aggregate clause features into literals: out[lit] = sum_{c ∋ lit} x[c].

    `clause_features`: [C, F]. Returns [2V, F]. Equivalent to the reference
    `tf.sparse.sparse_dense_matmul(adj_matrix, ...)` (model/query_sat.py:269).
    With `axis_name` (clause-sharded execution under shard_map) each shard
    contributes a partial literal aggregate, combined either with one full
    psum, or — when a `halo` plan view is supplied — by exchanging only
    the boundary rows shared between shards (parallel/halo.py, comm
    proportional to the partition cut instead of 2V).
    """
    gathered = jnp.take(clause_features, batch.edge_clause_l, axis=0)
    gathered = gathered * batch.edge_mask_l[:, None]
    out = jax.ops.segment_sum(gathered, batch.edge_lit_l,
                              num_segments=2 * batch.V,
                              indices_are_sorted=axis_name is None)
    if axis_name is not None:
        if halo is not None:
            from diffusionsat_tpu.parallel.halo import halo_exchange
            out = halo_exchange(out, halo["send_idx"], halo["send_mask"],
                                axis_name)
        else:
            out = jax.lax.psum(out, axis_name)
    return out


def literal_degrees(batch: SatBatch, axis_name: str | None = None
                    ) -> jnp.ndarray:
    """[2V, 1] count of clauses each literal appears in
    (reference model/query_sat.py:193)."""
    deg = jax.ops.segment_sum(batch.edge_mask_l, batch.edge_lit_l,
                              num_segments=2 * batch.V,
                              indices_are_sorted=axis_name is None)
    if axis_name is not None:
        deg = jax.lax.psum(deg, axis_name)
    return deg[:, None]


def clause_degrees(batch: SatBatch) -> jnp.ndarray:
    """[C, 1] literal count of each clause (reference model/query_sat.py:196)."""
    deg = jax.ops.segment_sum(batch.edge_mask_c, batch.edge_clause_c,
                              num_segments=batch.C,
                              indices_are_sorted=True)
    return deg[:, None]


def var_segment_sum(batch: SatBatch, var_features: jnp.ndarray) -> jnp.ndarray:
    """Per-graph sum over variables: [V, F] -> [G, F]. Replaces SpMM with
    `variables_graph_adj` (reference model/query_sat.py:292). Padded
    variables land in the dummy segment G and are dropped."""
    out = jax.ops.segment_sum(var_features, batch.var_graph,
                              num_segments=batch.G + 1,
                              indices_are_sorted=True)
    return out[:batch.G]


def clause_segment_sum(batch: SatBatch, clause_features: jnp.ndarray,
                       axis_name: str | None = None) -> jnp.ndarray:
    """Per-graph sum over clauses: [C, F] -> [G, F]
    (reference model/query_sat.py:302)."""
    out = jax.ops.segment_sum(clause_features, batch.clause_graph,
                              num_segments=batch.G + 1,
                              indices_are_sorted=True)
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)
    return out[:batch.G]


def graph_gather_vars(batch: SatBatch, graph_features: jnp.ndarray
                      ) -> jnp.ndarray:
    """Broadcast per-graph features back to variables: [G, F] -> [V, F].
    Replaces adjoint SpMM with the membership matrix
    (reference model/query_sat.py:319)."""
    padded = jnp.concatenate(
        [graph_features, jnp.zeros_like(graph_features[:1])], axis=0)
    return jnp.take(padded, batch.var_graph, axis=0)


def graph_gather_clauses(batch: SatBatch, graph_features: jnp.ndarray
                         ) -> jnp.ndarray:
    """Broadcast per-graph features back to clauses: [G, F] -> [C, F]."""
    padded = jnp.concatenate(
        [graph_features, jnp.zeros_like(graph_features[:1])], axis=0)
    return jnp.take(padded, batch.clause_graph, axis=0)
