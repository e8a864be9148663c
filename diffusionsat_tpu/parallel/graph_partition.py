"""Clause-partitioned graph parallelism over the 'graph' mesh axis.

The TP/SP analog for one giant literal-clause graph (SURVEY.md §2.10,
§5.7): clauses and their incident edges are sharded across chips; literal
features stay replicated. Per message-passing round:

- literal -> clause: every device gathers from its replicated literal
  features into its local clause shard — NO communication;
- clause -> literal: each device computes a partial [2V, F] literal
  aggregate from its edge shard, then one psum over the 'graph' axis
  re-replicates — a single all-reduce per round riding ICI.

Batches are prepared by `shard_batch_by_clause`: clauses are already
contiguous per graph, so a range partition of clause ids keeps whole
graphs' clause blocks mostly local; edges (clause-sorted) are split at the
matching boundaries and padded to equal per-device length.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from diffusionsat_tpu.graph.batch import SatBatch


def shard_batch_by_clause(batch: SatBatch, n_shards: int) -> SatBatch:
    """Re-layout a SatBatch so leading axes split evenly into n_shards:
    clause arrays [C] and clause-sorted edge arrays [E] become
    shard-aligned (each shard owns C/n clauses and the edges targeting
    them, padded to E/n). Literal-sorted arrays are replicated per shard
    for the partial clause->lit segment sums."""
    C, E = batch.C, batch.E
    assert C % n_shards == 0, "pad clauses to a multiple of shard count"
    c_per = C // n_shards
    ec = np.asarray(batch.edge_clause_c)
    el = np.asarray(batch.edge_lit_c)
    em = np.asarray(batch.edge_mask_c)

    # edges per clause shard
    shard_of_edge = ec // c_per
    e_per = 0
    groups = []
    for s in range(n_shards):
        idx = np.where((shard_of_edge == s) & (em > 0))[0]
        groups.append(idx)
        e_per = max(e_per, len(idx))
    e_per = -(-e_per // 128) * 128

    new_el = np.zeros((n_shards, e_per), dtype=np.int32)
    new_ec = np.zeros((n_shards, e_per), dtype=np.int32)
    new_em = np.zeros((n_shards, e_per), dtype=np.float32)
    for s, idx in enumerate(groups):
        n = len(idx)
        new_el[s, :n] = el[idx]
        new_ec[s, :n] = ec[idx] - s * c_per  # local clause ids
        new_ec[s, n:] = c_per - 1
        new_el[s, n:] = 2 * batch.V - 1
        new_em[s, :n] = 1.0

    return batch.replace(
        edge_lit_c=new_el.reshape(-1),
        edge_clause_c=new_ec.reshape(-1),
        edge_mask_c=new_em.reshape(-1),
    )


def make_sharded_spmm(mesh: Mesh, V: int, C: int, n_shards: int):
    """Build (lit_to_clause, clause_to_lit) over the 'graph' axis.

    lit_to_clause(lit_feats [2V, F] replicated, edges sharded) ->
        clause feats [C, F] sharded on dim 0.
    clause_to_lit(clause_feats sharded, edges sharded) ->
        lit feats [2V, F] replicated (one psum).
    """
    c_per = C // n_shards

    def l2c(lit_feats, edge_lit, edge_clause, edge_mask):
        gathered = jnp.take(lit_feats, edge_lit, axis=0) * edge_mask[:, None]
        return jax.ops.segment_sum(gathered, edge_clause,
                                   num_segments=c_per,
                                   indices_are_sorted=True)

    def c2l(clause_feats, edge_lit, edge_clause, edge_mask):
        gathered = jnp.take(clause_feats, edge_clause, axis=0) * \
            edge_mask[:, None]
        partial = jax.ops.segment_sum(gathered, edge_lit,
                                      num_segments=2 * V)
        return jax.lax.psum(partial, "graph")

    edge_spec = P("graph")
    lit_spec = P()
    clause_spec = P("graph")

    lit_to_clause = shard_map(
        l2c, mesh=mesh,
        in_specs=(lit_spec, edge_spec, edge_spec, edge_spec),
        out_specs=clause_spec, check_vma=False)
    clause_to_lit = shard_map(
        c2l, mesh=mesh,
        in_specs=(clause_spec, edge_spec, edge_spec, edge_spec),
        out_specs=lit_spec, check_vma=False)
    return lit_to_clause, clause_to_lit


def place_sharded_batch(batch: SatBatch, mesh: Mesh) -> SatBatch:
    """Device-place the clause-sorted edge arrays sharded over 'graph',
    everything else replicated."""
    edge_sharding = NamedSharding(mesh, P("graph"))
    repl = NamedSharding(mesh, P())

    def place(name, x):
        if name in ("edge_lit_c", "edge_clause_c", "edge_mask_c"):
            return jax.device_put(jnp.asarray(x), edge_sharding)
        return jax.device_put(jnp.asarray(x), repl)

    fields = {name: place(name, getattr(batch, name))
              for name in SatBatch.__dataclass_fields__}
    return SatBatch(**fields)
