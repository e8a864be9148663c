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


def build_local_batches(batch: SatBatch, n_shards: int) -> SatBatch:
    """Split one SatBatch into n per-device clause shards, stacked on a new
    leading axis, for the fully sharded model step (make_gp_train_step).

    Per shard: clause rows [C/n] and their edges are local (local clause
    ids); BOTH edge orderings hold the local clause-sorted edges (the
    clause->lit direction uses an unsorted segment sum + psum). Variable
    and graph-level arrays are replicated; per-graph clause counts stay
    GLOBAL so normalization means divide correctly after psum.
    """
    C, E, V = batch.C, batch.E, batch.V
    assert C % n_shards == 0
    c_per = C // n_shards
    ec = np.asarray(batch.edge_clause_c)
    el = np.asarray(batch.edge_lit_c)
    em = np.asarray(batch.edge_mask_c)

    shard_of_edge = ec // c_per
    groups = [np.where((shard_of_edge == s) & (em > 0))[0]
              for s in range(n_shards)]
    e_per = -(-max((len(g) for g in groups), default=1) // 128) * 128

    locals_ = []
    for s, idx in enumerate(groups):
        n = len(idx)
        lel = np.full(e_per, 2 * V - 1, dtype=np.int32)
        lec = np.full(e_per, c_per - 1, dtype=np.int32)
        lem = np.zeros(e_per, dtype=np.float32)
        lel[:n] = el[idx]
        lec[:n] = ec[idx] - s * c_per
        lem[:n] = 1.0
        sl = slice(s * c_per, (s + 1) * c_per)
        locals_.append(batch.replace(
            edge_lit_c=lel, edge_clause_c=lec, edge_mask_c=lem,
            edge_lit_l=lel.copy(), edge_clause_l=lec.copy(),
            edge_mask_l=lem.copy(),
            edge_perm_l=np.arange(e_per, dtype=np.int32),
            clause_mask=np.asarray(batch.clause_mask)[sl],
            clause_graph=np.asarray(batch.clause_graph)[sl],
        ))
    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *locals_)


def make_gp_train_step(cfg, optimizer, mesh: Mesh):
    """Clause/edge-sharded QuerySAT train step over the 'graph' axis via
    GSPMD sharding annotations (the scaling-book recipe: annotate
    shardings, let XLA insert the collectives).

    The model code is the plain query_sat_apply; the batch's edge and
    clause arrays are placed with dim-0 sharded over 'graph'
    (shard_gp_batch), parameters replicated. XLA's SPMD partitioner
    derives the forward all-reduces for the clause->literal aggregations
    and the exact backward collectives — including the mixed
    replicated/sharded gradient paths that a manual shard_map psum gets
    wrong. The TP analog for one giant formula batch (SURVEY.md §5.7).
    """
    import optax

    from diffusionsat_tpu.models.query_sat import query_sat_apply
    from diffusionsat_tpu.train.loop import TrainState

    @jax.jit
    def train_step(state, batch: SatBatch):
        if getattr(batch, "solutions_k", None) is not None:
            from diffusionsat_tpu.train.loop import _select_labels
            key, subkey, k_label = jax.random.split(state.key, 3)
            labels = _select_labels(batch, k_label)
        else:
            key, subkey = jax.random.split(state.key)
            labels = batch.solutions

        def loss_fn(p):
            _, loss, steps, _ = query_sat_apply(
                p, cfg, batch, subkey, training=True,
                labels=labels)
            return loss, steps

        (loss, steps), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1, key=key)
        return new_state, {"loss": loss,
                           "steps_taken": steps.astype(jnp.float32)}

    return train_step


def shard_gp_batch(batch: SatBatch, mesh: Mesh) -> SatBatch:
    """Place a SatBatch for graph-partitioned execution: edge arrays and
    clause arrays sharded on dim 0 over 'graph', the rest replicated.
    Bucket sizes are multiples of 128, so they divide typical axis sizes."""
    edge_s = NamedSharding(mesh, P("graph"))
    repl = NamedSharding(mesh, P())
    sharded_fields = {"edge_lit_c", "edge_clause_c", "edge_mask_c",
                      "edge_lit_l", "edge_clause_l", "edge_mask_l",
                      "edge_perm_l", "clause_mask", "clause_graph"}

    def place(name, x):
        if x is None:  # optional fields (solutions_k)
            return None
        s = edge_s if name in sharded_fields else repl
        return jax.device_put(jnp.asarray(x), s)

    fields = {name: place(name, getattr(batch, name))
              for name in SatBatch.__dataclass_fields__}
    return SatBatch(**fields)


def place_sharded_batch(batch: SatBatch, mesh: Mesh) -> SatBatch:
    """Device-place the clause-sorted edge arrays sharded over 'graph',
    everything else replicated."""
    edge_sharding = NamedSharding(mesh, P("graph"))
    repl = NamedSharding(mesh, P())

    def place(name, x):
        if x is None:  # optional fields (solutions_k)
            return None
        if name in ("edge_lit_c", "edge_clause_c", "edge_mask_c"):
            return jax.device_put(jnp.asarray(x), edge_sharding)
        return jax.device_put(jnp.asarray(x), repl)

    fields = {name: place(name, getattr(batch, name))
              for name in SatBatch.__dataclass_fields__}
    return SatBatch(**fields)
