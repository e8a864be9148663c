"""Cut-proportional halo exchange for clause-partitioned execution.

Replaces the full `[2V, F]` per-round psum of the first-draft graph
partition (parallel/graph_partition.py) with boundary-only communication
— the SURVEY §5.7 north-star design:

- each clause shard s *needs* correct literal aggregates only for the
  literal closure R_s = all literals of graphs with >=1 clause in s
  (PairNorm couples a graph's variables, so the closure is per graph,
  not per referenced literal);
- with the packer's graph-contiguous clause layout, R_s ∩ R_t for s != t
  is exactly the literals of graphs *straddling* the s/t shard boundary —
  the partition cut. Everything else is local;
- per round, each device all-to-alls only those shared rows of its
  partial aggregate and scatter-adds what it receives. Communication
  volume is proportional to the cut size instead of 2V, independent of
  shard count quality.

`jax.lax.all_to_all`'s transpose is an all-to-all, so the exchange is
transparently differentiable under the outer training gradient.
"""

from __future__ import annotations

import numpy as np
from flax import struct

import jax
import jax.numpy as jnp

from diffusionsat_tpu.graph.batch import SatBatch


@struct.dataclass
class HaloPlan:
    """Stacked per-shard halo metadata (leading axis = shard)."""
    owner_mask: jnp.ndarray  # [n, G] f32: 1 where this shard owns the graph
    send_idx: jnp.ndarray    # [n, n, B] int32 symmetric shared-row ids
    send_mask: jnp.ndarray   # [n, n, B] f32
    halo_rows: int = struct.field(pytree_node=False, default=0)
    n_shards: int = struct.field(pytree_node=False, default=1)


def build_halo_plan(batch: SatBatch, n_shards: int) -> HaloPlan:
    """Host-side halo plan from the full flat batch.

    Graph g is owned by the shard holding its first clause. R_s is the
    literal closure of shard s's graphs; send_idx[s, t] lists
    sorted(R_s ∩ R_t) (identical from both ends), padded with the dummy
    row 2V-1 under mask 0."""
    C, V, G = batch.C, batch.V, batch.G
    assert C % n_shards == 0, "pad clauses to a multiple of shard count"
    c_per = C // n_shards
    clause_graph = np.asarray(batch.clause_graph)
    nv = np.asarray(batch.n_vars_per_graph, np.int64)
    v_off = np.concatenate([[0], np.cumsum(nv)])

    def graph_literals(g: int) -> np.ndarray:
        vs = np.arange(v_off[g], v_off[g + 1], dtype=np.int64)
        return np.concatenate([vs, vs + V])

    owner = np.full(G, -1, dtype=np.int64)
    shard_graphs: list[set] = [set() for _ in range(n_shards)]
    for s in range(n_shards):
        gs = np.unique(clause_graph[s * c_per:(s + 1) * c_per])
        for g in gs:
            if g >= G:  # dummy padding segment
                continue
            shard_graphs[s].add(int(g))
            if owner[g] < 0:
                owner[g] = s
    owner_mask = np.zeros((n_shards, G), np.float32)
    for g in range(G):
        if owner[g] >= 0:
            owner_mask[owner[g], g] = 1.0

    R = []
    for s in range(n_shards):
        lits = ([graph_literals(g) for g in sorted(shard_graphs[s])]
                or [np.zeros(0, np.int64)])
        R.append(np.unique(np.concatenate(lits)))

    pair_rows: dict[tuple[int, int], np.ndarray] = {}
    B = 8
    for s in range(n_shards):
        for t in range(s + 1, n_shards):
            rows = np.intersect1d(R[s], R[t])
            pair_rows[(s, t)] = rows
            B = max(B, len(rows))
    B = -(-B // 8) * 8

    send_idx = np.full((n_shards, n_shards, B), 2 * V - 1, np.int32)
    send_mask = np.zeros((n_shards, n_shards, B), np.float32)
    halo_rows = 0
    for (s, t), rows in pair_rows.items():
        k = len(rows)
        send_idx[s, t, :k] = rows
        send_idx[t, s, :k] = rows
        send_mask[s, t, :k] = 1.0
        send_mask[t, s, :k] = 1.0
    halo_rows = int(max((send_mask[s].sum() for s in range(n_shards)),
                        default=0))
    return HaloPlan(owner_mask=jnp.asarray(owner_mask),
                    send_idx=jnp.asarray(send_idx),
                    send_mask=jnp.asarray(send_mask),
                    halo_rows=halo_rows, n_shards=n_shards)


def halo_exchange(partial: jnp.ndarray, send_idx: jnp.ndarray,
                  send_mask: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Complete a local partial literal aggregate on its halo rows.

    partial: [2V, F] local partial sums; send_idx/send_mask: this
    device's [n, B] views. Returns partial with the shared rows summed
    across all shards that reference them (rows outside this shard's
    closure stay incomplete by design)."""
    buf = jnp.take(partial, send_idx, axis=0) * send_mask[..., None]
    recv = jax.lax.all_to_all(buf, axis_name, split_axis=0, concat_axis=0)
    vals = (recv * send_mask[..., None]).reshape(-1, partial.shape[-1])
    return partial.at[send_idx.reshape(-1)].add(vals)


def make_halo_gp_train_step(cfg, optimizer, mesh, plan: HaloPlan):
    """Clause-sharded QuerySAT train step with halo-exchange collectives.

    Per-device execution under shard_map: local clause shard + replicated
    variable-side arrays; the two hot [2V, F] clause->literal aggregations
    per round exchange only `plan.halo_rows` boundary rows instead of the
    full psum. Per-graph losses are owner-masked and psum-assembled
    ([G, H] — tiny), so every graph's loss path is counted exactly once;
    summing per-device grads (psum) then yields the exact global gradient.
    Numerically equivalent to the single-device step
    (tests/test_halo.py)."""
    import optax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from diffusionsat_tpu.models.query_sat import query_sat_apply
    from diffusionsat_tpu.train.loop import TrainState

    def per_device(params, opt_state, step, key, local_batch,
                   owner_mask, send_idx, send_mask):
        local_batch = jax.tree.map(lambda x: x[0], local_batch)
        halo = {"owner_mask": owner_mask[0], "send_idx": send_idx[0],
                "send_mask": send_mask[0]}
        if getattr(local_batch, "solutions_k", None) is not None:
            # `key` is replicated, so every device draws the SAME labels —
            # required: the literal state is shared across shards
            from diffusionsat_tpu.train.loop import _select_labels
            key, k_label = jax.random.split(key)
            labels = _select_labels(local_batch, k_label)
        else:
            labels = local_batch.solutions

        def loss_fn(p):
            _, loss, steps, _ = query_sat_apply(
                p, cfg, local_batch, key, training=True,
                labels=labels, axis_name="graph",
                halo=halo)
            return loss, steps

        (loss, steps), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        # owner masking makes each graph's loss path live on exactly one
        # device: the global gradient is the SUM of local gradients
        grads = jax.lax.psum(grads, "graph")
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state, loss, steps

    shard = P("graph")
    repl = P()
    sharded = shard_map(
        per_device, mesh=mesh,
        in_specs=(repl, repl, repl, repl, shard, shard, shard, shard),
        out_specs=(repl, repl, repl, repl),
        check_vma=False)

    @jax.jit
    def train_step(state: TrainState, local_batches):
        key, subkey = jax.random.split(state.key)
        params, opt_state, loss, steps = sharded(
            state.params, state.opt_state, state.step, subkey,
            local_batches, plan.owner_mask, plan.send_idx, plan.send_mask)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1, key=key)
        return new_state, {"loss": loss,
                           "steps_taken": steps.astype(jnp.float32)}

    return train_step
