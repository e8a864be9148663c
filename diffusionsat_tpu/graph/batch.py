"""Static-shape batched literal-clause graph container.

TPU-native replacement for the reference's `tf.sparse` batch representation
(`data/SatSpecifics.py:21-80`). Instead of dynamic-shape SparseTensors we
keep padded, static-shape edge lists so every batch in a bucket compiles to
one XLA program:

- literals are rows `0..V-1` (positive) and `V..2V-1` (negative), matching
  the reference's literal adjacency layout (`data/SatSpecifics.py:26-35`)
  but with the *padded* variable count V as the negation offset;
- the incidence "matrix" is two edge orderings of the same edge set:
  clause-sorted (for literal->clause aggregation) and literal-sorted (for
  clause->literal aggregation), so both directions use sorted segment sums
  — the layout XLA lowers best on TPU;
- graph membership matrices (`clauses_graph_adj`/`variables_graph_adj`,
  `data/SatSpecifics.py:45-57`) become `var_graph`/`clause_graph` segment-id
  vectors; padding elements point at a dedicated dummy segment G so masked
  reductions need no special cases.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import struct


def _round_up(x: int, m: int) -> int:
    return ((int(x) + m - 1) // m) * m


@struct.dataclass
class BucketSpec:
    """Static padded sizes of one compilation bucket."""
    max_vars: int = struct.field(pytree_node=False)
    max_clauses: int = struct.field(pytree_node=False)
    max_edges: int = struct.field(pytree_node=False)
    max_graphs: int = struct.field(pytree_node=False)

    @classmethod
    def for_node_budget(cls, max_nodes_per_batch: int,
                        mean_clause_len: float = 3.2,
                        max_graphs: int = 512) -> "BucketSpec":
        """Derive padded sizes from the packing node budget (2V + C <= budget,
        reference `config.py:35` semantics), sized for threshold 3-SAT-like
        clause/variable mixes. The packer enforces the V/C/E limits directly,
        so these are capacity choices, not correctness constraints.
        """
        max_vars = _round_up(max(max_nodes_per_batch // 4, 128), 128)
        max_clauses = _round_up(max(int(max_nodes_per_batch * 0.75), 128), 128)
        max_edges = _round_up(int(max_clauses * mean_clause_len), 512)
        return cls(max_vars=max_vars, max_clauses=max_clauses,
                   max_edges=max_edges, max_graphs=max_graphs)


@struct.dataclass
class SatBatch:
    """One packed batch of CNF formulas as a static-shape pytree.

    Shapes (all padded): V vars, C clauses, E edges, G graphs. Literal index
    space has size 2V (positive then negative). Padding rows carry zero
    masks and point at segment id G (graphs) / C-1-safe ids.
    """
    # clause-sorted edge ordering (for literal -> clause segment sums)
    edge_lit_c: jnp.ndarray     # [E] int32, literal id in [0, 2V)
    edge_clause_c: jnp.ndarray  # [E] int32, sorted ascending
    edge_mask_c: jnp.ndarray    # [E] f32
    # literal-sorted edge ordering (for clause -> literal segment sums)
    edge_lit_l: jnp.ndarray     # [E] int32, sorted ascending
    edge_clause_l: jnp.ndarray  # [E] int32
    edge_mask_l: jnp.ndarray    # [E] f32
    # permutation: literal-order position j = clause-order position perm[j]
    edge_perm_l: jnp.ndarray    # [E] int32
    # node masks and graph membership
    var_mask: jnp.ndarray       # [V] f32
    clause_mask: jnp.ndarray    # [C] f32
    var_graph: jnp.ndarray      # [V] int32 in [0, G]; G = padding segment
    clause_graph: jnp.ndarray   # [C] int32 in [0, G]
    graph_mask: jnp.ndarray     # [G] f32
    n_vars_per_graph: jnp.ndarray    # [G] f32
    n_clauses_per_graph: jnp.ndarray  # [G] f32
    # labels
    solutions: jnp.ndarray      # [V] int32 solution bit per variable (0 pad)
    # actual (unpadded) counts, traced scalars
    n_vars: jnp.ndarray         # [] int32
    n_clauses: jnp.ndarray      # [] int32
    n_graphs: jnp.ndarray       # [] int32
    # optional multi-label bank: K independent uniform solution samples per
    # graph ([K, V] int32; row 0 == `solutions`). When present, the train
    # step resamples the supervision target per graph per step, so the
    # model learns the denoising *posterior over the solution set* instead
    # of a deterministic formula->solution map (the cross-component
    # hitting bias found in the round-2 MH chain study). The reference
    # attaches ONE Unigen sample per instance for the whole run
    # (reference data/diffusion_sat_instances.py:36-94) — this is a
    # deliberate improvement, not a parity feature.
    solutions_k: jnp.ndarray | None = None
    # optional per-bank-row isolation scores [K, G] f32: z-scored (per
    # graph) mean Hamming distance of each bank row to the other rows.
    # Used by train/loop._select_labels with cfg.label_isolation_alpha to
    # bias label selection toward isolated solutions — the counterweight
    # to the raw sampler's basin-volume bias (UNIFORMITY_ANALYSIS.md:
    # sampling frequency ~ exp(-0.19 * z(distance)), central solutions
    # over-sampled). attach_label_isolation() computes it post-load.
    label_isolation_k: jnp.ndarray | None = None

    @property
    def V(self) -> int:
        return self.var_mask.shape[0]

    @property
    def C(self) -> int:
        return self.clause_mask.shape[0]

    @property
    def E(self) -> int:
        return self.edge_lit_c.shape[0]

    @property
    def G(self) -> int:
        return self.graph_mask.shape[0]


def build_batch(formulas: Sequence[tuple[int, Sequence[Sequence[int]]]],
                bucket: BucketSpec,
                solutions: Sequence[Sequence[int]] | None = None,
                ) -> SatBatch:
    """Pack formulas [(n_vars, clauses), ...] into one padded SatBatch.

    Variables of consecutive formulas are shifted into one index space
    (reference `data/dimac.py:213-241`). `solutions[i]` is a 0/1 bit list of
    length n_vars_i, or a [K, n_vars_i] nested list of K solution samples
    (rows cycle if a formula supplies fewer than the batch-wide K); with
    K > 1 the batch carries a `solutions_k` label bank and `solutions`
    holds row 0. Raises if the bucket is too small.
    """
    V, C, E, G = (bucket.max_vars, bucket.max_clauses, bucket.max_edges,
                  bucket.max_graphs)
    n_graphs = len(formulas)
    if n_graphs > G:
        raise ValueError(f"{n_graphs} formulas > bucket max_graphs {G}")

    var_graph = np.full(V, G, dtype=np.int32)
    clause_graph = np.full(C, G, dtype=np.int32)
    n_vars_per_graph = np.zeros(G, dtype=np.float32)
    n_clauses_per_graph = np.zeros(G, dtype=np.float32)
    sol = np.zeros(V, dtype=np.int32)
    K = 1
    sol_arrs: list[np.ndarray] = []
    if solutions is not None:
        sol_arrs = [np.asarray(s, dtype=np.int32) for s in solutions]
        K = max((a.shape[0] if a.ndim == 2 else 1) for a in sol_arrs) \
            if sol_arrs else 1
    sol_k = np.zeros((K, V), dtype=np.int32) if K > 1 else None

    edge_lit: list[int] = []
    edge_clause: list[int] = []

    v_off = 0
    c_off = 0
    for g, (n_vars, clauses) in enumerate(formulas):
        n_cl = len(clauses)
        if v_off + n_vars > V or c_off + n_cl > C:
            raise ValueError("bucket too small for batch (vars/clauses)")
        var_graph[v_off:v_off + n_vars] = g
        clause_graph[c_off:c_off + n_cl] = g
        n_vars_per_graph[g] = n_vars
        n_clauses_per_graph[g] = n_cl
        if solutions is not None:
            bits = np.atleast_2d(sol_arrs[g])      # [k_g, n_vars]
            assert bits.shape[1] == n_vars, "solution length mismatch"
            sol[v_off:v_off + n_vars] = bits[0]
            if sol_k is not None:
                rows = bits[np.arange(K) % bits.shape[0]]
                sol_k[:, v_off:v_off + n_vars] = rows
        for ci, clause in enumerate(clauses):
            for lit in clause:
                v = abs(lit) - 1 + v_off
                edge_lit.append(v if lit > 0 else V + v)
                edge_clause.append(c_off + ci)
        v_off += n_vars
        c_off += n_cl

    n_edges = len(edge_lit)
    if n_edges > E:
        raise ValueError(f"{n_edges} edges > bucket max_edges {E}")

    el = np.asarray(edge_lit, dtype=np.int32)
    ec = np.asarray(edge_clause, dtype=np.int32)

    # clause-sorted ordering (builder emits clause-major already, but sort to
    # be safe) and literal-sorted ordering
    order_c = np.argsort(ec, kind="stable")
    order_l = np.argsort(el[order_c], kind="stable")  # sort by literal

    def _pad(a: np.ndarray, size: int, fill: int) -> np.ndarray:
        out = np.full(size, fill, dtype=np.int32)
        out[:len(a)] = a
        return out

    # padding edges point at the last clause / last literal row with mask 0;
    # their contribution is zeroed by the mask before any segment sum.
    edge_lit_c = _pad(el[order_c], E, 2 * V - 1)
    edge_clause_c = _pad(ec[order_c], E, C - 1)
    edge_lit_l = _pad(el[order_c][order_l], E, 2 * V - 1)
    edge_clause_l = _pad(ec[order_c][order_l], E, C - 1)
    edge_perm_l = np.arange(E, dtype=np.int32)
    edge_perm_l[:n_edges] = order_l
    emask = np.zeros(E, dtype=np.float32)
    emask[:n_edges] = 1.0

    var_mask = np.zeros(V, dtype=np.float32)
    var_mask[:v_off] = 1.0
    clause_mask = np.zeros(C, dtype=np.float32)
    clause_mask[:c_off] = 1.0
    graph_mask = np.zeros(G, dtype=np.float32)
    graph_mask[:n_graphs] = 1.0

    # NB: arrays stay host-side numpy — device transfer happens once at the
    # jitted step call. Building on-device here would round-trip the
    # accelerator for every batch during data generation.
    return SatBatch(
        edge_lit_c=edge_lit_c,
        edge_clause_c=edge_clause_c,
        edge_mask_c=emask,
        edge_lit_l=edge_lit_l,
        edge_clause_l=edge_clause_l,
        edge_mask_l=emask,
        edge_perm_l=edge_perm_l,
        var_mask=var_mask,
        clause_mask=clause_mask,
        var_graph=var_graph,
        clause_graph=clause_graph,
        graph_mask=graph_mask,
        n_vars_per_graph=n_vars_per_graph,
        n_clauses_per_graph=n_clauses_per_graph,
        solutions=sol,
        n_vars=np.asarray(v_off, dtype=np.int32),
        n_clauses=np.asarray(c_off, dtype=np.int32),
        n_graphs=np.asarray(n_graphs, dtype=np.int32),
        solutions_k=sol_k,
    )


def attach_label_isolation(batch: SatBatch) -> SatBatch:
    """Compute per-bank-row isolation scores for weighted label selection.

    For each graph, every solutions_k row gets its mean Hamming distance
    (fraction of differing bits over the graph's vars) to the other K-1
    rows, z-scored within the graph. Because the bank rows are uniform
    solution draws, distance-to-the-bank estimates distance-to-a-random-
    solution, i.e. the negative of the centrality statistic that explains
    the raw sampler's per-solution bias (benchmarks/solution_bias.py,
    UNIFORMITY_ANALYSIS.md). Host-side numpy; no-op without a bank.
    """
    if batch.solutions_k is None:
        return batch
    sk = np.asarray(batch.solutions_k)          # [K, V]
    K = sk.shape[0]
    var_graph = np.asarray(batch.var_graph)
    G = batch.graph_mask.shape[0]
    iso = np.zeros((K, G), np.float32)
    if K > 1:
        for g in range(int(batch.n_graphs)):
            rows = sk[:, var_graph == g]        # [K, n_vars_g]
            if rows.shape[1] == 0:
                continue
            d = (rows[:, None, :] != rows[None, :, :]).mean(-1)
            dbar = d.sum(1) / (K - 1)
            std = dbar.std()
            if std > 1e-9:
                iso[:, g] = (dbar - dbar.mean()) / std
    return batch.replace(label_isolation_k=iso)
