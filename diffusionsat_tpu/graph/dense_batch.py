"""Dense per-graph block batch layout — the MXU execution path.

The flagship DiffusionSAT workload packs many *tiny* formulas (3-30
variables, reference `diffusion_training.py:76-79`) into one batch. The
flat edge-list layout (graph/batch.py) serves arbitrary graph sizes but
pays for generality with gathers and segment ops — measured >80% of the
train-step time on TPU (STATUS.md round-1 perf notes). For small graphs
the TPU-right representation is a *dense per-graph incidence block*:

- every graph is padded to a fixed `[Cg, 2*Vg]` 0/1 incidence matrix
  (columns 0..Vg-1 = positive literals, Vg..2Vg-1 = negative, matching the
  reference literal layout `data/SatSpecifics.py:26-35`);
- both SpMM directions become one batched dense matmul each
  (`einsum('gcl,glf->gcf')` and its transpose) that XLA tiles straight
  onto the MXU;
- PairNorm means, per-graph losses, and SAT checks become masked
  reductions over the node axis — plain dense ops, fully fusible, with
  zero gathers or scatter-adds anywhere in the step.

Padding waste (Vg/Cg are per-bucket maxima) costs dense FLOPs, which the
MXU has in abundance; what it saves is the HBM-bound gather/scatter
traffic that dominated the flat path. Model parameters are layout
independent, so checkpoints trained on either layout load on the other.
"""

from __future__ import annotations

import numpy as np
from flax import struct

from diffusionsat_tpu.graph.batch import SatBatch


def _round_up(x: int, m: int) -> int:
    return ((int(x) + m - 1) // m) * m


@struct.dataclass
class DenseSatBatch:
    """A batch of G formulas as dense per-graph blocks (all padded)."""
    incidence: np.ndarray          # [G, Cg, 2*Vg] f32 0/1 (k if repeated lit)
    var_mask: np.ndarray           # [G, Vg] f32
    clause_mask: np.ndarray        # [G, Cg] f32
    graph_mask: np.ndarray         # [G] f32
    n_vars_per_graph: np.ndarray   # [G] f32
    n_clauses_per_graph: np.ndarray  # [G] f32
    solutions: np.ndarray          # [G, Vg] int32
    n_vars: np.ndarray             # [] int32 total real vars
    n_clauses: np.ndarray          # [] int32
    n_graphs: np.ndarray           # [] int32
    # optional multi-label bank [K, G, Vg] int32 (see SatBatch.solutions_k)
    solutions_k: np.ndarray | None = None
    # optional per-bank-row isolation scores [K, G] f32
    # (see SatBatch.label_isolation_k; layout-independent shape)
    label_isolation_k: np.ndarray | None = None

    @property
    def G(self) -> int:
        return self.graph_mask.shape[0]

    @property
    def Vg(self) -> int:
        return self.var_mask.shape[1]

    @property
    def Cg(self) -> int:
        return self.clause_mask.shape[1]


def dense_dims_for(batches, pad_graphs: int = 4, pad_nodes: int = 8
                   ) -> tuple[int, int, int]:
    """Static (G, Vg, Cg) covering every flat batch in `batches` — one
    compilation for the whole dataset."""
    G = Vg = Cg = 1
    for b in batches:
        G = max(G, int(b.n_graphs))
        Vg = max(Vg, int(np.max(np.asarray(b.n_vars_per_graph), initial=1)))
        Cg = max(Cg, int(np.max(np.asarray(b.n_clauses_per_graph),
                                initial=1)))
    return (_round_up(G, pad_graphs), _round_up(Vg, pad_nodes),
            _round_up(Cg, pad_nodes))


def dense_from_flat(b: SatBatch, G: int, Vg: int, Cg: int) -> DenseSatBatch:
    """Re-block a flat edge-list batch into dense per-graph incidence.

    Pure host-side numpy (device transfer happens once at the jitted call,
    like the flat path). Requires every graph to fit (n_vars <= Vg,
    n_clauses <= Cg, n_graphs <= G)."""
    nb_graphs = int(b.n_graphs)
    nv = np.asarray(b.n_vars_per_graph, np.int64)[:nb_graphs]
    nc = np.asarray(b.n_clauses_per_graph, np.int64)[:nb_graphs]
    if nb_graphs > G or (len(nv) and nv.max() > Vg) or \
            (len(nc) and nc.max() > Cg):
        raise ValueError(
            f"batch ({nb_graphs} graphs, {nv.max(initial=0)} vars, "
            f"{nc.max(initial=0)} clauses) exceeds dense dims "
            f"({G}, {Vg}, {Cg})")
    v_off = np.concatenate([[0], np.cumsum(nv)])
    c_off = np.concatenate([[0], np.cumsum(nc)])

    em = np.asarray(b.edge_mask_c) > 0
    lit = np.asarray(b.edge_lit_c)[em].astype(np.int64)
    cl = np.asarray(b.edge_clause_c)[em].astype(np.int64)
    V = b.V
    var = np.where(lit < V, lit, lit - V)
    neg = (lit >= V).astype(np.int64)
    g_e = np.asarray(b.clause_graph)[cl].astype(np.int64)
    local_c = cl - c_off[g_e]
    local_v = var - v_off[g_e]
    col = local_v + neg * Vg

    inc = np.zeros((G, Cg, 2 * Vg), np.float32)
    # repeated literals in a clause accumulate, matching the flat
    # edge-list segment-sum semantics exactly
    np.add.at(inc, (g_e, local_c, col), 1.0)

    var_mask = np.zeros((G, Vg), np.float32)
    clause_mask = np.zeros((G, Cg), np.float32)
    sol = np.zeros((G, Vg), np.int32)
    flat_sol = np.asarray(b.solutions)
    flat_sol_k = None if b.solutions_k is None else np.asarray(b.solutions_k)
    sol_k = None if flat_sol_k is None else \
        np.zeros((flat_sol_k.shape[0], G, Vg), np.int32)
    flat_iso = None if getattr(b, "label_isolation_k", None) is None \
        else np.asarray(b.label_isolation_k)
    iso_k = None
    if flat_iso is not None:
        iso_k = np.zeros((flat_iso.shape[0], G), np.float32)
        iso_k[:, :nb_graphs] = flat_iso[:, :nb_graphs]
    for g in range(nb_graphs):
        var_mask[g, :nv[g]] = 1.0
        clause_mask[g, :nc[g]] = 1.0
        sol[g, :nv[g]] = flat_sol[v_off[g]:v_off[g + 1]]
        if sol_k is not None:
            sol_k[:, g, :nv[g]] = flat_sol_k[:, v_off[g]:v_off[g + 1]]

    graph_mask = np.zeros(G, np.float32)
    graph_mask[:nb_graphs] = 1.0
    nvg = np.zeros(G, np.float32)
    nvg[:nb_graphs] = nv
    ncg = np.zeros(G, np.float32)
    ncg[:nb_graphs] = nc

    return DenseSatBatch(
        incidence=inc, var_mask=var_mask, clause_mask=clause_mask,
        graph_mask=graph_mask, n_vars_per_graph=nvg,
        n_clauses_per_graph=ncg, solutions=sol,
        n_vars=np.asarray(int(nv.sum()), np.int32),
        n_clauses=np.asarray(int(nc.sum()), np.int32),
        n_graphs=np.asarray(nb_graphs, np.int32),
        solutions_k=sol_k, label_isolation_k=iso_k)


def densify_batches(batches, pad_graphs: int = 4, pad_nodes: int = 8
                    ) -> list[DenseSatBatch]:
    """Convert a list of flat batches to dense blocks with shared static
    dims (single XLA compilation across the list)."""
    G, Vg, Cg = dense_dims_for(batches, pad_graphs, pad_nodes)
    return [dense_from_flat(b, G, Vg, Cg) for b in batches]


# quantization levels for per-batch dense dims: (Vg, Cg) pairs sized for
# threshold 3-SAT (m ~ 4.3n). The fine grid (step 4 vars up to 32) keeps
# block fill high — the packer sorts instances by size so batches are
# size-homogeneous, and each level is one persistent-cached XLA program.
_DIM_LEVELS = ((8, 48), (12, 64), (16, 80), (20, 96), (24, 112),
               (28, 128), (32, 144), (48, 224), (64, 288), (96, 448),
               (128, 576))

# finer grid (step-2 vars, clause dim snapped to the threshold ratio
# 4.258n + 58.26 n^(-2/3) rounded up to 8): measured on the 60k-instance
# k16 flagship cache, incidence fill 75.7% -> 86.5% and var-block fill
# 82.0% -> 90.9% with g_quantum=16 (24 shapes vs 14). DEFAULT since
# round 3 — measured +25% train throughput on the flagship workload
# (BENCH_FINE_r03: 51.5 vs 41.3 M edge-traversals/s/chip, 45.4 ms/step).
# Opt back to the coarse table with DSAT_FINE_BLOCKS=0 (fewer XLA
# programs, e.g. for quick cold-cache smoke runs).
_FINE_DIM_LEVELS = tuple(
    (v, int(-(-(4.258 * v + 58.26 * v ** (-2.0 / 3.0)) // 8) * 8))
    for v in range(6, 33, 2)) + ((48, 224), (64, 288), (96, 448),
                                 (128, 576))


def densify_batches_quantized(batches, g_quantum: int | None = None
                              ) -> list[DenseSatBatch]:
    """Per-batch dense dims snapped to a small set of quantized levels.

    The packer sorts instances by size (data/packing.py), so batches are
    size-homogeneous: batches of tiny graphs get small blocks instead of
    paying the global maximum's padding. The graph dim is quantized
    per-batch (rounded up to `g_quantum`, capped by the level's maximum)
    rather than padded to the level-wide maximum. Distinct (G, Vg, Cg)
    shapes stay bounded by the level table times a couple of G levels
    (one XLA program each, persistent-cached).
    """
    import os
    fine = os.environ.get("DSAT_FINE_BLOCKS", "1") == "1"
    table = _FINE_DIM_LEVELS if fine else _DIM_LEVELS
    if g_quantum is None:
        g_quantum = 16 if fine else 32

    def level_for(maxv: int, maxc: int) -> tuple[int, int]:
        for vg, cg in table:
            if maxv <= vg and maxc <= cg:
                return vg, cg
        # beyond the table the dense incidence would be O(Vg*Cg) per
        # graph — hundreds of MB for e.g. SHA-1 CNFs. Refuse so callers
        # take the flat edge-list path (diffusion_training.py fallback).
        raise ValueError(
            f"graph with {maxv} vars / {maxc} clauses exceeds the dense "
            f"block levels (max {table[-1]}); use the flat layout")

    out = []
    for b in batches:
        ng = int(b.n_graphs)
        maxv = int(np.max(np.asarray(b.n_vars_per_graph), initial=1))
        maxc = int(np.max(np.asarray(b.n_clauses_per_graph), initial=1))
        lv = level_for(maxv, maxc)
        out.append(dense_from_flat(b, _round_up(ng, g_quantum),
                                   lv[0], lv[1]))
    return out
