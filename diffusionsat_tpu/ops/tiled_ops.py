"""Block-sparse tiled incidence SpMM — the dense path's trick applied to
graphs past the dense block tables.

The flat edge-list path (gather + sorted segment sums) is the execution
layout for SHA-1/SATLIB-scale CNFs (>128 vars), and it is gather-fabric
bound: ~15 M edge-traversals/s vs the dense path's ~90 M
(BENCH_FLAT_PALLAS). The dense path's lesson (BENCH_REF_REGIME) is that
batched MXU matmuls beat the gather fabric even at ~1% incidence fill.
This module tiles a big sparse incidence into [Tc x Tl] blocks,
materializes ONLY the non-empty tiles (SHA-1 Tseitin CNFs are banded:
~3% of the tile grid is non-empty at 128x128), and runs each SpMM as one
batched matmul over the tile list plus a tile-level segment sum — MXU
work instead of per-edge gathers.

Replaces the same reference hot loop as ops/graph_ops.py
(`tf.sparse.sparse_dense_matmul`, reference model/query_sat.py:255,269,292)
with a third execution layout: flat XLA <-> Pallas plans <-> tiled blocks,
selected per batch. Build is host-side numpy; the device sees static
shapes only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# einsum precision for the tile matmuls; DEFAULT = bf16 inputs with f32
# accumulation (the dense path's measured fast setting; incidence values
# are small integers, exact in bf16)
TILE_PRECISION = jax.lax.Precision.DEFAULT


@struct.dataclass
class TiledIncidence:
    """Non-empty [Tc, Tl] tiles of one batch's clause x literal incidence."""
    blocks: jnp.ndarray   # [T, Tc, Tl] f32 edge multiplicities
    row_blk: jnp.ndarray  # [T] int32 clause-block index, sorted ascending
    col_blk: jnp.ndarray  # [T] int32 literal-block index
    tc: int = struct.field(pytree_node=False)
    tl: int = struct.field(pytree_node=False)
    n_row_blocks: int = struct.field(pytree_node=False)
    n_col_blocks: int = struct.field(pytree_node=False)
    num_clauses: int = struct.field(pytree_node=False)   # padded C of batch
    num_literals: int = struct.field(pytree_node=False)  # 2V of batch

    @property
    def n_tiles(self) -> int:
        return self.blocks.shape[0]


def build_tiled_incidence(batch, tc: int = 128, tl: int = 128,
                          pad_tiles: int = 64) -> TiledIncidence:
    """Host-side tile build from a SatBatch's masked edge list."""
    em = np.asarray(batch.edge_mask_c) > 0
    return build_tiled_from_edges(
        np.asarray(batch.edge_clause_c)[em],
        np.asarray(batch.edge_lit_c)[em],
        int(batch.C), int(2 * batch.V), tc=tc, tl=tl, pad_tiles=pad_tiles)


def build_tiled_from_edges(rows, cols, n_rows: int, n_cols: int,
                           tc: int = 128, tl: int = 128,
                           pad_tiles: int = 64) -> TiledIncidence:
    """Tile an arbitrary (row, col) incidence edge list (already masked;
    duplicate edges accumulate). Serves any bipartite membership
    aggregation — CNF clause x literal, ANF clause x value-node.

    Only tiles containing at least one real edge are materialized; the
    tile count is rounded up to `pad_tiles` (zero blocks) so nearby batch
    sizes share one compiled shape.
    """
    cl = np.asarray(rows).astype(np.int64)
    lit = np.asarray(cols).astype(np.int64)
    C, L = int(n_rows), int(n_cols)
    n_rb = -(-C // tc)
    n_cb = -(-L // tl)

    rb, cb = cl // tc, lit // tl
    tile_id = rb * n_cb + cb
    order = np.argsort(tile_id, kind="stable")
    tile_id, cl, lit = tile_id[order], cl[order], lit[order]
    uniq, start = np.unique(tile_id, return_index=True)
    T = len(uniq)
    Tp = max(-(-T // pad_tiles) * pad_tiles, pad_tiles)

    blocks = np.zeros((Tp, tc, tl), np.float32)
    # edge -> (tile, local row, local col); repeated literals accumulate,
    # matching the flat segment-sum semantics exactly
    tix = np.searchsorted(uniq, tile_id)
    np.add.at(blocks, (tix, cl % tc, lit % tl), 1.0)

    row_blk = np.zeros(Tp, np.int32)
    col_blk = np.zeros(Tp, np.int32)
    row_blk[:T] = (uniq // n_cb).astype(np.int32)
    col_blk[:T] = (uniq % n_cb).astype(np.int32)
    # padding tiles: all-zero blocks pointed at segment 0 — they add zeros
    return TiledIncidence(
        blocks=blocks, row_blk=row_blk, col_blk=col_blk, tc=tc, tl=tl,
        n_row_blocks=n_rb, n_col_blocks=n_cb, num_clauses=C,
        num_literals=L)


def build_anf_tiles(batch, tc: int = 128, tl: int = 128,
                    pad_tiles: int = 64) -> TiledIncidence:
    """Tiles of an ANFBatch's clause x value-node membership incidence
    (rows = clauses, cols = 1 + V + A value nodes). Replaces BOTH
    directions of the ANF model's segment aggregations
    (models/anf_sat.py seg_to_clause/seg_to_nodes and the
    anf_value_cplx angle/log-length sums)."""
    em = np.asarray(batch.edge_mask_c) > 0
    return build_tiled_from_edges(
        np.asarray(batch.edge_clause_c)[em],
        np.asarray(batch.edge_node_c)[em],
        int(batch.C), int(batch.n_value_nodes),
        tc=tc, tl=tl, pad_tiles=pad_tiles)


def tiled_lit_to_clause(x: jnp.ndarray, ti: TiledIncidence,
                        precision=None) -> jnp.ndarray:
    """[2V, F] literal features -> [C, F] clause sums via tile matmuls."""
    F = x.shape[1]
    pad = ti.n_col_blocks * ti.tl - x.shape[0]
    xb = jnp.pad(x, ((0, pad), (0, 0))).reshape(ti.n_col_blocks, ti.tl, F)
    g = jnp.take(xb, ti.col_blk, axis=0)                      # [T, Tl, F]
    prod = jnp.einsum("tcl,tlf->tcf", ti.blocks, g,
                      precision=precision or TILE_PRECISION)  # [T, Tc, F]
    out = jax.ops.segment_sum(prod, ti.row_blk,
                              num_segments=ti.n_row_blocks,
                              indices_are_sorted=True)
    return out.reshape(ti.n_row_blocks * ti.tc, F)[:ti.num_clauses]


def tiled_clause_to_lit(y: jnp.ndarray, ti: TiledIncidence,
                        precision=None) -> jnp.ndarray:
    """[C, F] clause features -> [2V, F] literal sums (transpose SpMM)."""
    F = y.shape[1]
    pad = ti.n_row_blocks * ti.tc - y.shape[0]
    yb = jnp.pad(y, ((0, pad), (0, 0))).reshape(ti.n_row_blocks, ti.tc, F)
    g = jnp.take(yb, ti.row_blk, axis=0)                      # [T, Tc, F]
    prod = jnp.einsum("tcl,tcf->tlf", ti.blocks, g,
                      precision=precision or TILE_PRECISION)  # [T, Tl, F]
    out = jax.ops.segment_sum(prod, ti.col_blk,
                              num_segments=ti.n_col_blocks)
    return out.reshape(ti.n_col_blocks * ti.tl, F)[:ti.num_literals]
