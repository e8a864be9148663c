"""Pallas TPU kernel: sorted segmented sum via one-hot MXU tiles.

Replaces XLA's scatter-add lowering of `segment_sum` (the bandwidth
bottleneck of the SpMM path — see STATUS.md perf notes) for sorted segment
ids: edges are host-packed into tiles aligned to segment boundaries; each
grid step builds a [TE, W] one-hot membership mask on the VPU, reduces the
tile with one MXU matmul, and DMA-writes its [W, F] window into the HBM
output at the tile's base row. Windows of consecutive tiles overlap; the
TPU grid executes sequentially, so each row's owning tile writes last and
the final content is exact (no atomics, no scatter).

Falls back to `jax.ops.segment_sum` off-TPU or when the plan doesn't fit.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class SegsumPlan(NamedTuple):
    """Host-side tiling of a sorted segment-id array (static per batch)."""
    local_ids: np.ndarray   # [T, TE] int32 segment id - tile base
    mask: np.ndarray        # [T, TE] f32 validity
    base: np.ndarray        # [T] int32 output row base per tile
    order: np.ndarray       # [E] int32 edge permutation applied
    num_segments: int
    tile_edges: int
    window: int


def build_segsum_plan(seg_ids: np.ndarray, mask: np.ndarray,
                      num_segments: int, tile_edges: int = 1024,
                      window: int = 512) -> SegsumPlan | None:
    """Pack valid edges (sorted by segment) into boundary-aligned tiles.

    A tile takes up to `tile_edges` edges but never splits a segment and
    never spans more than `window` segments. Returns None if any single
    segment exceeds the limits (degenerate; caller falls back)."""
    seg_ids = np.asarray(seg_ids)
    valid = np.asarray(mask) > 0
    ids = seg_ids[valid]
    order = np.nonzero(valid)[0].astype(np.int32)
    E = len(ids)
    if E == 0:
        return None
    # segment boundaries in the valid-edge stream
    boundaries = np.concatenate([[0], np.nonzero(np.diff(ids))[0] + 1, [E]])
    seg_sizes = np.diff(boundaries)
    if seg_sizes.max(initial=0) > tile_edges:
        return None

    tiles = []
    start = 0
    while start < E:
        end = start
        first_seg = ids[start]
        # grow while next whole segment fits in both limits
        bidx = np.searchsorted(boundaries, start, side="right")
        while bidx < len(boundaries):
            nxt = boundaries[bidx]
            if nxt - start > tile_edges:
                break
            if nxt > start and ids[min(nxt - 1, E - 1)] - first_seg >= window:
                break
            end = nxt
            bidx += 1
        if end == start:  # single segment too wide for window
            return None
        tiles.append((start, end, int(first_seg)))
        start = end

    T = len(tiles)
    local_ids = np.zeros((T, tile_edges), dtype=np.int32)
    tmask = np.zeros((T, tile_edges), dtype=np.float32)
    base = np.zeros(T, dtype=np.int32)
    order_padded = np.zeros((T, tile_edges), dtype=np.int32)
    for t, (s, e, b) in enumerate(tiles):
        n = e - s
        local_ids[t, :n] = ids[s:e] - b
        tmask[t, :n] = 1.0
        base[t] = b
        order_padded[t, :n] = order[s:e]
    return SegsumPlan(local_ids=local_ids, mask=tmask, base=base,
                      order=order_padded.reshape(-1),
                      num_segments=num_segments, tile_edges=tile_edges,
                      window=window)


def _segsum_kernel(base_ref, values_ref, local_ids_ref, mask_ref, init_ref,
                   out_ref, part_ref, sem, *, window: int, F: int):
    del init_ref  # aliased to out_ref: provides the zero initialization
    t = pl.program_id(0)
    te = values_ref.shape[0]
    onehot = (local_ids_ref[:].reshape(te, 1) ==
              jax.lax.broadcasted_iota(jnp.int32, (te, window), 1))
    onehot = onehot.astype(jnp.float32) * mask_ref[:].reshape(te, 1)
    part_ref[:] = jax.lax.dot_general(
        onehot, values_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    dma = pltpu.make_async_copy(
        part_ref, out_ref.at[pl.ds(base_ref[t], window)], sem)
    dma.start()
    dma.wait()


def segsum_pallas(values: jnp.ndarray, plan: SegsumPlan) -> jnp.ndarray:
    """values: [E_valid_padded = T*TE, F] in plan order. Returns [M, F]."""
    T = plan.local_ids.shape[0]
    TE = plan.tile_edges
    W = plan.window
    F = values.shape[-1]
    # output padded by one window so the last tile's write stays in bounds
    M_pad = plan.num_segments + W

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((TE, F), lambda t, base: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TE,), lambda t, base: (t,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TE,), lambda t, base: (t,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # zero init (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((W, F), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    init = jnp.zeros((M_pad, F), jnp.float32)
    out = pl.pallas_call(
        functools.partial(_segsum_kernel, window=W, F=F),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M_pad, F), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        # operand indices include the scalar-prefetch arg: init is input 4
        input_output_aliases={4: 0},
        interpret=jax.default_backend() != "tpu",
    )(jnp.asarray(plan.base), values,
      jnp.asarray(plan.local_ids).reshape(-1),
      jnp.asarray(plan.mask).reshape(-1), init)
    return out[:plan.num_segments]


def gather_segsum(src: jnp.ndarray, gather_idx: jnp.ndarray,
                  plan: SegsumPlan) -> jnp.ndarray:
    """Fused out[s] = sum_{e in segment s} src[gather_idx[e]] using the
    plan's edge order. gather_idx: original [E] edge array."""
    idx = jnp.take(gather_idx, jnp.asarray(plan.order))
    values = jnp.take(src, idx, axis=0)
    return segsum_pallas(values, plan)


# ---------------------------------------------------------------------------
# Differentiable SpMM pair over precomputed plans.
#
# l2c and c2l are transposes of the same incidence, so each is the other's
# VJP: d/dx sum-into-clauses == gather-back-from-clauses summed per literal.


from flax import struct


@struct.dataclass
class BatchPlans:
    """Bucket-static (padded) plan arrays for both SpMM directions.

    *_gather holds the pre-folded source row per plan slot. Shapes depend
    only on the bucket, so jitted functions taking BatchPlans compile once
    per bucket; the sizing ints are static pytree metadata.
    """
    c_local_ids: jnp.ndarray  # [Tc, TE]
    c_mask: jnp.ndarray       # [Tc, TE]
    c_base: jnp.ndarray       # [Tc]
    c_gather: jnp.ndarray     # [Tc*TE] literal row per slot
    l_local_ids: jnp.ndarray  # [Tl, TE]
    l_mask: jnp.ndarray       # [Tl, TE]
    l_base: jnp.ndarray       # [Tl]
    l_gather: jnp.ndarray     # [Tl*TE] clause row per slot
    tile_edges: int = struct.field(pytree_node=False, default=1024)
    window: int = struct.field(pytree_node=False, default=512)
    num_clauses: int = struct.field(pytree_node=False, default=0)
    num_literals: int = struct.field(pytree_node=False, default=0)


def _pad_plan(plan: SegsumPlan, gather_idx: np.ndarray, pad_tiles: int):
    T = plan.local_ids.shape[0]
    if T > pad_tiles:
        return None
    TE = plan.tile_edges
    local_ids = np.zeros((pad_tiles, TE), np.int32)
    mask = np.zeros((pad_tiles, TE), np.float32)
    base = np.full(pad_tiles, plan.num_segments, np.int32)
    gather = np.zeros(pad_tiles * TE, np.int32)
    local_ids[:T] = plan.local_ids
    mask[:T] = plan.mask
    base[:T] = plan.base
    gather[:T * TE] = gather_idx[plan.order]
    return local_ids, mask, base, gather


def build_batch_plans(batch, tile_edges: int = 1024, window: int = 512,
                      pad_tiles: int | None = None) -> BatchPlans | None:
    """Build padded plans for both directions of a SatBatch. Returns None
    when a segment exceeds the tile/window limits (caller falls back to
    XLA segment_sum)."""
    E = batch.E
    if pad_tiles is None:
        pad_tiles = -(-int(E * 1.25) // tile_edges) + 2
    pc = build_segsum_plan(np.asarray(batch.edge_clause_c),
                           np.asarray(batch.edge_mask_c),
                           num_segments=batch.C, tile_edges=tile_edges,
                           window=window)
    plc = build_segsum_plan(np.asarray(batch.edge_lit_l),
                            np.asarray(batch.edge_mask_l),
                            num_segments=2 * batch.V,
                            tile_edges=tile_edges, window=window)
    if pc is None or plc is None:
        import sys
        print("pallas_segsum: degenerate tiling, falling back to XLA "
              "segment_sum", file=sys.stderr)
        return None
    a = _pad_plan(pc, np.asarray(batch.edge_lit_c), pad_tiles)
    b = _pad_plan(plc, np.asarray(batch.edge_clause_l), pad_tiles)
    if a is None or b is None:
        return None
    return BatchPlans(
        c_local_ids=a[0], c_mask=a[1], c_base=a[2], c_gather=a[3],
        l_local_ids=b[0], l_mask=b[1], l_base=b[2], l_gather=b[3],
        tile_edges=tile_edges, window=window,
        num_clauses=batch.C, num_literals=2 * batch.V)


def _run_direction(x, local_ids, mask, base, gather, num_segments,
                   tile_edges, window):
    values = jnp.take(x, gather, axis=0)
    plan = SegsumPlan(local_ids=local_ids, mask=mask, base=base,
                      order=gather, num_segments=num_segments,
                      tile_edges=tile_edges, window=window)
    return segsum_pallas(values, plan)


def _int_zero_cots(*arrays):
    import numpy as _np

    out = []
    for a in arrays:
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.integer):
            out.append(_np.zeros(jnp.asarray(a).shape, jax.dtypes.float0))
        else:
            out.append(jnp.zeros_like(a))
    return tuple(out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def _spmm(x, f_local, f_mask, f_base, f_gather,
          b_local, b_mask, b_base, b_gather,
          num_out, num_in, te_w):
    return _run_direction(x, f_local, f_mask, f_base, f_gather, num_out,
                          te_w[0], te_w[1])


def _spmm_fwd(x, f_local, f_mask, f_base, f_gather,
              b_local, b_mask, b_base, b_gather, num_out, num_in, te_w):
    out = _run_direction(x, f_local, f_mask, f_base, f_gather, num_out,
                         te_w[0], te_w[1])
    return out, (f_local, f_mask, f_base, f_gather,
                 b_local, b_mask, b_base, b_gather)


def _spmm_bwd(num_out, num_in, te_w, res, g):
    (f_local, f_mask, f_base, f_gather,
     b_local, b_mask, b_base, b_gather) = res
    dx = _run_direction(g, b_local, b_mask, b_base, b_gather, num_in,
                        te_w[0], te_w[1])
    return (dx,) + _int_zero_cots(f_local, f_mask, f_base, f_gather,
                                  b_local, b_mask, b_base, b_gather)


_spmm.defvjp(_spmm_fwd, _spmm_bwd)


def plan_lit_to_clause(x: jnp.ndarray, plans) -> jnp.ndarray:
    """lit->clause SpMM via the planned backend: Pallas segsum plans or
    block-sparse tiles (ops/tiled_ops.TiledIncidence) — the model and the
    losses dispatch on the plan object's type, so every `plans=` call
    site serves both layouts."""
    from diffusionsat_tpu.ops.tiled_ops import (
        TiledIncidence, tiled_lit_to_clause)
    if isinstance(plans, TiledIncidence):
        return tiled_lit_to_clause(x, plans)
    return _spmm(x, plans.c_local_ids, plans.c_mask, plans.c_base,
                 plans.c_gather, plans.l_local_ids, plans.l_mask,
                 plans.l_base, plans.l_gather,
                 plans.num_clauses, plans.num_literals,
                 (plans.tile_edges, plans.window))


def plan_clause_to_lit(x: jnp.ndarray, plans) -> jnp.ndarray:
    """clause->lit SpMM via the planned backend (see plan_lit_to_clause)."""
    from diffusionsat_tpu.ops.tiled_ops import (
        TiledIncidence, tiled_clause_to_lit)
    if isinstance(plans, TiledIncidence):
        return tiled_clause_to_lit(x, plans)
    return _spmm(x, plans.l_local_ids, plans.l_mask, plans.l_base,
                 plans.l_gather, plans.c_local_ids, plans.c_mask,
                 plans.c_base, plans.c_gather,
                 plans.num_literals, plans.num_clauses,
                 (plans.tile_edges, plans.window))
