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
                      num_segments: int, tile_edges: int = 256,
                      window: int = 128) -> SegsumPlan | None:
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


def _segsum_kernel(base_ref, values_ref, local_ids_ref, mask_ref, out_ref,
                   part_ref, sem, *, window: int, F: int):
    t = pl.program_id(0)
    te = values_ref.shape[0]
    onehot = (local_ids_ref[0, :].reshape(te, 1) ==
              jax.lax.broadcasted_iota(jnp.int32, (te, window), 1))
    onehot = onehot.astype(jnp.float32) * mask_ref[0, :].reshape(te, 1)
    part_ref[:] = jax.lax.dot_general(
        onehot, values_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
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
            pl.BlockSpec((1, TE), lambda t, base: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TE), lambda t, base: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((W, F), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_segsum_kernel, window=W, F=F),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M_pad, F), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=jax.default_backend() != "tpu",
    )(jnp.asarray(plan.base), values, jnp.asarray(plan.local_ids),
      jnp.asarray(plan.mask))
    # windows cover [0, last_base + W) contiguously; segments beyond hold
    # no edges — zero the (possibly uninitialized) tail
    covered = min(int(plan.base[-1]) + W, plan.num_segments)
    out = out[:plan.num_segments]
    if covered < plan.num_segments:
        out = out.at[covered:].set(0.0)
    return out


def gather_segsum(src: jnp.ndarray, gather_idx: jnp.ndarray,
                  plan: SegsumPlan) -> jnp.ndarray:
    """Fused out[s] = sum_{e in segment s} src[gather_idx[e]] using the
    plan's edge order. gather_idx: original [E] edge array."""
    idx = jnp.take(gather_idx, jnp.asarray(plan.order))
    values = jnp.take(src, idx, axis=0)
    return segsum_pallas(values, plan)
