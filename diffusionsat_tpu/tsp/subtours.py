"""Violated-subtour-cut finder, native C++ via ctypes.

Replaces the reference Cython extension `loss/tsp_subtours_cy.pyx` (built
through pyximport in `loss/unsupervised_tsp.py:6-7`): greedy edge addition
with component tracking (union-find / Tarjan SCC) emitting cut index pairs.
Exposed both as a host function and as a jit-safe `jax.pure_callback` with
static-size padding.
"""

from __future__ import annotations

import ctypes

import numpy as np

import jax
import jax.numpy as jnp

from diffusionsat_tpu.sat.solvers import _NativeLib
from diffusionsat_tpu.tsp import PADDING_VALUE


def _lib():
    lib = _NativeLib.get()
    if not hasattr(lib, "_tsp_ready"):
        lib.dsat_tsp_subtours.restype = ctypes.c_longlong
        lib.dsat_tsp_subtours.argtypes = [
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_float, ctypes.c_int,
            ctypes.POINTER(ctypes.c_longlong), ctypes.c_longlong,
        ]
        lib._tsp_ready = True
    return lib


def find_subtours(predictions: np.ndarray, adjacency: np.ndarray,
                  symmetric: bool = True,
                  padding_value: float = PADDING_VALUE) -> np.ndarray:
    """Host call. predictions/adjacency: [B, P, P] float32.
    Returns int64 [n_pairs, 2] of (cut_id, flat_edge_index)."""
    preds = np.ascontiguousarray(predictions, dtype=np.float32)
    adj = np.ascontiguousarray(adjacency, dtype=np.float32)
    b, p, _ = preds.shape
    max_pairs = max(16 * b * p, 1024)
    lib = _lib()
    for _ in range(4):
        out = np.zeros((max_pairs, 2), dtype=np.int64)
        n = lib.dsat_tsp_subtours(
            b, p, preds.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            adj.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            padding_value, 1 if symmetric else 0,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)), max_pairs)
        if n <= max_pairs:
            return out[:n]
        max_pairs = int(n)
    raise RuntimeError("subtour buffer retry exhausted")


def subtour_pairs_callback(predictions: jnp.ndarray, adjacency: jnp.ndarray,
                           max_pairs: int, symmetric: bool = True):
    """jit-safe subtour finder: returns (pairs [max_pairs, 2] int32 padded
    with -1, count)."""

    def host(preds, adj):
        pairs = find_subtours(np.asarray(preds), np.asarray(adj),
                              symmetric=symmetric)
        out = np.full((max_pairs, 2), -1, dtype=np.int32)
        n = min(len(pairs), max_pairs)
        out[:n] = pairs[:n].astype(np.int32)
        return out, np.asarray(n, dtype=np.int32)

    return jax.pure_callback(
        host,
        (jax.ShapeDtypeStruct((max_pairs, 2), jnp.int32),
         jax.ShapeDtypeStruct((), jnp.int32)),
        predictions, adjacency)
