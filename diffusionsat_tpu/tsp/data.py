"""Euclidean / asymmetric TSP instance generation with optimal labels.

Replaces reference `data/tsp.py` (Concorde-labeled Euclidean TSP; the
pyconcorde dependency is unavailable) and `data/asymmetric_tsp_gen.py`
(brute force). Optimal tours come from exact Held–Karp DP — the native
C++ bitmask DP (sat/native/solver.cpp dsat_tsp_held_karp) up to n <= 20,
the Python DP as fallback for n <= 13 — and nearest-neighbor + 2-opt
refinement beyond; labels mark tour edges 1 (in both directions with 0.5
each for the Euclidean case the reference uses 1/0 matrices — we emit 1
for both directions of a tour edge). The reference's default TSP regime
(16-node graphs, reference data/tsp.py) is therefore exactly labeled.
"""

from __future__ import annotations

import itertools
import random
from typing import Iterator

import numpy as np

from diffusionsat_tpu.tsp import PADDING_VALUE


def held_karp(dist: np.ndarray) -> list[int]:
    """Exact TSP tour via Held-Karp DP. O(n^2 2^n); n <= ~15."""
    n = len(dist)
    full = 1 << n
    dp = np.full((full, n), np.inf)
    parent = np.full((full, n), -1, dtype=np.int64)
    dp[1][0] = 0.0
    for mask in range(1, full):
        if not mask & 1:
            continue
        for last in range(n):
            if not mask & (1 << last) or not np.isfinite(dp[mask][last]):
                continue
            base = dp[mask][last]
            for nxt in range(n):
                if mask & (1 << nxt):
                    continue
                nm = mask | (1 << nxt)
                cand = base + dist[last][nxt]
                if cand < dp[nm][nxt]:
                    dp[nm][nxt] = cand
                    parent[nm][nxt] = last
    best_last = int(np.argmin(dp[full - 1] + dist[:, 0]))
    tour = []
    mask, last = full - 1, best_last
    while last != -1:
        tour.append(last)
        nlast = parent[mask][last]
        mask ^= 1 << last
        last = int(nlast)
    return tour[::-1]


def native_held_karp(dist: np.ndarray) -> list[int] | None:
    """Exact tour via the native C++ bitmask DP (solver.cpp
    dsat_tsp_held_karp); None if the library is unavailable."""
    import ctypes

    try:
        from diffusionsat_tpu.sat.solvers import _NativeLib
        lib = _NativeLib.get()
    except Exception:
        return None
    if not hasattr(lib, "_hk_ready"):
        lib.dsat_tsp_held_karp.restype = ctypes.c_double
        lib.dsat_tsp_held_karp.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int)]
        lib._hk_ready = True
    n = len(dist)
    d = np.ascontiguousarray(dist, dtype=np.float32)
    tour = np.zeros(n, dtype=np.int32)
    length = lib.dsat_tsp_held_karp(
        n, d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        tour.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    if length < 0:
        return None
    return [int(x) for x in tour]


def native_branch_bound(dist: np.ndarray,
                        node_budget: int = 50_000_000) -> list[int] | None:
    """Exact tour via native DFS branch-and-bound with an MST lower bound
    (solver.cpp dsat_tsp_branch_bound) — the exact-label extension past
    Held-Karp's 2^n memory wall; ~1-2 s at n=30 on Euclidean instances.
    None if the library is unavailable or the node budget was exhausted
    before optimality was proven (caller falls back to 2-opt)."""
    import ctypes

    try:
        from diffusionsat_tpu.sat.solvers import _NativeLib
        lib = _NativeLib.get()
    except Exception:
        return None
    if not hasattr(lib, "_bb_ready"):
        lib.dsat_tsp_branch_bound.restype = ctypes.c_double
        lib.dsat_tsp_branch_bound.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.c_longlong]
        lib._bb_ready = True
    n = len(dist)
    d = np.ascontiguousarray(dist, dtype=np.float32)
    tour = np.zeros(n, dtype=np.int32)
    length = lib.dsat_tsp_branch_bound(
        n, d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        tour.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), node_budget)
    if length < 0:
        return None
    return [int(x) for x in tour]


# labels are exact up to this size: Held-Karp DP to 20, branch-and-bound
# to 30 (TSP_LABEL_FIDELITY.json quantified the old 2-opt labels at
# 1.2-1.8% mean gap over n 14-20; both exact paths remove that bias)
EXACT_LABEL_MAX_N = 30


def optimal_tour(dist: np.ndarray, seed: int = 0,
                 exact_max_n: int = EXACT_LABEL_MAX_N) -> list[int]:
    """Best-available tour: native exact DP to n<=20, native exact
    branch-and-bound to `exact_max_n`, Python DP fallback to 13, 2-opt
    beyond (or if the B&B node budget runs out)."""
    n = len(dist)
    if n <= min(exact_max_n, 20):
        tour = native_held_karp(dist)
        if tour is not None:
            return tour
        if n <= 13:
            return held_karp(dist)
    elif n <= exact_max_n:
        tour = native_branch_bound(dist)
        if tour is not None:
            return tour
    return two_opt_tour(dist, seed)


def two_opt_tour(dist: np.ndarray, seed: int = 0) -> list[int]:
    """Nearest-neighbor + 2-opt refinement for larger n."""
    n = len(dist)
    rng = random.Random(seed)
    cur = rng.randrange(n)
    unvisited = set(range(n)) - {cur}
    tour = [cur]
    while unvisited:
        nxt = min(unvisited, key=lambda j: dist[cur][j])
        tour.append(nxt)
        unvisited.remove(nxt)
        cur = nxt
    improved = True
    while improved:
        improved = False
        for i in range(1, n - 1):
            for j in range(i + 1, n):
                a, b = tour[i - 1], tour[i]
                c, d = tour[j], tour[(j + 1) % n]
                if a == c or b == d:
                    continue
                if dist[a][c] + dist[b][d] < dist[a][b] + dist[c][d] - 1e-12:
                    tour[i:j + 1] = tour[i:j + 1][::-1]
                    improved = True
    return tour


def tour_length(dist: np.ndarray, tour: list[int]) -> float:
    return float(sum(dist[tour[i]][tour[(i + 1) % len(tour)]]
                     for i in range(len(tour))))


def tour_to_label_matrix(tour: list[int], padded: int) -> np.ndarray:
    lbl = np.zeros((padded, padded), dtype=np.float32)
    n = len(tour)
    for i in range(n):
        a, b = tour[i], tour[(i + 1) % n]
        lbl[a, b] = 1.0
        lbl[b, a] = 1.0
    lbl[len(tour):, :] = PADDING_VALUE
    lbl[:, len(tour):] = PADDING_VALUE
    return lbl


class EuclideanTSP:
    """Random points in the unit square with optimal tour labels
    (reference data/tsp.py:14-118 semantics; padded [B, P, P] tensors)."""

    def __init__(self, min_node_count: int = 16, max_node_count: int = 16,
                 train_size: int = 100_000, test_size: int = 10_000,
                 padded_size: int | None = None, seed: int = 0):
        self.min_node_count = min_node_count
        self.max_node_count = max_node_count
        self.train_size = train_size
        self.test_size = test_size
        self.padded_size = padded_size or max_node_count
        self.seed = seed

    def _one(self, rng: np.random.Generator, seed: int):
        n = int(rng.integers(self.min_node_count, self.max_node_count + 1))
        coords = rng.random((n, 2)).astype(np.float32)
        dist = np.sqrt(((coords[:, None, :] - coords[None, :, :]) ** 2
                        ).sum(-1)).astype(np.float32)
        tour = optimal_tour(dist, seed)
        p = self.padded_size
        adj = np.full((p, p), PADDING_VALUE, dtype=np.float32)
        adj[:n, :n] = dist
        cpad = np.full((p, 2), PADDING_VALUE, dtype=np.float32)
        cpad[:n] = coords
        label = tour_to_label_matrix(tour, p)
        return adj, cpad, label

    def _generator(self, size: int, seed: int) -> Iterator:
        rng = np.random.default_rng(seed)
        for i in range(size):
            yield self._one(rng, seed + i)

    def train_generator(self):
        return self._generator(self.train_size, self.seed)

    def test_generator(self):
        return self._generator(self.test_size, self.seed + 1_000_003)

    def batches(self, mode: str, batch_size: int) -> Iterator[dict]:
        gen = self.train_generator() if mode == "train" \
            else self.test_generator()
        batch = []
        for item in gen:
            batch.append(item)
            if len(batch) == batch_size:
                yield self._stack(batch)
                batch = []
        if batch:
            yield self._stack(batch)

    @staticmethod
    def _stack(items) -> dict:
        adj = np.stack([a for a, _, _ in items])
        coords = np.stack([c for _, c, _ in items])
        labels = np.stack([l for _, _, l in items])
        return {"adj_matrix": adj, "coords": coords, "labels": labels}


class AsymmetricTSP(EuclideanTSP):
    """Random asymmetric distance matrices with exact small-n labels
    (reference data/asymmetric_tsp_gen.py:32-40)."""

    def _one(self, rng: np.random.Generator, seed: int):
        n = int(rng.integers(self.min_node_count, self.max_node_count + 1))
        dist = rng.random((n, n)).astype(np.float32)
        np.fill_diagonal(dist, 0.0)
        tour = optimal_tour(dist, seed)
        p = self.padded_size
        adj = np.full((p, p), PADDING_VALUE, dtype=np.float32)
        adj[:n, :n] = dist
        label = np.zeros((p, p), dtype=np.float32)
        for i in range(n):
            label[tour[i], tour[(i + 1) % n]] = 1.0
        label[n:, :] = PADDING_VALUE
        label[:, n:] = PADDING_VALUE
        cpad = np.full((p, 2), PADDING_VALUE, dtype=np.float32)
        return adj, cpad, label
