"""SAT solver layer: native CDCL / WalkSAT / enumeration behind ctypes.

Replaces the reference's solver-wrapper layer (`satsolvers/SatSolver.py:4-44`
and the per-binary wrappers) with one in-process native library. The public
`SatSolver` contract is kept: `one_sample(dimacs) -> (is_sat, [+/-int])` and
`multiple_samples(dimacs, n) -> (is_sat, [[+/-int], ...])`.

The uniform sampler (reference `satsolvers/Unigen.py`) is implemented by
exact model enumeration + uniform choice when the model count fits a budget,
and XOR-hash near-uniform cell sampling (sat/xor_hash.py) otherwise.
"""

from __future__ import annotations

import ctypes
import os
from typing import Sequence

import numpy as np

from diffusionsat_tpu.sat.cnf import CNF
from diffusionsat_tpu.sat.native.build import build as _build_native


class _NativeLib:
    _lib = None

    @classmethod
    def get(cls) -> ctypes.CDLL:
        if cls._lib is None:
            lib_path = _build_native()
            lib = ctypes.CDLL(str(lib_path))
            lib.dsat_solve.restype = ctypes.c_int
            lib.dsat_solve.argtypes = [
                ctypes.c_int, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int8), ctypes.c_uint64, ctypes.c_int,
                ctypes.c_longlong,
            ]
            lib.dsat_solve_seeded.restype = ctypes.c_int
            lib.dsat_solve_seeded.argtypes = [
                ctypes.c_int, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int8), ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_float),
                ctypes.c_longlong, ctypes.POINTER(ctypes.c_longlong),
            ]
            lib.dsat_enumerate.restype = ctypes.c_longlong
            lib.dsat_enumerate.argtypes = [
                ctypes.c_int, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int8), ctypes.c_longlong,
                ctypes.c_uint64, ctypes.POINTER(ctypes.c_int),
            ]
            lib.dsat_walksat.restype = ctypes.c_int
            lib.dsat_walksat.argtypes = [
                ctypes.c_int, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int8), ctypes.c_uint64,
                ctypes.c_longlong, ctypes.c_double, ctypes.c_int,
            ]
            cls._lib = lib
        return cls._lib


def _flatten_clauses(clauses: Sequence[Sequence[int]]) -> np.ndarray:
    flat: list[int] = []
    for c in clauses:
        flat.extend(int(x) for x in c)
        flat.append(0)
    return np.asarray(flat, dtype=np.int32)


def _as_ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def solve(clauses: Sequence[Sequence[int]], n_vars: int | None = None,
          seed: int = 0, rand_polarity: bool = False,
          conflict_budget: int = -1) -> tuple[bool, list[int]]:
    """CDCL-solve a clause list. Returns (is_sat, model as signed int list)."""
    if n_vars is None:
        n_vars = max((abs(l) for c in clauses for l in c), default=0)
    flat = _flatten_clauses(clauses)
    model = np.zeros(n_vars, dtype=np.int8)
    lib = _NativeLib.get()
    r = lib.dsat_solve(n_vars, _as_ptr(flat, ctypes.c_int32), len(flat),
                       _as_ptr(model, ctypes.c_int8), seed,
                       1 if rand_polarity else 0, conflict_budget)
    if r == 1:
        return True, [(i + 1) if model[i] else -(i + 1) for i in range(n_vars)]
    if r == 0:
        return False, []
    raise TimeoutError("CDCL conflict budget exhausted")


def solve_seeded(clauses: Sequence[Sequence[int]], n_vars: int | None = None,
                 seed: int = 0, polarity: np.ndarray | None = None,
                 activity: np.ndarray | None = None,
                 conflict_budget: int = -1
                 ) -> tuple[bool, list[int], int]:
    """CDCL with model-seeded search (`dsat_solve_seeded`).

    `polarity`: per-var int8, -1 = solver default, 0/1 = try that value
    first (phase init = the neural prediction). `activity`: per-var f32
    initial VSIDS priors (confidence-ordered decisions). Returns
    (is_sat, signed model, conflicts) — conflicts is the search-effort
    metric the input-prior study compares. Raises TimeoutError on budget
    exhaustion (conflict count still meaningful via the exception arg).
    """
    if n_vars is None:
        n_vars = max((abs(l) for c in clauses for l in c), default=0)
    flat = _flatten_clauses(clauses)
    model = np.zeros(n_vars, dtype=np.int8)
    pol_ptr = None
    if polarity is not None:
        polarity = np.ascontiguousarray(polarity, dtype=np.int8)
        assert polarity.shape == (n_vars,)
        pol_ptr = _as_ptr(polarity, ctypes.c_int8)
    act_ptr = None
    if activity is not None:
        activity = np.ascontiguousarray(activity, dtype=np.float32)
        assert activity.shape == (n_vars,)
        act_ptr = _as_ptr(activity, ctypes.c_float)
    conflicts = ctypes.c_longlong(0)
    lib = _NativeLib.get()
    r = lib.dsat_solve_seeded(
        n_vars, _as_ptr(flat, ctypes.c_int32), len(flat),
        _as_ptr(model, ctypes.c_int8), seed, pol_ptr, act_ptr,
        conflict_budget, ctypes.byref(conflicts))
    if r == 1:
        return (True,
                [(i + 1) if model[i] else -(i + 1) for i in range(n_vars)],
                int(conflicts.value))
    if r == 0:
        return False, [], int(conflicts.value)
    raise TimeoutError(
        f"CDCL conflict budget exhausted ({int(conflicts.value)} conflicts)")


def enumerate_models(clauses: Sequence[Sequence[int]], n_vars: int | None = None,
                     max_models: int = 1 << 20, seed: int = 0,
                     ) -> tuple[np.ndarray, bool]:
    """Enumerate models. Returns (models [k, n_vars] uint8, complete)."""
    if n_vars is None:
        n_vars = max((abs(l) for c in clauses for l in c), default=0)
    flat = _flatten_clauses(clauses)
    models = np.zeros((max_models, max(n_vars, 1)), dtype=np.int8)
    complete = ctypes.c_int(0)
    lib = _NativeLib.get()
    found = lib.dsat_enumerate(n_vars, _as_ptr(flat, ctypes.c_int32), len(flat),
                               _as_ptr(models, ctypes.c_int8), max_models,
                               seed, ctypes.byref(complete))
    return models[:found, :n_vars].astype(np.uint8), bool(complete.value)


def count_models(clauses: Sequence[Sequence[int]], n_vars: int | None = None,
                 max_models: int = 1 << 20) -> tuple[int, bool]:
    """Count models up to max_models. Returns (count, exact)."""
    models, complete = enumerate_models(clauses, n_vars, max_models)
    return len(models), complete


def walksat(clauses: Sequence[Sequence[int]], n_vars: int | None = None,
            seed: int = 0, max_flips: int = 500_000, noise: float = 0.5,
            init: np.ndarray | None = None) -> tuple[bool, list[int]]:
    """WalkSAT local search (reference `utils/sat.py:127-162` analog)."""
    if n_vars is None:
        n_vars = max((abs(l) for c in clauses for l in c), default=0)
    flat = _flatten_clauses(clauses)
    model = np.zeros(n_vars, dtype=np.int8)
    init_from_model = 0
    if init is not None:
        model[:] = np.asarray(init, dtype=np.int8)
        init_from_model = 1
    lib = _NativeLib.get()
    r = lib.dsat_walksat(n_vars, _as_ptr(flat, ctypes.c_int32), len(flat),
                         _as_ptr(model, ctypes.c_int8), seed, max_flips,
                         noise, init_from_model)
    if r == 1:
        return True, [(i + 1) if model[i] else -(i + 1) for i in range(n_vars)]
    return False, []


class SatSolver:
    """Solver contract matching reference `satsolvers/SatSolver.py:4-44`."""

    def one_sample(self, dimacs: str) -> tuple[bool, list[int]]:
        is_sat, samples = self.multiple_samples(dimacs, n_samples=1)
        return is_sat, samples[0] if samples else []

    def multiple_samples(self, dimacs: str, n_samples: int
                         ) -> tuple[bool, list[list[int]]]:
        is_sat, sample = self.one_sample(dimacs)
        return is_sat, [sample] * n_samples if is_sat else []


class NativeCDCL(SatSolver):
    """In-process CDCL (the reference's Glucose/Default slot)."""

    def __init__(self, rand_polarity: bool = False, seed: int = 0):
        self.rand_polarity = rand_polarity
        self._seed = seed

    def one_sample(self, dimacs: str) -> tuple[bool, list[int]]:
        cnf = CNF.from_string(dimacs)
        self._seed += 1
        return solve(cnf.clauses(), cnf.number_of_vars(),
                     seed=self._seed, rand_polarity=self.rand_polarity)


class NativeWalkSAT(SatSolver):
    """In-process WalkSAT (the reference's walksat binary slot)."""

    def __init__(self, max_flips: int = 500_000, noise: float = 0.5, seed: int = 0):
        self.max_flips = max_flips
        self.noise = noise
        self._seed = seed

    def one_sample(self, dimacs: str) -> tuple[bool, list[int]]:
        cnf = CNF.from_string(dimacs)
        self._seed += 1
        return walksat(cnf.clauses(), cnf.number_of_vars(), seed=self._seed,
                       max_flips=self.max_flips, noise=self.noise)


class UniformSampler(SatSolver):
    """Uniform solution sampler (the reference's Unigen slot,
    `satsolvers/Unigen.py:17-43`).

    Exact: enumerate all models (budgeted) and sample uniformly. If the
    model count exceeds the enumeration budget, XOR-hash the solution
    space into cells and sample near-uniformly within a random cell
    (sat/xor_hash.HashUniformSampler — the reference's actual Unigen
    algorithm family); random-polarity CDCL remains only as a last-resort
    fallback when hashing fails to isolate a cell.
    """

    def __init__(self, max_enumerate: int = 200_000, seed: int = 0):
        self.max_enumerate = max_enumerate
        self.seed = seed
        # formula-static enumeration cache: repeated samples() calls on
        # the same DIMACS (the uniformity benchmark pattern) enumerate once
        self._enum_cache: dict[str, tuple[np.ndarray, bool]] = {}
        self._rng = np.random.default_rng(seed)

    def multiple_samples(self, dimacs: str, n_samples: int
                         ) -> tuple[bool, list[list[int]]]:
        cnf = CNF.from_string(dimacs)
        clauses, n_vars = cnf.clauses(), cnf.number_of_vars()
        key = dimacs  # the string itself: hash() can collide
        if key in self._enum_cache:
            models, complete = self._enum_cache[key]
        else:
            models, complete = enumerate_models(
                clauses, n_vars, max_models=self.max_enumerate,
                seed=self.seed)
            if len(self._enum_cache) < 64:
                self._enum_cache[key] = (models, complete)
        if len(models) == 0:
            return False, []
        rng = self._rng  # persistent: successive calls draw fresh samples
        if complete:
            rows = rng.integers(0, len(models), size=n_samples)
            picked = models[rows]
        else:  # too many models to enumerate: XOR-hash near-uniform cells
            from diffusionsat_tpu.sat.xor_hash import HashUniformSampler
            # fresh hash seed per call: successive calls must draw fresh
            # cells, not replay one deterministic sample set
            call_seed = int(self._rng.integers(1 << 31))
            picked = HashUniformSampler(seed=call_seed).sample_bits(
                clauses, n_vars, n_samples)
            if picked is None:  # hashing degenerate: rand-polarity CDCL
                picked = []
                for k in range(n_samples):
                    ok, m = solve(clauses, n_vars, seed=self.seed + 1 + k,
                                  rand_polarity=True)
                    assert ok
                    picked.append([1 if l > 0 else 0 for l in m])
                picked = np.asarray(picked, dtype=np.uint8)
        out = [[(i + 1) if row[i] else -(i + 1) for i in range(n_vars)]
               for row in picked]
        return True, out


def default_solver() -> SatSolver:
    return NativeCDCL()
