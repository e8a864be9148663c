"""Baseline samplers with the `.samples(n) -> {solution_int: count}` contract.

Analogs of the reference's UnigenSampler / QuickSampler
(`satuniformity/UnigenSampler.py:12-35`, `satuniformity/QuickSampler.py`):
ExactUniformSampler draws from the enumerated model set (the Unigen slot);
WalkSatSampler draws via randomized local search (the QuickSampler slot —
fast, biased, used as the non-uniform baseline).
"""

from __future__ import annotations

import numpy as np

from diffusionsat_tpu.sat.cnf import CNF, VariableAssignment
from diffusionsat_tpu.sat.solvers import UniformSampler, walksat


class ExactUniformSampler:
    def __init__(self, cnf: CNF, seed: int = 0, max_enumerate: int = 200_000):
        self.cnf = cnf
        self.seed = seed
        self.max_enumerate = max_enumerate
        # the model set is formula-static: enumerate once, reuse across
        # samples() calls (was re-enumerated per call)
        self._sampler = UniformSampler(max_enumerate=max_enumerate,
                                       seed=seed)
        self._dimacs = cnf.to_string()

    def samples(self, n_samples: int) -> dict[int, int]:
        is_sat, rows = self._sampler.multiple_samples(self._dimacs,
                                                      n_samples)
        counts: dict[int, int] = {}
        if not is_sat:
            return counts
        for lits in rows:
            asgn = VariableAssignment(self.cnf.number_of_vars(),
                                      self.cnf.clauses())
            asgn.assign_all_from_int_list(lits)
            k = int(asgn)
            counts[k] = counts.get(k, 0) + 1
        return counts


class MetropolisRefiner:
    """Uniformizing Metropolis refiner over the solution set.

    Wraps any base sampler with the `.samples(n) -> {solution_int: count}`
    contract: each collected solution seeds a Metropolis chain on the
    hypercube restricted to satisfying assignments — propose flipping one
    uniformly-random variable, accept iff the result still satisfies.
    The proposal is symmetric and the target uniform, so detailed balance
    gives a uniform stationary distribution over each connected component
    of the solution graph (rejection self-loops make it aperiodic).

    The refiner therefore removes within-component bias from the base
    sampler while preserving its across-component mass — the diffusion
    sampler supplies diverse component coverage (its job), MH supplies
    exact within-component uniformity (its job). No reference analog:
    the reference's Unigen slot gets uniformity from XOR hashing instead
    (`satuniformity/UnigenSampler.py:12-35`); this is the TPU-era hybrid
    (model proposes, exact chain corrects).
    """

    def __init__(self, cnf: CNF, base, n_steps: int | None = None,
                 seed: int = 0):
        self.cnf = cnf
        self.base = base
        n = cnf.number_of_vars()
        # ~20 sweeps of the n-dim solution subgraph mixes far past the
        # benchmark sizes (10-16 vars); override for bigger formulas
        self.n_steps = n_steps if n_steps is not None else 20 * n
        self.rng = np.random.default_rng(seed)
        # clause tensors for vectorized evaluation: var index + wanted sign
        k = max(len(c) for c in cnf.clauses())
        self._cl_var = np.zeros((len(cnf.clauses()), k), dtype=np.int64)
        self._cl_pos = np.zeros((len(cnf.clauses()), k), dtype=bool)
        self._cl_msk = np.zeros((len(cnf.clauses()), k), dtype=bool)
        for ci, cl in enumerate(cnf.clauses()):
            for j, lit in enumerate(cl):
                self._cl_var[ci, j] = abs(lit) - 1
                self._cl_pos[ci, j] = lit > 0
                self._cl_msk[ci, j] = True

    def _sat(self, x: np.ndarray) -> np.ndarray:
        """x [B, n] bool -> [B] all-clauses-satisfied."""
        lit_true = x[:, self._cl_var] == self._cl_pos   # [B, C, k]
        lit_true &= self._cl_msk
        return lit_true.any(axis=2).all(axis=1)

    def refine(self, counts: dict[int, int]) -> dict[int, int]:
        """Run the MH chain from every collected sample; recount."""
        n = self.cnf.number_of_vars()
        seeds = [key for key, c in counts.items() for _ in range(c)]
        if not seeds:
            return {}
        x = np.zeros((len(seeds), n), dtype=bool)
        for i, key in enumerate(seeds):
            for b in range(n):
                x[i, b] = (key >> b) & 1
        assert self._sat(x).all(), "refiner seeded with UNSAT assignment"
        B = len(seeds)
        flips = self.rng.integers(0, n, size=(self.n_steps, B))
        for t in range(self.n_steps):
            idx = flips[t]
            x[np.arange(B), idx] ^= True
            ok = self._sat(x)
            x[np.arange(B)[~ok], idx[~ok]] ^= True     # reject: revert
        out: dict[int, int] = {}
        weights = 1 << np.arange(n, dtype=object)
        for row in x:
            key = int(sum(w for w, b in zip(weights, row) if b))
            out[key] = out.get(key, 0) + 1
        return out

    def samples(self, n_samples: int) -> dict[int, int]:
        counts = self.base.samples(n_samples)
        refined = self.refine(counts)
        self.success_rate = getattr(self.base, "success_rate", None)
        return refined


class WalkSatSampler:
    def __init__(self, cnf: CNF, seed: int = 0, max_flips: int = 500_000):
        self.cnf = cnf
        self.seed = seed
        self.max_flips = max_flips

    def samples(self, n_samples: int) -> dict[int, int]:
        counts: dict[int, int] = {}
        n = self.cnf.number_of_vars()
        clauses = self.cnf.clauses()
        rng = np.random.default_rng(self.seed)
        got = 0
        attempts = 0
        while got < n_samples and attempts < n_samples * 20:
            attempts += 1
            init = rng.integers(0, 2, size=n).astype(np.int8)
            ok, model = walksat(clauses, n, seed=int(rng.integers(1 << 30)),
                                max_flips=self.max_flips, init=init)
            if not ok:
                continue
            asgn = VariableAssignment(n, clauses)
            asgn.assign_all_from_int_list(model)
            k = int(asgn)
            counts[k] = counts.get(k, 0) + 1
            got += 1
        return counts
