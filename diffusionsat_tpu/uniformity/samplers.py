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
