"""File-based instance sources: SPLOT feature models, SATLIB, primes, mixed.

Ports of reference `data/splot.py`, `data/satlib.py`, `data/PrimesGen.py`,
`data/mixed_sat.py`. The reference bundles its data files in-repo; here the
directories are user-supplied (same formats), and the loaders carry the
same splitting/filtering behavior.
"""

from __future__ import annotations

import random
import xml.etree.ElementTree as ET
from pathlib import Path
from typing import Iterator

from diffusionsat_tpu.data.generators import Instance, SatInstances
from diffusionsat_tpu.sat.cnf import CNF


class SplotInstances(SatInstances):
    """SPLOT 3-CNF feature-model XMLs (reference data/splot.py:13-97):
    every k-th file is test, the rest train."""

    def __init__(self, data_dir: str | Path, test_every_k: int = 5):
        self.data_dir = Path(data_dir)
        self.test_every_k = test_every_k

    def _files(self) -> list[Path]:
        return sorted(self.data_dir.glob("*.xml"))

    @staticmethod
    def _parse(path: Path) -> tuple[int, list[list[int]]]:
        """Parse <constraints> rules of the form 'id: lit or lit or lit'
        with literals '~'-negated (reference data/splot.py:66-84)."""
        root = ET.parse(path).getroot()
        clauses = []
        n_vars = 0
        for cons in root.iter("constraints"):
            text = cons.text or ""
            for line in text.strip().splitlines():
                line = line.strip()
                if not line or ":" not in line:
                    continue
                body = line.split(":", 1)[1]
                clause = []
                for tok in body.split(" or "):
                    tok = tok.strip()
                    if not tok:
                        continue
                    neg = tok.startswith("~")
                    name = tok[1:] if neg else tok
                    v = abs(int(name)) if name.lstrip("-").isdigit() else None
                    if v is None:
                        continue
                    clause.append(-v if neg else v)
                    n_vars = max(n_vars, v)
                if clause:
                    clauses.append(clause)
        return n_vars, clauses

    def _generator(self, test: bool) -> Iterator[Instance]:
        for i, f in enumerate(self._files()):
            is_test = (i % self.test_every_k == 0)
            if is_test != test:
                continue
            n_vars, clauses = self._parse(f)
            if clauses:
                yield n_vars, clauses, None

    def train_generator(self):
        return self._generator(test=False)

    def test_generator(self):
        return self._generator(test=True)


class SatLibInstances(SatInstances):
    """.cnf files from a directory (reference data/satlib.py:15-72)."""

    def __init__(self, data_dir: str | Path, test_fraction: float = 0.1,
                 seed: int = 0):
        self.data_dir = Path(data_dir)
        self.test_fraction = test_fraction
        self.seed = seed

    def _split(self) -> tuple[list[Path], list[Path]]:
        files = sorted(self.data_dir.glob("*.cnf"))
        rng = random.Random(self.seed)
        rng.shuffle(files)
        n_test = max(1, int(len(files) * self.test_fraction)) if files else 0
        return files[n_test:], files[:n_test]

    @staticmethod
    def _load(files) -> Iterator[Instance]:
        for f in files:
            cnf = CNF.load(f)
            if cnf.number_of_clauses():
                yield cnf.number_of_vars(), cnf.clauses(), None

    def train_generator(self):
        return self._load(self._split()[0])

    def test_generator(self):
        return self._load(self._split()[1])


class PrimesInstances(SatLibInstances):
    """Pre-generated factoring CNFs filtered by variable count (reference
    data/PrimesGen.py:14-103; files in toughsat DIMACS format)."""

    def __init__(self, data_dir: str | Path, max_vars: int = 1000, **kw):
        super().__init__(data_dir, **kw)
        self.max_vars = max_vars

    @staticmethod
    def _load(files) -> Iterator[Instance]:
        for f in files:
            cnf = CNF.load(f)
            if cnf.number_of_clauses():
                yield cnf.number_of_vars(), cnf.clauses(), None

    def train_generator(self):
        for n, c, s in super().train_generator():
            if n <= self.max_vars:
                yield n, c, s

    def test_generator(self):
        for n, c, s in super().test_generator():
            if n <= self.max_vars:
                yield n, c, s


class MixedInstances(SatInstances):
    """Random mixture over several generators (reference
    data/mixed_sat.py:9-33): round-robin draw from each source's stream."""

    def __init__(self, sources: list[SatInstances], seed: int = 0):
        self.sources = sources
        self.seed = seed

    def _mix(self, gens) -> Iterator[Instance]:
        rng = random.Random(self.seed)
        gens = [iter(g) for g in gens]
        while gens:
            g = rng.choice(gens)
            try:
                yield next(g)
            except StopIteration:
                gens.remove(g)

    def train_generator(self):
        return self._mix([s.train_generator() for s in self.sources])

    def test_generator(self):
        return self._mix([s.test_generator() for s in self.sources])
