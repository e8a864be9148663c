"""CNF formula container and assignment helpers.

TPU-native replacement for the reference's `utils/DimacsFile.py:5` and
`utils/VariableAssignment.py:6`: same capabilities (DIMACS parse/store,
clause reduction with subsumption, assignment <-> integer encoding,
satisfiability check) re-implemented with numpy-friendly internals so the
hot checks (`satisfiable`, batch evaluation) are vectorized.
"""

from __future__ import annotations

import io
from pathlib import Path
from typing import Iterable, Sequence

import numpy as np


def _to_clause_list(clauses) -> list[list[int]]:
    """Accept lists, tuples, numpy arrays, or nested array-likes of ints."""
    out = []
    for c in clauses:
        out.append([int(x) for x in c])
    return out


def num_vars_of(clauses: Sequence[Sequence[int]]) -> int:
    m = 0
    for c in clauses:
        for lit in c:
            a = -lit if lit < 0 else lit
            if a > m:
                m = a
    return int(m)


class CNF:
    """A CNF formula in DIMACS conventions (1-based signed literals).

    Equivalent surface to the reference `DimacsFile` (utils/DimacsFile.py:5):
    load/store DIMACS, add clauses, reduce (dedup + subsumption), and carry
    an optional partial assignment parsed from solver `v` lines.
    """

    def __init__(self, filename: str | Path | None = None, n_vars: int = 0,
                 clauses: Iterable[Sequence[int]] = ()):
        self.filename = str(filename) if filename is not None else None
        self._clauses: list[list[int]] = _to_clause_list(clauses)
        self.n_vars = int(n_vars) if n_vars else num_vars_of(self._clauses)
        self.values: dict[int, bool] = {}
        self.comments: list[str] = []

    # -- construction -----------------------------------------------------
    @classmethod
    def from_string(cls, text: str) -> "CNF":
        cnf = cls()
        cnf.load_from_lines(text.splitlines())
        return cnf

    @classmethod
    def load(cls, filename: str | Path) -> "CNF":
        cnf = cls(filename=filename)
        with open(filename, "r") as f:
            cnf.load_from_lines(f.readlines())
        return cnf

    def load_from_lines(self, lines: Iterable[str]) -> None:
        self.n_vars = 0
        self._clauses = []
        for line in lines:
            line = line.strip()
            if not line:
                continue
            if line.startswith("p cnf"):
                parts = line.split()
                self.n_vars = int(parts[2])
                continue
            if line[0].isalpha():
                if line[0] == "v":  # solver assignment line
                    for s in line[1:].split():
                        i = int(s)
                        if i > 0:
                            self.values[i] = True
                        elif i < 0:
                            self.values[-i] = False
                elif line.startswith("c sol "):  # stored solution comment
                    self.comments.append(line[2:])
                continue
            if line.startswith("--"):
                continue
            clause = []
            for s in line.split():
                i = int(s)
                if i == 0:
                    break
                clause.append(i)
            if clause:
                self.add_clause(clause)

    # -- accessors --------------------------------------------------------
    def clauses(self) -> list[list[int]]:
        return self._clauses

    def number_of_vars(self) -> int:
        return self.n_vars

    def number_of_clauses(self) -> int:
        return len(self._clauses)

    def add_comment(self, comment: str) -> None:
        self.comments.append(comment)

    def add_clause(self, clause: Sequence[int]) -> None:
        clause = [int(x) for x in clause]
        for lit in clause:
            a = abs(lit)
            if a > self.n_vars:
                self.n_vars = a
        self._clauses.append(clause)

    def add_clauses(self, clauses: Iterable[Sequence[int]]) -> None:
        for c in clauses:
            self.add_clause(c)

    # -- transforms -------------------------------------------------------
    def reduce_clauses(self) -> None:
        """Dedup + drop subsumed clauses (reference utils/DimacsFile.py:110)."""
        uniq = sorted({tuple(sorted(c)) for c in self._clauses}, key=len)
        kept: list[tuple[int, ...]] = []
        kept_sets: list[frozenset[int]] = []
        for cand in uniq:
            cs = frozenset(cand)
            if any(k <= cs for k in kept_sets):
                continue  # subsumed by an earlier (shorter) clause
            kept.append(cand)
            kept_sets.append(cs)
        self._clauses = [list(c) for c in kept]

    # -- assignment handling ----------------------------------------------
    def set_value(self, i: int, value: bool) -> None:
        self.values[abs(i)] = bool(value)

    def get_value(self, i: int) -> bool:
        return self.values[abs(i)]

    def is_satisfiable(self) -> bool:
        """Check the stored full assignment against all clauses."""
        for i in range(1, self.n_vars + 1):
            if i not in self.values:
                raise ValueError(f"Variable {i} has no value")
        asgn = VariableAssignment(self.n_vars, self._clauses)
        asgn.assign_all([self.values[i] for i in range(1, self.n_vars + 1)])
        return asgn.satisfiable()

    # -- serialization ----------------------------------------------------
    def to_string(self, *extra_comments: str) -> str:
        buf = io.StringIO()
        for c in self.comments:
            buf.write(f"c {c}\n")
        for c in extra_comments:
            buf.write(f"c {c}\n")
        buf.write(f"p cnf {self.n_vars} {len(self._clauses)}\n")
        for clause in self._clauses:
            buf.write(" ".join(str(x) for x in clause) + " 0\n")
        return buf.getvalue()

    def store(self, *extra_comments: str) -> None:
        assert self.filename is not None
        with open(self.filename, "w") as f:
            f.write(self.to_string(*extra_comments))

    def __str__(self) -> str:
        return self.to_string()


class VariableAssignment:
    """Boolean assignment over a formula's variables with int encoding.

    Same semantics as the reference `utils/VariableAssignment.py:6`: bit i of
    the integer encoding is variable i+1 (right-to-left binary). The
    satisfiability check is vectorized over a flat literal array.
    """

    def __init__(self, n_vars: int = 0, clauses: Iterable[Sequence[int]] = ()):
        if not isinstance(n_vars, int):  # allow VariableAssignment(clauses)
            clauses = n_vars
            n_vars = 0
        self.clauses = _to_clause_list(clauses)
        if n_vars == 0:
            n_vars = num_vars_of(self.clauses)
        self.x = np.zeros(n_vars, dtype=bool)
        # flat literal/clause-id arrays for vectorized checks
        flat = [lit for c in self.clauses for lit in c]
        self._flat_lits = np.asarray(flat, dtype=np.int64)
        self._clause_ids = np.asarray(
            [i for i, c in enumerate(self.clauses) for _ in c], dtype=np.int64)

    # -- assignment -------------------------------------------------------
    def assign(self, i: int, value: bool) -> None:
        self.x[i] = value

    def assign_all(self, x: Sequence[bool]) -> None:
        self.x = np.asarray(x, dtype=bool)

    def assign_all_from_int_list(self, lits: Sequence[int]) -> None:
        for lit in lits:
            self.assign(abs(lit) - 1, lit > 0)

    def assign_all_from_bit_list(self, bits: Sequence[int]) -> None:
        self.x = np.asarray([int(b) == 1 for b in bits], dtype=bool)

    def assign_all_from_int(self, value: int) -> None:
        n = len(self.x)
        self.x = np.asarray([(value >> i) & 1 == 1 for i in range(n)], dtype=bool)

    # -- encoding ---------------------------------------------------------
    def __int__(self) -> int:
        res = 0
        for i, b in enumerate(self.x):
            if b:
                res |= 1 << i
        return res

    def __str__(self) -> str:
        return "".join("1" if b else "0" for b in self.x)

    def as_int_list(self) -> list[int]:
        return [(i + 1) if self.x[i] else -(i + 1) for i in range(len(self.x))]

    def value(self, i: int) -> bool:
        return bool(self.x[i])

    def values(self) -> np.ndarray:
        return self.x

    # -- evaluation -------------------------------------------------------
    def satisfiable(self) -> bool:
        if len(self.clauses) == 0:
            return True
        if self._flat_lits.size == 0:
            return False  # an empty clause present
        var_idx = np.abs(self._flat_lits) - 1
        lit_true = np.where(self._flat_lits > 0, self.x[var_idx], ~self.x[var_idx])
        n_clauses = len(self.clauses)
        clause_sat = np.zeros(n_clauses, dtype=bool)
        np.logical_or.at(clause_sat, self._clause_ids, lit_true)
        return bool(clause_sat.all())


def check_assignment(clauses: Sequence[Sequence[int]], bits: Sequence[int]) -> bool:
    """Convenience: does the 0/1 bit vector satisfy the clause list?"""
    asgn = VariableAssignment(len(bits), clauses)
    asgn.assign_all_from_bit_list(bits)
    return asgn.satisfiable()
