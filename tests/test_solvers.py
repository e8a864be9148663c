"""Solver-layer tests.

Modeled on the reference's `satsolvers/test_solvers.py:1-72` (smoke tests on
the 2-variable formula [[-1,2],[1,-2]]), extended with brute-force
cross-checks that the reference lacks.
"""

import random

import numpy as np
import pytest

from diffusionsat_tpu.sat.cnf import CNF, VariableAssignment, check_assignment
from diffusionsat_tpu.sat.solvers import (
    NativeCDCL,
    NativeWalkSAT,
    UniformSampler,
    count_models,
    enumerate_models,
    solve,
    walksat,
)

TWO_VAR = [[-1, 2], [1, -2]]
TWO_VAR_DIMACS = "p cnf 2 2\n-1 2 0\n1 -2 0\n"


def brute_force_models(clauses, n):
    return [
        [(i >> b) & 1 for b in range(n)]
        for i in range(2 ** n)
        if check_assignment(clauses, [(i >> b) & 1 for b in range(n)])
    ]


def test_cdcl_two_var():
    is_sat, model = NativeCDCL().one_sample(TWO_VAR_DIMACS)
    assert is_sat
    assert model in ([1, 2], [-1, -2])


def test_walksat_two_var():
    is_sat, model = NativeWalkSAT().one_sample(TWO_VAR_DIMACS)
    assert is_sat
    assert model in ([1, 2], [-1, -2])


def test_cdcl_unsat():
    is_sat, model = solve([[1], [-1]])
    assert not is_sat and model == []


def test_enumerate_two_var():
    models, complete = enumerate_models(TWO_VAR, 2)
    assert complete
    assert sorted(models.tolist()) == [[0, 0], [1, 1]]


def test_uniform_sampler_covers_all_models():
    sampler = UniformSampler(seed=3)
    is_sat, samples = sampler.multiple_samples(TWO_VAR_DIMACS, 50)
    assert is_sat
    keys = {tuple(s) for s in samples}
    assert keys == {(1, 2), (-1, -2)}


@pytest.mark.parametrize("seed", range(4))
def test_cdcl_vs_brute_force(seed):
    rng = random.Random(seed)
    for trial in range(40):
        n = rng.randint(3, 9)
        m = int(4.3 * n)
        cls = [
            [v if rng.random() < 0.5 else -v
             for v in rng.sample(range(1, n + 1), 3)]
            for _ in range(m)
        ]
        brute = brute_force_models(cls, n)
        got, model = solve(cls, n, seed=trial)
        assert got == (len(brute) > 0)
        if got:
            assert check_assignment(cls, [1 if l > 0 else 0 for l in model])
        count, exact = count_models(cls, n)
        assert exact and count == len(brute)


def test_walksat_finds_model():
    rng = random.Random(7)
    n = 20
    cls = [
        [v if rng.random() < 0.5 else -v
         for v in rng.sample(range(1, n + 1), 3)]
        for _ in range(int(3.5 * n))
    ]
    got, model = walksat(cls, n, seed=1, max_flips=200_000)
    if got:
        assert check_assignment(cls, [1 if l > 0 else 0 for l in model])


class TestCNF:
    def test_roundtrip(self, tmp_path):
        cnf = CNF(tmp_path / "f.cnf", clauses=[[1, -2], [2, 3]])
        cnf.store()
        loaded = CNF.load(tmp_path / "f.cnf")
        assert loaded.clauses() == [[1, -2], [2, 3]]
        assert loaded.number_of_vars() == 3

    def test_reduce_clauses(self):
        # reference utils/test_DimacsFile.py semantics: dedup + subsumption
        cnf = CNF(clauses=[[1, 2], [2, 1], [1, 2, 3], [4]])
        cnf.reduce_clauses()
        got = sorted(tuple(sorted(c)) for c in cnf.clauses())
        assert got == [(1, 2), (4,)]

    def test_from_string_parses_solution_line(self):
        cnf = CNF.from_string("v 1 -2 0\np cnf 2 1\n1 2 0\n")
        assert cnf.values == {1: True, 2: False}


class TestVariableAssignment:
    def test_int_encoding_roundtrip(self):
        a = VariableAssignment(3, [])
        a.assign_all_from_int_list([1, 2, 3])
        assert int(a) == 7
        a.assign_all_from_int(5)
        assert a.values().tolist() == [True, False, True]
        assert str(a) == "101"

    def test_satisfiable(self):
        a = VariableAssignment(2, TWO_VAR)
        a.assign_all([True, True])
        assert a.satisfiable()
        a.assign_all([True, False])
        assert not a.satisfiable()

    def test_empty_clause_unsat(self):
        a = VariableAssignment(2, [[]])
        assert not a.satisfiable()
