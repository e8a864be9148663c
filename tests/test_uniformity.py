"""Uniformity benchmark layer tests: samplers, chi-square, store."""

import numpy as np

from diffusionsat_tpu.sat.all_solutions import AllSolutions
from diffusionsat_tpu.sat.cnf import CNF
from diffusionsat_tpu.uniformity.benchmarks_file import BenchmarksFile
from diffusionsat_tpu.uniformity.samplers import (
    ExactUniformSampler,
    WalkSatSampler,
)
from diffusionsat_tpu.utils.chi_square import chi_square_likelihood


def formula():
    # [[1,2,3],[-1,-2,-3],[4,5]]: the reference's test_AllSolutions formula
    return CNF(n_vars=5, clauses=[[1, 2, 3], [-1, -2, -3], [4, 5]])


def test_all_solutions_count():
    cnf = formula()
    als = AllSolutions(cnf.number_of_vars(), cnf.clauses())
    assert als.is_exact
    # 6 assignments of (1,2,3) (not all-equal) x 3 of (4,5) = 18
    assert als.count() == 18


def test_exact_uniform_sampler_is_uniform():
    cnf = formula()
    counts = ExactUniformSampler(cnf, seed=0).samples(1800)
    assert sum(counts.values()) == 1800
    assert len(counts) == 18
    # chi-square against the ideal uniform expectation should not reject
    ideal = {k: 100.0 for k in counts}
    p = chi_square_likelihood(counts, ideal)
    assert p > 0.01


def test_walksat_sampler_yields_valid_solutions():
    cnf = formula()
    counts = WalkSatSampler(cnf, seed=1).samples(50)
    assert sum(counts.values()) == 50
    from diffusionsat_tpu.sat.cnf import VariableAssignment
    for k in counts:
        a = VariableAssignment(5, cnf.clauses())
        a.assign_all_from_int(k)
        assert a.satisfiable()


def test_benchmarks_file_roundtrip(tmp_path):
    store = BenchmarksFile(tmp_path / "b.jsonl")
    clauses = [[1, 2], [-1, 2]]
    store.write(clauses, {"foo": 1})
    store.write([[3]], {"foo": 2})
    assert len(store.read_all()) == 2
    found = store.find(clauses)
    assert len(found) == 1 and found[0]["foo"] == 1


def test_benchmark_count_stats_uses_collected_total():
    """chi2 expectations must come from samples actually collected, not
    the requested count — early-stopping samplers are not penalized."""
    import numpy as np

    from uniformity_benchmark import count_stats
    from diffusionsat_tpu.sat.cnf import CNF, VariableAssignment

    cnf = CNF(n_vars=2, clauses=[[1, 2]])
    models = np.array([[0, 1], [1, 0], [1, 1]], dtype=np.uint8)
    # perfectly uniform counts over the 3 solutions, but only 30 of the
    # requested 300 samples were collected
    counts = {}
    for row in models:
        a = VariableAssignment(2, cnf.clauses())
        a.assign_all_from_bit_list(row.tolist())
        counts[int(a)] = 10
    stats = count_stats(counts, models, cnf, n_samples=300)
    assert stats["n_collected"] == 30
    assert stats["diversity"] == 1.0
    assert stats["chi2_p"] > 0.9, stats  # uniform -> high p, no penalty


def test_metropolis_refiner_uniformizes_degenerate_seeds():
    """MH refinement from a single-solution seed distribution must spread
    to near-uniform over the (connected) solution set."""
    from diffusionsat_tpu.sat.cnf import VariableAssignment
    from diffusionsat_tpu.sat.solvers import enumerate_models
    from diffusionsat_tpu.uniformity.samplers import MetropolisRefiner

    cnf = formula()
    models, complete = enumerate_models(cnf.clauses(),
                                        cnf.number_of_vars(), 1000)
    assert complete and len(models) == 18

    class OneSolutionSampler:
        def samples(self, n):
            a = VariableAssignment(5, cnf.clauses())
            a.assign_all_from_bit_list([int(b) for b in models[0]])
            return {int(a): n}

    ref = MetropolisRefiner(cnf, OneSolutionSampler(), seed=0)
    counts = ref.refine(OneSolutionSampler().samples(1800))
    assert sum(counts.values()) == 1800
    # all outputs satisfy
    for k in counts:
        a = VariableAssignment(5, cnf.clauses())
        a.assign_all_from_int(k)
        assert a.satisfiable()
    # full support + chi2-consistent with uniform
    assert len(counts) == 18
    ideal = {}
    for row in models:
        a = VariableAssignment(5, cnf.clauses())
        a.assign_all_from_bit_list([int(b) for b in row])
        ideal[int(a)] = 1800 / 18
    assert chi_square_likelihood(counts, ideal) > 1e-3


def test_metropolis_refiner_stays_in_component():
    """Disconnected solution set: the chain must not leak mass across
    components (x1 XOR-ish formula with two isolated solutions)."""
    from diffusionsat_tpu.sat.cnf import VariableAssignment
    from diffusionsat_tpu.uniformity.samplers import MetropolisRefiner

    # solutions: 00 and 11 only -> Hamming distance 2, no single-flip path
    cnf2 = CNF(n_vars=2, clauses=[[1, -2], [-1, 2]])

    class Seed00:
        def samples(self, n):
            a = VariableAssignment(2, cnf2.clauses())
            a.assign_all_from_bit_list([0, 0])
            return {int(a): n}

    ref = MetropolisRefiner(cnf2, Seed00(), seed=0)
    counts = ref.samples(100)
    assert counts == {0: 100}


def test_xor_jump_refiner_crosses_components():
    """The XOR-cell jump kernel must equalize mass across disconnected
    solution components — exactly what the 1-flip chain above cannot do
    (the residual bias identified in MH_CHAIN_STUDY.json)."""
    from diffusionsat_tpu.sat.cnf import VariableAssignment
    from diffusionsat_tpu.uniformity.samplers import XorCellJumpRefiner

    # solutions: 00 and 11 only (Hamming distance 2 — disconnected)
    cnf2 = CNF(n_vars=2, clauses=[[1, -2], [-1, 2]])

    class Seed00:
        def samples(self, n):
            a = VariableAssignment(2, cnf2.clauses())
            a.assign_all_from_bit_list([0, 0])
            return {int(a): n}

    ref = XorCellJumpRefiner(cnf2, Seed00(), n_jumps=6, seed=0)
    counts = ref.samples(400)
    assert sum(counts.values()) == 400
    assert set(counts) == {0, 3}, counts  # both components reached
    # uniform stationary: ~200/200 (binomial(400, 1/2) 5-sigma ≈ 50)
    assert abs(counts[0] - 200) < 50, counts


def test_xor_jump_refiner_uniform_over_multi_component_set():
    """Biased multi-component seeding is driven to chi2-uniform over the
    full solution set, and every output still satisfies."""
    from diffusionsat_tpu.sat.cnf import VariableAssignment
    from diffusionsat_tpu.sat.solvers import enumerate_models
    from diffusionsat_tpu.uniformity.samplers import XorCellJumpRefiner

    # (x1=x2) and (x3=x4): 4 solutions pairwise >= 2 flips apart — the
    # solution graph is 4 isolated vertices
    cnf = CNF(n_vars=4, clauses=[[1, -2], [-1, 2], [3, -4], [-3, 4]])
    models, complete = enumerate_models(cnf.clauses(), 4, 100)
    assert complete and len(models) == 4

    class BiasedSeeds:
        def samples(self, n):
            # 90% on solution 0000, 10% on 1111
            a0 = VariableAssignment(4, cnf.clauses())
            a0.assign_all_from_bit_list([0, 0, 0, 0])
            a1 = VariableAssignment(4, cnf.clauses())
            a1.assign_all_from_bit_list([1, 1, 1, 1])
            return {int(a0): (9 * n) // 10, int(a1): n - (9 * n) // 10}

    ref = XorCellJumpRefiner(cnf, BiasedSeeds(), n_jumps=8, seed=1)
    counts = ref.samples(800)
    assert sum(counts.values()) == 800
    for k in counts:
        a = VariableAssignment(4, cnf.clauses())
        a.assign_all_from_int(k)
        assert a.satisfiable()
    assert len(counts) == 4, counts  # full support incl. unseeded comps
    ideal = {}
    for row in models:
        a = VariableAssignment(4, cnf.clauses())
        a.assign_all_from_bit_list([int(b) for b in row])
        ideal[int(a)] = 800 / 4
    assert chi_square_likelihood(counts, ideal) > 1e-3, counts
