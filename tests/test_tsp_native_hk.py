"""Native exact Held-Karp TSP labels (solver.cpp dsat_tsp_held_karp):
parity with the Python DP, exactness vs 2-opt, asymmetric support
(VERDICT r3 item 10; reference data/tsp.py labels are Concorde-exact)."""

import numpy as np

from diffusionsat_tpu.tsp.data import (
    held_karp,
    native_held_karp,
    optimal_tour,
    tour_length,
    two_opt_tour,
)


def _euclid(rng, n):
    c = rng.random((n, 2))
    return np.sqrt(((c[:, None] - c[None]) ** 2).sum(-1)).astype(np.float32)


def test_native_hk_matches_python_dp():
    rng = np.random.default_rng(1)
    for n in (5, 9, 12):
        d = _euclid(rng, n)
        assert abs(tour_length(d, native_held_karp(d))
                   - tour_length(d, held_karp(d))) < 1e-4


def test_native_hk_asymmetric():
    rng = np.random.default_rng(2)
    for n in (6, 10):
        d = rng.random((n, n)).astype(np.float32)
        np.fill_diagonal(d, 0.0)
        assert abs(tour_length(d, native_held_karp(d))
                   - tour_length(d, held_karp(d))) < 1e-4


def test_native_hk_never_worse_than_two_opt_at_18():
    rng = np.random.default_rng(3)
    d = _euclid(rng, 18)
    t = native_held_karp(d)
    assert sorted(t) == list(range(18))
    assert tour_length(d, t) <= tour_length(d, two_opt_tour(d)) + 1e-4


def test_optimal_tour_dispatch():
    rng = np.random.default_rng(4)
    d = _euclid(rng, 16)
    t = optimal_tour(d)
    assert sorted(t) == list(range(16))


def test_branch_bound_matches_held_karp():
    from diffusionsat_tpu.tsp.data import native_branch_bound

    rng = np.random.default_rng(5)
    for n in (8, 13, 17, 22):   # 22 > the old HK label cutoff, <= HK's 24
        d = _euclid(rng, n)
        bb = native_branch_bound(d)
        assert sorted(bb) == list(range(n))
        assert abs(tour_length(d, bb)
                   - tour_length(d, native_held_karp(d))) < 1e-4


def test_optimal_tour_exact_past_20():
    from diffusionsat_tpu.tsp.data import EXACT_LABEL_MAX_N
    assert EXACT_LABEL_MAX_N >= 30
    rng = np.random.default_rng(6)
    d = _euclid(rng, 23)
    t = optimal_tour(d)
    assert sorted(t) == list(range(23))
    assert abs(tour_length(d, t)
               - tour_length(d, native_held_karp(d))) < 1e-4
