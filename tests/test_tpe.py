"""TPE sampler tests: correctness of the space handling and
sample-efficiency vs random search on synthetic objectives (the VERDICT
acceptance criterion for the adaptive-hyperopt slot)."""

import math

import numpy as np

from diffusionsat_tpu.train.tpe import (
    Choice,
    IntUniform,
    LogUniform,
    RandomSampler,
    TPESampler,
    Uniform,
)

SPACE = {
    "lr": LogUniform(1e-5, 1e-1),
    "beta": Uniform(0.0, 1.0),
    "layers": IntUniform(1, 6),
    "width": Choice([16, 32, 64, 128]),
}


def _objective(hp):
    # peaked at lr=1e-3, beta=0.7, layers=3, width=64
    v = -((math.log10(hp["lr"]) + 3.0) ** 2)
    v -= 4.0 * (hp["beta"] - 0.7) ** 2
    v -= 0.3 * (hp["layers"] - 3) ** 2
    v -= {16: 0.6, 32: 0.2, 64: 0.0, 128: 0.4}[hp["width"]]
    return v


def _run(sampler, n_trials):
    for _ in range(n_trials):
        hp = sampler.suggest()
        sampler.observe(hp, _objective(hp))
    return sampler.best[1]


def test_suggest_respects_space():
    s = TPESampler(SPACE, seed=0, n_startup=4)
    for i in range(40):
        hp = s.suggest()
        assert 1e-5 <= hp["lr"] <= 1e-1
        assert 0.0 <= hp["beta"] <= 1.0
        assert hp["layers"] in range(1, 7)
        assert hp["width"] in (16, 32, 64, 128)
        s.observe(hp, _objective(hp))


def test_tpe_beats_random_on_fixed_budget():
    n_trials = 40
    tpe_scores, rand_scores = [], []
    for seed in range(5):
        tpe_scores.append(_run(TPESampler(SPACE, seed=seed, n_startup=8),
                               n_trials))
        rand_scores.append(_run(RandomSampler(SPACE, seed=seed), n_trials))
    assert np.mean(tpe_scores) > np.mean(rand_scores), (
        tpe_scores, rand_scores)
    # and TPE should win on the clear majority of seeds
    wins = sum(t >= r for t, r in zip(tpe_scores, rand_scores))
    assert wins >= 3, (tpe_scores, rand_scores)


def test_tpe_concentrates_near_optimum():
    s = TPESampler(SPACE, seed=1, n_startup=8)
    _run(s, 60)
    late = [s.suggest() for _ in range(20)]
    lrs = np.array([math.log10(h["lr"]) for h in late])
    # after 60 observations the proposal mass should be near lr=1e-3
    assert abs(np.median(lrs) + 3.0) < 1.0, np.median(lrs)
