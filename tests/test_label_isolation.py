"""Isolation-weighted multi-label selection (anti-basin-volume lever).

UNIFORMITY_ANALYSIS.md: the raw diffusion sampler over-samples central
solutions (frequency ~ exp(-0.19 * z(mean Hamming distance)), stable
across independently trained models). The counterweight trains on a
label distribution tilted toward isolated solutions:
softmax(alpha * isolation) selection over the bank
(train/loop._select_labels, QuerySATConfig.label_isolation_alpha).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusionsat_tpu.graph.batch import (
    BucketSpec,
    attach_label_isolation,
    build_batch,
)
from diffusionsat_tpu.graph.dense_batch import dense_from_flat
from diffusionsat_tpu.train.loop import _select_labels

BUCKET = BucketSpec(max_vars=16, max_clauses=16, max_edges=64, max_graphs=4)


def bank_batch():
    """One 4-var graph + one 3-var graph with a K=4 bank each."""
    formulas = [(4, [[1, 2], [-3, 4]]), (3, [[1, -2, 3]])]
    banks = [
        # graph 0: rows 0/1 identical (central), row 3 isolated
        [[0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 1, 1], [1, 1, 1, 0]],
        # graph 1
        [[1, 0, 1], [1, 0, 1], [1, 0, 0], [0, 1, 1]],
    ]
    return attach_label_isolation(build_batch(formulas, BUCKET,
                                              solutions=banks))


def manual_isolation(rows):
    rows = np.asarray(rows)
    K = rows.shape[0]
    d = (rows[:, None, :] != rows[None, :, :]).mean(-1)
    dbar = d.sum(1) / (K - 1)
    return (dbar - dbar.mean()) / dbar.std()


def test_attach_matches_manual_zscores():
    batch = bank_batch()
    iso = np.asarray(batch.label_isolation_k)
    assert iso.shape == (4, BUCKET.max_graphs)
    np.testing.assert_allclose(
        iso[:, 0], manual_isolation([[0, 0, 0, 0], [0, 0, 0, 0],
                                     [0, 0, 1, 1], [1, 1, 1, 0]]),
        rtol=1e-5)
    np.testing.assert_allclose(
        iso[:, 1], manual_isolation([[1, 0, 1], [1, 0, 1],
                                     [1, 0, 0], [0, 1, 1]]),
        rtol=1e-5)
    # padding graphs carry zeros; per-graph z-scores have zero mean
    assert np.all(iso[:, 2:] == 0)
    np.testing.assert_allclose(iso[:, :2].mean(0), 0, atol=1e-6)


def test_dense_conversion_carries_isolation():
    batch = bank_batch()
    dense = dense_from_flat(batch, G=4, Vg=8, Cg=8)
    np.testing.assert_allclose(np.asarray(dense.label_isolation_k)[:, :2],
                               np.asarray(batch.label_isolation_k)[:, :2],
                               rtol=1e-6)


def _selection_counts(batch, alpha, n=400):
    """Per-graph histogram over bank rows across n draws (flat layout)."""
    var_graph = np.asarray(batch.var_graph)
    sk = np.asarray(batch.solutions_k)
    counts = np.zeros((sk.shape[0], 2), int)
    for i in range(n):
        lab = np.asarray(_select_labels(batch, jax.random.key(i),
                                        isolation_alpha=alpha))
        for g in range(2):
            row_bits = lab[var_graph == g]
            for k in range(sk.shape[0]):
                if np.array_equal(row_bits, sk[k][var_graph == g]):
                    counts[k, g] += 1
                    break
    return counts


def test_weighted_selection_statistics():
    batch = bank_batch()
    iso = np.asarray(batch.label_isolation_k)

    # large alpha: the most isolated row dominates graph 0's draws.
    # NB rows 0/1 of graph 0 are identical bit-vectors, so histogram
    # identity credits row 0 for both — compare against row 3 directly.
    hot = _selection_counts(batch, alpha=25.0, n=120)
    assert hot[int(np.argmax(iso[:, 0])), 0] >= 110

    # alpha=0: uniform-ish (identical rows 0/1 pool into row 0's bin)
    cold = _selection_counts(batch, alpha=0.0, n=400)
    assert cold[0, 0] > cold[2, 0] > 0  # pooled bin ~2x singleton bins
    assert abs(cold[2, 0] - cold[3, 0]) < 80


def test_moderate_alpha_tilts_by_exp_alpha_iso():
    """Draw frequencies follow softmax(alpha * iso) (Gumbel-max)."""
    batch = bank_batch()
    iso = np.asarray(batch.label_isolation_k)[:, 1]
    counts = _selection_counts(batch, alpha=1.0, n=600)[:, 1].astype(float)
    # graph 1 rows 0/1 identical -> pooled; merge expected mass likewise
    p = np.exp(1.0 * iso)
    p /= p.sum()
    expected = np.array([p[0] + p[1], 0.0, p[2], p[3]]) * counts.sum()
    chi2 = ((counts[[0, 2, 3]] - expected[[0, 2, 3]]) ** 2
            / expected[[0, 2, 3]]).sum()
    assert chi2 < 15.0, (counts, expected)


def test_train_step_with_alpha_smoke():
    from diffusionsat_tpu.models.query_sat import (
        QuerySATConfig,
        query_sat_init,
    )
    from diffusionsat_tpu.train.adabelief import adabelief
    from diffusionsat_tpu.train.loop import TrainState, make_train_step

    batch = bank_batch()
    cfg = QuerySATConfig(feature_maps=16, query_maps=16, train_rounds=2,
                         test_rounds=2, msg_layers=1, update_layers=1,
                         label_isolation_alpha=0.3)
    opt = adabelief(learning_rate=1e-3)
    params = query_sat_init(jax.random.key(0), cfg)
    state = TrainState(params=params, opt_state=opt.init(params),
                       step=jnp.zeros((), jnp.int32),
                       key=jax.random.key(1))
    step = make_train_step(cfg, opt)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
