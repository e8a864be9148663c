"""Closed-loop per-solution label reweighting (uniformity/reweight.py):
measured-frequency logits, duplicate-row grouping, table attachment, and
the end-to-end selection distribution under composed logits."""

import numpy as np
import pytest

import jax

from diffusionsat_tpu.graph.batch import BucketSpec, build_batch
from diffusionsat_tpu.sat.cnf import check_assignment
from diffusionsat_tpu.train.loop import _select_labels
from diffusionsat_tpu.uniformity.reweight import (
    attach_logit_table,
    batch_fingerprint,
    compose_label_logits,
    finalize_counts,
    neglog_freq_logits,
    row_groups,
)

BUCKET = BucketSpec(max_vars=32, max_clauses=64, max_edges=256, max_graphs=4)
F1 = (4, [[1, 2], [-1, 3], [2, 4]])
F2 = (3, [[1, -2], [2, 3]])


def _solutions(formula):
    n, clauses = formula
    return [[(b >> i) & 1 for i in range(n)] for b in range(2 ** n)
            if check_assignment(clauses, [(b >> i) & 1 for i in range(n)])]


def _ml_batch(K=4):
    s1, s2 = _solutions(F1), _solutions(F2)
    banks = [[s1[i % len(s1)] for i in range(K)],
             [s2[i % len(s2)] for i in range(K)]]
    return build_batch([F1, F2], BUCKET, solutions=banks)


def test_row_groups_duplicates_share_ids():
    rows = np.array([[0, 1], [1, 0], [0, 1], [1, 1]])
    g = row_groups(rows)
    assert g[0] == g[2]
    assert len({g[0], g[1], g[3]}) == 3


def test_neglog_logits_order_and_centering():
    # distinct solutions with counts 40 / 10 / 0; over-sampled rows must
    # get LOWER logits (fewer future label draws)
    counts = np.array([40.0, 10.0, 0.0])
    groups = np.array([0, 1, 2])
    lg = neglog_freq_logits(counts, groups, tau=0.5)
    assert lg[0] < lg[1] < lg[2]
    assert abs(lg.mean()) < 1e-6
    assert np.all(np.abs(lg) <= 2.5)


def test_neglog_logits_duplicates_consistent():
    # duplicate rows carry the duplicated solution's count and share the
    # same logit
    counts = np.array([30.0, 30.0, 6.0])
    groups = np.array([0, 0, 1])
    lg = neglog_freq_logits(counts, groups, tau=0.5)
    assert lg[0] == lg[1]
    assert lg[0] < lg[2]


def test_neglog_logits_no_matches_is_neutral():
    lg = neglog_freq_logits(np.zeros(4), np.array([0, 1, 2, 3]))
    np.testing.assert_array_equal(lg, np.zeros(4, np.float32))


def test_neglog_logits_single_solution_graph_is_neutral():
    # all rows one solution: logits identical -> centered to zero
    lg = neglog_freq_logits(np.full(4, 25.0), np.zeros(4, np.int32))
    np.testing.assert_allclose(lg, 0.0, atol=1e-6)


def test_finalize_counts_shape_and_bias_direction():
    batch = _ml_batch(K=4)
    K, ng = 4, 2
    counts = np.zeros((K, ng), np.int32)
    counts[:, 0] = [50, 2, 2, 2]    # row 0 of graph 0 over-sampled
    counts[:, 1] = [10, 10, 10, 10]
    neglog = finalize_counts(batch, counts)
    assert neglog.shape == (K, ng)
    sk = np.asarray(batch.solutions_k)
    vg = np.asarray(batch.var_graph)
    g0 = row_groups(sk[:, vg == 0])
    # row 0's group must have the lowest logit in graph 0
    others = [k for k in range(K) if g0[k] != g0[0]]
    assert all(neglog[0, 0] < neglog[k, 0] for k in others)


def test_compose_and_attach_table():
    batch = _ml_batch(K=4)
    K, G = 4, BUCKET.max_graphs
    neglog = np.random.default_rng(0).normal(size=(K, 2)).astype(np.float32)
    table = {"neglog_0": neglog,
             "fingerprint_0": np.str_(batch_fingerprint(batch))}
    batches = [batch]
    n = attach_logit_table(batches, table, iso_alpha=0.45, beta=1.0)
    assert n == 1
    lg = np.asarray(batches[0].label_isolation_k)
    assert lg.shape == (K, G)
    # composed = alpha*iso + beta*neglog on real graphs, untouched padding
    iso = np.asarray(
        compose_label_logits(batch, 0.45, 0.0, None).label_isolation_k)
    np.testing.assert_allclose(lg[:, :2], iso[:, :2] + neglog, rtol=1e-6)
    np.testing.assert_allclose(lg[:, 2:], 0.0)


def test_attach_table_fingerprint_mismatch_raises():
    batch = _ml_batch(K=4)
    table = {"neglog_0": np.zeros((4, 2), np.float32),
             "fingerprint_0": np.str_("deadbeefdeadbeef")}
    with pytest.raises(ValueError, match="fingerprint"):
        attach_logit_table([batch], table, 0.0, 1.0)


def test_attach_table_missing_batch_falls_back_to_iso():
    batch = _ml_batch(K=4)
    batches = [batch]
    n = attach_logit_table(batches, {}, iso_alpha=0.45, beta=1.0)
    assert n == 0
    iso = np.asarray(
        compose_label_logits(batch, 0.45, 0.0, None).label_isolation_k)
    np.testing.assert_allclose(
        np.asarray(batches[0].label_isolation_k), iso)


def test_selection_distribution_follows_composed_logits():
    """_select_labels with isolation_alpha=1.0 over the composed channel
    draws rows ~ softmax(logits): the over-sampled row must be picked
    substantially less often."""
    batch = _ml_batch(K=4)
    sk = np.asarray(batch.solutions_k)
    vg = np.asarray(batch.var_graph)
    g0 = row_groups(sk[:, vg == 0])
    # strong measured over-sampling of graph-0 row 0's solution
    counts = np.zeros((4, 2), np.int32)
    counts[:, 0] = np.where(g0 == g0[0], 200, 5)
    counts[:, 1] = 10
    neglog = finalize_counts(batch, counts)
    b = compose_label_logits(batch, 0.0, 1.0, neglog)

    draws = np.zeros(4)
    n_trials = 400
    nv0 = 4  # F1 vars
    for t in range(n_trials):
        labels = np.asarray(
            _select_labels(b, jax.random.key(t), isolation_alpha=1.0))
        row = labels[:nv0]
        hits = [k for k in range(4)
                if np.array_equal(row, sk[k, :nv0])]
        assert hits
        draws[hits[0]] += 1  # duplicates resolve to the first matching row
    freq_over = draws[[k for k in range(4) if g0[k] == g0[0]]].sum() / n_trials
    # softmax of the shrunk/clamped logits puts well under uniform mass on
    # the over-sampled solution (uniform over distinct solutions would be
    # 1/n_groups >= 1/4)
    assert freq_over < 0.15
