"""TSP stack tests: subtour finder, losses, data, decoders, model smoke."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusionsat_tpu.tsp import PADDING_VALUE
from diffusionsat_tpu.tsp.data import (
    AsymmetricTSP,
    EuclideanTSP,
    held_karp,
    tour_length,
    two_opt_tour,
)
from diffusionsat_tpu.tsp.loss import tsp_loss, tsp_supervised_loss
from diffusionsat_tpu.tsp.metrics import TSPMetrics, beam_decode, greedy_decode
from diffusionsat_tpu.tsp.model import (
    TSPMatrixSEConfig,
    tsp_matrix_se_apply,
    tsp_matrix_se_init,
)
from diffusionsat_tpu.tsp.subtours import find_subtours


def test_held_karp_exact_on_square():
    # unit square: optimal tour is the perimeter, length 4
    coords = np.array([[0, 0], [0, 1], [1, 1], [1, 0]], dtype=np.float32)
    dist = np.sqrt(((coords[:, None] - coords[None]) ** 2).sum(-1))
    tour = held_karp(dist)
    assert tour_length(dist, tour) == pytest.approx(4.0)
    tour2 = two_opt_tour(dist)
    assert tour_length(dist, tour2) == pytest.approx(4.0)


def test_subtour_finder_flags_two_cycles():
    # predictions forming two 2-cycles among 4 nodes -> violated cuts exist
    p = np.zeros((1, 4, 4), dtype=np.float32)
    p[0, 0, 1] = p[0, 1, 0] = 0.95
    p[0, 2, 3] = p[0, 3, 2] = 0.95
    adj = np.ones((1, 4, 4), dtype=np.float32)
    pairs = find_subtours(p, adj, symmetric=True)
    assert len(pairs) > 0
    # all cut edges cross between {0,1} and {2,3}
    for _, flat in pairs:
        i, j = divmod(int(flat) % 16, 4)
        assert (i < 2) != (j < 2)


def test_subtour_finder_accepts_full_tour():
    p = np.zeros((1, 4, 4), dtype=np.float32)
    for a, b in [(0, 1), (1, 2), (2, 3), (3, 0)]:
        p[0, a, b] = p[0, b, a] = 0.9
    adj = np.ones((1, 4, 4), dtype=np.float32)
    pairs = find_subtours(p, adj, symmetric=True)
    assert len(pairs) == 0


def test_data_generators():
    gen = EuclideanTSP(min_node_count=6, max_node_count=8, padded_size=8,
                       train_size=3, test_size=1)
    batches = list(gen.batches("train", batch_size=3))
    assert len(batches) == 1
    b = batches[0]
    assert b["adj_matrix"].shape == (3, 8, 8)
    assert b["labels"].shape == (3, 8, 8)

    agen = AsymmetricTSP(min_node_count=5, max_node_count=5, padded_size=8,
                         train_size=2, test_size=1)
    ab = next(agen.batches("train", 2))
    assert ab["adj_matrix"].shape == (2, 8, 8)


def test_decoders_recover_obvious_tour():
    coords = np.array([[0, 0], [0, 1], [1, 1], [1, 0]], dtype=np.float32)
    dist = np.sqrt(((coords[:, None] - coords[None]) ** 2).sum(-1))
    probs = np.zeros((4, 4), dtype=np.float32)
    for a, b in [(0, 1), (1, 2), (2, 3), (3, 0)]:
        probs[a, b] = 0.9
    tour_g = greedy_decode(probs, 4)
    tour_b = beam_decode(probs, 4, beam_width=8)
    assert tour_length(dist, tour_g) == pytest.approx(4.0)
    assert tour_length(dist, tour_b) == pytest.approx(4.0)


def test_supervised_loss_and_model_smoke():
    gen = EuclideanTSP(min_node_count=8, max_node_count=8, padded_size=8,
                       train_size=2, test_size=1)
    batch = next(gen.batches("train", 2))
    adj = jnp.asarray(batch["adj_matrix"])
    labels = jnp.asarray(batch["labels"])

    cfg = TSPMatrixSEConfig(feature_maps=8, rounds=2, supervised=True)
    params = tsp_matrix_se_init(jax.random.key(0), cfg)

    def loss_fn(p):
        _, total, _ = tsp_matrix_se_apply(p, cfg, adj, labels,
                                          jax.random.key(1), training=True)
        return total

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)


def test_unsupervised_loss_with_subtour_callback():
    gen = EuclideanTSP(min_node_count=6, max_node_count=6, padded_size=8,
                       train_size=2, test_size=1)
    batch = next(gen.batches("train", 2))
    adj = jnp.asarray(batch["adj_matrix"])
    logits = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 8, 8)).astype(np.float32))
    loss = tsp_loss(logits, adj, unsupervised=True, supervised=False)
    assert np.isfinite(float(loss))


def test_matrix_se_core():
    from diffusionsat_tpu.tsp.layers import matrix_se_apply, matrix_se_init
    params = matrix_se_init(jax.random.key(0), num_units=4, block_count=1)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 8, 8, 4)).astype(np.float32))
    out = matrix_se_apply(params, x)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_tsp_metrics_gap():
    gen = EuclideanTSP(min_node_count=6, max_node_count=6, padded_size=8,
                       train_size=2, test_size=1)
    batch = next(gen.batches("train", 2))
    # perfect predictions: logits = +10 on label edges
    preds = np.where(batch["labels"] == 1.0, 10.0, -10.0).astype(np.float32)
    m = TSPMetrics(use_beam=False)
    m.update_state({"prediction": preds}, batch)
    vals = m.get_values()
    assert vals["optimality_gap"] == pytest.approx(0.0, abs=1e-6)
