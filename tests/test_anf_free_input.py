"""Free-input mask in ANFBatch + supervised-CE upweighting.

The round-4 error-structure study (ANF_ERROR_STRUCTURE*.json) showed the
systems-solved bottleneck is free message-bit input accuracy (~76% vs
~93% overall); input-anchored CDCL completion (sat/anf_completion.py)
recovers every system whose inputs are predicted right. The training
lever is upweighting those vars in the supervised CE
(models/anf_sat.py, cfg.free_input_upweight); reference loss context:
/root/reference/model/anf_sat.py:214-228.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusionsat_tpu.data.anf import RandomAnfInstances
from diffusionsat_tpu.data.anf_datasets import AnfDataset
from diffusionsat_tpu.graph.anf_batch import ANFBucket, build_anf_batch
from diffusionsat_tpu.models.anf_sat import (
    ANFSATConfig,
    anf_sat_apply,
    anf_sat_init,
)
from diffusionsat_tpu.sat.anf_completion import (
    extract_graph_equations,
    free_inputs_of,
)

BUCKET = ANFBucket(max_vars=32, max_ands=32, max_clauses=32, max_edges=256,
                   max_graphs=4)


def sample_batch(n=3, seed=0):
    gen = RandomAnfInstances(min_vars=4, max_vars=8, train_size=n, seed=seed)
    items = list(gen.train_generator())
    systems = [(n_vars, eqs) for n_vars, eqs, _ in items]
    sols = [bits for _, _, bits in items]
    return build_anf_batch(systems, BUCKET, solutions=sols)


def test_free_input_mask_matches_completion_helper():
    """build_anf_batch's mask == free_inputs_of over the extracted
    per-graph equations (the definition input-anchored completion uses)."""
    batch = sample_batch(3, seed=7)
    mask = np.asarray(batch.free_input_mask)
    var_graph = np.asarray(batch.var_graph)
    eqs_per_graph = extract_graph_equations(batch)
    expected = np.zeros_like(mask)
    for g, eqs in eqs_per_graph.items():
        vids = np.where(var_graph == g)[0]
        for v in free_inputs_of(eqs, vids):
            expected[v] = 1.0
    np.testing.assert_array_equal(mask, expected)
    # padding rows are never marked free
    assert np.all(mask[np.asarray(batch.var_mask) == 0] == 0)
    # sanity: random systems leave at least one var undefined somewhere
    assert mask.sum() > 0


def test_free_input_upweight_affine_identity():
    """Weights scale only the CE readout, not the recurrent state, so
    loss(W) * sum(w(W)) must be affine in W. Checks the exact weighted
    normalization without reaching into the scanned round body."""
    batch = sample_batch(2, seed=3)
    params = anf_sat_init(jax.random.key(0),
                          ANFSATConfig(feature_maps=16, query_maps=16))

    def loss_at(w):
        cfg = ANFSATConfig(feature_maps=16, query_maps=16, train_rounds=3,
                           test_rounds=3, free_input_upweight=w)
        _, loss, _, _ = anf_sat_apply(params, cfg, batch, jax.random.key(1),
                                      training=True, labels=batch.solutions)
        return float(loss)

    var_mask = np.asarray(batch.var_mask)
    fim = np.asarray(batch.free_input_mask)

    def wsum(w):
        return float(np.sum(var_mask * (1.0 + (w - 1.0) * fim)))

    g = {w: loss_at(w) * wsum(w) for w in (1.0, 4.0, 7.0)}
    # affine: g(4) is the midpoint of g(1) and g(7)
    assert g[4.0] == pytest.approx((g[1.0] + g[7.0]) / 2, rel=1e-5)
    # and the weighting actually changes the loss
    assert loss_at(8.0) != pytest.approx(loss_at(1.0), rel=1e-6)


def test_upweight_noop_without_mask():
    """W != 1 with free_input_mask=None (old caches) falls back to the
    unweighted loss instead of crashing."""
    batch = sample_batch(2, seed=5)
    bare = batch.replace(free_input_mask=None)
    params = anf_sat_init(jax.random.key(0),
                          ANFSATConfig(feature_maps=16, query_maps=16))

    def loss_of(cfg, b):
        _, loss, _, _ = anf_sat_apply(params, cfg, b, jax.random.key(1),
                                      training=True, labels=b.solutions)
        return float(loss)

    up = ANFSATConfig(feature_maps=16, query_maps=16, train_rounds=2,
                      test_rounds=2, free_input_upweight=16.0)
    base = ANFSATConfig(feature_maps=16, query_maps=16, train_rounds=2,
                        test_rounds=2)
    assert loss_of(up, bare) == pytest.approx(loss_of(base, batch), rel=1e-6)


def test_anf_cache_roundtrip_preserves_mask(tmp_path):
    """npz cache roundtrip keeps free_input_mask; a legacy cache written
    without the field loads as None."""
    inst = RandomAnfInstances(min_vars=4, max_vars=8, train_size=4,
                              test_size=2, seed=11)
    ds = AnfDataset(inst, BUCKET, cache_dir=tmp_path, name="t")
    fresh = ds.train_data()          # builds + writes cache
    cached = ds.train_data()         # reads cache
    assert len(fresh) == len(cached)
    for a, b in zip(fresh, cached):
        np.testing.assert_array_equal(np.asarray(a.free_input_mask),
                                      np.asarray(b.free_input_mask))

    # simulate a pre-field cache: strip the mask keys from the npz
    path = ds._cache_path("train")
    data = dict(np.load(path))
    stripped = {k: v for k, v in data.items()
                if not k.endswith("free_input_mask")}
    np.savez_compressed(path, **stripped)
    legacy = ds.train_data()
    assert all(b.free_input_mask is None for b in legacy)
