"""Multi-label solution banks: K uniform samples per instance, per-step
per-graph label resampling (the denoising-posterior training signal; the
reference attaches one fixed Unigen sample per instance,
data/diffusion_sat_instances.py:36-94 — this is a deliberate improvement)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusionsat_tpu.data.datasets import _load_batches, _save_batches
from diffusionsat_tpu.data.generators import (
    KSatInstances,
    DiffusionSatInstances,
    SAT3Instances,
)
from diffusionsat_tpu.graph.batch import BucketSpec, build_batch
from diffusionsat_tpu.graph.dense_batch import dense_from_flat
from diffusionsat_tpu.models.query_sat import QuerySATConfig, query_sat_init
from diffusionsat_tpu.models.query_sat_dense import query_sat_dense_apply
from diffusionsat_tpu.sat.cnf import check_assignment
from diffusionsat_tpu.train.adabelief import adabelief
from diffusionsat_tpu.train.loop import (
    TrainState,
    _select_labels,
    make_train_step,
    make_train_step_for,
)

BUCKET = BucketSpec(max_vars=32, max_clauses=64, max_edges=256, max_graphs=4)

# two tiny satisfiable formulas with several solutions each
F1 = (4, [[1, 2], [-1, 3], [2, 4]])
F2 = (3, [[1, -2], [2, 3]])


def _bank(formula, K, seed):
    """K distinct-ish satisfying assignments (sampled by brute force)."""
    n, clauses = formula
    rng = np.random.default_rng(seed)
    sols = []
    for bits in range(2 ** n):
        a = [(bits >> i) & 1 for i in range(n)]
        if check_assignment(clauses, a):
            sols.append(a)
    assert len(sols) >= 2
    return [sols[rng.integers(0, len(sols))] for _ in range(K)]


def _ml_batch(K=4, seed=0):
    banks = [_bank(F1, K, seed), _bank(F2, K, seed + 1)]
    return build_batch([F1, F2], BUCKET, solutions=banks), banks


def test_build_batch_multilabel_bank():
    batch, banks = _ml_batch(K=4)
    assert batch.solutions_k is not None
    assert batch.solutions_k.shape == (4, BUCKET.max_vars)
    # row 0 of the bank is the primary `solutions`
    np.testing.assert_array_equal(batch.solutions_k[0], batch.solutions)
    # each row restricted to each graph's vars is the bank entry
    for k in range(4):
        np.testing.assert_array_equal(batch.solutions_k[k, :4], banks[0][k])
        np.testing.assert_array_equal(batch.solutions_k[k, 4:7], banks[1][k])
    # padding stays zero
    assert not np.any(batch.solutions_k[:, 7:])


def test_build_batch_single_label_has_no_bank():
    batch = build_batch([F1], BUCKET, solutions=[_bank(F1, 1, 0)[0]])
    assert batch.solutions_k is None


def test_build_batch_mixed_rank_cycles_rows():
    # one graph supplies K=3 rows, the other a single flat solution:
    # the flat one must tile across the bank
    bank = _bank(F1, 3, 2)
    single = _bank(F2, 1, 3)[0]
    batch = build_batch([F1, F2], BUCKET, solutions=[bank, single])
    assert batch.solutions_k.shape[0] == 3
    for k in range(3):
        np.testing.assert_array_equal(batch.solutions_k[k, 4:7], single)


def test_dense_from_flat_carries_bank():
    batch, banks = _ml_batch(K=4)
    dense = dense_from_flat(batch, G=4, Vg=8, Cg=8)
    assert dense.solutions_k.shape == (4, 4, 8)
    for k in range(4):
        np.testing.assert_array_equal(dense.solutions_k[k, 0, :4],
                                      banks[0][k])
        np.testing.assert_array_equal(dense.solutions_k[k, 1, :3],
                                      banks[1][k])
    # graphs 2,3 are padding
    assert not np.any(dense.solutions_k[:, 2:])


def test_select_labels_flat_matches_bank_rows():
    batch, _ = _ml_batch(K=4)
    G = batch.graph_mask.shape[0]
    seen = set()
    for s in range(40):
        labels = np.asarray(_select_labels(batch, jax.random.key(s)))
        # per graph, the selected slice equals SOME bank row
        for g, sl in ((0, slice(0, 4)), (1, slice(4, 7))):
            rows = [tuple(np.asarray(batch.solutions_k)[k, sl])
                    for k in range(4)]
            assert tuple(labels[sl]) in rows
            seen.add((g, tuple(labels[sl])))
    # across seeds, more than one distinct row gets picked per graph
    assert len({t for t in seen if t[0] == 0}) > 1
    assert len({t for t in seen if t[0] == 1}) > 1


def test_select_labels_dense_matches_flat_structure():
    batch, _ = _ml_batch(K=4)
    dense = dense_from_flat(batch, G=4, Vg=8, Cg=8)
    labels = np.asarray(_select_labels(dense, jax.random.key(7)))
    assert labels.shape == (4, 8)
    rows0 = [tuple(np.asarray(dense.solutions_k)[k, 0]) for k in range(4)]
    assert tuple(labels[0]) in rows0


def test_select_labels_without_bank_returns_solutions():
    batch = build_batch([F1], BUCKET, solutions=[_bank(F1, 1, 0)[0]])
    out = _select_labels(batch, jax.random.key(0))
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(batch.solutions))


@pytest.mark.parametrize("layout", ["flat", "dense"])
def test_train_step_multilabel_descends(layout):
    cfg = QuerySATConfig(feature_maps=16, query_maps=16, train_rounds=2,
                         test_rounds=2)
    params = query_sat_init(jax.random.key(0), cfg)
    opt = adabelief(learning_rate=1e-3)
    batch, _ = _ml_batch(K=4)
    if layout == "dense":
        batch = dense_from_flat(batch, G=4, Vg=8, Cg=8)
        step = make_train_step_for(query_sat_dense_apply, cfg, opt)
    else:
        step = make_train_step(cfg, opt)
    state = TrainState(params=params, opt_state=opt.init(params),
                       step=jnp.zeros((), jnp.int32), key=jax.random.key(1))
    losses = []
    for _ in range(8):
        state, out = step(state, batch)
        losses.append(float(out["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_cache_roundtrip_preserves_bank(tmp_path):
    batch, _ = _ml_batch(K=4)
    single = build_batch([F1], BUCKET, solutions=[_bank(F1, 1, 0)[0]])
    path = tmp_path / "batches.npz"
    _save_batches(path, [batch, single])
    loaded = _load_batches(path)
    np.testing.assert_array_equal(loaded[0].solutions_k, batch.solutions_k)
    assert loaded[1].solutions_k is None


def test_diffusion_instances_multilabel_rows_are_solutions():
    base = SAT3Instances(min_vars=4, max_vars=6, train_size=3, test_size=1,
                         seed=5)
    inst = DiffusionSatInstances(base, use_unigen=True, seed=5,
                                 n_label_samples=4)
    got = 0
    for n, clauses, sol in inst.train_generator():
        sol = np.asarray(sol)
        assert sol.shape == (4, n)
        for row in sol:
            assert check_assignment(clauses, row.tolist())
        got += 1
    assert got == 3
    # K distinct rows must appear on solution-rich instances (tiny hard
    # 3-SAT often has exactly one model, so use the solutions-multiplier
    # k-SAT generator here) — catches a sampler that replays one draw
    rich = KSatInstances(
        min_vars=6, max_vars=10, train_size=4, test_size=1,
        desired_multiplier_for_the_number_of_solutions=10, seed=6)
    inst2 = DiffusionSatInstances(rich, use_unigen=True, seed=6,
                                  n_label_samples=8)
    any_diverse = False
    for n, clauses, sol in inst2.train_generator():
        if len({tuple(r) for r in np.asarray(sol)}) > 1:
            any_diverse = True
    assert any_diverse


def test_multilabel_requires_unigen():
    base = SAT3Instances(min_vars=4, max_vars=6, train_size=1, test_size=1,
                         seed=0)
    with pytest.raises(ValueError):
        DiffusionSatInstances(base, use_unigen=False, n_label_samples=2)


def test_dp_step_with_multilabel_bank():
    """DP over the 8-virtual-device mesh with per-device label banks."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from diffusionsat_tpu.parallel.dp import (
        make_dp_train_step,
        shard_stacked_batch,
        stack_batches,
    )
    from diffusionsat_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=8, n_graph=1, devices=jax.devices()[:8])
    cfg = QuerySATConfig(feature_maps=8, query_maps=8, train_rounds=2,
                         test_rounds=2)
    opt = adabelief(learning_rate=1e-3)
    params = query_sat_init(jax.random.key(0), cfg)
    state = TrainState(params=params, opt_state=opt.init(params),
                       step=jnp.zeros((), jnp.int32), key=jax.random.key(1))
    batches = [_ml_batch(K=4, seed=10 * i)[0] for i in range(8)]
    stacked = shard_stacked_batch(stack_batches(batches), mesh)
    assert stacked.solutions_k.shape[0] == 8  # [D, K, V]
    step = make_dp_train_step(cfg, opt, mesh)
    state, out = step(state, stacked)
    assert np.isfinite(float(out["loss"]))
    assert int(state.step) == 1


@pytest.mark.parametrize("layout", ["flat", "dense"])
def test_selfsupervised_step_descends_both_layouts(layout):
    """Self-conditioning step (reference model/query_sat.py:398-417) on
    both execution layouts, with a multi-label bank present."""
    from diffusionsat_tpu.train.loop import make_selfsupervised_train_step

    cfg = QuerySATConfig(feature_maps=16, query_maps=16, train_rounds=2,
                         test_rounds=2)
    params = query_sat_init(jax.random.key(0), cfg)
    opt = adabelief(learning_rate=1e-3)
    batch, _ = _ml_batch(K=4)
    if layout == "dense":
        batch = dense_from_flat(batch, G=4, Vg=8, Cg=8)
        step = make_selfsupervised_train_step(
            cfg, opt, apply_fn=query_sat_dense_apply)
    else:
        step = make_selfsupervised_train_step(cfg, opt)
    state = TrainState(params=params, opt_state=opt.init(params),
                       step=jnp.zeros((), jnp.int32), key=jax.random.key(3))
    losses = []
    for _ in range(8):
        state, out = step(state, batch)
        losses.append(float(out["loss"]))
        assert float(out["loss1"]) > 0 and float(out["loss2"]) > 0
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
