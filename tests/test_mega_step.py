"""Mega-step (lax.scan over stacked batches) == sequential train steps.

One dispatch for N steps removes N-1 tunnel RPCs (train/loop.
make_scanned_train_step_for); correctness bar: numerical equivalence of
the whole optimization trajectory with the per-step path (losses rtol
1e-5, final params atol 1e-6, PRNG key exactly equal — scan-vs-unrolled
XLA scheduling may legally reorder float reductions, so the float
comparisons are tight-tolerance, not bitwise; ADVICE r4).
"""

import numpy as np

import jax
import jax.numpy as jnp

from diffusionsat_tpu.graph.batch import BucketSpec, build_batch
from diffusionsat_tpu.graph.dense_batch import dense_from_flat
from diffusionsat_tpu.models.query_sat import QuerySATConfig, query_sat_init
from diffusionsat_tpu.models.query_sat_dense import query_sat_dense_apply
from diffusionsat_tpu.train.adabelief import adabelief
from diffusionsat_tpu.train.loop import (
    TrainState,
    make_scanned_train_step_for,
    make_train_step_for,
    stack_batches,
)

BUCKET = BucketSpec(max_vars=16, max_clauses=24, max_edges=96, max_graphs=4)


def dense_batches(n=3, seed=0, attach_iso=False):
    from diffusionsat_tpu.graph.batch import attach_label_isolation
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        formulas, sols = [], []
        for g in range(2):
            nv = int(rng.integers(4, 7))
            clauses = [[int(s) * int(v)
                        for s, v in zip(rng.choice([-1, 1], 3),
                                        rng.choice(nv, 3, replace=False) + 1)]
                       for _ in range(2 * nv)]
            formulas.append((nv, clauses))
            sols.append([[int(b) for b in rng.integers(0, 2, nv)]
                         for _ in range(4)])  # K=4 bank
        flat = build_batch(formulas, BUCKET, solutions=sols)
        if attach_iso:
            flat = attach_label_isolation(flat)
        out.append(dense_from_flat(flat, G=4, Vg=8, Cg=16))
    return out


def _fresh_state(cfg, opt):
    params = query_sat_init(jax.random.key(0), cfg)
    return TrainState(params=params, opt_state=opt.init(params),
                      step=jnp.zeros((), jnp.int32), key=jax.random.key(7))


def test_scanned_equals_sequential():
    batches = dense_batches(3)
    cfg = QuerySATConfig(feature_maps=16, query_maps=16, train_rounds=2,
                         test_rounds=2, msg_layers=1, update_layers=1,
                         label_isolation_alpha=0.0)
    opt = adabelief(learning_rate=1e-3)

    seq_step = make_train_step_for(query_sat_dense_apply, cfg, opt)
    state_a = _fresh_state(cfg, opt)
    losses = []
    for b in batches:
        state_a, out = seq_step(state_a, b)
        losses.append(float(out["loss"]))

    mega = make_scanned_train_step_for(query_sat_dense_apply, cfg, opt)
    state_b = _fresh_state(cfg, opt)
    state_b, mout = mega(state_b, stack_batches(batches))

    assert int(state_b.step) == int(state_a.step) == 3
    np.testing.assert_allclose(np.asarray(mout["loss_per_step"]), losses,
                               rtol=1e-5)
    for pa, pb in zip(jax.tree.leaves(state_a.params),
                      jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   atol=1e-6)
    # the PRNG carry must line up too (future steps stay identical)
    assert jnp.all(jax.random.key_data(state_a.key)
                   == jax.random.key_data(state_b.key))


def test_stack_batches_preserves_optional_none():
    batches = dense_batches(2, seed=3)
    bare = [b.replace(solutions_k=None, label_isolation_k=None)
            for b in batches]
    stacked = stack_batches(bare)
    assert stacked.solutions_k is None
    assert stacked.incidence.shape[0] == 2


def test_scanned_equals_sequential_with_isolation():
    """The flagship isolation run's exact combination (run_r6a_queue.sh):
    K-label bank + attached isolation z-scores + alpha != 0, mega-scan vs
    per-step — the weighted label selection must not break trajectory
    equivalence (same tight tolerances as the plain mega-step test)."""
    batches = dense_batches(3, seed=5, attach_iso=True)
    assert all(b.label_isolation_k is not None for b in batches)
    cfg = QuerySATConfig(feature_maps=16, query_maps=16, train_rounds=2,
                         test_rounds=2, msg_layers=1, update_layers=1,
                         label_isolation_alpha=0.45)
    opt = adabelief(learning_rate=1e-3)

    seq_step = make_train_step_for(query_sat_dense_apply, cfg, opt)
    state_a = _fresh_state(cfg, opt)
    losses = []
    for b in batches:
        state_a, out = seq_step(state_a, b)
        losses.append(float(out["loss"]))

    mega = make_scanned_train_step_for(query_sat_dense_apply, cfg, opt)
    state_b = _fresh_state(cfg, opt)
    state_b, mout = mega(state_b, stack_batches(batches))

    assert int(state_b.step) == int(state_a.step) == 3
    np.testing.assert_allclose(np.asarray(mout["loss_per_step"]), losses,
                               rtol=1e-5)
    for pa, pb in zip(jax.tree.leaves(state_a.params),
                      jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   atol=1e-6)
    assert jnp.all(jax.random.key_data(state_a.key)
                   == jax.random.key_data(state_b.key))


def test_train_target_step_stops_at_budget():
    """train(target_step=...) must stop at the optimizer-step budget even
    when each call advances multiple steps with a generous chunk-count
    cap (the mega-step partial-chunk under-run fix)."""
    from diffusionsat_tpu.train.loop import train

    class S:
        def __init__(self, step):
            self.step = step

    def fake_step(state, batch):
        return S(state.step + 3), {"loss": jnp.zeros(())}

    out = train(S(0), fake_step, iter(lambda: 0, 1), steps=100,
                log_every=1, target_step=10)
    assert 10 <= int(out.step) < 13
