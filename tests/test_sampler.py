"""Diffusion sampler chain tests (CPU, tiny model)."""

import numpy as np

import jax

from diffusionsat_tpu.diffusion.sampler import DiffusionSampler
from diffusionsat_tpu.models.query_sat import QuerySATConfig, query_sat_init
from diffusionsat_tpu.sat.cnf import CNF, VariableAssignment
from diffusionsat_tpu.diffusion.schedule import (
    distribution_at_time,
    reverse_distribution_step_theoretic,
)
import jax.numpy as jnp


def test_reverse_step_converges_to_model_prediction():
    # when the model is certain (x0 one-hot) repeated reverse steps drive x
    # toward that one-hot as t -> 0
    x = jnp.full((4, 2), 0.5)
    x0 = jnp.asarray([[1.0, 0.0]] * 4)
    N = 16
    for t_idx in range(N):
        t = 1.0 - t_idx / N
        x = reverse_distribution_step_theoretic(x, x0, t, 1.0 / N)
    assert float(jnp.min(x[:, 0])) > 0.9


def test_distribution_at_time_limits():
    x = jnp.asarray([[1.0, 0.0]])
    np.testing.assert_allclose(np.asarray(distribution_at_time(x, 0.0)),
                               [[1.0, 0.0]])
    np.testing.assert_allclose(np.asarray(distribution_at_time(x, 1.0)),
                               [[0.5, 0.5]])


def test_sampler_untrained_model_runs_and_counts_only_sat():
    # an untrained tiny model: samples() must only ever record satisfying
    # assignments, whatever the success rate
    cnf = CNF(n_vars=3, clauses=[[1, 2], [-1, 3], [2, 3]])
    cfg = QuerySATConfig(feature_maps=8, query_maps=8, train_rounds=2,
                         test_rounds=2)
    params = query_sat_init(jax.random.key(0), cfg)
    sampler = DiffusionSampler(params, cfg, cnf, diffusion_steps=4,
                               test_rounds=2, graphs_per_batch=8, seed=1)
    counts = sampler.samples(5, max_batches=4)
    for sol_int in counts:
        asgn = VariableAssignment(3, cnf.clauses())
        asgn.assign_all_from_int(sol_int)
        assert asgn.satisfiable()


def test_sampler_flat_and_dense_paths_both_sample_sat():
    # same formula through both execution layouts; each must emit only
    # satisfying assignments (distributions differ: RNG shapes differ)
    cnf = CNF(n_vars=4, clauses=[[1, 2], [-1, 3], [2, 4], [-3, -4, 1]])
    cfg = QuerySATConfig(feature_maps=8, query_maps=8, train_rounds=2,
                         test_rounds=2)
    params = query_sat_init(jax.random.key(1), cfg)
    for dense in (False, True):
        sampler = DiffusionSampler(params, cfg, cnf, diffusion_steps=3,
                                   test_rounds=2, graphs_per_batch=6,
                                   seed=2, dense=dense)
        assert sampler.dense == dense
        counts = sampler.samples(4, max_batches=3)
        for sol_int in counts:
            asgn = VariableAssignment(4, cnf.clauses())
            asgn.assign_all_from_int(sol_int)
            assert asgn.satisfiable()

def test_sampler_freeze_from_defers_fixing():
    # freeze_from=N disables freezing entirely (equals freeze_sat=False
    # trajectories for the same key); freeze_from=0 is the reference
    # early-freeze regime. Check via the fixed_step output of the chain.
    from diffusionsat_tpu.diffusion.sampler import make_diffusion_chain
    from diffusionsat_tpu.graph.batch import BucketSpec, build_batch

    # tautological clauses: EVERY assignment satisfies, so the freeze
    # fires deterministically at the first permitted step
    clauses = [[1, -1], [2, -2], [3, -3]]
    cnf = CNF(n_vars=3, clauses=clauses)
    cfg = QuerySATConfig(feature_maps=8, query_maps=8, train_rounds=2,
                         test_rounds=2)
    params = query_sat_init(jax.random.key(0), cfg)
    bucket = BucketSpec(max_vars=16, max_clauses=16, max_edges=64,
                        max_graphs=4)
    batch = build_batch([(3, cnf.clauses())] * 4, bucket,
                        solutions=[[0, 0, 0]] * 4)
    key = jax.random.key(7)
    N = 6
    late = 4
    nv = 12  # 4 graphs x 3 real vars (rest is padding)
    chain_early = make_diffusion_chain(cfg, diffusion_steps=N, test_rounds=2)
    chain_late = make_diffusion_chain(cfg, diffusion_steps=N, test_rounds=2,
                                      freeze_from=late)
    chain_off = make_diffusion_chain(cfg, diffusion_steps=N, test_rounds=2,
                                     freeze_sat=False)
    _, _, fs_early = chain_early(params, batch, key)
    _, _, fs_late = chain_late(params, batch, key)
    _, _, fs_off = chain_off(params, batch, key)
    # reference regime: pinned at the very first step
    assert (np.asarray(fs_early)[:nv] == 0).all()
    # late-freeze: pinned exactly at the first permitted step
    assert (np.asarray(fs_late)[:nv] == late).all()
    # freezing disabled: fixed_step stays -1 everywhere
    assert (np.asarray(fs_off) == -1).all()
