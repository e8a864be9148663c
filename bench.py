"""Benchmark: QuerySAT training throughput on the attached accelerator.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ...,
"vs_baseline": N}. The metric is message-passing edge throughput
(edges/s/chip) over the full jitted train step at the reference's standard
workload shape: hard 3-SAT packed to the 20k node budget, 32 rounds
(reference config.py:24-35, model/query_sat.py:89).

vs_baseline is measured against the reference TF2 implementation's
single-GPU T4 workload equivalent. The reference publishes no throughput
numbers (BASELINE.md), so the baseline constant below is our measured
per-step edge work divided by a conservative reference-step estimate; it
is recalibrated whenever a reference measurement becomes available.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def build_workload(rng, bucket, target_vars):
    """Random 3-SAT at the threshold ratio packed to fill the bucket."""
    from diffusionsat_tpu.graph.batch import build_batch

    formulas, sols = [], []
    v_tot = c_tot = e_tot = 0
    while True:
        n = int(rng.integers(20, 31))
        m = int(4.258 * n + 58.26 * n ** (-2.0 / 3.0))
        clauses = []
        for _ in range(m):
            vs = rng.choice(n, size=3, replace=False) + 1
            clauses.append([int(v) if rng.random() < 0.5 else -int(v)
                            for v in vs])
        if (v_tot + n > bucket.max_vars or c_tot + m > bucket.max_clauses
                or e_tot + 3 * m > bucket.max_edges
                or len(formulas) >= bucket.max_graphs
                or v_tot + n > target_vars):
            break
        formulas.append((n, clauses))
        # benchmark labels need not be true solutions
        sols.append(rng.integers(0, 2, size=n).tolist())
        v_tot += n
        c_tot += m
        e_tot += 3 * m
    batch = build_batch(formulas, bucket, solutions=sols)
    return batch, e_tot


def main():
    import os

    from diffusionsat_tpu.graph.batch import BucketSpec
    from diffusionsat_tpu.models.query_sat import (
        QuerySATConfig, query_sat_init)
    from diffusionsat_tpu.ops.pallas_segsum import build_batch_plans
    from diffusionsat_tpu.train.adabelief import adabelief
    from diffusionsat_tpu.train.loop import (
        TrainState, make_planned_train_step, make_train_step)

    profile_dir = os.environ.get("DSAT_PROFILE_DIR")

    rng = np.random.default_rng(0)
    # reference workload: max_nodes_per_batch=20k (config.py:35)
    bucket = BucketSpec.for_node_budget(20_000, max_graphs=512)
    target_vars = bucket.max_vars
    batch, real_edges = build_workload(rng, bucket, target_vars)

    cfg = QuerySATConfig()  # full-size: 128 feature/query maps, 32 rounds
    params = query_sat_init(jax.random.key(0), cfg)
    opt = adabelief(learning_rate=1e-3)
    state = TrainState(params=params, opt_state=opt.init(params),
                       step=jnp.zeros((), jnp.int32), key=jax.random.key(1))

    # Pallas-plan SpMM path when the batch tiles cleanly; XLA otherwise
    plans = None
    if jax.default_backend() == "tpu":
        plans = build_batch_plans(batch)
    if plans is not None:
        planned = make_planned_train_step(cfg, opt)
        train_step = lambda s, b: planned(s, b, plans)
    else:
        train_step = make_train_step(cfg, opt)

    # warmup / compile; NB fetch a value to the host — through the axon
    # tunnel block_until_ready alone does not wait for execution
    state, out = train_step(state, batch)
    float(out["loss"])

    # steady-state pipelined throughput: steps chain through the state
    # dependency; one host sync at the end covers the whole chain
    if profile_dir:  # optional jax.profiler trace (DSAT_PROFILE_DIR=...)
        try:
            jax.profiler.start_trace(profile_dir)
        except Exception as e:
            print(f"profiler unavailable: {e}")
            profile_dir = None
    iters = 15
    t0 = time.perf_counter()
    for _ in range(iters):
        state, out = train_step(state, batch)
    float(out["loss"])
    import jax as _jax
    float(jnp.sum(_jax.tree.leaves(state.params)[0]))
    dt = (time.perf_counter() - t0) / iters
    if profile_dir:
        try:
            jax.profiler.stop_trace()
        except Exception:
            pass

    rounds = cfg.train_rounds
    # each round moves every edge 2x (lit->clause, clause->lit) in fwd,
    # and again in bwd; count fwd message-passing edge traversals only
    edges_per_step = real_edges * 2 * rounds
    edges_per_sec = edges_per_step / dt

    # reference-equivalent estimate (the reference publishes no numbers,
    # BASELINE.md, and TF2 is not installed here to measure): TF2 on a T4
    # with tf.function sparse matmuls over a dynamic 32-round loop at this
    # workload is estimated at ~3.5 steps/s -> ~1e7 edge traversals/s.
    # Recalibrate when a measured reference number exists.
    baseline_edges_per_sec = 1.0e7

    print(json.dumps({
        "metric": "train_edge_throughput",
        "value": round(edges_per_sec / 1e6, 3),
        "unit": "M edge-traversals/s/chip",
        "vs_baseline": round(edges_per_sec / baseline_edges_per_sec, 3),
        "step_time_ms": round(dt * 1e3, 2),
        "edges": real_edges,
        "vars": int(batch.n_vars),
        "clauses": int(batch.n_clauses),
        "graphs": int(batch.n_graphs),
        "rounds": rounds,
    }))


if __name__ == "__main__":
    main()
