"""Scaling-efficiency harness: edges/s/device vs device count for DP and
graph-partitioned (GP) execution on a virtual CPU mesh.

BASELINE.md target: >=0.8 scaling efficiency at N>=2. Real multi-chip
hardware is not attached in this environment, so the harness runs on an
8-virtual-device CPU mesh (`xla_force_host_platform_device_count`) — the
numbers are a correctness + overhead proxy (collective insertion, sharding
layouts, program structure), not ICI bandwidth measurements; the same
code paths run unchanged on a real TPU slice.

    python benchmarks/scaling_harness.py [--out SCALING_VDEV.json]

NB the repo-root SCALING.json is a deprecation stub (round 4): the
virtual-mesh "efficiency_vs_shared_core_bound" numbers measure host core
contention, not chip or interconnect behavior, and were repeatedly
misread as multi-chip efficiency. Projected multi-chip efficiency lives
in SCALING_ROOFLINE.json (benchmarks/scaling_roofline.py); this harness
remains useful only as a functional overhead/correctness proxy and now
writes to SCALING_VDEV.json by default to keep the stub intact.

DP is weak scaling (one packed batch per device). NB on a virtual CPU
mesh all "devices" share one host's cores, so the ideal weak-scaling step
time is N*t1, not t1 — efficiency is therefore reported against that
shared-core bound (N*t1 / t(N); 1.0 = no parallelization overhead beyond
core sharing). GP is strong scaling (one fixed batch sharded N ways),
same normalization (ideal step time t1 on shared cores). Also reports the per-round collective
volume of the GP step (full [2V, F] psum) vs the halo design's boundary
rows (parallel/halo.py) when available.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# must precede any jax import; hard overrides — the host environment
# exports JAX_PLATFORMS=axon (the TPU tunnel) which must NOT win here
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402

import jax  # noqa: E402

# env vars alone do not stop the preloaded axon plugin from initializing
# its tunnel backend at discovery; jax.config IS honored (backend
# selection is lazy — same mechanism as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

# sitecustomize preloads jax before this script's env lines run; the
# config update still wins because backend selection is lazy
jax.config.update("jax_platforms", "cpu")


def time_steps(step, state, batch, iters=12):
    state, out = step(state, batch)
    jax.block_until_ready(out["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, out = step(state, batch)
    jax.block_until_ready(out["loss"])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALING_VDEV.json")
    ap.add_argument("--budget", type=int, default=2000)
    ap.add_argument("--rounds", type=int, default=8)
    args = ap.parse_args()

    from diffusionsat_tpu.data.bench_workloads import threshold_3sat_batch
    from diffusionsat_tpu.models.query_sat import (
        QuerySATConfig, query_sat_init)
    from diffusionsat_tpu.parallel.dp import (
        make_dp_train_step, shard_stacked_batch, stack_batches)
    from diffusionsat_tpu.parallel.graph_partition import (
        make_gp_train_step, shard_gp_batch)
    from diffusionsat_tpu.parallel.mesh import make_mesh
    from diffusionsat_tpu.train.adabelief import adabelief
    from diffusionsat_tpu.train.loop import (
        TrainState, make_train_step)

    cfg = QuerySATConfig(feature_maps=64, query_maps=64,
                         train_rounds=args.rounds, test_rounds=args.rounds)
    opt = adabelief(learning_rate=1e-3)
    params = query_sat_init(jax.random.key(0), cfg)

    def fresh():
        return TrainState(params=params, opt_state=opt.init(params),
                          step=jnp.zeros((), jnp.int32),
                          key=jax.random.key(1))

    rng = np.random.default_rng(0)
    results = {"note": ("virtual CPU mesh: overhead/correctness proxy, "
                        "not ICI bandwidth"),
               "budget": args.budget, "rounds": args.rounds}
    n_dev = len(jax.devices())

    # --- DP weak scaling ---------------------------------------------------
    batches = []
    per_batch_edges = []
    for _ in range(n_dev):
        b, e = threshold_3sat_batch(
            np.random.default_rng(rng.integers(1e9)), args.budget,
            min_vars=8, max_vars=24, max_graphs=256)
        batches.append(b)
        per_batch_edges.append(e)
    t1 = time_steps(make_train_step(cfg, opt), fresh(), batches[0])
    base_tput = per_batch_edges[0] * 2 * args.rounds / t1
    dp = {"1": {"step_ms": round(t1 * 1e3, 1), "edges_per_sec_M":
                round(base_tput / 1e6, 3), "efficiency": 1.0}}
    for n in (2, 4, 8):
        if n > n_dev:
            break
        mesh = make_mesh(n_data=n, n_graph=1)
        step = make_dp_train_step(cfg, opt, mesh)
        stacked = shard_stacked_batch(stack_batches(batches[:n]), mesh)
        t = time_steps(step, fresh(), stacked)
        # actual edge work across the n device batches, not n * max
        tput = sum(per_batch_edges[:n]) * 2 * args.rounds / t
        dp[str(n)] = {"step_ms": round(t * 1e3, 1),
                      "edges_per_sec_M": round(tput / 1e6, 3),
                      "efficiency_vs_shared_core_bound":
                          round(n * t1 / t, 3)}
    results["dp_weak_scaling"] = dp

    # --- GP strong scaling -------------------------------------------------
    batch, e_gp = threshold_3sat_batch(np.random.default_rng(7), args.budget,
                                       min_vars=8, max_vars=24,
                                       max_graphs=256)
    # single-device baseline timed on the SAME batch the GP steps run
    t_gp1 = time_steps(make_train_step(cfg, opt), fresh(), batch)
    gp = {"1": {"step_ms": round(t_gp1 * 1e3, 1), "edges_per_sec_M":
                round(e_gp * 2 * args.rounds / t_gp1 / 1e6, 3)}}
    for n in (2, 4, 8):
        if n > n_dev:
            break
        mesh = make_mesh(n_data=1, n_graph=n)
        step = make_gp_train_step(cfg, opt, mesh)
        placed = shard_gp_batch(batch, mesh)
        t = time_steps(step, fresh(), placed)
        tput = e_gp * 2 * args.rounds / t
        gp[str(n)] = {"step_ms": round(t * 1e3, 1),
                      "edges_per_sec_M": round(tput / 1e6, 3),
                      "efficiency_vs_shared_core_bound":
                          round(t_gp1 / t, 3)}
    results["gp_strong_scaling"] = gp

    # --- GP communication accounting --------------------------------------
    try:
        from diffusionsat_tpu.parallel.halo import build_halo_plan
        plan = build_halo_plan(batch, min(4, n_dev))
        full_rows = 2 * batch.V
        results["gp_comm_rows_per_round"] = {
            "full_psum": full_rows,
            "halo_boundary": int(plan.halo_rows),
            "reduction_x": round(full_rows / max(int(plan.halo_rows), 1), 2),
        }
    except ImportError:
        pass

    print(json.dumps(results, indent=1))
    Path(args.out).write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
