"""Flat-path throughput on its REAL workloads: SHA-1 CNFs and
SATLIB-scale 3-SAT, XLA segment-sum vs Pallas segsum plans.

Round-3 verdict item 5: hybrid dispatch sends graphs past the dense
block table (>128 vars — SHA-1 CNFs, SATLIB) to the flat path, and
since the Pallas-plan wiring its throughput was unmeasured there. This
bench packs (a) a SHA-1 preimage CNF batch (data/sha.py, reference
data/SHAGen2019.py workload) and (b) a uf250-style threshold 3-SAT
batch (SATLIB's classic size), and times the full jitted train step on
flat-XLA (train.loop.make_train_step) vs flat-Pallas
(make_planned_train_step + ops/pallas_segsum.build_batch_plans).
Protocol: 2 synced warm passes per executable, median of >=5 windows
(PERF.md variance section). Reference SpMM hot loop being matched:
/root/reference/model/query_sat.py:255,269,292.

    python benchmarks/bench_flat_pallas.py --out BENCH_FLAT_PALLAS.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_sha1_batch(rounds: int, n_instances: int, seed: int = 0):
    from diffusionsat_tpu.data.sha import sha1_cnf
    from diffusionsat_tpu.graph.batch import BucketSpec, build_batch

    formulas, sols = [], []
    v = c = e = 0
    rng = np.random.default_rng(seed)
    for i in range(n_instances):
        n_vars, clauses, witness = sha1_cnf(
            rounds=rounds, free_bits=int(rng.integers(8, 16)), seed=seed + i)
        formulas.append((n_vars, clauses))
        sols.append(witness)
        v += n_vars
        c += len(clauses)
        e += sum(len(cl) for cl in clauses)
    bucket = BucketSpec(max_vars=-(-v // 256) * 256,
                        max_clauses=-(-c // 256) * 256,
                        max_edges=-(-e // 1024) * 1024,
                        max_graphs=n_instances + 1)
    return build_batch(formulas, bucket, solutions=sols), e


def build_satlib_batch(n_vars: int, n_instances: int, seed: int = 0):
    """uf<n>-style: random 3-SAT at the classic SATLIB ratio 4.26."""
    from diffusionsat_tpu.graph.batch import BucketSpec, build_batch

    rng = np.random.default_rng(seed)
    m = int(4.26 * n_vars)
    formulas, sols = [], []
    for _ in range(n_instances):
        clauses = []
        for _ in range(m):
            vs = rng.choice(n_vars, size=3, replace=False) + 1
            clauses.append([int(v) if rng.random() < 0.5 else -int(v)
                            for v in vs])
        formulas.append((n_vars, clauses))
        sols.append(rng.integers(0, 2, size=n_vars).tolist())
    e = n_instances * 3 * m
    bucket = BucketSpec(max_vars=n_instances * n_vars,
                        max_clauses=n_instances * m,
                        max_edges=e, max_graphs=n_instances + 1)
    return build_batch(formulas, bucket, solutions=sols), e


def time_step(train_step, state, batch, extra=(), windows=5, cycles=3):
    import jax
    import jax.numpy as jnp

    for _ in range(2):  # 2 warm synced passes (tunnel warmup, CLAUDE.md)
        state, out = train_step(state, batch, *extra)
        float(out["loss"])
    dts = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(cycles):
            state, out = train_step(state, batch, *extra)
        float(out["loss"])
        float(jnp.sum(jax.tree.leaves(state.params)[0]))
        dts.append((time.perf_counter() - t0) / cycles)
    return float(np.median(dts)), [round(d * 1e3, 2) for d in dts], state


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sha_rounds", type=int, default=17)
    ap.add_argument("--sha_instances", type=int, default=2)
    ap.add_argument("--satlib_vars", type=int, default=250)
    ap.add_argument("--satlib_instances", type=int, default=8)
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=32)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from diffusionsat_tpu.models.query_sat import (
        QuerySATConfig, query_sat_init)
    from diffusionsat_tpu.ops.pallas_segsum import build_batch_plans
    from diffusionsat_tpu.train.adabelief import adabelief
    from diffusionsat_tpu.train.loop import (
        TrainState, make_planned_train_step, make_train_step)

    cfg = QuerySATConfig(train_rounds=args.rounds)
    params = query_sat_init(jax.random.key(0), cfg)
    opt = adabelief(learning_rate=1e-3)

    def fresh_state():
        return TrainState(params=params, opt_state=opt.init(params),
                          step=jnp.zeros((), jnp.int32),
                          key=jax.random.key(1))

    workloads = {
        "sha1_cnf": build_sha1_batch(args.sha_rounds, args.sha_instances),
        "satlib_uf": build_satlib_batch(args.satlib_vars,
                                        args.satlib_instances),
    }
    results = {"rounds": args.rounds,
               "windows_protocol": f"median-of-{args.windows}"}
    for name, (batch, edges) in workloads.items():
        entry = {"vars": int(batch.n_vars), "clauses": int(batch.n_clauses),
                 "graphs": int(batch.n_graphs), "edges": int(edges),
                 "padded_V": int(batch.var_mask.shape[0]),
                 "padded_E": int(batch.edge_mask_c.shape[0])}
        dev_batch = jax.device_put(batch, jax.devices()[0])

        xla_step = make_train_step(cfg, opt)
        dt, wins, _ = time_step(xla_step, fresh_state(), dev_batch,
                                windows=args.windows)
        entry["flat_xla_ms"] = round(dt * 1e3, 2)
        entry["flat_xla_windows_ms"] = wins
        entry["flat_xla_edges_per_sec_M"] = round(
            edges * 2 * args.rounds / dt / 1e6, 2)

        plans = build_batch_plans(batch)
        if plans is None:
            entry["flat_pallas_ms"] = None
            entry["note"] = "plans unavailable (segment over tile limits)"
        else:
            planned = make_planned_train_step(cfg, opt)
            dt, wins, _ = time_step(planned, fresh_state(), dev_batch,
                                    extra=(plans,), windows=args.windows)
            entry["flat_pallas_ms"] = round(dt * 1e3, 2)
            entry["flat_pallas_windows_ms"] = wins
            entry["flat_pallas_edges_per_sec_M"] = round(
                edges * 2 * args.rounds / dt / 1e6, 2)
            if entry["flat_xla_ms"]:
                entry["pallas_speedup"] = round(
                    entry["flat_xla_ms"] / entry["flat_pallas_ms"], 2)

        # block-sparse tiled incidence (ops/tiled_ops.py): same planned
        # train step, tiles as the plan object (VERDICT r4 item 4)
        from diffusionsat_tpu.ops.tiled_ops import build_tiled_incidence
        for tc, tl in ((128, 128), (64, 128)):
            key = f"tiled_{tc}x{tl}"
            ti = build_tiled_incidence(batch, tc=tc, tl=tl)
            ti_dev = jax.device_put(ti, jax.devices()[0])
            entry[f"{key}_tiles"] = int(ti.n_tiles)
            entry[f"{key}_macs_per_edge"] = round(
                ti.n_tiles * tc * tl / max(edges, 1), 1)
            planned = make_planned_train_step(cfg, opt)
            dt, wins, _ = time_step(planned, fresh_state(), dev_batch,
                                    extra=(ti_dev,), windows=args.windows)
            entry[f"{key}_ms"] = round(dt * 1e3, 2)
            entry[f"{key}_windows_ms"] = wins
            entry[f"{key}_edges_per_sec_M"] = round(
                edges * 2 * args.rounds / dt / 1e6, 2)
            if entry["flat_xla_ms"]:
                entry[f"{key}_speedup"] = round(
                    entry["flat_xla_ms"] / entry[f"{key}_ms"], 2)
        results[name] = entry
        print(json.dumps({name: entry}), flush=True)

    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
