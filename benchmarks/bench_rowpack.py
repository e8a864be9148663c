"""Row-packing MXU-fill experiment (VERDICT r4 item 6, option b).

PERF.md's speed-of-light attribution says the remaining gap at the 20k
reading (pct_of_sol ~12-14%) is MXU pipeline underfill at 128-wide
features — too few rows per matmul — plus the VPU round chain. The lever
it names is "rows per matmul (bigger batches)". This bench measures that
lever directly and semantics-free: concatenate k same-shape dense batches
along the graph axis (k = 1, 2, 4), so every MLP matmul and incidence
einsum in the round body gets k x the rows with identical per-edge work,
and report ms/step, per-edge throughput, and pct_of_sol at each k.

If throughput/edge rises materially with k, underfill is confirmed and
batch size is the SOL lever (the 60k budget already buys convergence,
CONV_20K_VS_60K); if it plateaus, the step is latency/VPU-bound at these
shapes and BASELINE.md's >=95% SoL target needs the roofline revision.

    python benchmarks/bench_rowpack.py --out BENCH_ROWPACK.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def concat_dense(bs):
    """Concatenate same-(Vg, Cg) dense batches along the graph axis."""
    first = bs[0]

    def cat(field, axis=0):
        return np.concatenate(
            [np.asarray(getattr(b, field)) for b in bs], axis=axis)

    kw = {}
    if first.solutions_k is not None:
        kw["solutions_k"] = cat("solutions_k", axis=1)       # [K, G, Vg]
    if getattr(first, "label_isolation_k", None) is not None:
        kw["label_isolation_k"] = cat("label_isolation_k", axis=1)
    return first.replace(
        incidence=cat("incidence"), var_mask=cat("var_mask"),
        clause_mask=cat("clause_mask"), graph_mask=cat("graph_mask"),
        n_vars_per_graph=cat("n_vars_per_graph"),
        n_clauses_per_graph=cat("n_clauses_per_graph"),
        solutions=cat("solutions"),
        n_vars=np.asarray(sum(int(b.n_vars) for b in bs), np.int32),
        n_clauses=np.asarray(sum(int(b.n_clauses) for b in bs), np.int32),
        n_graphs=np.asarray(sum(int(b.n_graphs) for b in bs), np.int32),
        **kw)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=int, default=20000)
    ap.add_argument("--n_batches", type=int, default=8)
    ap.add_argument("--factors", default="1,2,4")
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--cycles", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    import bench as benchmod
    from diffusionsat_tpu.data.bench_workloads import (
        threshold_3sat_batches_sorted)
    from diffusionsat_tpu.graph.dense_batch import densify_batches_quantized
    from diffusionsat_tpu.models.query_sat import (
        QuerySATConfig, query_sat_init)
    from diffusionsat_tpu.models.query_sat_dense import query_sat_dense_apply
    from diffusionsat_tpu.ops import dense_ops
    from diffusionsat_tpu.train.adabelief import adabelief
    from diffusionsat_tpu.train.loop import TrainState, make_train_step_for

    rng = np.random.default_rng(0)
    packed = threshold_3sat_batches_sorted(
        rng, args.budget, args.n_batches,
        max_graphs=max(512, args.budget // 40))
    dense_ops.INCIDENCE_PRECISION = jax.lax.Precision.DEFAULT
    denses = densify_batches_quantized([b for b, _ in packed])
    edges = [e for _, e in packed]

    cfg = QuerySATConfig(block_bf16=True)
    params = query_sat_init(jax.random.key(0), cfg)
    opt = adabelief(learning_rate=1e-3)
    rounds = cfg.train_rounds

    # group by block shape so concatenation is legal
    by_shape = defaultdict(list)
    for b, e in zip(denses, edges):
        by_shape[(b.Vg, b.Cg)].append((b, e))

    results = {"budget": args.budget,
               "protocol": f"median-of-{args.windows}, {args.cycles} "
                           "cycles/window, device-cached, per-step dispatch"}
    dev = jax.devices()[0]
    for k in [int(x) for x in args.factors.split(",")]:
        stream, stream_edges = [], []
        for (vg, cg), items in by_shape.items():
            for i in range(0, len(items) - k + 1, k):
                chunk = items[i:i + k]
                stream.append(concat_dense([b for b, _ in chunk]))
                stream_edges.append(sum(e for _, e in chunk))
        if not stream:
            results[f"k{k}"] = {"note": "no shape group large enough"}
            continue
        state = TrainState(params=params, opt_state=opt.init(params),
                           step=jnp.zeros((), jnp.int32),
                           key=jax.random.key(1))
        step = make_train_step_for(query_sat_dense_apply, cfg, opt)
        dev_stream = [jax.device_put(b, dev) for b in stream]
        for _ in range(2):
            for b in dev_stream:
                state, out = step(state, b)
            float(out["loss"])
        dts = []
        for _ in range(args.windows):
            t0 = time.perf_counter()
            for _ in range(args.cycles):
                for b in dev_stream:
                    state, out = step(state, b)
            float(out["loss"])
            dts.append((time.perf_counter() - t0)
                       / (args.cycles * len(dev_stream)))
        med = float(np.median(dts))
        total_edges = float(np.mean(stream_edges))
        useful = float(np.mean([
            benchmod._useful_macs(cfg, int(b.n_vars), int(b.n_clauses), e)
            for b, e in zip(stream, stream_edges)]))
        sol_s = useful * 2 * rounds * 3 / 197e12
        rows = float(np.mean([int(b.n_graphs) * b.Vg for b in stream]))
        entry = {
            "n_steps_in_stream": len(stream),
            "mean_graphs_per_step": round(float(np.mean(
                [int(b.n_graphs) for b in stream])), 1),
            "mean_var_rows_per_matmul": round(rows, 0),
            "median_step_ms": round(med * 1e3, 2),
            "windows_ms": [round(d * 1e3, 2) for d in dts],
            "edges_per_sec_M": round(
                total_edges * 2 * rounds / med / 1e6, 2),
            "ms_per_20k_batch_equiv": round(med * 1e3 / k, 2),
            "pct_of_sol": round(100 * sol_s / med, 2),
        }
        results[f"k{k}"] = entry
        print(json.dumps({f"k{k}": entry}), flush=True)

    print(json.dumps(results))
    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
