"""ANF train-step throughput: flat segment aggregation vs tiled
block-sparse incidence (ops/tiled_ops.build_anf_tiles).

The ANF r17 train step reads ~111 ms and is device-bound (PERF.md
mega-step note); its hot aggregations are the clause x value-node
segment SpMMs plus the anf_value_cplx angle/log-length sums — exactly
the ops the tiled layout turns into batched MXU matmuls. Protocol:
2 warm synced passes, median of >=5 windows (PERF.md).

    python benchmarks/bench_anf_tiled.py --out BENCH_ANF_TILED.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=17)
    ap.add_argument("--train_rounds", type=int, default=16)
    ap.add_argument("--n_batches", type=int, default=4)
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--cycles", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from diffusionsat_tpu.data.anf_datasets import AnfDataset
    from diffusionsat_tpu.data.sha_anf import Sha1AnfInstances
    from diffusionsat_tpu.graph.anf_batch import ANFBucket
    from diffusionsat_tpu.models.anf_sat import (
        ANFSATConfig, anf_sat_apply, anf_sat_init)
    from diffusionsat_tpu.ops.tiled_ops import build_anf_tiles
    from diffusionsat_tpu.train.adabelief import adabelief
    from diffusionsat_tpu.train.loop import (
        TrainState, make_planned_train_step_for, make_train_step_for)

    inst = Sha1AnfInstances(rounds=args.rounds, min_free_bits=2,
                            max_free_bits=20, train_size=8000,
                            test_size=256, seed=0)
    bucket = ANFBucket(max_vars=8192, max_ands=16384, max_clauses=8704,
                       max_edges=32768, max_graphs=8)
    name = f"sha1anf_r{args.rounds}_fb2_20_8000"
    ds = AnfDataset(inst, bucket, name=name, seed=0)
    batches = ds.test_data()[:args.n_batches]
    edges = [int((np.asarray(b.edge_mask_c) > 0).sum()) for b in batches]
    print(f"{len(batches)} batches, edges {edges}", flush=True)

    cfg = ANFSATConfig(train_rounds=args.train_rounds)
    params = anf_sat_init(jax.random.key(0), cfg)
    opt = adabelief(learning_rate=1e-3)

    def fresh_state():
        return TrainState(params=params, opt_state=opt.init(params),
                          step=jnp.zeros((), jnp.int32),
                          key=jax.random.key(1))

    dev = jax.devices()[0]
    dev_batches = [jax.device_put(b, dev) for b in batches]

    def time_stream(step, stream, extras=None):
        state = fresh_state()
        for _ in range(2):
            for i, b in enumerate(stream):
                state, out = (step(state, b, extras[i]) if extras
                              else step(state, b))
            float(out["loss"])
        dts = []
        for _ in range(args.windows):
            t0 = time.perf_counter()
            for _ in range(args.cycles):
                for i, b in enumerate(stream):
                    state, out = (step(state, b, extras[i]) if extras
                                  else step(state, b))
            float(out["loss"])
            dts.append((time.perf_counter() - t0)
                       / (args.cycles * len(stream)))
        return float(np.median(dts)), [round(d * 1e3, 2) for d in dts]

    results = {"rounds": args.rounds, "train_rounds": args.train_rounds,
               "edges_per_batch": edges,
               "protocol": f"median-of-{args.windows}"}

    flat_step = make_train_step_for(anf_sat_apply, cfg, opt)
    dt, wins = time_stream(flat_step, dev_batches)
    results["flat_ms"] = round(dt * 1e3, 2)
    results["flat_windows_ms"] = wins
    print(json.dumps({"flat_ms": results["flat_ms"], "windows": wins}),
          flush=True)

    planned = make_planned_train_step_for(anf_sat_apply, cfg, opt,
                                          plan_kw="tiles")
    for tc, tl in ((128, 128), (64, 64)):
        tiles = [jax.device_put(build_anf_tiles(b, tc=tc, tl=tl), dev)
                 for b in batches]
        key = f"tiled_{tc}x{tl}"
        results[f"{key}_tiles"] = [t.n_tiles for t in tiles]
        dt, wins = time_stream(planned, dev_batches, extras=tiles)
        results[f"{key}_ms"] = round(dt * 1e3, 2)
        results[f"{key}_windows_ms"] = wins
        results[f"{key}_speedup"] = round(results["flat_ms"]
                                          / results[f"{key}_ms"], 2)
        print(json.dumps({f"{key}_ms": results[f"{key}_ms"],
                          "speedup": results[f"{key}_speedup"]}),
              flush=True)

    print(json.dumps(results))
    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
