"""Ablation bench: flat vs dense QuerySAT train step on the reference
20k-node workload (hard 3-SAT threshold mix, 32 rounds).

Usage: python benchmarks/bench_dense.py [--flat] [--dense] [--fwd]
Prints one JSON line per measured variant. See STATUS.md perf notes.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp


def timeit(step, state, batch, iters=15):
    state, out = step(state, batch)
    float(out["loss"])  # host fetch = sync through the tunnel
    t0 = time.perf_counter()
    for _ in range(iters):
        state, out = step(state, batch)
    float(out["loss"])
    float(jnp.sum(jax.tree.leaves(state.params)[0]))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--flat", action="store_true")
    ap.add_argument("--dense", action="store_true")
    ap.add_argument("--precision", default="highest",
                    choices=["highest", "high", "default"])
    ap.add_argument("--bf16_mlp", action="store_true")
    ap.add_argument("--block_bf16", action="store_true",
                    help="block-level bf16: params/incidence cast once, "
                         "bf16 states+activations, f32 accum (the "
                         "VERDICT round-2 item-9 recipe)")
    ap.add_argument("--budget", type=int, default=20_000)
    args = ap.parse_args()
    if not (args.flat or args.dense):
        args.dense = True

    from diffusionsat_tpu.data.bench_workloads import threshold_3sat_batch
    from diffusionsat_tpu.graph.dense_batch import densify_batches
    from diffusionsat_tpu.models.query_sat import (
        QuerySATConfig, query_sat_init)
    from diffusionsat_tpu.models.query_sat_dense import query_sat_dense_apply
    from diffusionsat_tpu.ops import dense_ops
    from diffusionsat_tpu.train.adabelief import adabelief
    from diffusionsat_tpu.train.loop import (
        TrainState, make_train_step, make_train_step_for)

    dense_ops.INCIDENCE_PRECISION = {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT}[args.precision]

    rng = np.random.default_rng(0)
    flat, edges = threshold_3sat_batch(rng, args.budget)
    cfg = QuerySATConfig(compute_dtype=jnp.bfloat16 if args.bf16_mlp
                         else None, block_bf16=args.block_bf16)
    params = query_sat_init(jax.random.key(0), cfg)
    opt = adabelief(learning_rate=1e-3)

    def fresh_state():
        return TrainState(params=params, opt_state=opt.init(params),
                          step=jnp.zeros((), jnp.int32),
                          key=jax.random.key(1))

    meta = {"edges": edges, "vars": int(flat.n_vars),
            "clauses": int(flat.n_clauses), "graphs": int(flat.n_graphs),
            "rounds": cfg.train_rounds}

    if args.flat:
        dt = timeit(make_train_step(cfg, opt), fresh_state(), flat)
        print(json.dumps({"variant": "flat_xla", "step_ms": round(dt * 1e3, 2),
                          "edges_per_sec_M": round(
                              edges * 2 * cfg.train_rounds / dt / 1e6, 2),
                          **meta}))

    if args.dense:
        dense = densify_batches([flat])[0]
        dt = timeit(make_train_step_for(query_sat_dense_apply, cfg, opt),
                    fresh_state(), dense)
        print(json.dumps({"variant": f"dense_{args.precision}"
                          + ("_bf16mlp" if args.bf16_mlp else "")
                          + ("_blockbf16" if args.block_bf16 else ""),
                          "step_ms": round(dt * 1e3, 2),
                          "edges_per_sec_M": round(
                              edges * 2 * cfg.train_rounds / dt / 1e6, 2),
                          "dense_dims": [dense.G, dense.Vg, dense.Cg],
                          **meta}))


if __name__ == "__main__":
    main()
