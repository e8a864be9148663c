"""MEASURED reference baseline: the actual TF2 reference QuerySAT
train_step vs our JAX train step on the SAME workload and host.

Round-2 verdict flagged bench.py's `vs_baseline` as an invented constant
(estimated T4 step rate). TF 2.21 is installed, so the reference
implementation (/root/reference/model/query_sat.py:380-391) can be timed
directly. No T4 is attached, so the honest comparison is
software-vs-software on the SAME CPU host: reference TF graph-mode
train_step vs our jitted JAX train step, identical packed 20k-node
threshold 3-SAT batches (the bench.py workload, size-sorted packing).
The TPU number (bench.py) then stands on its own hardware.

Writes BENCH_TF_REF.json:
  {tf_ref_cpu_ms_per_step, jax_cpu_ms_per_step, jax_over_tf_speedup,
   edges, n_batches, ...}

Run: python benchmarks/bench_tf_reference.py [--budget 20000]
     (force CPU for the JAX side: env JAX_PLATFORM_NAME=cpu)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

import numpy as np

os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")

# stubs for the reference's module-level imports (not installed)
optuna_stub = types.ModuleType("optuna")
optuna_stub.Trial = object
sys.modules.setdefault("optuna", optuna_stub)

import tensorflow as tf  # noqa: E402

tfp_stub = types.ModuleType("tensorflow_probability")
tfp_dists = types.ModuleType("tensorflow_probability.distributions")


class _Bernoulli:
    def __init__(self, probs):
        self.probs = tf.convert_to_tensor(probs, tf.float32)

    def kl_divergence(self, other):
        p, q = self.probs, other.probs
        return p * (tf.math.log(p) - tf.math.log(q)) + \
            (1.0 - p) * (tf.math.log(1.0 - p) - tf.math.log(1.0 - q))


tfp_dists.Bernoulli = _Bernoulli
tfp_stub.distributions = tfp_dists
sys.modules.setdefault("tensorflow_probability", tfp_stub)

sys.path.insert(0, "/root/reference")
# the script lives in benchmarks/, so the repo root is not sys.path[0]
sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent))


def tf_batch_from_formulas(formulas, sols):
    """SatSpecifics-layout sparse tensors (data/SatSpecifics.py:21-57)."""
    n_vars = sum(n for n, _ in formulas)
    shifted = []
    graph_c, graph_v = [], []
    off = 0
    for gi, (n, cls) in enumerate(formulas):
        for c in cls:
            shifted.append([(abs(l) + off) * (1 if l > 0 else -1)
                            for l in c])
            graph_c.append(gi)
        graph_v.extend([gi] * n)
        off += n
    n_clauses = len(shifted)

    idx = []
    for ci, c in enumerate(shifted):
        for l in c:
            row = (l - 1) if l > 0 else (n_vars + (-l - 1))
            idx.append((row, ci))
    idx.sort()
    adj = tf.sparse.SparseTensor([list(i) for i in idx],
                                 [1.0] * len(idx),
                                 [2 * n_vars, n_clauses])
    cg = tf.sparse.SparseTensor([[g, i] for i, g in enumerate(graph_c)],
                                [1.0] * n_clauses,
                                [len(formulas), n_clauses])
    vg = tf.sparse.SparseTensor([[g, i] for i, g in enumerate(graph_v)],
                                [1.0] * n_vars,
                                [len(formulas), n_vars])
    solutions = tf.ragged.constant(sols, dtype=tf.int32,
                                   row_splits_dtype=tf.int32)
    return adj, cg, vg, solutions


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--budget", type=int, default=20000)
    p.add_argument("--n_batches", type=int, default=3)
    p.add_argument("--cycles", type=int, default=2)
    p.add_argument("--rounds", type=int, default=32)
    p.add_argument("--out", default="BENCH_TF_REF.json")
    p.add_argument("--skip_jax", action="store_true")
    args = p.parse_args(argv)

    from diffusionsat_tpu.data.bench_workloads import (
        threshold_3sat_batches_sorted)

    rng = np.random.default_rng(0)
    packed = threshold_3sat_batches_sorted(rng, args.budget, args.n_batches,
                                           with_formulas=True)
    edge_counts = [e for _, e, _, _ in packed]

    # ---------------- reference TF2 train_step ----------------
    from model.query_sat import QuerySAT

    model = QuerySAT(optimizer=None, train_rounds=args.rounds,
                     test_rounds=args.rounds)

    tf_batches = [tf_batch_from_formulas(f, s) for _, _, f, s in packed]
    model.call(*tf_batches[0][:3], training=False,
               labels=tf_batches[0][3].flat_values)  # build variables

    # Keras 3 does not track the reference's legacy-internal Dense layers
    # (model/mlp.py imports tensorflow.python.keras.layers), so
    # model.trainable_variables is empty under TF 2.21; enumerate the
    # variables directly and run the reference train_step's exact
    # compute (outer tape + gradient + apply, model/query_sat.py:380-391)
    # with a plain SGD apply (optimizer slot cost is negligible at ~857k
    # params and the reference's AdaBelief needs tensorflow_addons).
    train_vars = []
    for name in ("update_gate", "variables_output", "variables_query",
                 "clause_mlp", "lit_mlp"):
        for layer in getattr(model, name).dense_layers:
            train_vars += [layer.kernel, layer.bias]

    @tf.function
    def bench_train_step(adj, cg, vg, solutions):
        with tf.GradientTape() as tape:
            _, loss, step = model.call(adj, cg, vg, training=True,
                                       labels=solutions.flat_values)
        grads = tape.gradient(loss, train_vars)
        for v, g in zip(train_vars, grads):
            if g is not None:
                v.assign_sub(1e-3 * g)
        return loss

    for b in tf_batches:  # trace each shape
        loss = bench_train_step(*b)
    _ = float(loss.numpy())

    t0 = time.perf_counter()
    for _ in range(args.cycles):
        for b in tf_batches:
            loss = bench_train_step(*b)
    _ = float(loss.numpy())
    tf_dt = (time.perf_counter() - t0) / (args.cycles * len(tf_batches))
    print(f"tf reference: {tf_dt * 1e3:.1f} ms/step", flush=True)

    result = {
        "metric": "measured_reference_baseline",
        "host": "cpu",
        "budget": args.budget,
        "rounds": args.rounds,
        "n_batches": len(packed),
        "edges": int(np.mean(edge_counts)),
        "tf_ref_cpu_ms_per_step": round(tf_dt * 1e3, 1),
        "tf_ref_cpu_edges_per_sec": round(
            np.mean(edge_counts) * 2 * args.rounds / tf_dt, 0),
    }

    # ---------------- our JAX train step, same host ----------------
    if not args.skip_jax:
        import jax
        import jax.numpy as jnp

        from diffusionsat_tpu.models.query_sat import (
            QuerySATConfig, query_sat_init)
        from diffusionsat_tpu.train.adabelief import adabelief
        from diffusionsat_tpu.train.loop import TrainState, make_train_step

        cfg = QuerySATConfig(train_rounds=args.rounds,
                             test_rounds=args.rounds)
        params = query_sat_init(jax.random.key(0), cfg)
        opt_j = adabelief(learning_rate=1e-3)
        state = TrainState(params=params, opt_state=opt_j.init(params),
                           step=jnp.zeros((), jnp.int32),
                           key=jax.random.key(1))
        step = make_train_step(cfg, opt_j)
        batches = [b for b, _, _, _ in packed]
        for b in batches:
            state, out = step(state, b)
        float(out["loss"])
        t0 = time.perf_counter()
        for _ in range(args.cycles):
            for b in batches:
                state, out = step(state, b)
        float(out["loss"])
        jax_dt = (time.perf_counter() - t0) / (args.cycles * len(batches))
        print(f"jax (flat, same host): {jax_dt * 1e3:.1f} ms/step",
              flush=True)
        result["jax_cpu_ms_per_step"] = round(jax_dt * 1e3, 1)
        result["jax_over_tf_speedup"] = round(tf_dt / jax_dt, 2)

    print(json.dumps(result))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    return result


if __name__ == "__main__":
    main()
