"""Benchmark: QuerySAT training throughput on the attached accelerator.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ...,
"vs_baseline": N}. The metric is message-passing edge throughput
(edges/s/chip) over the full jitted train step at the reference's standard
workload: hard 3-SAT packed to the 20k node budget, 32 rounds (reference
config.py:24-35, model/query_sat.py:89), *size-sorted* packing exactly as
the reference pipeline batches instances (reference data/dimac.py:267),
executed on the dense per-graph block path with quantized per-batch block
dims (graph/dense_batch.py) — the layout and batch stream the flagship
training driver runs on this workload. The bench cycles through the
packed batches like a training epoch and reports aggregate edge
throughput.

Roofline note (v5e, measured round 2): the dense step turns every graph
aggregation into batched matmuls, so the old "SpMM speed-of-light" framing
collapses into plain matmul efficiency. At ~86 ms/step on the mixed-batch
variant the step sustained ~19 TFLOP/s of matmul work, ~40% of the chip's
f32 matmul peak (~49 TFLOP/s) — the residual gap is small-row matmuls and
the elementwise round body, not memory traffic. Ablations incl. the
single mixed batch and the flat edge-list path: benchmarks/bench_dense.py.

vs_baseline: the reference TF2 code publishes no numbers (BASELINE.md);
the baseline constant is an estimate of the reference's T4 step rate
(~3.5 steps/s -> ~1e7 edge traversals/s) kept fixed across rounds for
comparability. Since round 3 the output also carries a MEASURED anchor
when benchmarks/bench_tf_reference.py has been run: the actual reference
implementation's step time on this host's CPU (TF 2.21) on identical
batches, and the same-host JAX step time — a software-vs-software ratio
with no estimated hardware constant in it.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def _mlp_row_macs(cfg):
    """Per-round matmul MACs per (var row, clause row) — shared by the
    padded-FLOPs and useful-work accountings so they can't diverge."""
    f, q, h = cfg.feature_maps, cfg.query_maps, cfg.logit_maps
    v1 = f + 4 + cfg.label_channels
    var_macs = sum({
        "query": v1 * int(q * cfg.query_scale) + int(q * cfg.query_scale) * q,
        "lit": v1 * 4 * q + (4 * q) ** 2 // 4 + 4 * q * 2 * q,
        "update": (q + v1 + 2 * q) * int(f * cfg.update_scale)
        + int(f * cfg.update_scale) ** 2
        + int(f * cfg.update_scale) * f,
        "out": f * int(f * cfg.output_scale) + int(f * cfg.output_scale) * h,
    }.values())
    clause_macs = (f + 2 * q) * int(f * cfg.clauses_scale) \
        + int(f * cfg.clauses_scale) ** 2 \
        + int(f * cfg.clauses_scale) * (f + q)
    return var_macs, clause_macs


def _matmul_macs(cfg, G, Vg, Cg):
    """Per-round matmul MAC count for one dense block shape (padded —
    what the MXU actually executes, incl. zero rows/cols)."""
    q = cfg.query_maps
    var_macs, clause_macs = _mlp_row_macs(cfg)
    einsum_macs = 4 * G * Cg * 2 * Vg * q
    return G * Vg * var_macs + G * Cg * clause_macs + einsum_macs


def _useful_macs(cfg, n_vars, n_clauses, n_edges):
    """Per-round USEFUL matmul MACs: MLP rows at actual (unpadded) var and
    clause counts, incidence einsums at fill=100% (each real edge
    contributes q MACs to each of the 4 incidence einsums). This is the
    speed-of-light numerator VERDICT r3 item 3 asked for: the work a
    perfect layout would do, independent of padding/quantization."""
    q = cfg.query_maps
    var_macs, clause_macs = _mlp_row_macs(cfg)
    einsum_macs = 4 * n_edges * q
    return n_vars * var_macs + n_clauses * clause_macs + einsum_macs


def main():
    import os

    from diffusionsat_tpu.data.bench_workloads import (
        threshold_3sat_batch, threshold_3sat_batches_sorted)
    from diffusionsat_tpu.graph.batch import BucketSpec
    from diffusionsat_tpu.graph.dense_batch import densify_batches_quantized
    from diffusionsat_tpu.models.query_sat import (
        QuerySATConfig, query_sat_init)
    from diffusionsat_tpu.models.query_sat_dense import query_sat_dense_apply
    from diffusionsat_tpu.ops import dense_ops
    from diffusionsat_tpu.train.adabelief import adabelief
    from diffusionsat_tpu.train.loop import (
        TrainState, make_train_step, make_train_step_for)

    profile_dir = os.environ.get("DSAT_PROFILE_DIR")

    rng = np.random.default_rng(0)
    # workload: the reference's 20k default budget (config.py:35), the
    # r1-r5 continuity basis AND the throughput winner once batches are
    # device-cached: 87.7 M edges/s at 20k vs 74.4 M at the 60k budget
    # (BENCH_20K_DEVCACHE_r05 / BENCH_60K_FULLPACK, both median-of-5).
    # The 60k budget ("for more advanced cards", reference README.md:28)
    # remains the better TRAINING configuration per wall-clock
    # (CONV_20K_VS_60K: 81.8% vs 72.1% solved at 1500 steps for ~18%
    # more wall time) — larger batches buy gradient quality, not raw
    # edge throughput. DSAT_BENCH_NODES=60000 benches that budget.
    node_budget = int(os.environ.get("DSAT_BENCH_NODES", "20000"))
    n_batches = 6
    # scale the graph cap with the budget: at 60k nodes the historical
    # 512-graph cap binds for small-var size-sorted batches (a 8-var
    # graph is ~51 nodes -> ~1200 graphs fill the budget), silently
    # under-packing the workload the bench claims to measure
    max_graphs = int(os.environ.get("DSAT_BENCH_MAXGRAPHS",
                                    str(max(512, node_budget // 40))))
    packed = threshold_3sat_batches_sorted(rng, node_budget, n_batches,
                                           max_graphs=max_graphs)

    # full-size: 128 feature/query maps, 32 rounds. Block-level bf16 is
    # the default (2.34x on the mixed batch, BENCH_BLOCKBF16_r03.json, at
    # matched 3000-step convergence); DSAT_BLOCK_BF16=0 benches f32.
    cfg = QuerySATConfig(
        block_bf16=os.environ.get("DSAT_BLOCK_BF16", "1") == "1")
    params = query_sat_init(jax.random.key(0), cfg)
    opt = adabelief(learning_rate=1e-3)
    state = TrainState(params=params, opt_state=opt.init(params),
                       step=jnp.zeros((), jnp.int32), key=jax.random.key(1))

    # dense per-graph block path with quantized per-batch dims (the
    # flagship training configuration); flat fallback off-TPU or if a
    # graph exceeds the block dims
    variant = "dense"
    try:
        dense_ops.INCIDENCE_PRECISION = jax.lax.Precision.DEFAULT
        denses = densify_batches_quantized([b for b, _ in packed])
        train_step = make_train_step_for(query_sat_dense_apply, cfg, opt)
        bench_batches = denses
        edge_counts = [e for _, e in packed]
    except ValueError:
        variant = "flat"
        bucket = BucketSpec.for_node_budget(node_budget,
                                            max_graphs=max_graphs)
        batch, real_edges = threshold_3sat_batch(rng, node_budget,
                                                 bucket=bucket)
        train_step = make_train_step(cfg, opt)
        bench_batches = [batch]
        edge_counts = [real_edges]

    # DSAT_MEGA_STEPS=N (dense only): scan N steps per dispatch — one
    # tunnel RPC instead of N (train/loop.make_scanned_train_step_for;
    # bit-identical trajectory, tests/test_mega_step.py). Each bench
    # batch is stacked with itself N times, so per-step compute is
    # unchanged and the delta isolates dispatch overhead. Default 8
    # since round 5 (the recommended production flag for dense streams,
    # diffusion_training --mega_steps): +9% at 20k (26.7 -> 24.5 ms)
    # AND it collapses the tunnel's window-to-window jitter from
    # mde ~9-30% to ~0.1% (BENCH_DISPATCH_LADDER_r05.jsonl) — per-step
    # dispatch RPCs were the jitter source all along. DSAT_MEGA_STEPS=0
    # restores per-step dispatch for continuity readings.
    steps_per_call = 1
    mega_n = int(os.environ.get("DSAT_MEGA_STEPS", "8"))
    if mega_n > 1 and variant == "dense":
        from diffusionsat_tpu.train.loop import (
            make_scanned_train_step_for, stack_batches)
        train_step = make_scanned_train_step_for(query_sat_dense_apply,
                                                 cfg, opt)
        bench_batches = [stack_batches([b] * mega_n)
                         for b in bench_batches]
        steps_per_call = mega_n
        variant = f"dense_mega{mega_n}"

    # device-cache the batch stream up-front, matching the production
    # training configuration (diffusion_training.py device_puts every
    # batch ONCE; re-uploading per dispatch both leaks tunnel host memory
    # and pays per-step transfer — the flagship driver measured ~30%
    # faster device-cached). DSAT_BENCH_DEVICE_CACHE=0 restores the old
    # upload-per-step basis for continuity readings.
    if (jax.default_backend() == "tpu"
            and os.environ.get("DSAT_BENCH_DEVICE_CACHE", "1") == "1"):
        _dev = jax.devices()[0]
        bench_batches = [jax.device_put(b, _dev) for b in bench_batches]

    # warmup / compile each shape; NB fetch a value to the host — through
    # the axon tunnel block_until_ready alone does not wait for execution.
    # Two warm passes: the tunnel runs the FIRST dispatches of a freshly
    # compiled executable slow (server-side warmup beyond compile), which
    # contaminated single-warm readings (BENCH_BF16_r03 45.75 ms vs the
    # 2-warm steady state).
    for _ in range(2):
        for b in bench_batches:
            state, out = train_step(state, b)
        float(out["loss"])

    # steady-state pipelined throughput over the batch stream: steps chain
    # through the state dependency; one host sync at the end covers the
    # whole chain. The tunnel's service rate drifts minute-to-minute
    # (identical f32 config read 29.4 and 43.3 ms 35 min apart on one
    # machine; round-3 spread was +/-1.5x). Protocol since round 4
    # (VERDICT r3 item 9): time >=5 windows and report the MEDIAN as the
    # headline, with the full window list, the spread, and the minimum
    # detectable effect (half the relative range) — any cross-config
    # difference below `mde_pct` is unresolvable under this protocol.
    # `best_window` is kept for continuity with rounds 1-3 (best-of-3).
    if profile_dir:  # optional jax.profiler trace (DSAT_PROFILE_DIR=...)
        try:
            jax.profiler.start_trace(profile_dir)
        except Exception as e:
            print(f"profiler unavailable: {e}")
            profile_dir = None
    cycles = 4
    n_windows = int(os.environ.get("DSAT_BENCH_WINDOWS", "5"))
    n_steps = cycles * len(bench_batches) * steps_per_call
    window_dts = []
    for w in range(n_windows):
        t0 = time.perf_counter()
        for _ in range(cycles):
            for b in bench_batches:
                state, out = train_step(state, b)
        float(out["loss"])
        float(jnp.sum(jax.tree.leaves(state.params)[0]))
        window_dts.append((time.perf_counter() - t0) / n_steps)
        if w == 0 and profile_dir:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
            profile_dir = None
    dt = float(np.median(window_dts))

    rounds = cfg.train_rounds
    # each round moves every edge 2x (lit->clause, clause->lit) in fwd,
    # and again in bwd; count fwd message-passing edge traversals only
    edges_per_step = sum(edge_counts) / len(edge_counts) * 2 * rounds
    edges_per_sec = edges_per_step / dt

    # reference-equivalent estimate (the reference publishes no numbers,
    # BASELINE.md): TF2 on a T4 at this workload ~3.5 steps/s -> ~1e7
    # edge traversals/s. Kept fixed across rounds for comparability.
    baseline_edges_per_sec = 1.0e7

    out = {
        "metric": "train_edge_throughput",
        "value": round(edges_per_sec / 1e6, 3),
        "unit": "M edge-traversals/s/chip",
        "vs_baseline": round(edges_per_sec / baseline_edges_per_sec, 3),
        "step_time_ms": round(dt * 1e3, 2),          # median of windows
        "window_ms": [round(d * 1e3, 2) for d in window_dts],
        "best_window_ms": round(min(window_dts) * 1e3, 2),
        "window_protocol": f"median-of-{len(window_dts)}",
        # minimum detectable effect: half the relative range of the
        # windows — differences below this are tunnel noise, not signal
        "mde_pct": round(100 * (max(window_dts) - min(window_dts))
                         / (2 * dt), 1),
        "variant": variant,
        "packing": "size-sorted" if variant.startswith("dense") else "mixed",
        "edges": int(sum(edge_counts) / len(edge_counts)),
        "vars": int(np.mean([int(b.n_vars) for b, _ in packed])) if
        variant.startswith("dense") else int(bench_batches[0].n_vars),
        "clauses": int(np.mean([int(b.n_clauses) for b, _ in packed])) if
        variant.startswith("dense") else int(bench_batches[0].n_clauses),
        "graphs": int(np.mean([int(b.n_graphs) for b, _ in packed])) if
        variant.startswith("dense") else int(bench_batches[0].n_graphs),
        "rounds": rounds,
    }
    # measured reference anchor (benchmarks/bench_tf_reference.py): the
    # actual TF2 reference step time on this host's CPU, same batches
    try:
        with open("BENCH_TF_REF.json") as f:
            ref = json.load(f)
        out["tf_ref_cpu_ms_per_step"] = ref["tf_ref_cpu_ms_per_step"]
        out["vs_tf_ref_same_host_cpu"] = round(
            edges_per_sec / max(ref["tf_ref_cpu_edges_per_sec"], 1.0), 1)
    except (FileNotFoundError, KeyError):
        pass
    # v5e matmul peaks: ~49 TFLOP/s f32, ~197 TFLOP/s bf16
    peak = 197e12 if cfg.block_bf16 else 49e12
    if variant == "dense":
        out["shapes"] = sorted({(d.G, d.Vg, d.Cg) for d in denses})
        # matmul roofline accounting (see module docstring): padded FLOPs
        # = what the MXU executes, including zero rows/cols
        macs = sum(_matmul_macs(cfg, d.G, d.Vg, d.Cg) for d in denses) \
            / len(denses)
        flops_per_step = macs * 2 * rounds * 3  # fwd + ~2x bwd
        out["matmul_tflops_per_step"] = round(flops_per_step / 1e12, 3)
        out["sustained_tflops"] = round(flops_per_step / dt / 1e12, 2)
        out["matmul_peak_basis"] = "bf16" if cfg.block_bf16 else "f32"
        out["pct_matmul_peak"] = round(
            100 * flops_per_step / dt / peak, 1)
    # speed-of-light accounting (VERDICT r3 item 3): useful work only —
    # MLP rows at actual var/clause counts, incidence einsums at
    # fill=100% (q MACs per real edge per einsum). The HBM term is
    # negligible at these sizes: the whole working set (var/clause states
    # ~5 MB at 20k nodes, params 1.7 MB bf16) fits in v5e VMEM (128 MB),
    # so an ideal implementation is pure-FLOPs-bound; SOL time = useful
    # FLOPs / bf16 peak. pct_of_sol is the honest efficiency number —
    # pct_matmul_peak's denominator counts padded zero-multiplies as work.
    useful_macs = float(np.mean([
        _useful_macs(cfg, int(b.n_vars), int(b.n_clauses), e)
        for b, e in packed]))
    useful_flops_per_step = useful_macs * 2 * rounds * 3
    sol_s = useful_flops_per_step / 197e12
    out["useful_tflops_per_step"] = round(useful_flops_per_step / 1e12, 4)
    out["sol_ms_per_step"] = round(sol_s * 1e3, 3)
    out["pct_of_sol"] = round(100 * sol_s / dt, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
