"""DiffusionSAT training entry point.

The analog of reference `diffusion_training.py:31-499`: QuerySAT +
diffusion-labeled hard 3-SAT, AdaBelief with cosine decay, periodic eval
and checkpointing. Run:

    python diffusion_training.py --train_steps 10000 --max_vars 30
"""

from __future__ import annotations

import sys
import time
from dataclasses import asdict as dataclasses_asdict

import numpy as np

import jax
import jax.numpy as jnp

from diffusionsat_tpu.config import RunConfig, parse_config
from diffusionsat_tpu.data.datasets import SatDataset
from diffusionsat_tpu.data.generators import (
    DiffusionSatInstances,
    KSatInstances,
    SAT3Instances,
)
from diffusionsat_tpu.graph.batch import BucketSpec
from diffusionsat_tpu.models.query_sat import QuerySATConfig, query_sat_init
from diffusionsat_tpu.train.adabelief import adabelief, cosine_decay_schedule
from diffusionsat_tpu.train.checkpoint import CheckpointManager
from diffusionsat_tpu.train.loop import (
    TrainState,
    evaluate_metrics,
    make_planned_train_step,
    make_train_step,
    train,
)
from diffusionsat_tpu.train.metrics import SATAccuracy, StepStatistics


def build_dataset(cfg: RunConfig) -> SatDataset:
    if cfg.use_hard_3sat:
        base = SAT3Instances(min_vars=cfg.min_vars, max_vars=cfg.max_vars,
                             train_size=cfg.train_size,
                             test_size=cfg.test_size, seed=cfg.seed)
    else:
        base = KSatInstances(
            min_vars=cfg.min_vars, max_vars=cfg.max_vars,
            train_size=cfg.train_size, test_size=cfg.test_size,
            desired_multiplier_for_the_number_of_solutions=(
                cfg.desired_multiplier_for_the_number_of_solutions),
            seed=cfg.seed)
    instances = DiffusionSatInstances(base, use_unigen=cfg.use_unigen,
                                      seed=cfg.seed,
                                      n_label_samples=cfg.label_samples)
    bucket = BucketSpec.for_node_budget(cfg.max_nodes_per_batch)
    name = (f"diffusion_{'3sat' if cfg.use_hard_3sat else 'ksat'}_"
            f"{cfg.min_vars}_{cfg.max_vars}_{cfg.train_size}")
    if cfg.label_samples > 1:  # multi-label cache is a different schema
        name += f"_k{cfg.label_samples}"
    return SatDataset(instances, bucket, cache_dir=cfg.data_dir, name=name,
                      force_data_gen=cfg.force_data_gen, seed=cfg.seed)


def main(argv=None):
    cfg = parse_config(argv)
    if cfg.eager:
        jax.config.update("jax_disable_jit", True)
        jax.config.update("jax_debug_nans", True)

    import os as _os
    model_cfg = QuerySATConfig(
        feature_maps=cfg.feature_maps, query_maps=cfg.query_maps,
        train_rounds=cfg.train_rounds, test_rounds=cfg.test_rounds,
        logit_maps=cfg.logit_maps, noise_skew=cfg.noise_skew,
        label_isolation_alpha=cfg.label_isolation_alpha,
        # block-level bf16 on the dense path: 2.34x step speedup
        # (BENCH_BLOCKBF16_r03) at matched convergence (3000-step paired
        # sanity, runs_sanity/*bf16ctl*: loss curves statistically
        # identical). Default ON; DSAT_BLOCK_BF16=0 reverts to f32.
        # The flat eval/predict path stays f32 regardless.
        block_bf16=_os.environ.get("DSAT_BLOCK_BF16", "1") == "1")

    lr = cosine_decay_schedule(cfg.initial_learning_rate, cfg.train_steps,
                               cfg.cosine_alpha) if cfg.use_cosine_decay \
        else cfg.learning_rate
    optimizer = adabelief(learning_rate=lr, eps=1e-8, clip_gradients=True)

    # materialize the dataset before touching the accelerator (data gen is
    # pure host work) and build params on CPU — the per-op latency of a
    # remote accelerator makes many tiny init ops expensive
    dataset = build_dataset(cfg)
    train_data = dataset.train_data()
    test_data = dataset.test_data()
    print(f"train batches: {len(train_data)}, test batches: {len(test_data)}",
          flush=True)
    if cfg.train_batch_limit > 0:
        train_data.batches = train_data.batches[:cfg.train_batch_limit]
        print(f"train batches limited to first {len(train_data)}",
              flush=True)
    if cfg.label_logit_table:
        # closed-loop per-solution reweighting: compose alpha*isolation +
        # beta*(-log freq_hat) from a measured table into the per-row
        # logit channel; the step consumes it with isolation_alpha=1.0
        # (uniformity/reweight.py)
        if cfg.label_samples <= 1:
            raise SystemExit("--label_logit_table requires a "
                             "multi-label bank (--label_samples > 1)")
        from diffusionsat_tpu.uniformity.reweight import attach_logit_table
        t0 = time.time()
        with np.load(cfg.label_logit_table) as z:
            table = dict(z)
        n_meas = attach_logit_table(train_data.batches, table,
                                    cfg.label_isolation_alpha,
                                    cfg.label_reweight_beta)
        import dataclasses as _dc
        model_cfg = _dc.replace(model_cfg, label_isolation_alpha=1.0)
        print(f"label logits attached: {n_meas}/{len(train_data)} batches "
              f"measured (alpha={cfg.label_isolation_alpha}, "
              f"beta={cfg.label_reweight_beta}) in {time.time() - t0:.0f}s",
              flush=True)
    elif cfg.label_isolation_alpha != 0.0:
        if cfg.label_samples <= 1:
            raise SystemExit("--label_isolation_alpha requires a "
                             "multi-label bank (--label_samples > 1)")
        from diffusionsat_tpu.graph.batch import attach_label_isolation
        t0 = time.time()
        train_data.batches = [attach_label_isolation(b)
                              for b in train_data.batches]
        print(f"label isolation attached to {len(train_data)} batches "
              f"in {time.time() - t0:.0f}s", flush=True)

    with jax.default_device(jax.devices("cpu")[0]):
        params = query_sat_init(jax.random.key(cfg.seed), model_cfg)
        state = TrainState(params=params, opt_state=optimizer.init(params),
                           step=jnp.zeros((), jnp.int32),
                           key=jax.random.key(cfg.seed + 1))
    state = jax.device_put(state, jax.devices()[0])

    run_dir = cfg.run_dir()
    run_dir.mkdir(parents=True, exist_ok=True)
    # persist the exact run configuration (reference hparams logging,
    # utils/parameters_log.py:1-10)
    import json as _json
    (run_dir / "config.json").write_text(
        _json.dumps(dataclasses_asdict(cfg), indent=1, default=str))
    ckpt_dir = cfg.restore if cfg.restore else run_dir / "ckpt"
    mgr = CheckpointManager(ckpt_dir, max_to_keep=cfg.ckpt_count)
    restored = mgr.restore(state)
    if restored is not None:
        state = restored
        print(f"Restored from step {int(state.step)}")
    elif cfg.init_npz:
        from diffusionsat_tpu.train.checkpoint import load_params
        warm, meta = load_params(cfg.init_npz)
        state = state.replace(params=jax.device_put(warm, jax.devices()[0]))
        print(f"Warm-started params from {cfg.init_npz} (meta: {meta})",
              flush=True)

    # Execution layout: dense per-graph blocks (the MXU fast path —
    # 86-115 vs 228 ms/step measured at the 20k-node workload) when every
    # graph fits the block dims; else Pallas-plan SpMM on TPU; else XLA.
    from diffusionsat_tpu.data.datasets import PackedBatches
    from diffusionsat_tpu.train.loop import (
        make_diagnostics_step, make_train_step_for)

    train_stream = train_data
    diag_apply = None
    mega_chunks = None
    diag_host_batch = None
    if cfg.dense:
        try:
            from diffusionsat_tpu.graph.dense_batch import (
                densify_batches_quantized)
            from diffusionsat_tpu.models.query_sat_dense import (
                query_sat_dense_apply)
            from diffusionsat_tpu.ops import dense_ops
            dense_ops.INCIDENCE_PRECISION = {
                "highest": jax.lax.Precision.HIGHEST,
                "high": jax.lax.Precision.HIGH,
                "default": jax.lax.Precision.DEFAULT,
            }[cfg.incidence_precision]
            # hybrid dispatch: densify only the batches that fit the
            # block tables AND are below the dense/flat crossover.
            # MEASURED (BENCH_REF_REGIME, two-pass steady-state timing):
            # dense wins at EVERY size up to the 30-100-var reference
            # regime — 42-58 ms vs flat's ~198 ms (4.3-5.7x) even at ~1%
            # incidence fill, because batched MXU matmuls beat the
            # gather/segment fabric regardless of padding. Default cutoff
            # = the block-table capacity (128 vars); beyond the table the
            # O(Vg*Cg) incidence blocks genuinely blow up (SHA-1 CNFs)
            # and the flat path takes over. DSAT_DENSE_MAX_VARS=0
            # disables the size cutoff (table capacity still applies).
            import os as _os
            dense_max_vars = int(_os.environ.get("DSAT_DENSE_MAX_VARS",
                                                 "128"))
            dense_batches, flat_rest = [], []
            for b in train_data.batches:
                maxv = int(np.max(np.asarray(b.n_vars_per_graph),
                                  initial=1))
                if dense_max_vars and maxv > dense_max_vars:
                    flat_rest.append(b)
                    continue
                try:
                    dense_batches.extend(densify_batches_quantized([b]))
                except ValueError:
                    flat_rest.append(b)
            if not dense_batches:
                raise ValueError("no batch fits the dense block tables")
            # over-cutoff batches run the flat step; give them the same
            # Pallas-planned SpMM the dedicated flat path uses. Plans are
            # host-built from the numpy batches BEFORE device placement
            # (building from device-resident arrays would round-trip the
            # tunnel); index order is preserved across device_put below.
            flat_plans = None
            if flat_rest and jax.default_backend() == "tpu":
                # flat execution backend for over-cutoff graphs:
                # block-sparse tiles are the measured best everywhere
                # (BENCH_FLAT_TILED: 1.17x on SHA-1 CNFs, 1.62x on
                # SATLIB-scale vs flat XLA; Pallas plans read 1.02-1.04x)
                # — default tiled, DSAT_FLAT_BACKEND=pallas|xla reverts
                backend = _os.environ.get("DSAT_FLAT_BACKEND", "tiled")
                if backend == "tiled":
                    from diffusionsat_tpu.ops.tiled_ops import (
                        build_tiled_incidence)
                    flat_plans = [build_tiled_incidence(b)
                                  for b in flat_rest]
                elif backend == "pallas":
                    from diffusionsat_tpu.ops.pallas_segsum import (
                        build_batch_plans)
                    plans = [build_batch_plans(b) for b in flat_rest]
                    if all(p is not None for p in plans):
                        flat_plans = plans
            # mega-steps: stack same-shape batches into N-step chunks on
            # the HOST (stacking device-resident arrays would fetch them
            # back through the tunnel), one lax.scan dispatch per chunk
            if (cfg.mega_steps > 1 and not cfg.self_supervised
                    and cfg.n_devices == 1 and not flat_rest):
                from diffusionsat_tpu.train.loop import stack_batches
                groups: dict = {}
                for b in dense_batches:
                    k = (b.G, b.Vg, b.Cg, b.solutions_k is not None,
                         getattr(b, "label_isolation_k", None) is not None)
                    groups.setdefault(k, []).append(b)
                diag_host_batch = dense_batches[0]
                mega_chunks = []
                for bs in groups.values():
                    for i in range(0, len(bs), cfg.mega_steps):
                        mega_chunks.append(
                            stack_batches(bs[i:i + cfg.mega_steps]))
                dense_batches = mega_chunks
                print(f"mega-steps: {len(mega_chunks)} chunks "
                      f"(<= {cfg.mega_steps} steps/dispatch, "
                      f"{len(groups)} shape groups)", flush=True)
            elif cfg.mega_steps > 1:
                print("WARNING: --mega_steps needs a dense-only, "
                      "single-device, supervised stream; ignored",
                      flush=True)

            # pre-place every training batch on the device ONCE: repeated
            # per-step host->device uploads through the axon tunnel leak
            # host memory (~4 MB/step — the 167k flagship run was
            # OOM-killed at step 31k, kernel log 2026-08-17), and the
            # whole dataset is only ~2 GB of HBM
            if cfg.n_devices == 1 and jax.default_backend() == "tpu":
                dev = jax.devices()[0]
                dense_batches = [jax.device_put(b, dev)
                                 for b in dense_batches]
                flat_rest = [jax.device_put(b, dev) for b in flat_rest]
                print("train batches device-cached", flush=True)
            elif cfg.n_devices > 1 and jax.default_backend() == "tpu":
                # DP re-uploads host batches per step; through the axon
                # tunnel that leaks ~uploaded-bytes of host memory per
                # device_put (CLAUDE.md) — fine for short runs, OOM risk
                # on 100k+-step runs until per-device caching lands
                print("WARNING: DP path uploads batches per step; long "
                      "runs on the tunneled TPU leak host memory",
                      flush=True)
            train_stream = PackedBatches(dense_batches, seed=cfg.seed)
            if cfg.self_supervised:
                from diffusionsat_tpu.train.loop import (
                    make_selfsupervised_train_step)
                train_step = make_selfsupervised_train_step(
                    model_cfg, optimizer, apply_fn=query_sat_dense_apply)
                if flat_rest:
                    print(f"WARNING: self-supervised step is dense-only; "
                          f"{len(flat_rest)} over-cutoff batches excluded",
                          flush=True)
            elif mega_chunks is not None:
                from diffusionsat_tpu.train.loop import (
                    make_scanned_train_step_for)
                train_step = make_scanned_train_step_for(
                    query_sat_dense_apply, model_cfg, optimizer)
            if mega_chunks is None and not cfg.self_supervised:
                dense_step = make_train_step_for(query_sat_dense_apply,
                                                 model_cfg, optimizer)
                if flat_rest:
                    from diffusionsat_tpu.graph.dense_batch import (
                        DenseSatBatch)
                    if flat_plans is not None:
                        planned = make_planned_train_step(model_cfg,
                                                          optimizer)
                        plan_by_id = {id(b): p for b, p in
                                      zip(flat_rest, flat_plans)}

                        def flat_step(state, batch):
                            return planned(state, batch,
                                           plan_by_id[id(batch)])
                    else:
                        flat_step = make_train_step(model_cfg, optimizer)

                    def train_step(state, batch):
                        if isinstance(batch, DenseSatBatch):
                            return dense_step(state, batch)
                        return flat_step(state, batch)
                else:
                    train_step = dense_step
            diag_apply = query_sat_dense_apply
            if flat_rest and not cfg.self_supervised:
                train_stream = PackedBatches(
                    list(dense_batches) + list(flat_rest), seed=cfg.seed)
                print(f"hybrid dispatch: {len(dense_batches)} dense + "
                      f"{len(flat_rest)} flat batches "
                      f"(cutoff {dense_max_vars} vars)", flush=True)
            if mega_chunks is None:
                shapes = sorted({(d.G, d.Vg, d.Cg) for d in dense_batches})
                print(f"dense layout shapes (G, Vg, Cg): {shapes}",
                      flush=True)
        except ValueError as e:
            print(f"dense layout unavailable ({e}); flat path", flush=True)
            cfg = __import__("dataclasses").replace(cfg, dense=False)
    if not cfg.dense:
        # Pallas-plan SpMM path: plans precomputed per batch on the host
        plans_by_id = {}
        if jax.default_backend() == "tpu":
            from diffusionsat_tpu.ops.pallas_segsum import build_batch_plans
            for b in train_data.batches:
                plans_by_id[id(b)] = build_batch_plans(b)
        if cfg.self_supervised:
            from diffusionsat_tpu.train.loop import (
                make_selfsupervised_train_step)
            train_step = make_selfsupervised_train_step(model_cfg,
                                                        optimizer)
        elif plans_by_id and all(p is not None
                                 for p in plans_by_id.values()):
            planned = make_planned_train_step(model_cfg, optimizer)

            def train_step(state, batch):
                return planned(state, batch, plans_by_id[id(batch)])
        else:
            train_step = make_train_step(model_cfg, optimizer)

    # data parallelism: wrap the chosen layout's apply in the DP step and
    # feed device-stacked batch groups (parallel/dp.py; VERDICT item 4)
    data_stream = train_stream.repeat_shuffled()
    if cfg.n_devices > 1 and cfg.self_supervised:
        raise SystemExit("--self_supervised is single-device for now "
                         "(the DP step wraps the plain supervised loss)")
    if cfg.n_devices > 1:
        from diffusionsat_tpu.parallel.dp import (
            make_dp_train_step, stacked_stream)
        from diffusionsat_tpu.parallel.mesh import make_mesh
        if len(jax.devices()) < cfg.n_devices:
            raise SystemExit(
                f"--n_devices {cfg.n_devices} but only "
                f"{len(jax.devices())} devices visible (for CPU testing "
                f"set XLA_FLAGS=--xla_force_host_platform_device_count=N)")
        mesh = make_mesh(n_data=cfg.n_devices, n_graph=1)
        from jax.sharding import NamedSharding, PartitionSpec
        # replicate the train state across the mesh (it was placed on
        # device 0 above for the single-device path)
        state = jax.device_put(state, NamedSharding(mesh, PartitionSpec()))
        # DP stacks batches along a device axis: all stacked pytrees must
        # share a structure, so a hybrid dense+flat stream degrades to
        # its majority layout here
        dp_batches = train_stream.batches
        kinds = {type(b).__name__ for b in dp_batches}
        if len(kinds) > 1:
            from collections import Counter
            majority = Counter(type(b).__name__
                               for b in dp_batches).most_common(1)[0][0]
            dp_batches = [b for b in dp_batches
                          if type(b).__name__ == majority]
            print(f"WARNING: hybrid stream under DP; keeping only the "
                  f"{majority} batches ({len(dp_batches)})", flush=True)
        # the DP apply_fn must follow the surviving batches' layout: a
        # hybrid stream that degraded to its flat majority must not be
        # traced through the dense apply (SatBatch has no .incidence)
        dp_apply = (diag_apply
                    if type(dp_batches[0]).__name__ == "DenseSatBatch"
                    else None)
        if dp_apply is not None:
            train_step = make_dp_train_step(model_cfg, optimizer, mesh,
                                            apply_fn=dp_apply)
        else:
            train_step = make_dp_train_step(model_cfg, optimizer, mesh)
        data_stream = stacked_stream(dp_batches, cfg.n_devices,
                                     seed=cfg.seed)
        print(f"data-parallel over {cfg.n_devices} devices", flush=True)

    # periodic in-model diagnostics on a fixed train batch (reference
    # diffusion_training.py:297-317 summaries)
    diag_fn = make_diagnostics_step(
        model_cfg, diag_apply) if diag_apply is not None else \
        make_diagnostics_step(model_cfg)
    # under mega-steps the stream holds stacked chunks; diagnostics run
    # on a single (host-side) batch
    diag_batch = (diag_host_batch if diag_host_batch is not None
                  else train_stream.batches[0])

    # device-cache the eval batches for the same tunnel-leak reason
    eval_batches = list(test_data)[:8]
    if jax.default_backend() == "tpu":
        eval_batches = [jax.device_put(b, jax.devices()[0])
                        for b in eval_batches]

    def eval_fn(st):
        vals = evaluate_metrics(
            st.params, model_cfg, eval_batches,
            [SATAccuracy(), StepStatistics()], jax.random.key(99),
            max_batches=8)
        try:
            vals.update(diag_fn(st.params, diag_batch, jax.random.key(123)))
        except Exception as e:  # diagnostics must never kill the run
            vals["diag_error"] = str(e)
        return vals

    # TensorBoard sink next to the JSONL (reference tf.summary wiring,
    # diffusion_training.py:297-339 + utils/parameters_log.py)
    from diffusionsat_tpu.train.tb import TBWriter
    tb = TBWriter(run_dir / "tb")
    tb.hparams(dataclasses_asdict(cfg))

    # with mega-steps each train() iteration advances UP TO `mega_div`
    # real steps (trailing partial chunks advance fewer); the chunk-count
    # cap carries 2x headroom and target_step stops the loop at the real
    # optimizer-step budget (the r5 iso45full run under-ran 167k -> 127k
    # before this accounting fix)
    mega_div = cfg.mega_steps if mega_chunks is not None else 1
    remaining = max(cfg.train_steps - int(state.step), 0)
    state = train(
        state, train_step, data_stream,
        steps=-(-remaining * (2 if mega_div > 1 else 1) // mega_div),
        target_step=cfg.train_steps,
        eval_fn=eval_fn, eval_every=max(1, cfg.eval_every // mega_div),
        checkpoint_fn=mgr.save,
        ckpt_every=max(1, cfg.ckpt_every // mega_div),
        log_file=run_dir / "train_log.jsonl", tb_writer=tb)
    mgr.save(state)
    final = eval_fn(state)
    print(f"[final] {final}")
    return final


if __name__ == "__main__":
    main(sys.argv[1:])
