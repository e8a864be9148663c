"""ANFSAT training driver: SHA-1 preimage ANF systems.

The reference trains ANFSAT on cgen-generated SHA-1 ANF at 17 rounds with
2-20 free message bits (`/root/reference/data/sha_anf.py:24-27`); this
driver reproduces that task on the cgen-free encoder
(diffusionsat_tpu/data/sha_anf.py) at reference difficulty by default.

    python anf_training.py --rounds 17 --min_free_bits 2 --max_free_bits 20
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp

from diffusionsat_tpu.data.anf_datasets import AnfDataset
from diffusionsat_tpu.data.sha_anf import Sha1AnfInstances
from diffusionsat_tpu.graph.anf_batch import ANFBucket
from diffusionsat_tpu.models.anf_sat import (
    ANFSATConfig,
    anf_sat_apply,
    anf_sat_init,
)
from diffusionsat_tpu.train.adabelief import adabelief
from diffusionsat_tpu.train.checkpoint import CheckpointManager
from diffusionsat_tpu.train.loop import (
    TrainState,
    evaluate_metrics,
    make_train_step_for,
    train,
)
from diffusionsat_tpu.train.metrics import ANFAccuracy


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--rounds", type=int, default=17)
    p.add_argument("--min_free_bits", type=int, default=2)
    p.add_argument("--max_free_bits", type=int, default=20)
    p.add_argument("--train_size", type=int, default=2000)
    p.add_argument("--test_size", type=int, default=200)
    p.add_argument("--train_steps", type=int, default=1500)
    p.add_argument("--train_rounds", type=int, default=16)
    p.add_argument("--test_rounds", type=int, default=32)
    p.add_argument("--feature_maps", type=int, default=128)
    p.add_argument("--eval_every", type=int, default=250)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--cosine", action="store_true",
                   help="cosine-decay lr over train_steps (reference "
                        "schedule style, config.py:24)")
    p.add_argument("--restore", default="",
                   help="checkpoint dir to resume from (also keeps "
                        "saving there)")
    p.add_argument("--init_npz", default="",
                   help="warm-start params from a portable pretrained "
                        ".npz (train/checkpoint.export_params); optimizer "
                        "state and step start fresh. An orbax checkpoint "
                        "found via --restore/run dir takes priority, so "
                        "watchdog restarts resume rather than re-warm")
    p.add_argument("--free_input_upweight", type=float, default=1.0,
                   help="CE weight multiplier on free message-bit input "
                        "vars (the circuit's true degrees of freedom; "
                        "round-4 finding: their ~76%% accuracy vs ~93%% "
                        "overall bottlenecks input-anchored solving)")
    p.add_argument("--mega_steps", type=int, default=0,
                   help="N steps per device dispatch (lax.scan over "
                        "stacked batches — every ANF batch shares the "
                        "bucket's padded shape, so stacking is free); "
                        "removes N-1 tunnel RPCs per N steps. 0/1 = off")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--label", default="")
    p.add_argument("--train_dir", default="runs_anf")
    # bucket sized for 17-round instances (~4k vars / ~4.1k equations);
    # two instances per batch
    p.add_argument("--max_vars", type=int, default=8192)
    p.add_argument("--max_ands", type=int, default=16384)
    p.add_argument("--max_clauses", type=int, default=8704)
    p.add_argument("--max_edges", type=int, default=32768)
    p.add_argument("--max_graphs", type=int, default=8)
    args = p.parse_args(argv)

    inst = Sha1AnfInstances(
        rounds=args.rounds, min_free_bits=args.min_free_bits,
        max_free_bits=args.max_free_bits, train_size=args.train_size,
        test_size=args.test_size, seed=args.seed)
    bucket = ANFBucket(max_vars=args.max_vars, max_ands=args.max_ands,
                       max_clauses=args.max_clauses,
                       max_edges=args.max_edges,
                       max_graphs=args.max_graphs)
    name = (f"sha1anf_r{args.rounds}_fb{args.min_free_bits}_"
            f"{args.max_free_bits}_{args.train_size}")
    ds = AnfDataset(inst, bucket, name=name, seed=args.seed)
    train_batches = ds.train_data()
    test_batches = ds.test_data()
    assert train_batches, "no instance fits the bucket — raise the limits"
    if (args.free_input_upweight != 1.0
            and train_batches[0].free_input_mask is None):
        # cache predates the free_input_mask field; rebuild it once
        print("cache lacks free_input_mask; rebuilding", flush=True)
        ds.force_data_gen = True
        train_batches = ds.train_data()
        test_batches = ds.test_data()
        ds.force_data_gen = False
    print(f"train batches: {len(train_batches)}, "
          f"test batches: {len(test_batches)}", flush=True)

    cfg = ANFSATConfig(feature_maps=args.feature_maps,
                       query_maps=args.feature_maps,
                       train_rounds=args.train_rounds,
                       test_rounds=args.test_rounds,
                       free_input_upweight=args.free_input_upweight)
    if args.cosine:
        from diffusionsat_tpu.train.adabelief import cosine_decay_schedule
        lr = cosine_decay_schedule(initial_lr=args.lr,
                                   decay_steps=args.train_steps)
    else:
        lr = args.lr
    opt = adabelief(learning_rate=lr, clip_gradients=True)
    with jax.default_device(jax.devices("cpu")[0]):
        params = anf_sat_init(jax.random.key(args.seed), cfg)
        state = TrainState(params=params, opt_state=opt.init(params),
                           step=jnp.zeros((), jnp.int32),
                           key=jax.random.key(args.seed + 1))
    state = jax.device_put(state, jax.devices()[0])

    import time
    from pathlib import Path
    run_dir = Path(args.train_dir) / (
        f"anf_sat_r{args.rounds}{'_' + args.label if args.label else ''}_"
        + time.strftime("%Y%m%d_%H%M%S"))
    run_dir.mkdir(parents=True, exist_ok=True)
    ckpt_dir = Path(args.restore) if args.restore else run_dir / "ckpt"
    mgr = CheckpointManager(ckpt_dir, max_to_keep=2)
    restored = mgr.restore(state)
    if restored is not None:
        state = restored
        print(f"Restored from step {int(state.step)}", flush=True)
    elif args.init_npz:
        from diffusionsat_tpu.train.checkpoint import load_params
        warm, meta = load_params(args.init_npz)
        state = state.replace(params=jax.device_put(warm,
                                                    jax.devices()[0]))
        print(f"Warm-started params from {args.init_npz} "
              f"(meta: {meta})", flush=True)

    # mega-steps: chunk the (uniformly-shaped) batch stream into N-step
    # stacks on the HOST, before device placement
    mega_div = 1
    if args.mega_steps > 1:
        from diffusionsat_tpu.train.loop import stack_batches
        n = args.mega_steps
        train_batches = [stack_batches(train_batches[i:i + n])
                         for i in range(0, len(train_batches), n)]
        mega_div = n
        print(f"mega-steps: {len(train_batches)} chunks of <= {n} "
              f"steps/dispatch", flush=True)

    # tiled block-sparse membership aggregation (ops/tiled_ops.py): the
    # per-round segment SpMMs + anf_value_cplx angle sums run as batched
    # MXU matmuls over the non-empty incidence tiles. Host-built per
    # batch BEFORE device placement. Incompatible with --mega_steps
    # (plans are per-batch data, not stackable shapes).
    # default ON since the r5 measurement: r17 train step 111.6 -> 73.6 ms
    # (1.52x, BENCH_ANF_TILED.json); DSAT_ANF_TILED=0 reverts to the flat
    # segment path
    import os as _os
    tiled = _os.environ.get("DSAT_ANF_TILED", "1") == "1"
    tiles_list = None
    if tiled and args.mega_steps > 1:
        print("WARNING: DSAT_ANF_TILED ignored with --mega_steps > 1",
              flush=True)
        tiled = False
    if tiled:
        from diffusionsat_tpu.ops.tiled_ops import build_anf_tiles
        t0 = time.time()
        tiles_list = [build_anf_tiles(b) for b in train_batches]
        print(f"ANF tiles built for {len(tiles_list)} batches "
              f"({tiles_list[0].n_tiles} tiles on batch 0) in "
              f"{time.time() - t0:.0f}s", flush=True)

    # pre-place every batch on the device ONCE: per-step host->device
    # uploads through the axon tunnel leak host memory (~batch-size/step,
    # never released until process exit) and cost a round-trip each; the
    # whole packed ANF dataset is small relative to HBM
    if jax.default_backend() == "tpu":
        dev = jax.devices()[0]
        train_batches = [jax.device_put(b, dev) for b in train_batches]
        test_batches = [jax.device_put(b, dev) for b in test_batches]
        if tiles_list is not None:
            tiles_list = [jax.device_put(t, dev) for t in tiles_list]
        print("ANF batches device-cached", flush=True)

    if args.mega_steps > 1:
        from diffusionsat_tpu.train.loop import make_scanned_train_step_for
        step_fn = make_scanned_train_step_for(anf_sat_apply, cfg, opt)
    elif tiled:
        from diffusionsat_tpu.train.loop import make_planned_train_step_for
        planned = make_planned_train_step_for(anf_sat_apply, cfg, opt,
                                              plan_kw="tiles")

        def step_fn(state, pair):
            return planned(state, pair[0], pair[1])

        train_batches = list(zip(train_batches, tiles_list))
    else:
        step_fn = make_train_step_for(anf_sat_apply, cfg, opt)

    def eval_fn(st, max_batches=16):
        return evaluate_metrics(st.params, cfg, test_batches,
                                [ANFAccuracy()], jax.random.key(9),
                                max_batches=max_batches,
                                apply_fn=anf_sat_apply)

    remaining = max(args.train_steps - int(state.step), 0)
    state = train(state, step_fn, ds.repeat_shuffled(train_batches),
                  # 2x chunk headroom under mega-steps; target_step stops
                  # at the real optimizer-step budget (partial trailing
                  # chunks advance < mega_div steps each)
                  steps=-(-remaining * (2 if mega_div > 1 else 1)
                          // mega_div),
                  target_step=args.train_steps,
                  eval_fn=eval_fn,
                  eval_every=max(1, args.eval_every // mega_div),
                  checkpoint_fn=mgr.save,
                  ckpt_every=max(1, args.eval_every * 2 // mega_div),
                  log_file=run_dir / "train_log.jsonl")
    mgr.save(state)
    # the headline number: evaluate the FULL held-out set, not the
    # 16-batch in-training subsample
    final = eval_fn(state, max_batches=None)
    print(f"[final full-testset] {final}")
    return final


if __name__ == "__main__":
    main(sys.argv[1:])
