"""Measure per-bank-row sampling frequencies of the raw diffusion sampler
on its own TRAINING formulas — the measurement half of closed-loop
per-solution label reweighting (`diffusionsat_tpu/uniformity/reweight.py`).

For every cached training batch, runs the nofreeze reverse chain M times
(dense path, whole chain + bank matching on device — ONE host fetch of a
[K, ng] count matrix per dispatch chunk) and counts how often each
solutions_k bank row is emitted. Output npz carries, per batch i:
``counts_i`` [K, ng] int32, ``neglog_i`` [K, ng] f32 (shrunk, centered,
clamped -log frequency — the reweighting logits), ``sat_i`` / ``outside_i``
[ng] (SAT samples, SAT-but-not-in-bank samples), ``fingerprint_i``
(cache-alignment check). Parts are written incrementally so an
interrupted run resumes where it stopped.

    python measure_bank_freq.py --model_ckpt pretrained/..._iso45.npz \
        --chains 96 --out freq_iso45full.npz

Reference context: the raw sampler under measurement replicates
`/root/reference/satuniformity/DiffusionSampler.py:105-191` semantics
(nofreeze regime); the reference has no training-side corrective loop.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from pathlib import Path

# coarse dense blocks: 4 chain shapes to compile instead of ~24 fine ones.
# Block quantization only affects padding, not semantics; the frequency
# table is keyed to the FLAT cache batches, which are identical either way.
os.environ.setdefault("DSAT_FINE_BLOCKS", "0")

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_ckpt", required=True)
    p.add_argument("--chains", type=int, default=96,
                   help="samples per formula (one per reverse chain)")
    p.add_argument("--chunk", type=int, default=32,
                   help="chains per device dispatch")
    p.add_argument("--max_batches", type=int, default=0,
                   help="measure only the first N cache batches (0=all)")
    p.add_argument("--diffusion_steps", type=int, default=32)
    p.add_argument("--test_rounds", type=int, default=32)
    p.add_argument("--train_size", type=int, default=60000)
    p.add_argument("--label_samples", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tau", type=float, default=0.5)
    p.add_argument("--out", default="freq_table.npz")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    # dataset first (pure host work; the cache must exist — build with
    # build_3sat_cache.py --label_samples K, jax-free)
    from diffusionsat_tpu.config import RunConfig
    import diffusion_training as dt
    cfg_run = RunConfig(train_size=args.train_size, test_size=2000,
                        min_vars=3, max_vars=30, max_nodes_per_batch=20000,
                        label_samples=args.label_samples)
    dataset = dt.build_dataset(cfg_run)
    batches = dataset.train_data().batches
    n_total = len(batches)
    n_run = min(n_total, args.max_batches) if args.max_batches else n_total
    print(f"{n_total} cached batches; measuring {n_run} "
          f"x {args.chains} chains", flush=True)

    import jax
    import jax.numpy as jnp
    from diffusionsat_tpu.diffusion.sampler import make_dense_diffusion_chain
    from diffusionsat_tpu.graph.dense_batch import densify_batches_quantized
    from diffusionsat_tpu.models.query_sat import (
        QuerySATConfig, query_sat_init)
    from diffusionsat_tpu.train.checkpoint import restore_model_params
    from diffusionsat_tpu.uniformity.reweight import (
        batch_fingerprint, finalize_counts)

    mcfg = QuerySATConfig(test_rounds=args.test_rounds)
    params = restore_model_params(args.model_ckpt, query_sat_init, mcfg)
    params = jax.device_put(params, jax.devices()[0])
    print("model params restored", flush=True)

    chain = make_dense_diffusion_chain(
        mcfg, diffusion_steps=args.diffusion_steps,
        test_rounds=args.test_rounds, freeze_sat=False)

    from functools import partial

    @partial(jax.jit, static_argnums=3)
    def measure_chunk(params, batch, key, n):
        sk = batch.solutions_k                       # [K, G, Vg]
        vmask = batch.var_mask[None] < 0.5           # [1, G, Vg]
        gmask = batch.graph_mask > 0.5               # [G]

        def body(carry, k):
            counts, sat, outside = carry
            bits, solved, _ = chain(params, batch, k)      # [G,Vg], [G]
            eq = (bits[None] == sk) | vmask
            match = eq.all(-1) & gmask[None]               # [K, G]
            srow = (solved > 0.5) & gmask
            return (counts + match.astype(jnp.int32),
                    sat + srow.astype(jnp.int32),
                    outside + (srow & ~match.any(0)).astype(jnp.int32)), 0

        K, G = sk.shape[0], sk.shape[1]
        init = (jnp.zeros((K, G), jnp.int32), jnp.zeros((G,), jnp.int32),
                jnp.zeros((G,), jnp.int32))
        keys = jax.random.split(key, n)
        (counts, sat, outside), _ = jax.lax.scan(body, init, keys)
        return counts, sat, outside

    parts_dir = Path(args.out + ".parts")
    parts_dir.mkdir(exist_ok=True)
    t_start = time.time()
    for i in range(n_run):
        part = parts_dir / f"part_{i}.npz"
        if part.exists():
            continue
        flat = batches[i]
        dense = densify_batches_quantized([flat])[0]
        ddev = jax.device_put(dense, jax.devices()[0])
        ng = int(flat.n_graphs)
        K = flat.solutions_k.shape[0]
        counts = np.zeros((K, dense.G), np.int64)
        sat = np.zeros((dense.G,), np.int64)
        outside = np.zeros((dense.G,), np.int64)
        done = 0
        t0 = time.time()
        while done < args.chains:
            n = min(args.chunk, args.chains - done)
            key = jax.random.fold_in(
                jax.random.fold_in(jax.random.key(args.seed), i), done)
            c, s, o = measure_chunk(params, ddev, key, n)
            # host fetch synchronizes the tunnel (block_until_ready does
            # not); [K,G] ints are tiny
            counts += np.asarray(c, np.int64)
            sat += np.asarray(s, np.int64)
            outside += np.asarray(o, np.int64)
            done += n
        # write-to-temp + rename: a kill mid-write must not leave a
        # corrupt part (the resume/finalize path trusts existing parts)
        tmp = part.parent / f"part_{i}.tmp.npz"  # savez keeps .npz endings
        np.savez_compressed(
            tmp, counts=counts[:, :ng].astype(np.int32),
            sat=sat[:ng].astype(np.int32),
            outside=outside[:ng].astype(np.int32),
            fingerprint=np.str_(batch_fingerprint(flat)),
            n_chains=np.int32(args.chains))
        os.replace(tmp, part)
        sat_rate = sat[:ng].sum() / max(ng * args.chains, 1)
        in_bank = counts[:, :ng].max(0).sum()  # upper bound, dups share
        print(f"batch {i + 1}/{n_run}: ng={ng} sat_rate={sat_rate:.3f} "
              f"outside={int(outside[:ng].sum())} "
              f"({time.time() - t0:.1f}s, total {time.time() - t_start:.0f}s)",
              flush=True)

    # finalize: merge parts -> one npz with counts + reweighting logits
    out = {}
    agg = {"batches": 0, "graphs": 0, "samples": 0, "sat": 0, "outside": 0}
    for i in range(n_run):
        part = parts_dir / f"part_{i}.npz"
        with np.load(part) as z:
            counts = z["counts"]
            out[f"counts_{i}"] = counts
            out[f"sat_{i}"] = z["sat"]
            out[f"outside_{i}"] = z["outside"]
            out[f"fingerprint_{i}"] = z["fingerprint"]
            out[f"neglog_{i}"] = finalize_counts(batches[i], counts,
                                                 tau=args.tau)
            agg["batches"] += 1
            agg["graphs"] += counts.shape[1]
            agg["samples"] += counts.shape[1] * int(z["n_chains"])
            agg["sat"] += int(z["sat"].sum())
            agg["outside"] += int(z["outside"].sum())
    out["n_chains"] = np.int32(args.chains)
    out["n_batches"] = np.int32(n_run)
    out["model_ckpt"] = np.str_(args.model_ckpt)
    np.savez_compressed(args.out, **out)
    agg["sat_rate"] = round(agg["sat"] / max(agg["samples"], 1), 4)
    agg["outside_rate"] = round(agg["outside"] / max(agg["samples"], 1), 4)
    agg["wall_s"] = round(time.time() - t_start, 1)
    print("FREQ_MEASURE " + json.dumps(agg), flush=True)


if __name__ == "__main__":
    main()
