"""Definitive ANFSAT evaluation: full held-out set from a checkpoint.

    python anf_eval.py --ckpt runs_anf/.../ckpt            # orbax dir
    python anf_eval.py --ckpt pretrained/anf_sat_sha1_r17.npz

Rebuilds the same cached dataset as anf_training.py (same flags) and
evaluates EVERY test batch — the in-training eval subsamples 16 batches.
"""

from __future__ import annotations

import argparse
import json

import jax

from diffusionsat_tpu.data.anf_datasets import AnfDataset
from diffusionsat_tpu.data.sha_anf import Sha1AnfInstances
from diffusionsat_tpu.graph.anf_batch import ANFBucket
from diffusionsat_tpu.models.anf_sat import (
    ANFSATConfig,
    anf_sat_apply,
    anf_sat_init,
)
from diffusionsat_tpu.train.checkpoint import restore_model_params
from diffusionsat_tpu.train.loop import evaluate_metrics
from diffusionsat_tpu.train.metrics import ANFAccuracy


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--rounds", type=int, default=17)
    p.add_argument("--min_free_bits", type=int, default=2)
    p.add_argument("--max_free_bits", type=int, default=20)
    p.add_argument("--train_size", type=int, default=8000)
    p.add_argument("--test_size", type=int, default=256)
    p.add_argument("--test_rounds", type=int, default=32)
    p.add_argument("--feature_maps", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_vars", type=int, default=8192)
    p.add_argument("--max_ands", type=int, default=16384)
    p.add_argument("--max_clauses", type=int, default=8704)
    p.add_argument("--max_edges", type=int, default=32768)
    p.add_argument("--max_graphs", type=int, default=8)
    p.add_argument("--tries", type=int, default=1,
                   help="multi-try predict: re-run with fresh randomness, "
                        "keep each system's first solving attempt "
                        "(reference model/query_sat.py:426-445 applied "
                        "to ANF via losses.anf.is_graph_sat_anf)")
    p.add_argument("--cdcl_completion", action="store_true",
                   help="input-anchored CDCL completion: fix the model's "
                        "predicted free message bits (the circuit's <=20 "
                        "degrees of freedom), release the least-confident "
                        "ones on a 0/2/4/8 ladder, CDCL-propagate "
                        "(sat/anf_completion.py; lifts systems-solved "
                        "~34%->~59% on the r17 flagship)")
    p.add_argument("--marginalize_seeds", type=int, default=0,
                   help="test-time marginalization: average the predicted "
                        "bit posteriors over S noise seeds before "
                        "thresholding/anchoring (posterior-average analog "
                        "of multi-try predict, reference "
                        "model/query_sat.py:424-445); 0/1 = off. With "
                        "--cdcl_completion the anchored bits and the "
                        "confidence ladder use the marginalized posterior")
    p.add_argument("--dump_marginals", default=None,
                   help="save per-batch predicted bit posteriors (npz) for "
                        "offline studies (benchmarks/anf_prior_study.py: "
                        "CDCL seeded by the neural input prior); uses the "
                        "marginalized posterior when --marginalize_seeds")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    inst = Sha1AnfInstances(
        rounds=args.rounds, min_free_bits=args.min_free_bits,
        max_free_bits=args.max_free_bits, train_size=args.train_size,
        test_size=args.test_size, seed=args.seed)
    bucket = ANFBucket(max_vars=args.max_vars, max_ands=args.max_ands,
                       max_clauses=args.max_clauses,
                       max_edges=args.max_edges, max_graphs=args.max_graphs)
    name = (f"sha1anf_r{args.rounds}_fb{args.min_free_bits}_"
            f"{args.max_free_bits}_{args.train_size}")
    ds = AnfDataset(inst, bucket, name=name, seed=args.seed)
    test_batches = ds.test_data()
    print(f"{len(test_batches)} test batches", flush=True)

    cfg = ANFSATConfig(feature_maps=args.feature_maps,
                       query_maps=args.feature_maps,
                       test_rounds=args.test_rounds)
    params = restore_model_params(args.ckpt, anf_sat_init, cfg)
    params = jax.device_put(params, jax.devices()[0])
    if jax.default_backend() == "tpu":
        dev = jax.devices()[0]
        test_batches = [jax.device_put(b, dev) for b in test_batches]

    from diffusionsat_tpu.losses.anf import is_graph_sat_anf

    vals = evaluate_metrics(params, cfg, test_batches, [ANFAccuracy()],
                            jax.random.key(9), apply_fn=anf_sat_apply,
                            prediction_tries=args.tries,
                            graph_sat_fn=is_graph_sat_anf)
    vals["tries"] = args.tries

    import numpy as np

    predict = jax.jit(lambda pr, b, k: anf_sat_apply(
        pr, cfg, b, k, training=False)[0])

    marg_probs = None
    if args.marginalize_seeds > 1:
        # posterior-average over S noise seeds; report marginalized vs
        # single-seed accuracy on the free message bits (the input prior
        # the anchored-CDCL ladder keys off)
        S = args.marginalize_seeds
        key = jax.random.key(11)
        marg_probs = []
        nvars = corr_m = 0
        nfree = free_m = free_1 = 0
        for batch in test_batches:
            acc = first = None
            for _ in range(S):
                key, sub = jax.random.split(key)
                head = np.asarray(predict(params, batch, sub))[:, 0]
                prob = 1.0 / (1.0 + np.exp(-head))
                if first is None:
                    first = prob
                acc = prob if acc is None else acc + prob
            p_mean = acc / S
            marg_probs.append(p_mean)
            vm = np.asarray(batch.var_mask) > 0
            sol = np.asarray(batch.solutions)
            corr = ((p_mean > 0.5).astype(np.int32) == sol)
            nvars += int(vm.sum())
            corr_m += int(corr[vm].sum())
            fim = getattr(batch, "free_input_mask", None)
            if fim is not None:
                m = (np.asarray(fim) > 0) & vm
                nfree += int(m.sum())
                free_m += int(corr[m].sum())
                free_1 += int((((first > 0.5).astype(np.int32) == sol))[m].sum())
        vals["marginalize_seeds"] = S
        vals["marg_per_var_accuracy"] = round(corr_m / max(nvars, 1), 4)
        if nfree:
            vals["marg_free_input_accuracy"] = round(free_m / nfree, 4)
            vals["single_free_input_accuracy"] = round(free_1 / nfree, 4)

    if args.dump_marginals:
        key = jax.random.key(13)
        dump = {"n_batches": np.int32(len(test_batches)),
                "marginalize_seeds": np.int32(args.marginalize_seeds),
                "rounds": np.int32(args.rounds),
                "min_free_bits": np.int32(args.min_free_bits),
                "max_free_bits": np.int32(args.max_free_bits),
                "test_size": np.int32(args.test_size),
                "seed": np.int32(args.seed)}
        for bi, batch in enumerate(test_batches):
            if marg_probs is not None:
                prob = marg_probs[bi]
            else:
                key, sub = jax.random.split(key)
                head = np.asarray(predict(params, batch, sub))[:, 0]
                prob = 1.0 / (1.0 + np.exp(-head))
            dump[f"prob_{bi}"] = prob.astype(np.float32)
        np.savez_compressed(args.dump_marginals, **dump)
        print(f"marginals dumped to {args.dump_marginals}", flush=True)

    if args.cdcl_completion:
        from diffusionsat_tpu.sat.anf_completion import (
            extract_graph_equations, input_anchored_complete)

        key = jax.random.key(9)
        solved = total = 0
        solved_at = {}
        for bi, batch in enumerate(test_batches):
            key, sub = jax.random.split(key)
            if marg_probs is not None:
                prob = marg_probs[bi]
                pred = (prob > 0.5).astype(np.int8)
                # vote margin as confidence: the ladder releases the
                # least-agreed bits first
                conf = np.abs(2.0 * prob - 1.0)
            else:
                logits = np.asarray(predict(params, batch, sub))
                head = logits[:, 0]
                pred = (head > 0).astype(np.int8)
                conf = np.abs(head)
            var_graph = np.asarray(batch.var_graph)
            geqs = extract_graph_equations(batch)
            for g in np.where(np.asarray(batch.graph_mask) > 0)[0]:
                g = int(g)
                vids = np.where(var_graph == g)[0]
                if len(vids) == 0 or g not in geqs:
                    continue
                total += 1
                ok, spec, _ = input_anchored_complete(
                    geqs[g], vids, pred, conf)
                if ok:
                    solved += 1
                    solved_at[spec] = solved_at.get(spec, 0) + 1
        vals["completion_systems_solved"] = round(solved / max(total, 1), 4)
        vals["completion_solved_at_release"] = {
            str(k): v for k, v in sorted(solved_at.items())}

    print(f"[full testset] {vals}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(vals, f)
    return vals


if __name__ == "__main__":
    main()
