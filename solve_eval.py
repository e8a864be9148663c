"""Definitive solving eval: noise pinned at 1.0 over the full held-out set.

The in-training eval draws the diffusion conditioning noise uniformly
(reference predict semantics, model/query_sat.py:424-451), so its
readings oscillate with the noise lottery. This CLI pins noise_scale=1.0
(pure solving — zero label signal reaches the model) and runs the whole
test split, producing the comparable "graphs fully solved" headline
number (round-1 reading: 89.1% on the 20k-step checkpoint).

    python solve_eval.py --model_ckpt <ckpt dir | pretrained.npz> \
        [--out SOLVE_EVAL.json]
"""

from __future__ import annotations

import argparse
import json

import jax

from diffusionsat_tpu.config import RunConfig
from diffusionsat_tpu.models.query_sat import QuerySATConfig, query_sat_init
from diffusionsat_tpu.train.checkpoint import restore_model_params
from diffusionsat_tpu.train.loop import evaluate_metrics
from diffusionsat_tpu.train.metrics import SATAccuracy, StepStatistics


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_ckpt", required=True)
    p.add_argument("--train_size", type=int, default=60000,
                   help="must match the training run so the cached "
                        "dataset (and its test split) is reused")
    p.add_argument("--test_size", type=int, default=2000)
    p.add_argument("--min_vars", type=int, default=3)
    p.add_argument("--max_vars", type=int, default=30)
    p.add_argument("--label_samples", type=int, default=1,
                   help="match the training run's cache variant")
    p.add_argument("--noise", type=float, default=1.0)
    p.add_argument("--test_rounds", type=int, default=64)
    p.add_argument("--max_batches", type=int, default=0,
                   help="0 = the whole test split")
    p.add_argument("--tries", type=int, default=1,
                   help="multi-try predict (reference model/query_sat.py"
                        ":426-445): re-run with fresh randomness, keep "
                        "each graph's first solving attempt")
    p.add_argument("--out", default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import diffusion_training as dt

    cfg = RunConfig(train_size=args.train_size, test_size=args.test_size,
                    min_vars=args.min_vars, max_vars=args.max_vars,
                    label_samples=args.label_samples, seed=args.seed)
    test_data = dt.build_dataset(cfg).test_data()
    print(f"test batches: {len(test_data)}", flush=True)

    model_cfg = QuerySATConfig(test_rounds=args.test_rounds)
    params = restore_model_params(args.model_ckpt, query_sat_init,
                                  model_cfg)

    batches = list(test_data)
    if jax.default_backend() == "tpu":
        # one-time device placement: per-batch uploads round-trip (and
        # leak host memory through) the axon tunnel
        batches = [jax.device_put(b, jax.devices()[0]) for b in batches]
    vals = evaluate_metrics(
        params, model_cfg, batches, [SATAccuracy(), StepStatistics()],
        jax.random.key(args.seed + 1),
        max_batches=(args.max_batches or None),
        noise_scale=args.noise, prediction_tries=args.tries)
    result = {"model_ckpt": args.model_ckpt, "noise": args.noise,
              "test_rounds": args.test_rounds, "tries": args.tries,
              "n_test_batches": len(batches), **vals}
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    return result


if __name__ == "__main__":
    main()
