"""Hyperparameter search over QuerySAT architecture + optimizer knobs.

Analog of reference `hyperopt.py:1-196` (Optuna TPE over lr/beta1 and the
architecture dims suggested inside the model ctor,
`model/query_sat.py:101-112`). Optuna is not available in this
environment, so the adaptive search is self-contained: a TPE sampler
(train/tpe.py, the same algorithm family as optuna's default) over the
reference's space, each trial scored by held-out solved fraction.
`--sampler random` recovers the plain random-search baseline.

    python hyperopt.py --trials 20 --steps_per_trial 2000
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp

from diffusionsat_tpu.data.datasets import SatDataset
from diffusionsat_tpu.train.tpe import (
    Choice,
    IntUniform,
    LogUniform,
    RandomSampler,
    TPESampler,
    Uniform,
)
from diffusionsat_tpu.data.generators import (
    DiffusionSatInstances,
    SAT3Instances,
)
from diffusionsat_tpu.graph.batch import BucketSpec
from diffusionsat_tpu.models.query_sat import QuerySATConfig, query_sat_init
from diffusionsat_tpu.train.adabelief import adabelief
from diffusionsat_tpu.train.loop import (
    TrainState,
    evaluate_metrics,
    make_train_step,
)
from diffusionsat_tpu.train.metrics import SATAccuracy

# the reference's search space (model/query_sat.py:101-112, hyperopt.py:57-66)
SPACE = {
    "learning_rate": LogUniform(10 ** -4.3, 10 ** -2.3),
    "beta_1": Uniform(0.5, 0.95),
    "variables_update_layers": IntUniform(2, 4),
    "output_layers": IntUniform(2, 4),
    "query_layers": IntUniform(2, 4),
    "clauses_update_layers": IntUniform(2, 4),
    "feature_maps": Choice([16, 32, 64]),
    "query_maps": Choice([16, 32, 64]),
    "update_scale": Choice([round(0.2 * i, 1) for i in range(1, 11)]),
    "output_scale": Choice([round(0.2 * i, 1) for i in range(1, 11)]),
    "clauses_scale": Choice([round(0.2 * i, 1) for i in range(1, 11)]),
    "query_scale": Choice([round(0.2 * i, 1) for i in range(1, 11)]),
}


def run_trial(hp: dict, dataset: SatDataset, steps: int, seed: int) -> float:
    cfg = QuerySATConfig(
        feature_maps=hp["feature_maps"], query_maps=hp["query_maps"],
        update_layers=hp["variables_update_layers"],
        output_layers=hp["output_layers"], query_layers=hp["query_layers"],
        clauses_layers=hp["clauses_update_layers"],
        update_scale=hp["update_scale"], output_scale=hp["output_scale"],
        clauses_scale=hp["clauses_scale"], query_scale=hp["query_scale"])
    opt = adabelief(learning_rate=hp["learning_rate"], b1=hp["beta_1"],
                    eps=1e-8, clip_gradients=True)
    params = query_sat_init(jax.random.key(seed), cfg)
    state = TrainState(params=params, opt_state=opt.init(params),
                       step=jnp.zeros((), jnp.int32),
                       key=jax.random.key(seed + 1))
    train_step = make_train_step(cfg, opt)
    data_iter = dataset.train_data().repeat_shuffled()
    for _ in range(steps):
        state, _ = train_step(state, next(data_iter))
    vals = evaluate_metrics(state.params, cfg, dataset.test_data(),
                            [SATAccuracy()], jax.random.key(2),
                            max_batches=8)
    return vals["total_accuracy"]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--trials", type=int, default=20)
    p.add_argument("--steps_per_trial", type=int, default=2000)
    p.add_argument("--min_vars", type=int, default=3)
    p.add_argument("--max_vars", type=int, default=20)
    p.add_argument("--train_size", type=int, default=5000)
    p.add_argument("--max_nodes_per_batch", type=int, default=6000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sampler", default="tpe", choices=["tpe", "random"])
    p.add_argument("--out", default="hyperopt_results.jsonl")
    p.add_argument("--resume_from", default=None,
                   help="existing results JSONL: completed trials are fed "
                        "to the sampler as observations and trial "
                        "numbering continues after them (lets a "
                        "deadline-cut study be topped up to full size)")
    args = p.parse_args(argv)

    sampler = TPESampler(SPACE, seed=args.seed) if args.sampler == "tpe" \
        else RandomSampler(SPACE, seed=args.seed)
    start_trial = 0
    if args.resume_from and Path(args.resume_from).exists():
        with open(args.resume_from) as f:
            for line in f:
                rec = json.loads(line)
                hp = {k: rec[k] for k in SPACE if k in rec}
                if len(hp) == len(SPACE) and "accuracy" in rec:
                    sampler.observe(hp, rec["accuracy"])
                    start_trial = max(start_trial, rec.get("trial", 0) + 1)
        print(f"resumed {start_trial} completed trials from "
              f"{args.resume_from}", flush=True)
    inst = DiffusionSatInstances(
        SAT3Instances(min_vars=args.min_vars, max_vars=args.max_vars,
                      train_size=args.train_size, test_size=500,
                      seed=args.seed),
        use_unigen=True, seed=args.seed)
    dataset = SatDataset(inst,
                         BucketSpec.for_node_budget(args.max_nodes_per_batch),
                         name=f"hyperopt_{args.min_vars}_{args.max_vars}")

    for trial in range(start_trial, args.trials):
        hp = sampler.suggest()
        acc = run_trial(hp, dataset, args.steps_per_trial, seed=trial)
        sampler.observe(hp, acc)
        rec = {"trial": trial, "accuracy": acc, **hp}
        print(rec)
        with Path(args.out).open("a") as f:
            f.write(json.dumps(rec) + "\n")
    best_hp, best_acc = sampler.best
    print(f"best: acc={best_acc:.4f} {best_hp}")


if __name__ == "__main__":
    main()
