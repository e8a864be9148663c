"""Generic train/eval driver.

Analog of reference `main.py:1-455`: resolve model and task from the
registries, train, then run the selected evaluation modes (variable /
round generalization, invariance, classic-solver baseline, cactus CSV).

    python main.py --model query_sat --task 3-sat --train_steps 10000 \
        [--evaluate_variable_gen ...] (flags below)
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp

from diffusionsat_tpu.config import parse_config
from diffusionsat_tpu.data.datasets import SatDataset
from diffusionsat_tpu.data.generators import (
    DiffusionSatInstances,
    KSatInstances,
    SAT3Instances,
)
from diffusionsat_tpu.evaluation.harness import (
    evaluate_classic_solver,
    evaluate_round_generalization,
    evaluate_variable_generalization,
    make_cactus,
    test_invariance,
)
from diffusionsat_tpu.graph.batch import BucketSpec
from diffusionsat_tpu.registry import MODEL_REGISTRY
from diffusionsat_tpu.train.adabelief import adabelief
from diffusionsat_tpu.train.checkpoint import CheckpointManager
from diffusionsat_tpu.train.loop import (
    TrainState,
    evaluate_metrics,
    make_train_step_for,
    train,
)
from diffusionsat_tpu.train.metrics import SATAccuracy, StepStatistics

EVAL_FLAGS = ["evaluate", "evaluate_round_gen", "evaluate_variable_gen",
              "evaluate_batch_gen", "test_invariance", "test_classic_solver",
              "make_cactus"]


def split_eval_flags(argv):
    flags = {f: False for f in EVAL_FLAGS}
    rest = []
    for a in argv:
        name = a.lstrip("-")
        if name in flags:
            flags[name] = True
        else:
            rest.append(a)
    return flags, rest


def build_instances(cfg):
    if cfg.task == "3-sat":
        base = SAT3Instances(min_vars=cfg.min_vars, max_vars=cfg.max_vars,
                             train_size=cfg.train_size,
                             test_size=cfg.test_size, seed=cfg.seed)
    elif cfg.task == "ksat":
        base = KSatInstances(min_vars=cfg.min_vars, max_vars=cfg.max_vars,
                             train_size=cfg.train_size,
                             test_size=cfg.test_size, seed=cfg.seed)
    else:
        from diffusionsat_tpu.registry import DATASET_REGISTRY
        cls = DATASET_REGISTRY.resolve(cfg.task)
        # forward the CLI sizes the generator understands — without this a
        # registry task silently uses its own defaults (e.g. 100k train
        # instances), ignoring --train_size
        import inspect
        common = {"min_vars": cfg.min_vars, "max_vars": cfg.max_vars,
                  "train_size": cfg.train_size, "test_size": cfg.test_size,
                  "seed": cfg.seed}
        try:
            accepted = set(inspect.signature(cls).parameters)
        except (TypeError, ValueError):
            accepted = set()
        base = cls(**{k: v for k, v in common.items() if k in accepted})
    return DiffusionSatInstances(base, use_unigen=cfg.use_unigen,
                                 seed=cfg.seed)


def main(argv=None):
    flags, rest = split_eval_flags(argv or sys.argv[1:])
    cfg = parse_config(rest)
    if cfg.eager:  # sanitizer mode (reference --eager, config.py:110)
        jax.config.update("jax_disable_jit", True)
        jax.config.update("jax_debug_nans", True)

    model_cfg_cls, model_init, model_apply = MODEL_REGISTRY.resolve(cfg.model)
    model_kwargs = {}
    import dataclasses as dc
    field_names = {f.name for f in dc.fields(model_cfg_cls)}
    for k in ("feature_maps", "query_maps", "train_rounds", "test_rounds"):
        if k in field_names:
            model_kwargs[k] = getattr(cfg, k)
    model_cfg = model_cfg_cls(**model_kwargs)

    optimizer = adabelief(learning_rate=cfg.learning_rate, eps=1e-8,
                          clip_gradients=True)
    params = model_init(jax.random.key(cfg.seed), model_cfg)
    state = TrainState(params=params, opt_state=optimizer.init(params),
                       step=jnp.zeros((), jnp.int32),
                       key=jax.random.key(cfg.seed + 1))

    run_dir = cfg.run_dir()
    run_dir.mkdir(parents=True, exist_ok=True)
    mgr = CheckpointManager(cfg.restore or run_dir / "ckpt",
                            max_to_keep=cfg.ckpt_count)
    restored = mgr.restore(state)
    if restored is not None:
        state = restored

    bucket = BucketSpec.for_node_budget(cfg.max_nodes_per_batch)
    dataset = SatDataset(build_instances(cfg), bucket,
                         cache_dir=cfg.data_dir,
                         name=f"{cfg.task}_{cfg.min_vars}_{cfg.max_vars}_"
                              f"{cfg.train_size}",
                         force_data_gen=cfg.force_data_gen, seed=cfg.seed)
    test_data = dataset.test_data()

    if cfg.train_steps > int(state.step):
        train_step = make_train_step_for(model_apply, model_cfg, optimizer)
        state = train(
            state, train_step, dataset.train_data().repeat_shuffled(),
            steps=cfg.train_steps - int(state.step),
            eval_fn=lambda st: evaluate_metrics(
                st.params, model_cfg, test_data,
                [SATAccuracy(), StepStatistics()], jax.random.key(99),
                max_batches=8, apply_fn=model_apply),
            eval_every=cfg.eval_every, checkpoint_fn=mgr.save,
            ckpt_every=cfg.ckpt_every, log_file=run_dir / "train_log.jsonl")
        mgr.save(state)

    if flags["evaluate"]:
        vals = evaluate_metrics(state.params, model_cfg, test_data,
                                [SATAccuracy(), StepStatistics()],
                                jax.random.key(7), apply_fn=model_apply)
        print(f"[evaluate] {vals}")

    if flags["test_invariance"]:
        vals = test_invariance(state.params, model_cfg, test_data, steps=5)
        print(f"[invariance] {vals}")

    if flags["test_classic_solver"]:
        t = evaluate_classic_solver(test_data, steps=10)
        print(f"[classic solver] {t:.4f}s per batch")

    if flags["make_cactus"]:
        make_cactus(state.params, model_cfg, test_data,
                    run_dir / f"{cfg.model}_cactus.csv")
        print(f"[cactus] written to {run_dir}")

    if flags["evaluate_variable_gen"]:
        def make_ds(min_v, max_v, test_size):
            inst = DiffusionSatInstances(
                SAT3Instances(min_vars=min_v, max_vars=max_v,
                              train_size=1, test_size=test_size,
                              seed=cfg.seed),
                use_unigen=False, seed=cfg.seed)
            ds = SatDataset(inst, bucket, cache_dir=cfg.data_dir,
                            name=f"vargen_{min_v}_{max_v}", seed=cfg.seed)
            return ds.test_data()
        evaluate_variable_generalization(
            state.params, model_cfg, make_ds,
            run_dir / "gen_variables_size_result.txt")

    if flags["evaluate_batch_gen"]:
        from diffusionsat_tpu.evaluation.harness import (
            evaluate_batch_generalization)

        def make_ds_budget(budget):
            inst = DiffusionSatInstances(
                SAT3Instances(min_vars=cfg.min_vars, max_vars=cfg.max_vars,
                              train_size=1, test_size=50, seed=cfg.seed),
                use_unigen=False, seed=cfg.seed)
            b = BucketSpec.for_node_budget(budget)
            ds = SatDataset(inst, b, cache_dir=cfg.data_dir,
                            name=f"batchgen_{budget}", seed=cfg.seed)
            return ds.test_data()
        evaluate_batch_generalization(
            state.params, model_cfg, make_ds_budget,
            run_dir / "gen_batch_size_results.txt",
            sizes=range(3000, 24000, 1000))  # reference main.py:197

    if flags["evaluate_round_gen"]:
        def cfg_for_rounds(r):
            return dc.replace(model_cfg, test_rounds=r) \
                if "test_rounds" in field_names else model_cfg
        evaluate_round_generalization(
            state.params, cfg_for_rounds, test_data,
            run_dir / "gen_steps_result.txt",
            rounds_list=[16, 32, 64, 128, 256, 512, 1024, 2048, 4096])  # reference main.py:221

    return state


if __name__ == "__main__":
    main()
