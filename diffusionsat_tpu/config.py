"""Typed run configuration + argparse override.

Replacement for the reference's static `Config` class (`config.py:22-141`)
without the global-mutable-class and subprocess-registry hacks: a frozen
dataclass built from argparse, with registry choice lists resolved by
direct import.
"""

from __future__ import annotations

import argparse
import dataclasses
import time
from pathlib import Path


@dataclasses.dataclass
class RunConfig:
    # diffusion training defaults (reference config.py:24-41)
    train_steps: int = 167_000
    min_vars: int = 3
    max_vars: int = 30
    desired_multiplier_for_the_number_of_solutions: int = 10
    use_hard_3sat: bool = True
    max_nodes_per_batch: int = 20_000
    use_cosine_decay: bool = True
    learning_rate: float = 3e-4
    initial_learning_rate: float = 1e-3
    cosine_alpha: float = 0.5
    use_unigen: bool = True
    train_size: int = 100_000
    test_size: int = 10_000
    # self-conditioning training (reference model/query_sat.py:398-417):
    # two passes per step, the second fed the stop-gradient denoised
    # estimate of the first; loss = loss1 + 2*loss2. ~3x step cost.
    self_supervised: bool = False
    # uniform solution samples per training instance: 1 = reference parity
    # (one fixed Unigen label per instance); >1 attaches a K-row label bank
    # and the train step resamples the target per graph per step — trains
    # the denoising posterior over the solution set instead of a
    # deterministic formula->solution map (the round-2 MH chain study's
    # cross-component hitting bias)
    label_samples: int = 1

    # dirs (reference config.py:46-49)
    data_dir: str = "data_cache"
    train_dir: str = "runs"
    ckpt_count: int = 3
    eval_every: int = 1000
    ckpt_every: int = 1000

    # task/model selection (reference config.py:60-71)
    task: str = "3-sat"
    model: str = "query_sat"
    input_mode: str = "literals"
    sat_solver_for_generators: str = "cdcl"

    # mode flags (reference config.py:74-82)
    restore: str | None = None
    # warm-start params from a portable pretrained .npz (export_params);
    # optimizer state and step start fresh. An orbax checkpoint found via
    # --restore / the run dir takes priority so watchdog restarts resume
    # rather than re-warm (same semantics as anf_training --init_npz).
    init_npz: str = ""
    force_data_gen: bool = False
    eager: bool = False  # maps to jax disable_jit/debug_nans
    label: str = ""

    # model knobs
    train_rounds: int = 32
    test_rounds: int = 64
    feature_maps: int = 128
    query_maps: int = 128
    logit_maps: int = 8
    # training noise-level distribution: noise = U**(1/noise_skew); >1
    # skews draws toward high noise (see QuerySATConfig.noise_skew)
    noise_skew: float = 1.0
    # weighted label-bank selection: softmax(alpha * per-row isolation)
    # instead of uniform; counters the raw sampler's basin-volume bias
    # (see QuerySATConfig.label_isolation_alpha, UNIFORMITY_ANALYSIS.md)
    label_isolation_alpha: float = 0.0
    # closed-loop per-solution reweighting: path to a measured frequency
    # table (measure_bank_freq.py npz). Label-selection logits become
    # label_isolation_alpha * isolation + label_reweight_beta *
    # (-log freq_hat) per bank row — over-sampled solutions get fewer
    # label draws (uniformity/reweight.py; beta=1 = inverse-frequency)
    label_logit_table: str = ""
    label_reweight_beta: float = 1.0
    # train on only the first N cached batches (0 = all): keeps a
    # closed-loop fine-tune inside the measured subset of the cache
    train_batch_limit: int = 0
    # N training steps per device dispatch (lax.scan over same-shape
    # stacked batches, train/loop.make_scanned_train_step_for): removes
    # N-1 tunnel RPCs per N steps. Dense-only, single-device, supervised
    # streams; 0/1 = off. Step accounting is approximate by up to one
    # trailing partial chunk per shape group; eval/ckpt cadence rounds to
    # chunk boundaries.
    mega_steps: int = 0

    # execution layout: dense per-graph blocks (graph/dense_batch.py) when
    # every graph fits the block dims — the MXU fast path for small-graph
    # workloads; falls back to the flat edge-list path otherwise
    dense: bool = True
    # matmul precision for the dense incidence einsums:
    # highest (true f32) | high (bf16x3) | default (bf16 inputs with f32
    # accumulation — the flagship/bench configuration, 86 vs 115 ms/step;
    # training quality validated by the 167k flagship run)
    incidence_precision: str = "default"
    # data-parallel devices: >1 trains with parallel/dp.py over a 'data'
    # mesh axis (one packed batch per device, gradient pmean over ICI);
    # on hosts without that many accelerators use a virtual CPU mesh
    # (XLA_FLAGS=--xla_force_host_platform_device_count=N)
    n_devices: int = 1

    seed: int = 0

    def run_dir(self) -> Path:
        stamp = time.strftime("%Y%m%d_%H%M%S")
        label = f"_{self.label}" if self.label else ""
        return Path(self.train_dir) / f"{self.model}_{self.task}{label}_{stamp}"


def parse_config(argv: list[str] | None = None) -> RunConfig:
    from diffusionsat_tpu.registry import (
        DATASET_REGISTRY, MODEL_REGISTRY, SOLVER_REGISTRY)

    defaults = RunConfig()
    p = argparse.ArgumentParser()
    for f in dataclasses.fields(RunConfig):
        name = f"--{f.name}"
        default = getattr(defaults, f.name)
        if f.type == "bool" or isinstance(default, bool):
            p.add_argument(name, type=lambda s: s.lower() in ("1", "true"),
                           default=default)
        elif f.name == "model":
            p.add_argument(name, default=default,
                           choices=MODEL_REGISTRY.registered_names)
        elif f.name == "task":
            p.add_argument(name, default=default,
                           choices=DATASET_REGISTRY.registered_names)
        elif f.name == "sat_solver_for_generators":
            p.add_argument(name, default=default,
                           choices=SOLVER_REGISTRY.registered_names)
        else:
            typ = type(default) if default is not None else str
            p.add_argument(name, type=typ, default=default)
    args = p.parse_args(argv)
    return RunConfig(**vars(args))
