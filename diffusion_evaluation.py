"""Uniformity benchmark: diffusion sampler vs exact-uniform vs WalkSAT.

Analog of reference `diffusion_evaluation.py:41-112`: count the formula's
solutions, draw n_solutions*k samples from each sampler, record per-sampler
speed (ms per distinct solution) and histograms to the benchmark store,
then report chi-square uniformity.

    python diffusion_evaluation.py --dimacs file.cnf --model_ckpt runs/.../ckpt
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from diffusionsat_tpu.diffusion.sampler import DiffusionSampler
from diffusionsat_tpu.models.query_sat import QuerySATConfig, query_sat_init
from diffusionsat_tpu.sat.cnf import CNF
from diffusionsat_tpu.sat.solvers import enumerate_models
from diffusionsat_tpu.uniformity.benchmarks_file import BenchmarksFile
from diffusionsat_tpu.uniformity.samplers import (
    ExactUniformSampler,
    WalkSatSampler,
)
from diffusionsat_tpu.utils.chi_square import chi_square_likelihood


def run_sampler(name: str, sampler, n_samples: int) -> tuple[dict, dict]:
    t0 = time.perf_counter()
    counts = sampler.samples(n_samples)
    elapsed = time.perf_counter() - t0
    distinct = max(len(counts), 1)
    stats = {
        "sampler": name,
        "n_samples": sum(counts.values()),
        "distinct": len(counts),
        "elapsed_s": elapsed,
        "ms_per_distinct": 1000 * elapsed / distinct,
    }
    return counts, stats


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dimacs", required=True)
    p.add_argument("--model_ckpt", default=None)
    p.add_argument("--k", type=int, default=10,
                   help="samples per solution (n = k * n_solutions)")
    p.add_argument("--diffusion_steps", type=int, default=32)
    p.add_argument("--test_rounds", type=int, default=32)
    p.add_argument("--benchmarks_file", default="benchmarks.jsonl")
    args = p.parse_args(argv)

    cnf = CNF.load(args.dimacs)
    models, complete = enumerate_models(cnf.clauses(), cnf.number_of_vars())
    n_solutions = len(models)
    n_samples = args.k * max(n_solutions, 1)
    print(f"{n_solutions} solutions ({'exact' if complete else 'capped'}), "
          f"drawing {n_samples} samples per sampler")

    store = BenchmarksFile(args.benchmarks_file)
    record = {"n_solutions": n_solutions, "n_samples": n_samples}

    uniform_counts, stats = run_sampler(
        "uniform", ExactUniformSampler(cnf, seed=1), n_samples)
    print(stats)
    record["uniform"] = {"counts": {str(k): v for k, v
                                    in uniform_counts.items()}, **stats}

    walksat_counts, stats = run_sampler(
        "walksat", WalkSatSampler(cnf, seed=2), n_samples)
    print(stats)
    record["walksat"] = {"counts": {str(k): v for k, v
                                    in walksat_counts.items()}, **stats}

    diffusion_counts = None
    if args.model_ckpt:
        from diffusionsat_tpu.train.checkpoint import restore_model_params

        cfg = QuerySATConfig(test_rounds=args.test_rounds)
        sampler = DiffusionSampler(
            restore_model_params(args.model_ckpt, query_sat_init, cfg),
            cfg, cnf,
            diffusion_steps=args.diffusion_steps,
            test_rounds=args.test_rounds)
        diffusion_counts, stats = run_sampler("diffusion", sampler, n_samples)
        stats["success_rate"] = sampler.success_rate
        print(stats)
        record["diffusion"] = {"counts": {str(k): v for k, v
                                          in diffusion_counts.items()},
                               **stats}

    # chi-square uniformity vs the ideal uniform expectation
    ideal = {int(i): n_samples / max(n_solutions, 1)
             for i in range(n_solutions)}
    keyed_ideal = {}
    from diffusionsat_tpu.sat.cnf import VariableAssignment
    for row in models:
        asgn = VariableAssignment(cnf.number_of_vars(), cnf.clauses())
        asgn.assign_all_from_bit_list(row.tolist())
        keyed_ideal[int(asgn)] = n_samples / max(n_solutions, 1)

    for name, counts in [("uniform", uniform_counts),
                         ("walksat", walksat_counts),
                         ("diffusion", diffusion_counts)]:
        if counts is None:
            continue
        pval = chi_square_likelihood(counts, keyed_ideal)
        print(f"{name}/ideal chi2 uniformity probability = {pval * 100:.2f}%")
        record[f"{name}_chi2_p"] = pval

    store.write(cnf.clauses(), record)
    print(f"record appended to {args.benchmarks_file}")


if __name__ == "__main__":
    main()
