"""Flagship uniformity benchmark: diffusion sampler vs exact-uniform vs
WalkSAT over a suite of benchmark formulas.

The repeatable driver behind `benchmarks_flagship.jsonl` (the per-formula
analog is diffusion_evaluation.py; reference `diffusion_evaluation.py:
41-112` + offline `diffusion_metrics.py:130-159`): generates hard 3-SAT
benchmark formulas with moderate solution counts, draws k samples per
solution from each sampler, and reports per-formula and aggregate
diversity (distinct/true solutions), chi-square uniformity p-values, and
count-histogram cross-entropy.

    python uniformity_benchmark.py --model_ckpt runs_flagship/<run>/ckpt \
        --n_formulas 8 --k 10 --out benchmarks_flagship.jsonl
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from diffusionsat_tpu.sat.cnf import CNF, VariableAssignment
from diffusionsat_tpu.sat.solvers import enumerate_models
from diffusionsat_tpu.uniformity.benchmarks_file import BenchmarksFile
from diffusionsat_tpu.uniformity.samplers import (
    ExactUniformSampler,
    MetropolisRefiner,
    WalkSatSampler,
    XorCellJumpRefiner,
)
from diffusionsat_tpu.utils.chi_square import chi_square_likelihood


def gen_benchmark_formulas(n_formulas: int, seed: int = 0,
                           min_vars: int = 10, max_vars: int = 16,
                           min_solutions: int = 20,
                           max_solutions: int = 200):
    """Random threshold 3-SAT filtered to a moderate solution count
    (matches the round-1 benchmark suite: 11-14 vars, 27-63 solutions)."""
    rng = np.random.default_rng(seed)
    out = []
    while len(out) < n_formulas:
        n = int(rng.integers(min_vars, max_vars + 1))
        m = int(4.258 * n + 58.26 * n ** (-2.0 / 3.0))
        clauses = [[int(v) if rng.random() < 0.5 else -int(v)
                    for v in (rng.choice(n, size=3, replace=False) + 1)]
                   for _ in range(m)]
        models, complete = enumerate_models(clauses, n, max_models=10_000)
        if complete and min_solutions <= len(models) <= max_solutions:
            out.append((n, clauses, models))
    return out


def keyed_uniform_ideal(models, cnf, total: float) -> dict[int, float]:
    """{assignment_key: total/S} over the true solution set — the uniform
    expectation histogram every battery statistic is computed against."""
    S = max(len(models), 1)
    keyed = {}
    for row in models:
        asgn = VariableAssignment(cnf.number_of_vars(), cnf.clauses())
        asgn.assign_all_from_bit_list([int(b) for b in row])
        keyed[int(asgn)] = total / S
    return keyed


def count_stats(counts: dict, models, cnf, n_samples: int) -> dict:
    S = len(models)
    # expectation from the samples actually collected — a sampler that
    # stops early (divergence guard) must not be chi2-penalized for the
    # missing draws
    got = max(sum(counts.values()), 1)
    keyed_ideal = keyed_uniform_ideal(models, cnf, got)
    pval = chi_square_likelihood(counts, keyed_ideal)
    # count-histogram cross-entropy vs uniform (reference
    # diffusion_metrics.py:130-159)
    total = max(sum(counts.values()), 1)
    ce = -sum((c / total) * np.log(max(c / total, 1e-12))
              for c in counts.values())
    return {"distinct": len(counts), "true_solutions": S,
            "n_collected": got,
            "diversity": round(len(counts) / max(S, 1), 4),
            "chi2_p": float(pval),
            "count_entropy": round(float(ce), 4),
            "uniform_entropy": round(float(np.log(max(S, 1))), 4)}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_ckpt", default=None)
    p.add_argument("--n_formulas", type=int, default=8)
    p.add_argument("--skip_formulas", type=int, default=0,
                   help="skip the first N formulas of the deterministic "
                        "sequence (resume an interrupted battery; the "
                        "report tool merges by formula+sampler)")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--diffusion_steps", type=int, default=32)
    p.add_argument("--test_rounds", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="benchmarks_flagship.jsonl")
    p.add_argument("--summary_out", default=None)
    p.add_argument("--variants", default=None,
                   help="comma-separated subset of samplers to run "
                        "(uniform,walksat,walksat_mh,diffusion,"
                        "diffusion_nofreeze,diffusion_latefreeze,"
                        "diffusion_sample,diffusion_mh,"
                        "diffusion_latefreeze_mh,diffusion_mh_xor,"
                        "walksat_mh_xor); default: the round-2 "
                        "core five (no _mh/_sample extras)")
    args = p.parse_args(argv)
    selected = (set(args.variants.split(","))
                if args.variants else None)

    formulas = gen_benchmark_formulas(args.n_formulas, seed=args.seed)
    print(f"{len(formulas)} benchmark formulas: "
          f"{[(n, len(m)) for n, _, m in formulas]}", flush=True)

    diffusion_params = None
    if args.model_ckpt:
        from diffusionsat_tpu.models.query_sat import (
            QuerySATConfig, query_sat_init)
        from diffusionsat_tpu.train.checkpoint import restore_model_params

        cfg = QuerySATConfig(test_rounds=args.test_rounds)
        diffusion_params = restore_model_params(args.model_ckpt,
                                                query_sat_init, cfg)
        print("model params restored", flush=True)

    store = BenchmarksFile(args.out)
    agg: dict[str, list] = {}
    for fi, (n, clauses, models) in enumerate(formulas):
        if fi < args.skip_formulas:
            continue
        cnf = CNF(n_vars=n, clauses=clauses)
        S = len(models)
        n_samples = args.k * S
        record = {"formula": fi, "n_vars": n, "n_clauses": len(clauses),
                  "n_solutions": S, "n_samples": n_samples}

        samplers = [("uniform", ExactUniformSampler(cnf, seed=1 + fi)),
                    ("walksat", WalkSatSampler(cnf, seed=2 + fi))]
        if selected is not None and "walksat_mh" in selected:
            samplers.append(("walksat_mh", MetropolisRefiner(
                cnf, WalkSatSampler(cnf, seed=2 + fi), seed=12 + fi)))
        if selected is not None and "walksat_mh_xor" in selected:
            samplers.append(("walksat_mh_xor", XorCellJumpRefiner(
                cnf, WalkSatSampler(cnf, seed=2 + fi), seed=22 + fi)))
        if diffusion_params is not None:
            from diffusionsat_tpu.diffusion.sampler import DiffusionSampler
            # two regimes: the reference's early-freeze (pins a graph the
            # moment its prediction satisfies — bypasses the chain when
            # the model solves at t=0) and the full denoising trajectory
            # (near-uniform; slightly lower success rate). See STATUS.md.
            samplers.append(("diffusion", DiffusionSampler(
                diffusion_params, cfg, cnf,
                diffusion_steps=args.diffusion_steps,
                test_rounds=args.test_rounds, seed=3 + fi)))
            samplers.append(("diffusion_nofreeze", DiffusionSampler(
                diffusion_params, cfg, cnf,
                diffusion_steps=args.diffusion_steps,
                test_rounds=args.test_rounds, seed=4 + fi,
                freeze_sat=False)))
            # late-freeze: full denoising trajectory for the first 3/4 of
            # the chain (nofreeze diversity), then pin SAT graphs over the
            # last quarter (recovers the 100% success rate)
            samplers.append(("diffusion_latefreeze", DiffusionSampler(
                diffusion_params, cfg, cnf,
                diffusion_steps=args.diffusion_steps,
                test_rounds=args.test_rounds, seed=5 + fi,
                freeze_from=args.diffusion_steps * 3 // 4)))
            if selected is not None and "diffusion_sample" in selected:
                # terminal Bernoulli sampling instead of rounding
                samplers.append(("diffusion_sample", DiffusionSampler(
                    diffusion_params, cfg, cnf,
                    diffusion_steps=args.diffusion_steps,
                    test_rounds=args.test_rounds, seed=6 + fi,
                    freeze_sat=False, final_sample=True)))
            if selected is not None and "diffusion_mh" in selected:
                # diffusion proposes (component coverage), Metropolis
                # corrects (within-component uniformity)
                samplers.append(("diffusion_mh", MetropolisRefiner(
                    cnf, DiffusionSampler(
                        diffusion_params, cfg, cnf,
                        diffusion_steps=args.diffusion_steps,
                        test_rounds=args.test_rounds, seed=7 + fi,
                        freeze_sat=False), seed=17 + fi)))
            if selected is not None and "diffusion_mh_xor" in selected:
                # cross-component jumps on top of the MH sweeps — removes
                # the proposal's component-hitting bias, the residual the
                # 1-flip chain provably cannot move (MH_CHAIN_STUDY.json)
                samplers.append(("diffusion_mh_xor", XorCellJumpRefiner(
                    cnf, DiffusionSampler(
                        diffusion_params, cfg, cnf,
                        diffusion_steps=args.diffusion_steps,
                        test_rounds=args.test_rounds, seed=7 + fi,
                        freeze_sat=False), seed=27 + fi)))
            if selected is not None:
                # parameterized temperature variants: the reverse kernel
                # factorizes per variable per step, so its per-step
                # commitments can be mis-calibrated even when the learned
                # marginals are right; `diffusion_nofreeze_t<T>` rescales
                # the denoiser logits by 1/T inside every reverse step
                # (sampler.py temperature), `diffusion_sample_t<T>` adds
                # the Bernoulli terminal draw (final_sample) on top.
                import re as _re
                for tok in sorted(selected):
                    m = _re.fullmatch(
                        r"diffusion_(nofreeze|sample)_t([0-9.]+)", tok)
                    if not m:
                        continue
                    samplers.append((tok, DiffusionSampler(
                        diffusion_params, cfg, cnf,
                        diffusion_steps=args.diffusion_steps,
                        test_rounds=args.test_rounds, seed=9 + fi,
                        freeze_sat=False,
                        final_sample=m.group(1) == "sample",
                        temperature=float(m.group(2)))))
            if selected is not None and "diffusion_latefreeze_mh" in selected:
                samplers.append(("diffusion_latefreeze_mh", MetropolisRefiner(
                    cnf, DiffusionSampler(
                        diffusion_params, cfg, cnf,
                        diffusion_steps=args.diffusion_steps,
                        test_rounds=args.test_rounds, seed=8 + fi,
                        freeze_from=args.diffusion_steps * 3 // 4),
                    seed=18 + fi)))

        if selected is not None:
            samplers = [(n_, s_) for n_, s_ in samplers if n_ in selected]
        for name, sampler in samplers:
            t0 = time.perf_counter()
            counts = sampler.samples(n_samples)
            elapsed = time.perf_counter() - t0
            stats = count_stats(counts, models, cnf, n_samples)
            stats["elapsed_s"] = round(elapsed, 2)
            stats["ms_per_distinct"] = round(
                1000 * elapsed / max(len(counts), 1), 2)
            if name.startswith("diffusion"):
                stats["success_rate"] = getattr(sampler, "success_rate",
                                                None)
            record[name] = {"counts": {str(k): v
                                       for k, v in counts.items()},
                            **stats}
            agg.setdefault(name, []).append(stats)
            print(f"[formula {fi}] {name}: {stats}", flush=True)
        store.write(clauses, record)

    summary = {}
    for name, rows in agg.items():
        summary[name] = {
            "mean_diversity": round(float(np.mean(
                [r["diversity"] for r in rows])), 4),
            "median_chi2_p": round(float(np.median(
                [r["chi2_p"] for r in rows])), 6),
            "mean_entropy_gap": round(float(np.mean(
                [r["uniform_entropy"] - r["count_entropy"]
                 for r in rows])), 4),
        }
    print(json.dumps({"summary": summary}, indent=1))
    if args.summary_out:
        from pathlib import Path
        Path(args.summary_out).write_text(json.dumps(summary, indent=1))
    return summary


if __name__ == "__main__":
    main()
