"""Scalability study for the XOR-cell jump sampler: uniformity on
formulas with 100x the solution count of the flagship battery.

The flagship uniformity battery runs on 10-16 var / 20-32 solution
formulas where everything is enumerable. This study checks the
walksat -> XorCellJumpRefiner stack (our scalable Unigen-slot sampler:
reference `satuniformity/UnigenSampler.py:12-35`) on 20-26 var formulas
with hundreds-to-thousands of solutions — large enough that per-jump
cells (count/2^m models) are the only thing ever enumerated during
sampling, while ground truth remains enumerable for exact TVD/chi2.

Host-only (DSAT_FORCE_CPU=1, native CDCL; no TPU contact):

    DSAT_FORCE_CPU=1 python benchmarks/xor_jump_scale.py \
        --out XOR_JUMP_SCALE.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from diffusionsat_tpu.sat.cnf import CNF  # noqa: E402
from diffusionsat_tpu.sat.solvers import enumerate_models  # noqa: E402
from diffusionsat_tpu.uniformity.samplers import (  # noqa: E402
    ExactUniformSampler,
    WalkSatSampler,
    XorCellJumpRefiner,
)


def gen_large_formulas(n_formulas: int, seed: int = 0,
                       min_vars: int = 20, max_vars: int = 26,
                       min_solutions: int = 500,
                       max_solutions: int = 5000):
    """Random 3-SAT at a slightly sub-threshold ratio (denser formulas at
    these sizes rarely have >500 solutions)."""
    rng = np.random.default_rng(seed)
    out = []
    while len(out) < n_formulas:
        n = int(rng.integers(min_vars, max_vars + 1))
        m = int(3.8 * n)
        clauses = [[int(v) if rng.random() < 0.5 else -int(v)
                    for v in (rng.choice(n, size=3, replace=False) + 1)]
                   for _ in range(m)]
        models, complete = enumerate_models(clauses, n,
                                            max_models=max_solutions + 1)
        if complete and min_solutions <= len(models) <= max_solutions:
            out.append((n, clauses, models))
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n_formulas", type=int, default=3)
    p.add_argument("--k", type=int, default=5,
                   help="samples per true solution")
    p.add_argument("--n_jumps", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="XOR_JUMP_SCALE.json")
    args = p.parse_args(argv)

    from benchmarks.mh_chain_length import stats_for

    formulas = gen_large_formulas(args.n_formulas, seed=args.seed)
    print(f"{len(formulas)} formulas: "
          f"{[(n, len(m)) for n, _, m in formulas]}", flush=True)

    rows = []
    for fi, (n, clauses, models) in enumerate(formulas):
        cnf = CNF(n_vars=n, clauses=clauses)
        n_samples = args.k * len(models)
        rec = {"formula": fi, "n_vars": n, "n_clauses": len(clauses),
               "n_solutions": len(models), "n_samples": n_samples}
        for name, sampler in [
            ("uniform", ExactUniformSampler(cnf, seed=1 + fi)),
            ("walksat", WalkSatSampler(cnf, seed=2 + fi,
                                       max_flips=50_000)),
            ("walksat_mh_xor", XorCellJumpRefiner(
                cnf, WalkSatSampler(cnf, seed=2 + fi, max_flips=50_000),
                n_jumps=args.n_jumps, seed=22 + fi)),
        ]:
            t0 = time.perf_counter()
            counts = sampler.samples(n_samples)
            elapsed = time.perf_counter() - t0
            st = stats_for(counts, models, cnf)
            st["elapsed_s"] = round(elapsed, 1)
            if name == "walksat_mh_xor":
                st["m"] = sampler._m
                st["ms_per_jump"] = round(
                    1000 * elapsed / (args.n_jumps * n_samples), 2)
            rec[name] = st
            print(f"[formula {fi}] {name}: {st}", flush=True)
        rows.append(rec)

    summary = {}
    for name in ("uniform", "walksat", "walksat_mh_xor"):
        summary[name] = {
            "median_chi2_p": float(np.median(
                [r[name]["chi2_p"] for r in rows])),
            "mean_tvd": round(float(np.mean(
                [r[name]["tvd"] for r in rows])), 4),
            "mean_diversity": round(float(np.mean(
                [r[name]["diversity"] for r in rows])), 4),
        }
    out = {"formulas": [(r["n_vars"], r["n_solutions"]) for r in rows],
           "n_jumps": args.n_jumps, "summary": summary,
           "per_formula": rows}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
