"""Offline XOR-cell jump study: does the cross-component jump kernel
close the residual TVD/chi2 gap that MH_CHAIN_STUDY.json proved the
1-flip Metropolis chain cannot (it preserves component mass)?

Runs entirely on host (DSAT_FORCE_CPU=1, no TPU contact): benchmark
formulas are regenerated deterministically and the committed battery's
recorded sample counts seed the chains. By the Markov property, refining
the recorded `diffusion_nofreeze` end-states with XorCellJumpRefiner IS
the `diffusion_mh_xor` battery variant without re-running the diffusion
sampler.

    DSAT_FORCE_CPU=1 python benchmarks/xor_jump_study.py \
        --battery benchmarks_flagship_r2b.jsonl --out XOR_JUMP_STUDY.json
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from diffusionsat_tpu.sat.cnf import CNF  # noqa: E402
from diffusionsat_tpu.uniformity.samplers import (  # noqa: E402
    XorCellJumpRefiner,
)

from benchmarks.mh_chain_length import (  # noqa: E402
    _CountSeedSampler,
    stats_for,
)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--battery", default="benchmarks_flagship_r2b.jsonl")
    p.add_argument("--sampler", default="diffusion_nofreeze",
                   help="recorded variant whose end-states seed the jumps")
    p.add_argument("--n_jumps", default="2,4,8",
                   help="comma-separated jump counts to sweep")
    p.add_argument("--out", default="XOR_JUMP_STUDY.json")
    args = p.parse_args(argv)

    from uniformity_benchmark import gen_benchmark_formulas

    records = [json.loads(line) for line in open(args.battery)]
    n_formulas = max(r["formula"] for r in records) + 1
    formulas = gen_benchmark_formulas(n_formulas, seed=0)

    jump_counts = [int(s) for s in args.n_jumps.split(",")]
    per_j: dict[int, list] = {j: [] for j in jump_counts}
    for rec in records:
        fi = rec["formula"]
        n, clauses, models = formulas[fi]
        assert n == rec["n_vars"] and len(models) == rec["n_solutions"], \
            f"formula {fi} mismatch — wrong seed or battery file"
        cnf = CNF(n_vars=n, clauses=clauses)
        base_counts = {int(k): v
                       for k, v in rec[args.sampler]["counts"].items()}
        for j in jump_counts:
            ref = XorCellJumpRefiner(cnf, _CountSeedSampler(base_counts),
                                     n_jumps=j, seed=200 + fi)
            counts = ref.samples(sum(base_counts.values()))
            st = stats_for(counts, models, cnf)
            st["formula"] = fi
            st["m"] = ref._m
            per_j[j].append(st)
            print(f"formula {fi} jumps={j}: {st}", flush=True)

    summary = {}
    for j, rows in per_j.items():
        summary[f"jumps_{j}"] = {
            "median_chi2_p": float(np.median([r["chi2_p"] for r in rows])),
            "mean_tvd": round(float(np.mean([r["tvd"] for r in rows])), 4),
            "mean_diversity": round(
                float(np.mean([r["diversity"] for r in rows])), 4),
        }
    # baselines from the same battery: the seed variant as recorded, the
    # recorded diffusion_mh (1-flip refinement), and the exact-uniform
    # finite-sample floor
    for name in (args.sampler, "diffusion_mh", "uniform"):
        rows = []
        for rec in records:
            if name not in rec:
                continue
            fi = rec["formula"]
            n, clauses, models = formulas[fi]
            cnf = CNF(n_vars=n, clauses=clauses)
            counts = {int(k): v for k, v in rec[name]["counts"].items()}
            rows.append(stats_for(counts, models, cnf))
        if rows:
            summary[f"recorded_{name}"] = {
                "median_chi2_p": float(
                    np.median([r["chi2_p"] for r in rows])),
                "mean_tvd": round(
                    float(np.mean([r["tvd"] for r in rows])), 4),
            }
    out = {"battery": args.battery, "seed_sampler": args.sampler,
           "summary": summary, "per_formula": per_j}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
