"""Offline MH chain-length study: does a longer Metropolis chain close
the residual chi2 gap between `diffusion_mh` and exact-uniform?

Runs entirely on host (DSAT_FORCE_CPU=1, no TPU contact): benchmark
formulas are regenerated deterministically (uniformity_benchmark.py
seed=0 sequence) and the committed battery's per-sampler sample COUNTS
are used as chain seeds. By the Markov property, refining the recorded
`diffusion_mh` end-states for k more steps is exactly a (20n + k)-step
hybrid chain, so this measures longer-chain batteries without re-running
the diffusion sampler.

    DSAT_FORCE_CPU=1 python benchmarks/mh_chain_length.py \
        --battery benchmarks_flagship_r2b.jsonl --out MH_CHAIN_STUDY.json
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from diffusionsat_tpu.sat.cnf import CNF  # noqa: E402
from diffusionsat_tpu.uniformity.samplers import MetropolisRefiner  # noqa: E402


class _CountSeedSampler:
    """Adapter: replay recorded counts as a base sampler."""

    def __init__(self, counts: dict[int, int]):
        self._counts = counts

    def samples(self, n: int) -> dict[int, int]:
        return dict(self._counts)


def stats_for(counts: dict[int, int], models, cnf) -> dict:
    """count_stats (the battery's own keying + chi2) plus TVD."""
    from uniformity_benchmark import count_stats, keyed_uniform_ideal

    S = len(models)
    got = max(sum(counts.values()), 1)
    base = count_stats(counts, models, cnf, n_samples=got)
    keyed_ideal = keyed_uniform_ideal(models, cnf, got)
    # total variation distance from uniform over the true solution set
    tvd = 0.5 * (sum(abs(counts.get(k, 0) / got - 1.0 / S)
                     for k in keyed_ideal)
                 + sum(c / got for k, c in counts.items()
                       if k not in keyed_ideal))
    return {"distinct": base["distinct"], "chi2_p": base["chi2_p"],
            "tvd": round(float(tvd), 4),
            "diversity": base["diversity"]}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--battery", default="benchmarks_flagship_r2b.jsonl")
    p.add_argument("--sampler", default="diffusion_mh")
    p.add_argument("--extra_sweeps", default="0,80,380,1980",
                   help="additional MH steps per variable on top of the "
                        "recorded 20n-step chain")
    p.add_argument("--out", default="MH_CHAIN_STUDY.json")
    args = p.parse_args(argv)

    from uniformity_benchmark import gen_benchmark_formulas

    records = [json.loads(l) for l in open(args.battery)]
    n_formulas = max(r["formula"] for r in records) + 1
    formulas = gen_benchmark_formulas(n_formulas, seed=0)

    sweeps = [int(s) for s in args.extra_sweeps.split(",")]
    per_sweep: dict[int, list] = {s: [] for s in sweeps}
    for rec in records:
        fi = rec["formula"]
        n, clauses, models = formulas[fi]
        assert n == rec["n_vars"] and len(models) == rec["n_solutions"], \
            f"formula {fi} mismatch — wrong seed or battery file"
        cnf = CNF(n_vars=n, clauses=clauses)
        base_counts = {int(k): v
                       for k, v in rec[args.sampler]["counts"].items()}
        for s in sweeps:
            if s == 0:
                counts = base_counts
            else:
                ref = MetropolisRefiner(cnf, _CountSeedSampler(base_counts),
                                        n_steps=s * n, seed=100 + fi)
                counts = ref.samples(sum(base_counts.values()))
            st = stats_for(counts, models, cnf)
            st["formula"] = fi
            per_sweep[s].append(st)
            print(f"formula {fi} +{s}n: {st}", flush=True)

    summary = {}
    for s, rows in per_sweep.items():
        summary[f"extra_{s}n"] = {
            "median_chi2_p": float(np.median([r["chi2_p"] for r in rows])),
            "mean_tvd": round(float(np.mean([r["tvd"] for r in rows])), 4),
            "mean_diversity": round(
                float(np.mean([r["diversity"] for r in rows])), 4),
        }
    # exact-uniform finite-sample floor from the same battery
    uni = []
    for rec in records:
        fi = rec["formula"]
        n, clauses, models = formulas[fi]
        cnf = CNF(n_vars=n, clauses=clauses)
        counts = {int(k): v for k, v in rec["uniform"]["counts"].items()}
        uni.append(stats_for(counts, models, cnf))
    summary["exact_uniform_floor"] = {
        "median_chi2_p": float(np.median([r["chi2_p"] for r in uni])),
        "mean_tvd": round(float(np.mean([r["tvd"] for r in uni])), 4),
    }
    out = {"battery": args.battery, "sampler": args.sampler,
           "summary": summary, "per_formula": per_sweep}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
