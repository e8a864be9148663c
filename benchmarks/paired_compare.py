"""Paired cross-checkpoint uniformity comparison over benchmark JSONLs.

The battery formulas are a deterministic sequence (uniformity_benchmark.
gen_benchmark_formulas, seed 0), so records from different runs pair by
`formula` index. This tool compares one sampler variant across two
checkpoints' batteries — e.g. the raw diffusion proposal
(`diffusion_nofreeze`) from the multi-label posterior flagship vs the
single-label 167k flagship — and reports per-formula and mean entropy
gaps to uniform (the ML8K pilot's headline statistic, STATUS.md
'Multi-label posterior pilot').

    python benchmarks/paired_compare.py \
        --a benchmarks_ml_full.jsonl --b benchmarks_live_xor.jsonl \
        --a_name ml_full --b_name sl167k \
        --sampler diffusion_nofreeze --json PAIRED_ML_FULL.json
"""

from __future__ import annotations

import argparse
import json
import math


def load_variant(path: str, sampler: str) -> dict[int, dict]:
    """{formula_index: stats} for one sampler variant; later records for
    the same formula win (resumed batteries re-emit)."""
    out: dict[int, dict] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            d = rec.get(sampler)
            if not isinstance(d, dict) or "counts" not in d:
                continue
            counts = list(d["counts"].values())
            total = sum(counts)
            if total == 0:
                continue
            ent = -sum((c / total) * math.log(c / total) for c in counts)
            out[int(rec["formula"])] = {
                "entropy": round(ent, 4),
                "uniform_entropy": round(
                    float(math.log(max(rec["n_solutions"], 1))), 4),
                "entropy_gap": round(
                    float(math.log(max(rec["n_solutions"], 1))) - ent, 4),
                "diversity": d.get("diversity"),
                "chi2_p": d.get("chi2_p"),
                "success_rate": d.get("success_rate"),
            }
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--a", required=True, help="first battery JSONL")
    p.add_argument("--b", required=True, help="second battery JSONL")
    p.add_argument("--a_name", default="a")
    p.add_argument("--b_name", default="b")
    p.add_argument("--sampler", default="diffusion_nofreeze")
    p.add_argument("--json", default=None)
    args = p.parse_args(argv)

    va = load_variant(args.a, args.sampler)
    vb = load_variant(args.b, args.sampler)
    common = sorted(set(va) & set(vb))
    per_formula = {}
    for fi in common:
        per_formula[f"f{fi}"] = {args.a_name: va[fi], args.b_name: vb[fi]}

    def mean(xs):
        xs = [x for x in xs if x is not None]
        return round(sum(xs) / len(xs), 4) if xs else None

    summary = {
        "sampler": args.sampler,
        "n_paired_formulas": len(common),
        f"{args.a_name}_mean_entropy_gap": mean(
            [va[fi]["entropy_gap"] for fi in common]),
        f"{args.b_name}_mean_entropy_gap": mean(
            [vb[fi]["entropy_gap"] for fi in common]),
        f"{args.a_name}_mean_diversity": mean(
            [va[fi]["diversity"] for fi in common]),
        f"{args.b_name}_mean_diversity": mean(
            [vb[fi]["diversity"] for fi in common]),
        f"{args.a_name}_gaps": [va[fi]["entropy_gap"] for fi in common],
        f"{args.b_name}_gaps": [vb[fi]["entropy_gap"] for fi in common],
        f"{args.a_name}_chi2_p": [va[fi]["chi2_p"] for fi in common],
        f"{args.b_name}_chi2_p": [vb[fi]["chi2_p"] for fi in common],
        "per_formula": per_formula,
    }
    # ratio from unrounded means; a mean gap of exactly 0.0 (perfect
    # uniformity) is a valid denominator-zero case, not a missing value
    gas = [va[fi]["entropy_gap"] for fi in common]
    gbs = [vb[fi]["entropy_gap"] for fi in common]
    ga = sum(gas) / len(gas) if gas else None
    gb = sum(gbs) / len(gbs) if gbs else None
    if ga is not None and gb is not None and ga != 0:
        summary["gap_ratio_b_over_a"] = round(gb / ga, 3)
    print(json.dumps({k: v for k, v in summary.items()
                      if k != "per_formula"}, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(summary, f, indent=1)
    return summary


if __name__ == "__main__":
    main()
