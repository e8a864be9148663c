"""Consolidated uniformity report over benchmark JSONL records.

Reads one or more `benchmarks_*.jsonl` files produced by
`uniformity_benchmark.py` (reference analog: `diffusion_metrics.py`
offline analysis, reference `diffusion_metrics.py:130-159`) and prints a
per-sampler table of interpretable distribution distances vs the exact
uniform distribution over the formula's true solution set:

- diversity: distinct solutions found / true solution count
- TVD: total variation distance between the empirical sample
  distribution and exact-uniform (0 = uniform, 1 = disjoint); unseen
  solutions contribute their missing uniform mass
- entropy ratio: empirical entropy / log(n_solutions) (1 = uniform)
- chi2 p: the chi-square tail probability (small-sample sensitive)
- SAT rate: fraction of emitted samples that satisfy the formula

Usage:
    python uniformity_report.py benchmarks_flagship.jsonl \
        [benchmarks_flagship_latefreeze.jsonl ...] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import math
from collections import defaultdict


def record_stats(rec: dict, sampler: str) -> dict | None:
    d = rec.get(sampler)
    if not isinstance(d, dict) or "counts" not in d:
        return None
    counts = {int(k): v for k, v in d["counts"].items()}
    n_sol = rec["n_solutions"]
    total = sum(counts.values())
    if total == 0 or n_sol == 0:
        return None
    # TVD vs uniform over the true solution set: 0.5 * sum_s |p_s - 1/S|
    # (solutions never sampled contribute 1/S each)
    u = 1.0 / n_sol
    tvd = 0.5 * (sum(abs(c / total - u) for c in counts.values())
                 + (n_sol - len(counts)) * u)
    ent = -sum((c / total) * math.log(c / total) for c in counts.values())
    return {
        "diversity": len(counts) / n_sol,
        "tvd": tvd,
        "entropy_ratio": ent / math.log(n_sol) if n_sol > 1 else 1.0,
        "chi2_p": d.get("chi2_p"),
        "success_rate": d.get("success_rate"),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("files", nargs="+")
    p.add_argument("--json", default=None)
    args = p.parse_args(argv)

    # later files override earlier ones per (formula geometry, sampler):
    # a latefreeze-only rerun merges into the full-suite records
    merged: dict[tuple, dict] = {}
    for path in args.files:
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                fkey = (rec.get("formula"), rec.get("n_vars"),
                        rec.get("n_clauses"), rec.get("n_solutions"))
                for name in rec:
                    st = record_stats(rec, name)
                    if st is not None:
                        merged[(fkey, name)] = st
    per_sampler: dict[str, list[dict]] = defaultdict(list)
    for (_fkey, name), st in merged.items():
        per_sampler[name].append(st)

    summary = {}
    hdr = (f"{'sampler':24s} {'n':>3s} {'diversity':>9s} {'TVD':>6s} "
           f"{'H-ratio':>7s} {'med chi2 p':>10s} {'SAT rate':>8s}")
    print(hdr)
    print("-" * len(hdr))
    for name, rows in sorted(per_sampler.items()):
        div = sum(r["diversity"] for r in rows) / len(rows)
        tvd = sum(r["tvd"] for r in rows) / len(rows)
        hr = sum(r["entropy_ratio"] for r in rows) / len(rows)
        ps = sorted(r["chi2_p"] for r in rows if r["chi2_p"] is not None)
        med_p = ps[len(ps) // 2] if ps else float("nan")
        srs = [r["success_rate"] for r in rows
               if r.get("success_rate") is not None]
        sr = sum(srs) / len(srs) if srs else None
        summary[name] = {"n_formulas": len(rows),
                         "mean_diversity": round(div, 4),
                         "mean_tvd": round(tvd, 4),
                         "mean_entropy_ratio": round(hr, 4),
                         "median_chi2_p": med_p,
                         "mean_success_rate": (round(sr, 4)
                                               if sr is not None else None)}
        print(f"{name:24s} {len(rows):3d} {div:9.3f} {tvd:6.3f} "
              f"{hr:7.3f} {med_p:10.3g} "
              f"{sr if sr is not None else float('nan'):8.3f}")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
