"""Markdown table over uniformity battery summaries + per-formula p
values from the raw battery jsonl (the widened-panel reporting tool,
VERDICT r4 item 3: every claim citable to committed per-formula data).

    python benchmarks/panel_table.py \
        --summary iso45full=UNIFORMITY_SUMMARY_ISO45FULL_P24.json \
        --summary rw1=UNIFORMITY_SUMMARY_RW1_P24.json \
        --jsonl iso45full=benchmarks_iso45full_p24.jsonl \
        --out PANEL_P24.md
"""

from __future__ import annotations

import argparse
import json
from collections import defaultdict
from pathlib import Path

import numpy as np


def load_jsonl_pvalues(path: str) -> dict[str, list[float]]:
    per_variant = defaultdict(list)
    for line in Path(path).read_text().splitlines():
        if not line.strip():
            continue
        rec = json.loads(line)
        for key, val in rec.items():
            if isinstance(val, dict) and "chi2_p" in val:
                per_variant[key].append(
                    (rec.get("formula"), rec.get("n_solutions"),
                     val["chi2_p"]))
    return per_variant


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--summary", action="append", default=[],
                    help="label=path.json")
    ap.add_argument("--jsonl", action="append", default=[],
                    help="label=path.jsonl (per-formula p values)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    lines = ["| checkpoint | sampler | median chi² p | mean entropy gap "
             "| diversity |", "|---|---|---|---|---|"]
    for item in args.summary:
        label, path = item.split("=", 1)
        d = json.loads(Path(path).read_text())
        for variant, stats in d.items():
            lines.append(
                f"| {label} | {variant} | {stats['median_chi2_p']:.4g} | "
                f"{stats['mean_entropy_gap']:.4f} | "
                f"{stats['mean_diversity']:.3f} |")
    table = "\n".join(lines)
    print(table)

    extra = []
    for item in args.jsonl:
        label, path = item.split("=", 1)
        pv = load_jsonl_pvalues(path)
        for variant, rows in sorted(pv.items()):
            ps = [p for _, _, p in rows]
            frac05 = float(np.mean([p >= 0.05 for p in ps]))
            extra.append(
                f"- **{label} / {variant}** ({len(ps)} formulas): "
                f"p ≥ 0.05 on {frac05:.0%}; per-formula p = "
                + ", ".join(f"{p:.3g}" for p in ps))
    if extra:
        print("\n".join(extra))
    if args.out:
        Path(args.out).write_text(table + "\n\n" + "\n".join(extra) + "\n")


if __name__ == "__main__":
    main()
