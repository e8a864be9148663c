"""Compare training convergence per WALL-CLOCK between two runs.

For the 60k-vs-20k node-budget check (VERDICT r3 item 2): parses the
train_log.jsonl of two runs, reconstructs wall time from steps_per_sec,
and reports loss at matched wall-clock points plus final eval accuracy.

    python benchmarks/convergence_compare.py \
        --a runs_sanity/<conv20k>/train_log.jsonl --a_name 20k \
        --b runs_sanity/<conv60k>/train_log.jsonl --b_name 60k \
        --json CONV_20K_VS_60K.json
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def load_run(path: str):
    steps, losses, walls, evals = [], [], [], []
    t = 0.0
    last_step = 0
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if "loss" in rec and "steps_per_sec" in rec:
                ds = rec["step"] - last_step
                if rec["steps_per_sec"] > 0:
                    t += ds / rec["steps_per_sec"]
                last_step = rec["step"]
                steps.append(rec["step"])
                losses.append(rec["loss"])
                walls.append(t)
            elif "accuracy" in rec:
                evals.append({"step": rec.get("step"),
                              "accuracy": rec.get("accuracy"),
                              "total_accuracy": rec.get("total_accuracy")})
    return np.array(steps), np.array(losses), np.array(walls), evals


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True)
    ap.add_argument("--b", required=True)
    ap.add_argument("--a_name", default="a")
    ap.add_argument("--b_name", default="b")
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    sa, la, wa, ea = load_run(args.a)
    sb, lb, wb, eb = load_run(args.b)
    t_max = min(wa[-1], wb[-1]) if len(wa) and len(wb) else 0.0
    points = [t_max * f for f in (0.25, 0.5, 0.75, 1.0)]
    rows = []
    for t in points:
        ia = int(np.searchsorted(wa, t).clip(1, len(wa)) - 1)
        ib = int(np.searchsorted(wb, t).clip(1, len(wb)) - 1)
        rows.append({"wall_s": round(t, 1),
                     f"{args.a_name}_step": int(sa[ia]),
                     f"{args.a_name}_loss": round(float(la[ia]), 3),
                     f"{args.b_name}_step": int(sb[ib]),
                     f"{args.b_name}_loss": round(float(lb[ib]), 3)})
    out = {
        "a": args.a, "b": args.b,
        "matched_wallclock_loss": rows,
        f"{args.a_name}_final_eval": ea[-1] if ea else None,
        f"{args.b_name}_final_eval": eb[-1] if eb else None,
        f"{args.a_name}_steps_per_sec_mean": round(
            float(sa[-1] / wa[-1]), 2) if len(wa) else None,
        f"{args.b_name}_steps_per_sec_mean": round(
            float(sb[-1] / wb[-1]), 2) if len(wb) else None,
    }
    print(json.dumps(out, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
