"""Assemble the solve-vs-diversity Pareto table across the checkpoint
chain (VERDICT round-2 'next' #3: characterize the regression from 89.1%
single-try at 12k steps to 82.4% at the full 167k schedule).

Solving = pinned-noise (1.0) graphs-solved fraction (solve_eval.py).
Diversity = raw-sampler mean entropy gap to uniform + median chi2 p from
the 8-formula battery (uniformity_benchmark.py, diffusion_nofreeze —
no MH refinement, no freeze).

Reads whichever artifacts exist, emits PARETO_SOLVE_DIVERSITY.json.
Historical points (round-1/2 readings committed in STATUS/JSONs) are
pinned inline with their provenance.
"""

from __future__ import annotations

import json
import pathlib

ROOT = pathlib.Path(__file__).parent.parent


def read(path, *keys, default=None):
    p = ROOT / path
    if not p.exists():
        return default
    try:
        d = json.loads(p.read_text())
        for k in keys:
            d = d[k]
        return d
    except (KeyError, json.JSONDecodeError):
        return default


def main():
    rows = []

    # historical fixed points (provenance: committed round-1/2 artifacts)
    rows.append({
        "checkpoint": "single-label 12k steps (round 1)",
        "solved_t1": 0.891, "source_solve": "STATUS.md round-1 reading",
        "entropy_gap_raw": None,
        "note": "early-schedule ckpt; not retained as npz",
    })
    rows.append({
        "checkpoint": "single-label 167k (query_sat_3sat_diffusion.npz)",
        "solved_t1": read("SOLVE_EVAL_SL.json", "total_accuracy"),
        "solved_t4": read("SOLVE_EVAL_SL_T4.json", "total_accuracy"),
        "entropy_gap_raw": read("UNIFORMITY_SUMMARY_LIVE_XOR.json",
                                "diffusion_nofreeze", "mean_entropy_gap"),
        "chi2_p_raw": read("UNIFORMITY_SUMMARY_LIVE_XOR.json",
                           "diffusion_nofreeze", "median_chi2_p"),
    })
    rows.append({
        "checkpoint": "multi-label 54k (query_sat_3sat_diffusion_ml.npz)",
        "solved_t1": read("SOLVE_EVAL_ML54K.json", "total_accuracy"),
        "entropy_gap_raw": read("UNIFORMITY_SUMMARY_ML_FULL.json",
                                "diffusion_nofreeze", "mean_entropy_gap"),
        "chi2_p_raw": read("UNIFORMITY_SUMMARY_ML_FULL.json",
                           "diffusion_nofreeze", "median_chi2_p"),
    })
    rows.append({
        "checkpoint": "multi-label 167k (query_sat_3sat_diffusion_ml167k"
                      ".npz)",
        "solved_t1": read("SOLVE_EVAL_ML167K.json", "total_accuracy"),
        "solved_t4": read("SOLVE_EVAL_ML167K_T4.json", "total_accuracy"),
        "entropy_gap_raw": read("UNIFORMITY_SUMMARY_ML167K.json",
                                "diffusion_nofreeze", "mean_entropy_gap"),
        "chi2_p_raw": read("UNIFORMITY_SUMMARY_ML167K.json",
                           "diffusion_nofreeze", "median_chi2_p"),
    })

    uniform_floor = {
        "entropy_gap": read("UNIFORMITY_SUMMARY_ML167K.json",
                            "uniform", "mean_entropy_gap",
                            default=read("UNIFORMITY_SUMMARY_ML_FULL.json",
                                         "uniform", "mean_entropy_gap")),
        "chi2_p": read("UNIFORMITY_SUMMARY_ML167K.json",
                       "uniform", "median_chi2_p",
                       default=read("UNIFORMITY_SUMMARY_ML_FULL.json",
                                    "uniform", "median_chi2_p")),
    }

    out = {
        "metric_defs": {
            "solved_t1": "graphs fully solved, noise pinned 1.0, 1 try, "
                         "full 2000-instance testset",
            "solved_t4": "same with 4 prediction tries",
            "entropy_gap_raw": "mean ln-entropy gap to uniform of the "
                               "RAW diffusion sampler (no MH, no freeze)",
            "chi2_p_raw": "median chi-square p of the raw sampler",
        },
        "uniform_floor": uniform_floor,
        "points": rows,
    }
    print(json.dumps(out, indent=1))
    (ROOT / "PARETO_SOLVE_DIVERSITY.json").write_text(
        json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
