"""Is the raw diffusion sampler's residual non-uniformity a stable
per-solution bias?

Loads uniformity-battery JSONLs (per-solution sample counts), pairs
formulas by their CNF hash key, and computes:

- Spearman rank correlation of per-solution relative frequencies between
  two samplers/models/temperatures. High correlation across independently
  trained models (k16 vs k64 banks) or across sampling temperatures
  means the SAME solutions are systematically over/under-sampled —
  a structural bias of the learned denoising posterior that no scalar
  calibration (temperature) can remove, which is the negative-result
  statement for raw-sampler chi2 uniformity (UNIFORMITY_ANALYSIS.md).
- Correlation of each solution's sampling frequency with its centrality
  in the solution set (mean Hamming distance to the other solutions):
  tests the "posterior mass concentrates on central solutions"
  hypothesis for WHY the bias exists.

    python benchmarks/solution_bias.py \
        --a benchmarks_mlk64_final_k40.jsonl --b benchmarks_ml167k_k40.jsonl \
        --a_variant diffusion_nofreeze --b_variant diffusion_nofreeze \
        --json SOLUTION_BIAS.json
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def spearman(x: np.ndarray, y: np.ndarray) -> float:
    rx = np.argsort(np.argsort(x)).astype(float)
    ry = np.argsort(np.argsort(y)).astype(float)
    if rx.std() == 0 or ry.std() == 0:
        return 0.0
    return float(np.corrcoef(rx, ry)[0, 1])


def load(path: str) -> dict:
    out = {}
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if "key" in rec:
                out[rec["key"]] = rec
    return out


def sol_bits(key_int: int, n_vars: int) -> np.ndarray:
    return np.array([(key_int >> i) & 1 for i in range(n_vars)],
                    dtype=np.int8)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True)
    ap.add_argument("--b", required=True)
    ap.add_argument("--a_variant", default="diffusion_nofreeze")
    ap.add_argument("--b_variant", default="diffusion_nofreeze")
    ap.add_argument("--a_name", default="a")
    ap.add_argument("--b_name", default="b")
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    A, B = load(args.a), load(args.b)
    shared = sorted(set(A) & set(B))
    per_formula = []
    for key in shared:
        ra, rb = A[key], B[key]
        va = ra.get(args.a_variant)
        vb = rb.get(args.b_variant)
        if not va or not vb or "counts" not in va or "counts" not in vb:
            continue
        sols = sorted(set(va["counts"]) | set(vb["counts"]))
        ca = np.array([va["counts"].get(s, 0) for s in sols], float)
        cb = np.array([vb["counts"].get(s, 0) for s in sols], float)
        ca /= max(ca.sum(), 1)
        cb /= max(cb.sum(), 1)
        rho_ab = spearman(ca, cb)

        n_vars = ra["n_vars"]
        bits = np.stack([sol_bits(int(s), n_vars) for s in sols])
        # centrality: negative mean Hamming distance to other solutions
        d = (bits[:, None, :] != bits[None, :, :]).sum(-1).astype(float)
        centrality = -d.mean(1)
        # fitted magnitude of the bias: OLS slope of log relative
        # frequency vs the z-scored mean distance ("isolation"). This is
        # the exponent the isolation-weighted training lever targets
        # (train/loop._select_labels): baseline k64 raw reads ~-0.19; a
        # successful counterweight drives it toward 0.
        K = len(sols)
        dbar = d.sum(1) / max(K - 1, 1)
        z = (dbar - dbar.mean()) / max(dbar.std(), 1e-9)
        slope_a = float(np.polyfit(z, np.log(ca + 1e-9), 1)[0])
        slope_b = float(np.polyfit(z, np.log(cb + 1e-9), 1)[0])
        per_formula.append({
            "slope_a_logfreq_per_z": round(slope_a, 4),
            "slope_b_logfreq_per_z": round(slope_b, 4),
            "formula": ra.get("formula"),
            "n_solutions": len(sols),
            "rho_freq_a_vs_b": round(rho_ab, 4),
            "rho_a_vs_centrality": round(spearman(ca, centrality), 4),
            "rho_b_vs_centrality": round(spearman(cb, centrality), 4),
        })

    rho_ab = [f["rho_freq_a_vs_b"] for f in per_formula]
    rho_ac = [f["rho_a_vs_centrality"] for f in per_formula]
    rho_bc = [f["rho_b_vs_centrality"] for f in per_formula]
    out = {
        "a": args.a, "b": args.b,
        "a_variant": args.a_variant, "b_variant": args.b_variant,
        "n_paired_formulas": len(per_formula),
        "mean_rho_freq_a_vs_b": round(float(np.mean(rho_ab)), 4),
        "mean_rho_a_vs_centrality": round(float(np.mean(rho_ac)), 4),
        "mean_rho_b_vs_centrality": round(float(np.mean(rho_bc)), 4),
        "mean_slope_a_logfreq_per_z": round(float(np.mean(
            [f["slope_a_logfreq_per_z"] for f in per_formula])), 4),
        "mean_slope_b_logfreq_per_z": round(float(np.mean(
            [f["slope_b_logfreq_per_z"] for f in per_formula])), 4),
        "per_formula": per_formula,
    }
    print(json.dumps({k: v for k, v in out.items() if k != "per_formula"},
                     indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
