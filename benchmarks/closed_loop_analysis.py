"""In-sample causal read of closed-loop per-solution reweighting.

Compares two `measure_bank_freq.py` count tables over the SAME training
batches — e.g. the iso45full baseline vs a fine-tune whose label
selection was tilted by -log of the baseline's measured frequencies —
and reports, per graph with enough distinct bank solutions:

- Spearman rho(counts_before, counts_after) over distinct solutions:
  the bias persists (rho > 0, the control fine-tune's signature) or was
  removed/inverted by the tilt (rho <= 0).
- OLS slope of log f_after on log f_before (both shrunk): 1 = bias
  unchanged, 0 = fully corrected, < 0 = overcorrected.
- TVD and entropy gap of each table's empirical distribution vs uniform
  over the graph's distinct bank solutions (support = the bank;
  before/after apples-to-apples).

CPU-only (numpy); run with env JAX_PLATFORM_NAME=cpu if the dataset
cache import chain touches jax.

    python benchmarks/closed_loop_analysis.py --before freq_iso45full.npz \
        --after freq_rw1_insample.npz --batches 16 --json CLOSED_LOOP.json
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def spearman(a: np.ndarray, b: np.ndarray) -> float:
    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    if ra.std() < 1e-12 or rb.std() < 1e-12:
        return 0.0
    return float(np.corrcoef(ra, rb)[0, 1])


def graph_stats(cb: np.ndarray, ca: np.ndarray, groups: np.ndarray,
                nb: int, na: int) -> dict | None:
    """Per-graph pairing over distinct solutions; None if < 4 distinct."""
    D = int(groups.max()) + 1
    if D < 4:
        return None
    first = np.array([np.argmax(groups == j) for j in range(D)])
    b = cb[first].astype(np.float64)
    a = ca[first].astype(np.float64)
    tb, ta = b.sum(), a.sum()
    if tb < D or ta < D:   # too few matched samples to say anything
        return None
    fb = (b + 0.5) / (tb + 0.5 * D)
    fa = (a + 0.5) / (ta + 0.5 * D)
    lb, la = np.log(fb), np.log(fa)
    lb_c = lb - lb.mean()
    slope = float((lb_c * (la - la.mean())).sum() / (lb_c ** 2).sum()) \
        if (lb_c ** 2).sum() > 1e-12 else 0.0
    uni = 1.0 / D
    return {
        "distinct": D,
        "rho": round(spearman(b, a), 4),
        "slope": round(slope, 4),
        "tvd_before": round(0.5 * np.abs(b / tb - uni).sum(), 4),
        "tvd_after": round(0.5 * np.abs(a / ta - uni).sum(), 4),
        "entgap_before": round(float(np.log(D) + (fb * np.log(fb)).sum()), 4),
        "entgap_after": round(float(np.log(D) + (fa * np.log(fa)).sum()), 4),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--before", required=True)
    ap.add_argument("--after", required=True)
    ap.add_argument("--batches", type=int, default=16)
    ap.add_argument("--train_size", type=int, default=60000)
    ap.add_argument("--label_samples", type=int, default=64)
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    from diffusionsat_tpu.config import RunConfig
    from diffusionsat_tpu.uniformity.reweight import row_groups
    import diffusion_training as dt
    cfg = RunConfig(train_size=args.train_size, test_size=2000,
                    min_vars=3, max_vars=30, max_nodes_per_batch=20000,
                    label_samples=args.label_samples)
    batches = dt.build_dataset(cfg).train_data().batches

    zb = np.load(args.before)
    za = np.load(args.after)
    nb = int(zb["n_chains"])
    na = int(za["n_chains"])
    per_graph = []
    for i in range(args.batches):
        if f"counts_{i}" not in zb or f"counts_{i}" not in za:
            break
        cb, ca = zb[f"counts_{i}"], za[f"counts_{i}"]
        flat = batches[i]
        sk = np.asarray(flat.solutions_k)
        vg = np.asarray(flat.var_graph)
        for g in range(int(flat.n_graphs)):
            rows = sk[:, vg == g]
            if rows.shape[1] == 0:
                continue
            st = graph_stats(cb[:, g], ca[:, g], row_groups(rows), nb, na)
            if st is not None:
                per_graph.append(st)

    def agg(key):
        v = np.array([g[key] for g in per_graph])
        return {"mean": round(float(v.mean()), 4),
                "median": round(float(np.median(v)), 4)}

    out = {
        "before": args.before, "after": args.after,
        "n_graphs": len(per_graph),
        "rho": agg("rho"), "slope": agg("slope"),
        "tvd_before": agg("tvd_before"), "tvd_after": agg("tvd_after"),
        "entgap_before": agg("entgap_before"),
        "entgap_after": agg("entgap_after"),
    }
    print(json.dumps(out, indent=1))
    if args.json:
        out["per_graph"] = per_graph
        Path(args.json).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
