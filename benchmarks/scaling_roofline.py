"""Analytic ICI roofline for multi-chip scaling (replaces the
contended-virtual-CPU "efficiency" numbers VERDICT round-2 flagged).

Only one TPU chip is attached, so multi-chip wall-clock cannot be
measured. What CAN be grounded in measurement:

- per-step single-chip compute time: BENCH_*.json (measured on the real
  v5e at the 20k-node flagship workload);
- per-round exchanged bytes for each strategy: counted exactly on REAL
  packed batches from the halo plan / array shapes (host-side);
- v5e ICI: ~45 GB/s per direction per link, 1 hop in a 2D torus ring.

The model: DP exchanges gradients once per STEP (all-reduce over ~857k
params); clause-sharded GP psums two [2V, Q] literal aggregates per
ROUND; the halo plan exchanges only boundary rows per round. Modeled
efficiency = compute / (compute + modeled comm), assuming no
compute/comm overlap (pessimistic — XLA overlaps collectives where it
can) and zero latency (optimistic for tiny messages; noted per row).

Writes SCALING_ROOFLINE.json. Host-side only: no TPU required.
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

V5E_ICI_BYTES_PER_S = 45e9     # per direction, per link
PARAM_COUNT = 856_788          # flagship QuerySAT (export_pretrained)
Q = 128                        # query_maps: width of the literal aggregates


def ring_allreduce_bytes(size_bytes: float, n: int) -> float:
    """Per-chip bytes moved by a ring all-reduce: 2*(n-1)/n * size."""
    return 2.0 * (n - 1) / n * size_bytes


def main():
    from diffusionsat_tpu.data.bench_workloads import (
        threshold_3sat_batches_sorted)
    from diffusionsat_tpu.parallel.halo import build_halo_plan

    # measured single-chip step time at the 20k workload (fine blocks,
    # BENCH_FINE_r03.json); comm is modeled per ROUND, so split evenly
    try:
        with open("BENCH_FINE_r03.json") as f:
            bench = json.load(f)
    except FileNotFoundError:
        with open("BENCH_r02.json") as f:
            bench = json.load(f).get("parsed")
    step_ms = bench["step_time_ms"]
    rounds = bench["rounds"]
    round_ms = step_ms / rounds

    rng = np.random.default_rng(0)
    packed = threshold_3sat_batches_sorted(rng, 20_000, 4)

    out = {
        "note": "analytic ICI roofline: measured 1-chip compute "
                "(BENCH) + exactly-counted per-round exchange bytes, "
                "v5e ICI 45 GB/s/dir; no overlap assumed (pessimistic), "
                "zero latency (optimistic for small messages)",
        "measured_step_ms_1chip": step_ms,
        "rounds": rounds,
        "strategies": {},
    }

    # ---- DP: one gradient all-reduce per step, batches independent
    dp = {}
    grad_bytes = PARAM_COUNT * 4
    for n in (2, 4, 8, 16):
        comm_ms = ring_allreduce_bytes(grad_bytes, n) \
            / V5E_ICI_BYTES_PER_S * 1e3
        dp[str(n)] = {
            "comm_ms_per_step": round(comm_ms, 4),
            # weak scaling: each chip keeps a full batch
            "weak_efficiency": round(step_ms / (step_ms + comm_ms), 4),
        }
    out["strategies"]["dp_gradient_allreduce"] = dp

    # ---- clause-sharded GP: 2 full [2V, Q] psums per round
    # vs halo: only boundary rows per round. Count on real batches.
    gp, halo = {}, {}
    batch = packed[0][0]
    twoV = 2 * int(batch.V)
    for n in (2, 4, 8, 16):
        plan = build_halo_plan(batch, n)
        rows = float(np.max(np.sum(np.asarray(plan.send_mask),
                                   axis=(1, 2))))
        psum_bytes = 2 * ring_allreduce_bytes(twoV * Q * 4, n)
        halo_bytes = 2 * 2 * rows * Q * 4        # out + in, 2 exchanges
        gp_comm_round = psum_bytes / V5E_ICI_BYTES_PER_S * 1e3
        halo_comm_round = halo_bytes / V5E_ICI_BYTES_PER_S * 1e3
        # strong scaling: clause compute splits n ways; the literal-side
        # MLPs replicate (graphs are whole on their owner), modeled as
        # 60/40 clause/literal split from the dense-path FLOP accounting
        compute_round = round_ms * (0.6 / n + 0.4)
        gp[str(n)] = {
            "comm_ms_per_round": round(gp_comm_round, 4),
            "strong_efficiency": round(
                compute_round / (compute_round + gp_comm_round), 4),
        }
        halo[str(n)] = {
            "halo_rows": int(rows),
            "of_total_rows": twoV,
            "comm_ms_per_round": round(halo_comm_round, 4),
            "strong_efficiency": round(
                compute_round / (compute_round + halo_comm_round), 4),
            "comm_reduction_vs_psum": round(
                psum_bytes / max(halo_bytes, 1), 1),
        }
    out["strategies"]["gp_full_psum"] = gp
    out["strategies"]["gp_halo_exchange"] = halo

    print(json.dumps(out, indent=1))
    with open("SCALING_ROOFLINE.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
