"""Quantify the neural ANF "input prior" (VERDICT r4 item 5).

Unconstrained CDCL solves 100% of r17 SHA-1 preimage systems (<=20 free
bits), so the committed framing is that the neural model's value is the
*input prior* — its predicted free-message-bit marginals steer search.
This study tests that claim head-to-head on full (nothing-fixed) CNF
encodings of each system:

- plain        : CDCL, default phases (the no-model baseline)
- seed_free    : phases of the free INPUT bits = the model's predicted
                 bits; VSIDS activity primed so inputs are decided first,
                 highest-confidence first (inputs imply everything else
                 by propagation — this is where a prior can pay)
- seed_all     : phases of ALL ANF vars = predicted bits (diffuse prior)
- input_first  : activity primed on inputs but default phases — separates
                 the decision-ORDER effect from the polarity PRIOR
- oracle       : free-input phases = the true witness (ceiling: ~0
                 conflicts if inputs are decided first)

Metric: conflicts-to-solution per system (distribution), plus wall time.
Match: reference data/SHAGen2019.py:100-112 (the task generator whose
instances this studies); the reference has no solver-guidance path.

    python benchmarks/anf_prior_study.py --marginals ANF_MARG_R17.npz \
        --json ANF_PRIOR_R17.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_system(eqs, vids, prob, witness, budget, seed):
    from diffusionsat_tpu.sat.anf_completion import (
        encode_residual_cnf, free_inputs_of)
    from diffusionsat_tpu.sat.solvers import solve_seeded

    enc = encode_residual_cnf(eqs, {}, [int(v) for v in vids])
    if enc is None:
        return None
    clauses, ncnf, var2cnf = enc
    free = free_inputs_of(eqs, vids)
    pred = (prob > 0.5).astype(np.int8)
    conf = np.abs(2.0 * prob - 1.0)

    def arm(polarity_src, prime_inputs, use_conf_order=True):
        pol = np.full(ncnf, -1, np.int8)
        act = np.zeros(ncnf, np.float32)
        if polarity_src is not None:
            for v in (free if polarity_src in ("free", "oracle")
                      else list(vids)):
                v = int(v)
                c = var2cnf[v] - 1
                pol[c] = int(witness[v]) if polarity_src == "oracle" \
                    else int(pred[v])
        if prime_inputs:
            for v in free:
                c = var2cnf[int(v)] - 1
                act[c] = 10.0 + (float(conf[int(v)]) if use_conf_order
                                 else 0.0)
        t0 = time.perf_counter()
        try:
            sat, _, conflicts = solve_seeded(
                clauses, ncnf, seed=seed,
                polarity=pol if polarity_src is not None else None,
                activity=act if prime_inputs else None,
                conflict_budget=budget)
        except TimeoutError:
            return {"solved": False, "conflicts": budget,
                    "ms": round((time.perf_counter() - t0) * 1e3, 1)}
        return {"solved": bool(sat), "conflicts": conflicts,
                "ms": round((time.perf_counter() - t0) * 1e3, 1)}

    return {
        "n_free": len(free),
        "n_cnf_vars": ncnf,
        "n_cnf_clauses": len(clauses),
        "plain": arm(None, False),
        "seed_free": arm("free", True),
        "seed_all": arm("all", False),
        "input_first": arm(None, True, use_conf_order=False),
        "oracle": arm("oracle", True),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--marginals", required=True)
    ap.add_argument("--conflict_budget", type=int, default=2_000_000)
    ap.add_argument("--max_systems", type=int, default=0)
    ap.add_argument("--train_size", type=int, default=8000)
    ap.add_argument("--max_vars", type=int, default=8192)
    ap.add_argument("--max_ands", type=int, default=16384)
    ap.add_argument("--max_clauses", type=int, default=8704)
    ap.add_argument("--max_edges", type=int, default=32768)
    ap.add_argument("--max_graphs", type=int, default=8)
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    z = np.load(args.marginals)
    rounds = int(z["rounds"])
    mn, mx = int(z["min_free_bits"]), int(z["max_free_bits"])
    test_size = int(z["test_size"])
    seed = int(z["seed"])

    from diffusionsat_tpu.data.anf_datasets import AnfDataset
    from diffusionsat_tpu.data.sha_anf import Sha1AnfInstances
    from diffusionsat_tpu.graph.anf_batch import ANFBucket
    from diffusionsat_tpu.sat.anf_completion import extract_graph_equations

    inst = Sha1AnfInstances(rounds=rounds, min_free_bits=mn,
                            max_free_bits=mx, train_size=args.train_size,
                            test_size=test_size, seed=seed)
    bucket = ANFBucket(max_vars=args.max_vars, max_ands=args.max_ands,
                       max_clauses=args.max_clauses,
                       max_edges=args.max_edges, max_graphs=args.max_graphs)
    name = f"sha1anf_r{rounds}_fb{mn}_{mx}_{args.train_size}"
    ds = AnfDataset(inst, bucket, name=name, seed=seed)
    test_batches = ds.test_data()
    assert len(test_batches) == int(z["n_batches"]), \
        (len(test_batches), int(z["n_batches"]))

    systems = []
    for bi, batch in enumerate(test_batches):
        prob = z[f"prob_{bi}"]
        var_graph = np.asarray(batch.var_graph)
        sols = np.asarray(batch.solutions)
        geqs = extract_graph_equations(batch)
        for g in np.where(np.asarray(batch.graph_mask) > 0)[0]:
            g = int(g)
            vids = np.where(var_graph == g)[0]
            if len(vids) == 0 or g not in geqs:
                continue
            systems.append((geqs[g], vids, prob, sols))

    if args.max_systems:
        systems = systems[:args.max_systems]
    print(f"{len(systems)} systems (r{rounds}, fb {mn}-{mx})", flush=True)

    per = []
    for i, (eqs, vids, prob, sols) in enumerate(systems):
        r = run_system(eqs, vids, prob, sols, args.conflict_budget,
                       seed=1000 + i)
        if r is not None:
            per.append(r)
        if (i + 1) % 32 == 0:
            print(f"{i + 1}/{len(systems)} done", flush=True)

    arms = ["plain", "seed_free", "seed_all", "input_first", "oracle"]
    out = {"marginals": args.marginals, "rounds": rounds,
           "free_bits": [mn, mx], "n_systems": len(per),
           "conflict_budget": args.conflict_budget}
    for a in arms:
        c = np.array([p[a]["conflicts"] for p in per], np.float64)
        out[a] = {
            "solved": round(float(np.mean([p[a]["solved"] for p in per])), 4),
            "conflicts_median": float(np.median(c)),
            "conflicts_mean": round(float(c.mean()), 1),
            "conflicts_p90": float(np.percentile(c, 90)),
            "total_ms": round(float(sum(p[a]["ms"] for p in per)), 1),
        }
    base = np.array([p["plain"]["conflicts"] for p in per], np.float64)
    for a in arms[1:]:
        c = np.array([p[a]["conflicts"] for p in per], np.float64)
        wins = float(np.mean(c < base))
        ratio = np.median((base + 1) / (c + 1))
        out[a]["win_rate_vs_plain"] = round(wins, 4)
        out[a]["median_conflict_reduction_x"] = round(float(ratio), 3)
    print(json.dumps({k: v for k, v in out.items() if k != "per_system"},
                     indent=1))
    if args.json:
        out["per_system"] = per
        Path(args.json).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
