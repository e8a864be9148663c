"""ANF per-var -> per-system gap analysis + CDCL-assisted completion.

Round-3 verdict item 4: the full-schedule ANF model reads ~91% per-var
accuracy but only ~14% systems solved (ANF_EVAL_130K.json). This tool
answers WHY and implements the recovery lever:

Phase 1 (structure): for every test system, measure how the wrong
variables sit — count, the number of equations they touch, and the
*confidence cover size*: sorting variables by prediction confidence
(|logit|), how many of the least-confident variables must be released so
that every wrong variable is released. If errors rank low-confidence,
fixing the confident majority and solving the rest is sound.

Phase 2 (CDCL completion): fix the top-confidence (1-f) fraction of
variables to the model's bits, substitute into the ANF equations, encode
the residual system to CNF (AND terms -> Tseitin aux, XOR chains -> 4
clauses per 3-ary gate), and solve with the in-process native CDCL
(sat/native/solver.cpp). Ladder f over --release_fracs; a system counts
solved at the first f whose residual is SAT and whose completed
assignment satisfies every equation (host-checked). This is the
"fix high-confidence vars, solve the rest" lever on the reference's
ANFSAT task (reference model/anf_sat.py:230-279, metrics/anf_metrics.py).

    python anf_error_structure.py --ckpt pretrained/anf_sat_sha1_r17_130k.npz \
        --test_rounds 64 --out ANF_ERROR_STRUCTURE.json
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax


from diffusionsat_tpu.sat.anf_completion import (  # noqa: E402
    encode_residual_cnf,
    eval_equations,
    extract_graph_equations,
)

def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--rounds", type=int, default=17)
    p.add_argument("--min_free_bits", type=int, default=2)
    p.add_argument("--max_free_bits", type=int, default=20)
    p.add_argument("--train_size", type=int, default=8000)
    p.add_argument("--test_size", type=int, default=256)
    p.add_argument("--test_rounds", type=int, default=64)
    p.add_argument("--feature_maps", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_vars", type=int, default=8192)
    p.add_argument("--max_ands", type=int, default=16384)
    p.add_argument("--max_clauses", type=int, default=8704)
    p.add_argument("--max_edges", type=int, default=32768)
    p.add_argument("--max_graphs", type=int, default=8)
    p.add_argument("--max_batches", type=int, default=0)
    p.add_argument("--release_fracs", default="0.05,0.1,0.2,0.35,0.5")
    p.add_argument("--conflict_budget", type=int, default=500_000)
    p.add_argument("--skip_frac_ladder", action="store_true",
                   help="skip the confidence-fraction CDCL ladder (phase 2)")
    p.add_argument("--input_anchor", action="store_true",
                   help="phase 3: fix ONLY the model's predicted free-input "
                        "bits (the circuit's true degrees of freedom, "
                        "<=20 per system), release every derived var, and "
                        "CDCL-propagate; ladder by releasing the "
                        "least-confident inputs")
    p.add_argument("--anchor_release", default="0,2,4,8,all",
                   help="ladder of how many least-confident inputs to "
                        "release in the input-anchor phase")
    p.add_argument("--anchor_budget", type=int, default=100_000,
                   help="CDCL conflict budget per input-anchor attempt "
                        "(the 'all' rung is a solve-from-scratch; keep "
                        "bounded)")
    p.add_argument("--deadline_s", type=float, default=0,
                   help="stop taking new batches after this many seconds "
                        "(partial summary still written)")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    from diffusionsat_tpu.data.anf_datasets import AnfDataset
    from diffusionsat_tpu.data.sha_anf import Sha1AnfInstances
    from diffusionsat_tpu.graph.anf_batch import ANFBucket
    from diffusionsat_tpu.models.anf_sat import (
        ANFSATConfig, anf_sat_apply, anf_sat_init)
    from diffusionsat_tpu.sat.solvers import solve
    from diffusionsat_tpu.train.checkpoint import restore_model_params

    inst = Sha1AnfInstances(
        rounds=args.rounds, min_free_bits=args.min_free_bits,
        max_free_bits=args.max_free_bits, train_size=args.train_size,
        test_size=args.test_size, seed=args.seed)
    bucket = ANFBucket(max_vars=args.max_vars, max_ands=args.max_ands,
                       max_clauses=args.max_clauses,
                       max_edges=args.max_edges, max_graphs=args.max_graphs)
    name = (f"sha1anf_r{args.rounds}_fb{args.min_free_bits}_"
            f"{args.max_free_bits}_{args.train_size}")
    ds = AnfDataset(inst, bucket, name=name, seed=args.seed)
    test_batches = ds.test_data()
    if args.max_batches:
        test_batches = test_batches[:args.max_batches]
    print(f"{len(test_batches)} test batches", flush=True)

    cfg = ANFSATConfig(feature_maps=args.feature_maps,
                       query_maps=args.feature_maps,
                       test_rounds=args.test_rounds)
    params = restore_model_params(args.ckpt, anf_sat_init, cfg)
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)

    predict = jax.jit(lambda pr, b, k: anf_sat_apply(
        pr, cfg, b, k, training=False)[0])

    fracs = [float(x) for x in args.release_fracs.split(",")]
    key = jax.random.key(9)

    systems = []        # per-system records
    solved_at: dict[float, int] = {f: 0 for f in fracs}
    n_sys = 0
    t_start = time.time()
    for bi, batch in enumerate(test_batches):
        key, sub = jax.random.split(key)
        dbatch = jax.device_put(batch, dev)
        logits = np.asarray(predict(params, dbatch, sub))  # [V, H]
        head = logits[:, 0]
        pred = (head > 0).astype(np.int8)   # sigmoid>0.5 <=> logit>0
        conf = np.abs(head)
        sols = np.asarray(batch.solutions)
        var_graph = np.asarray(batch.var_graph)
        graph_mask = np.asarray(batch.graph_mask) > 0
        geqs = extract_graph_equations(batch)

        for g in np.where(graph_mask)[0]:
            g = int(g)
            vids = np.where(var_graph == g)[0]
            if len(vids) == 0 or g not in geqs:
                continue
            n_sys += 1
            bits_pred = {int(v): int(pred[v]) for v in vids}
            wrong = vids[pred[vids] != sols[vids]]
            eqs = geqs[g]
            full_bits = np.zeros(int(np.max(vids)) + 1, dtype=np.int8)
            full_bits[vids] = pred[vids]
            eq_ok = eval_equations(eqs, full_bits)
            # confidence cover: ascending-confidence rank of the worst
            # -ranked wrong var, as a fraction of the system's vars
            order = vids[np.argsort(conf[vids])]
            rank_of = {int(v): i for i, v in enumerate(order)}
            cover = (max(rank_of[int(w)] for w in wrong) + 1
                     ) / len(vids) if len(wrong) else 0.0

            rec = {
                "n_vars": int(len(vids)),
                "n_eqs": int(len(eqs)),
                "n_wrong": int(len(wrong)),
                "n_unsat_eqs": int((eq_ok == 0).sum()),
                "confidence_cover_frac": round(float(cover), 4),
                "already_solved": bool((eq_ok == 1).all()),
            }
            # CDCL completion ladder
            # free-input identification: the SHA circuit is feed-forward,
            # so every gate-defining equation's max var id is the gate
            # output it defines; output-fix equations constrain gate
            # outputs too. Free message-bit inputs are exactly the vars
            # that are no equation's max var.
            defined = set()
            for parity, terms in eqs:
                vs = [t[1] for t in terms if t[0] == "v"] + \
                     [x for t in terms if t[0] == "a" for x in (t[1], t[2])]
                if vs:
                    defined.add(max(vs))
            free_inputs = [int(v) for v in vids if int(v) not in defined]
            rec["n_free_inputs"] = len(free_inputs)
            rec["wrong_free_inputs"] = int(
                sum(1 for v in free_inputs if pred[v] != sols[v]))

            if args.input_anchor and not bool((eq_ok == 1).all()):
                rec["anchor_solved_at"] = None
                anchor_order = sorted(free_inputs, key=lambda v: conf[v])
                for spec in args.anchor_release.split(","):
                    k_rel = len(free_inputs) if spec == "all" else \
                        min(int(spec), len(free_inputs))
                    fixed = {v: int(pred[v]) for v in anchor_order[k_rel:]}
                    released = [v for v in vids if v not in fixed]
                    enc = encode_residual_cnf(eqs, fixed, released)
                    if enc is None:
                        continue
                    clauses, ncnf, var2cnf = enc
                    try:
                        sat, model = solve(
                            clauses, ncnf,
                            conflict_budget=args.anchor_budget)
                    except TimeoutError:
                        continue
                    if not sat:
                        continue
                    bits = dict(fixed)
                    for v, c in var2cnf.items():
                        bits[v] = 1 if model[c - 1] > 0 else 0
                    fb = np.zeros(int(np.max(vids)) + 1, dtype=np.int8)
                    for v, b in bits.items():
                        fb[v] = b
                    if (eval_equations(eqs, fb) == 1).all():
                        rec["anchor_solved_at"] = spec
                        break
            elif args.input_anchor:
                rec["anchor_solved_at"] = "0"

            rec["solved_at_frac"] = None
            if rec["already_solved"]:
                rec["solved_at_frac"] = 0.0
                for f in fracs:
                    solved_at[f] += 1
            elif not args.skip_frac_ladder:
                for f in fracs:
                    k = max(1, int(round(f * len(vids))))
                    released = [int(v) for v in order[:k]]
                    fixed = {v: b for v, b in bits_pred.items()
                             if v not in set(released)}
                    enc = encode_residual_cnf(eqs, fixed, released)
                    if enc is None:
                        continue
                    clauses, ncnf, var2cnf = enc
                    try:
                        sat, model = solve(
                            clauses, ncnf,
                            conflict_budget=args.conflict_budget)
                    except TimeoutError:
                        continue
                    if not sat:
                        continue
                    bits = dict(fixed)
                    for v, c in var2cnf.items():
                        bits[v] = 1 if model[c - 1] > 0 else 0
                    fb = np.zeros(int(np.max(vids)) + 1, dtype=np.int8)
                    for v, b in bits.items():
                        fb[v] = b
                    if (eval_equations(eqs, fb) == 1).all():
                        rec["solved_at_frac"] = f
                        for f2 in fracs:
                            if f2 >= f:
                                solved_at[f2] += 1
                        break
            systems.append(rec)
        print(f"[batch {bi}] systems so far {n_sys}, "
              f"solved@max_frac {solved_at[fracs[-1]]} "
              f"({time.time() - t_start:.0f}s)", flush=True)
        if args.out:  # incremental partial write: a timeout loses nothing
            with open(args.out, "w") as f:
                json.dump({"summary": _summarize(args, systems, solved_at,
                                                 fracs, n_sys, t_start,
                                                 partial=True),
                           "systems": systems}, f)
        if args.deadline_s and time.time() - t_start > args.deadline_s:
            print(f"deadline_s reached after batch {bi}; stopping",
                  flush=True)
            break

    summary = _summarize(args, systems, solved_at, fracs, n_sys, t_start)
    print(json.dumps(summary, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"summary": summary, "systems": systems}, f)
    return summary


def _summarize(args, systems, solved_at, fracs, n_sys, t_start,
               partial=False):
    if not systems:
        return {"ckpt": args.ckpt, "n_systems": 0, "partial": partial}
    n = max(n_sys, 1)
    wrongs = np.array([r["n_wrong"] for r in systems])
    covers = np.array([r["confidence_cover_frac"] for r in systems])
    unsat = np.array([r["n_unsat_eqs"] for r in systems])
    summary = {
        "ckpt": args.ckpt,
        "test_rounds": args.test_rounds,
        "n_systems": n_sys,
        "raw_solved": round(float(np.mean([r["already_solved"]
                                           for r in systems])), 4),
        "per_var_accuracy": round(1.0 - float(
            wrongs.sum()) / max(sum(r["n_vars"] for r in systems), 1), 4),
        "wrong_vars_per_system": {
            "mean": round(float(wrongs.mean()), 2),
            "median": float(np.median(wrongs)),
            "p90": float(np.percentile(wrongs, 90)),
        },
        "unsat_eqs_per_system": {
            "mean": round(float(unsat.mean()), 2),
            "median": float(np.median(unsat)),
        },
        "confidence_cover_frac": {
            "mean": round(float(covers.mean()), 4),
            "median": round(float(np.median(covers)), 4),
            "p90": round(float(np.percentile(covers, 90)), 4),
        },
        "cdcl_solved_at_frac": {str(f): round(solved_at[f] / n, 4)
                                for f in fracs},
        "conflict_budget": args.conflict_budget,
        "elapsed_s": round(time.time() - t_start, 1),
    }
    if args.input_anchor:
        ladder = args.anchor_release.split(",")
        anchor = {}
        # cumulative solve rate at each ladder point (a system solved at
        # an earlier spec counts at every later one)
        solved_specs = [r.get("anchor_solved_at") for r in systems]
        for i, spec in enumerate(ladder):
            ok = sum(1 for s in solved_specs
                     if s is not None and s in ladder[:i + 1])
            anchor[spec] = round(ok / n, 4)
        summary["input_anchor_solved_at"] = anchor
        wf = np.array([r["wrong_free_inputs"] for r in systems])
        nf = np.array([max(r["n_free_inputs"], 1) for r in systems])
        summary["free_input_accuracy"] = round(
            1.0 - float(wf.sum()) / float(nf.sum()), 4)
        summary["systems_with_all_inputs_right"] = round(
            float((wf == 0).mean()), 4)
    if partial:
        summary["partial"] = True
    return summary


if __name__ == "__main__":
    main()
