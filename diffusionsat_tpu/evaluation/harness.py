"""Evaluation harness: generalization sweeps, invariance tests, baselines.

Ports of the reference's eval modes in `main.py:60-233,391-440`:
variable-count generalization, batch-size generalization, recurrence-depth
(test_rounds) generalization, model invariance under literal-polarity
inversion and variable permutation, classic-solver baselines, cactus CSVs.
"""

from __future__ import annotations

import csv
import itertools
import time
from pathlib import Path
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from diffusionsat_tpu.graph.batch import BucketSpec, SatBatch, build_batch
from diffusionsat_tpu.losses.sat import is_graph_sat
from diffusionsat_tpu.train.loop import evaluate_metrics, make_predict_step
from diffusionsat_tpu.train.metrics import SATAccuracy, StepStatistics


def evaluate_variable_generalization(params, model_cfg, make_dataset,
                                     results_file: str | Path,
                                     lower: int = 10, upper: int = 100,
                                     step: int = 10, test_size: int = 10):
    """Sweep var counts, eval each (reference main.py:102-122).
    make_dataset(min_vars, max_vars, test_size) -> iterable of SatBatch."""
    results = {}
    for var_count in range(lower, upper, step):
        data = make_dataset(var_count, var_count, test_size)
        vals = evaluate_metrics(params, model_cfg, data,
                                [SATAccuracy(), StepStatistics()],
                                jax.random.key(0))
        results[var_count] = vals
        with Path(results_file).open("a") as f:
            f.write(f"var_count={var_count}: {vals}\n")
    return results


def evaluate_round_generalization(params, model_cfg_factory, data,
                                  results_file: str | Path,
                                  rounds_list=None):
    """Sweep test_rounds 16..4096 (reference main.py:217-233).
    model_cfg_factory(test_rounds) -> model cfg for the same params."""
    rounds_list = rounds_list or [2 ** r for r in range(4, 13)]
    results = {}
    for rounds in rounds_list:
        cfg = model_cfg_factory(rounds)
        t0 = time.time()
        vals = evaluate_metrics(params, cfg, data,
                                [SATAccuracy(), StepStatistics()],
                                jax.random.key(0))
        vals["elapsed"] = time.time() - t0
        results[rounds] = vals
        with Path(results_file).open("a") as f:
            f.write(f"test_rounds={rounds}: {vals}\n")
    return results


def evaluate_batch_generalization(params, model_cfg, make_dataset,
                                  results_file: str | Path,
                                  sizes=range(3000, 24000, 1000)):
    """Sweep packing node budgets, time one predict step each
    (reference main.py:193-214)."""
    predict_step = make_predict_step(model_cfg)
    results = {}
    for budget in sizes:
        data = make_dataset(budget)
        batch = next(iter(data))
        t0 = time.time()
        out = predict_step(params, batch, jax.random.key(0))
        float(out["loss"])  # force execution
        elapsed = time.time() - t0
        results[budget] = elapsed
        with Path(results_file).open("a") as f:
            f.write(f"max_nodes_per_batch={budget}: {elapsed:.3f}s\n")
    return results


def evaluate_classic_solver(batches, steps: int | None = None) -> float:
    """Mean per-batch CDCL solve time over re-extracted formulas
    (reference main.py:147-157)."""
    from diffusionsat_tpu.sat.solvers import solve

    it = itertools.islice(batches, steps) if steps else batches
    total = 0.0
    count = 0
    for batch in it:
        for n_vars, clauses in extract_formulas(batch):
            t0 = time.perf_counter()
            solve(clauses, n_vars)
            total += time.perf_counter() - t0
        count += 1
    return total / max(count, 1)


def extract_formulas(batch: SatBatch) -> list[tuple[int, list[list[int]]]]:
    """Recover per-graph (n_vars, clauses) from a packed batch."""
    el = np.asarray(batch.edge_lit_c)
    ec = np.asarray(batch.edge_clause_c)
    em = np.asarray(batch.edge_mask_c) > 0
    var_graph = np.asarray(batch.var_graph)
    clause_graph = np.asarray(batch.clause_graph)
    nvpg = np.asarray(batch.n_vars_per_graph).astype(int)
    G = int(batch.n_graphs)
    V = batch.V

    var_offset = np.zeros(G, dtype=int)
    np.cumsum(nvpg[:G - 1], out=var_offset[1:]) if G > 1 else None

    clauses_by_id: dict[int, list[int]] = {}
    for l, c, m in zip(el, ec, em):
        if not m:
            continue
        v = l if l < V else l - V
        sign = 1 if l < V else -1
        g = var_graph[v]
        lit = sign * (v - var_offset[g] + 1)
        clauses_by_id.setdefault(c, []).append(int(lit))

    out = []
    for g in range(G):
        cls = [clauses_by_id[c] for c in sorted(clauses_by_id)
               if clause_graph[c] == g]
        out.append((int(nvpg[g]), cls))
    return out


def permute_batch_variables(batch: SatBatch, seed: int = 0) -> SatBatch:
    """Variable-permutation scrambler within each graph (the
    dimacs_shuffle.py invariance transform): relabel variables, keeping
    graph structure. Solutions are permuted consistently."""
    rng = np.random.default_rng(seed)
    V = batch.V
    var_graph = np.asarray(batch.var_graph)
    perm = np.arange(V)
    for g in range(int(batch.n_graphs)):
        idx = np.where(var_graph == g)[0]
        perm[idx] = rng.permutation(idx)
    el = np.asarray(batch.edge_lit_c).copy()
    mask = np.asarray(batch.edge_mask_c) > 0
    is_neg = el >= V
    v = np.where(is_neg, el - V, el)
    v_new = perm[v]
    el_new = np.where(is_neg, v_new + V, v_new)
    el_final = np.where(mask, el_new, el)

    inv = np.empty_like(perm)
    inv[perm] = np.arange(V)
    sols = np.asarray(batch.solutions)[inv]

    # rebuild literal-sorted ordering
    order_l = np.argsort(el_final, kind="stable")
    return batch.replace(
        edge_lit_c=jnp.asarray(el_final.astype(np.int32)),
        edge_lit_l=jnp.asarray(el_final[order_l].astype(np.int32)),
        edge_clause_l=jnp.asarray(
            np.asarray(batch.edge_clause_c)[order_l].astype(np.int32)),
        edge_mask_l=jnp.asarray(
            np.asarray(batch.edge_mask_c)[order_l].astype(np.float32)),
        edge_perm_l=jnp.asarray(order_l.astype(np.int32)),
        solutions=jnp.asarray(sols),
    )


def invert_batch_polarity(batch: SatBatch) -> SatBatch:
    """Swap positive/negative literal roles (reference invariance_inverse,
    main.py:421-432): every literal is negated, solutions flip."""
    V = batch.V
    el = np.asarray(batch.edge_lit_c)
    mask = np.asarray(batch.edge_mask_c) > 0
    el_new = np.where(el < V, el + V, el - V)
    el_final = np.where(mask, el_new, el)
    order_l = np.argsort(el_final, kind="stable")
    sols = (1 - np.asarray(batch.solutions)) * \
        (np.asarray(batch.var_mask) > 0)
    return batch.replace(
        edge_lit_c=jnp.asarray(el_final.astype(np.int32)),
        edge_lit_l=jnp.asarray(el_final[order_l].astype(np.int32)),
        edge_clause_l=jnp.asarray(
            np.asarray(batch.edge_clause_c)[order_l].astype(np.int32)),
        edge_mask_l=jnp.asarray(
            np.asarray(batch.edge_mask_c)[order_l].astype(np.float32)),
        edge_perm_l=jnp.asarray(order_l.astype(np.int32)),
        solutions=jnp.asarray(sols.astype(np.int32)),
    )


def test_invariance(params, model_cfg, batches, steps: int = 20) -> dict:
    """Predict on original / variable-permuted / polarity-inverted batches
    and compare solved rates (reference main.py:391-440)."""
    predict_step = make_predict_step(model_cfg)
    results = {"original": [], "permuted": [], "inverted": []}
    for i, batch in enumerate(itertools.islice(batches, steps)):
        for name, tfm in [("original", lambda b: b),
                          ("permuted",
                           lambda b: permute_batch_variables(b, seed=i)),
                          ("inverted", invert_batch_polarity)]:
            b = tfm(batch)
            out = predict_step(params, b, jax.random.key(i))
            logits = out["prediction"][:, None]
            solved = np.asarray(is_graph_sat(jnp.asarray(logits), b))[:, 0]
            gm = np.asarray(b.graph_mask) > 0
            results[name].append(float(solved[gm].mean()))
    return {k: float(np.mean(v)) for k, v in results.items()}


def make_cactus(params, model_cfg, batches, out_csv: str | Path,
                warmup_steps: int = 10):
    """Per-instance solve-or-not + time CSV (reference main.py:74-99)."""
    predict_step = make_predict_step(model_cfg)
    solved, var_count, time_used = [], [], []
    for step, batch in enumerate(batches):
        t0 = time.time()
        out = predict_step(params, batch, jax.random.key(step))
        float(out["loss"])
        elapsed = time.time() - t0
        if step < warmup_steps:
            continue
        logits = out["prediction"][:, None]
        sat_g = np.asarray(is_graph_sat(jnp.asarray(logits), batch))[:, 0]
        gm = np.asarray(batch.graph_mask) > 0
        nvpg = np.asarray(batch.n_vars_per_graph)[gm]
        sat_g = sat_g[gm]
        solved += [int(x) for x in sat_g]
        var_count += nvpg.astype(int).tolist()
        time_used += [elapsed / max(len(sat_g), 1)] * len(sat_g)
    rows = sorted(zip(var_count, solved, time_used))
    with Path(out_csv).open("w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["var_count", "solved", "time"])
        writer.writerows(rows)
    return rows
