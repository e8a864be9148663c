"""Metrics with the reference's sink contract.

Port of `metrics/base.py:5-53` and `metrics/sat_metrics.py`: each metric
accumulates over update_state(model_output, batch) calls and can log to
stdout / a JSON-lines file / an in-memory dict. TensorBoard scalars are
replaced by the JSONL sink (utils/summary.py analog, dependency-free).
"""

from __future__ import annotations

import json
from abc import ABC, abstractmethod
from pathlib import Path
from statistics import mean, median_high

import jax.numpy as jnp
import numpy as np

from diffusionsat_tpu.graph.batch import SatBatch
from diffusionsat_tpu.losses.sat import is_graph_sat


class Metric(ABC):
    """update/log contract (reference metrics/base.py:5-28)."""

    @abstractmethod
    def update_state(self, model_output: dict, batch: SatBatch) -> None:
        ...

    @abstractmethod
    def get_values(self, reset_state: bool = True) -> dict:
        ...

    def reset_state(self) -> None:
        ...

    def log_in_stdout(self, step: int | None = None, reset_state=True):
        vals = self.get_values(reset_state)
        prefix = f"[step {step}] " if step is not None else ""
        print(prefix + " ".join(f"{k}={v:.4f}" for k, v in vals.items()))

    def log_in_file(self, file: str, step: int | None = None,
                    reset_state=True):
        vals = self.get_values(reset_state)
        rec = {"step": step, **{k: float(v) for k, v in vals.items()}}
        with Path(file).open("a") as f:
            f.write(json.dumps(rec) + "\n")


class EmptyMetric(Metric):
    def update_state(self, model_output, batch):
        pass

    def get_values(self, reset_state=True):
        return {}


def sat_accuracy(predictions: jnp.ndarray, batch: SatBatch
                 ) -> tuple[float, np.ndarray]:
    """(per-variable accuracy vs stored solutions, per-graph solved bools)
    — the math of reference `SATAccuracyTF.accuracy`
    (metrics/sat_metrics.py:60-85)."""
    logits = predictions if predictions.ndim == 2 else predictions[:, None]
    logits_np = np.asarray(logits)
    pred_bits = np.round(1.0 / (1.0 + np.exp(-logits_np)))
    sols = np.asarray(batch.solutions)
    var_mask = np.asarray(batch.var_mask)
    n_vars = max(var_mask.sum(), 1.0)
    acc = float((np.equal(pred_bits[:, 0], sols) * var_mask).sum() / n_vars)
    solved = np.asarray(is_graph_sat(jnp.asarray(logits), batch))[:, 0]
    graph_mask = np.asarray(batch.graph_mask) > 0
    return acc, solved[graph_mask] > 0.5


class SATAccuracy(Metric):
    """Mean per-variable accuracy + fraction of fully solved graphs."""

    def __init__(self) -> None:
        self.accs: list[float] = []
        self.solved: list[np.ndarray] = []

    def update_state(self, model_output, batch):
        acc, solved = sat_accuracy(model_output["prediction"], batch)
        self.accs.append(acc)
        self.solved.append(solved)

    def get_values(self, reset_state=True):
        accs, solved = self.accs, self.solved
        out = {
            "accuracy": float(np.mean(accs)) if accs else 0.0,
            "total_accuracy": float(np.concatenate(solved).mean())
            if solved else 0.0,
        }
        if reset_state:
            self.reset_state()
        return out

    def reset_state(self):
        self.accs, self.solved = [], []


class SATAccuracySolver(Metric):
    """Solver-backed accuracy cross-check (reference `SATAccuracy`,
    metrics/sat_metrics.py:144-225): per graph, re-extract the formula,
    check the rounded prediction with the native CDCL solver (assumption
    solve), and compare per-variable bits against a solver model. An
    independent implementation of the same metric as SATAccuracy (the
    pure-array one) — the reference keeps both as a built-in cross-check.
    """

    def __init__(self) -> None:
        self.accs: list[float] = []
        self.correct: list[int] = []

    def update_state(self, model_output, batch):
        from diffusionsat_tpu.evaluation.harness import extract_formulas
        from diffusionsat_tpu.sat.cnf import check_assignment
        from diffusionsat_tpu.sat.solvers import solve

        logits = np.asarray(model_output["prediction"])
        pred_bits = (1.0 / (1.0 + np.exp(-logits)) > 0.5).astype(int)
        off = 0
        for n_vars, clauses in extract_formulas(batch):
            bits = pred_bits[off:off + n_vars].tolist()
            off += n_vars
            sat = check_assignment(clauses, bits)
            self.correct.append(1 if sat else 0)
            ok, model = solve(clauses, n_vars)
            assert ok, "dataset instance should be satisfiable"
            model_bits = [1 if l > 0 else 0 for l in model]
            eq = sum(int(a == b) for a, b in zip(bits, model_bits))
            self.accs.append(eq / max(n_vars, 1))

    def get_values(self, reset_state=True):
        out = {
            "accuracy": float(np.mean(self.accs)) if self.accs else 0.0,
            "total_accuracy": float(np.mean(self.correct))
            if self.correct else 0.0,
        }
        if reset_state:
            self.reset_state()
        return out

    def reset_state(self):
        self.accs, self.correct = [], []


class ANFAccuracy(Metric):
    """Per-variable and per-graph accuracy on ANF batches (reference
    `ANFAccuracyTF`, metrics/anf_metrics.py:5-66): a graph counts as
    correct when every equation evaluates to its target parity under the
    rounded prediction."""

    def __init__(self) -> None:
        self.accs: list[float] = []
        self.solved: list[float] = []
        self.free_accs: list[float] = []

    def update_state(self, model_output, batch):
        from diffusionsat_tpu.losses.anf import anf_value_real

        logits = np.asarray(model_output["prediction"])
        logits2 = logits[:, None] if logits.ndim == 1 else logits
        sols = np.asarray(batch.solutions)
        var_mask = np.asarray(batch.var_mask)
        pred_bits = (1.0 / (1.0 + np.exp(-logits2[:, 0])) > 0.5).astype(int)
        n = max(var_mask.sum(), 1.0)
        self.accs.append(float(((pred_bits == sols) * var_mask).sum() / n))

        # free message-bit input accuracy — the solving bottleneck for
        # input-anchored completion (ANF_ERROR_STRUCTURE*.json: ~76% here
        # vs ~93% overall on SHA-1 r17); surfacing it in-training makes
        # the free_input_upweight lever observable
        fim = getattr(batch, "free_input_mask", None)
        if fim is not None:
            fim = np.asarray(fim) * var_mask
            if fim.sum() > 0:
                self.free_accs.append(
                    float(((pred_bits == sols) * fim).sum() / fim.sum()))

        # clause values under the rounded prediction: bit b -> logits ±10
        hard = np.where(pred_bits == 1, -10.0, 10.0).astype(np.float32)
        cv, _, _ = anf_value_real(jnp.asarray(hard[:, None]), batch)
        cv = np.asarray(cv)[:, 0]
        clause_ok = (cv > 0.5).astype(np.float32)
        clause_graph = np.asarray(batch.clause_graph)
        g_mask = np.asarray(batch.graph_mask) > 0
        for g in np.where(g_mask)[0]:
            idx = clause_graph == g
            if idx.any():
                self.solved.append(float(clause_ok[idx].all()))

    def get_values(self, reset_state=True):
        out = {
            "accuracy": float(np.mean(self.accs)) if self.accs else 0.0,
            "total_accuracy": float(np.mean(self.solved))
            if self.solved else 0.0,
        }
        if self.free_accs:
            out["free_input_accuracy"] = float(np.mean(self.free_accs))
        if reset_state:
            self.reset_state()
        return out

    def reset_state(self):
        self.accs, self.solved, self.free_accs = [], [], []


class StepStatistics(Metric):
    """Mean/median rounds taken (reference metrics/sat_metrics.py:104-141)."""

    def __init__(self) -> None:
        self.steps: list[int] = []

    def update_state(self, model_output, batch):
        self.steps.append(int(model_output["steps_taken"]) + 1)

    def get_values(self, reset_state=True):
        out = {
            "mean_steps": mean(self.steps) if self.steps else 0.0,
            "median_steps": median_high(self.steps) if self.steps else 0.0,
        }
        if reset_state:
            self.reset_state()
        return out

    def reset_state(self):
        self.steps = []
