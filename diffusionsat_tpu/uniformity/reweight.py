"""Closed-loop per-solution label reweighting.

The raw diffusion sampler's residual non-uniformity is a stable
per-solution bias: after the centrality (basin-volume) axis is zeroed by
isolation-weighted label selection (`graph/batch.attach_label_isolation`,
UNIFORMITY_ANALYSIS.md), an idiosyncratic per-solution residual remains
that no single covariate explains. This module closes the loop on the
*measured* bias instead of a proxy: sample the trained model on its own
TRAINING formulas (`measure_bank_freq.py`), count how often each bank row
is emitted, and tilt the training label-selection logits by
``-beta * log(freq_hat)`` so over-sampled solutions receive fewer label
draws on the next training pass. ``beta=1`` is exact inverse-frequency
reweighting (multiplicative-weights step toward the uniform fixed point).

Counterpart of the reference's uniformity program
(`/root/reference/satuniformity/DiffusionSampler.py:229-311`,
arXiv 2212.00121) — the reference evaluates uniformity but has no
training-side corrective; this is the corrective.
"""

from __future__ import annotations

import hashlib

import numpy as np


def batch_fingerprint(batch) -> str:
    """Stable identity of a packed batch for table alignment: the
    per-graph var counts + graph count + bank size. Catches cache
    rebuilds with different seeds/packing between measurement and
    training."""
    nv = np.asarray(batch.n_vars_per_graph).astype(np.int64)
    ng = int(batch.n_graphs)
    K = 0 if batch.solutions_k is None else int(batch.solutions_k.shape[0])
    h = hashlib.sha1()
    h.update(nv.tobytes())
    h.update(np.int64([ng, K]).tobytes())
    return h.hexdigest()[:16]


def row_groups(sol_rows: np.ndarray) -> np.ndarray:
    """Group ids [K] over a graph's bank rows: rows with identical content
    share an id. The bank draws solutions with replacement, so duplicate
    rows are one *solution* and must share one frequency estimate."""
    K = sol_rows.shape[0]
    _, inv = np.unique(sol_rows, axis=0, return_inverse=True)
    return inv.astype(np.int32).reshape(K)


def neglog_freq_logits(counts: np.ndarray, groups: np.ndarray,
                       tau: float = 0.5, clamp: float = 2.5) -> np.ndarray:
    """Per-row ``-log(freq_hat)`` selection logits from matched counts.

    `counts[k]` is the number of sampled assignments equal to bank row k
    (duplicate rows naturally carry identical counts — a sample matches
    every copy). Frequencies are estimated per distinct solution with
    shrinkage toward the graph's mean matched frequency (pseudo-count
    ``tau * total/D`` per distinct solution), so rows need counts well
    above Poisson noise before they get tilted. Output is centered over
    the K rows (softmax-invariant) and clamped to ±clamp.
    """
    counts = np.asarray(counts, np.float64)
    groups = np.asarray(groups)
    D = int(groups.max()) + 1 if groups.size else 1
    # total matched over distinct solutions (avoid double counting dups)
    first_idx = np.array([np.argmax(groups == j) for j in range(D)])
    total = float(counts[first_idx].sum())
    if total <= 0.0:
        return np.zeros(counts.shape[0], np.float32)
    prior = tau * total / D
    neglog = -np.log(counts + prior)
    neglog -= neglog.mean()
    return np.clip(neglog, -clamp, clamp).astype(np.float32)


def finalize_counts(batch, counts: np.ndarray, tau: float = 0.5,
                    clamp: float = 2.5) -> np.ndarray:
    """[K, ng] neglog-frequency logits for one flat batch from its
    measured per-row counts [K, ng] (real graphs only)."""
    sk = np.asarray(batch.solutions_k)
    var_graph = np.asarray(batch.var_graph)
    ng = int(batch.n_graphs)
    K = sk.shape[0]
    out = np.zeros((K, ng), np.float32)
    for g in range(ng):
        rows = sk[:, var_graph == g]
        if rows.shape[1] == 0:
            continue
        out[:, g] = neglog_freq_logits(counts[:, g], row_groups(rows),
                                       tau=tau, clamp=clamp)
    return out


def compose_label_logits(batch, iso_alpha: float, beta: float,
                         neglog: np.ndarray | None):
    """Attach combined per-row selection logits to a flat batch:
    ``iso_alpha * isolation + beta * neglog_freq`` padded to the batch's
    graph-slot count. The result lives in ``label_isolation_k`` and is
    consumed by ``train/loop._select_labels`` with ``isolation_alpha=1.0``
    (the field is the generic per-row logit channel; the scalar-alpha
    path is the special case ``beta=0``)."""
    from diffusionsat_tpu.graph.batch import attach_label_isolation

    K = batch.solutions_k.shape[0]
    G = batch.graph_mask.shape[0]
    logits = np.zeros((K, G), np.float32)
    if iso_alpha != 0.0:
        iso = np.asarray(attach_label_isolation(batch).label_isolation_k)
        logits += np.float32(iso_alpha) * iso
    if neglog is not None and beta != 0.0:
        ng = neglog.shape[1]
        logits[:, :ng] += np.float32(beta) * neglog.astype(np.float32)
    return batch.replace(label_isolation_k=logits)


def attach_logit_table(batches: list, table: dict, iso_alpha: float,
                       beta: float, require_all: bool = False) -> int:
    """Attach a measured frequency table (`measure_bank_freq.py` output
    npz, opened as a dict) to a training batch list in cache order.
    Batches without a measured entry (or with a fingerprint mismatch,
    i.e. a different cache build) fall back to the iso-only logits.
    Returns the number of batches that got measured logits."""
    n_measured = 0
    for i, b in enumerate(batches):
        neglog = table.get(f"neglog_{i}")
        fp = table.get(f"fingerprint_{i}")
        if neglog is not None and fp is not None and \
                str(np.asarray(fp)) != batch_fingerprint(b):
            raise ValueError(
                f"frequency table batch {i} fingerprint mismatch "
                f"({np.asarray(fp)} vs {batch_fingerprint(b)}): the table "
                "was measured on a different cache build")
        if neglog is None and require_all:
            raise ValueError(f"frequency table missing batch {i}")
        batches[i] = compose_label_logits(
            b, iso_alpha, beta, neglog if neglog is not None else None)
        if neglog is not None:
            n_measured += 1
    return n_measured
