"""Noise-level sweep diagnostic (`plot_curve`, reference
diffusion_training.py:403-433): run the model at fixed noise scales
t/steps over test batches, recording loss / accuracy / solved-fraction
curves. Saved as a matplotlib PNG + JSON instead of TensorBoard images.
"""

from __future__ import annotations

import itertools
import json
from pathlib import Path

import numpy as np

import jax

from diffusionsat_tpu.models.query_sat import query_sat_apply
from diffusionsat_tpu.train.metrics import sat_accuracy


def noise_sweep(params, cfg, batches, steps: int = 20,
                out_prefix: str | Path | None = None,
                key=None) -> dict:
    """Returns {"noise": [...], "loss": [...], "accuracy": [...],
    "total_accuracy": [...]}; model runs with labels = stored solutions at
    each fixed noise scale (the reference's plot_step,
    model/query_sat.py:459-465)."""
    key = key if key is not None else jax.random.key(0)

    @jax.jit
    def plot_step(p, batch, noise_scale, k):
        logits, loss, _, _ = query_sat_apply(
            p, cfg, batch, k, training=False, labels=batch.solutions,
            noise_scale=noise_scale)
        return logits[:, 0], loss

    it = itertools.cycle(batches)
    curve = {"noise": [], "loss": [], "accuracy": [], "total_accuracy": []}
    for t in range(steps):
        noise_scale = t / steps
        batch = next(it)
        key, sub = jax.random.split(key)
        logits, loss = plot_step(params, batch, noise_scale, sub)
        acc, solved = sat_accuracy(np.asarray(logits)[:, None], batch)
        curve["noise"].append(noise_scale)
        curve["loss"].append(float(loss))
        curve["accuracy"].append(acc)
        curve["total_accuracy"].append(float(np.mean(solved)))

    if out_prefix is not None:
        out_prefix = Path(out_prefix)
        with open(f"{out_prefix}_noise_sweep.json", "w") as f:
            json.dump(curve, f)
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, axes = plt.subplots(1, 3, figsize=(12, 3))
            for ax, k in zip(axes, ["loss", "accuracy", "total_accuracy"]):
                ax.plot(curve["noise"], curve[k])
                ax.set_xlabel("noise scale")
                ax.set_title(k)
            fig.tight_layout()
            fig.savefig(f"{out_prefix}_noise_sweep.png", dpi=100)
            plt.close(fig)
        except Exception:
            pass
    return curve


def count_histogram_cross_entropy(counts_a: dict, counts_b: dict,
                                  bins: int = 10, max_count: int = 7
                                  ) -> float:
    """Cross-entropy between binned count histograms (reference
    diffusion_metrics.py `entropy_arr`/`binary_cross_entropy` analysis):
    histogram per-solution sample counts into `bins` buckets up to
    `max_count`, normalize, cross-entropy of a vs b."""
    def hist(counts):
        vals = np.asarray(list(counts.values()), dtype=np.float64)
        h, _ = np.histogram(np.clip(vals, 0, max_count), bins=bins,
                            range=(0, max_count))
        h = h.astype(np.float64)
        return h / max(h.sum(), 1.0)

    pa, pb = hist(counts_a), hist(counts_b)
    eps = 1e-12
    return float(-np.sum(pa * np.log(pb + eps)))
