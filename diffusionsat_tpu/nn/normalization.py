"""Graph-aware normalization layers (pure functions, no parameters).

Port of the reference `layers/normalization.py`: `PairNorm:27` subtracts the
per-graph mean (via the normalized membership matrix) and rescales each node
by the rms over its feature axis. The membership SpMMs become masked segment
means over the `var_graph`/`clause_graph` id vectors.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from diffusionsat_tpu.graph.batch import SatBatch
from diffusionsat_tpu.ops.graph_ops import (
    clause_segment_sum,
    graph_gather_clauses,
    graph_gather_vars,
    var_segment_sum,
)


def layer_norm(x: jnp.ndarray, axis: int | tuple = 1, epsilon: float = 1e-6,
               subtract_mean: bool = False, bias: jnp.ndarray | None = None
               ) -> jnp.ndarray:
    """RMS-style LayerNorm (reference layers/normalization.py:4-24)."""
    if subtract_mean:
        x = x - jnp.mean(x, axis=axis, keepdims=True)
        if bias is not None:
            x = x + bias
    variance = jnp.mean(jnp.square(x), axis=axis, keepdims=True)
    return x * lax.rsqrt(variance + epsilon)


def _pair_norm(x, mean_per_node, epsilon):
    x = x - mean_per_node
    variance = jnp.mean(jnp.square(x), axis=1, keepdims=True)
    return x * lax.rsqrt(variance + epsilon)


def pair_norm_vars(x: jnp.ndarray, batch: SatBatch, epsilon: float = 1e-6
                   ) -> jnp.ndarray:
    """PairNorm over variable nodes: subtract each variable's graph mean,
    then rms-normalize over the feature axis
    (reference layers/normalization.py:43-71 with subtract_mean=True)."""
    sums = var_segment_sum(batch, x * batch.var_mask[:, None])
    counts = jnp.maximum(batch.n_vars_per_graph, 1.0)[:, None]
    mean = graph_gather_vars(batch, sums / counts)
    return _pair_norm(x, mean, epsilon)


def pair_norm_clauses(x: jnp.ndarray, batch: SatBatch, epsilon: float = 1e-6
                      ) -> jnp.ndarray:
    """PairNorm over clause nodes (reference layers/normalization.py:43-71)."""
    sums = clause_segment_sum(batch, x * batch.clause_mask[:, None])
    counts = jnp.maximum(batch.n_clauses_per_graph, 1.0)[:, None]
    mean = graph_gather_clauses(batch, sums / counts)
    return _pair_norm(x, mean, epsilon)
