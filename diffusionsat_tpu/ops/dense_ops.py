"""Batched dense graph ops and SAT losses over DenseSatBatch blocks.

Semantics match ops/graph_ops.py and losses/sat.py exactly (verified by
tests/test_dense.py equivalence suite against the flat edge-list path);
the representation is per-graph dense incidence, so every aggregation is
a batched matmul (MXU) or a masked axis reduction — no gathers, no
segment ops. Reference semantics: `model/query_sat.py:225-338` SpMMs and
`loss/sat.py` adjacency losses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from diffusionsat_tpu.graph.dense_batch import DenseSatBatch

# Matmul precision for the incidence einsums. HIGHEST = true f32 on the
# MXU; incidence entries are small non-negative integers, so DEFAULT
# (bf16 passes) is usually indistinguishable — kept as a module knob so
# the bench can compare.
INCIDENCE_PRECISION = lax.Precision.HIGHEST


def lit_to_clause(batch: DenseSatBatch, lit_features: jnp.ndarray
                  ) -> jnp.ndarray:
    """[G, 2Vg, F] -> [G, Cg, F]: out[g,c] = sum_l inc[g,c,l] * x[g,l]."""
    return jnp.einsum("gcl,glf->gcf", batch.incidence, lit_features,
                      precision=INCIDENCE_PRECISION,
                      preferred_element_type=jnp.float32)


def clause_to_lit(batch: DenseSatBatch, clause_features: jnp.ndarray
                  ) -> jnp.ndarray:
    """[G, Cg, F] -> [G, 2Vg, F]: the transpose aggregation."""
    return jnp.einsum("gcl,gcf->glf", batch.incidence, clause_features,
                      precision=INCIDENCE_PRECISION,
                      preferred_element_type=jnp.float32)


def literal_degrees(batch: DenseSatBatch) -> jnp.ndarray:
    """[G, 2Vg, 1] clause count per literal."""
    return jnp.sum(batch.incidence, axis=1)[..., None]


def clause_degrees(batch: DenseSatBatch) -> jnp.ndarray:
    """[G, Cg, 1] literal count per clause."""
    return jnp.sum(batch.incidence, axis=2)[..., None]


def var_graph_sum(batch: DenseSatBatch, var_features: jnp.ndarray
                  ) -> jnp.ndarray:
    """Per-graph masked sum over variables: [G, Vg, F] -> [G, F]."""
    return jnp.sum(var_features * batch.var_mask[..., None], axis=1)


def clause_graph_sum(batch: DenseSatBatch, clause_features: jnp.ndarray
                     ) -> jnp.ndarray:
    """Per-graph masked sum over clauses: [G, Cg, F] -> [G, F]."""
    return jnp.sum(clause_features * batch.clause_mask[..., None], axis=1)


def _pair_norm(x: jnp.ndarray, mean: jnp.ndarray, epsilon: float
               ) -> jnp.ndarray:
    x = x - mean
    variance = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x * lax.rsqrt(variance + epsilon)


def pair_norm_vars(x: jnp.ndarray, batch: DenseSatBatch,
                   epsilon: float = 1e-6) -> jnp.ndarray:
    """PairNorm over variable nodes (reference
    layers/normalization.py:43-71): subtract the graph mean, rms over
    features. [G, Vg, F]."""
    counts = jnp.maximum(batch.n_vars_per_graph, 1.0)[:, None, None]
    mean = jnp.sum(x * batch.var_mask[..., None], axis=1,
                   keepdims=True) / counts
    return _pair_norm(x, mean, epsilon)


def pair_norm_clauses(x: jnp.ndarray, batch: DenseSatBatch,
                      epsilon: float = 1e-6) -> jnp.ndarray:
    """PairNorm over clause nodes. [G, Cg, F]."""
    counts = jnp.maximum(batch.n_clauses_per_graph, 1.0)[:, None, None]
    mean = jnp.sum(x * batch.clause_mask[..., None], axis=1,
                   keepdims=True) / counts
    return _pair_norm(x, mean, epsilon)


# --- losses (dense forms of losses/sat.py) --------------------------------


def literal_concat(x: jnp.ndarray) -> jnp.ndarray:
    """[G, Vg, K] -> [G, 2Vg, K]: positive rows then negated rows."""
    return jnp.concatenate([x, -x], axis=1)


def softplus_loss(logits: jnp.ndarray, batch: DenseSatBatch,
                  power: float = 1.0) -> jnp.ndarray:
    """Per-clause exp(-sum softplus(+/-logit)) loss, 0 on padded clauses
    (reference loss/sat.py:125-137)."""
    literals = jax.nn.softplus(literal_concat(logits))
    clauses_val = jnp.exp(-lit_to_clause(batch, literals) * power)
    return clauses_val * batch.clause_mask[..., None]


def softplus_loss_and_grad(logits: jnp.ndarray, batch: DenseSatBatch
                           ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(per-clause softplus loss, closed-form d(sum loss)/d logits) —
    the dense analog of losses/sat.py `softplus_loss_and_grad` (reference
    query gradient, model/query_sat.py:227-245)."""
    literals = literal_concat(logits)
    sp = jax.nn.softplus(literals)
    clauses_val = jnp.exp(-lit_to_clause(batch, sp))
    clauses_val = clauses_val * batch.clause_mask[..., None]
    sig = jax.nn.sigmoid(literals)
    back = clause_to_lit(batch, clauses_val)
    per_lit = -back * sig
    Vg = batch.Vg
    grad = per_lit[:, :Vg] - per_lit[:, Vg:]
    return clauses_val, grad


def softplus_mixed_loss(logits: jnp.ndarray, batch: DenseSatBatch,
                        eps: float = 1e-8) -> jnp.ndarray:
    """linear * log loss product (reference loss/sat.py:92-100)."""
    v = softplus_loss(logits, batch)
    log_clauses = -(jnp.log(1 - v + eps) - jnp.log(1 + eps))
    return v * log_clauses


def linear_loss(logits: jnp.ndarray, batch: DenseSatBatch) -> jnp.ndarray:
    """Scalar linear loss (reference loss/sat.py:140-156)."""
    probs = jax.nn.sigmoid(logits)
    literals = jnp.concatenate([probs, 1 - probs], axis=1)
    clauses_val = lit_to_clause(batch, literals)
    clauses_val = jax.nn.relu(1 - clauses_val) * batch.clause_mask[..., None]
    literal_loss = jnp.sum(jnp.square(probs) * jnp.square(probs - 1) *
                           batch.var_mask[..., None])
    return jnp.sum(clauses_val) + literal_loss


def clause_sat_indicator(logits: jnp.ndarray, batch: DenseSatBatch
                         ) -> jnp.ndarray:
    """[G, Cg, K] 1.0 where the rounded assignment satisfies the clause."""
    variables = jnp.round(jax.nn.sigmoid(logits))
    literals = jnp.concatenate([variables, 1 - variables], axis=1)
    clauses_sat = lit_to_clause(batch, literals)
    return jnp.clip(clauses_sat, 0.0, 1.0)


def is_batch_sat(logits: jnp.ndarray, batch: DenseSatBatch) -> jnp.ndarray:
    """1.0 iff every real clause is satisfied (reference
    utils/sat.py:118-124); padded clauses count as satisfied."""
    sat = clause_sat_indicator(logits, batch)
    sat = jnp.where(batch.clause_mask[..., None] > 0, sat, 1.0)
    return jnp.min(sat)


def is_graph_sat(logits: jnp.ndarray, batch: DenseSatBatch) -> jnp.ndarray:
    """[G, K] per-graph SAT indicator (reference utils/sat.py:165-180)."""
    sat = clause_sat_indicator(logits, batch)
    sat_in_g = clause_graph_sum(batch, sat)
    total = batch.n_clauses_per_graph[:, None]
    return jnp.clip(sat_in_g + 1 - total, 0.0, 1.0) * \
        batch.graph_mask[:, None]
