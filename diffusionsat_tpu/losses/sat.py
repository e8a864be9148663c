"""Differentiable unsupervised CNF satisfiability losses.

TPU-native port of the reference `loss/sat.py`. The reference keeps two
parallel families — ragged-clause segment ops and adjacency SpMM — that
compute the same math; our edge-list representation unifies them, so each
loss exists once and the `_adj` suffix is dropped. Padded clauses/edges are
masked so they contribute exactly 0 loss (the `exp(-sum)` form would give
padding clauses loss 1 otherwise — see SURVEY.md §7 hard parts).

All losses take `logits` of shape [V] or [V, K] (K parallel logit heads,
reference model/query_sat.py:99) and return per-clause [C, K] or scalars,
matching the reference's contracts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diffusionsat_tpu.graph.batch import SatBatch
from diffusionsat_tpu.ops.graph_ops import (
    clause_segment_sum,
    clause_to_lit,
    lit_to_clause,
)


def _as_2d(logits: jnp.ndarray) -> jnp.ndarray:
    return logits[:, None] if logits.ndim == 1 else logits


def literal_concat(x: jnp.ndarray) -> jnp.ndarray:
    """[V, K] -> [2V, K] literal layout: positive rows then negated rows."""
    return jnp.concatenate([x, -x], axis=0)


def softplus_loss(logits: jnp.ndarray, batch: SatBatch, power: float = 1.0
                  ) -> jnp.ndarray:
    """Per-clause loss in [0, 1]: exp(-sum softplus(+/-logit)); 0 when
    satisfied strongly (reference loss/sat.py:125-137 `softplus_loss_adj`).
    Padded clauses return 0."""
    logits = _as_2d(logits)
    literals = jax.nn.softplus(literal_concat(logits))
    clauses_val = jnp.exp(-lit_to_clause(batch, literals) * power)
    return clauses_val * batch.clause_mask[:, None]


def softplus_loss_and_grad(logits: jnp.ndarray, batch: SatBatch,
                           axis_name: str | None = None,
                           plans=None, halo: dict | None = None
                           ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(softplus_loss per clause, gradient of its sum wrt logits) in closed
    form.

    d/dx_v sum_c exp(-S_c) = sum_{edges (lit,c) of v}
        -exp(-S_c) * sigmoid(+/-x_v) * (+/-1)
    i.e. one clause->literal aggregation of the clause values weighted by
    the literal sigmoid — the same SpMM shape as the loss itself. Replaces
    autodiff for the query gradient inside the recurrent loop (reference
    model/query_sat.py:227-245): values are identical to jax.grad, but the
    outer backward then differentiates plain first-order ops instead of a
    nested-grad (Hessian) structure.
    """
    logits = _as_2d(logits)
    literals = literal_concat(logits)
    sp = jax.nn.softplus(literals)
    if plans is not None:
        from diffusionsat_tpu.ops.pallas_segsum import (
            plan_clause_to_lit, plan_lit_to_clause)
        clauses_val = jnp.exp(-plan_lit_to_clause(sp, plans))
        clauses_val = clauses_val * batch.clause_mask[:, None]
        sig = jax.nn.sigmoid(literals)
        back = plan_clause_to_lit(clauses_val, plans)
    else:
        clauses_val = jnp.exp(-lit_to_clause(batch, sp))
        clauses_val = clauses_val * batch.clause_mask[:, None]
        sig = jax.nn.sigmoid(literals)                       # d softplus
        back = clause_to_lit(batch, clauses_val, axis_name, halo)  # [2V, K]
    per_lit = -back * sig
    V = batch.V
    grad = per_lit[:V] - per_lit[V:]                     # +/- literal signs
    return clauses_val, grad


def softplus_log_loss(logits: jnp.ndarray, batch: SatBatch, eps: float = 1e-8
                      ) -> jnp.ndarray:
    """-log(1 - softplus_loss) (reference loss/sat.py:59-68)."""
    v = softplus_loss(logits, batch)
    return -(jnp.log(1 - v + eps) - jnp.log(1 + eps))


def softplus_log_square_loss(logits: jnp.ndarray, batch: SatBatch,
                             eps: float = 1e-8) -> jnp.ndarray:
    """Square of the log loss (reference loss/sat.py:55-56)."""
    return jnp.square(softplus_log_loss(logits, batch, eps))


def softplus_square_loss(logits: jnp.ndarray, batch: SatBatch) -> jnp.ndarray:
    """Square of softplus_loss (reference loss/sat.py:71-78)."""
    return jnp.square(softplus_loss(logits, batch))


def softplus_mixed_loss(logits: jnp.ndarray, batch: SatBatch, eps: float = 1e-8
                        ) -> jnp.ndarray:
    """linear * log loss product (reference loss/sat.py:92-100
    `softplus_mixed_loss_adj`)."""
    v = softplus_loss(logits, batch)
    log_clauses = -(jnp.log(1 - v + eps) - jnp.log(1 + eps))
    return v * log_clauses


def linear_loss(logits: jnp.ndarray, batch: SatBatch) -> jnp.ndarray:
    """Scalar linear loss (reference loss/sat.py:140-156 `linear_loss_adj`):
    sum of relu(1 - clause true-literal mass) plus a binarization penalty
    sum(p^2 (p-1)^2)."""
    logits = _as_2d(logits)
    probs = jax.nn.sigmoid(logits)
    literals = jnp.concatenate([probs, 1 - probs], axis=0)
    clauses_val = lit_to_clause(batch, literals)
    clauses_val = jax.nn.relu(1 - clauses_val) * batch.clause_mask[:, None]
    literal_loss = jnp.sum(
        jnp.square(probs) * jnp.square(probs - 1) * batch.var_mask[:, None])
    return jnp.sum(clauses_val) + literal_loss


def _edge_signs(batch: SatBatch) -> jnp.ndarray:
    """+1 for positive-literal edges, -1 for negated (clause-sorted order)."""
    return jnp.where(batch.edge_lit_c < batch.V, 1.0, -1.0)


def _edge_var(batch: SatBatch) -> jnp.ndarray:
    """Variable index of each edge (clause-sorted order)."""
    return jnp.where(batch.edge_lit_c < batch.V, batch.edge_lit_c,
                     batch.edge_lit_c - batch.V)


def _clause_prod_unsat(probs: jnp.ndarray, batch: SatBatch) -> jnp.ndarray:
    """Per-clause product of per-literal 'unsat' probabilities:
    (1-p) for positive literals, p for negated. [V, K] -> [C, K]."""
    p_e = jnp.take(probs, _edge_var(batch), axis=0)
    sign = _edge_signs(batch)[:, None]
    # pos: 1 - p, neg: p
    unsat_e = jnp.where(sign > 0, 1.0 - p_e, p_e)
    unsat_e = jnp.where(batch.edge_mask_c[:, None] > 0, unsat_e, 1.0)
    logs = jnp.log(jnp.maximum(unsat_e, 1e-30))
    summed = jax.ops.segment_sum(logs, batch.edge_clause_c,
                                 num_segments=batch.C,
                                 indices_are_sorted=True)
    prod = jnp.exp(summed)
    # exactly-zero factors: track zero counts to avoid log(0) drift
    zero_e = (unsat_e <= 0).astype(jnp.float32)
    zeros = jax.ops.segment_sum(zero_e, batch.edge_clause_c,
                                num_segments=batch.C,
                                indices_are_sorted=True)
    return jnp.where(zeros > 0, 0.0, prod)


def sigmoid_log_loss(logits: jnp.ndarray, batch: SatBatch, eps: float = 1e-8
                     ) -> jnp.ndarray:
    """-log(1 - prod of unsat-literal probabilities)
    (reference loss/sat.py:4-27). Padded clauses return 0."""
    probs = jax.nn.sigmoid(_as_2d(logits))
    varsum = _clause_prod_unsat(probs, batch)
    loss = -(jnp.log(1 - varsum + eps) - jnp.log(1 + eps))
    return loss * batch.clause_mask[:, None]


def unsat_clause_count(logits: jnp.ndarray, batch: SatBatch) -> jnp.ndarray:
    """Number of unsatisfied clauses under the rounded assignment
    (reference loss/sat.py:30-52)."""
    probs = jnp.round(jax.nn.sigmoid(_as_2d(logits)))
    varsum = _clause_prod_unsat(probs, batch)
    return jnp.sum(varsum * batch.clause_mask[:, None])


def max_clauses_loss(logits: jnp.ndarray, batch: SatBatch, temp: float = 1.0
                     ) -> jnp.ndarray:
    """Per-clause softmax-weighted literal value ('Learning To Solve
    Circuit-SAT', reference loss/sat.py:159-179). Literal value is p for
    positive, (1-p) for negated; returns softmax_avg(v/temp) per clause."""
    probs = jax.nn.sigmoid(_as_2d(logits))
    p_e = jnp.take(probs, _edge_var(batch), axis=0)
    sign = _edge_signs(batch)[:, None]
    v_e = jnp.where(sign > 0, p_e, 1.0 - p_e) / temp
    w_e = jnp.exp(v_e) * batch.edge_mask_c[:, None]
    num = jax.ops.segment_sum(w_e * v_e, batch.edge_clause_c,
                              num_segments=batch.C, indices_are_sorted=True)
    den = jax.ops.segment_sum(w_e, batch.edge_clause_c,
                              num_segments=batch.C, indices_are_sorted=True)
    return num / jnp.maximum(den, 1e-20)


def min_max_loss(logits: jnp.ndarray, batch: SatBatch, temp: float = 1.0
                 ) -> jnp.ndarray:
    """Softmin over clauses of max_clauses_loss + step-function transform
    (reference loss/sat.py:182-196)."""
    clauses = jnp.mean(max_clauses_loss(logits, batch, temp), axis=-1)
    w = jnp.exp(-clauses / temp) * batch.clause_mask
    min_value = jnp.sum(w * clauses) / jnp.maximum(jnp.sum(w), 1e-20)
    skm = jnp.power(1 - min_value, 10)
    return skm / (skm + jnp.power(min_value, 10))


def log_max_loss(logits: jnp.ndarray, batch: SatBatch, temp: float = 1.0
                 ) -> jnp.ndarray:
    """Per-clause step-function loss ('PDP', reference loss/sat.py:199-207)."""
    clauses = jnp.mean(max_clauses_loss(logits, batch, temp), axis=-1)
    skm = jnp.power(1 - clauses, 10)
    return (skm / (skm + jnp.power(clauses, 10))) * batch.clause_mask


def clause_sat_indicator(logits: jnp.ndarray, batch: SatBatch) -> jnp.ndarray:
    """[C, K] 1.0 where the rounded assignment satisfies the clause."""
    logits = _as_2d(logits)
    variables = jnp.round(jax.nn.sigmoid(logits))
    literals = jnp.concatenate([variables, 1 - variables], axis=0)
    clauses_sat = lit_to_clause(batch, literals)
    return jnp.clip(clauses_sat, 0.0, 1.0)


def is_batch_sat(logits: jnp.ndarray, batch: SatBatch,
                 axis_name: str | None = None) -> jnp.ndarray:
    """1.0 iff every (real) clause is satisfied by the rounded assignment
    (reference utils/sat.py:118-124). Padded clauses count as satisfied."""
    sat = clause_sat_indicator(logits, batch)
    sat = jnp.where(batch.clause_mask[:, None] > 0, sat, 1.0)
    out = jnp.min(sat)
    if axis_name is not None:
        out = jax.lax.pmin(out, axis_name)
    return out


def is_graph_sat(logits: jnp.ndarray, batch: SatBatch,
                 axis_name: str | None = None) -> jnp.ndarray:
    """[G, K] per-graph SAT indicator (reference utils/sat.py:165-180)."""
    sat = clause_sat_indicator(logits, batch)  # [C, K]
    sat_in_g = clause_segment_sum(batch, sat, axis_name)  # [G, K]
    total_in_g = batch.n_clauses_per_graph[:, None]
    return jnp.clip(sat_in_g + 1 - total_in_g, 0.0, 1.0) * \
        batch.graph_mask[:, None]
