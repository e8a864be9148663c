"""NeuroCore + SimpleNeuroSAT — tied-weight L/C update models, TPU-native.

Ports of reference `model/neurocore.py:12-128` and
`model/simple_neurosat.py:13-221` (the latter adds the query mechanism
feeding the differentiable clause loss into the clause update). Both use
relu6 MLPs, per-feature moment normalization over the node axis, learned
init/message scales, and the sqrt per-graph softplus_mixed loss. The
reference's `tf.debugging.check_numerics` guards map to the framework-wide
jax debug_nans mode (diffusionsat_tpu.config.debug_mode) instead of
in-graph assertions.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from diffusionsat_tpu.graph.batch import SatBatch
from diffusionsat_tpu.losses.sat import (
    is_batch_sat,
    softplus_loss,
    softplus_mixed_loss,
)
from diffusionsat_tpu.nn.mlp import MLPConfig, mlp_apply, mlp_init
from diffusionsat_tpu.ops.graph_ops import (
    clause_segment_sum,
    clause_to_lit,
    lit_to_clause,
)


def moments_normalize(x: jnp.ndarray, axis: int = 0, eps: float = 1e-6
                      ) -> jnp.ndarray:
    """Reference `normalize` (model/neurocore.py:126-128): standardize by
    mean/variance over the node axis."""
    mean = jnp.mean(x, axis=axis, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=axis, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


@dataclasses.dataclass(frozen=True)
class NeuroCoreConfig:
    feature_maps: int = 128
    train_rounds: int = 32
    test_rounds: int = 64
    n_update_layers: int = 2
    n_score_layers: int = 2
    # True -> SimpleNeuroSAT: variable-space states + query mechanism
    use_query: bool = False
    # emit the reference's per-round query diagnostics through aux
    # (simple_neurosat.py:124-177: query_stats at rounds 0/16/last +
    # consecutive-round query agreement). Off by default — meant for a
    # separate diagnostics forward, like QuerySAT's round_stats.
    diagnostics: bool = False

    def mlp_configs(self):
        f = self.feature_maps
        if self.use_query:
            l_in = 3 * f       # [L, CL_pos, CL_neg]
            # [C, clauses_loss (f cols from the query), LC_msgs (f//2 cols:
            # literals are the feature-split halves of L, simple_neurosat:68-70)]
            c_in = f + f + f // 2
        else:
            l_in = 3 * f  # [L, CL_msgs, flip(L)]
            c_in = 2 * f  # [C, LC_msgs]
        cfgs = {
            "L_updates": (MLPConfig(self.n_update_layers + 1, 3 * f, f,
                                    activation="relu6"), l_in),
            "C_updates": (MLPConfig(self.n_update_layers + 1, 2 * f, f,
                                    activation="relu6"), c_in),
            "V_score": (MLPConfig(self.n_score_layers + 1, 2 * f, 1,
                                  activation="relu6"),
                        2 * f if not self.use_query else f),
        }
        if self.use_query:
            cfgs["variables_query"] = (
                MLPConfig(self.n_update_layers + 1, f, f), f)
        return cfgs


def neurocore_init(key: jax.Array, cfg: NeuroCoreConfig) -> dict:
    f = cfg.feature_maps
    params = {
        "L_init_scale": jnp.asarray(1.0 / math.sqrt(f)),
        "C_init_scale": jnp.asarray(1.0 / math.sqrt(f)),
        "LC_scale": jnp.asarray(0.1),
        "CL_scale": jnp.asarray(0.1),
    }
    cfgs = cfg.mlp_configs()
    keys = jax.random.split(key, len(cfgs))
    for k, (name, (mcfg, in_dim)) in zip(keys, cfgs.items()):
        params[name] = mlp_init(k, mcfg, in_dim)
    return params


def _query_stats(query: jnp.ndarray, logits: jnp.ndarray,
                 batch: SatBatch) -> dict:
    """Reference `query_stats` (model/simple_neurosat.py:138-177) as pure
    scalar outputs: how well the query MLP's rounded output agrees with
    the current logits, and what fraction of clauses the rounded query
    already satisfies. Padding-masked (the reference has no padding).
    NB the reference computes `query_matching_values` and
    `query_not_matching_values` from the same expression (:162-163, an
    upstream slip); here matching uses `match`, not-matching `1-match`."""
    vmask = batch.var_mask[:, None]                       # [V, 1]
    n_vars = jnp.maximum(jnp.sum(batch.var_mask), 1.0)
    n_clauses = jnp.maximum(jnp.sum(batch.clause_mask), 1.0)

    current_labels = jnp.round(jax.nn.sigmoid(logits))    # [V, 1]
    round_query = jnp.round(jax.nn.sigmoid(query))        # [V, f]
    match = (current_labels == round_query).astype(jnp.float32) * vmask

    # per-variable clause-occurrence counts (pos + neg literal degrees)
    ones = jnp.ones((batch.C, 1))
    lit_deg = clause_to_lit(batch, ones)                  # [2V, 1]
    V = batch.V
    vars_count = lit_deg[:V] + lit_deg[V:]                # [V, 1]

    denom = n_vars * match.shape[-1]
    sig_q = jax.nn.sigmoid(query) * vmask
    not_match = (1.0 - match) * vmask
    stats = {
        "query_logits_match": jnp.sum(match) / denom,
        "vars_in_clauses_matched": jnp.sum(vars_count * match) / denom,
        "vars_in_clauses_not_matched": jnp.sum(vars_count * not_match)
        / denom,
        "matching_mean": jnp.sum(sig_q * match) / denom,
        "not_matching_mean": jnp.sum(sig_q * not_match) / denom,
    }
    # fraction of clauses the rounded query satisfies (feature column 0
    # plays the reference's per-column role; we report the mean over all
    # feature columns exactly as the reference's reduce_mean does)
    lit = jnp.concatenate([round_query, 1.0 - round_query], axis=0)
    sat_c = jnp.clip(lit_to_clause(batch, lit), 0.0, 1.0)  # [C, f]
    sat_c = sat_c * batch.clause_mask[:, None]
    stats["sat_clauses"] = jnp.sum(sat_c) / (n_clauses * lit.shape[-1])
    return stats


def neurocore_apply(params: dict, cfg: NeuroCoreConfig, batch: SatBatch,
                    key: jax.Array, training: bool = True,
                    rounds: int | None = None):
    mcfgs = cfg.mlp_configs()
    V = batch.V
    f = cfg.feature_maps
    if rounds is None:
        rounds = cfg.train_rounds if training else cfg.test_rounds

    if cfg.use_query:
        L0 = jnp.ones((V, f)) * params["L_init_scale"]
    else:
        L0 = jnp.ones((2 * V, f)) * params["L_init_scale"]
    C0 = jnp.ones((batch.C, f)) * params["C_init_scale"]

    def flip(lits):
        return jnp.concatenate([lits[V:], lits[:V]], axis=0)

    diag = cfg.use_query and cfg.diagnostics

    def round_body(carry, _):
        if diag:
            L, C, last_logits, loss_sum, steps, done, prev_q = carry
        else:
            L, C, last_logits, loss_sum, steps, done = carry
        query = None

        if cfg.use_query:
            # SimpleNeuroSAT (reference simple_neurosat.py:67-105)
            lit1, lit2 = jnp.split(L, 2, axis=1)
            literals = jnp.concatenate([lit1, lit2], axis=0)
            LC_msgs = lit_to_clause(batch, literals) * params["LC_scale"]
            query = mlp_apply(params["variables_query"],
                              mcfgs["variables_query"][0], L)
            clauses_loss = softplus_loss(query, batch)
            C_new = mlp_apply(params["C_updates"], mcfgs["C_updates"][0],
                              jnp.concatenate([C, clauses_loss, LC_msgs],
                                              axis=-1))
            C_new = moments_normalize(C_new)
            CL_msgs = clause_to_lit(batch, C_new) * params["CL_scale"]
            CL1, CL2 = CL_msgs[:V], CL_msgs[V:]
            L_new = mlp_apply(params["L_updates"], mcfgs["L_updates"][0],
                              jnp.concatenate([L, CL1, CL2], axis=-1))
            L_new = moments_normalize(L_new)
            logits = mlp_apply(params["V_score"], mcfgs["V_score"][0], L_new)
        else:
            # NeuroCore (reference neurocore.py:61-78)
            LC_msgs = lit_to_clause(batch, L) * params["LC_scale"]
            C_new = mlp_apply(params["C_updates"], mcfgs["C_updates"][0],
                              jnp.concatenate([C, LC_msgs], axis=-1))
            C_new = moments_normalize(C_new)
            CL_msgs = clause_to_lit(batch, C_new) * params["CL_scale"]
            L_new = mlp_apply(params["L_updates"], mcfgs["L_updates"][0],
                              jnp.concatenate([L, CL_msgs, flip(L)], axis=-1))
            L_new = moments_normalize(L_new)
            v, v_n = jnp.split(L_new, 2, axis=0)
            logits = mlp_apply(params["V_score"], mcfgs["V_score"][0],
                               jnp.concatenate([v, v_n], axis=-1))

        sat_now = is_batch_sat(logits, batch) >= 1.0
        active = jnp.logical_not(done)
        # reference breaks BEFORE accumulating the loss of a SAT round
        accumulate = active & ~sat_now

        per_clause_loss = softplus_mixed_loss(logits, batch)
        per_graph_loss = clause_segment_sum(batch, per_clause_loss)
        masked_pgl = jnp.where(batch.graph_mask[:, None] > 0,
                               per_graph_loss + 1e-6, 0.0)
        round_loss = jnp.sum(jnp.sqrt(masked_pgl))

        L = jnp.where(active, L_new, L)
        C = jnp.where(active, C_new, C)
        last_logits = jnp.where(active, logits, last_logits)
        loss_sum = loss_sum + jnp.where(accumulate, round_loss, 0.0)
        steps = steps + jnp.where(active, 1, 0)

        if cfg.use_query:  # SimpleNeuroSAT's stop-grad blend (:104-105)
            L = jnp.where(accumulate,
                          jax.lax.stop_gradient(L) * 0.2 + L * 0.8, L)
            C = jnp.where(accumulate,
                          jax.lax.stop_gradient(C) * 0.2 + C * 0.8, C)

        done = jnp.logical_or(done, sat_now)
        if diag:
            # reference log_differences (simple_neurosat.py:124-136):
            # fraction of rounded query bits unchanged vs previous round
            vmask = batch.var_mask[:, None]
            n_active = jnp.maximum(jnp.sum(batch.var_mask), 1.0)
            same = (jnp.round(jax.nn.sigmoid(query))
                    == jnp.round(jax.nn.sigmoid(prev_q)))
            ys = dict(_query_stats(query, logits, batch))
            ys["queries_diff"] = (jnp.sum(same.astype(jnp.float32) * vmask)
                                  / (n_active * query.shape[-1]))
            return (L, C, last_logits, loss_sum, steps, done, query), ys
        return (L, C, last_logits, loss_sum, steps, done), None

    init = (L0, C0, jnp.zeros((V, 1)), jnp.zeros(()),
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.bool_))
    if diag:
        init = init + (jnp.zeros((V, f)),)
    body = jax.checkpoint(round_body) if training else round_body
    carry, ys = jax.lax.scan(body, init, None, length=rounds)
    L, C, last_logits, loss_sum, steps, done = carry[:6]

    loss = loss_sum / jnp.asarray(rounds, jnp.float32)
    steps_taken = jnp.maximum(steps - 1, 0)
    aux = {"solved": done}
    if diag:
        # reference emits query_stats at rounds 0, 16, and the last
        # active round (simple_neurosat.py:109-121); queries_diff is the
        # full per-round agreement curve
        aux["query_stats"] = {
            "0": {k: v[0] for k, v in ys.items() if k != "queries_diff"},
            "16": {k: v[jnp.minimum(16, rounds - 1)] for k, v in ys.items()
                   if k != "queries_diff"},
            "last": {k: v[steps_taken] for k, v in ys.items()
                     if k != "queries_diff"},
        }
        aux["queries_diff"] = ys["queries_diff"]
    return last_logits, loss, steps_taken, aux


# SimpleNeuroSAT is NeuroCore with the query mechanism enabled — a
# distinct registry citizen (reference model/simple_neurosat.py:13-221):
# variable-space states, query MLP feeding the differentiable clause
# loss into the clause update, stop-grad blend, query diagnostics.
@dataclasses.dataclass(frozen=True)
class SimpleNeuroSATConfig(NeuroCoreConfig):
    use_query: bool = True


simple_neurosat_init = neurocore_init
simple_neurosat_apply = neurocore_apply


def simple_neurosat_config(**kw) -> NeuroCoreConfig:
    return NeuroCoreConfig(use_query=True, **kw)
