"""QuerySATLit — QuerySAT variant on literal states, TPU-native.

Port of reference `model/query_sat_lit.py:11-201`: zero-state literal and
clause embeddings, query gradient over the clause loss, clause/literal MLP
updates with PairNorm and 0.1 residual, sqrt per-graph softplus_mixed
logit loss, early exit with a supervised self-training CE term.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from diffusionsat_tpu.graph.batch import SatBatch
from diffusionsat_tpu.losses.sat import (
    softplus_loss,
    softplus_mixed_loss,
    unsat_clause_count,
)
from diffusionsat_tpu.nn.mlp import MLPConfig, mlp_apply, mlp_init
from diffusionsat_tpu.nn.normalization import pair_norm_clauses
from diffusionsat_tpu.ops.graph_ops import (
    clause_segment_sum,
    clause_to_lit,
    lit_to_clause,
)


@dataclasses.dataclass(frozen=True)
class QuerySATLitConfig:
    feature_maps: int = 128
    query_maps: int = 32
    msg_layers: int = 3
    vote_layers: int = 3
    train_rounds: int = 32
    test_rounds: int = 64
    add_gradient: bool = True
    use_message_passing: bool = False

    def mlp_configs(self):
        f, q = self.feature_maps, self.query_maps
        c_in = (2 * f + q) if self.use_message_passing else (f + q)
        l_in = (f + 2 * q) if self.add_gradient else (f + q)
        return {
            "clauses_update": (MLPConfig(self.vote_layers, f * 3, f + q),
                               c_in),
            "literals_update": (MLPConfig(self.vote_layers, f * 2, f), l_in),
            "literals_output": (MLPConfig(self.vote_layers, f, 1), 2 * f),
            "literals_query": (MLPConfig(self.msg_layers, q * 2, q),
                               2 * f + 4),
        }


def query_sat_lit_init(key: jax.Array, cfg: QuerySATLitConfig) -> dict:
    params = {}
    cfgs = cfg.mlp_configs()
    keys = jax.random.split(key, len(cfgs))
    for k, (name, (mcfg, in_dim)) in zip(keys, cfgs.items()):
        params[name] = mlp_init(k, mcfg, in_dim)
    return params


def _zero_state(n_units: int, n_features: int, stddev: float = 0.25
                ) -> jnp.ndarray:
    """Reference zero_state (query_sat_lit.py:38-42): one-hot minus uniform,
    scaled."""
    onehot = jnp.zeros((n_units, n_features)).at[:, 0].set(1.0)
    onehot = onehot - 1.0 / n_features
    return onehot * jnp.sqrt(jnp.asarray(n_features, jnp.float32)) * stddev


def _pair_norm_literals(x: jnp.ndarray, batch: SatBatch, eps: float = 1e-6
                        ) -> jnp.ndarray:
    """PairNorm over the 2V literal rows using per-graph means (the
    reference passes a literal-level graph mask, query_sat_lit.py:53)."""
    V = batch.V
    lit_graph = jnp.concatenate([batch.var_graph, batch.var_graph])
    sums = jax.ops.segment_sum(
        x * jnp.concatenate([batch.var_mask, batch.var_mask])[:, None],
        lit_graph, num_segments=batch.G + 1)[:batch.G]
    counts = jnp.maximum(batch.n_vars_per_graph * 2, 1.0)[:, None]
    mean_g = sums / counts
    padded = jnp.concatenate([mean_g, jnp.zeros_like(mean_g[:1])], axis=0)
    mean = jnp.take(padded, lit_graph, axis=0)
    x = x - mean
    variance = jnp.mean(jnp.square(x), axis=1, keepdims=True)
    return x * jax.lax.rsqrt(variance + eps)


def query_sat_lit_apply(params: dict, cfg: QuerySATLitConfig, batch: SatBatch,
                        key: jax.Array, training: bool = True,
                        rounds: int | None = None):
    mcfgs = cfg.mlp_configs()
    V = batch.V
    if rounds is None:
        rounds = cfg.train_rounds if training else cfg.test_rounds

    literals0 = _zero_state(2 * V, cfg.feature_maps)
    clause0 = _zero_state(batch.C, cfg.feature_maps)

    def round_body(carry, key_t):
        literals, clause_state, last_logits, loss_sum, sup_loss, steps, done \
            = carry

        noise4 = jax.random.normal(key_t, (V, 4))

        def clause_loss_fn(q):
            cl = softplus_loss(q, batch)
            return jnp.sum(cl), cl

        v1 = jnp.concatenate([literals[:V], literals[V:], noise4], axis=-1)
        query = mlp_apply(params["literals_query"],
                          mcfgs["literals_query"][0], v1)
        var_grad, clauses_loss = jax.grad(clause_loss_fn, has_aux=True)(query)
        literals_grad = jnp.concatenate([var_grad, -var_grad], axis=0)

        if cfg.use_message_passing:
            clause_messages = lit_to_clause(batch, literals)
            clause_unit = jnp.concatenate(
                [clause_state, clause_messages, clauses_loss], axis=-1)
        else:
            clause_unit = jnp.concatenate([clause_state, clauses_loss],
                                          axis=-1)
        clause_data = mlp_apply(params["clauses_update"],
                                mcfgs["clauses_update"][0], clause_unit)

        new_clause_value = clause_data[:, cfg.query_maps:]
        new_clause_value = pair_norm_clauses(new_clause_value, batch) * 0.25
        new_clause_state = new_clause_value + 0.1 * clause_state

        literals_loss_all = clause_data[:, :cfg.query_maps]
        literals_loss = clause_to_lit(batch, literals_loss_all)

        if cfg.add_gradient:
            unit = jnp.concatenate([literals, literals_grad, literals_loss],
                                   axis=-1)
        else:
            unit = jnp.concatenate([literals, literals_loss], axis=-1)
        new_literals = mlp_apply(params["literals_update"],
                                 mcfgs["literals_update"][0], unit)
        new_literals = _pair_norm_literals(new_literals, batch) * 0.25
        new_literals = new_literals + 0.1 * literals

        variables = jnp.concatenate([new_literals[:V], new_literals[V:]],
                                    axis=-1)
        logits = mlp_apply(params["literals_output"],
                           mcfgs["literals_output"][0], variables)

        per_clause_loss = softplus_mixed_loss(logits, batch)
        per_graph_loss = clause_segment_sum(batch, per_clause_loss)
        masked_pgl = jnp.where(batch.graph_mask[:, None] > 0,
                               per_graph_loss + 1e-6, 0.0)
        logit_loss = jnp.sum(jnp.sqrt(masked_pgl))

        n_unsat = unsat_clause_count(logits, batch)
        sat_now = (logit_loss < 0.5) & (n_unsat == 0)

        active = jnp.logical_not(done)
        newly_done = active & sat_now
        # supervised self-training CE on the previous logits vs the found
        # assignment (reference :118-122)
        labels = jnp.round(jax.nn.sigmoid(logits))
        ce = jnp.maximum(last_logits, 0) - last_logits * labels + \
            jnp.log1p(jnp.exp(-jnp.abs(last_logits)))
        ce = jnp.sum(ce * batch.var_mask[:, None]) / \
            jnp.maximum(jnp.sum(batch.var_mask), 1.0)
        sup_loss = jnp.where(newly_done, ce, sup_loss)

        loss_sum = loss_sum + jnp.where(active, logit_loss, 0.0)
        steps = steps + jnp.where(active, 1, 0)
        last_logits = jnp.where(active, logits, last_logits)

        blend_l = jax.lax.stop_gradient(new_literals) * 0.2 + \
            new_literals * 0.8
        blend_c = jax.lax.stop_gradient(new_clause_state) * 0.2 + \
            new_clause_state * 0.8
        cont = active & ~sat_now
        literals = jnp.where(cont, blend_l,
                             jnp.where(newly_done, new_literals, literals))
        clause_state = jnp.where(cont, blend_c,
                                 jnp.where(newly_done, new_clause_state,
                                           clause_state))
        done = jnp.logical_or(done, sat_now)
        return (literals, clause_state, last_logits, loss_sum, sup_loss,
                steps, done), None

    init = (literals0, clause0, jnp.zeros((V, 1)), jnp.zeros(()),
            jnp.zeros(()), jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.bool_))
    body = jax.checkpoint(round_body) if training else round_body
    keys = jax.random.split(key, rounds)
    (literals, clause_state, last_logits, loss_sum, sup_loss, steps, done), \
        _ = jax.lax.scan(body, init, keys)

    loss = loss_sum / jnp.asarray(rounds, jnp.float32) + sup_loss
    steps_taken = jnp.maximum(steps - 1, 0)
    return last_logits, loss, steps_taken, {"solved": done}
