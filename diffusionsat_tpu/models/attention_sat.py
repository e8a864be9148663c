"""AttentionSAT — literal-state model with additive graph attention.

Port of reference `model/attention_sat.py:11-118`: query gradient feature,
per-edge additive attention from clause units into literal units, layer
norm, softplus_log loss per round with early exit + self-training CE.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from diffusionsat_tpu.graph.batch import SatBatch
from diffusionsat_tpu.losses.sat import (
    softplus_log_loss,
    softplus_loss,
    unsat_clause_count,
)
from diffusionsat_tpu.nn.attention import (
    additive_attention_apply,
    additive_attention_init,
)
from diffusionsat_tpu.nn.mlp import MLPConfig, mlp_apply, mlp_init
from diffusionsat_tpu.nn.normalization import layer_norm
from diffusionsat_tpu.ops.graph_ops import clause_to_lit, lit_to_clause


@dataclasses.dataclass(frozen=True)
class AttentionSATConfig:
    feature_maps: int = 256
    msg_layers: int = 3
    vote_layers: int = 3
    rounds: int = 16
    query_maps: int = 64

    def dims(self):
        # the query gradient [V, q] is split in half and restacked to
        # [2V, q//2] (reference attention_sat.py:53-54)
        f, q = self.feature_maps, self.query_maps
        lit_unit = f + q // 2 + q     # [l_output, literals_grad, literals_loss]
        clause_unit = f + q // 2 + q  # [clauses_full, clauses_gradient, clauses_loss]
        return lit_unit, clause_unit

    def mlp_configs(self):
        f = self.feature_maps
        lit_unit, _ = self.dims()
        return {
            "literals_mlp": (MLPConfig(self.msg_layers, f, f,
                                       do_layer_norm=True), lit_unit + f),
            "variables_query": (MLPConfig(self.msg_layers, f, self.query_maps,
                                          do_layer_norm=True), 2 * (f + 4)),
            "output_layer": (MLPConfig(self.vote_layers, f, 1,
                                       do_layer_norm=True), 2 * f),
        }


def attention_sat_init(key: jax.Array, cfg: AttentionSATConfig) -> dict:
    params = {}
    cfgs = cfg.mlp_configs()
    keys = jax.random.split(key, len(cfgs) + 1)
    for k, (name, (mcfg, in_dim)) in zip(keys, cfgs.items()):
        params[name] = mlp_init(k, mcfg, in_dim)
    lit_unit, clause_unit = cfg.dims()
    params["attention_l"] = additive_attention_init(
        keys[-1], cfg.feature_maps, query_dim=lit_unit,
        memory_dim=clause_unit)
    params["lit_norm_bias"] = jnp.zeros((cfg.feature_maps,))
    return params


def _zero_state(n_units: int, n_features: int, stddev: float = 0.25):
    onehot = jnp.zeros((n_units, n_features)).at[:, 0].set(1.0)
    onehot = onehot - 1.0 / n_features
    return onehot * jnp.sqrt(jnp.asarray(n_features, jnp.float32)) * stddev


def _flip(literals: jnp.ndarray, n_vars: int) -> jnp.ndarray:
    return jnp.concatenate([literals[n_vars:], literals[:n_vars]], axis=0)


def attention_sat_apply(params: dict, cfg: AttentionSATConfig,
                        batch: SatBatch, key: jax.Array,
                        training: bool = True, rounds: int | None = None):
    mcfgs = cfg.mlp_configs()
    V = batch.V
    rounds = rounds or cfg.rounds

    def round_body(carry, key_t):
        l_output, last_logits, loss_sum, loss_cnt, sup_loss, steps, done = \
            carry
        noise = jax.random.normal(key_t, (2 * V, 4))

        def clause_loss_fn(q):
            cl = softplus_loss(q, batch)
            return jnp.sum(cl), cl

        lits = jnp.concatenate([l_output, noise], axis=-1)
        variables = jnp.concatenate([lits[:V], lits[V:]], axis=1)
        query = mlp_apply(params["variables_query"],
                          mcfgs["variables_query"][0], variables)
        var_grad, clauses_loss = jax.grad(clause_loss_fn, has_aux=True)(query)
        # [V, q] -> [2V, q/?]: reference splits on axis 1 then stacks rows
        g1, g2 = jnp.split(var_grad, 2, axis=1)
        literals_grad = jnp.concatenate([g1, g2], axis=0)

        literals_loss = clause_to_lit(batch, clauses_loss)
        literals_unit = jnp.concatenate(
            [l_output, literals_grad, literals_loss], axis=-1)

        clauses_gradient = lit_to_clause(batch, literals_grad)
        clauses_full = lit_to_clause(batch, l_output)
        # clause unit carries [C, f + q/2 + q] -> align with config dims
        clauses_unit = jnp.concatenate(
            [clauses_full, clauses_gradient, clauses_loss], axis=-1)

        new_literals = additive_attention_apply(
            params["attention_l"], literals_unit, clauses_unit, batch,
            hidden=cfg.feature_maps)

        l_new = mlp_apply(params["literals_mlp"], mcfgs["literals_mlp"][0],
                          jnp.concatenate([literals_unit,
                                           _flip(new_literals, V)], axis=-1))
        l_new = layer_norm(l_new, axis=0, subtract_mean=True,
                           bias=params["lit_norm_bias"])

        variables = jnp.concatenate([l_new[:V], l_new[V:]], axis=1)
        logits = mlp_apply(params["output_layer"],
                           mcfgs["output_layer"][0], variables) * 0.25

        round_loss = jnp.sum(softplus_log_loss(logits, batch))
        n_unsat = unsat_clause_count(logits, batch)
        sat_now = (round_loss < 0.5) & (n_unsat == 0)

        active = jnp.logical_not(done)
        newly_done = active & sat_now

        labels = jnp.round(jax.nn.sigmoid(logits))
        ce = jnp.maximum(logits, 0) - logits * labels + \
            jnp.log1p(jnp.exp(-jnp.abs(logits)))
        ce = jnp.sum(ce * batch.var_mask[:, None]) / \
            jnp.maximum(jnp.sum(batch.var_mask), 1.0)
        sup_loss = jnp.where(newly_done, ce, sup_loss)

        loss_sum = loss_sum + jnp.where(active, round_loss, 0.0)
        loss_cnt = loss_cnt + jnp.where(active, 1.0, 0.0)
        steps = steps + jnp.where(active, 1, 0)
        last_logits = jnp.where(active, logits, last_logits)

        blend = jax.lax.stop_gradient(l_new) * 0.2 + l_new * 0.8
        cont = active & ~sat_now
        l_output = jnp.where(cont, blend,
                             jnp.where(newly_done, l_new, l_output))
        done = jnp.logical_or(done, sat_now)
        return (l_output, last_logits, loss_sum, loss_cnt, sup_loss, steps,
                done), None

    init = (_zero_state(2 * V, cfg.feature_maps), jnp.zeros((V, 1)),
            jnp.zeros(()), jnp.zeros(()), jnp.zeros(()),
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.bool_))
    body = jax.checkpoint(round_body) if training else round_body
    keys = jax.random.split(key, rounds)
    (l_output, last_logits, loss_sum, loss_cnt, sup_loss, steps, done), _ = \
        jax.lax.scan(body, init, keys)

    loss = loss_sum / jnp.maximum(loss_cnt, 1.0) + sup_loss
    steps_taken = jnp.maximum(steps - 1, 0)
    return last_logits, loss, steps_taken, {"solved": done}
