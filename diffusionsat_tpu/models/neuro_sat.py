"""NeuroSAT — classic LSTM message-passing SAT model, TPU-native.

Port of reference `model/neuro_sat.py:10-111`: learned literal/clause init
embeddings, MLP-transformed messages through the incidence graph, LSTM cell
updates for both node kinds, literal-flip concatenation, a vote MLP, and an
unsupervised softplus_log_square loss accumulated per round with early
exit. The Python round loop becomes lax.scan with done-masking.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from diffusionsat_tpu.graph.batch import SatBatch
from diffusionsat_tpu.losses.sat import (
    softplus_log_square_loss,
    unsat_clause_count,
)
from diffusionsat_tpu.nn.lstm import lstm_apply, lstm_init
from diffusionsat_tpu.nn.mlp import MLPConfig, mlp_apply, mlp_init
from diffusionsat_tpu.ops.graph_ops import clause_to_lit, lit_to_clause


@dataclasses.dataclass(frozen=True)
class NeuroSATConfig:
    feature_maps: int = 256
    msg_layers: int = 3
    vote_layers: int = 3
    rounds: int = 32

    def mlp_configs(self):
        f = self.feature_maps
        return {
            "LC_msg": (MLPConfig(self.msg_layers, f, f), f),
            "CL_msg": (MLPConfig(self.msg_layers, f, f), f),
            "L_vote": (MLPConfig(self.vote_layers, f * 2, 1), f * 2),
        }


def neuro_sat_init(key: jax.Array, cfg: NeuroSATConfig) -> dict:
    f = cfg.feature_maps
    keys = jax.random.split(key, 5)
    params = {
        "L_init": jax.random.normal(keys[0], (1, f)) * 0.05,
        "C_init": jax.random.normal(keys[1], (1, f)) * 0.05,
        "L_update": lstm_init(keys[2], 2 * f, f),
        "C_update": lstm_init(keys[3], f, f),
    }
    mkeys = jax.random.split(keys[4], 3)
    for k, (name, (mcfg, in_dim)) in zip(mkeys, cfg.mlp_configs().items()):
        params[name] = mlp_init(k, mcfg, in_dim)
    return params


def _flip(literals: jnp.ndarray, n_vars: int) -> jnp.ndarray:
    """Swap positive/negative literal blocks (reference :74-76)."""
    return jnp.concatenate([literals[n_vars:], literals[:n_vars]], axis=0)


def neuro_sat_apply(params: dict, cfg: NeuroSATConfig, batch: SatBatch,
                    key: jax.Array, training: bool = True,
                    rounds: int | None = None):
    mcfgs = cfg.mlp_configs()
    V = batch.V
    f = cfg.feature_maps
    denom = jnp.sqrt(jnp.asarray(f, jnp.float32))
    rounds = rounds or cfg.rounds

    l_h = jnp.tile(params["L_init"] / denom, (2 * V, 1))
    c_h = jnp.tile(params["C_init"] / denom, (batch.C, 1))

    def round_body(carry, _):
        l_state, c_state, last_logits, loss_sum, steps, done = carry
        LC_pre = mlp_apply(params["LC_msg"], mcfgs["LC_msg"][0], l_state[0])
        LC_msgs = lit_to_clause(batch, LC_pre)
        _, c_state_new = lstm_apply(params["C_update"], LC_msgs, c_state)

        CL_pre = mlp_apply(params["CL_msg"], mcfgs["CL_msg"][0],
                           c_state_new[0])
        CL_msgs = clause_to_lit(batch, CL_pre)
        l_in = jnp.concatenate([CL_msgs, _flip(l_state[0], V)], axis=1)
        _, l_state_new = lstm_apply(params["L_update"], l_in, l_state)

        literals = l_state_new[0]
        variables = jnp.concatenate([literals[:V], literals[V:]], axis=1)
        logits = mlp_apply(params["L_vote"], mcfgs["L_vote"][0], variables)

        logits_loss = jnp.sum(softplus_log_square_loss(logits, batch))
        n_unsat = unsat_clause_count(logits, batch)
        sat_now = (logits_loss < 0.5) & (n_unsat == 0)

        active = jnp.logical_not(done)

        def keep(old, new):
            return jax.tree.map(lambda o, n: jnp.where(active, n, o), old, new)

        l_state = keep(l_state, l_state_new)
        c_state = keep(c_state, c_state_new)
        last_logits = jnp.where(active, logits, last_logits)
        loss_sum = loss_sum + jnp.where(active, logits_loss, 0.0)
        steps = steps + jnp.where(active, 1, 0)
        done = jnp.logical_or(done, sat_now)
        return (l_state, c_state, last_logits, loss_sum, steps, done), None

    init = (
        (l_h, jnp.zeros((2 * V, f))),
        (c_h, jnp.zeros((batch.C, f))),
        jnp.zeros((V, 1)),
        jnp.zeros(()),
        jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.bool_),
    )
    body = jax.checkpoint(round_body) if training else round_body
    (l_state, c_state, last_logits, loss_sum, steps, done), _ = \
        jax.lax.scan(body, init, None, length=rounds)

    # final vote from the last literal state (reference :69-71)
    literals = l_state[0]
    variables = jnp.concatenate([literals[:V], literals[V:]], axis=1)
    logits = mlp_apply(params["L_vote"], mcfgs["L_vote"][0], variables)

    steps_taken = jnp.maximum(steps - 1, 0)
    loss = loss_sum / jnp.maximum(steps_taken.astype(jnp.float32), 1.0)
    return logits, loss, steps_taken, {"solved": done}
