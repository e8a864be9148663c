"""ANFSAT — GNN over ANF (XOR of AND-pairs) equation systems, TPU-native.

Port of reference `model/anf_sat.py:12-279`: complex-valued query clause
evaluation, var/AND-node messages into clauses, clause MLP with PairNorm,
AND-node MLP whose output is scatter-added back to both operand variables
(`:161-162`), supervised CE or unsupervised (1 - clause_real)^2 loss.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from diffusionsat_tpu.graph.anf_batch import ANFBatch
from diffusionsat_tpu.losses.anf import anf_value_cplx
from diffusionsat_tpu.nn.mlp import MLPConfig, mlp_apply, mlp_init


@dataclasses.dataclass(frozen=True)
class ANFSATConfig:
    feature_maps: int = 128
    query_maps: int = 128
    msg_layers: int = 2
    vote_layers: int = 2
    train_rounds: int = 16
    test_rounds: int = 32
    supervised: bool = True
    use_message_passing: bool = True
    use_query: bool = True
    # CE weight multiplier on free message-bit input vars
    # (batch.free_input_mask). Motivation: the round-4 error-structure
    # study showed free-input accuracy (~76%) is the systems-solved
    # bottleneck — input-anchored CDCL completion recovers every system
    # whose inputs are right, and derived vars are pure functions of the
    # inputs (ANF_ERROR_STRUCTURE*.json, sat/anf_completion.py).
    free_input_upweight: float = 1.0
    update_scale: float = 2.0
    output_scale: float = 1.0
    clauses_scale: float = 2.0
    query_scale: float = 3.0

    def mlp_configs(self):
        f, q = self.feature_maps, self.query_maps
        clause_in = f
        if self.use_message_passing:
            clause_in += q
        if self.use_query:
            # the q query columns are treated as q/2 real + q/2 imaginary
            # halves (anf_value_cplx), so the [real, imag] concat is q wide
            clause_in += q
        return {
            "update_gate": (MLPConfig(self.msg_layers,
                                      int(f * self.update_scale), f), f + q),
            "variables_output": (MLPConfig(self.vote_layers,
                                           int(f * self.output_scale), 1), f),
            "variables_query": (MLPConfig(self.vote_layers,
                                          int(q * self.query_scale), q),
                                f + 4),
            "clause_mlp": (MLPConfig(self.msg_layers,
                                     int(f * self.update_scale), f + q),
                           clause_in),
            "grad_mlp": (MLPConfig(self.msg_layers,
                                   int(f * self.clauses_scale), q), q),
            "ands_mlp": (MLPConfig(self.msg_layers,
                                   int(f * self.clauses_scale), q),
                         2 * f + q),
            "var2ands_mlp": (MLPConfig(self.msg_layers,
                                       int(f * self.clauses_scale), q),
                             2 * f),
            "var2clause_mlp": (MLPConfig(self.msg_layers,
                                         int(f * self.clauses_scale), q), f),
        }


def anf_sat_init(key: jax.Array, cfg: ANFSATConfig) -> dict:
    params = {}
    cfgs = cfg.mlp_configs()
    keys = jax.random.split(key, len(cfgs) + 1)
    for k, (name, (mcfg, in_dim)) in zip(keys, cfgs.items()):
        params[name] = mlp_init(k, mcfg, in_dim)
    params["zero_var"] = jnp.full((1, cfg.query_maps), 0.02)
    return params


def _zero_state(n_units: int, n_features: int, stddev: float = 0.25):
    onehot = jnp.zeros((n_units, n_features)).at[:, 0].set(1.0)
    onehot = onehot - 1.0 / n_features
    return onehot * jnp.sqrt(jnp.asarray(n_features, jnp.float32)) * stddev


def _pair_norm(x, seg_ids, counts, mask, num_graphs, eps=1e-6):
    sums = jax.ops.segment_sum(x * mask[:, None], seg_ids,
                               num_segments=num_graphs + 1)[:num_graphs]
    mean_g = sums / jnp.maximum(counts, 1.0)[:, None]
    padded = jnp.concatenate([mean_g, jnp.zeros_like(mean_g[:1])], axis=0)
    x = x - jnp.take(padded, seg_ids, axis=0)
    variance = jnp.mean(jnp.square(x), axis=1, keepdims=True)
    return x * jax.lax.rsqrt(variance + eps)


def anf_sat_apply(params: dict, cfg: ANFSATConfig, batch: ANFBatch,
                  key: jax.Array, training: bool = True,
                  labels: jnp.ndarray | None = None,
                  rounds: int | None = None,
                  tiles=None):
    mcfgs = cfg.mlp_configs()
    V, A, C = batch.V, batch.A, batch.C
    if rounds is None:
        rounds = cfg.train_rounds if training else cfg.test_rounds

    # degrees over the membership edges (reference anf_sat.py:94-97)
    node_degree = jax.ops.segment_sum(batch.edge_mask_n, batch.edge_node_n,
                                      num_segments=batch.n_value_nodes,
                                      indices_are_sorted=True)[:, None]
    degree_weight = jax.lax.rsqrt(jnp.maximum(node_degree, 1.0))
    clause_degree = jax.ops.segment_sum(
        batch.edge_mask_c, batch.edge_clause_c, num_segments=C,
        indices_are_sorted=True)[:, None]
    clause_degree_weight = jax.lax.rsqrt(jnp.maximum(clause_degree, 1.0))

    # membership aggregations: flat sorted segment sums, or — with a
    # `tiles` plan (ops/tiled_ops.build_tiled_from_edges over the masked
    # (clause, value-node) edges) — block-sparse batched MXU matmuls,
    # the same layout swap as the CNF flat path (ops/tiled_ops.py)
    if tiles is not None:
        from diffusionsat_tpu.ops.tiled_ops import (
            tiled_clause_to_lit, tiled_lit_to_clause)

        def seg_to_clause(x_nodes):
            return tiled_lit_to_clause(x_nodes, tiles)

        def seg_to_nodes(x_clauses):
            return tiled_clause_to_lit(x_clauses, tiles)
    else:
        def seg_to_clause(x_nodes):
            g = jnp.take(x_nodes, batch.edge_node_c, axis=0)
            g = g * batch.edge_mask_c[:, None]
            return jax.ops.segment_sum(g, batch.edge_clause_c,
                                       num_segments=C,
                                       indices_are_sorted=True)

        def seg_to_nodes(x_clauses):
            g = jnp.take(x_clauses, batch.edge_clause_n, axis=0)
            g = g * batch.edge_mask_n[:, None]
            return jax.ops.segment_sum(g, batch.edge_node_n,
                                       num_segments=batch.n_value_nodes,
                                       indices_are_sorted=True)

    # AND operand variable indices, 0-based into [V] (operands are never
    # the constant in cgen-produced systems; guard anyway)
    a1_var = jnp.maximum(batch.and1 - 1, 0)
    a2_var = jnp.maximum(batch.and2 - 1, 0)

    if labels is not None:
        smoothed = 0.5 * 0.1 + labels.astype(jnp.float32)[:, None] * 0.9

    def round_body(carry, key_t):
        variables, clause_state, last_logits, loss_sum, steps = carry

        if cfg.use_query:
            v1 = jnp.concatenate(
                [variables, jax.random.normal(key_t, (V, 4))], axis=-1)
            query = mlp_apply(params["variables_query"],
                              mcfgs["variables_query"][0], v1)
            clauses_real, clauses_im, _, _ = anf_value_cplx(query, batch,
                                                            tiles=tiles)
            query_msg = jnp.concatenate([clauses_real, clauses_im], axis=-1)

        ands1 = jnp.take(variables, a1_var, axis=0)  # [A, f]
        ands2 = jnp.take(variables, a2_var, axis=0)

        if cfg.use_message_passing:
            ands_data = mlp_apply(params["var2ands_mlp"],
                                  mcfgs["var2ands_mlp"][0],
                                  jnp.concatenate([ands1, ands2], axis=-1))
            var_data = mlp_apply(params["var2clause_mlp"],
                                 mcfgs["var2clause_mlp"][0], variables)
            node_data = jnp.concatenate(
                [params["zero_var"], var_data, ands_data], axis=0)
            clause_messages = seg_to_clause(node_data) * clause_degree_weight
            if cfg.use_query:
                clause_unit = jnp.concatenate(
                    [clause_state, clause_messages, query_msg], axis=-1)
            else:
                clause_unit = jnp.concatenate(
                    [clause_state, clause_messages], axis=-1)
        else:
            clause_unit = jnp.concatenate([clause_state, query_msg], axis=-1)
        clause_data = mlp_apply(params["clause_mlp"],
                                mcfgs["clause_mlp"][0], clause_unit)

        loss_to_vars = clause_data[:, :cfg.query_maps]
        new_clause_value = clause_data[:, cfg.query_maps:]
        new_clause_value = _pair_norm(
            new_clause_value, batch.clause_graph, batch.n_clauses_per_graph,
            batch.clause_mask, batch.G) * 0.25
        clause_state = new_clause_value + 0.1 * clause_state

        # clause -> node aggregation (reference :152-155)
        nodes_loss = seg_to_nodes(loss_to_vars) * degree_weight
        variables_loss = nodes_loss[1:V + 1]           # variable part
        ands_loss = nodes_loss[1 + V:]                 # AND-node part
        ands_unit = jnp.concatenate([ands1, ands2, ands_loss], axis=-1)
        ands_value = mlp_apply(params["ands_mlp"], mcfgs["ands_mlp"][0],
                               ands_unit)
        ands_value = ands_value * batch.and_mask[:, None]

        # scatter-add AND values to both operand variables (reference
        # :161-162)
        variables_loss = variables_loss.at[a1_var].add(ands_value)
        variables_loss = variables_loss.at[a2_var].add(ands_value)

        unit = jnp.concatenate([variables, variables_loss], axis=-1)
        new_variables = mlp_apply(params["update_gate"],
                                  mcfgs["update_gate"][0], unit)
        new_variables = _pair_norm(
            new_variables, batch.var_graph, batch.n_vars_per_graph,
            batch.var_mask, batch.G) * 0.25
        variables = new_variables + 0.1 * variables

        logits = mlp_apply(params["variables_output"],
                           mcfgs["variables_output"][0], variables)
        if cfg.supervised and labels is not None:
            ce = jnp.maximum(logits, 0) - logits * smoothed + \
                jnp.log1p(jnp.exp(-jnp.abs(logits)))
            ce_w = batch.var_mask
            if (cfg.free_input_upweight != 1.0
                    and batch.free_input_mask is not None):
                ce_w = ce_w * (1.0 + (cfg.free_input_upweight - 1.0)
                               * batch.free_input_mask)
            logit_loss = jnp.sum(ce * ce_w[:, None]) / \
                jnp.maximum(jnp.sum(ce_w), 1.0)
        else:
            neg2 = jnp.concatenate([-logits, jnp.zeros_like(logits)], axis=-1)
            clauses_real, _, _, _ = anf_value_cplx(neg2, batch,
                                                   use_norm=True, tiles=tiles)
            per_clause_loss = jnp.square(1 - clauses_real) * \
                batch.clause_mask[:, None]
            per_graph_loss = jax.ops.segment_sum(
                per_clause_loss, batch.clause_graph,
                num_segments=batch.G + 1)[:batch.G]
            masked = jnp.where(batch.graph_mask[:, None] > 0,
                               per_graph_loss + 1e-6, 0.0)
            logit_loss = jnp.sum(jnp.sqrt(masked))

        loss_sum = loss_sum + logit_loss
        steps = steps + 1

        variables = jax.lax.stop_gradient(variables) * 0.2 + variables * 0.8
        clause_state = jax.lax.stop_gradient(clause_state) * 0.2 + \
            clause_state * 0.8
        return (variables, clause_state, logits, loss_sum, steps), None

    init = (_zero_state(V, cfg.feature_maps),
            _zero_state(C, cfg.feature_maps),
            jnp.zeros((V, 1)), jnp.zeros(()), jnp.zeros((), jnp.int32))
    body = jax.checkpoint(round_body) if training else round_body
    keys = jax.random.split(key, rounds)
    (variables, clause_state, last_logits, loss_sum, steps), _ = \
        jax.lax.scan(body, init, keys)

    loss = loss_sum / jnp.asarray(rounds, jnp.float32)
    return last_logits, loss, steps - 1, {}
