"""QuerySAT on the dense per-graph block layout — the MXU training path.

Same algorithm as models/query_sat.py (reference `model/query_sat.py:
133-373`: recurrent query loop, closed-form query gradient, 8 logit heads,
diffusion conditioning, masked early exit) over `DenseSatBatch` blocks
(graph/dense_batch.py). Every aggregation is a batched dense matmul or a
masked axis reduction — no gathers or segment ops anywhere in the step,
which removes the >80% non-SpMM overhead measured on the flat path.

Parameters are shared with the flat model (`query_sat_init`): the MLPs
act on the last axis only, so a checkpoint trained here loads directly
into the flat-layout sampler/eval paths and vice versa. Numerical
equivalence of the two paths is locked by tests/test_dense.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diffusionsat_tpu.diffusion.schedule import (
    add_t_emb,
    construct_training_input,
    diffusion_kl_loss,
)
from diffusionsat_tpu.graph.dense_batch import DenseSatBatch
from diffusionsat_tpu.models.query_sat import (
    QuerySATConfig,
    _head_weighted_loss,
    query_sat_init,  # re-export: params are layout-independent
)
from diffusionsat_tpu.nn.mlp import mlp_apply
from diffusionsat_tpu.ops import dense_ops as dops


def _prepare_noisy_labels(key: jax.Array, cfg: QuerySATConfig,
                          batch: DenseSatBatch, labels: jnp.ndarray,
                          noise_scale: jnp.ndarray,
                          noisy_num: jnp.ndarray | None,
                          denoised_num: jnp.ndarray | None) -> jnp.ndarray:
    """[G, Vg, 5] input channels (reference model/query_sat.py:214-219)."""
    if noisy_num is None:
        noisy = construct_training_input(key, labels, noise_scale)
    else:
        noisy = noisy_num
    noisy = add_t_emb(noisy, noise_scale)
    if denoised_num is None:
        den = jnp.zeros((batch.G, batch.Vg, 2), cfg.dtype)
    else:
        den = jnp.concatenate([denoised_num, 1 - denoised_num], axis=-1)
    return jnp.concatenate([noisy, den], axis=-1)


def query_sat_dense_apply(params: dict, cfg: QuerySATConfig,
                          batch: DenseSatBatch, key: jax.Array,
                          training: bool,
                          labels: jnp.ndarray | None = None,
                          noise_scale: jnp.ndarray | None = None,
                          noisy_num: jnp.ndarray | None = None,
                          denoised_num: jnp.ndarray | None = None,
                          rounds: int | None = None,
                          early_exit: bool = False):
    """Returns (out_logits [G, Vg, 1], loss, steps, aux) — the dense-layout
    counterpart of query_sat_apply (same contract, same semantics).

    `labels`: [G, Vg] 0/1 bits. All shapes are [G, nodes, features]; the
    MLPs contract the last axis so parameters are shared with the flat
    path.
    """
    mcfgs = cfg.mlp_configs()
    G, Vg, Cg = batch.G, batch.Vg, batch.Cg
    if rounds is None:
        rounds = cfg.train_rounds if training else cfg.test_rounds

    k_noise, k_labels, k_input, key_loop = jax.random.split(key, 4)
    if noise_scale is None:
        noise_scale = jax.random.uniform(k_noise, ())
        if cfg.noise_skew != 1.0:  # skew the draw toward high noise
            noise_scale = jnp.power(noise_scale, 1.0 / cfg.noise_skew)
    if labels is None:
        labels = jax.random.randint(k_labels, (G, Vg), 0, 2, dtype=jnp.int32)

    noisy_labels = _prepare_noisy_labels(
        k_input, cfg, batch, labels, noise_scale, noisy_num, denoised_num)

    # degree weights (reference model/query_sat.py:193-197)
    lit_degree = dops.literal_degrees(batch)                  # [G, 2Vg, 1]
    degree_weight = jax.lax.rsqrt(jnp.maximum(lit_degree, 1.0))
    var_degree_weight = 4.0 * jax.lax.rsqrt(
        jnp.maximum(lit_degree[:, :Vg] + lit_degree[:, Vg:], 1.0))
    rev_degree_weight = jax.lax.rsqrt(
        jnp.maximum(dops.clause_degrees(batch), 1.0))         # [G, Cg, 1]

    inv_var_counts = jnp.where(batch.n_vars_per_graph > 0,
                               1.0 / jnp.maximum(batch.n_vars_per_graph, 1.0),
                               0.0)

    smoothed_labels = jnp.tile(labels.astype(cfg.dtype)[..., None],
                               (1, 1, cfg.logit_maps))

    # block-level bf16 (VERDICT round-2 item 9): params and incidence are
    # cast ONCE here (the round-2 compute_dtype attempt lost because it
    # re-cast params inside every scanned round); recurrent states and
    # hidden activations flow bf16, matmuls accumulate f32, the loss
    # chain / degree weights / normalizations stay f32. Gradients reach
    # the f32 master params through the cast (standard mixed precision).
    if cfg.block_bf16:
        bf = jnp.bfloat16
        c = lambda t: t.astype(bf)  # noqa: E731
        params = jax.tree.map(c, params)
        batch = batch.replace(incidence=c(batch.incidence))
        noisy_labels_c = c(noisy_labels)
    else:
        c = lambda t: t  # noqa: E731
        noisy_labels_c = noisy_labels

    def round_body(carry, step_idx):
        (variables, clause_state, last_logits, best_map_vars, loss_sum,
         loss_count, steps, done) = carry

        k_v1 = jax.random.fold_in(key_loop, step_idx)

        # --- query + closed-form clause-loss gradient (reference :227-245)
        state_dt = variables.dtype
        if cfg.debug_zero_noise:
            noise4 = jnp.zeros((G, Vg, 4), state_dt)
        else:
            noise4 = jax.random.normal(k_v1, (G, Vg, 4), state_dt)
        v1 = jnp.concatenate([variables, noise4, noisy_labels_c], axis=-1)

        query = mlp_apply(params["variables_query"],
                          mcfgs["variables_query"][0], v1,
                          compute_dtype=cfg.compute_dtype)
        clauses_loss, grads = dops.softplus_loss_and_grad(query, batch)
        variables_grad = grads * var_degree_weight
        clauses_loss = clauses_loss * 4.0

        # --- clause update (reference :251-266)
        if cfg.use_message_passing:
            var_msg = mlp_apply(params["lit_mlp"], mcfgs["lit_mlp"][0], v1,
                                compute_dtype=cfg.compute_dtype)
            lit1, lit2 = jnp.split(var_msg, 2, axis=-1)
            literals = jnp.concatenate([lit1, lit2], axis=1)  # [G, 2Vg, Q]
            clause_messages = dops.lit_to_clause(batch, c(literals)) * \
                rev_degree_weight
            clause_unit = jnp.concatenate(
                [clause_state, c(clause_messages), c(clauses_loss)],
                axis=-1)
        else:
            clause_unit = jnp.concatenate([clause_state, c(clauses_loss)],
                                          axis=-1)
        clause_data = mlp_apply(params["clause_mlp"],
                                mcfgs["clause_mlp"][0], clause_unit,
                                compute_dtype=cfg.compute_dtype)

        variables_loss_all = clause_data[..., :cfg.query_maps]
        new_clause_value = clause_data[..., cfg.query_maps:]
        new_clause_value = dops.pair_norm_clauses(new_clause_value,
                                                  batch) * 0.25
        new_clause_state = c(new_clause_value + 0.1 * clause_state)

        # --- variable update (reference :269-280)
        variables_loss = dops.clause_to_lit(batch, c(variables_loss_all)) * \
            degree_weight
        variables_loss_pos = variables_loss[:, :Vg]
        variables_loss_neg = variables_loss[:, Vg:]
        unit = jnp.concatenate(
            [c(variables_grad), v1, c(variables_loss_pos),
             c(variables_loss_neg)], axis=-1)
        new_variables = mlp_apply(params["update_gate"],
                                  mcfgs["update_gate"][0], unit,
                                  compute_dtype=cfg.compute_dtype)
        new_variables = dops.pair_norm_vars(new_variables, batch) * 0.25
        new_variables = c(new_variables + 0.1 * variables)

        # --- logits and per-graph loss (reference :283-315)
        logits = mlp_apply(params["variables_output"],
                           mcfgs["variables_output"][0], new_variables,
                           compute_dtype=cfg.compute_dtype)
        if cfg.supervised:
            per_var_loss = diffusion_kl_loss(smoothed_labels, logits,
                                             noise_scale)
            per_var_loss = per_var_loss * batch.var_mask[..., None]
            per_graph_loss = jnp.sum(per_var_loss, axis=1) * \
                inv_var_counts[:, None]                       # [G, H]
        else:
            if cfg.use_linear_loss:
                per_graph_loss = jnp.zeros(
                    (G, cfg.logit_maps), cfg.dtype
                ) + dops.linear_loss(logits, batch) / jnp.maximum(
                    batch.graph_mask.sum(), 1.0) / cfg.logit_maps
                per_graph_loss = per_graph_loss * batch.graph_mask[:, None]
            else:
                per_clause_loss = dops.softplus_mixed_loss(logits, batch)
                per_graph_loss = dops.clause_graph_sum(batch,
                                                       per_clause_loss)
                per_graph_loss = jnp.sqrt(per_graph_loss + 1e-6) - \
                    jnp.sqrt(1e-6)

        logit_loss = _head_weighted_loss(per_graph_loss, cfg.logit_maps)

        # best head per graph, broadcast to variables (reference :317-320)
        best_map = jnp.argmin(per_graph_loss, axis=-1).astype(jnp.int32)
        new_best_vars = jnp.broadcast_to(best_map[:, None], (G, Vg))

        out_logits = jnp.take_along_axis(logits, new_best_vars[..., None],
                                         axis=-1)
        sat = dops.is_batch_sat(out_logits, batch) >= 1.0

        newly_done = jnp.logical_and(sat, jnp.logical_not(done))
        active = jnp.logical_not(done)

        def keep(old, new):
            return jnp.where(active, new, old)

        upd_logits = keep(last_logits, logits)
        upd_best = keep(best_map_vars, new_best_vars)
        loss_sum = loss_sum + jnp.where(active, logit_loss, 0.0)
        loss_count = loss_count + jnp.where(active, 1.0, 0.0)
        steps = steps + jnp.where(active, 1, 0)

        blend_v = jax.lax.stop_gradient(new_variables) * 0.2 + \
            new_variables * 0.8
        blend_c = jax.lax.stop_gradient(new_clause_state) * 0.2 + \
            new_clause_state * 0.8
        cont = active & ~newly_done
        upd_variables = jnp.where(cont, blend_v,
                                  jnp.where(newly_done, new_variables,
                                            variables))
        upd_clause_state = jnp.where(cont, blend_c,
                                     jnp.where(newly_done, new_clause_state,
                                               clause_state))

        new_done = jnp.logical_or(done, sat)
        new_carry = (upd_variables, upd_clause_state, upd_logits, upd_best,
                     loss_sum, loss_count, steps, new_done)
        if cfg.collect_round_stats:
            # reference in-graph summaries (model/query_sat.py:171-183)
            ys = {
                "logit_loss": logit_loss,
                "query_mean_abs": jnp.mean(jnp.abs(query)),
                "grad_mean_abs": jnp.mean(jnp.abs(variables_grad)),
                "var_state_rms": jnp.sqrt(jnp.mean(jnp.square(new_variables))),
                "clause_state_rms": jnp.sqrt(
                    jnp.mean(jnp.square(new_clause_state))),
                "logits_mean_abs": jnp.mean(jnp.abs(logits)),
                "batch_sat": sat.astype(jnp.float32),
            }
        else:
            ys = None
        return new_carry, ys

    state_dtype = jnp.bfloat16 if cfg.block_bf16 else cfg.dtype
    init_carry = (
        jnp.ones((G, Vg, cfg.feature_maps), state_dtype),
        jnp.ones((G, Cg, cfg.feature_maps), state_dtype),
        jnp.zeros((G, Vg, cfg.logit_maps), cfg.dtype),
        jnp.zeros((G, Vg), jnp.int32),
        jnp.zeros((), cfg.dtype),
        jnp.zeros((), cfg.dtype),
        jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.bool_),
    )

    if training or not early_exit:
        def scan_body(carry, step_idx):
            return round_body(carry, step_idx)
        if training and cfg.remat == "full":
            body = jax.checkpoint(scan_body)
        elif training and cfg.remat == "dots":
            body = jax.checkpoint(
                scan_body, policy=jax.checkpoint_policies.dots_saveable)
        else:
            body = scan_body
        carry, round_stats = jax.lax.scan(body, init_carry,
                                          jnp.arange(rounds, dtype=jnp.int32))
    else:
        round_stats = None
        def while_cond(state):
            step_idx, carry = state
            done = carry[-1]
            return jnp.logical_and(step_idx < rounds,
                                   jnp.logical_not(done))

        def while_body(state):
            step_idx, carry = state
            carry, _ = round_body(carry, step_idx)
            return step_idx + 1, carry

        _, carry = jax.lax.while_loop(
            while_cond, while_body,
            (jnp.zeros((), jnp.int32), init_carry))

    (variables, clause_state, last_logits, best_map_vars, loss_sum,
     loss_count, steps, done) = carry

    loss = loss_sum / jnp.maximum(loss_count, 1.0)
    out_logits = jnp.take_along_axis(last_logits, best_map_vars[..., None],
                                     axis=-1)
    steps_taken = jnp.maximum(steps - 1, 0)
    aux = {
        "logits_all_heads": last_logits,
        "solved": done,
        "variables_state": variables,
        "clause_state": clause_state,
    }
    if round_stats is not None:
        aux["round_stats"] = round_stats
    return out_logits, loss, steps_taken, aux
