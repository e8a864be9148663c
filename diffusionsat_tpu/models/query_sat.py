"""QuerySAT — the DiffusionSAT core model, TPU-native.

Re-design of the reference `model/query_sat.py:84-373` as pure functions
over explicit param pytrees:

- the recurrent message-passing loop (`loop:186`, `for step in
  tf.range(rounds):225`) becomes a `jax.lax.scan` with per-round
  `jax.checkpoint` (rematerialization) — fixed trip count, XLA-friendly;
- the inner `tf.GradientTape` query gradient (`:227-245`) becomes
  `jax.value_and_grad` of the differentiable clause loss wrt the query;
- the SAT early exit (`:330-338`) becomes carry masking: once the rounded
  assignment satisfies the whole batch, state/logits/losses freeze — the
  observable outputs match the reference's break semantics while keeping a
  static trip count (an eval-only `while_loop` fast path can skip the tail);
- implicit `tf.random.*` draws (noise scale `:144`, per-round v1 noise
  `:239`, randomized rounding `:57`) become explicit PRNG keys threaded
  through the scan.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from diffusionsat_tpu.diffusion.schedule import (
    add_t_emb,
    construct_training_input,
    diffusion_kl_loss,
)
from diffusionsat_tpu.graph.batch import SatBatch
from diffusionsat_tpu.losses.sat import (
    is_batch_sat,
    linear_loss,
    softplus_loss,
    softplus_loss_and_grad,
    softplus_mixed_loss,
)
from diffusionsat_tpu.nn.mlp import MLPConfig, mlp_apply, mlp_init
from diffusionsat_tpu.nn.normalization import pair_norm_clauses, pair_norm_vars
from diffusionsat_tpu.ops.graph_ops import (
    clause_segment_sum,
    clause_to_lit,
    clause_degrees,
    graph_gather_vars,
    lit_to_clause,
    literal_degrees,
    var_segment_sum,
)


@dataclasses.dataclass(frozen=True)
class QuerySATConfig:
    """Architecture knobs (reference model/query_sat.py:86-126 defaults)."""
    feature_maps: int = 128
    query_maps: int = 128
    msg_layers: int = 3
    train_rounds: int = 32
    test_rounds: int = 64
    logit_maps: int = 8
    supervised: bool = True
    use_message_passing: bool = True
    use_linear_loss: bool = False
    update_layers: int = 3
    output_layers: int = 2
    query_layers: int = 2
    clauses_layers: int = 2
    update_scale: float = 1.8
    output_scale: float = 1.0
    clauses_scale: float = 1.6
    query_scale: float = 1.2
    # extra input channels: noisy solution one-hot (2) + t-emb (1) +
    # self-conditioning denoised channel (2)
    dtype: Any = jnp.float32
    # matmul operand dtype (None = float32; jnp.bfloat16 for MXU mixed
    # precision with f32 accumulation). Measured SLOWER on the dense path
    # (99 vs 86 ms round 2): it re-casts params inside every round.
    compute_dtype: Any = None
    # block-level bf16 for the dense path (VERDICT round-2 item 9):
    # params cast ONCE outside the scan, states/activations/incidence
    # bf16, matmuls accumulate f32, losses and normalizations f32.
    block_bf16: bool = False
    # rematerialization policy for the training scan body: "none" = save
    # everything (fastest, measured 222 vs 306 ms/step at the 20k-node
    # workload, fits v5e HBM comfortably), "dots" = save matmul outputs,
    # "full" = recompute the whole round in backward (lowest memory)
    remat: str = "none"
    # sanitizer/diagnostic knob: zero the per-round exploration noise so a
    # run is deterministic given explicit noise inputs — used by the
    # flat-vs-dense equivalence tests and for NaN bisection
    debug_zero_noise: bool = False
    # weighted multi-label selection: label-bank rows drawn with logits
    # alpha * label_isolation_k instead of uniformly (train/loop.
    # _select_labels). Positive alpha over-samples isolated solutions to
    # counter the raw sampler's basin-volume bias (UNIFORMITY_ANALYSIS.md
    # measured frequency ~ exp(-0.19 * z(distance)); alpha ~ +0.2 is the
    # first-order correction). 0.0 = reference-uniform selection.
    label_isolation_alpha: float = 0.0
    # training-time noise-level distribution: noise_scale = U**(1/skew).
    # skew=1.0 is the reference's uniform draw (model/query_sat.py:200
    # here, reference diffusion_training.py noise sampling); skew>1 skews
    # the density toward HIGH noise (pdf s*t^(s-1)) — the regime where the
    # reverse chain selects among solution modes and where the
    # multi-label posterior analysis (STATUS.md, hypothesis c) found the
    # KL's mode-balance signal weakest. Eval/sampling are unaffected
    # (they pass explicit noise_scale).
    noise_skew: float = 1.0
    # emit per-round in-model statistics (query/grad/state magnitudes,
    # per-round loss) through aux["round_stats"] — the analog of the
    # reference's in-graph tf.summary diagnostics
    # (model/query_sat.py:171-183,350-359). Off in the hot training step;
    # a separate jitted diagnostics forward uses it periodically.
    collect_round_stats: bool = False

    @property
    def label_channels(self) -> int:
        return 5

    def mlp_configs(self) -> dict[str, tuple[MLPConfig, int]]:
        f, q = self.feature_maps, self.query_maps
        v1_dim = f + 4 + self.label_channels
        return {
            "update_gate": (
                MLPConfig(self.update_layers, int(f * self.update_scale), f),
                q + v1_dim + 2 * q),
            "variables_output": (
                MLPConfig(self.output_layers, int(f * self.output_scale),
                          self.logit_maps), f),
            "variables_query": (
                MLPConfig(self.query_layers, int(q * self.query_scale), q),
                v1_dim),
            "clause_mlp": (
                MLPConfig(self.clauses_layers, int(f * self.clauses_scale),
                          f + q), f + 2 * q),
            "lit_mlp": (MLPConfig(self.msg_layers, q * 4, q * 2), v1_dim),
        }


def query_sat_init(key: jax.Array, cfg: QuerySATConfig) -> dict:
    params = {}
    cfgs = cfg.mlp_configs()
    keys = jax.random.split(key, len(cfgs))
    for k, (name, (mcfg, in_dim)) in zip(keys, cfgs.items()):
        params[name] = mlp_init(k, mcfg, in_dim)
    return params


def _head_weighted_loss(per_graph_loss: jnp.ndarray, logit_maps: int
                        ) -> jnp.ndarray:
    """Sorted-descending head costs (reference model/query_sat.py:311-315)."""
    costs = jnp.square(jnp.arange(1, logit_maps + 1, dtype=jnp.float32))
    ordered = -jnp.sort(-per_graph_loss, axis=-1)  # descending
    return jnp.sum(ordered * costs) / jnp.sum(costs)


def _prepare_noisy_labels(key: jax.Array, cfg: QuerySATConfig,
                          batch: SatBatch, labels: jnp.ndarray,
                          noise_scale: jnp.ndarray,
                          noisy_num: jnp.ndarray | None,
                          denoised_num: jnp.ndarray | None) -> jnp.ndarray:
    """Model input channels from labels/noise (reference
    model/query_sat.py:214-219). Returns [V, 5]."""
    if noisy_num is None:
        noisy = construct_training_input(key, labels, noise_scale)
    else:
        noisy = noisy_num
    noisy = add_t_emb(noisy, noise_scale)
    if denoised_num is None:
        den = jnp.zeros((batch.V, 2), cfg.dtype)
    else:
        den = jnp.concatenate([denoised_num, 1 - denoised_num], axis=-1)
    return jnp.concatenate([noisy, den], axis=-1)


def query_sat_apply(params: dict, cfg: QuerySATConfig, batch: SatBatch,
                    key: jax.Array, training: bool,
                    labels: jnp.ndarray | None = None,
                    noise_scale: jnp.ndarray | None = None,
                    noisy_num: jnp.ndarray | None = None,
                    denoised_num: jnp.ndarray | None = None,
                    rounds: int | None = None,
                    axis_name: str | None = None,
                    early_exit: bool = False,
                    plans=None,
                    halo: dict | None = None):
    """Run the recurrent loop. Returns (out_logits [V,1], loss, steps, aux).

    With `axis_name` the batch is a clause shard under shard_map
    (parallel/graph_partition.py): clause-side compute is local, literal
    aggregates and per-graph clause reductions psum over the axis. With
    `halo` (a parallel/halo.py plan view) the hot [2V, F] literal
    aggregations exchange only boundary rows, and per-graph losses are
    owner-masked before the (tiny) psum.

    Mirrors reference `call:133` + `loop:186`. `labels` are per-variable 0/1
    bits (flattened solutions); if None, random bits are drawn (predict
    mode, reference `:145`). `noise_scale` defaults to uniform(0,1)
    (reference `:144`).
    """
    mcfgs = cfg.mlp_configs()
    V, C = batch.V, batch.C
    if halo is not None and not cfg.supervised and cfg.use_linear_loss:
        # the replicated literal regularizer in linear_loss has no owner
        # masking: shards would each count it once and the grad psum
        # n_shards times — refuse rather than train silently wrong
        raise NotImplementedError(
            "halo execution supports supervised and clause-partitioned "
            "unsupervised losses; linear_loss is not owner-maskable")
    if rounds is None:
        rounds = cfg.train_rounds if training else cfg.test_rounds

    k_noise, k_labels, k_input, key_loop = jax.random.split(key, 4)
    if noise_scale is None:
        noise_scale = jax.random.uniform(k_noise, ())
        if cfg.noise_skew != 1.0:
            noise_scale = jnp.power(noise_scale, 1.0 / cfg.noise_skew)
    if labels is None:
        labels = jax.random.randint(k_labels, (V,), 0, 2, dtype=jnp.int32)

    noisy_labels = _prepare_noisy_labels(
        k_input, cfg, batch, labels, noise_scale, noisy_num, denoised_num)

    # degree weights (reference model/query_sat.py:193-197)
    lit_degree = literal_degrees(batch, axis_name)            # [2V, 1]
    degree_weight = jax.lax.rsqrt(jnp.maximum(lit_degree, 1.0))
    var_degree_weight = 4.0 * jax.lax.rsqrt(
        jnp.maximum(lit_degree[:V] + lit_degree[V:], 1.0))    # [V, 1]
    rev_degree_weight = jax.lax.rsqrt(
        jnp.maximum(clause_degrees(batch), 1.0))              # [C, 1]

    # per-graph normalized membership weights for the supervised loss
    inv_var_counts = jnp.where(batch.n_vars_per_graph > 0,
                               1.0 / jnp.maximum(batch.n_vars_per_graph, 1.0),
                               0.0)

    smoothed_labels = jnp.tile(labels.astype(cfg.dtype)[:, None],
                               (1, cfg.logit_maps))

    def round_body(carry, step_idx):
        (variables, clause_state, last_logits, best_map_vars, loss_sum,
         loss_count, steps, done) = carry

        k_v1 = jax.random.fold_in(key_loop, step_idx)

        # --- query + gradient of clause loss wrt query (reference :227-245)
        # computed in closed form (losses.softplus_loss_and_grad) — same
        # values as autodiff, but first-order ops under the outer backward
        if cfg.debug_zero_noise:
            noise4 = jnp.zeros((V, 4), cfg.dtype)
        else:
            noise4 = jax.random.normal(k_v1, (V, 4), cfg.dtype)
        v1 = jnp.concatenate([variables, noise4, noisy_labels], axis=-1)

        query = mlp_apply(params["variables_query"],
                          mcfgs["variables_query"][0], v1,
                          compute_dtype=cfg.compute_dtype)
        clauses_loss, grads = softplus_loss_and_grad(query, batch,
                                                     axis_name, plans=plans,
                                                     halo=halo)
        variables_grad = grads * var_degree_weight
        clauses_loss = clauses_loss * 4.0

        # --- clause update (reference :251-266)
        if cfg.use_message_passing:
            var_msg = mlp_apply(params["lit_mlp"], mcfgs["lit_mlp"][0], v1,
                                compute_dtype=cfg.compute_dtype)
            lit1, lit2 = jnp.split(var_msg, 2, axis=1)
            literals = jnp.concatenate([lit1, lit2], axis=0)  # [2V, Q]
            if plans is not None:
                from diffusionsat_tpu.ops.pallas_segsum import (
                    plan_lit_to_clause)
                clause_messages = plan_lit_to_clause(literals, plans) * \
                    rev_degree_weight
            else:
                clause_messages = lit_to_clause(batch, literals) * \
                    rev_degree_weight
            clause_unit = jnp.concatenate(
                [clause_state, clause_messages, clauses_loss], axis=-1)
        else:
            clause_unit = jnp.concatenate([clause_state, clauses_loss], axis=-1)
        clause_data = mlp_apply(params["clause_mlp"],
                                mcfgs["clause_mlp"][0], clause_unit,
                                compute_dtype=cfg.compute_dtype)

        variables_loss_all = clause_data[:, :cfg.query_maps]
        new_clause_value = clause_data[:, cfg.query_maps:]
        new_clause_value = pair_norm_clauses(new_clause_value, batch,
                                             axis_name=axis_name) * 0.25
        new_clause_state = new_clause_value + 0.1 * clause_state

        # --- variable update (reference :269-280)
        if plans is not None:
            from diffusionsat_tpu.ops.pallas_segsum import plan_clause_to_lit
            variables_loss = plan_clause_to_lit(variables_loss_all, plans) * \
                degree_weight
        else:
            variables_loss = clause_to_lit(batch, variables_loss_all,
                                           axis_name, halo) * degree_weight
        variables_loss_pos = variables_loss[:V]
        variables_loss_neg = variables_loss[V:]
        unit = jnp.concatenate(
            [variables_grad, v1, variables_loss_pos, variables_loss_neg],
            axis=-1)
        new_variables = mlp_apply(params["update_gate"],
                                  mcfgs["update_gate"][0], unit,
                                  compute_dtype=cfg.compute_dtype)
        new_variables = pair_norm_vars(new_variables, batch) * 0.25
        new_variables = new_variables + 0.1 * variables

        # --- logits and per-graph loss (reference :283-315)
        logits = mlp_apply(params["variables_output"],
                           mcfgs["variables_output"][0], new_variables,
                           compute_dtype=cfg.compute_dtype)
        if cfg.supervised:
            per_var_loss = diffusion_kl_loss(smoothed_labels, logits,
                                             noise_scale)
            per_var_loss = per_var_loss * batch.var_mask[:, None]
            per_graph_loss = var_segment_sum(batch, per_var_loss) * \
                inv_var_counts[:, None]
            if halo is not None:
                # each graph's loss is valid only on its owner shard
                # (other shards hold stale rows outside their closure);
                # assemble the global [G, H] with one tiny psum
                per_graph_loss = jax.lax.psum(
                    per_graph_loss * halo["owner_mask"][:, None], axis_name)
        else:
            if cfg.use_linear_loss:
                # reference :301-305 reduces to a scalar; spread per-graph
                per_graph_loss = jnp.zeros(
                    (batch.G, cfg.logit_maps), cfg.dtype
                ) + linear_loss(logits, batch) / jnp.maximum(
                    batch.graph_mask.sum(), 1.0) / cfg.logit_maps
                per_graph_loss = per_graph_loss * batch.graph_mask[:, None]
            else:
                per_clause_loss = softplus_mixed_loss(logits, batch)
                per_graph_loss = clause_segment_sum(batch, per_clause_loss,
                                                    axis_name)
                per_graph_loss = jnp.sqrt(per_graph_loss + 1e-6) - \
                    jnp.sqrt(1e-6)

        logit_loss = _head_weighted_loss(per_graph_loss, cfg.logit_maps)

        # best head per graph, broadcast to variables (reference :317-320)
        best_map = jnp.argmin(per_graph_loss, axis=-1).astype(jnp.float32)
        new_best_vars = graph_gather_vars(batch, best_map[:, None]
                                          )[:, 0].astype(jnp.int32)

        out_logits = jnp.take_along_axis(logits, new_best_vars[:, None],
                                         axis=1)
        sat = is_batch_sat(out_logits, batch, axis_name) >= 1.0

        # early-exit semantics via masking (reference :330-338): the loss of
        # the breaking round IS accumulated (step_losses.write at :323
        # precedes the break), but the stop_gradient blend is skipped.
        newly_done = jnp.logical_and(sat, jnp.logical_not(done))
        active = jnp.logical_not(done)

        def keep(old, new):
            return jnp.where(active, new, old)

        upd_logits = keep(last_logits, logits)
        upd_best = keep(best_map_vars, new_best_vars)
        loss_sum = loss_sum + jnp.where(active, logit_loss, 0.0)
        loss_count = loss_count + jnp.where(active, 1.0, 0.0)
        steps = steps + jnp.where(active, 1, 0)

        # stop_gradient blend only while continuing (reference :347-348)
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

    init_carry = (
        jnp.ones((V, cfg.feature_maps), cfg.dtype),   # variables (:148)
        jnp.ones((C, cfg.feature_maps), cfg.dtype),   # clauses state (:141)
        jnp.zeros((V, cfg.logit_maps), cfg.dtype),    # last_logits (:192)
        jnp.zeros((V,), jnp.int32),                   # best_logit_map (:204)
        jnp.zeros((), cfg.dtype),                     # loss sum
        jnp.zeros((), cfg.dtype),                     # loss count
        jnp.zeros((), jnp.int32),                     # steps taken
        jnp.zeros((), jnp.bool_),                     # done flag
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
        # inference fast path: a bounded while_loop that stops as soon as
        # the whole batch is satisfied (the reference's break, :330-338) —
        # identical outputs to the masked scan, but skips the tail rounds
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

    # unsupervised_loss = mean over executed rounds (reference :366-368)
    loss = loss_sum / jnp.maximum(loss_count, 1.0)

    out_logits = jnp.take_along_axis(last_logits, best_map_vars[:, None],
                                     axis=1)
    # reference reports the 0-based loop index at exit (= executed - 1)
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
