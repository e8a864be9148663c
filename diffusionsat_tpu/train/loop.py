"""Training loop: jitted train/predict steps + the driver.

The analog of the reference's `diffusion_training.py:277-350` train loop and
QuerySAT's `train_step`/`predict_step` (`model/query_sat.py:375-451`), as
pure jitted functions over an explicit TrainState. Checkpointing uses orbax
(reference `tf.train.CheckpointManager`, `diffusion_training.py:353-363`).
"""

from __future__ import annotations

import itertools
import time
from pathlib import Path
from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from diffusionsat_tpu.graph.batch import SatBatch
from diffusionsat_tpu.models.query_sat import QuerySATConfig, query_sat_apply
from diffusionsat_tpu.train.metrics import Metric


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray  # int32
    key: jax.Array


def _accepts_labels(apply_fn: Callable) -> bool:
    import inspect
    try:
        return "labels" in inspect.signature(apply_fn).parameters
    except (TypeError, ValueError):
        return False


def _select_labels(batch, key: jax.Array,
                   isolation_alpha: float = 0.0) -> jnp.ndarray:
    """Per-graph random label draw from the batch's multi-label bank.

    With `solutions_k` present ([K, V] flat / [K, G, Vg] dense), every
    graph independently picks one of its K uniform solution samples per
    call, so across steps the supervision target is (empirically) uniform
    over each formula's sampled solution set — the denoising-posterior
    training signal the single-fixed-label scheme (reference
    data/diffusion_sat_instances.py:36-94) lacks. Without the bank this
    returns `batch.solutions` unchanged (and callers must not burn RNG).

    `isolation_alpha` != 0 (with `label_isolation_k` attached) switches
    to a per-graph softmax draw with logits alpha * isolation: positive
    alpha over-samples isolated solutions during training, the
    counterweight to the raw sampler's basin-volume bias (measured
    frequency ~ exp(-0.19 * z(distance)), UNIFORMITY_ANALYSIS.md)."""
    sk = batch.solutions_k
    if sk is None:
        return batch.solutions
    K = sk.shape[0]
    iso = getattr(batch, "label_isolation_k", None)
    weighted = isolation_alpha != 0.0 and iso is not None
    if sk.ndim == 3:  # dense layout: [K, G, Vg]
        G = sk.shape[1]
        if weighted:  # Gumbel-max == softmax(alpha * iso) per graph
            gum = jax.random.gumbel(key, (K, G))
            kg = jnp.argmax(isolation_alpha * iso + gum, axis=0)
        else:
            kg = jax.random.randint(key, (G,), 0, K)
        return sk[kg, jnp.arange(G), :]
    # flat layout: [K, V]; var_graph padding id G indexes the extra row
    G = batch.graph_mask.shape[0]
    if weighted:
        gum = jax.random.gumbel(key, (K, G))
        kg_g = jnp.argmax(isolation_alpha * iso + gum, axis=0)
        kg = jnp.concatenate([kg_g, jnp.zeros((1,), kg_g.dtype)])
    else:
        kg = jax.random.randint(key, (G + 1,), 0, K)
    return sk[kg[batch.var_graph], jnp.arange(sk.shape[1])]


def make_train_step_for(apply_fn: Callable, cfg,
                        optimizer: optax.GradientTransformation
                        ) -> Callable[[TrainState, SatBatch],
                                      tuple[TrainState, dict]]:
    """Jitted train step for any model with the standard apply contract
    (params, cfg, batch, key, training[, labels]) -> (logits, loss, steps,
    aux). Supervised models (QuerySAT's diffusion path) get the batch's
    solution bits as labels."""
    with_labels = _accepts_labels(apply_fn)
    iso_alpha = float(getattr(cfg, "label_isolation_alpha", 0.0))

    @jax.jit
    def train_step(state: TrainState, batch: SatBatch):
        # getattr: batch types without a bank field (ANFBatch) stay on the
        # single-label path
        multilabel = with_labels and \
            getattr(batch, "solutions_k", None) is not None
        if multilabel:  # static: pytree structure decides at trace time
            key, subkey, k_label = jax.random.split(state.key, 3)
            labels = _select_labels(batch, k_label,
                                    isolation_alpha=iso_alpha)
        else:
            key, subkey = jax.random.split(state.key)
            labels = batch.solutions

        def loss_fn(params):
            kw = {"labels": labels} if with_labels else {}
            _, loss, steps, _ = apply_fn(params, cfg, batch, subkey,
                                         training=True, **kw)
            return loss, steps

        (loss, steps), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        gradnorm = optax.global_norm(grads)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1, key=key)
        return new_state, {"loss": loss, "steps_taken": steps,
                           "gradnorm": gradnorm}

    return train_step


def make_scanned_train_step_for(apply_fn: Callable, cfg,
                                optimizer: optax.GradientTransformation
                                ) -> Callable:
    """N training steps in ONE dispatch: `lax.scan` of the train-step
    body over a leading stack axis of same-shape batches.

    Through the axon tunnel every jitted call is an RPC; chaining N
    steps inside one executable removes N-1 per-step dispatches (and the
    host-side Python/serialization work with them). Bit-identical to N
    sequential `make_train_step_for` calls: the body splits keys in the
    same order and runs the same update (tests/test_mega_step.py).

    The returned step takes (state, stacked_batch) where `stacked_batch`
    is a pytree of same-shape batches stacked on axis 0 (see
    `stack_batches`), and advances `state.step` by the stack length."""
    with_labels = _accepts_labels(apply_fn)
    iso_alpha = float(getattr(cfg, "label_isolation_alpha", 0.0))

    @jax.jit
    def mega_step(state: TrainState, stacked):
        def body(st, batch):
            multilabel = with_labels and \
                getattr(batch, "solutions_k", None) is not None
            if multilabel:
                key, subkey, k_label = jax.random.split(st.key, 3)
                labels = _select_labels(batch, k_label,
                                        isolation_alpha=iso_alpha)
            else:
                key, subkey = jax.random.split(st.key)
                labels = batch.solutions

            def loss_fn(params):
                kw = {"labels": labels} if with_labels else {}
                _, loss, steps, _ = apply_fn(params, cfg, batch, subkey,
                                             training=True, **kw)
                return loss, steps

            (loss, steps), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(st.params)
            updates, opt_state = optimizer.update(grads, st.opt_state,
                                                  st.params)
            params = optax.apply_updates(st.params, updates)
            nxt = TrainState(params=params, opt_state=opt_state,
                             step=st.step + 1, key=key)
            return nxt, {"loss": loss, "steps_taken": steps}

        state, outs = jax.lax.scan(body, state, stacked)
        return state, {"loss": jnp.mean(outs["loss"]),
                       "loss_per_step": outs["loss"],
                       "steps_taken": outs["steps_taken"][-1]}

    return mega_step


def stack_batches(batches):
    """Stack same-shape batch pytrees on a new leading axis (host-side
    numpy; optional None fields must be uniformly set or unset)."""
    import numpy as _np
    return jax.tree.map(lambda *xs: _np.stack([_np.asarray(x) for x in xs]),
                        *batches)


def make_train_step(cfg: QuerySATConfig, optimizer: optax.GradientTransformation
                    ) -> Callable[[TrainState, SatBatch], tuple[TrainState, dict]]:
    """Jitted supervised-diffusion train step on QuerySAT
    (reference model/query_sat.py:380-391)."""
    return make_train_step_for(query_sat_apply, cfg, optimizer)


def make_planned_train_step(cfg: QuerySATConfig,
                            optimizer: optax.GradientTransformation):
    """QuerySAT train step over (state, batch, plans): the Pallas-kernel
    SpMM path (ops/pallas_segsum.BatchPlans). Measured 213 vs 335 ms/step
    at the reference 20k-node workload (with remat='none')."""

    iso_alpha = float(getattr(cfg, "label_isolation_alpha", 0.0))

    @jax.jit
    def train_step(state: TrainState, batch: SatBatch, plans):
        if getattr(batch, "solutions_k", None) is not None:
            key, subkey, k_label = jax.random.split(state.key, 3)
            labels = _select_labels(batch, k_label,
                                    isolation_alpha=iso_alpha)
        else:
            key, subkey = jax.random.split(state.key)
            labels = batch.solutions

        def loss_fn(params):
            _, loss, steps, _ = query_sat_apply(
                params, cfg, batch, subkey, training=True,
                labels=labels, plans=plans)
            return loss, steps

        (loss, steps), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1, key=key)
        return new_state, {"loss": loss, "steps_taken": steps}

    return train_step


def make_planned_train_step_for(apply_fn: Callable, cfg,
                                optimizer: optax.GradientTransformation,
                                plan_kw: str = "plans"):
    """Generic train step over (state, batch, plan): like
    make_train_step_for but threading a per-batch execution plan into the
    apply under keyword `plan_kw` — Pallas BatchPlans or a tiled-incidence
    layout (ops/tiled_ops.TiledIncidence; the ANF model takes it as
    `tiles`)."""
    with_labels = _accepts_labels(apply_fn)
    iso_alpha = float(getattr(cfg, "label_isolation_alpha", 0.0))

    @jax.jit
    def train_step(state: TrainState, batch, plan):
        multilabel = with_labels and \
            getattr(batch, "solutions_k", None) is not None
        if multilabel:
            key, subkey, k_label = jax.random.split(state.key, 3)
            labels = _select_labels(batch, k_label,
                                    isolation_alpha=iso_alpha)
        else:
            key, subkey = jax.random.split(state.key)
            labels = batch.solutions

        def loss_fn(params):
            kw = {plan_kw: plan}
            if with_labels:
                kw["labels"] = labels
            _, loss, steps, _ = apply_fn(params, cfg, batch, subkey,
                                         training=True, **kw)
            return loss, steps

        (loss, steps), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1, key=key)
        return new_state, {"loss": loss, "steps_taken": steps}

    return train_step


def make_diagnostics_step(cfg, apply_fn: Callable = query_sat_apply):
    """Jitted diagnostics forward: one extra training-mode pass with
    per-round in-model statistics enabled (aux["round_stats"]) plus a
    parameter-gradient norm breakdown per MLP. The analog of the
    reference's periodic tf.summary diagnostics
    (model/query_sat.py:171-183,350-359, diffusion_training.py:297-317),
    kept out of the hot train step so it costs nothing except when called.
    Returns a flat dict of python-serializable stats."""
    import dataclasses as _dc

    diag_cfg = _dc.replace(cfg, collect_round_stats=True)
    with_labels = _accepts_labels(apply_fn)

    @jax.jit
    def diag(params, batch, key: jax.Array):
        def loss_fn(p):
            kw = {"labels": batch.solutions} if with_labels else {}
            _, loss, steps, aux = apply_fn(p, diag_cfg, batch, key,
                                           training=True, **kw)
            return loss, (steps, aux["round_stats"])

        (loss, (steps, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        grad_norms = {f"gradnorm/{k}": optax.global_norm(v)
                      for k, v in grads.items()}
        return loss, steps, stats, grad_norms

    def run(params, batch, key: jax.Array) -> dict:
        # ONE host fetch for the whole diagnostics pytree — per-element
        # float() would cost a ~30 ms tunnel round-trip each (~224/eval)
        loss, steps, stats, grad_norms = jax.device_get(
            diag(params, batch, key))
        out = {"diag_loss": float(loss), "diag_steps": int(steps)}
        for k, v in stats.items():
            out[f"round/{k}"] = [round(float(x), 5) for x in np.asarray(v)]
        for k, v in grad_norms.items():
            out[k] = float(v)
        return out

    return run


def make_selfsupervised_train_step(cfg: QuerySATConfig,
                                   optimizer: optax.GradientTransformation,
                                   apply_fn: Callable = query_sat_apply):
    """Self-conditioning diffusion train step (reference
    model/query_sat.py:398-417 `train_step_selfsupervised`): one pass
    without self-conditioning, a second pass fed the stop-gradient sigmoid
    of the first pass's logits; loss = loss1 + 2*loss2. `apply_fn` selects
    the execution layout (flat query_sat_apply or dense
    query_sat_dense_apply — both take noisy_num/denoised_num)."""
    from diffusionsat_tpu.diffusion.schedule import construct_training_input

    @jax.jit
    def train_step(state: TrainState, batch: SatBatch):
        key, k_noise, k_input, k1, k2 = jax.random.split(state.key, 5)
        if getattr(batch, "solutions_k", None) is not None:
            k_input, k_label = jax.random.split(k_input)
            labels = _select_labels(batch, k_label)
        else:
            labels = batch.solutions
        noise_scale = jax.random.uniform(k_noise, ())
        noisy = construct_training_input(k_input, labels, noise_scale)

        def loss_fn(params):
            logits, loss1, steps, _ = apply_fn(
                params, cfg, batch, k1, training=True, labels=labels,
                noise_scale=noise_scale, noisy_num=noisy)
            denoised = jax.lax.stop_gradient(jax.nn.sigmoid(logits))
            _, loss2, _, _ = apply_fn(
                params, cfg, batch, k2, training=True, labels=labels,
                noise_scale=noise_scale, noisy_num=noisy,
                denoised_num=denoised)
            return loss1 + 2.0 * loss2, (loss1, loss2, steps)

        (loss, (loss1, loss2, steps)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1, key=key)
        return new_state, {"loss": loss, "loss1": loss1, "loss2": loss2,
                           "steps_taken": steps}

    return train_step


def make_predict_step(cfg, apply_fn: Callable = query_sat_apply,
                      prediction_tries: int = 1,
                      noise_scale: float | None = None,
                      graph_sat_fn: Callable | None = None):
    """Jitted predict step (reference model/query_sat.py:424-451). With
    prediction_tries > 1 the model is re-run with fresh randomness and
    per-graph solutions accumulate across tries (`:426-445`).
    `noise_scale` pins the conditioning noise level (e.g. 1.0 = pure
    solving, no label signal) instead of the reference's uniform draw —
    removes eval-metric variance from the noise lottery.
    `graph_sat_fn(logits, batch) -> [G, 1]` decides which graphs a try
    solved; defaults to CNF is_graph_sat — pass losses.anf.
    is_graph_sat_anf for ANF batches."""
    from diffusionsat_tpu.losses.sat import is_graph_sat
    from diffusionsat_tpu.ops.graph_ops import graph_gather_vars

    if graph_sat_fn is None:
        graph_sat_fn = is_graph_sat
    extra = {} if noise_scale is None else {"noise_scale": noise_scale}

    @jax.jit
    def predict_step(params, batch: SatBatch, key: jax.Array):
        if prediction_tries == 1:
            logits, loss, steps, aux = apply_fn(
                params, cfg, batch, key, training=False, **extra)
            return {"prediction": logits[:, 0], "loss": loss,
                    "steps_taken": steps}

        final = jnp.zeros((batch.V, 1))
        solved = jnp.zeros((batch.G, 1))
        loss = jnp.zeros(())
        steps = jnp.zeros((), jnp.int32)
        logits = final
        for i in range(prediction_tries):
            key, sub = jax.random.split(key)
            logits, loss, steps, _ = apply_fn(params, cfg, batch, sub,
                                              training=False, **extra)
            sat_g = graph_sat_fn(logits, batch)           # [G, 1]
            newly = jnp.clip(sat_g - solved, 0.0, 1.0)
            var_mask = graph_gather_vars(batch, newly)
            final = final + logits * var_mask
            solved = solved + newly
        # graphs no try solved keep the LAST try's logits (instead of
        # all-zero = sigmoid 0.5 per var) so per-variable accuracy stays
        # comparable with tries=1; graph-level solved rates are
        # unaffected (reference predict keeps first-solving semantics,
        # model/query_sat.py:426-445)
        unsolved = graph_gather_vars(batch, jnp.clip(1.0 - solved, 0.0, 1.0))
        final = final + logits * unsolved
        return {"prediction": final[:, 0], "loss": loss,
                "steps_taken": steps}

    return predict_step


def evaluate_metrics(params, cfg, data, metrics: list[Metric],
                     key: jax.Array, max_batches: int | None = None,
                     apply_fn: Callable = query_sat_apply,
                     noise_scale: float | None = None,
                     prediction_tries: int = 1,
                     graph_sat_fn: Callable | None = None) -> dict:
    """Run predict over a dataset, accumulate metrics
    (reference main.py:324-352)."""
    predict_step = make_predict_step(cfg, apply_fn,
                                     prediction_tries=prediction_tries,
                                     noise_scale=noise_scale,
                                     graph_sat_fn=graph_sat_fn)
    it = iter(data)
    if max_batches is not None:
        it = itertools.islice(it, max_batches)
    for batch in it:
        key, subkey = jax.random.split(key)
        out = predict_step(params, batch, subkey)
        for m in metrics:
            m.update_state(out, batch)
    values = {}
    for m in metrics:
        values.update(m.get_values(reset_state=True))
    return values


def train(state: TrainState, train_step, data_iter: Iterator[SatBatch],
          steps: int, log_every: int = 100,
          eval_fn: Callable[[TrainState], dict] | None = None,
          eval_every: int = 1000,
          checkpoint_fn: Callable[[TrainState], None] | None = None,
          ckpt_every: int = 1000,
          log_file: str | Path | None = None,
          tb_writer=None,
          target_step: int | None = None) -> TrainState:
    """Driver loop (reference diffusion_training.py:277-350). `tb_writer`
    (train/tb.TBWriter) mirrors the JSONL records into TensorBoard.

    `target_step`: stop once state.step reaches it, checked at log
    boundaries (mega-step chunks advance state.step by their actual
    stacked length, which is < mega_steps for trailing partial chunks —
    a fixed `steps` chunk count alone under-runs the schedule by the
    partial-chunk fraction; the r5 iso45full '167k' run executed 127,208
    optimizer steps this way). Overshoot is bounded by one log window's
    worth of chunks."""
    import json

    t0 = time.time()
    window_losses = []
    prev_step = int(state.step)
    for i in range(steps):
        batch = next(data_iter)
        state, out = train_step(state, batch)
        # keep the loss as a device future: fetching per step costs a full
        # host round-trip on remote accelerators; sync only when logging
        window_losses.append(out["loss"])
        if (i + 1) % log_every == 0:
            # one batched host fetch for the window, not one per scalar
            window_losses = [float(l)
                             for l in jax.device_get(window_losses)]
            step = int(state.step)
            dt = time.time() - t0
            t0 = time.time()
            msg = {
                "step": step,
                "loss": sum(window_losses) / len(window_losses),
                # real steps per second: a mega-step call advances
                # state.step by its chunk length, so count from the
                # state rather than assuming one step per iteration
                "steps_per_sec": (step - prev_step) / dt,
            }
            prev_step = step
            print(f"[train] {msg}")
            if log_file is not None:
                with Path(log_file).open("a") as f:
                    f.write(json.dumps(msg) + "\n")
            if tb_writer is not None:
                tb_writer.scalars(step, msg)
            window_losses = []
            if target_step is not None and step >= target_step:
                break
        if eval_fn is not None and (i + 1) % eval_every == 0:
            vals = eval_fn(state)
            eval_step = int(state.step)
            print(f"[eval @ {eval_step}] {vals}")
            if log_file is not None:
                with Path(log_file).open("a") as f:
                    f.write(json.dumps({"step": eval_step, **vals}) + "\n")
            if tb_writer is not None:
                tb_writer.scalars(eval_step, vals)
                tb_writer.flush()
        if checkpoint_fn is not None and (i + 1) % ckpt_every == 0:
            checkpoint_fn(state)
    return state
