"""Data-parallel training over a device mesh.

Each device processes one packed SatBatch per step (a packed batch is
already hundreds of concatenated graphs, so per-device batches are the
natural DP unit — SURVEY.md §2.10). Parameters and optimizer state are
replicated; gradients are psum-averaged over the "data" axis via
`shard_map`, riding ICI. This is new design — the reference is strictly
single-GPU.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from diffusionsat_tpu.graph.batch import SatBatch
from diffusionsat_tpu.models.query_sat import QuerySATConfig, query_sat_apply
from diffusionsat_tpu.train.loop import TrainState


def stack_batches(batches: list) -> Any:
    """Stack D same-bucket batches along a new leading device axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *batches)


def stacked_stream(batches: list, n_devices: int, seed: int = 0):
    """Infinite stream of device-stacked groups of `n_devices` same-shape
    batches (same-shape = same static dims, so one XLA program per shape
    group). The DP analog of PackedBatches.repeat_shuffled."""
    import random as _random

    from collections import defaultdict

    import numpy as _np

    by_shape = defaultdict(list)
    for b in batches:
        leaves = jax.tree.leaves(b)
        key = tuple(getattr(l, "shape", ()) for l in leaves)
        by_shape[key].append(b)
    groups = []
    dropped = 0
    for same in by_shape.values():
        for i in range(0, len(same) - n_devices + 1, n_devices):
            # host-side numpy stack: device transfer happens once at the
            # jitted call (CLAUDE.md batch invariant) — jnp.stack here
            # would pin every group in device memory up-front
            groups.append(jax.tree.map(
                lambda *xs: _np.stack([_np.asarray(x) for x in xs], axis=0),
                *same[i:i + n_devices]))
        dropped += len(same) % n_devices
    if not groups:
        raise ValueError(
            f"no shape group has >= {n_devices} batches to stack")
    if dropped:
        print(f"stacked_stream: {dropped}/{len(batches)} batches dropped "
              f"(shape-group remainders below n_devices={n_devices})")
    rng = _random.Random(seed)
    while True:
        order = list(range(len(groups)))
        rng.shuffle(order)
        for i in order:
            yield groups[i]


def make_dp_train_step(cfg: QuerySATConfig,
                       optimizer: optax.GradientTransformation,
                       mesh: Mesh,
                       apply_fn: Callable = query_sat_apply) -> Callable:
    """Build the jitted DP train step.

    Takes (state, stacked_batch [D, ...]) with D == mesh 'data' axis size;
    returns (state, metrics). Gradients are averaged with psum over 'data';
    the optimizer update runs identically on every device, keeping params
    replicated without a broadcast. `apply_fn` selects the execution
    layout (flat query_sat_apply or dense query_sat_dense_apply — any
    model with the standard apply contract works).
    """
    n_data = mesh.shape["data"]

    batch_spec = P("data")
    repl = P()

    def per_device_step(params, opt_state, step, key, batch):
        # shard_map passes block-local views: leading dim of the batch is 1
        batch = jax.tree.map(lambda x: x[0], batch)
        dev_idx = jax.lax.axis_index("data")
        dev_key = jax.random.fold_in(jax.random.fold_in(key, dev_idx),
                                     step)
        if getattr(batch, "solutions_k", None) is not None:  # label bank
            from diffusionsat_tpu.train.loop import _select_labels
            dev_key, k_label = jax.random.split(dev_key)
            labels = _select_labels(batch, k_label)
        else:
            labels = batch.solutions

        def loss_fn(p):
            _, loss, steps, _ = apply_fn(
                p, cfg, batch, dev_key, training=True,
                labels=labels)
            return loss, steps

        (loss, steps), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(loss, "data")
        steps = jax.lax.pmean(steps.astype(jnp.float32), "data")
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        gradnorm = optax.global_norm(grads)
        return new_params, new_opt_state, loss, steps, gradnorm

    sharded = shard_map(
        per_device_step, mesh=mesh,
        in_specs=(repl, repl, repl, repl, batch_spec),
        out_specs=(repl, repl, repl, repl, repl),
        check_vma=False)

    @jax.jit
    def train_step(state: TrainState, stacked_batch):
        key, subkey = jax.random.split(state.key)
        params, opt_state, loss, steps, gradnorm = sharded(
            state.params, state.opt_state, state.step, subkey, stacked_batch)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1, key=key)
        return new_state, {"loss": loss, "steps_taken": steps,
                           "gradnorm": gradnorm}

    return train_step


def shard_stacked_batch(stacked: SatBatch, mesh: Mesh) -> SatBatch:
    """Place a stacked batch with dim 0 sharded over the 'data' axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), stacked)
