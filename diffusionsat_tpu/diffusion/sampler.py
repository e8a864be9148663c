"""Reverse-diffusion SAT solution sampler.

Port of the reference `satuniformity/DiffusionSampler.py` with the hot loop
moved fully on-device: the reference iterates N denoising steps in Python,
calling a tf.function per step and checking per-graph satisfiability on the
host (`diffusion():78-191`); here the whole reverse chain — randomized
rounding, model call, categorical posterior step, per-graph early freezing
— is one `lax.fori_loop` inside a single jit. Host code only packs batches
and accumulates the sample histogram.
"""

from __future__ import annotations

import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from diffusionsat_tpu.diffusion.schedule import (
    randomized_rounding,
    reverse_distribution_step_theoretic,
)
from diffusionsat_tpu.graph.batch import BucketSpec, SatBatch, build_batch
from diffusionsat_tpu.losses.sat import is_graph_sat
from diffusionsat_tpu.models.query_sat import QuerySATConfig, query_sat_apply
from diffusionsat_tpu.ops.graph_ops import graph_gather_vars
from diffusionsat_tpu.sat.cnf import CNF, VariableAssignment
from diffusionsat_tpu.sat.solvers import enumerate_models


def make_diffusion_chain(cfg: QuerySATConfig, diffusion_steps: int = 32,
                         use_baseline_sampling: bool = True,
                         self_supervised: bool = False,
                         test_rounds: int = 32,
                         freeze_sat: bool = True,
                         freeze_from: int = 0,
                         final_sample: bool = False,
                         temperature: float = 1.0):
    """Build the jitted full reverse chain.

    Returns fn(params, batch, key) -> (bits [V] int32, solved_graphs [G],
    fixed_step [V]) replicating reference `diffusion():105-191` semantics:
    per step t: noise 1-t/N, randomized rounding, model denoise, theoretic
    posterior step, and freezing of graphs whose rounded prediction already
    satisfies them.

    `temperature` rescales the denoiser logits inside the reverse-step
    posterior (t>1 softens toward uniform); `final_sample` draws the final
    unfrozen bits from Bernoulli(predictions) instead of rounding — the
    correct terminal step of the categorical reverse process (rounding is
    the reference's choice, `diffusion():171-180`, and a small mode-seeking
    bias).
    """
    N = diffusion_steps

    def chain(params, batch: SatBatch, key: jax.Array, plans=None):
        V = batch.V

        def body(t, carry):
            x, fixed_mask, fixed_bits, fixed_step, key, prev_pred = carry
            key, k_round, k_model = jax.random.split(key, 3)
            noise_scale = 1.0 - t.astype(jnp.float32) / N

            x_noisy = randomized_rounding(k_round, x)
            if use_baseline_sampling:
                x = x_noisy

            denoised = prev_pred[:, None] if self_supervised else None
            # early_exit: the batch is many copies of one formula, so the
            # whole batch often satisfies at once and the tail rounds skip
            logits, _, _, _ = query_sat_apply(
                params, cfg, batch, k_model, training=False,
                noise_scale=noise_scale, noisy_num=x_noisy,
                denoised_num=denoised, rounds=test_rounds, early_exit=True,
                plans=plans)
            predictions = jax.nn.sigmoid(logits[:, 0] / temperature)  # [V]

            x = reverse_distribution_step_theoretic(
                x, jnp.stack([1 - predictions, predictions], axis=1),
                noise_scale, 1.0 / N)

            # per-graph freeze (reference :154-170): graphs whose rounded
            # prediction is SAT get their bits pinned at this step.
            # freeze_sat=False runs the full denoising trajectory instead
            # (diagnosis: a strong model satisfies at t=0 and freezing
            # there bypasses the diffusion chain entirely — see STATUS.md).
            # freeze_from delays freezing until the chain has genuinely
            # diffused: full-trajectory diversity, near-100% SAT rate.
            if freeze_sat:
                pred_bits = jnp.round(predictions)
                sat_g = is_graph_sat(logits, batch)[:, 0]           # [G]
                sat_v = graph_gather_vars(batch, sat_g[:, None])[:, 0]
                newly = (sat_v > 0.5) & (fixed_mask < 0.5) & \
                    (t >= freeze_from)
                fixed_bits = jnp.where(newly, pred_bits, fixed_bits)
                fixed_step = jnp.where(newly, t, fixed_step)
                fixed_mask = jnp.maximum(fixed_mask,
                                         newly.astype(fixed_mask.dtype))

            return (x, fixed_mask, fixed_bits, fixed_step, key, predictions)

        init = (
            jnp.full((V, 2), 0.5),                 # x
            jnp.zeros((V,)),                       # fixed_mask
            jnp.zeros((V,)),                       # fixed_bits
            jnp.full((V,), -1, jnp.int32),         # fixed_step
            key,
            jnp.full((V,), 0.5),                   # prev predictions
        )
        x, fixed_mask, fixed_bits, fixed_step, key, predictions = \
            jax.lax.fori_loop(0, N, body, init)

        if final_sample:
            key, k_fin = jax.random.split(key)
            free_bits = jax.random.bernoulli(k_fin, predictions)
        else:
            free_bits = jnp.round(predictions)
        final_bits = jnp.where(fixed_mask > 0.5, fixed_bits,
                               free_bits).astype(jnp.int32)
        # solved graphs under the final assignment
        final_logits = (final_bits.astype(jnp.float32) * 2 - 1)[:, None] * 10.0
        solved = is_graph_sat(final_logits, batch)[:, 0]
        return final_bits, solved, fixed_step

    return jax.jit(chain)


def make_dense_diffusion_chain(cfg: QuerySATConfig,
                               diffusion_steps: int = 32,
                               use_baseline_sampling: bool = True,
                               self_supervised: bool = False,
                               test_rounds: int = 32,
                               freeze_sat: bool = True,
                               freeze_from: int = 0,
                               final_sample: bool = False,
                               temperature: float = 1.0):
    """Dense-block variant of the reverse chain (graph/dense_batch.py):
    the sampler batch is G copies of one small formula, so every model
    call runs on the MXU fast path. Same semantics as
    make_diffusion_chain; shapes are [G, Vg, ...]."""
    from diffusionsat_tpu.models.query_sat_dense import query_sat_dense_apply
    from diffusionsat_tpu.ops import dense_ops

    N = diffusion_steps

    def chain(params, batch, key: jax.Array):
        G, Vg = batch.G, batch.Vg

        def body(t, carry):
            x, fixed_mask, fixed_bits, fixed_step, key, prev_pred = carry
            key, k_round, k_model = jax.random.split(key, 3)
            noise_scale = 1.0 - t.astype(jnp.float32) / N

            x_noisy = randomized_rounding(k_round, x)
            if use_baseline_sampling:
                x = x_noisy

            denoised = prev_pred[..., None] if self_supervised else None
            logits, _, _, _ = query_sat_dense_apply(
                params, cfg, batch, k_model, training=False,
                noise_scale=noise_scale, noisy_num=x_noisy,
                denoised_num=denoised, rounds=test_rounds, early_exit=True)
            predictions = jax.nn.sigmoid(
                logits[..., 0] / temperature)                  # [G, Vg]

            x = reverse_distribution_step_theoretic(
                x, jnp.stack([1 - predictions, predictions], axis=-1),
                noise_scale, 1.0 / N)

            if freeze_sat:
                pred_bits = jnp.round(predictions)
                sat_g = dense_ops.is_graph_sat(logits, batch)[:, 0]  # [G]
                sat_v = jnp.broadcast_to(sat_g[:, None], (G, Vg))
                newly = (sat_v > 0.5) & (fixed_mask < 0.5) & \
                    (t >= freeze_from)
                fixed_bits = jnp.where(newly, pred_bits, fixed_bits)
                fixed_step = jnp.where(newly, t, fixed_step)
                fixed_mask = jnp.maximum(fixed_mask,
                                         newly.astype(fixed_mask.dtype))

            return (x, fixed_mask, fixed_bits, fixed_step, key, predictions)

        init = (
            jnp.full((G, Vg, 2), 0.5),
            jnp.zeros((G, Vg)),
            jnp.zeros((G, Vg)),
            jnp.full((G, Vg), -1, jnp.int32),
            key,
            jnp.full((G, Vg), 0.5),
        )
        x, fixed_mask, fixed_bits, fixed_step, key, predictions = \
            jax.lax.fori_loop(0, N, body, init)

        if final_sample:
            key, k_fin = jax.random.split(key)
            free_bits = jax.random.bernoulli(k_fin, predictions)
        else:
            free_bits = jnp.round(predictions)
        final_bits = jnp.where(fixed_mask > 0.5, fixed_bits,
                               free_bits).astype(jnp.int32)
        final_logits = (final_bits.astype(jnp.float32) * 2 - 1
                        )[..., None] * 10.0
        solved = dense_ops.is_graph_sat(final_logits, batch)[:, 0]
        return final_bits, solved, fixed_step

    return jax.jit(chain)


class DiffusionSampler:
    """Sample SAT solutions of one formula via reverse diffusion
    (reference `satuniformity/DiffusionSampler.py:195-311`).

    `samples(n)` returns {solution_int: count} over satisfying samples,
    drawing batches of the formula repeated `graphs_per_batch` times until
    n SAT samples accumulate; aborts when the SAT rate drops below 0.5%
    (reference `:261-263`).
    """

    def __init__(self, params: Any, cfg: QuerySATConfig, cnf: CNF,
                 bucket: BucketSpec | None = None,
                 diffusion_steps: int = 32, test_rounds: int = 32,
                 graphs_per_batch: int | None = None,
                 use_baseline_sampling: bool = True,
                 self_supervised: bool = False, seed: int = 0,
                 dense: bool | None = None, freeze_sat: bool = True,
                 freeze_from: int = 0, final_sample: bool = False,
                 temperature: float = 1.0):
        self.params = params
        self.cfg = cfg
        self.cnf = cnf
        self.n_vars = cnf.number_of_vars()
        self.clauses = cnf.clauses()
        n_cells = sum(len(c) for c in self.clauses)
        # dense block execution when the formula is small (the benchmark
        # regime); the flat edge-list chain covers everything else
        if dense is None:
            dense = self.n_vars <= 128 and len(self.clauses) <= 576
        self.dense = dense
        if graphs_per_batch is None:
            if dense:
                # fixed batch of copies: formulas of similar size then
                # share ONE compiled chain shape (with the quantized
                # block dims below) instead of compiling per formula
                graphs_per_batch = 256
            else:
                graphs_per_batch = max(1, min(128,
                                              2000 // max(self.n_vars, 1)))
        if bucket is None:
            g = graphs_per_batch
            bucket = BucketSpec(
                max_vars=-(-self.n_vars * g // 128) * 128,
                max_clauses=-(-len(self.clauses) * g // 128) * 128,
                max_edges=-(-n_cells * g // 512) * 512,
                max_graphs=g)
        self.graphs_per_batch = min(graphs_per_batch, bucket.max_graphs)
        self.bucket = bucket
        self.key = jax.random.key(seed)
        formulas = [(self.n_vars, self.clauses)] * self.graphs_per_batch
        sols = [[0] * self.n_vars] * self.graphs_per_batch
        flat = build_batch(formulas, self.bucket, solutions=sols)
        self.plans = None
        if self.dense:
            from diffusionsat_tpu.graph.dense_batch import (
                densify_batches_quantized)
            self.batch = densify_batches_quantized([flat])[0]
            self.chain = make_dense_diffusion_chain(
                cfg, diffusion_steps=diffusion_steps,
                use_baseline_sampling=use_baseline_sampling,
                self_supervised=self_supervised, test_rounds=test_rounds,
                freeze_sat=freeze_sat, freeze_from=freeze_from,
                final_sample=final_sample, temperature=temperature)
        else:
            self.batch = flat
            self.chain = make_diffusion_chain(
                cfg, diffusion_steps=diffusion_steps,
                use_baseline_sampling=use_baseline_sampling,
                self_supervised=self_supervised, test_rounds=test_rounds,
                freeze_sat=freeze_sat, freeze_from=freeze_from,
                final_sample=final_sample, temperature=temperature)
            if jax.default_backend() == "tpu":
                from diffusionsat_tpu.ops.pallas_segsum import (
                    build_batch_plans)
                self.plans = build_batch_plans(self.batch)

    @classmethod
    def from_checkpoint(cls, model_path: str, dimacs_filename: str,
                        cfg: QuerySATConfig | None = None, **kwargs
                        ) -> "DiffusionSampler":
        """Reference-style constructor (satuniformity/DiffusionSampler.py:197:
        `DiffusionSampler(model_path, dimacs)`): restore the newest
        checkpoint in `model_path` — or a portable `.npz` params file
        written by `train.checkpoint.export_params` (the pretrained-model
        distribution format) — and sample the given DIMACS formula."""
        from diffusionsat_tpu.models.query_sat import query_sat_init
        from diffusionsat_tpu.train.checkpoint import restore_model_params

        cfg = cfg or QuerySATConfig(test_rounds=32)
        params = restore_model_params(model_path, query_sat_init, cfg)
        cnf = CNF.load(dimacs_filename)
        return cls(jax.device_put(params, jax.devices()[0]),
                   cfg, cnf, **kwargs)

    def samples(self, n_samples: int, max_batches: int = 10_000
                ) -> dict[int, int]:
        counts: dict[int, int] = {}
        total = 0
        sat_total = 0
        needed = n_samples
        for _ in range(max_batches):
            if needed <= 0:
                break
            if total > 0 and sat_total / total < 0.005:
                print("too many unsat samples; stopping diffusion")
                break
            self.key, subkey = jax.random.split(self.key)
            if self.dense:
                bits, solved, _ = self.chain(self.params, self.batch,
                                             subkey)
            else:
                bits, solved, _ = self.chain(self.params, self.batch,
                                             subkey, self.plans)
            bits = np.asarray(bits)
            solved = np.asarray(solved)
            for g in range(self.graphs_per_batch):
                if self.dense:
                    row = bits[g, :self.n_vars]
                else:
                    lo = g * self.n_vars
                    row = bits[lo:lo + self.n_vars]
                total += 1
                asgn = VariableAssignment(self.n_vars, self.clauses)
                asgn.assign_all_from_bit_list(row.tolist())
                if asgn.satisfiable():
                    sat_total += 1
                    k = int(asgn)
                    counts[k] = counts.get(k, 0) + 1
                    needed -= 1
                    if needed <= 0:
                        break
        self.success_rate = sat_total / max(total, 1)
        return counts
