"""Generate golden activations from the REFERENCE TF2 QuerySAT.

Runs the actual reference implementation (/root/reference/model/
query_sat.py:133-373) on fixed tiny formulas with deterministically
seeded weights and all stochastic inputs pinned:

- `noisy_num` supplied explicitly (bypasses randomized rounding,
  reference :55-57,214),
- `labels` and `noise_scale` fixed,
- `tf.random.normal` patched to zeros (the per-round exploration noise,
  reference :239) — the JAX side mirrors this with
  QuerySATConfig.debug_zero_noise.

The reference's module-level deps that aren't installed (optuna,
tensorflow_probability) are satisfied with minimal in-process stubs; the
tfp stub implements exact Bernoulli KL (the only tfp call on this path,
reference train_loss :40-53).

Outputs parity/tf_goldens.npz: the seeded weights, the pinned inputs,
and (out_logits, loss, steps, clause_state, variables) for
supervised∈{True,False} × rounds∈{1,2,4,32}. tests/test_tf_parity.py
replays them through the JAX implementation.

Run (CPU): python parity/make_tf_goldens.py
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")

# ---------------------------------------------------------------- stubs
# minimal optuna surface: the reference only annotates `trial: optuna.Trial`
optuna_stub = types.ModuleType("optuna")
optuna_stub.Trial = object
sys.modules.setdefault("optuna", optuna_stub)

import tensorflow as tf  # noqa: E402

tfp_stub = types.ModuleType("tensorflow_probability")
tfp_dists = types.ModuleType("tensorflow_probability.distributions")


class _Bernoulli:
    """Exact Bernoulli KL on probs (reference train_loss uses probs in
    (0.005, 0.995) thanks to label smoothing + diffusion mixing, so the
    plain formula is numerically safe)."""

    def __init__(self, probs):
        self.probs = tf.convert_to_tensor(probs, tf.float32)

    def kl_divergence(self, other):
        p, q = self.probs, other.probs
        return p * (tf.math.log(p) - tf.math.log(q)) + \
            (1.0 - p) * (tf.math.log(1.0 - p) - tf.math.log(1.0 - q))


tfp_dists.Bernoulli = _Bernoulli
tfp_stub.distributions = tfp_dists
sys.modules.setdefault("tensorflow_probability", tfp_stub)

sys.path.insert(0, "/root/reference")

from model.query_sat import QuerySAT  # noqa: E402


# ---------------------------------------------------------- formula setup
def fixed_formulas():
    """Two small formulas, batched the SatSpecifics way
    (data/SatSpecifics.py:21-57): variables shifted per graph, literal
    rows 0..V-1 positive / V..2V-1 negative."""
    return [
        (3, [[1, 2], [-1, 3], [-2, -3], [1, -3]]),
        (4, [[1, 2, 3], [-2, -3, 4], [2, -4], [-1, 3, 4], [1, -2]]),
    ]


def batch_arrays(formulas):
    n_vars = sum(n for n, _ in formulas)
    clauses = []
    off = 0
    graph_v, graph_c = [], []
    for gi, (n, cls) in enumerate(formulas):
        for c in cls:
            clauses.append([(abs(l) + off) * (1 if l > 0 else -1)
                            for l in c])
            graph_c.append(gi)
        graph_v.extend([gi] * n)
        off += n
    n_clauses = len(clauses)

    adj_idx, adj_val = [], []
    for ci, c in enumerate(clauses):
        for l in c:
            row = (l - 1) if l > 0 else (n_vars + (-l - 1))
            adj_idx.append([row, ci])
            adj_val.append(1.0)
    order = sorted(range(len(adj_idx)), key=lambda i: tuple(adj_idx[i]))
    adj_idx = [adj_idx[i] for i in order]
    adj_val = [adj_val[i] for i in order]

    adj = tf.sparse.SparseTensor(adj_idx, adj_val, [2 * n_vars, n_clauses])
    cg = tf.sparse.SparseTensor(
        [[g, i] for i, g in enumerate(graph_c)], [1.0] * n_clauses,
        [len(formulas), n_clauses])
    vg = tf.sparse.SparseTensor(
        [[g, i] for i, g in enumerate(graph_v)], [1.0] * n_vars,
        [len(formulas), n_vars])
    return adj, cg, vg, n_vars, n_clauses, clauses


def seed_weights(model) -> dict:
    """Deterministic per-variable values; returns {mlp_name: {'w': [...],
    'b': [...]}} in our param-tree layout."""
    out = {}
    for mlp_name in ("update_gate", "variables_output", "variables_query",
                     "clause_mlp", "lit_mlp"):
        mlp = getattr(model, mlp_name)
        ws, bs = [], []
        for li, layer in enumerate(mlp.dense_layers):
            k, b = layer.kernel, layer.bias
            import zlib
            rng = np.random.default_rng(  # stable across processes
                zlib.crc32(f"{mlp_name}/{li}".encode()))
            kv = rng.normal(0.0, 0.3 / np.sqrt(k.shape[0]),
                            size=k.shape).astype(np.float32)
            bv = rng.normal(0.0, 0.05, size=b.shape).astype(np.float32)
            k.assign(kv)
            b.assign(bv)
            ws.append(kv)
            bs.append(bv)
        out[mlp_name] = {"w": ws, "b": bs}
    return out


def main():
    tf.random.set_seed(0)
    formulas = fixed_formulas()
    adj, cg, vg, n_vars, n_clauses, clauses = batch_arrays(formulas)

    rng = np.random.default_rng(1234)
    labels = rng.integers(0, 2, size=n_vars).astype(np.int32)
    noise_scale = np.float32(0.37)
    # explicit noisy one-hot input (bypasses randomized rounding)
    noisy_num = rng.integers(0, 2, size=n_vars).astype(np.float32)
    noisy_num = np.stack([noisy_num, 1.0 - noisy_num], axis=-1)

    # patch the per-round exploration noise to zero (reference :239);
    # the JAX side uses debug_zero_noise
    real_normal = tf.random.normal
    tf.random.normal = lambda shape, *a, **kw: tf.zeros(shape)

    goldens = {
        "labels": labels,
        "noise_scale": noise_scale,
        "noisy_num": noisy_num,
        "n_vars": np.int32(n_vars),
        "n_clauses": np.int32(n_clauses),
    }
    weights_saved = None

    for supervised in (True, False):
        model = QuerySAT(optimizer=None, feature_maps=16, query_maps=16,
                         train_rounds=32, test_rounds=32,
                         supervised=supervised)
        # build variables with one throwaway call
        model.call(adj, cg, vg, training=False,
                   labels=tf.constant(labels),
                   noise_scale=tf.constant(noise_scale),
                   noisy_num=tf.constant(noisy_num))
        w = seed_weights(model)
        if weights_saved is None:
            weights_saved = w
            for name, d in w.items():
                for i, (kv, bv) in enumerate(zip(d["w"], d["b"])):
                    goldens[f"w/{name}/{i}/kernel"] = kv
                    goldens[f"w/{name}/{i}/bias"] = bv

        for rounds in (1, 2, 4, 32):
            model.train_rounds = rounds
            model.test_rounds = rounds
            # training=True exercises the loss path incl. the stop-grad
            # blends; run under the training flag but without any summary
            # writer (tf.summary is a no-op then)
            logits, loss, steps = model.call(
                adj, cg, vg, training=True,
                labels=tf.constant(labels),
                noise_scale=tf.constant(noise_scale),
                noisy_num=tf.constant(noisy_num))
            tag = f"{'sup' if supervised else 'unsup'}/r{rounds}"
            goldens[f"{tag}/out_logits"] = logits.numpy()
            goldens[f"{tag}/loss"] = np.float32(loss.numpy())
            goldens[f"{tag}/steps"] = np.int32(steps.numpy())
            print(tag, "loss", float(loss.numpy()),
                  "logits[0]", float(logits.numpy()[0, 0]), flush=True)

            # per-layer state goldens: drive the reference `loop`
            # directly (model/query_sat.py:186-373 returns the final
            # clause/variable states the public call discards)
            nv = int(n_vars)
            nc = int(n_clauses)
            _, _, _, _, c_state, v_state = model.loop(
                adj, tf.ones([nc, model.feature_maps]), cg,
                tf.constant(labels), tf.constant(rounds), True,
                tf.ones([nv, model.feature_maps]), vg,
                tf.constant(noise_scale), tf.constant(noisy_num), None)
            goldens[f"{tag}/clause_state"] = c_state.numpy()
            goldens[f"{tag}/variables_state"] = v_state.numpy()

    tf.random.normal = real_normal

    np.savez("parity/tf_goldens.npz", **goldens)
    # formulas stored alongside for the JAX test to rebuild the batch
    with open("parity/tf_goldens_formulas.txt", "w") as f:
        for n, cls in formulas:
            f.write(f"{n}|{cls!r}\n")
    print("wrote parity/tf_goldens.npz")


if __name__ == "__main__":
    main()
