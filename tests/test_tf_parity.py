"""Golden activation parity vs the REFERENCE TF2 implementation.

parity/make_tf_goldens.py runs the actual reference QuerySAT
(/root/reference/model/query_sat.py:133-373, TF 2.21) on fixed tiny
formulas with seeded weights and pinned stochastic inputs, and saves
(out_logits, loss, steps) for supervised∈{sup,unsup} × rounds∈{1,2,4,32}.
This test replays the identical computation through the JAX
implementation (same weights, same inputs, debug_zero_noise) and asserts
allclose — BASELINE.md parity target #1.
"""

import ast
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffusionsat_tpu.graph.batch import BucketSpec, build_batch
from diffusionsat_tpu.models.query_sat import (
    QuerySATConfig,
    query_sat_apply,
)

GOLDENS = Path(__file__).parent.parent / "parity" / "tf_goldens.npz"
FORMULAS = Path(__file__).parent.parent / "parity" / "tf_goldens_formulas.txt"

pytestmark = pytest.mark.skipif(
    not GOLDENS.exists(), reason="run parity/make_tf_goldens.py first")


def load_setup():
    g = np.load(GOLDENS)
    formulas = []
    for line in FORMULAS.read_text().splitlines():
        n, cls = line.split("|", 1)
        formulas.append((int(n), ast.literal_eval(cls)))
    n_vars = int(g["n_vars"])
    n_clauses = int(g["n_clauses"])
    n_edges = sum(len(c) for _, cls in formulas for c in cls)
    # exact-size bucket: zero padding, so every masked reduction is
    # exercised at the reference's unpadded shapes
    bucket = BucketSpec(max_vars=n_vars, max_clauses=n_clauses,
                        max_edges=n_edges, max_graphs=len(formulas))
    batch = build_batch(formulas, bucket)

    params = {}
    for key in g.files:
        if not key.startswith("w/"):
            continue
        _, name, idx, kind = key.split("/")
        d = params.setdefault(name, {"w": {}, "b": {}})
        d["w" if kind == "kernel" else "b"][int(idx)] = jnp.asarray(g[key])
    for name, d in params.items():
        d["w"] = [d["w"][i] for i in sorted(d["w"])]
        d["b"] = [d["b"][i] for i in sorted(d["b"])]
    return g, batch, params


@pytest.mark.parametrize("supervised", [True, False])
@pytest.mark.parametrize("rounds", [1, 2, 4, 32])
def test_query_sat_matches_tf_reference(supervised, rounds):
    g, batch, params = load_setup()
    tag = f"{'sup' if supervised else 'unsup'}/r{rounds}"

    cfg = QuerySATConfig(feature_maps=16, query_maps=16,
                         train_rounds=rounds, test_rounds=rounds,
                         supervised=supervised, debug_zero_noise=True)
    out_logits, loss, steps, aux = query_sat_apply(
        params, cfg, batch, jax.random.key(0), training=True,
        labels=jnp.asarray(g["labels"]),
        noise_scale=jnp.asarray(g["noise_scale"]),
        noisy_num=jnp.asarray(g["noisy_num"]))

    ref_logits = g[f"{tag}/out_logits"]
    ref_loss = float(g[f"{tag}/loss"])
    ref_steps = int(g[f"{tag}/steps"])

    # measured deltas are float32 round-off (max 4e-8 over 32 rounds);
    # the bound leaves an order of magnitude of slack for BLAS variation
    np.testing.assert_allclose(np.asarray(out_logits), ref_logits,
                               rtol=1e-5, atol=1e-6,
                               err_msg=f"logits diverge at {tag}")
    assert abs(float(loss) - ref_loss) <= 1e-5 * max(abs(ref_loss), 1.0), \
        (tag, float(loss), ref_loss)
    assert int(steps) == ref_steps, (tag, int(steps), ref_steps)

    # per-layer recurrent states after the last round (reference loop
    # returns them, model/query_sat.py:373) — pins every intermediate
    # computation, not just the output head
    # states run through PairNorm rsqrt chains where eager-TF vs XLA
    # fusion round-off compounds with recurrence depth (~2e-6 at r1,
    # ~3e-5 at r32); the OUTPUT logits above stay at 1e-5 at any depth
    s_rtol, s_atol = (1e-4, 1e-5) if rounds <= 4 else (1e-3, 1e-4)
    np.testing.assert_allclose(np.asarray(aux["variables_state"]),
                               g[f"{tag}/variables_state"],
                               rtol=s_rtol, atol=s_atol,
                               err_msg=f"variables state diverges at {tag}")
    np.testing.assert_allclose(np.asarray(aux["clause_state"]),
                               g[f"{tag}/clause_state"],
                               rtol=s_rtol, atol=s_atol,
                               err_msg=f"clause state diverges at {tag}")
