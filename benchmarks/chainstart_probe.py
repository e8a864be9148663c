"""Probe: do the model's chain-start denoiser marginals (t=1 posterior,
averaged over Bernoulli(0.5) seeds) predict the residual per-solution
sampling bias left after the isolation lever? ANSWER (2026-08-20, iso055
battery): NO — mean Spearman rho +0.01 vs log-frequency and +0.02 vs the
centrality-residual. The residual bias is created by the reverse-chain
DYNAMICS, not the chain-start posterior, so only measured-frequency
feedback (sample, count, reweight per solution) can target it.

    python benchmarks/chainstart_probe.py <battery.jsonl> <ckpt>
"""
import jax, jax.numpy as jnp

from uniformity_benchmark import gen_benchmark_formulas
from diffusionsat_tpu.graph.batch import BucketSpec, build_batch
from diffusionsat_tpu.models.query_sat import QuerySATConfig, query_sat_apply
from diffusionsat_tpu.train.checkpoint import restore_model_params

import sys
battery_path, ckpt = sys.argv[1], sys.argv[2]

recs = {}
with open(battery_path) as f:
    for line in f:
        r = json.loads(line)
        if 'key' in r:
            recs[r['formula']] = r

cfg = QuerySATConfig()
params = restore_model_params(ckpt, None, cfg) if ckpt.endswith('.npz') else None
if params is None:
    from diffusionsat_tpu.models.query_sat import query_sat_init
    params = restore_model_params(ckpt, query_sat_init, cfg)

formulas = gen_benchmark_formulas(8, seed=0)

def spearman(x, y):
    rx = np.argsort(np.argsort(x)).astype(float)
    ry = np.argsort(np.argsort(y)).astype(float)
    if rx.std() == 0 or ry.std() == 0: return 0.0
    return float(np.corrcoef(rx, ry)[0, 1])

rhos, rhos_resid = [], []
for fi, (n_vars, clauses, _models) in enumerate(formulas):
    if fi not in recs: continue
    r = recs[fi]
    v = r['diffusion_nofreeze']
    sols = sorted(v['counts'])
    c = np.array([v['counts'][s] for s in sols], float)
    freq = c / c.sum()
    bits = np.stack([[(int(s) >> i) & 1 for i in range(n_vars)] for s in sols])

    bucket = BucketSpec(max_vars=max(16, n_vars), max_clauses=128,
                        max_edges=512, max_graphs=1)
    batch = build_batch([(n_vars, clauses)], bucket)
    V = batch.var_mask.shape[0]
    pbar = np.zeros(V)
    draws = 16
    for d in range(draws):
        key = jax.random.key(1000 + d)
        k1, k2 = jax.random.split(key)
        xb = jax.random.bernoulli(k1, 0.5, (V,)).astype(jnp.float32)
        x_noisy = jnp.stack([1 - xb, xb], axis=-1)
        logits, _, _, _ = query_sat_apply(
            params, cfg, batch, k2, training=False, noise_scale=1.0,
            noisy_num=x_noisy, rounds=32)
        pbar += np.asarray(jax.nn.sigmoid(logits[:, 0]))
    pbar /= draws
    p = np.clip(pbar[:n_vars], 1e-6, 1 - 1e-6)
    score = (bits * np.log(p) + (1 - bits) * np.log(1 - p)).sum(1)
    rhos.append(spearman(score, np.log(freq + 1e-9)))
    # residualize against centrality to isolate the unexplained axis
    d2 = (bits[:, None, :] != bits[None, :, :]).sum(-1).astype(float)
    dbar = d2.sum(1) / max(len(sols) - 1, 1)
    z = (dbar - dbar.mean()) / max(dbar.std(), 1e-9)
    y = np.log(freq + 1e-9)
    resid = y - np.polyval(np.polyfit(z, y, 1), z)
    rhos_resid.append(spearman(score, resid))
    print(f"formula {fi}: K={len(sols)} rho(score,logfreq)={rhos[-1]:+.3f} "
          f"rho(score,resid)={rhos_resid[-1]:+.3f}", flush=True)

print(f"MEAN rho vs logfreq: {np.mean(rhos):+.3f}")
print(f"MEAN rho vs centrality-residual: {np.mean(rhos_resid):+.3f}")
