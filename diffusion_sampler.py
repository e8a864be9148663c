"""Draw SAT solution samples from a trained model via reverse diffusion.

Analog of reference `diffusion_sampler.py` (drives
`satuniformity/DiffusionSampler`):

    python diffusion_sampler.py --dimacs f.cnf --model_ckpt runs/.../ckpt \
        --n_samples 100
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from diffusionsat_tpu.diffusion.sampler import DiffusionSampler
from diffusionsat_tpu.models.query_sat import QuerySATConfig, query_sat_init
from diffusionsat_tpu.sat.cnf import CNF
from diffusionsat_tpu.train.adabelief import adabelief
from diffusionsat_tpu.train.checkpoint import CheckpointManager
from diffusionsat_tpu.train.loop import TrainState


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dimacs", required=True)
    p.add_argument("--model_ckpt", required=True)
    p.add_argument("--n_samples", type=int, default=100)
    p.add_argument("--diffusion_steps", type=int, default=32)
    p.add_argument("--test_rounds", type=int, default=32)
    p.add_argument("--feature_maps", type=int, default=128)
    p.add_argument("--query_maps", type=int, default=128)
    p.add_argument("--out", default=None)
    p.add_argument("--freeze", choices=["early", "late", "off"],
                   default="early",
                   help="SAT-freeze regime inside the reverse chain: "
                        "'early' = reference semantics (pin a graph the "
                        "moment its prediction satisfies; 100%% SAT rate, "
                        "mode-collapsed diversity), 'late' = freeze only "
                        "in the last quarter of the chain (full diversity "
                        "at ~99%% SAT rate), 'off' = never freeze")
    p.add_argument("--refine", choices=["off", "mh"], default="off",
                   help="'mh' = post-hoc Metropolis uniformizing "
                        "refinement over the solution set (uniform "
                        "stationary distribution per connected component; "
                        "see uniformity/samplers.py MetropolisRefiner)")
    p.add_argument("--mh_steps", type=int, default=None,
                   help="MH chain length (default 20 * n_vars)")
    args = p.parse_args(argv)

    cfg = QuerySATConfig(feature_maps=args.feature_maps,
                         query_maps=args.query_maps,
                         test_rounds=args.test_rounds)
    sampler = DiffusionSampler.from_checkpoint(
        args.model_ckpt, args.dimacs, cfg=cfg,
        diffusion_steps=args.diffusion_steps,
        test_rounds=args.test_rounds,
        freeze_sat=args.freeze != "off",
        freeze_from=(args.diffusion_steps * 3 // 4
                     if args.freeze == "late" else 0))
    counts = sampler.samples(args.n_samples)
    if args.refine == "mh":
        from diffusionsat_tpu.uniformity.samplers import MetropolisRefiner
        counts = MetropolisRefiner(CNF.load(args.dimacs), None,
                                   n_steps=args.mh_steps).refine(counts)
    print(f"success rate: {sampler.success_rate:.4f}")
    print(f"{len(counts)} distinct solutions over "
          f"{sum(counts.values())} SAT samples")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({str(k): v for k, v in counts.items()}, f)
    else:
        for k, v in sorted(counts.items(), key=lambda kv: -kv[1])[:20]:
            print(f"  {k}: {v}")


if __name__ == "__main__":
    main()
