"""Export a trained checkpoint's params to one portable `.npz` file.

The reference distributes pretrained models as downloadable archives
(reference README.md:38-40, GitHub Releases); our distribution format is
a single compressed npz written by `train.checkpoint.export_params` —
restorable by `load_params` / `DiffusionSampler.from_checkpoint` without
orbax or an optimizer template.

    python export_pretrained.py --ckpt runs/.../ckpt --model query_sat \
        --out pretrained/query_sat_3sat.npz
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from diffusionsat_tpu.train.adabelief import adabelief
from diffusionsat_tpu.train.checkpoint import CheckpointManager, export_params
from diffusionsat_tpu.train.loop import TrainState


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="orbax checkpoint dir")
    p.add_argument("--model", default="query_sat",
                   choices=["query_sat", "anf_sat"])
    p.add_argument("--feature_maps", type=int, default=128)
    p.add_argument("--query_maps", type=int, default=128)
    p.add_argument("--out", required=True)
    p.add_argument("--note", default="",
                   help="free-text provenance note stored in the npz meta")
    args = p.parse_args(argv)

    if args.model == "query_sat":
        from diffusionsat_tpu.models.query_sat import (
            QuerySATConfig,
            query_sat_init,
        )
        cfg = QuerySATConfig(feature_maps=args.feature_maps,
                             query_maps=args.query_maps)
        init = query_sat_init
    else:
        from diffusionsat_tpu.models.anf_sat import (
            ANFSATConfig,
            anf_sat_init,
        )
        cfg = ANFSATConfig(feature_maps=args.feature_maps,
                           query_maps=args.query_maps)
        init = anf_sat_init

    with jax.default_device(jax.devices("cpu")[0]):
        params = init(jax.random.key(0), cfg)
        opt = adabelief()
        template = TrainState(params=params, opt_state=opt.init(params),
                              step=jnp.zeros((), jnp.int32),
                              key=jax.random.key(0))
        restored = CheckpointManager(args.ckpt).restore(template)
    if restored is None:
        raise FileNotFoundError(f"no checkpoint in {args.ckpt}")
    meta = {"model": args.model, "step": int(restored.step),
            "config": {k: v for k, v in vars(cfg).items()
                       if isinstance(v, (int, float, str, bool))}}
    if args.note:
        meta["note"] = args.note
    export_params(restored.params, args.out, meta=meta)
    n = sum(x.size for x in jax.tree_util.tree_leaves(restored.params))
    print(f"exported {n} params (step {int(restored.step)}) -> {args.out}")
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
