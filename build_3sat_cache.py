"""Pre-build the diffusion flagship 3-SAT dataset cache (jax-free).

    python build_3sat_cache.py [--label_samples K]

K > 1 builds the multi-label variant (K uniform solution samples per
instance, cache name suffix `_k{K}`) used by the posterior-training
flagship (`diffusion_training.py --label_samples K`).
"""
import argparse
import time
from diffusionsat_tpu.config import RunConfig
import diffusion_training as dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--label_samples", type=int, default=1)
    args = p.parse_args()
    cfg = RunConfig(train_size=60000, test_size=2000, min_vars=3,
                    max_vars=30, max_nodes_per_batch=20000,
                    label_samples=args.label_samples)
    ds = dt.build_dataset(cfg)
    t0 = time.time()
    tr = ds.train_data()
    n = len(tr.batches) if hasattr(tr, "batches") else len(tr)
    print(f"train batches: {n} in {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    ds.test_data()
    print(f"test ok in {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
