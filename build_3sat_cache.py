"""Pre-build the diffusion flagship 3-SAT dataset cache (jax-free)."""
import time
from diffusionsat_tpu.config import RunConfig
import diffusion_training as dt


def main():
    cfg = RunConfig(train_size=60000, test_size=2000, min_vars=3,
                    max_vars=30, max_nodes_per_batch=20000)
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
