"""Build the ANF flagship dataset cache with zero jax backend contact."""
import sys
import time
from diffusionsat_tpu.data.anf_datasets import AnfDataset
from diffusionsat_tpu.data.sha_anf import Sha1AnfInstances
from diffusionsat_tpu.graph.anf_batch import ANFBucket


def main():
    inst = Sha1AnfInstances(rounds=17, min_free_bits=2, max_free_bits=20,
                            train_size=8000, test_size=256, seed=0)
    bucket = ANFBucket(max_vars=8192, max_ands=16384, max_clauses=8704,
                       max_edges=32768, max_graphs=8)
    ds = AnfDataset(inst, bucket, name="sha1anf_r17_fb2_20_8000", seed=0,
                    force_data_gen="--force" in sys.argv)
    t0 = time.time()
    tr = ds.train_data()
    print(f"train batches: {len(tr)} in {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    te = ds.test_data()
    print(f"test batches: {len(te)} in {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
