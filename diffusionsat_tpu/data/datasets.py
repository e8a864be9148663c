"""Packed-batch dataset with on-disk caching.

Replaces the reference's DIMACS-files -> TFRecords -> tf.data pipeline
(`data/dimac.py:64-339`) with: generator -> greedy bucket packing ->
compressed .npz shards of padded numpy batches -> an iterator that
restores SatBatch pytrees. The cache key covers the generator config and
bucket, mirroring the reference's per-config tfrecords folders.
"""

from __future__ import annotations

import hashlib
import json
import random
from pathlib import Path
from typing import Iterator

import numpy as np

from diffusionsat_tpu.data.generators import SatInstances
from diffusionsat_tpu.data.packing import pack_instances
from diffusionsat_tpu.graph.batch import BucketSpec, SatBatch, build_batch

Instance = tuple[int, list[list[int]], list[int] | None]


def _save_batches(path: Path, batches: list[SatBatch]) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = {}
    fields = list(SatBatch.__dataclass_fields__)
    for i, b in enumerate(batches):
        for name in fields:
            val = getattr(b, name)
            if val is None:  # optional fields (solutions_k) skip when unset
                continue
            arrays[f"{i}/{name}"] = np.asarray(val)
    np.savez_compressed(path, n=np.asarray(len(batches)), **arrays)


def _load_batches(path: Path) -> list[SatBatch]:
    data = np.load(path)
    n = int(data["n"])
    out = []
    fields = [f for f in SatBatch.__dataclass_fields__]
    for i in range(n):
        kwargs = {}
        for f in fields:
            key = f"{i}/{f}"
            if key in data:
                kwargs[f] = data[key]
            elif f == "edge_perm_l":  # older cache schema
                E = len(data[f"{i}/edge_lit_l"])
                kwargs[f] = np.arange(E, dtype=np.int32)
            elif f in ("solutions_k", "label_isolation_k"):
                kwargs[f] = None  # optional fields default to unset
            else:
                raise KeyError(key)
        out.append(SatBatch(**kwargs))
    return out


def _gen_for_mode(instances, mode: str):
    if mode == "train":
        return instances.train_generator()
    if mode == "validation" and hasattr(instances, "validation_generator"):
        return instances.validation_generator()
    return instances.test_generator()


def _run_shard(args):
    shard, mode = args
    return list(_gen_for_mode(shard, mode))


def _generate_instances(instances: SatInstances, mode: str,
                        workers: int | None = None) -> list[Instance]:
    """Generate the instance list, process-parallel when the generator
    supports seed-splitting (the native-solver-driven generators are
    CPU-bound and embarrassingly parallel — the TPU-native analog of the
    reference's tf.data worker threads)."""
    import multiprocessing
    import os
    from concurrent.futures import ProcessPoolExecutor

    if workers is None:
        workers = min(os.cpu_count() or 1, 16)
    shards = instances.split(workers) if workers > 1 else None
    if not shards or len(shards) <= 1:
        return list(_gen_for_mode(instances, mode))
    out: list[Instance] = []
    # spawn, not fork: the parent may already hold JAX threads
    ctx = multiprocessing.get_context("spawn")
    with ProcessPoolExecutor(max_workers=workers, mp_context=ctx) as pool:
        for part in pool.map(_run_shard, [(s, mode) for s in shards]):
            out.extend(part)
    return out


class PackedBatches:
    """A list of cached SatBatches with train-style iteration."""

    def __init__(self, batches: list[SatBatch], seed: int = 0):
        self.batches = batches
        self.seed = seed

    def __len__(self) -> int:
        return len(self.batches)

    def __iter__(self) -> Iterator[SatBatch]:
        return iter(self.batches)

    def repeat_shuffled(self) -> Iterator[SatBatch]:
        """Infinite shuffled stream (reference data/dimac.py:79-83)."""
        rng = random.Random(self.seed)
        while True:
            order = list(range(len(self.batches)))
            rng.shuffle(order)
            for i in order:
                yield self.batches[i]


class SatDataset:
    """Generator + bucket -> cached packed batches.

    The analog of `BatchedDimacsDataset` (reference data/dimac.py:64): holds
    the instance source and the task-specific batch representation, and
    materializes train/validation/test splits once per (config, bucket).
    """

    def __init__(self, instances: SatInstances, bucket: BucketSpec,
                 cache_dir: str | Path = "data_cache",
                 name: str | None = None, force_data_gen: bool = False,
                 seed: int = 0, gen_workers: int | None = None):
        self.instances = instances
        self.bucket = bucket
        self.cache_dir = Path(cache_dir)
        self.name = name or type(instances).__name__
        self.force_data_gen = force_data_gen
        self.seed = seed
        self.gen_workers = gen_workers

    def _cache_path(self, mode: str) -> Path:
        key = json.dumps({
            "bucket": [self.bucket.max_vars, self.bucket.max_clauses,
                       self.bucket.max_edges, self.bucket.max_graphs],
            "name": self.name,
            "mode": mode,
        }, sort_keys=True)
        h = hashlib.sha256(key.encode()).hexdigest()[:16]
        return self.cache_dir / f"{self.name}_{mode}_{h}.npz"

    def _materialize(self, mode: str) -> PackedBatches:
        path = self._cache_path(mode)
        if path.exists() and not self.force_data_gen:
            return PackedBatches(_load_batches(path), seed=self.seed)
        instances = _generate_instances(self.instances, mode,
                                        workers=self.gen_workers)
        packed = pack_instances(instances, self.bucket, seed=self.seed)
        batches = []
        for group in packed:
            formulas = [(n, cl) for n, cl, _ in group]
            sols = [s if s is not None else [0] * n for n, _, s in group]
            batches.append(build_batch(formulas, self.bucket, solutions=sols))
        _save_batches(path, batches)
        return PackedBatches(batches, seed=self.seed)

    def train_data(self) -> PackedBatches:
        return self._materialize("train")

    def validation_data(self) -> PackedBatches:
        """Validation split; generators without a dedicated validation
        stream fall back to the test generator (reference
        data/dimac.py:85-92)."""
        gen = getattr(self.instances, "validation_generator", None)
        return self._materialize("validation" if gen else "test")

    def test_data(self) -> PackedBatches:
        return self._materialize("test")
