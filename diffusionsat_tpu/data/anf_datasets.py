"""Packed ANF-batch dataset (the reference's `data/sha_anf.py:113-168` own
batching/TFRecord path, rebuilt on ANFBatch + npz caching)."""

from __future__ import annotations

import hashlib
import json
import random
from pathlib import Path
from typing import Iterator

import numpy as np

from diffusionsat_tpu.graph.anf_batch import ANFBatch, ANFBucket, \
    build_anf_batch


def pack_anf_instances(instances, bucket: ANFBucket, seed: int = 0,
                       shuffle_batches: bool = True):
    """Greedy packing against the ANF bucket limits (vars/ands/clauses/
    edges/graphs)."""
    def size_of(item):
        n_vars, equations, _ = item
        n_eq = len(equations)
        n_edges = sum(len(eq) for eq in equations)
        ands = len({(min(t), max(t)) for eq in equations for t in eq
                    if len(t) == 2})
        return n_vars, ands, n_eq, n_edges

    sized = [(size_of(it), it) for it in instances]
    sized = [(s, it) for s, it in sized
             if s[0] <= bucket.max_vars and s[1] <= bucket.max_ands
             and s[2] <= bucket.max_clauses and s[3] <= bucket.max_edges]
    sized.sort(key=lambda x: x[0][0] + x[0][2])

    batches = []
    cur, cv, ca, cc, ce = [], 0, 0, 0, 0
    for (v, a, c, e), it in sized:
        if cur and (cv + v > bucket.max_vars or ca + a > bucket.max_ands
                    or cc + c > bucket.max_clauses
                    or ce + e > bucket.max_edges
                    or len(cur) >= bucket.max_graphs):
            batches.append(cur)
            cur, cv, ca, cc, ce = [], 0, 0, 0, 0
        cur.append(it)
        cv += v
        ca += a
        cc += c
        ce += e
    if cur:
        batches.append(cur)
    if shuffle_batches:
        random.Random(seed).shuffle(batches)
    return batches


class AnfDataset:
    def __init__(self, instances, bucket: ANFBucket,
                 cache_dir: str | Path = "data_cache",
                 name: str | None = None, force_data_gen: bool = False,
                 seed: int = 0):
        self.instances = instances
        self.bucket = bucket
        self.cache_dir = Path(cache_dir)
        self.name = name or type(instances).__name__
        self.force_data_gen = force_data_gen
        self.seed = seed

    def _cache_path(self, mode: str) -> Path:
        key = json.dumps([self.bucket.max_vars, self.bucket.max_ands,
                          self.bucket.max_clauses, self.bucket.max_edges,
                          self.bucket.max_graphs, self.name, mode])
        h = hashlib.sha256(key.encode()).hexdigest()[:16]
        return self.cache_dir / f"anf_{self.name}_{mode}_{h}.npz"

    def _materialize(self, mode: str) -> list[ANFBatch]:
        path = self._cache_path(mode)
        fields = list(ANFBatch.__dataclass_fields__)
        if path.exists() and not self.force_data_gen:
            data = np.load(path)
            # caches written before a field existed load it as None
            # (free_input_mask: consumers treat None as "no upweighting")
            return [ANFBatch(**{f: (data[f"{i}/{f}"]
                                    if f"{i}/{f}" in data else None)
                               for f in fields})
                    for i in range(int(data["n"]))]
        gen = (self.instances.train_generator() if mode == "train"
               else self.instances.test_generator())
        groups = pack_anf_instances(list(gen), self.bucket, seed=self.seed)
        batches = []
        for group in groups:
            systems = [(n, eqs) for n, eqs, _ in group]
            sols = [wit[:n] for (n, _, wit) in group]
            batches.append(build_anf_batch(systems, self.bucket,
                                           solutions=sols))
        path.parent.mkdir(parents=True, exist_ok=True)
        arrays = {}
        for i, b in enumerate(batches):
            for f in fields:
                val = getattr(b, f)
                if val is not None:
                    arrays[f"{i}/{f}"] = np.asarray(val)
        np.savez_compressed(path, n=np.asarray(len(batches)), **arrays)
        return batches

    def train_data(self) -> list[ANFBatch]:
        return self._materialize("train")

    def test_data(self) -> list[ANFBatch]:
        return self._materialize("test")

    def repeat_shuffled(self, batches) -> Iterator[ANFBatch]:
        rng = random.Random(self.seed)
        while True:
            order = list(range(len(batches)))
            rng.shuffle(order)
            for i in order:
                yield batches[i]
