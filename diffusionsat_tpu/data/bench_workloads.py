"""Shared benchmark workload builder.

One definition of the random threshold 3-SAT workload (clause count
m = 4.258n + 58.26 n^(-2/3), reference `data/CNFGen.py:42`) packed to a
real-node budget (2V + C <= budget, reference `config.py:35`), used by
bench.py, benchmarks/bench_dense.py and benchmarks/scaling_harness.py so
the three benches can never silently diverge on workload semantics.
"""

from __future__ import annotations

import numpy as np

from diffusionsat_tpu.graph.batch import BucketSpec, build_batch


def threshold_3sat_batch(rng: np.random.Generator, budget: int,
                         min_vars: int = 3, max_vars: int = 30,
                         bucket: BucketSpec | None = None,
                         max_graphs: int = 512):
    """Pack random threshold 3-SAT formulas to the node budget.

    Returns (SatBatch, real_edge_count). Labels are random bits (bench
    labels need not be true solutions)."""
    if bucket is None:
        bucket = BucketSpec.for_node_budget(budget, max_graphs=max_graphs)
    formulas, sols = [], []
    v_tot = c_tot = e_tot = 0
    while True:
        n = int(rng.integers(min_vars, max_vars + 1))
        m = int(4.258 * n + 58.26 * n ** (-2.0 / 3.0))
        clauses = []
        for _ in range(m):
            vs = rng.choice(n, size=3, replace=False) + 1
            clauses.append([int(v) if rng.random() < 0.5 else -int(v)
                            for v in vs])
        if (2 * (v_tot + n) + c_tot + m > budget
                or v_tot + n > bucket.max_vars
                or c_tot + m > bucket.max_clauses
                or e_tot + 3 * m > bucket.max_edges
                or len(formulas) >= bucket.max_graphs):
            break
        formulas.append((n, clauses))
        sols.append(rng.integers(0, 2, size=n).tolist())
        v_tot += n
        c_tot += m
        e_tot += 3 * m
    return build_batch(formulas, bucket, solutions=sols), e_tot
