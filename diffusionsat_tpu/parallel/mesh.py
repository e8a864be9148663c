"""Device mesh construction (SURVEY.md §2.10, §5.8).

The reference has zero multi-device support; all parallelism here is new
TPU-native design. Axes:

- "data": data parallelism over packed batches (each batch is already a
  concatenation of many graphs, so DP = several packed batches in flight,
  gradient psum across chips over ICI);
- "graph": edge/graph partitioning of a single giant formula (the TP/SP
  analog — see parallel/graph_partition.py).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh


def make_mesh(n_data: int | None = None, n_graph: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_graph
    assert n_data * n_graph <= len(devices), (
        f"mesh {n_data}x{n_graph} needs more than {len(devices)} devices")
    import numpy as np
    dev_array = np.asarray(devices[:n_data * n_graph]).reshape(
        n_data, n_graph)
    return Mesh(dev_array, axis_names=("data", "graph"))
