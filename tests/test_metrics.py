"""Cross-check the two SATAccuracy implementations (array vs solver) —
the reference keeps both as a built-in consistency check (SURVEY.md §4)."""

import numpy as np

from diffusionsat_tpu.graph.batch import BucketSpec, build_batch
from diffusionsat_tpu.train.metrics import SATAccuracy, SATAccuracySolver

BUCKET = BucketSpec(max_vars=32, max_clauses=64, max_edges=256, max_graphs=4)


def test_array_and_solver_metrics_agree():
    formulas = [(3, [[1, 2], [-1, 3], [-2, -3]]), (2, [[1, -2], [-1, 2]])]
    sols = [[1, 0, 1], [1, 1]]
    batch = build_batch(formulas, BUCKET, solutions=sols)

    # prediction: graph 1 correct, graph 2 wrong (violates both clauses)
    logits = np.full(batch.V, -5.0, dtype=np.float32)
    logits[0], logits[1], logits[2] = 5.0, -5.0, 5.0   # (1,0,1) sat
    logits[3], logits[4] = 5.0, -5.0                   # (1,0) unsat for f2

    out = {"prediction": logits}
    m1 = SATAccuracy()
    m1.update_state(out, batch)
    v1 = m1.get_values()

    m2 = SATAccuracySolver()
    m2.update_state(out, batch)
    v2 = m2.get_values()

    assert v1["total_accuracy"] == v2["total_accuracy"] == 0.5
