from diffusionsat_tpu.ops.graph_ops import (
    lit_to_clause,
    clause_to_lit,
    literal_degrees,
    clause_degrees,
    var_segment_sum,
    clause_segment_sum,
    graph_gather_vars,
    graph_gather_clauses,
)
from diffusionsat_tpu.ops.pallas_segsum import (
    build_segsum_plan,
    gather_segsum,
    segsum_pallas,
)
