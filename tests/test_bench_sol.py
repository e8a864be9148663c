"""Speed-of-light accounting consistency (bench.py): the useful-work
model must equal the padded-FLOPs model exactly when padding vanishes
(every block row occupied, every incidence element a real edge)."""

from bench import _matmul_macs, _mlp_row_macs, _useful_macs
from diffusionsat_tpu.models.query_sat import QuerySATConfig


def test_useful_equals_padded_at_full_occupancy():
    cfg = QuerySATConfig()
    G, Vg, Cg = 16, 24, 112
    # full occupancy: actual rows == padded rows, edges fill the
    # incidence completely (Cg x 2Vg per graph)
    full_edges = G * Cg * 2 * Vg
    assert _useful_macs(cfg, G * Vg, G * Cg, full_edges) == \
        _matmul_macs(cfg, G, Vg, Cg)


def test_useful_scales_linearly_in_edges():
    cfg = QuerySATConfig()
    base = _useful_macs(cfg, 1000, 4000, 12000)
    more = _useful_macs(cfg, 1000, 4000, 24000)
    q = cfg.query_maps
    assert more - base == 4 * 12000 * q


def test_mlp_row_macs_positive_and_stable():
    cfg = QuerySATConfig()
    var_macs, clause_macs = _mlp_row_macs(cfg)
    assert var_macs > 0 and clause_macs > 0
    # the split must account for the whole non-einsum padded model
    G, Vg, Cg = 8, 16, 72
    assert _matmul_macs(cfg, G, Vg, Cg) == \
        G * Vg * var_macs + G * Cg * clause_macs \
        + 4 * G * Cg * 2 * Vg * cfg.query_maps
