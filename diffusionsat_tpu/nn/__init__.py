from diffusionsat_tpu.nn.mlp import MLPConfig, mlp_init, mlp_apply, leaky_gelu
from diffusionsat_tpu.nn.normalization import (
    layer_norm,
    pair_norm_vars,
    pair_norm_clauses,
)
