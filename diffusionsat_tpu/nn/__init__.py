from diffusionsat_tpu.nn.mlp import MLPConfig, mlp_init, mlp_apply, leaky_gelu
from diffusionsat_tpu.nn.lstm import lstm_init, lstm_apply
from diffusionsat_tpu.nn.normalization import (
    layer_norm,
    pair_norm_vars,
    pair_norm_clauses,
    variables_neighbor_norm,
    clauses_neighbor_norm,
    edge_dropout,
)
from diffusionsat_tpu.nn.attention import (
    edge_dot,
    edge_softmax_by_clause,
    additive_attention_init,
    additive_attention_apply,
    dot_attention_init,
    dot_attention_apply,
    sigmoid_attention_init,
    sigmoid_attention_apply,
)
