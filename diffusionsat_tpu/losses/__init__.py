from diffusionsat_tpu.losses.sat import (
    softplus_loss,
    softplus_loss_and_grad,
    softplus_log_loss,
    softplus_log_square_loss,
    softplus_square_loss,
    softplus_mixed_loss,
    linear_loss,
    sigmoid_log_loss,
    unsat_clause_count,
    max_clauses_loss,
    min_max_loss,
    log_max_loss,
    is_batch_sat,
    is_graph_sat,
)
from diffusionsat_tpu.losses.anf import (
    anf_value_real,
    anf_value_cplx,
    cplx_and,
    cplx_normalize,
    real_and,
    return_messages_cplx,
)
