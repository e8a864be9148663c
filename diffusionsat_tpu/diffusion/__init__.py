from diffusionsat_tpu.diffusion.schedule import (
    T_POWER,
    distribution_at_time,
    randomized_rounding,
    add_t_emb,
    construct_training_input,
    diffusion_kl_loss,
    reverse_distribution_step_theoretic,
)
