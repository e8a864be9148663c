from diffusionsat_tpu.evaluation.harness import (
    evaluate_variable_generalization,
    evaluate_round_generalization,
    evaluate_batch_generalization,
    evaluate_classic_solver,
    test_invariance,
    make_cactus,
)
