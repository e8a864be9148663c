"""DiffusionSAT-TPU: a TPU-native framework for learning to solve and sample
SAT solutions with recurrent GNNs and multinomial denoising diffusion.

A ground-up JAX/XLA/Pallas redesign with the capabilities of the reference
TF2 codebase LUMII-Syslab/DiffusionSAT (see SURVEY.md): QuerySAT-family
models, differentiable SAT losses over literal-clause incidence graphs,
node-budget-packed static-shape batching, denoising-diffusion sampling of
SAT solutions, and first-class multi-chip parallelism via jax.sharding.
"""

__version__ = "0.1.0"
