"""DiffusionSAT-TPU: a TPU-native framework for learning to solve and sample
SAT solutions with recurrent GNNs and multinomial denoising diffusion.

A ground-up JAX/XLA/Pallas redesign with the capabilities of the reference
TF2 codebase LUMII-Syslab/DiffusionSAT (see SURVEY.md): QuerySAT-family
models, differentiable SAT losses over literal-clause incidence graphs,
node-budget-packed static-shape batching, denoising-diffusion sampling of
SAT solutions, and first-class multi-chip parallelism via jax.sharding.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: compiles of the recurrent models are
# expensive (minutes on remote accelerators); cache them across processes.
# Skipped for forced-CPU runs (tests): CPU executables cached from a
# different machine's compile can carry unsupported ISA features.
import os as _os

import jax as _jax

_cache_dir = _os.environ.get("DSAT_COMPILATION_CACHE",
                             _os.path.expanduser("~/.cache/jax_dsat"))
_forced_cpu = "cpu" in (_os.environ.get("JAX_PLATFORM_NAME", "") +
                        _os.environ.get("JAX_PLATFORMS", "")) \
    or bool(_os.environ.get("DSAT_FORCE_CPU"))
if _cache_dir and _cache_dir != "0" and not _forced_cpu:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Hard CPU isolation: the env vars above do NOT stop the axon TPU plugin
# from initializing its tunnel connection at backend discovery (it ignores
# JAX_PLATFORMS), and a second tunnel client can deadlock against a
# running training process. jax.config IS honored (backend selection is
# lazy — same mechanism tests/conftest.py uses), so CPU-only tooling
# should run with DSAT_FORCE_CPU=1.
if _os.environ.get("DSAT_FORCE_CPU"):
    _jax.config.update("jax_platforms", "cpu")
