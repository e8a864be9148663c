"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's implication: multi-chip paths are validated with
`xla_force_host_platform_device_count` instead of real hardware.
"""

import os

# HARD overrides (not setdefault): the host environment exports
# JAX_PLATFORMS=axon for the TPU tunnel, which must never win in tests —
# otherwise the suite runs on (and contends for) the single real TPU and
# every 8-virtual-device test silently skips.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# sitecustomize (the axon tunnel bootstrap) preloads jax before this file
# runs, so env vars alone are too late; the config update below still
# wins because backend selection is lazy (first jax.devices() call).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
