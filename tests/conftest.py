"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's implication: multi-chip paths are validated with
`xla_force_host_platform_device_count` instead of real hardware.
"""

import os

# the axon TPU plugin ignores JAX_PLATFORMS; JAX_PLATFORM_NAME works
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
