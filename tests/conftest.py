"""Test configuration.

Runs the suite on a virtual 8-device CPU mesh (the JAX idiom for exercising
multi-chip sharding without hardware) with float64 enabled so FEM correctness
gates can be checked at the 1e-8 level.

The harness presets JAX_PLATFORMS to a TPU platform, and pytest plugins may
import jax before this conftest executes — so force both the env vars and the
jax config values (config updates are safe any time before backend init).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
