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
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables at module boundaries.

    A full-suite run accumulates hundreds of XLA:CPU executables in one
    process; past ~140 tests the in-process LLVM JIT state gets large enough
    that a later compile segfaults (observed deterministically at
    test_fused_vjp with the full suite order, while any subset passes).
    Clearing per module trades a few recompiles for a bounded live set.
    """
    yield
    jax.clear_caches()
