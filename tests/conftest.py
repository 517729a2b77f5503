"""Test harness config: CPU backend with 8 virtual devices (multi-chip
sharding tests without TPU hardware) and x64 for reference-parity numerics."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)

# Some environments (axon TPU tunnel) ignore JAX_PLATFORMS for default
# backend selection; route default placement to CPU explicitly so tests are
# fast, deterministic, and can use the 8 virtual devices.
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop jit/compilation caches between test modules.

    A full-suite run (~195 tests, several hundred XLA:CPU compilations in
    one process) reproducibly segfaults inside backend_compile_and_load
    near the END of the suite (test_stepper::test_step_determinism) while
    every module passes in isolation — an XLA CPU JIT state/accumulation
    bug, not a framework one.  Clearing per module keeps each module's
    compile history short and the suite green; the cost is re-tracing a
    handful of shared helpers per module."""
    yield
    jax.clear_caches()
