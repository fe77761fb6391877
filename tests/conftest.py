"""Test config: run everything on a virtual 8-device CPU mesh.

The session's sitecustomize registers the axon TPU plugin and imports jax
at interpreter startup, so env vars alone are not enough — we also flip the
platform via jax.config before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_compiled_program_accumulation():
    """Drop compiled executables at module teardown.

    The full suite compiles 600+ XLA CPU programs in one process; past
    ~(test 390) the CPU backend segfaulted inside backend_compile_and_load
    (reproducible at the same point across runs, never in any standalone
    subset — cumulative JIT state, not a specific program). Cross-module
    executable reuse is negligible (jit caches key on function identity
    and tests define their own), so clearing per module bounds the
    accumulation at ~zero recompile cost."""
    yield
    jax.clear_caches()
