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
