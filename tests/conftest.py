"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize force-registers the axon TPU plugin and may
# override JAX_PLATFORMS; pin the test platform via the config API, which
# wins as long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")

# Torch-parity tests compare float32 numerics; keep matmuls in full precision.
jax.config.update("jax_default_matmul_precision", "highest")
