"""Test harness: run everything on a virtual 8-device CPU mesh so that
sharding/collective paths are exercised without TPU hardware.

NOTE: the jaxtyping pytest plugin imports jax before this conftest runs, so
env-var defaults (JAX_PLATFORMS / JAX_PLATFORM_NAME) are already latched.
jax.config.update still works because the backend itself initializes lazily,
on first array use — which is always after conftest import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Full fp32 matmul precision for parity tests.
jax.config.update("jax_default_matmul_precision", "highest")
