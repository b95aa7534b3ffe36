"""Test harness: run everything on a virtual 8-device CPU mesh so that
sharding/collective paths are exercised without TPU hardware.

NOTE: the jaxtyping pytest plugin imports jax before this conftest runs, so
env-var defaults (JAX_PLATFORMS / JAX_PLATFORM_NAME) are already latched.
jax.config.update still works because the backend itself initializes lazily,
on first array use — which is always after conftest import.

Opt-in real-hardware mode: CAPF_TPU_TESTS=1 skips the CPU forcing so
tests/test_tpu_smoke.py can compile the Pallas kernels on the actual chip.
Run that file ALONE in this mode (`CAPF_TPU_TESTS=1 pytest
tests/test_tpu_smoke.py`) — the rest of the suite assumes the 8-device CPU
mesh and would be pointlessly slow through the TPU tunnel.
"""

import os

_TPU_MODE = os.environ.get("CAPF_TPU_TESTS") == "1"

if not _TPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
# Full fp32 matmul precision for parity tests.
jax.config.update("jax_default_matmul_precision", "highest")
