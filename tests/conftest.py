"""Test harness: run everything on a virtual 8-device CPU mesh so that
sharding/collective paths are exercised without TPU hardware."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep matmuls at full fp32 precision on CPU for parity tests.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")
