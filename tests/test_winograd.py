"""Winograd F(2x2,3x3) parity vs the direct conv (ops/winograd.py).

Covers the exact branch shapes from the deploy budget (PERF.md): the
transformation must be numerically interchangeable with
lax.conv_general_dilated before any device A/B is meaningful.
Reference conv semantics: ContextPose/mvn/models/pose_hrnet.py:66-95
(BasicBlock 3x3, stride 1, SAME padding).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from contextaware_poseformer_tpu.ops.winograd import (
    transform_kernel,
    winograd_conv3x3,
)


def _direct(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize(
    "shape",
    [
        (2, 8, 6, 5, 7),        # odd channel counts, non-square
        (2, 64, 48, 32, 32),    # branch0 (HRNet-32)
        (2, 32, 24, 64, 64),    # branch1
        (1, 16, 12, 128, 128),  # branch2
    ],
)
@pytest.mark.parametrize("pack", [1, 4])
def test_matches_direct_conv_f32(shape, pack):
    b, h, w, cin, cout = shape
    rng = np.random.RandomState(hash(shape) % 2**31)
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
    k = jnp.asarray((rng.randn(3, 3, cin, cout) * 0.1).astype(np.float32))
    ref = _direct(x, k)
    got = winograd_conv3x3(x, transform_kernel(k), pack=pack,
                           mm_dtype=jnp.float32)
    rel = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 1e-5, rel


def test_bf16_drift_is_bounded():
    # bf16 transformed-domain products drift more than a direct bf16 conv
    # (F(2,3) error amplification); assert it stays within the documented
    # envelope so a silent regression in the transform shows up.
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 64, 48, 32).astype(np.float32))
    k = jnp.asarray((rng.randn(3, 3, 32, 32) * 0.1).astype(np.float32))
    ref = _direct(x, k)
    got = winograd_conv3x3(x, transform_kernel(k), mm_dtype=jnp.bfloat16)
    rel = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 2e-2, rel


def test_pack_variants_agree():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 32, 24, 64).astype(np.float32))
    u = transform_kernel(
        jnp.asarray((rng.randn(3, 3, 64, 64) * 0.1).astype(np.float32))
    )
    a = winograd_conv3x3(x, u, pack=1, mm_dtype=jnp.float32)
    b = winograd_conv3x3(x, u, pack=4, mm_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_odd_spatial_rejected():
    x = jnp.zeros((1, 7, 8, 4))
    u = transform_kernel(jnp.zeros((3, 3, 4, 4)))
    with pytest.raises(ValueError):
        winograd_conv3x3(x, u)
