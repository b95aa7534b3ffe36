"""Shared backbone building blocks: folded-BN convolutions and resize ops.

The backbones run frozen in eval mode on every live reference path
(ContextPose/train.py:146-148, human36m.yaml:21 fix_weights, 3DHP
common/cfg.py fix_weights=True), so BatchNorm is exactly an affine transform
of its running statistics. We represent each torch (Conv2d, BatchNorm2d) pair
as ONE folded module with parameters {kernel, scale, bias}:

    y = conv(x, kernel) * scale + bias,   scale = gamma / sqrt(var + eps),
                                          bias  = beta - mean * scale.

XLA folds the affine into the convolution at compile time; checkpoint
conversion computes scale/bias once from the torch running stats
(models/convert.py).

Module names are the torch parameter prefixes verbatim (e.g.
"layer1.0.conv1"), which keeps the param tree FLAT and makes the torch->flax
mapping a pure string rule.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvBN(nn.Module):
    """Conv2d (no bias) + folded frozen BatchNorm + optional ReLU, NHWC.

    `quantize="c128"` switches convs with BOTH channel counts >= 128 to an
    int8 path (per-output-channel symmetric weight quant + dynamic
    per-tensor activation quant, int32 accumulation). Measured 1.85x on the
    16x12x128 HRNet branch INCLUDING the quant passes; narrower convs and
    the mixed-width layer1 bottlenecks measured slower in int8 (PERF.md) and
    always take the float path. The frozen backbone means the rounding is
    inference-only — grads never flow here (stop_gradient in capf).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    relu: bool = False
    dtype: Any = jnp.float32
    quantize: str = "none"  # "none" | "c128"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        ks = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (ks, ks, in_ch, self.features),
        )
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        pad = (ks - 1) // 2
        int8_path = (
            self.quantize == "c128" and in_ch >= 128 and self.features >= 128
        )
        if int8_path:
            k32 = kernel.astype(jnp.float32)
            wscale = jnp.max(jnp.abs(k32), axis=(0, 1, 2)) / 127.0  # (out,)
            kq = jnp.round(k32 / wscale).astype(jnp.int8)
            amax = jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0
            xq = jnp.clip(
                jnp.round(x.astype(jnp.float32) / amax), -127, 127
            ).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xq, kq,
                window_strides=(self.stride, self.stride),
                padding=[(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            # fold dequant scales into the BN affine
            eff_scale = (scale * wscale * amax).astype(self.dtype)
            y = y.astype(self.dtype) * eff_scale + bias.astype(self.dtype)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=(self.stride, self.stride),
                padding=[(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = y * scale.astype(self.dtype) + bias.astype(self.dtype)
        if self.relu:
            y = jax.nn.relu(y)
        return y


def upsample_nearest(x: jax.Array, factor: int) -> jax.Array:
    """torch nn.Upsample(scale_factor=f, mode='nearest') on NHWC."""
    return jnp.repeat(jnp.repeat(x, factor, axis=1), factor, axis=2)


def _linear_interp_matrix(out_size: int, in_size: int, dtype) -> jax.Array:
    """(out, in) bilinear weights with align_corners=True semantics."""
    if in_size == 1:
        return jnp.ones((out_size, 1), dtype)
    if out_size == 1:
        src = jnp.zeros((1,), jnp.float32)
    else:
        src = jnp.arange(out_size, dtype=jnp.float32) * (in_size - 1) / (out_size - 1)
    i0 = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_size - 1)
    i1 = jnp.clip(i0 + 1, 0, in_size - 1)
    w1 = src - i0
    w0 = 1.0 - w1
    eye = jnp.eye(in_size, dtype=jnp.float32)
    mat = eye[i0] * w0[:, None] + eye[i1] * w1[:, None]
    return mat.astype(dtype)


def resize_bilinear_align_corners(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """torch nn.Upsample(mode='bilinear', align_corners=True) on NHWC.

    Formulated as two small dense interpolation matmuls (separable), which XLA
    maps straight onto the MXU — no gather needed (CPN globalNet/refineNet
    upsampling, networks/globalNet.py:40-45, refineNet.py:63).
    """
    n, h, w, c = x.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x
    mh = _linear_interp_matrix(oh, h, x.dtype)
    mw = _linear_interp_matrix(ow, w, x.dtype)
    y = jnp.einsum("oh,nhwc->nowc", mh, x)
    return jnp.einsum("pw,nowc->nopc", mw, y)


def max_pool_3x3_s2(x: jax.Array) -> jax.Array:
    """torch MaxPool2d(kernel=3, stride=2, padding=1) on NHWC."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
