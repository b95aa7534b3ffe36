"""Bilinear point sampling from feature maps (torch ``F.grid_sample`` parity).

The reference model samples feature maps at 2D keypoint locations in two
places (ContextPose/mvn/models/pose_dformer.py):
- reference-point sampling, ``padding_mode='zeros'``, ``align_corners=True``
  (pose_dformer.py:216-218);
- deformable-offset sampling, ``padding_mode='border'``, ``align_corners=True``
  (pose_dformer.py:127-129).

This module implements the exact semantics on NHWC features for arbitrary
point sets, as a pure-jnp gather formulation (XLA lowers it to a fused gather;
the Pallas fused deformable kernel in ``ops/deformable.py`` builds on the same
math). Unlike torch's NCHW (N, Hg, Wg, 2) grid API, points are a flat
``(..., P, 2)`` set — the model never needs a 2D sampling grid.

Semantics notes (match torch/aten GridSampler):
- ``align_corners=True``:  x_pix = (x + 1)/2 * (W - 1)
- ``align_corners=False``: x_pix = ((x + 1) * W - 1)/2
- ``border``: the *coordinate* is clamped to [0, size-1] before the floor;
  corner weights are computed from the clamped coordinate.
- ``zeros``: out-of-bounds corner *values* contribute zero (weights keep their
  value, so partial out-of-bounds blends shrink toward zero).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord: jax.Array, size: int, align_corners: bool) -> jax.Array:
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def grid_sample_points(
    features: jax.Array,
    points: jax.Array,
    *,
    padding_mode: str = "zeros",
    align_corners: bool = True,
) -> jax.Array:
    """Sample ``features`` at normalized ``points``.

    Args:
      features: (N, H, W, C) feature maps (NHWC — TPU-native layout).
      points: (N, ..., 2) xy coordinates in [-1, 1] (x indexes W, y indexes H,
        same convention as torch grid_sample's last axis).
      padding_mode: "zeros" | "border".
      align_corners: corner-alignment convention (see module docstring).

    Returns:
      (N, ..., C) sampled feature vectors, in ``features.dtype``.
    """
    if padding_mode not in ("zeros", "border"):
        raise ValueError(f"unsupported padding_mode: {padding_mode!r}")
    if features.dtype == jnp.int8:
        # int8 maps (deploy sampler-int8 path): treat quantized values as
        # raw numbers in f32 — the corner-weight cast below must not
        # truncate the bilinear weights to int8. The caller owns the
        # dequant scale (see lifter.py feat_scales).
        features = features.astype(jnp.float32)
    n, h, w, c = features.shape
    batch_shape = points.shape[:-1]
    pts = points.reshape(n, -1, 2)
    p = pts.shape[1]

    coord_dtype = jnp.promote_types(points.dtype, jnp.float32)
    x = _unnormalize(pts[..., 0].astype(coord_dtype), w, align_corners)
    y = _unnormalize(pts[..., 1].astype(coord_dtype), h, align_corners)

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, w - 1)
        y = jnp.clip(y, 0.0, h - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = features.reshape(n, h * w, c)

    def corner(yi: jax.Array, xi: jax.Array, weight: jax.Array) -> jax.Array:
        in_bounds = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        idx = yc * w + xc  # (n, p)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)  # (n, p, c)
        weight = jnp.where(in_bounds, weight, 0.0)
        return vals * weight[..., None].astype(features.dtype)

    out = (
        corner(y0i, x0i, (1 - wy) * (1 - wx))
        + corner(y0i, x0i + 1, (1 - wy) * wx)
        + corner(y0i + 1, x0i, wy * (1 - wx))
        + corner(y0i + 1, x0i + 1, wy * wx)
    )
    return out.reshape(*batch_shape, c)
