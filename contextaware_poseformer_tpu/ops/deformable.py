"""Fused multi-point bilinear sampling as a Pallas TPU kernel.

The lifting net samples small feature maps at many scattered points per frame:
17 reference points (pose_dformer.py:216-218) and 17x16 deformable points per
level per block (pose_dformer.py:127-129). XLA lowers the jnp formulation
(ops/grid_sample.py) to 4 gathers per call; on TPU, gathers of short feature
rows underuse the hardware. This kernel reformulates bilinear sampling as two
dense ONE-HOT contractions that run on the MXU/VPU with zero gathers:

  row mix    R[p, h] = (h == y0_p) * (1 - wy_p) + (h == y0_p + 1) * wy_p
  col mix    C[p, w] = (w == x0_p) * (1 - wx_p) + (w == x0_p + 1) * wx_p
  G  = R @ F.reshape(H, W*C)          # MXU: (P, H) x (H, W*C)
  out[p, c] = sum_w C[p, w] * G[p, w, c]   # VPU reduce

Out-of-bounds handling falls out of the one-hot construction: an index
outside [0, size) matches nothing and contributes zero — exactly torch's
zeros-padding semantics; border mode clamps the *coordinates* first
(identical to ops/grid_sample.py, which remains the reference implementation
and the training backward).

The op is wrapped in jax.custom_vjp: forward = this kernel, backward = the
jnp gather formulation's VJP (compiled by XLA), so the kernel is usable in
training too.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from contextaware_poseformer_tpu.ops import grid_sample


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _sample_kernel(pts_ref, f_ref, out_ref, *, h, w, c, border, align_corners,
                   precision):
    """One batch element: pts (1, P, 2), f (1, H*W, C), both VMEM-resident.

    Builds the full bilinear mixing matrix M[p, h*W+w] = row_p(h) * col_p(w)
    with 2D elementwise ops only (Mosaic forbids lane-folding reshapes inside
    kernels), then one MXU matmul M @ F. M never leaves VMEM.
    """
    pts = pts_ref[0]  # (P, 2)
    f = f_ref[0]  # (H*W, C)
    p = pts.shape[0]

    def unnormalize(coord, size):
        if align_corners:
            return (coord + 1.0) * 0.5 * (size - 1)
        return ((coord + 1.0) * size - 1.0) * 0.5

    x = unnormalize(pts[:, 0], w)
    y = unnormalize(pts[:, 1], h)
    if border:
        x = jnp.clip(x, 0.0, w - 1)
        y = jnp.clip(y, 0.0, h - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[:, None]  # (P, 1)
    wy = (y - y0)[:, None]
    x0i = x0.astype(jnp.int32)[:, None]
    y0i = y0.astype(jnp.int32)[:, None]

    iota_hw = jax.lax.broadcasted_iota(jnp.int32, (p, h * w), 1)
    h_idx = iota_hw // w
    w_idx = iota_hw - h_idx * w
    rowv = jnp.where(h_idx == y0i, 1.0 - wy, 0.0) + jnp.where(
        h_idx == y0i + 1, wy, 0.0
    )
    colv = jnp.where(w_idx == x0i, 1.0 - wx, 0.0) + jnp.where(
        w_idx == x0i + 1, wx, 0.0
    )
    m = rowv * colv  # (P, H*W), 4 nonzeros per row
    if precision == "highest":
        # HIGHEST: fp32 MXU passes — exact float-tolerance parity with the
        # gather formulation (the default; bf16 passes round the weights).
        out_ref[0] = jnp.dot(
            m, f.astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(out_ref.dtype)
    else:
        # "default": single bf16 MXU pass with fp32 accumulation — ~3x fewer
        # passes. Right when the features already carry only bf16 information
        # (bf16 backbone); weight rounding is ~2^-8 relative.
        out_ref[0] = jnp.dot(
            m.astype(jnp.bfloat16), f.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def _sample_kernel_2stage(pts_ref, fh_ref, out_ref, *, h, w, c, border,
                          align_corners, precision):
    """Separable variant: row-mix matmul then in-VMEM column reduction.

    The one-stage kernel's dot has N = C output lanes; for the large
    small-channel levels (64x48x32: N=32 -> 25% lane utilization, measured
    24 TFLOP/s) it pays to first interpolate rows with
    G = R(P, H) @ F(H, W*C)  (N = W*C, full lanes), weight columns
    elementwise with the expanded column mix, and reduce the W axis with a
    one-hot (W*C, C) selection matmul. Measured 2.4x faster than one-stage
    on the 64x48x32 level (an unrolled slice-accumulate column blend was
    tried first and is instruction-bound: 962us vs 250us vs 599us one-stage).
    Same math, same out-of-bounds semantics (a one-hot row/col for an index
    outside [0, size) matches nothing).
    """
    pts = pts_ref[0]  # (P, 2)
    fh = fh_ref[0]  # (H, W*C)
    p = pts.shape[0]

    def unnormalize(coord, size):
        if align_corners:
            return (coord + 1.0) * 0.5 * (size - 1)
        return ((coord + 1.0) * size - 1.0) * 0.5

    x = unnormalize(pts[:, 0], w)
    y = unnormalize(pts[:, 1], h)
    if border:
        x = jnp.clip(x, 0.0, w - 1)
        y = jnp.clip(y, 0.0, h - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[:, None]
    wy = (y - y0)[:, None]
    x0i = x0.astype(jnp.int32)[:, None]
    y0i = y0.astype(jnp.int32)[:, None]

    h_idx = jax.lax.broadcasted_iota(jnp.int32, (p, h), 1)
    rowv = jnp.where(h_idx == y0i, 1.0 - wy, 0.0) + jnp.where(
        h_idx == y0i + 1, wy, 0.0
    )  # (P, H)
    # expanded column mix: colv_exp[p, w*C + c] = colv[p, w]
    w_exp = jax.lax.broadcasted_iota(jnp.int32, (p, w * c), 1) // c
    colv_exp = jnp.where(w_exp == x0i, 1.0 - wx, 0.0) + jnp.where(
        w_exp == x0i + 1, wx, 0.0
    )  # (P, W*C)
    # one-hot W-axis reduction: S[w*C + c, c'] = (c == c')
    ci = jax.lax.broadcasted_iota(jnp.int32, (w * c, c), 0) % c
    cj = jax.lax.broadcasted_iota(jnp.int32, (w * c, c), 1)
    sel = jnp.where(ci == cj, 1.0, 0.0)

    if precision == "highest":
        g = jnp.dot(rowv, fh.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        out = jnp.dot(g * colv_exp, sel,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    else:
        g = jnp.dot(rowv.astype(jnp.bfloat16), fh.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        out = jnp.dot((g * colv_exp).astype(jnp.bfloat16),
                      sel.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def _sample_fused_fwd_impl(
    features: jax.Array, points: jax.Array, *, padding_mode: str,
    align_corners: bool, interpret: bool, precision: str = "highest",
) -> jax.Array:
    b, h, w, c = features.shape
    batch_shape = points.shape[:-1]
    pts = points.reshape(b, -1, 2)
    p = pts.shape[1]
    p_pad = _round_up(max(p, 8), 8)
    if p_pad != p:
        pts = jnp.pad(pts, ((0, 0), (0, p_pad - p), (0, 0)))

    # shape-based dispatch: the separable kernel wins when the map is large
    # and the channel count badly underfills the 128 output lanes (measured:
    # 2.4x on 64x48x32, but a 1.3x REGRESSION on 32x24x64 where one-stage
    # already gets 50% lanes — hence c < 64, not c < 128)
    two_stage = h * w >= 1024 and c < 64
    if two_stage:
        kernel = functools.partial(
            _sample_kernel_2stage, h=h, w=w, c=c,
            border=padding_mode == "border", align_corners=align_corners,
            precision=precision,
        )
        f_in = features.reshape(b, h, w * c)
        f_spec = pl.BlockSpec((1, h, w * c), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        flops = 2 * b * p_pad * h * (w * c + c)
    else:
        kernel = functools.partial(
            _sample_kernel, h=h, w=w, c=c,
            border=padding_mode == "border", align_corners=align_corners,
            precision=precision,
        )
        f_in = features.reshape(b, h * w, c)
        f_spec = pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        flops = 2 * b * p_pad * h * w * c
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, p_pad, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            f_spec,
        ],
        out_specs=pl.BlockSpec((1, p_pad, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, p_pad, c), features.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=b * (h * w * c + p_pad * (2 + c)) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(pts, f_in)
    return out[:, :p].reshape(*batch_shape, c)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5)
)
def sample_points_fused(
    features: jax.Array,
    points: jax.Array,
    padding_mode: str = "zeros",
    align_corners: bool = True,
    interpret: bool = False,
    precision: str = "highest",
) -> jax.Array:
    """Drop-in for ops.grid_sample_points with a fused Pallas forward."""
    return _sample_fused_fwd_impl(
        features, points, padding_mode=padding_mode,
        align_corners=align_corners, interpret=interpret, precision=precision,
    )


def _fwd(features, points, padding_mode, align_corners, interpret, precision):
    out = _sample_fused_fwd_impl(
        features, points, padding_mode=padding_mode,
        align_corners=align_corners, interpret=interpret, precision=precision,
    )
    return out, (features, points)


def _bwd(padding_mode, align_corners, interpret, precision, residuals, g):
    features, points = residuals
    # backward through the reference jnp formulation (same math, XLA-fused)
    _, vjp = jax.vjp(
        lambda f, p: grid_sample.grid_sample_points(
            f, p, padding_mode=padding_mode, align_corners=align_corners
        ),
        features, points,
    )
    return vjp(g)


sample_points_fused.defvjp(_fwd, _bwd)


def sample_points(
    features: jax.Array,
    points: jax.Array,
    padding_mode: str = "zeros",
    align_corners: bool = True,
    impl: str = "auto",
    precision: str = "highest",
) -> jax.Array:
    """Implementation dispatcher: 'gather' (jnp), 'fused' (Pallas), or 'auto'
    (fused on TPU, gather elsewhere). `precision` selects the fused kernel's
    MXU mode ('highest' = exact parity; 'default' = bf16 passes for deploy)."""
    if impl == "auto":
        impl = "fused" if jax.default_backend() == "tpu" else "gather"
    if impl == "gather":
        return grid_sample.grid_sample_points(
            features, points, padding_mode=padding_mode,
            align_corners=align_corners,
        )
    if impl == "fused":
        return sample_points_fused(features, points, padding_mode,
                                   align_corners, False, precision)
    if impl == "fused_interpret":
        return sample_points_fused(features, points, padding_mode,
                                   align_corners, True, precision)
    raise ValueError(impl)
