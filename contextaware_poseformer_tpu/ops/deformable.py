"""Fused multi-point bilinear sampling as a Pallas TPU kernel.

The lifting net samples small feature maps at many scattered points per frame:
17 reference points (pose_dformer.py:216-218) and 17x16 deformable points per
level per block (pose_dformer.py:127-129). XLA lowers the jnp formulation
(ops/grid_sample.py) to 4 gathers per call; on TPU, gathers of short feature
rows underuse the hardware. This kernel reformulates bilinear sampling as two
dense ONE-HOT contractions that run on the MXU/VPU with zero gathers:

  row mix    R[p, h] = relu(1 - |y_p - h|)   (triangle kernel == bilinear)
  col mix    C[p, w] = relu(1 - |x_p - w|)
  G  = R @ F.reshape(H, W*C)          # MXU: (P, H) x (H, W*C)
  out[p, c] = sum_w C[p, w] * G[p, w, c]   # VPU reduce

Out-of-bounds handling falls out of the triangle support: an index more
than one step from the coordinate gets zero weight, and a coordinate
outside [0, size) reaches no in-bounds tap — exactly torch's
zeros-padding semantics; border mode clamps the *coordinates* first
(identical to ops/grid_sample.py, which remains the reference implementation
and the training backward).

The op is wrapped in jax.custom_vjp: forward = this kernel; backward on TPU
is a matching Pallas kernel (dF = M^T @ g on the MXU + one-hot-difference
coordinate grads — the jnp-gather VJP would lower dF to XLA scatter-adds),
elsewhere the jnp gather formulation's VJP. See _multi_bwd_pallas.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from contextaware_poseformer_tpu.ops import grid_sample


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _use_two_stage(h: int, w: int, c: int) -> bool:
    """The separable kernel wins when the map is large and the channel count
    badly underfills the 128 output lanes (measured: 2.4x on 64x48x32, but a
    1.3x REGRESSION on 32x24x64 where one-stage already gets 50% lanes)."""
    return h * w >= 1024 and c < 64


# project-then-sample on SEPARABLE (two-stage) levels — the big
# small-channel level0 (64x48xC32/48) that round 2's in-kernel projection
# gate excluded (VERDICT r3: "untried headroom"). Modes:
#   "off":      level stays unprojected two-stage; samples project after
#               the kernel (round-2/3 shipped behavior).
#   "fold":     fold the projection into the W-axis reduction: the one-hot
#               selection matrix S (W*C, C) becomes S @ Wp (W*C, hd), so the
#               dominant row-interp matmul keeps full W*C lanes and the
#               second matmul shrinks C/hd-fold. Bias adds after sampling
#               (exact under border mode: mixing weights sum to 1).
#   "onestage": project the whole map in VMEM (existing one-stage proj path)
#               and sample hd output lanes — C/hd fewer sampling FLOPs but
#               hd/128 lane fill on the big M @ Fp matmul.
# Measured round 4 (experiments/preproject2_ab.py, real chip): see PERF.md.


def _proj2_mode() -> str:
    # read per call (like CAPF_SAMPLER_BATCH_CHUNK) so setting the env var
    # after import still takes effect in A/B harnesses
    mode = os.environ.get("CAPF_PREPROJECT_2STAGE", "off")
    if mode not in ("off", "fold", "onestage"):
        raise ValueError(f"CAPF_PREPROJECT_2STAGE={mode!r}")
    return mode


def _sample_body(pts, f2d, *, h, w, c, border, align_corners, precision,
                 two_stage, out_dtype, proj=None):
    """Shared in-VMEM sampling math: pts (P, 2), f2d is (H*W, C) for the
    one-stage form or (H, W*C) for the separable two-stage form.

    One-stage: build the full bilinear mixing matrix
    M[p, h*W+w] = row_p(h) * col_p(w) with 2D elementwise ops only (Mosaic
    forbids lane-folding reshapes inside kernels), then one MXU matmul
    M @ F. Rows/cols are triangle-kernel weights relu(1-|coord-index|)
    (see the build-site comment for exactness under both padding modes).

    Two-stage (separable): the one-stage dot has N = C output lanes; for
    large small-channel levels (64x48x32: N=32 -> 25% lane use, 24 TFLOP/s)
    it pays to interpolate rows first with G = R(P, H) @ F(H, W*C) (full
    lanes), weight columns elementwise, and reduce the W axis with a one-hot
    (W*C, C) selection matmul — 2.4x on that level (an unrolled
    slice-accumulate column blend was tried and is instruction-bound:
    962us vs 250us vs 599us one-stage).

    Out-of-bounds contributes zero weight in either form (triangle support
    is only the two nearest integer taps; an out-of-range coordinate
    reaches no in-bounds tap -> zeros padding); border mode clamps the
    coordinates first. precision="highest" = fp32 MXU passes (exact parity
    with the gather formulation); "default" = single bf16 pass with fp32
    accumulation (~2^-8 weight rounding, the bf16-backbone deploy mode).
    """
    return _sample_body_xy(
        pts[:, 0], pts[:, 1], f2d, h=h, w=w, c=c, border=border,
        align_corners=align_corners, precision=precision,
        two_stage=two_stage, out_dtype=out_dtype, proj=proj,
    )


def _sample_body_xy(xn, yn, f2d, *, h, w, c, border, align_corners,
                    precision, two_stage, out_dtype, proj=None):
    """_sample_body on separate normalized-coordinate vectors xn/yn (P,) —
    lets callers with a packed lane layout unpack in-kernel and skip the
    (P, 2) points relayout entirely."""
    p = xn.shape[0]

    def unnormalize(coord, size):
        if align_corners:
            return (coord + 1.0) * 0.5 * (size - 1)
        return ((coord + 1.0) * size - 1.0) * 0.5

    x = unnormalize(xn, w)
    y = unnormalize(yn, h)
    if border:
        x = jnp.clip(x, 0.0, w - 1)
        y = jnp.clip(y, 0.0, h - 1)

    # Triangle-kernel mixing build: bilinear weight at integer index k is
    # exactly relu(1 - |coord - k|) for BOTH padding modes (border clamps
    # the coords first; for zeros an out-of-range coord puts triangle
    # weight only on in-bounds taps, identical to a floor/one-hot
    # construction). The index planes are point-independent (CSE'd across
    # the batch-chunk loop); per point-plane this is 4 VPU ops + mul vs 11
    # for the floor + two-compare/two-select/add form it replaced — the
    # m-build is the measured bound of the big-map kernels, and the swap
    # A/B'd 7.04 -> 5.92 ms per 3 iters on the CPN sampler family
    # (PERF.md round-4). NOTE (round-4 negative result): building these
    # planes in bf16 directly (instead of f32-build + bf16-cast at the
    # dots) fails Mosaic compilation on hardware — the i1 compare masks
    # live in 32-bit-tiled layouts and the bf16 select needs an
    # unsupported (8,128)->(16,128) mask relayout ("Invalid relayout ...
    # i1"). The f32 build stays; interpret mode does NOT catch this class
    # of break.
    xcol = x[:, None]  # (P, 1)
    ycol = y[:, None]

    hi = jax.lax.Precision.HIGHEST
    if two_stage:
        h_idx = jax.lax.broadcasted_iota(jnp.int32, (p, h), 1)
        rowv = jnp.maximum(
            0.0, 1.0 - jnp.abs(ycol - h_idx.astype(jnp.float32))
        )  # (P, H)
        # expanded column mix: colv_exp[p, w*C + c] = colv[p, w]. Built
        # DIRECTLY on the VPU: a small (P, W) build expanded through a
        # one-hot MXU matmul was measured WORSE (333 -> 469 us/call at the
        # flagship shapes — little-matmul pipeline fills beat the VPU
        # compare/select traffic; see PERF.md round-2 negative results).
        w_exp = jax.lax.broadcasted_iota(jnp.int32, (p, w * c), 1) // c
        colv_exp = jnp.maximum(
            0.0, 1.0 - jnp.abs(xcol - w_exp.astype(jnp.float32))
        )  # (P, W*C)
        # one-hot W-axis reduction: S[w*C + c, c'] = (c == c')
        ci = jax.lax.broadcasted_iota(jnp.int32, (w * c, c), 0) % c
        cj = jax.lax.broadcasted_iota(jnp.int32, (w * c, c), 1)
        sel = jnp.where(ci == cj, 1.0, 0.0)
        bp = None
        if proj is not None:
            # PREPROJECT_2STAGE="fold": S @ Wp gives S_p[w*C+c, d] =
            # Wp[c, d] — the reduction matmul then BOTH blends columns and
            # projects C -> hd (bias after: border-mode weights sum to 1,
            # same convention as the aggregate epilogue).
            wp, bp = proj
            if precision == "highest":
                sel = jnp.dot(sel, wp.astype(jnp.float32),
                              preferred_element_type=jnp.float32,
                              precision=hi)
            else:
                sel = jnp.dot(sel.astype(jnp.bfloat16),
                              wp.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.DEFAULT)
        if precision == "highest":
            g = jnp.dot(rowv, f2d.astype(jnp.float32),
                        preferred_element_type=jnp.float32, precision=hi)
            out = jnp.dot(g * colv_exp, sel,
                          preferred_element_type=jnp.float32, precision=hi)
        else:
            g = jnp.dot(rowv.astype(jnp.bfloat16), f2d.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)
            out = jnp.dot((g * colv_exp).astype(jnp.bfloat16),
                          sel.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.DEFAULT)
        if bp is not None:
            out = out + bp
        return out.astype(out_dtype)

    iota_hw = jax.lax.broadcasted_iota(jnp.int32, (p, h * w), 1)
    h_idx = iota_hw // w
    w_idx = iota_hw - h_idx * w
    rowv = jnp.maximum(0.0, 1.0 - jnp.abs(ycol - h_idx.astype(jnp.float32)))
    colv = jnp.maximum(0.0, 1.0 - jnp.abs(xcol - w_idx.astype(jnp.float32)))
    m = rowv * colv  # (P, H*W), 4 nonzeros per row
    if precision == "highest":
        out = jnp.dot(m, f2d.astype(jnp.float32),
                      preferred_element_type=jnp.float32, precision=hi)
    else:
        out = jnp.dot(m.astype(jnp.bfloat16), f2d.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.DEFAULT)
    return out.astype(out_dtype)


def _sample_kernel(pts_ref, f_ref, out_ref, *, h, w, c, border, align_corners,
                   precision):
    out_ref[0] = _sample_body(
        pts_ref[0], f_ref[0], h=h, w=w, c=c, border=border,
        align_corners=align_corners, precision=precision, two_stage=False,
        out_dtype=out_ref.dtype,
    )


def _sample_kernel_2stage(pts_ref, fh_ref, out_ref, *, h, w, c, border,
                          align_corners, precision):
    out_ref[0] = _sample_body(
        pts_ref[0], fh_ref[0], h=h, w=w, c=c, border=border,
        align_corners=align_corners, precision=precision, two_stage=True,
        out_dtype=out_ref.dtype,
    )


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
        # int8 maps sample to bf16: the kernel treats quantized values as
        # raw numbers (the caller owns the dequant scale — sampling is
        # linear, so the scale folds into whatever consumes the samples)
        out_shape=jax.ShapeDtypeStruct(
            (b, p_pad, c),
            jnp.bfloat16 if features.dtype == jnp.int8 else features.dtype,
        ),
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


# ---------------------------------------------------------------------------
# Multi-level fusion: one pallas_call sampling ALL pyramid levels at once
# (each DeformableBlock samples 4 levels with the same point count; the
# smaller levels' standalone calls are dominated by fixed per-dispatch cost)
# ---------------------------------------------------------------------------


def _batch_chunk(b: int) -> int:
    """Batch items per program for the multi-level sampler launches
    (CAPF_SAMPLER_BATCH_CHUNK): amortizes the per-program fixed cost of
    the grid=(b,) dispatch (128 one-item programs at deploy batch; CPN
    device A/B: chunk=4 cut the sampler family 8.03 -> 7.04 ms per 3
    iters — PERF.md round-4). "auto" (the default) picks the largest of
    4/2/1 dividing the batch; an explicit int that does not divide b
    falls back to 1. Shipped default after device A/Bs on BOTH kernel
    families: CPN one-stage 13.53 -> 13.20 ms/iter, hrnet two-stage
    18.97 -> 18.83 (sampler family 4.47 -> 4.11). Mosaic reuses the
    per-item one-hot plane buffers across the chunk (measured: the CPN
    /4 level compiles at chunk=4 where a no-reuse estimate would be ~4x
    over the scoped-VMEM limit), so only the maps and outputs scale with
    chunk in the VMEM grouping estimate."""
    v = os.environ.get("CAPF_SAMPLER_BATCH_CHUNK", "auto")
    if v == "auto":
        for k in (4, 2):
            if b % k == 0:
                return k
        return 1
    k = int(v)
    return k if k >= 1 and b % k == 0 else 1


def kernel_can_preproject(h: int, w: int, c: int, hd: int) -> bool:
    """True when the fused kernel can run a channel projection (C -> hd)
    IN-VMEM before sampling level (h, w, c). One-stage levels project the
    map (or fold into the mixing matmul — same thing); SEPARABLE levels
    need PREPROJECT_2STAGE: "fold" routes the projection through the
    column-reduction matmul (the (H, W*C) view is never re-viewed — Mosaic
    forbids lane-folding reshapes), "onestage" forces the one-stage body on
    the projected hd-lane map."""
    if c <= hd:
        return False
    return not _use_two_stage(h, w, c) or _proj2_mode() != "off"


def _sample_multi_kernel(xs_ref, ys_ref, *rest, shapes, proj_dims, border,
                         align_corners, precision, proj2="off", chunk=1):
    """xs/ys (1, chunk, L*P_pad) packed level-major — SEPARATE lane-major
    coordinate operands, not a (..., 2) points array: the 2-minor layout
    forced ~85 us/launch relayout copies between the offsets producer and
    the kernel (round-4 trace, copies .734-.740), while two flat vectors
    fuse into the producer. The leading 1 is the grid-blocked batch-chunk
    axis: the operand is a (b//chunk, chunk, L*P_pad) view whose block
    keeps the trailing TWO dims equal to the array dims — a flat
    (chunk, L*P_pad) block on a (b, L*P_pad) array is ILLEGAL under
    Mosaic's sublane rule whenever chunk < b and chunk % 8 != 0 (the
    round-4 HEAD regression: compiled at batch 2 smoke, failed at deploy
    batch 128). rest = L feature refs, then (kernel, bias) ref
    pairs for each level with proj_dims[l] set, then L output refs.
    Projected levels compute Fp = F @ W + b in VMEM (bilinear sampling is
    channel-linear, so sampling Fp equals projecting samples —
    models/lifter.py pre_project) and sample hd lanes instead of C; a
    projected SEPARABLE level under proj2="fold" instead folds W into the
    two-stage column-reduction matmul (see PREPROJECT_2STAGE). chunk > 1
    processes that many batch items per program (CAPF_SAMPLER_BATCH_CHUNK)
    to amortize per-program fixed cost."""
    levels = len(shapes)
    f_refs = rest[:levels]
    n_proj = sum(1 for d in proj_dims if d)
    wb_refs = rest[levels:levels + 2 * n_proj]
    out_refs = rest[levels + 2 * n_proj:]
    p_pad = xs_ref.shape[2] // levels
    hi = jax.lax.Precision.HIGHEST
    for j in range(chunk):
        pi = 0
        for l, (h, w, c) in enumerate(shapes):
            xn = xs_ref[0, j, l * p_pad:(l + 1) * p_pad]
            yn = ys_ref[0, j, l * p_pad:(l + 1) * p_pad]
            f2d = f_refs[l][j]
            c_out = c
            proj = None
            two_stage = _use_two_stage(h, w, c)
            if proj_dims[l]:
                wp, bp = wb_refs[2 * pi][...], wb_refs[2 * pi + 1][...]
                pi += 1
                c_out = proj_dims[l]
                if two_stage and proj2 == "fold":
                    proj = (wp, bp)
                else:
                    if precision == "highest":
                        f2d = jnp.dot(f2d.astype(jnp.float32),
                                      wp.astype(jnp.float32),
                                      preferred_element_type=jnp.float32,
                                      precision=hi) + bp
                    else:
                        f2d = jnp.dot(f2d.astype(jnp.bfloat16),
                                      wp.astype(jnp.bfloat16),
                                      preferred_element_type=jnp.float32,
                                      precision=jax.lax.Precision.DEFAULT) + bp
                    two_stage = False
            # fold keeps the ORIGINAL c for the two-stage index math (the
            # (H, W*C) layout is unprojected); the output width is sel's
            # projected dim instead.
            out_refs[l][j] = _sample_body_xy(
                xn, yn, f2d, h=h, w=w, c=(c if proj is not None else c_out),
                border=border, align_corners=align_corners,
                precision=precision, two_stage=two_stage,
                out_dtype=out_refs[l].dtype, proj=proj,
            )


def _multi_fwd_impl(features, points, projs=None, biases=None, *,
                    padding_mode, align_corners, interpret, precision):
    levels = len(features)
    b = features[0].shape[0]
    batch_shape = points.shape[2:-1]  # points: (b, L, ..., 2)
    pts = points.reshape(b, levels, -1, 2)
    p = pts.shape[2]
    p_pad = _round_up(max(p, 8), 8)
    # split x/y into SEPARATE flat lane-major operands (see
    # _sample_multi_kernel) — the strided component reads fuse into the
    # offsets producer instead of paying a (..., 2)-minor relayout copy
    # per launch
    xs, ys = pts[..., 0], pts[..., 1]  # (b, L, P)
    if p_pad != p:
        xs = jnp.pad(xs, ((0, 0), (0, 0), (0, p_pad - p)))
        ys = jnp.pad(ys, ((0, 0), (0, 0), (0, p_pad - p)))
    chunk = _batch_chunk(b)
    # 3D (b//chunk, chunk, L*p_pad) view: the coord block must keep its
    # trailing two dims equal to the array dims (Mosaic sublane rule) —
    # see _sample_multi_kernel docstring.
    xs = xs.reshape(b // chunk, chunk, levels * p_pad)
    ys = ys.reshape(b // chunk, chunk, levels * p_pad)

    if projs is None:
        projs = (None,) * levels
    if biases is None:
        biases = (None,) * levels
    proj_dims = tuple(
        (w.shape[-1] if w is not None else 0) for w in projs
    )
    shapes = tuple(f.shape[1:] for f in features)
    proj2 = _proj2_mode()
    f_ins, f_specs = [], []
    for f, d in zip(features, proj_dims):
        _, h, w, c = f.shape
        if _use_two_stage(h, w, c) and (not d or proj2 == "fold"):
            f_ins.append(f.reshape(b, h, w * c))
            f_specs.append(pl.BlockSpec((chunk, h, w * c),
                                        lambda i: (i, 0, 0),
                                        memory_space=pltpu.VMEM))
        else:
            f_ins.append(f.reshape(b, h * w, c))
            f_specs.append(pl.BlockSpec((chunk, h * w, c),
                                        lambda i: (i, 0, 0),
                                        memory_space=pltpu.VMEM))
    wb_ins, wb_specs = [], []
    for wk, bi in zip(projs, biases):
        if wk is None:
            continue
        bi2 = jnp.zeros((1, wk.shape[-1]), jnp.float32) if bi is None else (
            bi.reshape(1, -1).astype(jnp.float32))
        wb_ins.extend([wk, bi2])
        full = lambda a: pl.BlockSpec(
            a.shape, lambda i, nd=a.ndim: (0,) * nd,
            memory_space=pltpu.VMEM)
        wb_specs.extend([full(wk), full(bi2)])
    out_c = tuple(d or c for (_, _, c), d in zip(shapes, proj_dims))

    kernel = functools.partial(
        _sample_multi_kernel, shapes=shapes, proj_dims=proj_dims,
        border=padding_mode == "border", align_corners=align_corners,
        precision=precision, proj2=proj2, chunk=chunk,
    )
    coord_spec = pl.BlockSpec((1, chunk, levels * p_pad),
                              lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(b // chunk,),
        in_specs=[
            coord_spec,
            coord_spec,
            *f_specs,
            *wb_specs,
        ],
        out_specs=[
            pl.BlockSpec((chunk, p_pad, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for c in out_c
        ],
        out_shape=[
            # int8 maps sample to bf16 (values are raw quantized numbers;
            # the dequant scale is folded by the caller — see lifter.py)
            jax.ShapeDtypeStruct(
                (b, p_pad, c),
                jnp.bfloat16 if f.dtype == jnp.int8 else f.dtype,
            )
            for f, c in zip(features, out_c)
        ],
        cost_estimate=pl.CostEstimate(
            flops=sum(
                2 * b * (p_pad * h * w * c + p_pad * w * c * co
                         + w * c * c * co)
                if (d and proj2 == "fold" and _use_two_stage(h, w, c)) else
                2 * b * (p_pad * h * w * co + (h * w * c * co if d else 0))
                for (h, w, c), co, d in zip(shapes, out_c, proj_dims)
            ),
            bytes_accessed=sum(
                b * (h * w * c + p_pad * (2 + co)) * 4
                for (h, w, c), co in zip(shapes, out_c)
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xs, ys, *f_ins, *wb_ins)
    return tuple(
        o[:, :p].reshape(b, *batch_shape, c)
        for o, c in zip(outs, out_c)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def sample_points_multi(
    features: tuple,
    points: jax.Array,  # (b, L, ..., 2) — per-level point sets, same count
    padding_mode: str = "zeros",
    align_corners: bool = True,
    interpret: bool = False,
    precision: str = "highest",
) -> tuple:
    """Sample L feature levels in ONE kernel launch.

    features: tuple of L NHWC maps (same batch, any H/W/C per level);
    points[:, l] are the sample locations for level l. Returns a tuple of
    (b, ..., C_l). Math identical to per-level sample_points (each level
    independently picks the one-stage or separable body).
    """
    return _multi_fwd_impl(
        tuple(features), points, padding_mode=padding_mode,
        align_corners=align_corners, interpret=interpret, precision=precision,
    )


def _multi_fwd(features, points, padding_mode, align_corners, interpret,
               precision):
    out = _multi_fwd_impl(
        tuple(features), points, padding_mode=padding_mode,
        align_corners=align_corners, interpret=interpret, precision=precision,
    )
    return out, (tuple(features), points)


def _multi_bwd(padding_mode, align_corners, interpret, precision, residuals,
               grads):
    features, points = residuals
    impl = _BWD_IMPL
    if impl == "auto":
        # round-3 measurement: "auto" maps to REFERENCE everywhere — see
        # the _BWD_IMPL note below (premise refuted on device; flagship
        # level0 OOMs scoped VMEM in the Pallas backward).
        impl = "reference"
    if impl == "pallas":
        return _multi_bwd_pallas(
            features, points, tuple(grads), padding_mode, align_corners,
            interpret,
        )

    def ref_fn(feats, pts):
        return tuple(
            grid_sample.grid_sample_points(
                f, pts[:, l], padding_mode=padding_mode,
                align_corners=align_corners,
            )
            for l, f in enumerate(feats)
        )

    _, vjp = jax.vjp(ref_fn, features, points)
    return vjp(tuple(grads))


sample_points_multi.defvjp(_multi_fwd, _multi_bwd)


# ---------------------------------------------------------------------------
# Pallas BACKWARD for the fused sampler (the training path).
#
# The jnp-gather VJP lowers dL/dF to XLA scatter-adds — on TPU those
# serialize and dominate the train step. Matrix form instead (all MXU):
#   dF    = M^T @ g                      (HW, P) x (P, C)
#   dx_p  = sum_c g[p,c] * ((R * dC) @ F)[p,c] * dunnorm/dxn * dclip
#   dy_p  = sum_c g[p,c] * ((dR * C) @ F)[p,c] * ...
# where R/C are the forward's one-hot row/col mixes and dR/dC their exact
# derivatives wrt the fractional offsets (one-hot difference pairs).
# Numerics match jax.vjp of the gather formulation incl. the 0.5 tie
# convention of clip's min/max gradients at exact borders.
# ---------------------------------------------------------------------------

# Shipped default: "reference" — the lever is CLOSED on round-3 device
# measurements (experiments/sampler_bwd_ab.py, PERF.md training page):
# (a) the premise above is FALSE for this graph: the reference VJP's
#     backward contains ~0 scatter time (~4 us/iter total scatter-ish ops
#     in a 66 ms step at batch 128) — XLA lowers the sampler's dF to
#     transposed matmul/fusion ops, not serialized scatters;
# (b) the Pallas backward cannot run the flagship shape: level0
#     (64x48xC32, P=272) needs 18.05 MB scoped VMEM against the 16 MB
#     limit (remote compile error, batch 128) — fixing it needs HW-axis
#     chunking inside the body for a backward that wins nothing.
# The kernel stays as a hardware-verified opt-in artifact (small shapes
# pass tests/test_tpu_smoke.py::test_sampler_backward_on_tpu); "auto" maps
# to reference. CAPF_SAMPLER_BWD={auto,pallas,reference} still overrides
# for experiments.
_BWD_IMPL = os.environ.get("CAPF_SAMPLER_BWD", "reference")


def _sample_bwd_body(pts, f2d, g, *, h, w, c, border, align_corners):
    """pts (P_pad, 2), f2d (HW, C), g (P_pad, C) -> (df (HW, C) f32,
    dpt (P_pad, 2) f32). Value-in/value-out so the multi-level kernel can
    slice its packed points block."""
    hi = jax.lax.Precision.HIGHEST
    f2d = f2d.astype(jnp.float32)
    g = g.astype(jnp.float32)
    p = pts.shape[0]
    hw = h * w

    def unnorm(coord, size):
        if align_corners:
            return (coord + 1.0) * 0.5 * (size - 1), 0.5 * (size - 1)
        return ((coord + 1.0) * size - 1.0) * 0.5, 0.5 * size

    x_un, sx = unnorm(pts[:, 0].astype(jnp.float32), w)
    y_un, sy = unnorm(pts[:, 1].astype(jnp.float32), h)
    if border:
        def climask(v, top):
            # min/max grads with the 0.5 tie convention (matches jnp.clip)
            up = 0.5 * (jnp.where(v < top, 1.0, 0.0)
                        + jnp.where(v <= top, 1.0, 0.0))
            lo = 0.5 * (jnp.where(v > 0.0, 1.0, 0.0)
                        + jnp.where(v >= 0.0, 1.0, 0.0))
            return up * lo

        mx = climask(x_un, w - 1.0)
        my = climask(y_un, h - 1.0)
        x = jnp.clip(x_un, 0.0, w - 1.0)
        y = jnp.clip(y_un, 0.0, h - 1.0)
    else:
        mx = jnp.ones_like(x_un)
        my = jnp.ones_like(y_un)
        x, y = x_un, y_un
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx, wy = x - x0, y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # dF = M^T @ g : build the transposed mixing matrix directly
    it = jax.lax.broadcasted_iota(jnp.int32, (hw, p), 0)
    h_r = it // w
    w_r = it - h_r * w
    rowt = jnp.where(h_r == y0i[None, :], 1.0 - wy[None, :], 0.0) + jnp.where(
        h_r == y0i[None, :] + 1, wy[None, :], 0.0)
    colt = jnp.where(w_r == x0i[None, :], 1.0 - wx[None, :], 0.0) + jnp.where(
        w_r == x0i[None, :] + 1, wx[None, :], 0.0)
    df = jnp.dot(
        rowt * colt, g, preferred_element_type=jnp.float32, precision=hi
    )

    # coordinate grads
    ii = jax.lax.broadcasted_iota(jnp.int32, (p, hw), 1)
    h_i = ii // w
    w_i = ii - h_i * w
    y0c, x0c = y0i[:, None], x0i[:, None]
    wyc, wxc = wy[:, None], wx[:, None]
    rowv = jnp.where(h_i == y0c, 1.0 - wyc, 0.0) + jnp.where(
        h_i == y0c + 1, wyc, 0.0)
    colv = jnp.where(w_i == x0c, 1.0 - wxc, 0.0) + jnp.where(
        w_i == x0c + 1, wxc, 0.0)
    dcol = jnp.where(w_i == x0c + 1, 1.0, 0.0) - jnp.where(
        w_i == x0c, 1.0, 0.0)
    drow = jnp.where(h_i == y0c + 1, 1.0, 0.0) - jnp.where(
        h_i == y0c, 1.0, 0.0)
    gx = jnp.dot(rowv * dcol, f2d, preferred_element_type=jnp.float32,
                 precision=hi)
    gy = jnp.dot(drow * colv, f2d, preferred_element_type=jnp.float32,
                 precision=hi)
    dx = jnp.sum(g * gx, axis=1) * (sx * mx)
    dy = jnp.sum(g * gy, axis=1) * (sy * my)
    return df, jnp.concatenate([dx[:, None], dy[:, None]], axis=1)


def _bwd_vmem_groups(shapes, p_pad: int, feat_bytes: int) -> list:
    """Greedy grouping for the backward launches.

    The per-level estimate mirrors _sample_bwd_body's PEAK live set, not
    just its matmul operands: the coordinate-grad phase holds the (P, HW)
    iota-derived index planes (h_i/w_i int32) plus the four one-hot mixes
    (rowv/colv/dcol/drow f32) plus one product operand at once — eight
    (HW, P)-sized 4-byte planes is the conservative roof (unrolled bodies
    keep live ranges; see the 2x-obvious-size lesson in PERF.md). On top:
    the f32 feature copy AND the df f32 output (h*w*c*8) plus the raw
    feature block, and three (P, C) f32 planes (g, gx, gy)."""
    est = []
    for (h, w, c) in shapes:
        e = (
            8 * 4 * h * w * p_pad
            + h * w * c * (8 + feat_bytes)
            + p_pad * c * 12
        )
        est.append(e)
    groups, start, acc = [], 0, 0
    for l, e in enumerate(est):
        if l > start and acc + e > _VMEM_GROUP_BUDGET:
            groups.append((start, l))
            start, acc = l, 0
        acc += e
    groups.append((start, len(est)))
    return groups


def _bwd_kernel_multi(pts_ref, *rest, shapes, border, align_corners):
    levels = len(shapes)
    f_refs = rest[:levels]
    g_refs = rest[levels:2 * levels]
    df_refs = rest[2 * levels:3 * levels]
    dpt_refs = rest[3 * levels:]
    p_pad = pts_ref.shape[1] // levels

    for l, (h, w, c) in enumerate(shapes):
        pts = pts_ref[0, l * p_pad:(l + 1) * p_pad]
        df, dpt = _sample_bwd_body(
            pts, f_refs[l][0], g_refs[l][0],
            h=h, w=w, c=c, border=border, align_corners=align_corners,
        )
        df_refs[l][0] = df.astype(df_refs[l].dtype)
        dpt_refs[l][0] = dpt.astype(dpt_refs[l].dtype)


def _multi_bwd_pallas(features, points, grads, padding_mode, align_corners,
                      interpret):
    levels = len(features)
    b = features[0].shape[0]
    batch_shape = points.shape[2:-1]
    pts = points.reshape(b, levels, -1, 2)
    p = pts.shape[2]
    p_pad = _round_up(max(p, 8), 8)
    if p_pad != p:
        pts = jnp.pad(pts, ((0, 0), (0, 0), (0, p_pad - p), (0, 0)))
    pts2 = pts.reshape(b, levels * p_pad, 2)

    shapes = tuple(f.shape[1:] for f in features)
    groups = _bwd_vmem_groups(
        shapes, p_pad, jnp.dtype(features[0].dtype).itemsize)

    dfs, dpts = [], []
    for lo, hi_ in groups:
        gshapes = shapes[lo:hi_]
        f_ins = [
            f.reshape(b, h * w, c)
            for f, (h, w, c) in zip(features[lo:hi_], gshapes)
        ]
        g_ins = []
        for gl, (h, w, c) in zip(grads[lo:hi_], gshapes):
            g2 = gl.reshape(b, p, c).astype(jnp.float32)
            if p_pad != p:
                g2 = jnp.pad(g2, ((0, 0), (0, p_pad - p), (0, 0)))
            g_ins.append(g2)
        pts_g = pts[:, lo:hi_].reshape(b, (hi_ - lo) * p_pad, 2)
        n = hi_ - lo
        kernel = functools.partial(
            _bwd_kernel_multi, shapes=gshapes,
            border=padding_mode == "border", align_corners=align_corners,
        )
        blk = lambda a: pl.BlockSpec(
            (1,) + a.shape[1:], lambda i: (i,) + (0,) * (a.ndim - 1),
            memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[blk(pts_g)] + [blk(a) for a in f_ins]
            + [blk(a) for a in g_ins],
            out_specs=[
                pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
                for (h, w, c) in gshapes
            ] + [
                pl.BlockSpec((1, p_pad, 2), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
                for _ in gshapes
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, h * w, c), f.dtype)
                for f, (h, w, c) in zip(features[lo:hi_], gshapes)
            ] + [
                jax.ShapeDtypeStruct((b, p_pad, 2), jnp.float32)
                for _ in gshapes
            ],
            interpret=interpret,
        )(pts_g, *f_ins, *g_ins)
        dfs.extend(
            o.reshape(b, h, w, c)
            for o, (h, w, c) in zip(outs[:n], gshapes)
        )
        dpts.extend(outs[n:])

    dpoints = jnp.stack([d[:, :p] for d in dpts], axis=1).reshape(
        b, levels, *batch_shape, 2).astype(points.dtype)
    return tuple(dfs), dpoints


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def sample_project_points_multi(
    features: tuple,
    points: jax.Array,
    projs: tuple,   # per level: (C_l, hd) kernel or None
    biases: tuple,  # per level: (hd,) bias or None (None = no bias)
    padding_mode: str = "zeros",
    align_corners: bool = True,
    interpret: bool = False,
    precision: str = "highest",
) -> tuple:
    """sample_points_multi with an optional IN-KERNEL channel projection
    per level: levels with projs[l] set sample Fp = F @ W + b instead of F
    and return (b, ..., hd). Exactly sample(project(F)) — which for
    border-mode points equals project(sample(F)) including the bias
    (models/lifter.py pre_project). Projected levels must satisfy
    kernel_can_preproject."""
    return _multi_fwd_impl(
        tuple(features), points, tuple(projs), tuple(biases),
        padding_mode=padding_mode, align_corners=align_corners,
        interpret=interpret, precision=precision,
    )


def _multi_proj_fwd(features, points, projs, biases, padding_mode,
                    align_corners, interpret, precision):
    out = _multi_fwd_impl(
        tuple(features), points, tuple(projs), tuple(biases),
        padding_mode=padding_mode, align_corners=align_corners,
        interpret=interpret, precision=precision,
    )
    return out, (tuple(features), points, tuple(projs), tuple(biases))


def _multi_proj_bwd(padding_mode, align_corners, interpret, precision,
                    residuals, grads):
    features, points, projs, biases = residuals

    def ref_fn(feats, pts, pjs, bis):
        outs = []
        for l, f in enumerate(feats):
            if pjs[l] is not None:
                f = jnp.einsum("bhwc,cd->bhwd", f, pjs[l])
                if bis[l] is not None:
                    f = f + bis[l]
            outs.append(grid_sample.grid_sample_points(
                f, pts[:, l], padding_mode=padding_mode,
                align_corners=align_corners,
            ))
        return tuple(outs)

    _, vjp = jax.vjp(ref_fn, features, points, projs, biases)
    return vjp(tuple(grads))


sample_project_points_multi.defvjp(_multi_proj_fwd, _multi_proj_bwd)


# ---------------------------------------------------------------------------
# Fully-fused deformable aggregation: sampling + per-level projection +
# weighted sample pooling in ONE kernel launch.
#
# The unfused composition (sample_points_levels -> per-level Linear -> stack
# -> 6-D weighted einsum) left ~100us/level of pathological layout copies on
# the sampler outputs plus the einsum dispatches (TPU traces, PERF.md). Here
# the projection matmul runs on the (p, C) samples while they are still in
# VMEM and the weighted reduction over the `ns` sample axis is a sublane
# reshape + sum, so only the final pooled (b, L*p*nh, hd) tensor ever reaches
# HBM. Weights enter as their own (P, 1) lane-minor input: packing them into
# the points array's lane dim was measured WORSE (the concat lowered to
# ~0.67 ms of pad/clone ops at batch 128).
# ---------------------------------------------------------------------------


def _aggregate_multi_kernel(pts_ref, wt_ref, *rest, shapes, hd, ns, border,
                            align_corners, precision):
    """pts (1, L*P_pad, 2); wt (1, L*P_pad, 1) per-sample attention weights;
    rest = L feature refs, L projection refs (C_l, hd), L bias refs (1, hd),
    then the output ref (1, L*P_pad/ns, hd)."""
    levels = len(shapes)
    f_refs = rest[:levels]
    w_refs = rest[levels:2 * levels]
    b_refs = rest[2 * levels:3 * levels]
    out_ref = rest[3 * levels]
    p_pad = pts_ref.shape[1] // levels
    o_pad = p_pad // ns
    hi = jax.lax.Precision.HIGHEST
    for l, (h, w, c) in enumerate(shapes):
        pts = pts_ref[0, l * p_pad:(l + 1) * p_pad]  # (P, 2)
        raw = _sample_body(
            pts, f_refs[l][0], h=h, w=w, c=c, border=border,
            align_corners=align_corners, precision=precision,
            two_stage=_use_two_stage(h, w, c), out_dtype=jnp.float32,
        )  # (P, C) f32
        wl = w_refs[l][...]
        bl = b_refs[l][...]
        if precision == "highest":
            proj = jnp.dot(raw, wl.astype(jnp.float32),
                           preferred_element_type=jnp.float32, precision=hi)
        else:
            proj = jnp.dot(raw.astype(jnp.bfloat16), wl.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.DEFAULT)
        proj = proj + bl.astype(jnp.float32)
        wcol = wt_ref[0, l * p_pad:(l + 1) * p_pad].astype(jnp.float32)
        wp = proj * wcol  # (P, 1) lane-broadcast over hd
        pooled = wp.reshape(o_pad, ns, hd).sum(axis=1)
        out_ref[0, l * o_pad:(l + 1) * o_pad] = pooled.astype(out_ref.dtype)


def aggregate_reference(features, points, weights, projs, biases,
                        padding_mode="border", align_corners=True):
    """jnp reference of the fused aggregation (identical math; the VJP path
    and the CPU/"gather" dispatch). Returns (b, L, p, nh*hd)."""
    b = features[0].shape[0]
    _, levels, p, nh, ns_ = weights.shape
    outs = []
    for l, f in enumerate(features):
        raw = grid_sample.grid_sample_points(
            f, points[:, l], padding_mode=padding_mode,
            align_corners=align_corners,
        )  # (b, p, nh*ns, C)
        proj = jnp.dot(raw, projs[l]) + biases[l]
        hd = proj.shape[-1]
        proj = proj.reshape(b, p, nh, ns_, hd)
        pooled = jnp.einsum(
            "bphs,bphsd->bphd", weights[:, l].astype(proj.dtype), proj
        )
        outs.append(pooled.reshape(b, p, nh * hd))
    return jnp.stack(outs, axis=1)


def _aggregate_fwd_impl(features, points, weights, projs, biases, *,
                        padding_mode, align_corners, interpret, precision):
    levels = len(features)
    b = features[0].shape[0]
    _, _, p, nh, ns = weights.shape
    hd = projs[0].shape[-1]
    rows = p * nh * ns
    # pad rows to a sublane multiple that the (o_pad, ns, hd) reshape can
    # split evenly (plain 8 when ns divides 8 — avoids pad ops entirely for
    # the flagship's rows=272)
    mult = 8 if 8 % ns == 0 else 8 * ns
    rows_pad = _round_up(max(rows, 8), mult)

    pts = points.reshape(b, levels, rows, 2)
    wflat = weights.reshape(b, levels, rows, 1).astype(pts.dtype)
    if rows_pad != rows:
        pts = jnp.pad(pts, ((0, 0), (0, 0), (0, rows_pad - rows), (0, 0)))
        wflat = jnp.pad(
            wflat, ((0, 0), (0, 0), (0, rows_pad - rows), (0, 0))
        )
    pts = pts.reshape(b, levels * rows_pad, 2)
    wflat = wflat.reshape(b, levels * rows_pad, 1)

    shapes = tuple(f.shape[1:] for f in features)
    f_ins, f_specs = [], []
    for f in features:
        _, h, w, c = f.shape
        if _use_two_stage(h, w, c):
            f_ins.append(f.reshape(b, h, w * c))
            f_specs.append(pl.BlockSpec((1, h, w * c), lambda i: (i, 0, 0),
                                        memory_space=pltpu.VMEM))
        else:
            f_ins.append(f.reshape(b, h * w, c))
            f_specs.append(pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                                        memory_space=pltpu.VMEM))
    w_specs = [
        pl.BlockSpec(proj.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for proj in projs
    ]
    b_ins = [bb.reshape(1, hd) for bb in biases]
    b_specs = [
        pl.BlockSpec((1, hd), lambda i: (0, 0), memory_space=pltpu.VMEM)
        for _ in biases
    ]

    o_pad = rows_pad // ns
    kernel = functools.partial(
        _aggregate_multi_kernel, shapes=shapes, hd=hd, ns=ns,
        border=padding_mode == "border", align_corners=align_corners,
        precision=precision,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, levels * rows_pad, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, levels * rows_pad, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            *f_specs, *w_specs, *b_specs,
        ],
        out_specs=pl.BlockSpec((1, levels * o_pad, hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, levels * o_pad, hd), features[0].dtype
        ),
        cost_estimate=pl.CostEstimate(
            flops=sum(
                2 * b * rows_pad * (h * w * c + c * hd)
                for (h, w, c) in shapes
            ),
            bytes_accessed=sum(
                b * (h * w * c + rows_pad * 4 + o_pad * hd) * 4
                for (h, w, c) in shapes
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(pts, wflat, *f_ins, *projs, *b_ins)
    out = out.reshape(b, levels, o_pad, hd)
    p_nh = p * nh
    return out[:, :, :p_nh].reshape(b, levels, p, nh * hd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _aggregate_fused(features, points, weights, projs, biases,
                     padding_mode, align_corners, interpret, precision):
    return _aggregate_fwd_impl(
        tuple(features), points, weights, tuple(projs), tuple(biases),
        padding_mode=padding_mode, align_corners=align_corners,
        interpret=interpret, precision=precision,
    )


def _aggregate_fwd(features, points, weights, projs, biases, padding_mode,
                   align_corners, interpret, precision):
    out = _aggregate_fwd_impl(
        tuple(features), points, weights, tuple(projs), tuple(biases),
        padding_mode=padding_mode, align_corners=align_corners,
        interpret=interpret, precision=precision,
    )
    return out, (tuple(features), points, weights, tuple(projs),
                 tuple(biases))


def _aggregate_bwd(padding_mode, align_corners, interpret, precision,
                   residuals, g):
    features, points, weights, projs, biases = residuals
    _, vjp = jax.vjp(
        lambda f, pt, w, pr, bi: aggregate_reference(
            f, pt, w, pr, bi, padding_mode=padding_mode,
            align_corners=align_corners,
        ),
        features, points, weights, projs, biases,
    )
    return vjp(g)


_aggregate_fused.defvjp(_aggregate_fwd, _aggregate_bwd)


def deformable_aggregate(
    features,
    points: jax.Array,   # (b, L, p, nh*ns, 2)
    weights: jax.Array,  # (b, L, p, nh, ns) softmaxed attention weights
    projs,               # L x (C_l, hd) per-level projection kernels
    biases,              # L x (hd,)
    padding_mode: str = "border",
    align_corners: bool = True,
    impl: str = "auto",
    precision: str = "highest",
) -> jax.Array:
    """Fused DeformableBlock aggregation -> (b, L, p, nh*hd).

    Equivalent math (the "gather" dispatch and the training backward):
    per-level grid_sample at `points`, Linear(C_l -> hd) via projs/biases,
    weighted sum over the `ns` sample axis (pose_dformer.py:122-138).

    NOT on the flagship path: measured 20.7 vs 19.2 ms composite against the
    sample_points_levels + Linear + einsum composition at the flagship's
    shapes (batch 128, p=17, nh=ns=4, hd=32) — the copies it was built to
    remove are the packed-offsets -> (P, 2) relayout that both forms pay,
    and the in-kernel projection/pooling epilogue added ~0.35 ms. Kept as a
    tested alternative: at larger point counts or head dims the balance
    shifts toward this fully fused form."""
    if impl == "auto":
        impl = "fused" if jax.default_backend() == "tpu" else "gather"
    if impl == "gather":
        return aggregate_reference(
            tuple(features), points, weights, tuple(projs), tuple(biases),
            padding_mode=padding_mode, align_corners=align_corners,
        )
    if impl in ("fused", "fused_interpret"):
        return _aggregate_fused(
            tuple(features), points, weights, tuple(projs), tuple(biases),
            padding_mode, align_corners, impl == "fused_interpret", precision,
        )
    raise ValueError(impl)


# Scoped VMEM is 16 MB; Mosaic's live ranges run slightly above the obvious
# tensor sizes, so group against a conservative budget. 13 MB keeps the
# flagship HRNet-32 (est. ~7.3 MB) and HRNet-48 (~9.4 MB) in ONE launch and
# splits CPN's all-256-channel pyramid (est. ~15.5 MB, measured 16.28 MB
# scoped OOM as a single call) into [level0][levels1-3].
_VMEM_GROUP_BUDGET = 13 * 2**20


def _vmem_level_groups(shapes, p_pad: int, feat_bytes: int,
                       proj_dims=None, chunk: int = 1) -> list:
    """Greedy contiguous grouping of levels so each fused launch's estimated
    per-program VMEM stays under budget. Estimate mirrors _sample_body's
    live tensors (f32 mixing matrices dominate); a level that alone exceeds
    the budget is emitted alone and left to the real 16 MB limit.
    proj_dims[l] (in-kernel projection to hd lanes) adds the projected
    feature copy and shrinks the sampled output. chunk scales the
    DMA-resident tensors (maps, points, outputs) only — Mosaic reuses the
    per-item plane buffers across the chunk loop (see _batch_chunk)."""
    est = []
    proj2 = _proj2_mode()
    for i, (h, w, c) in enumerate(shapes):
        d = proj_dims[i] if proj_dims else 0
        co = d or c
        # feature + out scale with chunk (block-resident for all items)
        e = chunk * (h * w * c * feat_bytes + p_pad * co * feat_bytes)
        if _use_two_stage(h, w, c) and (not d or proj2 == "fold"):
            # two-stage live set; fold adds the projected selection matrix
            e += p_pad * h * 4 + 2 * p_pad * w * c * 4 + w * c * c * 4
            if d:
                e += w * c * d * 4
        else:
            if d:
                e += h * w * d * 4  # in-kernel projected copy (f32)
            e += 3 * p_pad * h * w * 4  # rowv, colv, m
        est.append(e)
    groups, start, acc = [], 0, 0
    for l, e in enumerate(est):
        if l > start and acc + e > _VMEM_GROUP_BUDGET:
            groups.append((start, l))
            start, acc = l, 0
        acc += e
    groups.append((start, len(est)))
    return groups


def sample_points_levels(
    features,
    points: jax.Array,  # (b, L, ..., 2)
    padding_mode: str = "zeros",
    align_corners: bool = True,
    impl: str = "auto",
    precision: str = "highest",
    projs=None,   # per level: (C_l, hd) kernel or None — pre-sample proj
    biases=None,  # per level: (hd,) bias or None
) -> tuple:
    """Level-set dispatcher: one fused kernel launch on TPU (split into the
    fewest VMEM-feasible launches), per-level jnp gathers elsewhere (same
    dispatch contract as sample_points). Levels with projs[l] set sample
    the projected map F @ W + b (returning hd channels); on the fused path
    the projection runs IN-KERNEL (kernel_can_preproject must hold)."""
    levels = len(features)
    if projs is None:
        projs = (None,) * levels
    if biases is None:
        biases = (None,) * levels
    if impl == "auto":
        impl = "fused" if jax.default_backend() == "tpu" else "gather"
    if impl == "gather":
        outs = []
        for l, f in enumerate(features):
            if projs[l] is not None:
                f = jnp.einsum("bhwc,cd->bhwd", f, projs[l])
                if biases[l] is not None:
                    f = f + biases[l]
            outs.append(grid_sample.grid_sample_points(
                f, points[:, l], padding_mode=padding_mode,
                align_corners=align_corners,
            ))
        return tuple(outs)
    if impl in ("fused", "fused_interpret"):
        p = 1
        for s in points.shape[2:-1]:
            p *= s
        p_pad = _round_up(max(p, 8), 8)
        groups = _vmem_level_groups(
            tuple(f.shape[1:] for f in features), p_pad,
            jnp.dtype(features[0].dtype).itemsize,
            [w.shape[-1] if w is not None else 0 for w in projs],
            chunk=_batch_chunk(features[0].shape[0]),
        )
        outs = []
        for lo, hi in groups:
            if any(w is not None for w in projs[lo:hi]):
                outs.extend(sample_project_points_multi(
                    tuple(features[lo:hi]), points[:, lo:hi],
                    tuple(projs[lo:hi]), tuple(biases[lo:hi]),
                    padding_mode, align_corners,
                    impl == "fused_interpret", precision,
                ))
            else:
                outs.extend(sample_points_multi(
                    tuple(features[lo:hi]), points[:, lo:hi], padding_mode,
                    align_corners, impl == "fused_interpret", precision,
                ))
        return tuple(outs)
    raise ValueError(impl)
