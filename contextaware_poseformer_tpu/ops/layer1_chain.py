"""Fused int8 layer1 bottleneck chain — one Pallas launch for all 4 blocks.

Replaces the XLA graph of HRNet._layer1_int8 (models/hrnet.py) at inference
under quantize="serve". The XLA e2e-int8 path still round-trips every
inter-conv tensor through HBM (conv3's requant ops alone move ~225 MB each
and measured 430-444 us, 63% of their own roofline; 2.25 ms for the chain —
PERF.md round-2 budget). This kernel keeps the whole 4-block chain for one
image resident in VMEM: HBM is touched once for the bf16 stem tensor in and
once for the int8 output, everything between lives on-chip.

Reference semantics: ContextPose/mvn/models/pose_hrnet.py:98-136 Bottleneck
x4 (layer1, planes=64, expansion 4), quantized exactly as the XLA path in
backbone_common.ConvBN(x_quant=...) + HRNet._layer1_int8: int8 conv ->
int32 acc -> bf16 affine (eff_scale = scale*wscale*amax/127, bias) -> relu
-> f32 round/clip requant with static calibrated per-tensor scales. All
rounding points (bf16 converts, f32 round-half-even) mirror the XLA ops so
outputs agree to the last int8 LSB modulo accumulation-order-free int
matmuls (exact) and bf16 fma ordering.

Layout: grid=(B,), one image per program, rows = H*W pixels, lanes = C —
the arrays cross the pallas_call boundary as batch-major 2D (B*H*W, C)
views of NHWC (a free reshape in row-major; the custom call pins default
layouts and XLA's layout assignment lets the neighbouring convs
produce/consume them directly — per-image (m, 1, C) blocking of an
(m, B, C) view is rejected by Mosaic's block-shape rules). The 3x3 conv2
runs as 3 dy-band matmuls on a 192-lane dx-window (built in f32 — Mosaic
has no bf16/int8 single-row roll); dy shifts of the int8 window use the
int32-bitcast roll (exact for multiples of 4 rows,
experiments/int8_primitives.py), which requires W % 4 == 0.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PLANES = 64
EXP = 256  # planes * expansion(4)


def _quant(t_f32: jax.Array, scale) -> jax.Array:
    """clip(round(t * (127/amax))) -> int8; mirrors HRNet._layer1_int8."""
    return jnp.clip(jnp.round(t_f32 * scale), -127, 127).astype(jnp.int8)


def _kernel(
    x_ref, w1_0, w1_r, w2, w3, wds, s1, b1, s2, b2, s3, b3, sds, bds,
    sca, out_ref, *, h: int, w: int,
):
    """sca (SMEM f32): [qin, rq1 x4, rq2 x4, rqout x4, deq x4] = (17,)."""
    m = h * w
    qin = sca[0]

    # masks reused across blocks
    col = jax.lax.broadcasted_iota(jnp.int32, (m, PLANES), 0) % w
    left_edge = col == 0
    right_edge = col == w - 1
    row256 = jax.lax.broadcasted_iota(jnp.int32, (m, PLANES), 0)
    top = row256 < w
    bot = row256 >= m - w
    fzero = jnp.zeros((m, PLANES), jnp.float32)

    x = x_ref[...]  # (m, 64) bf16 stem output
    xq0 = _quant(x.astype(jnp.float32), qin)

    xq = xq0  # block input, int8; (m,64) for block0 then (m,256)
    for i in range(4):
        rq1, rq2, rqo = sca[1 + i], sca[5 + i], sca[9 + i]
        # conv1 1x1 -> t1 (m, 64)
        wk = w1_0[...] if i == 0 else w1_r[i - 1]
        acc = jnp.dot(xq, wk, preferred_element_type=jnp.int32,
                      precision=jax.lax.Precision.DEFAULT)
        y1 = jnp.maximum(acc.astype(jnp.bfloat16) * s1[i] + b1[i], 0)

        # conv2 3x3 via dx-window + 3 dy-band matmuls
        yf = y1.astype(jnp.float32)
        left = jnp.where(left_edge, fzero, pltpu.roll(yf, 1, 0))
        right = jnp.where(right_edge, fzero, pltpu.roll(yf, m - 1, 0))
        xw = _quant(jnp.concatenate([left, yf, right], 1), rq1)  # (m,192)
        x32 = pltpu.bitcast(xw, jnp.int32)
        up_op = pltpu.bitcast(pltpu.roll(x32, w // 4, 0), jnp.int8)
        dn_op = pltpu.bitcast(
            pltpu.roll(x32, x32.shape[0] - w // 4, 0), jnp.int8)
        acc = jnp.dot(xw, w2[i, 1], preferred_element_type=jnp.int32,
                      precision=jax.lax.Precision.DEFAULT)
        acc += jnp.where(
            top, 0, jnp.dot(up_op, w2[i, 0], preferred_element_type=jnp.int32,
                      precision=jax.lax.Precision.DEFAULT))
        acc += jnp.where(
            bot, 0, jnp.dot(dn_op, w2[i, 2], preferred_element_type=jnp.int32,
                      precision=jax.lax.Precision.DEFAULT))
        y2 = jnp.maximum(acc.astype(jnp.bfloat16) * s2[i] + b2[i], 0)
        t2q = _quant(y2.astype(jnp.float32), rq2)

        # conv3 1x1 -> (m, 256), residual add, relu, requant
        acc = jnp.dot(t2q, w3[i], preferred_element_type=jnp.int32,
                      precision=jax.lax.Precision.DEFAULT)
        y3 = acc.astype(jnp.bfloat16) * s3[i] + b3[i]
        if i == 0:
            accd = jnp.dot(xq0, wds[...], preferred_element_type=jnp.int32,
                      precision=jax.lax.Precision.DEFAULT)
            res = accd.astype(jnp.bfloat16) * sds[0] + bds[0]
        else:
            res = xq.astype(jnp.bfloat16) * sca[13 + i].astype(jnp.bfloat16)
        o = jnp.maximum(y3 + res, 0)
        xq = _quant(o.astype(jnp.float32), rqo)

    out_ref[...] = xq


def layer1_chain(
    x: jax.Array, pack: dict[str, Any], *, interpret: bool | None = None,
) -> jax.Array:
    """x: (B, H, W, 64) bf16 stem output -> (B, H, W, 256) int8.

    pack: stacked pre-quantized weights + bf16 affine rows + f32 scalars
    (built by HRNet._layer1_int8; see _pack_layer1 there).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, cin = x.shape
    assert cin == PLANES and w % 4 == 0, (cin, w)
    m = h * w
    x_t = x.reshape(b * m, cin)  # batch-major 2D, free in row-major NHWC

    full = lambda a: pl.BlockSpec(a.shape, lambda i, nd=a.ndim: (0,) * nd)
    out = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((m, cin), lambda i: (i, 0)),
            full(pack["w1_0"]), full(pack["w1_r"]), full(pack["w2"]),
            full(pack["w3"]), full(pack["wds"]),
            full(pack["s1"]), full(pack["b1"]), full(pack["s2"]),
            full(pack["b2"]), full(pack["s3"]), full(pack["b3"]),
            full(pack["sds"]), full(pack["bds"]),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((m, EXP), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * m, EXP), jnp.int8),
        interpret=interpret,
    )(
        x_t, pack["w1_0"], pack["w1_r"], pack["w2"], pack["w3"], pack["wds"],
        pack["s1"], pack["b1"], pack["s2"], pack["b2"], pack["s3"],
        pack["b3"], pack["sds"], pack["bds"], pack["sca"],
    )
    return out.reshape(b, h, w, EXP)
