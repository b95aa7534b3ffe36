"""Fused softmax-attention MIDDLE for the joint blocks (Pallas TPU).

The lifter's joint blocks attend over 17 joint tokens at dim 640 / 8 heads
(reference pose_dformer.py:236-249). The res-block kernel
(ops/small_attention.py) is PAIRWISE — O(N^2) instruction count — and was
measured to lose at N=17. This kernel uses the head-batched form instead:

  - qkv and the output projection stay in XLA (big clean (B*N, D) matmuls,
    no head split, so no relayout — the lane-thirds split trick of
    models/layers.Attention).
  - The middle (scores -> masked softmax -> AV) runs in Pallas with
    G=8 images per program, tokens padded 17->24 on SUBLANES: per head,
    ONE (G*24, hd) x (hd, G*24) MXU matmul computes all G images' score
    blocks at once (off-diagonal image pairs are masked to -inf — a G-fold
    MAC overspend that buys one big matmul instead of G*H tiny ones), then
    a masked fp32 softmax and one (G*24, G*24) x (G*24, hd) AV matmul.

Forward-only Pallas; jax.custom_vjp backward runs the einsum reference
(mirrors ops/small_attention.py / ops/deformable.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SEG = 24  # 17 tokens padded to a sublane multiple
GROUP = 8  # images per program


def attention_middle_reference(qkv, num_heads):
    """(B, N, 3D) qkv -> (B, N, D) softmax(QK^T/sqrt(hd))V, einsum form
    (identical math to models.layers.Attention's core)."""
    b, n, d3 = qkv.shape
    d = d3 // 3
    hd = d // num_heads
    q = qkv[..., 0 * d:1 * d].reshape(b, n, num_heads, hd)
    k = qkv[..., 1 * d:2 * d].reshape(b, n, num_heads, hd)
    v = qkv[..., 2 * d:3 * d].reshape(b, n, num_heads, hd)
    a = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                   preferred_element_type=jnp.float32) * (hd**-0.5)
    a = jax.nn.softmax(a, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", a, v).reshape(b, n, d)


def _kernel(qkv_ref, out_ref, *, n, d, num_heads):
    blk = qkv_ref[...]  # (GROUP*SEG, 3D)
    # pin contract precision for low-precision operands: the ambient
    # jax_default_matmul_precision must not leak into the kernel (Mosaic
    # rejects bf16 operands with an fp32 contract request; observed on
    # hardware via conftest's global "highest", round-3 smoke run)
    prec = (jax.lax.Precision.DEFAULT
            if blk.dtype == jnp.bfloat16 else None)
    rows = blk.shape[0]
    hd = d // num_heads
    scale = hd**-0.5

    ri = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    rj = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    # same image AND a real (unpadded) key token
    mask = (ri // SEG == rj // SEG) & (rj % SEG < n)
    neg = jnp.float32(-1e30)

    outs = []
    for h in range(num_heads):
        q = blk[:, 0 * d + h * hd:0 * d + (h + 1) * hd]
        k = blk[:, 1 * d + h * hd:1 * d + (h + 1) * hd]
        v = blk[:, 2 * d + h * hd:2 * d + (h + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ) * scale
        s = jnp.where(mask, s, neg)
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        a = e / jnp.sum(e, axis=1, keepdims=True)
        outs.append(jnp.dot(
            a.astype(v.dtype), v, preferred_element_type=jnp.float32,
            precision=prec,
        ))
    out_ref[...] = jnp.concatenate(outs, axis=1).astype(out_ref.dtype)


def _fwd_impl(qkv, num_heads, interpret):
    b, n, d3 = qkv.shape
    d = d3 // 3
    assert n <= SEG, (n, SEG)
    bp = ((b + GROUP - 1) // GROUP) * GROUP
    q2 = jnp.pad(qkv, ((0, bp - b), (0, SEG - n), (0, 0)))
    q2 = q2.reshape(bp * SEG, d3)
    rows = GROUP * SEG
    out = pl.pallas_call(
        functools.partial(_kernel, n=n, d=d, num_heads=num_heads),
        grid=(bp // GROUP,),
        in_specs=[
            pl.BlockSpec((rows, d3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp * SEG, d), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bp * SEG * rows * d,
            bytes_accessed=(bp * SEG * (d3 + d)) * 2,
            transcendentals=bp * SEG * rows * num_heads,
        ),
        interpret=interpret,
    )(q2)
    return out.reshape(bp, SEG, d)[:b, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def attention_middle(qkv, num_heads: int, interpret: bool = False):
    """qkv (B, N, 3D) -> attention output (B, N, D), N <= 24."""
    return _fwd_impl(qkv, num_heads, interpret)


def _fwd(qkv, num_heads, interpret):
    return _fwd_impl(qkv, num_heads, interpret), (qkv,)


def _bwd(num_heads, interpret, residuals, g):
    (qkv,) = residuals
    _, vjp = jax.vjp(lambda q: attention_middle_reference(q, num_heads), qkv)
    return vjp(g)


attention_middle.defvjp(_fwd, _bwd)
