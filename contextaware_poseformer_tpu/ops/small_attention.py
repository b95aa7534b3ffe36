"""Fused multi-head self-attention for very short sequences (Pallas TPU).

The lifting net's res blocks attend over 5 level tokens at dim 128
(reference pose_dformer.py:231-235). At that size XLA's standard attention
lowering is dominated by layout traffic, not math: the (R, N, H, hd) head
split forces relayout copies (~65us each, 16 per forward) and the per-head
(N, hd) x (hd, N) score matmuls are far too small for the MXU. Measured on
the flagship composite: ~2.4 ms/step of attention machinery for ~1.4 GFLOP
of real work.

This kernel computes LayerNorm'd-input -> qkv -> softmax(QK^T/sqrt(hd))V ->
proj in ONE VMEM-resident pass per row block with a token-on-lanes layout:

  x block (RB, N*D): token i lives on lanes [i*D, (i+1)*D) — lane slices
  are free, so there is no head or token relayout anywhere.
  qkv_i   = x[:, iD:(i+1)D] @ Wqkv + b      (RB, 3D)   N MXU matmuls
  s_ij    = ((q_i * k_j) @ G) * scale       (RB, H)    per-head sums via a
            block one-hot G[d, h] = (d // hd == h) — a (D, H) matmul
  softmax over j: max/exp/sum trees over the N (RB, H) score tiles
  o_i     = sum_j (a_ij @ G^T) * v_j        (RB, D)    expand + weight
  out_i   = o_i @ Wproj + bproj             lanes [iD, (i+1)D) of the output

Forward-only kernel wrapped in jax.custom_vjp; backward runs the jnp
reference formulation (XLA), mirroring ops/deformable.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def attention_reference(x, wqkv, bqkv, wproj, bproj, num_heads):
    """jnp reference: identical math to models.layers.Attention's core
    (einsum formulation), used for testing and as the VJP path."""
    r, n, d = x.shape
    hd = d // num_heads
    scale = hd**-0.5
    qkv = jnp.dot(x, wqkv) + bqkv
    q = qkv[..., 0 * d:1 * d].reshape(r, n, num_heads, hd)
    k = qkv[..., 1 * d:2 * d].reshape(r, n, num_heads, hd)
    v = qkv[..., 2 * d:3 * d].reshape(r, n, num_heads, hd)
    a = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                   preferred_element_type=jnp.float32) * scale
    a = jax.nn.softmax(a, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhnm,bmhd->bnhd", a, v).reshape(r, n, d)
    return jnp.dot(o, wproj) + bproj


def _attn_kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, out_ref,
                 *, n, d, num_heads):
    x = x_ref[...]  # (RB, N*D)
    wqkv = wqkv_ref[...]  # (D, 3D)
    bqkv = bqkv_ref[...]  # (1, 3D)
    wproj = wproj_ref[...]  # (D, D)
    bproj = bproj_ref[...]  # (1, D)
    hd = d // num_heads
    scale = hd**-0.5
    # ambient-precision leak guard: see joint_attention._kernel
    prec = (jax.lax.Precision.DEFAULT
            if x.dtype == jnp.bfloat16 else None)

    # block one-hot per-head reducer G[d, h] = (d // hd == h)
    gi = jax.lax.broadcasted_iota(jnp.int32, (d, num_heads), 0) // hd
    gj = jax.lax.broadcasted_iota(jnp.int32, (d, num_heads), 1)
    g = jnp.where(gi == gj, 1.0, 0.0).astype(jnp.float32)
    gt = g.T  # (H, D) expander

    qkv = []
    for i in range(n):
        xi = x[:, i * d:(i + 1) * d]
        qkv.append(
            jnp.dot(xi, wqkv, preferred_element_type=jnp.float32,
                    precision=prec) + bqkv
        )  # (RB, 3D) f32

    outs = []
    for i in range(n):
        qi = qkv[i][:, 0 * d:1 * d]
        # scores s_j (RB, H), f32
        scores = []
        for j in range(n):
            kj = qkv[j][:, 1 * d:2 * d]
            s = jnp.dot((qi * kj).astype(jnp.float32), g,
                        preferred_element_type=jnp.float32) * scale
            scores.append(s)
        m = scores[0]
        for j in range(1, n):
            m = jnp.maximum(m, scores[j])
        exps = [jnp.exp(s - m) for s in scores]
        denom = exps[0]
        for j in range(1, n):
            denom = denom + exps[j]
        inv = 1.0 / denom
        acc = jnp.zeros_like(qi)
        for j in range(n):
            vj = qkv[j][:, 2 * d:3 * d]
            aw = jnp.dot(exps[j] * inv, gt,
                         preferred_element_type=jnp.float32)  # (RB, D)
            acc = acc + aw * vj
        o = jnp.dot(acc.astype(wproj.dtype), wproj,
                    preferred_element_type=jnp.float32,
                    precision=prec) + bproj
        outs.append(o)
    out_ref[...] = jnp.concatenate(outs, axis=1).astype(out_ref.dtype)


def _fwd_impl(x, wqkv, bqkv, wproj, bproj, num_heads, interpret,
              row_block=256):
    r, n, d = x.shape
    rp = _round_up(r, row_block)
    x2 = x.reshape(r, n * d)
    if rp != r:
        x2 = jnp.pad(x2, ((0, rp - r), (0, 0)))
    kernel = functools.partial(_attn_kernel, n=n, d=d, num_heads=num_heads)
    out = pl.pallas_call(
        kernel,
        grid=(rp // row_block,),
        in_specs=[
            pl.BlockSpec((row_block, n * d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_block, n * d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, n * d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * rp * n * d * (4 * d + n * (2 + num_heads)),
            bytes_accessed=(2 * rp * n * d + 4 * d * d) * 2,
            transcendentals=rp * n * n * num_heads,
        ),
        interpret=interpret,
    )(x2, wqkv, bqkv.reshape(1, -1), wproj, bproj.reshape(1, -1))
    return out[:r].reshape(r, n, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def small_attention(x, wqkv, bqkv, wproj, bproj, num_heads: int,
                    interpret: bool = False):
    """Fused short-sequence MHA: x (R, N, D) -> (R, N, D).

    Matches attention_reference / models.layers.Attention core math (no
    dropout — the lifter uses drop rates 0.0 on every live config, matching
    the reference's defaults at pose_dformer.py:164-187).
    """
    return _fwd_impl(x, wqkv, bqkv, wproj, bproj, num_heads, interpret)


def _fwd(x, wqkv, bqkv, wproj, bproj, num_heads, interpret):
    out = _fwd_impl(x, wqkv, bqkv, wproj, bproj, num_heads, interpret)
    return out, (x, wqkv, bqkv, wproj, bproj)


def _bwd(num_heads, interpret, residuals, grad):
    x, wqkv, bqkv, wproj, bproj = residuals
    _, vjp = jax.vjp(
        lambda *args: attention_reference(*args, num_heads), x, wqkv, bqkv,
        wproj, bproj,
    )
    return vjp(grad)


small_attention.defvjp(_fwd, _bwd)
