"""Fused LayerNorm -> MLP -> residual-add as a single Pallas TPU kernel.

The lifter's transformer blocks spend more device time on their MLPs than
the FLOPs justify: XLA emits LN-statistic reduces fused into the fc matmuls
(convert_reduce fusions at 30-60 TF/s) plus separate residual adds, with a
full HBM round trip between fc1 and fc2 (trace budget: ~87us/joint block,
~60us/res block, ~75us/context block at batch 128 — PERF.md round 2). Here
the whole residual branch

    y = x + fc2(gelu(fc1(LN(x))))

runs in one VMEM pass per row block: LN statistics on the VPU in fp32, the
two matmuls back to back on the MXU (bf16 single-pass in "default" mode,
fp32 HIGHEST in "highest"), exact-erf GELU between them, residual add in
fp32. No dropout (the lifter's live configs run all drop rates at 0.0,
matching the reference defaults at pose_dformer.py:164-187; callers fall
back to the einsum path otherwise — models/layers.py Mlp).

Forward-only kernel wrapped in jax.custom_vjp; backward runs the jnp
reference formulation (XLA), mirroring ops/small_attention.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _erf(x):
    """erf for the kernel body: Mosaic has no erf lowering, so use the
    Abramowitz & Stegun 7.1.26 rational approximation (max abs error
    1.5e-7 — below fp32 noise for GELU inputs, and ~500x below the bf16
    rounding the deploy matmul stream already carries)."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    # torch nn.GELU default (erf formulation); matches models/layers.gelu
    # up to the _erf approximation error
    return 0.5 * x * (1.0 + _erf(x * (2.0**-0.5)))


def ln_mlp_reference(x, ln_scale, ln_bias, w1, b1, w2, b2, eps):
    """jnp reference: identical math to LayerNorm (flax fast-variance) +
    Mlp + residual; the VJP path and the test oracle."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    h = (xf - mu) * jax.lax.rsqrt(var + eps)
    h = h * ln_scale + ln_bias
    h = h.astype(w1.dtype)
    a = jnp.dot(h, w1, preferred_element_type=jnp.float32) + b1
    g = 0.5 * a * (1.0 + jax.lax.erf(a * (2.0**-0.5)))  # true erf GELU
    out = jnp.dot(g.astype(w2.dtype), w2,
                  preferred_element_type=jnp.float32) + b2
    return (xf + out).astype(x.dtype)


def _kernel(x_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
            *, eps, precision):
    x = x_ref[...].astype(jnp.float32)  # (RB, D)
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean(x * x, axis=1, keepdims=True) - mu * mu
    h = (x - mu) * jax.lax.rsqrt(var + eps)
    h = h * ls_ref[...].astype(jnp.float32) + lb_ref[...].astype(jnp.float32)

    hi = jax.lax.Precision.HIGHEST
    if precision == "highest":
        a = jnp.dot(h, w1_ref[...].astype(jnp.float32),
                    preferred_element_type=jnp.float32, precision=hi)
    else:
        a = jnp.dot(h.astype(jnp.bfloat16), w1_ref[...].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
    g = _gelu_exact(a + b1_ref[...].astype(jnp.float32))
    if precision == "highest":
        o = jnp.dot(g, w2_ref[...].astype(jnp.float32),
                    preferred_element_type=jnp.float32, precision=hi)
    else:
        o = jnp.dot(g.astype(jnp.bfloat16), w2_ref[...].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
    o = o + b2_ref[...].astype(jnp.float32)
    out_ref[...] = (x + o).astype(out_ref.dtype)


def _fwd_impl(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, precision,
              interpret, row_block=512):
    orig_shape = x.shape
    d = x.shape[-1]
    hdim = w1.shape[-1]
    x2 = x.reshape(-1, d)
    r = x2.shape[0]
    rb = min(row_block, _round_up(r, 8))
    rp = _round_up(r, rb)
    if rp != r:
        x2 = jnp.pad(x2, ((0, rp - r), (0, 0)))
    kernel = functools.partial(_kernel, eps=eps, precision=precision)
    out = pl.pallas_call(
        kernel,
        grid=(rp // rb,),
        in_specs=[
            pl.BlockSpec((rb, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hdim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hdim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * rp * d * hdim * 2,
            bytes_accessed=(2 * rp * d + 2 * d * hdim) * 4,
            transcendentals=rp * hdim,
        ),
        interpret=interpret,
    )(
        x2,
        ln_scale.reshape(1, d), ln_bias.reshape(1, d),
        w1, b1.reshape(1, hdim), w2, b2.reshape(1, d),
    )
    return out[:r].reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def ln_mlp_residual(x, ln_scale, ln_bias, w1, b1, w2, b2,
                    eps: float = 1e-6, precision: str = "default",
                    interpret: bool = False):
    """x + fc2(gelu_exact(fc1(LayerNorm(x)))) fused in one kernel.

    x: (..., D); w1 (D, H); w2 (H, D). LN statistics and the residual add
    are fp32 regardless of precision mode.
    """
    return _fwd_impl(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, precision,
                     interpret)


def _fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, precision, interpret):
    out = _fwd_impl(x, ln_scale, ln_bias, w1, b1, w2, b2, eps, precision,
                    interpret)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2)


def _bwd(eps, precision, interpret, residuals, g):
    x, ln_scale, ln_bias, w1, b1, w2, b2 = residuals
    _, vjp = jax.vjp(
        lambda *a: ln_mlp_reference(*a, eps), x, ln_scale, ln_bias, w1, b1,
        w2, b2,
    )
    return vjp(g)


ln_mlp_residual.defvjp(_fwd, _bwd)
