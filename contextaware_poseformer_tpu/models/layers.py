"""Shared transformer layers and torch-compatible initializers.

The lifting net's blocks follow the ViT/timm recipe used by the reference
(ContextPose/mvn/models/pose_dformer.py:15-79). Numeric contracts worth
calling out for checkpoint parity:
- GELU is the exact erf formulation (torch nn.GELU default) — jax.nn.gelu
  defaults to tanh-approximate, so we always pass approximate=False.
- Attention scale is head_dim ** -0.5.
- Default-initialized torch Linears are U(-1/sqrt(fan_in), +1/sqrt(fan_in))
  for both kernel and bias; matching this keeps from-scratch training dynamics
  comparable.
"""

from __future__ import annotations

import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)); linen kernels are (in, out)."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_linear_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


class _DenseParams(nn.Module):
    """Creates nn.Dense-compatible params (same names/shapes/init) without
    applying them — lets fused kernels consume the raw arrays while staying
    checkpoint-compatible with the einsum path."""

    features: int
    fan_in: int
    use_bias: bool
    kernel_init: Callable
    bias_init: Callable

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", self.kernel_init,
                            (self.fan_in, self.features))
        bias = (self.param("bias", self.bias_init, (self.features,))
                if self.use_bias else None)
        return kernel, bias


class Linear(nn.Module):
    """Dense layer with torch-default init (used throughout the lifter).

    `dtype` is the compute dtype (params stay float32); None keeps flax's
    promotion of input/param dtypes (float32 on the parity path).
    With `params_only=True` the call returns (kernel, bias) instead of
    applying — x is still used for fan_in; the param tree is identical.
    """

    features: int
    use_bias: bool = True
    kernel_init: Callable | None = None
    bias_init: Callable | None = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, params_only: bool = False):
        fan_in = x.shape[-1]
        kernel_init = self.kernel_init or torch_linear_kernel_init
        bias_init = self.bias_init or torch_linear_bias_init(fan_in)
        if params_only:
            return _DenseParams(
                features=self.features, fan_in=fan_in,
                use_bias=self.use_bias, kernel_init=kernel_init,
                bias_init=bias_init, name="dense",
            )()
        dense = nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=kernel_init,
            bias_init=bias_init,
            dtype=self.dtype,
            name="dense",
        )
        return dense(x)


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


class _LayerNormParams(nn.Module):
    """nn.LayerNorm-compatible params (same names/shapes/init) without
    applying — for fused kernels that compute the normalization in-kernel
    while staying checkpoint-compatible."""

    dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.dim,)),
            self.param("bias", nn.initializers.zeros, (self.dim,)),
        )


def apply_ln_mlp_residual(x, ls, lb, k1, b1, k2, b2, ln_eps, dtype):
    """x + fc2(gelu(fc1(LN(x)))) through the fused Pallas kernel
    (ops/fused_mlp); parameter arrays come from the params_only modes of
    LayerNorm/Mlp so the tree matches the einsum path exactly."""
    from contextaware_poseformer_tpu.ops.fused_mlp import ln_mlp_residual

    precision = "default" if dtype == jnp.bfloat16 else "highest"
    return ln_mlp_residual(
        x, ls, lb, k1, b1, k2, b2, ln_eps, precision,
        jax.default_backend() != "tpu",
    )


class Mlp(nn.Module):
    """fc1 -> GELU -> drop -> fc2 -> drop (pose_dformer.py:15-31).

    `params_only=True` returns (k1, b1, k2, b2) with the identical param
    tree (fc1/fc2 Linears) for fused-kernel callers.
    """

    hidden_features: int
    out_features: int
    drop_rate: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 params_only: bool = False):
        if params_only:
            k1, b1 = Linear(self.hidden_features, dtype=self.dtype,
                            name="fc1")(x, params_only=True)
            k2, b2 = Linear(self.out_features, dtype=self.dtype, name="fc2")(
                jnp.zeros((1, self.hidden_features), jnp.float32),
                params_only=True,
            )
            return k1, b1, k2, b2
        x = Linear(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = gelu(x)
        x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        x = Linear(self.out_features, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        return x


class Attention(nn.Module):
    """Multi-head self-attention over short token axes (5 levels / 17 joints).

    At these sequence lengths a plain fused einsum is the optimal TPU
    formulation — flash-style tiling has nothing to tile
    (pose_dformer.py:34-59; SURVEY.md section 7 kernel notes).
    """

    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = None
    # "einsum" (XLA, the parity default), "fused" (Pallas pairwise
    # short-sequence kernel — 9.8x on the 5-token res blocks; O(N^2)
    # instructions, loses at N=17), or "grouped" (Pallas head-batched
    # scores/softmax/AV middle for the 17-token joint blocks,
    # ops/joint_attention.py — qkv/proj stay XLA). Both kernels fall back
    # to einsum when attention/proj dropout is active (no rng in-kernel).
    impl: str = "einsum"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, n, c = x.shape
        head_dim = c // self.num_heads
        scale = head_dim**-0.5

        droppable = deterministic or (
            self.attn_drop == 0.0 and self.proj_drop == 0.0
        )
        if self.impl == "grouped" and droppable:
            from contextaware_poseformer_tpu.ops.joint_attention import (
                attention_middle,
            )

            qkv = Linear(c * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                         name="qkv")(x)
            out = attention_middle(
                qkv, self.num_heads, jax.default_backend() != "tpu",
            )
            return Linear(c, dtype=self.dtype, name="proj")(out)

        use_fused = self.impl == "fused" and droppable
        if use_fused:
            from contextaware_poseformer_tpu.ops.small_attention import (
                small_attention,
            )

            kq, bq = Linear(c * 3, use_bias=self.qkv_bias, name="qkv")(
                x, params_only=True
            )
            kp, bp = Linear(c, name="proj")(x, params_only=True)
            dt = self.dtype or x.dtype
            if bq is None:
                bq = jnp.zeros((c * 3,), dt)
            return small_attention(
                x.astype(dt), kq.astype(dt), bq.astype(dt), kp.astype(dt),
                bp.astype(dt), self.num_heads,
                jax.default_backend() != "tpu",  # interpret off-TPU
            )

        qkv = Linear(c * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                     name="qkv")(x)
        # split on the LAST (lane) dim — identical math to the torch
        # reshape(b,n,3,h,d) split (q occupies the first h*d features), but
        # avoids a 5-D relayout copy that cost ~315us/block on TPU traces
        q = qkv[..., 0 * c:1 * c].reshape(b, n, self.num_heads, head_dim)
        k = qkv[..., 1 * c:2 * c].reshape(b, n, self.num_heads, head_dim)
        v = qkv[..., 2 * c:3 * c].reshape(b, n, self.num_heads, head_dim)

        # scores + softmax in fp32 regardless of compute dtype
        attn = jnp.einsum(
            "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
        ) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        attn = attn.astype(v.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
        out = Linear(c, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class DropPath(nn.Module):
    """Stochastic depth: drop the whole residual branch per sample."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0:
            return x
        # Dropout with every non-batch dim broadcast == per-sample DropPath
        # (keep-prob scaling included).
        return nn.Dropout(
            self.rate, broadcast_dims=tuple(range(1, x.ndim))
        )(x, deterministic=deterministic)


class Block(nn.Module):
    """Pre-norm transformer block (pose_dformer.py:62-79). eps=1e-6 via the
    reference's partial(nn.LayerNorm, eps=1e-6) at pose_dformer.py:166."""

    num_heads: int
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path: float = 0.0
    ln_eps: float = 1e-6
    dtype: Any = None
    ln_dtype: Any = jnp.float32
    attn_impl: str = "einsum"
    # "einsum" (XLA LN + Mlp, the parity default) or "fused" (single-kernel
    # LN+MLP+residual, ops/fused_mlp.py; identical param tree). The fused
    # path needs inactive dropout/drop-path — inference, or all rates 0.
    mlp_impl: str = "einsum"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dim = x.shape[-1]
        # LayerNorm statistics always in fp32 (no-op on the fp32 path)
        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.ln_dtype,
                         name="norm1")(x)
        h = Attention(
            self.num_heads,
            qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop_rate,
            proj_drop=self.drop_rate,
            dtype=self.dtype,
            impl=self.attn_impl,
            name="attn",
        )(h, deterministic)
        x = x + DropPath(self.drop_path, name="drop_path1")(h, deterministic)

        hidden = int(dim * self.mlp_ratio)
        use_fused_mlp = self.mlp_impl == "fused" and (
            deterministic or (self.drop_rate == 0.0 and self.drop_path == 0.0)
        )
        if use_fused_mlp:
            # drop_path2 keeps its (empty) spot in the tree via rate-0 usage
            ls, lb = _LayerNormParams(dim, name="norm2")()
            k1, b1, k2, b2 = Mlp(
                hidden, dim, self.drop_rate, dtype=self.dtype, name="mlp"
            )(x, params_only=True)
            return apply_ln_mlp_residual(
                x, ls, lb, k1, b1, k2, b2, self.ln_eps, self.dtype
            )

        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.ln_dtype,
                         name="norm2")(x)
        h = Mlp(
            hidden, dim, self.drop_rate, dtype=self.dtype, name="mlp",
        )(h, deterministic)
        x = x + DropPath(self.drop_path, name="drop_path2")(h, deterministic)
        return x
