"""PoseLifter: the context-aware lifting transformer.

TPU-native re-design of the reference PoseTransformer
(ContextPose/mvn/models/pose_dformer.py:144-241 for the H36M variant with
deformable context blocks; ContextPose_mpi/model/pose_dformer.py:174-261 for
the 3DHP variant without them).

Token layout: per joint, 1 coordinate token + `levels` feature tokens of dim
`embed_dim_ratio`; pipeline =
  coord embed + per-level reference-point sampling
  -> [deformable context blocks]        (cross-feature-map context, optional)
  -> res blocks over the level axis     (per-joint, seq len = levels+1)
  -> joint blocks over the joint axis   (dim = embed_dim_ratio*(levels+1))
  -> LayerNorm + Linear head -> (b, joints, 3)

All feature maps are NHWC. Sampling uses ops.grid_sample_points with the
reference's exact modes: zeros-padding for reference points
(pose_dformer.py:217), border-padding for deformable offsets
(pose_dformer.py:128), align_corners=True for both.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from contextaware_poseformer_tpu.config import LifterConfig
from contextaware_poseformer_tpu.models.layers import (
    Block,
    DropPath,
    Linear,
    Mlp,
)
from contextaware_poseformer_tpu.ops.deformable import sample_points_levels


def _offset_bias_init(num_heads: int, num_samples: int):
    """Radial sampling-offset init (pose_dformer.py:103-111): head h points in
    direction 2*pi*h/num_heads, normalized to unit Linf, scaled 0.01*(s+1)."""

    thetas = np.arange(num_heads, dtype=np.float64) * (2.0 * math.pi / num_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], axis=-1)  # (nh, 2)
    grid = grid / np.abs(grid).max(axis=-1, keepdims=True)
    grid = 0.01 * np.tile(grid[:, None, :], (1, num_samples, 1))  # (nh, ns, 2)
    grid = grid * (np.arange(num_samples, dtype=np.float64) + 1.0)[None, :, None]
    flat = grid.reshape(-1).astype(np.float32)

    def init(key, shape, dtype=jnp.float32):
        assert shape == flat.shape, (shape, flat.shape)
        return jnp.asarray(flat, dtype)

    return init


class DeformableBlock(nn.Module):
    """Deformable context extraction (pose_dformer.py:82-141).

    For each joint/level/head, predicts `num_samples` softmax weights and 2D
    tanh offsets from the level token; samples the level's feature map at
    ref + offset (border padding); projects each level's samples to head_dim
    and takes the weighted sum; residual + MLP. The coordinate token x_0 is
    excluded from the update but added into the norm input
    (pose_dformer.py:117-120).

    Norm layers use torch's default eps=1e-5 — the reference constructs this
    block without the eps=1e-6 partial (pose_dformer.py:84,202).
    """

    num_heads: int = 4
    num_samples: int = 4
    mlp_ratio: float = 2.0
    drop_path: float = 0.0
    sampler_impl: str = "auto"
    sampler_precision: str = "highest"
    dtype: Any = None
    ln_dtype: Any = jnp.float32
    mlp_impl: str = "einsum"  # see layers.Block
    # project-then-sample: bilinear sampling is linear along the channel
    # axis and border-mode mixing weights sum to 1, so for levels with
    # C_l > head_dim the embed_proj Linear (bias included) can run on the
    # feature map BEFORE sampling — identical math, C_l/head_dim less
    # sampler matmul work (CPN's all-256 pyramid: ~4x; PERF.md round-2
    # session 3). Float-associativity-level differences only; the deploy
    # preset enables it, parity/training configs keep the reference order.
    pre_project: bool = False

    @nn.compact
    def __call__(
        self,
        tokens: jax.Array,  # (b, levels+1, joints, dim)
        ref: jax.Array,  # (b, joints, 2) in [-1, 1]
        features: Sequence[jax.Array],  # level l: (b, H_l, W_l, C_l)
        deterministic: bool = True,
        feat_scales: Sequence[jax.Array] | None = None,  # int8-map dequant
    ) -> jax.Array:
        b, lp1, p, dim = tokens.shape
        levels = lp1 - 1
        assert levels == len(features)
        nh, ns = self.num_heads, self.num_samples
        head_dim = dim // nh

        x0, x = tokens[:, :1], tokens[:, 1:]
        residual = x
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.ln_dtype,
                         name="norm1")(x + x0)

        weights = Linear(
            nh * ns,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="attention_weights",
        )(h).reshape(b, levels, p, nh, ns)
        weights = jax.nn.softmax(weights, axis=-1)

        offsets = Linear(
            2 * nh * ns,
            kernel_init=nn.initializers.zeros,
            bias_init=_offset_bias_init(nh, ns),
            name="sampling_offsets",
        )(h)
        # tanh and the reference-point add happen in the PACKED
        # (b, levels, p, 2*nh*ns) layout: the unpacked (..., ns, 2) layout
        # puts 2 elements on the lane dim and ran the VPU at ~2% utilization
        # (~2.1 ms/step in TPU traces). Packed rows are (sample, xy)
        # row-major, so tiling ref (x, y) nh*ns times lines up exactly; the
        # math is bit-identical to tanh(offsets).reshape(...) + ref.
        pos = jnp.tanh(offsets) + jnp.tile(ref[:, None, :, :], (1, levels, 1, nh * ns))
        pos = pos.reshape(b, levels, p, nh * ns, 2)

        # ONE kernel launch samples all 4 levels (per-dispatch overhead on
        # the small levels dominated their standalone calls). NOTE: a fully
        # fused variant that also runs the embed_proj matmul + weighted
        # pooling inside the kernel exists (ops/deformable.py
        # deformable_aggregate) and measured SLOWER on the flagship
        # composite (20.7 vs 19.2 ms): the ~100us/block copies it targeted
        # are the packed-offsets -> (P, 2) points relayout, which both
        # formulations pay, and the in-kernel epilogue added ~0.35 ms.
        from contextaware_poseformer_tpu.ops.deformable import (
            kernel_can_preproject,
        )

        projs = [
            Linear(head_dim, dtype=self.dtype, name=f"embed_proj_{l}")
            for l in range(levels)
        ]
        pre = [
            self.pre_project
            and kernel_can_preproject(*features[l].shape[1:], head_dim)
            for l in range(levels)
        ]
        wbs = [
            projs[l](features[l], params_only=True) if pre[l] else None
            for l in range(levels)
        ]
        if feat_scales is not None:
            # int8 maps: the sampler returns RAW quantized samples; since
            # sampling and the projection are both linear, the per-level
            # dequant scale folds into the projection KERNEL (bias is
            # unaffected — it adds after the contraction either way)
            wbs = [
                (wb[0] * feat_scales[l], wb[1]) if wb else None
                for l, wb in enumerate(wbs)
            ]
        raw = sample_points_levels(
            features, pos, padding_mode="border", align_corners=True,
            impl=self.sampler_impl, precision=self.sampler_precision,
            projs=[wb[0] if wb else None for wb in wbs],
            biases=[wb[1] if wb else None for wb in wbs],
        )  # tuple of (b, p, nh*ns, C_l or head_dim)
        sampled = [
            raw[l] if pre[l] else projs[l](
                raw[l] if feat_scales is None
                else raw[l] * feat_scales[l].astype(raw[l].dtype)
            )
            for l in range(levels)
        ]
        sampled = jnp.stack(sampled, axis=1)  # (b, levels, p, nh*ns, head_dim)
        sampled = sampled.reshape(b, levels, p, nh, ns, head_dim)
        pooled = jnp.einsum("blphs,blphsd->blphd",
                            weights.astype(sampled.dtype), sampled)
        pooled = pooled.reshape(b, levels, p, dim).astype(residual.dtype)

        x = residual + DropPath(self.drop_path, name="drop_path1")(
            pooled, deterministic
        )
        hidden = int(dim * self.mlp_ratio)
        if self.mlp_impl == "fused" and (deterministic or self.drop_path == 0.0):
            from contextaware_poseformer_tpu.models.layers import (
                _LayerNormParams,
                apply_ln_mlp_residual,
            )

            ls, lb = _LayerNormParams(dim, name="norm2")()
            k1, b1, k2, b2 = Mlp(hidden, dim, 0.0, dtype=self.dtype,
                                 name="mlp")(x, params_only=True)
            x = apply_ln_mlp_residual(
                x, ls, lb, k1, b1, k2, b2, 1e-5, self.dtype
            )
        else:
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.ln_dtype,
                             name="norm2")(x)
            h = Mlp(hidden, dim, 0.0, dtype=self.dtype,
                    name="mlp")(h, deterministic)
            x = x + DropPath(self.drop_path, name="drop_path2")(
                h, deterministic
            )

        return jnp.concatenate([x0, x], axis=1)


class PoseLifter(nn.Module):
    """The lifting net. `cfg.use_deformable` selects H36M (True) vs 3DHP
    (False) variants; `feature_dims` are the backbone's per-level channels."""

    cfg: LifterConfig
    feature_dims: Sequence[int]

    @nn.compact
    def __call__(
        self,
        keypoints_2d: jax.Array,  # (b, joints, 2) full-frame normalized coords
        ref: jax.Array,  # (b, joints, 2) crop coords in [-1, 1] grid space
        features: Sequence[jax.Array],  # NHWC multi-scale maps
        deterministic: bool = True,
        feat_scales: Sequence[jax.Array] | None = None,  # int8-map dequant
    ) -> jax.Array:
        cfg = self.cfg
        b, p, _ = keypoints_2d.shape
        d = cfg.embed_dim_ratio
        levels = cfg.levels
        assert len(features) == levels == len(self.feature_dims)
        # compute dtype for the matmul stream; None = flax default (fp32)
        dtype = None if cfg.compute_dtype == "float32" else jnp.dtype(
            cfg.compute_dtype
        )
        # LayerNorm statistics dtype (head_norm stays fp32 regardless)
        ln_dtype = jnp.dtype(cfg.ln_dtype)

        # stochastic depth decay 0 -> drop_path_rate (pose_dformer.py:187)
        dpr = [
            float(r) for r in np.linspace(0.0, cfg.drop_path_rate, cfg.depth)
        ]

        x = Linear(d, dtype=dtype, name="coord_embed")(keypoints_2d)  # (b,p,d)

        ref_pts = jnp.broadcast_to(ref[:, None], (b, levels, p, 2))
        ref_samples = sample_points_levels(
            features, ref_pts, padding_mode="zeros", align_corners=True,
            impl=cfg.sampler, precision=cfg.sampler_precision,
        )  # tuple of (b, p, C_l)
        if feat_scales is not None:
            # int8 maps: dequantize the 17-point reference samples (tiny —
            # (b, p, C_l) per level, ~0.1% of the map traffic this avoids)
            ref_samples = [
                r * s.astype(r.dtype)
                for r, s in zip(ref_samples, feat_scales)
            ]
        level_tokens = [x]
        for l in range(levels):
            level_tokens.append(
                Linear(d, dtype=dtype, name=f"feat_embed_{l}")(ref_samples[l])
            )
        tokens = jnp.stack(level_tokens, axis=1)  # (b, levels+1, p, d)

        pos_embed = self.param(
            "pos_embed", nn.initializers.zeros, (1, levels + 1, p, d)
        )
        tokens = tokens + pos_embed.astype(tokens.dtype)
        tokens = nn.Dropout(cfg.drop_rate)(tokens, deterministic=deterministic)

        if cfg.use_deformable:
            for i in range(cfg.depth):
                tokens = DeformableBlock(
                    num_heads=cfg.deform_heads,
                    num_samples=cfg.deform_samples,
                    mlp_ratio=cfg.mlp_ratio,
                    drop_path=dpr[i],
                    sampler_impl=cfg.sampler,
                    sampler_precision=cfg.sampler_precision,
                    dtype=dtype,
                    ln_dtype=ln_dtype,
                    mlp_impl=cfg.mlp,
                    pre_project=cfg.sampler_pre_project,
                    name=f"context_block_{i}",
                )(tokens, ref, features, deterministic,
                  feat_scales=feat_scales)

        # per-joint attention over the level axis: (b, l+1, p, d) -> (b*p, l+1, d)
        t = tokens.transpose(0, 2, 1, 3).reshape(b * p, levels + 1, d)
        for i in range(cfg.depth):
            t = Block(
                num_heads=cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio,
                qkv_bias=cfg.qkv_bias,
                drop_rate=cfg.drop_rate,
                attn_drop_rate=cfg.attn_drop_rate,
                drop_path=dpr[i],
                dtype=dtype,
                ln_dtype=ln_dtype,
                attn_impl=cfg.attention,
                mlp_impl=cfg.mlp,
                name=f"res_block_{i}",
            )(t, deterministic)

        # cross-joint attention on concatenated level tokens:
        # (b*p, l+1, d) -> (b, p, (l+1)*d)
        t = t.reshape(b, p, (levels + 1) * d)
        for i in range(cfg.depth):
            t = Block(
                num_heads=cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio,
                qkv_bias=cfg.qkv_bias,
                drop_rate=cfg.drop_rate,
                attn_drop_rate=cfg.attn_drop_rate,
                drop_path=dpr[i],
                dtype=dtype,
                ln_dtype=ln_dtype,
                attn_impl=cfg.attention_joint,
                mlp_impl=cfg.mlp,
                name=f"joint_block_{i}",
            )(t, deterministic)

        # head: LayerNorm (torch default eps=1e-5, pose_dformer.py:205-208);
        # always fp32 for output accuracy
        t = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="head_norm")(t)
        out = Linear(3, name="head")(t)  # (b, p, 3)
        return out
