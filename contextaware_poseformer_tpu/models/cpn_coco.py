"""CPN with its COCO heads and LIVE BatchNorm: the 2D-detector trainer.

The reference ships a CPN COCO train/test harness
(ContextPose/mvn/models/cpn/{train,test,config,test_config}.py) that trains
the 2D detector itself on COCO keypoints — but it is unrunnable there as
shipped (its `networks.network`, `dataloader.mscocoMulti`, `utils.*` imports
are not vendored). This module is the runnable TPU-native equivalent of the
model side:

  ResNet-50 -> globalNet (laterals + predict heads) -> refineNet (cascades
  + final_predict head), all BatchNorms LIVE (training the detector, unlike
  every other path in this repo where the backbone is frozen and BN is
  folded — backbone_common.py ConvBN).

Architecture sources (heads exist in the reference but are commented off
the 3D-lifting path): globalNet predict = Conv1x1+BN+ReLU, Conv3x3->K,
bilinear upsample to output_shape (align_corners=True, globalNet.py:56),
BN(K) (globalNet.py:46-59); refineNet final_predict =
Bottleneck(1024->128->256) + Conv3x3->K + BN(K) (refineNet.py:64-70);
losses/driver contract in mvn/models/cpn/train.py:84-146.

TPU notes:
- BatchNorm batch statistics are computed with plain jnp.mean over the
  batch axis; under jit + GSPMD a DP-sharded batch axis makes these means
  GLOBAL automatically (XLA inserts the cross-device reduction) — the
  SyncBatchNorm the reference would need from torch comes free.
- Param tree is FLAT with torch-prefix names (same rule as models/cpn.py),
  so the public COCO-pretrained CPN checkpoint converts by the same string
  rules — see convert.convert_cpn_coco.
- `train` is a module attribute (construct one module per mode); the param/
  batch_stats trees are identical across modes.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from contextaware_poseformer_tpu.config import BackboneConfig
from contextaware_poseformer_tpu.models.backbone_common import (
    max_pool_3x3_s2,
    resize_bilinear_align_corners,
)

RESNET50_LAYERS = (3, 4, 6, 3)
LATERAL_CH = 256
REFINE_PLANES = 128

# torch BatchNorm2d defaults (reference uses them throughout)
BN_EPS = 1e-5
BN_MOMENTUM = 0.1  # new_running = (1 - m) * running + m * batch


def _conv_init(kernel_size: int, features: int):
    """Reference head init: normal(0, sqrt(2 / (kh*kw*out_ch)))
    (globalNet.py:19-23) == variance_scaling(2, fan_out, normal)."""
    del kernel_size, features
    return nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class BatchNormLive(nn.Module):
    """Live BatchNorm matching torch BatchNorm2d semantics exactly:
    normalization uses the BIASED batch variance; the running-var update
    uses the UNBIASED one (n/(n-1))."""

    features: int
    train: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gamma = self.param("scale", nn.initializers.ones, (self.features,))
        beta = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32),
        )
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32),
        )
        if self.train:
            x32 = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x32, axes)
            mean2 = jnp.mean(jnp.square(x32), axes)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = x.size // self.features
                unbiased = var * (n / max(n - 1, 1))
                m = BN_MOMENTUM
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + BN_EPS) * gamma
        return (
            x * inv.astype(x.dtype)
            + (beta - mean * inv).astype(x.dtype)
        )


class ConvBNLive(nn.Module):
    """Conv2d (no bias) + live BatchNorm + optional ReLU, NHWC.

    The training-mode counterpart of backbone_common.ConvBN (which folds
    FROZEN BN into an affine). Param names: kernel under this module, BN
    under the "bn" child — convert.convert_cpn_coco maps the torch sibling
    BN keys here."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    relu: bool = False
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ks = self.kernel_size
        kernel = self.param(
            "kernel", _conv_init(ks, self.features),
            (ks, ks, x.shape[-1], self.features),
        )
        pad = (ks - 1) // 2
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = BatchNormLive(self.features, train=self.train, name="bn")(y)
        return jax.nn.relu(y) if self.relu else y


class CPNCoco(nn.Module):
    """CPN50 + COCO keypoint heads, live BN.

    __call__(x: (N, H, W, 3) normalized RGB) ->
        (global_outs: 4 x (N, Ho, Wo, K) deepest-level first,
         refine_out:      (N, Ho, Wo, K))
    with (Ho, Wo) = (H/4, W/4) (cpn/config.py output_shape 64x48 for
    256x192 input). `with_fms=True` additionally returns the 4 refine_fms
    (the 3D-lifting features) for parity tests against the frozen CPN."""

    cfg: BackboneConfig
    num_class: int = 17
    train: bool = False
    dtype: Any = jnp.float32

    def _conv(self, name, feat, ks, stride, relu):
        return ConvBNLive(
            features=feat, kernel_size=ks, stride=stride, relu=relu,
            train=self.train, dtype=self.dtype, name=name,
        )

    def _resnet_bottleneck(self, x, prefix, planes, stride, downsample):
        residual = x
        y = self._conv(f"{prefix}.conv1", planes, 1, 1, relu=True)(x)
        y = self._conv(f"{prefix}.conv2", planes, 3, stride, relu=True)(y)
        y = self._conv(f"{prefix}.conv3", planes * 4, 1, 1, relu=False)(y)
        if downsample:
            residual = self._conv(
                f"{prefix}.downsample.0", planes * 4, 1, stride, relu=False
            )(x)
        return jax.nn.relu(y + residual)

    def _refine_bottleneck(self, x, prefix):
        y = self._conv(f"{prefix}.conv1", REFINE_PLANES, 1, 1, relu=True)(x)
        y = self._conv(f"{prefix}.conv2", REFINE_PLANES, 3, 1, relu=True)(y)
        y = self._conv(
            f"{prefix}.conv3", REFINE_PLANES * 2, 1, 1, relu=False
        )(y)
        residual = self._conv(
            f"{prefix}.downsample.0", REFINE_PLANES * 2, 1, 1, relu=False
        )(x)
        return jax.nn.relu(y + residual)

    def _predict_head(self, feature, i, out_hw):
        """globalNet._predict (globalNet.py:46-59): Conv1x1+BN+ReLU,
        Conv3x3->K (no bias), bilinear resize to out_hw with
        align_corners=True (globalNet.py:56), BN(K)."""
        p = f"global_net.predict.{i}"
        y = self._conv(f"{p}.0", LATERAL_CH, 1, 1, relu=True)(feature)
        kernel = self.param(
            f"{p}.3.kernel", _conv_init(3, self.num_class),
            (3, 3, LATERAL_CH, self.num_class),
        )
        y = jax.lax.conv_general_dilated(
            y.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = resize_bilinear_align_corners(y, out_hw)
        return BatchNormLive(
            self.num_class, train=self.train, name=f"{p}.5"
        )(y)

    @nn.compact
    def __call__(self, x: jax.Array, with_fms: bool = False):
        # --- ResNet-50 (shared topology with models/cpn.py) ---
        x = self._conv("resnet.conv1", 64, 7, 2, relu=True)(x)
        x = max_pool_3x3_s2(x)
        feats = []
        planes = (64, 128, 256, 512)
        for li, (p, blocks) in enumerate(zip(planes, self.cfg.cpn_layers)):
            stride = 1 if li == 0 else 2
            x = self._resnet_bottleneck(
                x, f"resnet.layer{li + 1}.0", p, stride, downsample=True
            )
            for b in range(1, blocks):
                x = self._resnet_bottleneck(
                    x, f"resnet.layer{li + 1}.{b}", p, 1, downsample=False
                )
            feats.append(x)
        res_out = feats[::-1]  # deepest first
        out_hw = (res_out[0].shape[1] * 8, res_out[0].shape[2] * 8)  # /4

        # --- globalNet: laterals + top-down + PREDICT heads ---
        global_fms, global_outs = [], []
        up = None
        for i in range(4):
            lat = self._conv(
                f"global_net.laterals.{i}.0", LATERAL_CH, 1, 1, relu=True
            )(res_out[i])
            feature = lat if i == 0 else lat + up
            global_fms.append(feature)
            if i != 3:
                n, h, w, _ = feature.shape
                u = resize_bilinear_align_corners(feature, (2 * h, 2 * w))
                up = self._conv(
                    f"global_net.upsamples.{i}.1", LATERAL_CH, 1, 1,
                    relu=False,
                )(u)
            global_outs.append(self._predict_head(feature, i, out_hw))

        # --- refineNet cascades + final_predict head ---
        refine_fms = []
        for i in range(4):
            y = global_fms[i]
            for k in range(4 - i - 1):
                y = self._refine_bottleneck(y, f"refine_net.cascade.{i}.{k}")
            y = resize_bilinear_align_corners(y, out_hw)
            refine_fms.append(y)
        cat = jnp.concatenate(refine_fms, axis=-1)  # (N, Ho, Wo, 1024)
        y = self._refine_bottleneck(cat, "refine_net.final_predict.0")
        kernel = self.param(
            "refine_net.final_predict.1.kernel",
            _conv_init(3, self.num_class),
            (3, 3, REFINE_PLANES * 2, self.num_class),
        )
        y = jax.lax.conv_general_dilated(
            y.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        refine_out = BatchNormLive(
            self.num_class, train=self.train, name="refine_net.final_predict.2"
        )(y)

        if with_fms:
            return global_outs, refine_out, refine_fms
        return global_outs, refine_out
