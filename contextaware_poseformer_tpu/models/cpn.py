"""CPN backbone: ResNet-50 + globalNet (FPN) + refineNet, NHWC, frozen-BN.

TPU-native re-design of the reference CPN
(ContextPose/mvn/models/networks/{network,resnet,globalNet,refineNet}.py):

  ResNet-50 -> [x4 2048@/32, x3 1024@/16, x2 512@/8, x1 256@/4]
  globalNet: 1x1 lateral (256ch) per level + top-down x2 bilinear
             (align_corners=True) upsample chain (globalNet.py:61-83)
  refineNet: per-level cascade of `3-i` Bottleneck(128->256) blocks, then
             bilinear resize to the /4 output shape (refineNet.py:46-88)

Returns FOUR 256-channel maps all at /4 resolution (64x48 for 256x192 input)
— deepest level first, matching the reference's refine_fms order consumed by
the lifter (network.py:16-21, pose_dformer.py:179-180).

The globalNet `predict` heads and refineNet `final_predict` exist only in the
COCO checkpoint (their outputs are commented out on the live path,
globalNet.py:73 / refineNet.py:79-87) — the converter skips those keys.

Flax module names are torch parameter prefixes (see backbone_common.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from contextaware_poseformer_tpu.config import BackboneConfig
from contextaware_poseformer_tpu.models.backbone_common import (
    ConvBN,
    max_pool_3x3_s2,
    resize_bilinear_align_corners,
)

RESNET50_LAYERS = (3, 4, 6, 3)
LATERAL_CH = 256
REFINE_PLANES = 128  # refineNet Bottleneck expansion = 2 (refineNet.py:3-13)


class CPN(nn.Module):
    cfg: BackboneConfig
    dtype: Any = jnp.float32

    def _conv(self, name, feat, ks, stride, relu):
        return ConvBN(
            features=feat, kernel_size=ks, stride=stride, relu=relu,
            dtype=self.dtype, quantize=self.cfg.quantize,
            calib_quantile=self.cfg.calib_quantile,
            serve_static_amax=self.cfg.serve_static_amax, name=name,
        )

    def _resnet_bottleneck(self, x, prefix, planes, stride, downsample):
        # torchvision-style: stride on conv2 (resnet.py:60-94)
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
        # refineNet Bottleneck: planes 128, expansion 2, downsample ALWAYS
        # present (refineNet.py:17-21), stride 1 on the live path.
        y = self._conv(f"{prefix}.conv1", REFINE_PLANES, 1, 1, relu=True)(x)
        y = self._conv(f"{prefix}.conv2", REFINE_PLANES, 3, 1, relu=True)(y)
        y = self._conv(f"{prefix}.conv3", REFINE_PLANES * 2, 1, 1, relu=False)(y)
        residual = self._conv(
            f"{prefix}.downsample.0", REFINE_PLANES * 2, 1, 1, relu=False
        )(x)
        return jax.nn.relu(y + residual)

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        """x: (N, H, W, 3) -> 4 maps (N, H/4, W/4, 256), deepest first."""
        # --- ResNet-50 (resnet.py:97-147) ---
        x = ConvBN(
            features=64, kernel_size=7, stride=2, relu=True,
            dtype=self.dtype, name="resnet.conv1",
        )(x)
        x = max_pool_3x3_s2(x)

        feats = []  # [x1 /4, x2 /8, x3 /16, x4 /32]
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
        res_out = feats[::-1]  # [x4, x3, x2, x1] (resnet.py:147)

        # --- globalNet FPN (globalNet.py:61-83) ---
        global_fms = []
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
                # Sequential[Upsample, Conv, BN]: conv at idx 1, bn at idx 2
                up = self._conv(
                    f"global_net.upsamples.{i}.1", LATERAL_CH, 1, 1, relu=False
                )(u)

        # --- refineNet (refineNet.py:46-88) ---
        out_hw = (x.shape[1] * 8, x.shape[2] * 8)  # /4 resolution
        refine_fms = []
        for i in range(4):
            y = global_fms[i]
            for k in range(4 - i - 1):
                y = self._refine_bottleneck(y, f"refine_net.cascade.{i}.{k}")
            if not self.cfg.cpn_native_pyramid:
                # reference: every level materialized at /4 before the
                # lifter samples it (refineNet.py:72-88). The native-pyramid
                # deployment knob skips this — the deformable sampler
                # unnormalizes per-level with align_corners and samples the
                # coarse map directly (config.BackboneConfig docstring for
                # the equivalence analysis / accuracy protocol).
                y = resize_bilinear_align_corners(y, out_hw)
            refine_fms.append(y)
        return refine_fms
