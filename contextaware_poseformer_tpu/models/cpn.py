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


def _quant_i8(t: jax.Array, amax: jax.Array) -> jax.Array:
    """Symmetric per-tensor int8 quantization with a static amax scale.

    Elementwise only — XLA fuses it into the producing convolution's
    epilogue, so under the e2e stream the float tensor never reaches HBM.
    """
    return jnp.clip(
        jnp.round(t.astype(jnp.float32) * (127.0 / amax)), -127, 127
    ).astype(jnp.int8)


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

    # --- end-to-end int8 stream (quantize="serve" + cpn_int8_stream) ------
    #
    # The layer1 recipe from models/hrnet.py:71 generalized to every
    # bottleneck chain in this backbone: between blocks only int8 tensors
    # touch HBM (static calibrated scales), the residual skip dequantizes
    # in-register, and each block output requantizes inside the producing
    # conv's fusion. During calibration (mutable "calib") the model runs
    # the standard serve graph (wide convs dynamic int8, narrow convs
    # float) while observing max|t| at every chain point — the observed
    # scales describe the same tensors the per-conv serve graph computes.

    def _stream_on(self) -> bool:
        return (
            self.cfg.quantize == "serve"
            and self.cfg.cpn_int8_stream
            and not self.is_mutable_collection("calib")
        )

    def _cvar(self, name):
        return self.variable("calib", name, lambda: jnp.zeros((), jnp.float32))

    def _observe(self, var, t):
        from contextaware_poseformer_tpu.models.backbone_common import (
            observed_amax,
        )

        var.value = jnp.maximum(
            var.value, observed_amax(t, self.cfg.calib_quantile)
        )

    def _stream_calibrating(self) -> bool:
        return (
            self.cfg.quantize == "serve"
            and self.cfg.cpn_int8_stream
            and self.is_mutable_collection("calib")
        )

    def _resnet_bottleneck(self, x, prefix, planes, stride, downsample):
        # torchvision-style: stride on conv2 (resnet.py:60-94)
        calibrating = self._stream_calibrating()
        residual = x
        y = self._conv(f"{prefix}.conv1", planes, 1, 1, relu=True)(x)
        if calibrating:
            self._observe(self._cvar(f"{prefix}.t1_amax"), y)
        y = self._conv(f"{prefix}.conv2", planes, 3, stride, relu=True)(y)
        if calibrating:
            self._observe(self._cvar(f"{prefix}.t2_amax"), y)
        y = self._conv(f"{prefix}.conv3", planes * 4, 1, 1, relu=False)(y)
        if downsample:
            residual = self._conv(
                f"{prefix}.downsample.0", planes * 4, 1, stride, relu=False
            )(x)
        out = jax.nn.relu(y + residual)
        if calibrating:
            self._observe(self._cvar(f"{prefix}.out_amax"), out)
        return out

    def _resnet_bottleneck_i8(self, xq, amax, prefix, planes, stride,
                              downsample, quant_out=True):
        """Bottleneck on an int8 (xq, amax) pair; returns the same."""
        t1 = jnp.maximum(self._cvar(f"{prefix}.t1_amax").value, 1e-12)
        t2 = jnp.maximum(self._cvar(f"{prefix}.t2_amax").value, 1e-12)
        y = self._conv(f"{prefix}.conv1", planes, 1, 1, relu=True)(
            None, x_quant=(xq, amax))
        y = self._conv(f"{prefix}.conv2", planes, 3, stride, relu=True)(
            None, x_quant=(_quant_i8(y, t1), t1))
        y = self._conv(f"{prefix}.conv3", planes * 4, 1, 1, relu=False)(
            None, x_quant=(_quant_i8(y, t2), t2))
        if downsample:
            res = self._conv(
                f"{prefix}.downsample.0", planes * 4, 1, stride, relu=False
            )(None, x_quant=(xq, amax))
        else:
            res = xq.astype(y.dtype) * (amax / 127.0).astype(y.dtype)
        out = jax.nn.relu(y + res)
        if not quant_out:
            return out, None
        out_a = jnp.maximum(self._cvar(f"{prefix}.out_amax").value, 1e-12)
        return _quant_i8(out, out_a), out_a

    def _refine_bottleneck(self, x, prefix):
        # refineNet Bottleneck: planes 128, expansion 2, downsample ALWAYS
        # present (refineNet.py:17-21), stride 1 on the live path.
        calibrating = self._stream_calibrating()
        y = self._conv(f"{prefix}.conv1", REFINE_PLANES, 1, 1, relu=True)(x)
        if calibrating:
            self._observe(self._cvar(f"{prefix}.t1_amax"), y)
        y = self._conv(f"{prefix}.conv2", REFINE_PLANES, 3, 1, relu=True)(y)
        if calibrating:
            self._observe(self._cvar(f"{prefix}.t2_amax"), y)
        y = self._conv(f"{prefix}.conv3", REFINE_PLANES * 2, 1, 1, relu=False)(y)
        residual = self._conv(
            f"{prefix}.downsample.0", REFINE_PLANES * 2, 1, 1, relu=False
        )(x)
        out = jax.nn.relu(y + residual)
        if calibrating:
            self._observe(self._cvar(f"{prefix}.out_amax"), out)
        return out

    def _refine_bottleneck_i8(self, xq, amax, prefix, quant_out):
        t1 = jnp.maximum(self._cvar(f"{prefix}.t1_amax").value, 1e-12)
        t2 = jnp.maximum(self._cvar(f"{prefix}.t2_amax").value, 1e-12)
        y = self._conv(f"{prefix}.conv1", REFINE_PLANES, 1, 1, relu=True)(
            None, x_quant=(xq, amax))
        y = self._conv(f"{prefix}.conv2", REFINE_PLANES, 3, 1, relu=True)(
            None, x_quant=(_quant_i8(y, t1), t1))
        y = self._conv(f"{prefix}.conv3", REFINE_PLANES * 2, 1, 1, relu=False)(
            None, x_quant=(_quant_i8(y, t2), t2))
        res = self._conv(
            f"{prefix}.downsample.0", REFINE_PLANES * 2, 1, 1, relu=False
        )(None, x_quant=(xq, amax))
        out = jax.nn.relu(y + res)
        if not quant_out:
            return out, None
        out_a = jnp.maximum(self._cvar(f"{prefix}.out_amax").value, 1e-12)
        return _quant_i8(out, out_a), out_a

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        """x: (N, H, W, 3) normalized float -> 4 maps (N, H/4, W/4, 256),
        deepest first. Under cpn_fold_normalize (serve), x may instead be
        RAW uint8 BGR frames — dtype dispatch keeps float callers on the
        reference graph."""
        # --- ResNet-50 (resnet.py:97-147) ---
        fold = (
            self.cfg.quantize == "serve"
            and self.cfg.cpn_fold_normalize
            and x.dtype == jnp.uint8
        )
        conv1 = ConvBN(
            features=64, kernel_size=7, stride=2, relu=not fold,
            dtype=self.dtype, name="resnet.conv1",
        )
        if fold:
            # normalize folded into the stem conv (config.BackboneConfig
            # cpn_fold_normalize): x_norm = (u8_rgb - pixel_mean)/255
            #   = s8/255 + c,  s8 = u8 - 128 (exact via ^0x80 bitcast),
            #   c = (128 - pixel_mean)/255 per RGB channel.
            # conv(x_norm) = conv(s8)/255 + conv(c * valid_mask): the first
            # term is an s8 x int8-weight conv with dequant amax 127/255
            # (ConvBN folds it into the BN affine); the second is the conv
            # of the constant offset image under the SAME zero padding — a
            # batch-1 (H/2, W/2, 64) bias map that is exact including the
            # border ring where zero padding breaks translation invariance.
            from contextaware_poseformer_tpu.data.augment import (
                CPN_PIXEL_MEAN,
            )

            s8 = jax.lax.bitcast_convert_type(
                x ^ jnp.uint8(0x80), jnp.int8
            )[..., ::-1]  # BGR -> RGB on the 1-byte view
            c_off = (
                128.0 - jnp.asarray(CPN_PIXEL_MEAN, jnp.float32)
            ) / 255.0
            cimg = jnp.broadcast_to(c_off, (1,) + x.shape[1:3] + (3,))
            bias_map = conv1(cimg.astype(jnp.float32), raw=True)
            ys = conv1(None, x_quant=(s8, jnp.float32(127.0 / 255.0)))
            x = jax.nn.relu(ys + bias_map)
        else:
            x = conv1(x)

        stream = self._stream_on()
        calibrating = self._stream_calibrating()
        if calibrating:
            # observe the PRE-pool stem (the stream graph quantizes there);
            # max-pool commutes with the monotone quantize, so the pooled
            # int8 tensor is exactly quant(pool(x)) under the same scale.
            self._observe(self._cvar("resnet.in_amax"), x)

        feats = []  # [x1 /4, x2 /8, x3 /16, x4 /32]; int8 pairs when stream
        planes = (64, 128, 256, 512)
        if stream:
            # quantize BEFORE the pool: the stem conv's 201 MB bf16 output
            # (batch 128) and the pool's read of it were the two biggest
            # HBM movers after the int8 stream landed (round-4 trace:
            # fusion.302 389 us + reduce_window 310 us/iter) — s8 halves
            # both passes; the pool runs on s8 (exact, see max_pool_3x3_s2).
            in_a = jnp.maximum(self._cvar("resnet.in_amax").value, 1e-12)
            xq = max_pool_3x3_s2(_quant_i8(x, in_a))
            amax = in_a
            for li, (p, blocks) in enumerate(
                zip(planes, self.cfg.cpn_layers)
            ):
                stride = 1 if li == 0 else 2
                xq, amax = self._resnet_bottleneck_i8(
                    xq, amax, f"resnet.layer{li + 1}.0", p, stride,
                    downsample=True,
                )
                for b in range(1, blocks):
                    xq, amax = self._resnet_bottleneck_i8(
                        xq, amax, f"resnet.layer{li + 1}.{b}", p, 1,
                        downsample=False,
                    )
                feats.append((xq, amax))
        else:
            x = max_pool_3x3_s2(x)
            for li, (p, blocks) in enumerate(
                zip(planes, self.cfg.cpn_layers)
            ):
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
            lat_conv = self._conv(
                f"global_net.laterals.{i}.0", LATERAL_CH, 1, 1, relu=True
            )
            if stream:
                # consume the stage's int8 tensor directly — the lateral
                # shares the residual stream's quantized input
                lat = lat_conv(None, x_quant=res_out[i])
            else:
                lat = lat_conv(res_out[i])
            feature = lat if i == 0 else lat + up
            global_fms.append(feature)
            if i != 3:
                n, h, w, _ = feature.shape
                # Sequential[Upsample, Conv, BN]: conv at idx 1, bn at idx 2
                up_conv = self._conv(
                    f"global_net.upsamples.{i}.1", LATERAL_CH, 1, 1, relu=False
                )
                if self.cfg.quantize == "serve":
                    # serve graphs run the 1x1 conv BEFORE the x2 upsample:
                    # a pointwise-linear map commutes exactly with bilinear
                    # interpolation (conv(resize(x)) == resize(conv(x)) up
                    # to fp rounding), so the conv does 4x fewer MACs and
                    # reads/writes the small map — the reference order
                    # (upsamples.2.1 at /4) was the single biggest op in the
                    # round-4 CPN trace (585 us/iter incl. fused quantize).
                    # Training/parity keep the reference order
                    # (globalNet.py:61-83). Calibration observes this same
                    # graph, so serve scales stay self-consistent.
                    pre = up_conv(feature)
                    topdown = self.cfg.cpn_int8_topdown
                    if calibrating and topdown:
                        self._observe(
                            self._cvar(f"global_net.topdown.{i}_amax"), pre
                        )
                    if stream and topdown:
                        # s8 top-down READ side (config.cpn_int8_topdown):
                        # requantize in the up-conv epilogue (fuses — the
                        # int8-stream mechanism), so the resize dots READ
                        # s8 and dequantize via the scalar after the blend
                        # (align-corners weights are convex: values stay
                        # in [-127,127]); the scalar multiply fuses into
                        # the consumer's lateral add. The blend OUTPUT
                        # stays bf16: the round-5 full-s8 variant (post-
                        # blend requant) measured -3.60% device — XLA
                        # refuses the round/clip/convert epilogue on the
                        # col-interp dot and emits 603us of standalone
                        # clamp_convert passes over the largest tensors
                        # (PERF.md round-5 page).
                        ua = jnp.maximum(
                            self._cvar(
                                f"global_net.topdown.{i}_amax"
                            ).value,
                            1e-12,
                        )
                        ub = resize_bilinear_align_corners(
                            _quant_i8(pre, ua).astype(self.dtype),
                            (2 * h, 2 * w),
                        )
                        up = ub * (ua / 127.0).astype(self.dtype)
                    else:
                        up = resize_bilinear_align_corners(
                            pre, (2 * h, 2 * w)
                        )
                else:
                    u = resize_bilinear_align_corners(feature, (2 * h, 2 * w))
                    up = up_conv(u)

        # --- refineNet (refineNet.py:46-88) ---
        # int8 maps: hand the lifter (s8 map, dequant scale) pairs instead
        # of bf16 maps — levels WITH cascade blocks reuse the last block's
        # calibrated out_amax (already observed for every block); the
        # cascade-free /4 level gets its own observation point. Requires
        # the native pyramid (the align-corners resize would have to run on
        # dequantized values, recreating the float map this knob removes).
        int8_maps = (
            stream and self.cfg.cpn_int8_maps and self.cfg.cpn_native_pyramid
        )
        hh = global_fms[-1].shape[1]  # /4 level height
        out_hw = (hh, global_fms[-1].shape[2])
        refine_fms = []
        scales = []
        for i in range(4):
            y = global_fms[i]
            yq = ya = None
            n_blocks = 4 - i - 1
            if calibrating and n_blocks:
                self._observe(
                    self._cvar(f"refine_net.cascade.{i}.in_amax"), y
                )
            if calibrating and self.cfg.cpn_int8_maps and not n_blocks:
                self._observe(self._cvar(f"refine_net.feature{i}_amax"), y)
            if stream and n_blocks:
                in_a = jnp.maximum(
                    self._cvar(f"refine_net.cascade.{i}.in_amax").value,
                    1e-12,
                )
                yq, ya = _quant_i8(y, in_a), in_a
                for k in range(n_blocks):
                    last = k == n_blocks - 1
                    out = self._refine_bottleneck_i8(
                        yq, ya, f"refine_net.cascade.{i}.{k}",
                        quant_out=(not last) or int8_maps,
                    )
                    if last and not int8_maps:
                        y = out[0]
                    else:
                        yq, ya = out
            else:
                for k in range(n_blocks):
                    y = self._refine_bottleneck(
                        y, f"refine_net.cascade.{i}.{k}"
                    )
            if int8_maps and not n_blocks:
                a = jnp.maximum(
                    self._cvar(f"refine_net.feature{i}_amax").value, 1e-12
                )
                yq, ya = _quant_i8(y, a), a
            if not self.cfg.cpn_native_pyramid:
                # reference: every level materialized at /4 before the
                # lifter samples it (refineNet.py:72-88). The native-pyramid
                # deployment knob skips this — the deformable sampler
                # unnormalizes per-level with align_corners and samples the
                # coarse map directly (config.BackboneConfig docstring for
                # the equivalence analysis / accuracy protocol).
                y = resize_bilinear_align_corners(y, out_hw)
            if int8_maps:
                refine_fms.append(yq)
                scales.append((ya / 127.0).astype(jnp.float32))
            else:
                refine_fms.append(y)
        if int8_maps:
            return refine_fms, scales
        return refine_fms
