"""ContextAwarePoseFormer: the composite single-frame 3D pose model.

Equivalent of the reference CA_PF (ContextPose/mvn/models/conpose.py:10-42)
and its 3DHP twin VolumetricTriangulationNet (ContextPose_mpi/model/
conpose.py:15-42): frozen 2D backbone -> multi-scale features -> context-aware
lifting transformer -> root-relative 3D joints.

Differences from the reference, by design:
- images are NHWC float (normalization happens in the jit'd input pipeline,
  not here — see data/augment.py), no NCHW permute;
- returns (b, joints, 3); drivers add singleton axes where their metric code
  expects them;
- crop-coordinate normalization `xy / (image_wh/2) - 1` (conpose.py:34-35,
  integer-division halves) is computed from the configured image shape instead
  of hard-coded 96/128.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from contextaware_poseformer_tpu.config import ModelConfig
from contextaware_poseformer_tpu.models.hrnet import HRNet
from contextaware_poseformer_tpu.models.lifter import PoseLifter


def crop_coords_to_grid(kpts_crop: jax.Array, image_shape: tuple[int, int]) -> jax.Array:
    """Crop-pixel keypoints -> [-1, 1] grid coords (conpose.py:34-35).

    image_shape is (H, W); the reference divides by (W//2, H//2) then
    subtracts 1.
    """
    h, w = image_shape
    half = jnp.asarray([w // 2, h // 2], dtype=kpts_crop.dtype)
    return kpts_crop / half - 1.0


def prepare_serving(model, variables: dict, example_args, batches=None) -> dict:
    """Make a composite's variables serving-ready for its quantize mode.

    For quantize="serve"/"static": runs activation calibration over
    `batches` (a list of (images, keypoints_2d, keypoints_2d_crop) tuples;
    defaults to [example_args] — use real data batches for deployment) and
    verifies it; for every int8 mode, additionally pre-quantizes conv
    kernels into the "qweights" collection. A no-op for float models.
    Images must already be normalized (the same tensors model.apply takes).

    Only the BACKBONE holds quantization state, so both passes apply just
    that submodule — cheaper, and it keeps calibration runnable on the host
    CPU backend (the lifter's Pallas kernels are TPU-compile-only).
    """
    from contextaware_poseformer_tpu.models.backbone_common import (
        calibrate_quantization,
        check_calibrated,
        check_serving_fresh,
        params_fingerprint,
        prepare_int8_weights,
    )

    quant = model.cfg.backbone.quantize
    if quant == "none":
        return variables

    # Fail loudly if the caller hands us stored qweights prepared for a
    # DIFFERENT params tree (e.g. collections kept across a checkpoint
    # reload) — silently regenerating would mask the mixing bug upstream.
    check_serving_fresh(variables)

    # Materialize once up front: `batches` may be a generator, and it feeds
    # both the calibration pass and the weight-prep batch below.
    batches = list(batches) if batches is not None else [example_args]
    if not batches:
        batches = [example_args]

    def apply_fn(v, batch, **kw):
        return model.apply(
            v, batch[0], method=lambda m, images: m.backbone(images), **kw
        )

    if quant in ("serve", "static"):
        variables = calibrate_quantization(apply_fn, variables, batches)
        check_calibrated(variables)
    variables = prepare_int8_weights(apply_fn, variables, batches[0])
    # stamp the params identity the collections were derived from, so later
    # check_serving_fresh() calls can detect params/qweights mixing
    params = variables.get("params", {})
    variables = {
        **variables,
        "qmeta": {
            "params_fingerprint": params_fingerprint(
                params.get("backbone", params)
            )
        },
    }
    return variables


class ContextAwarePoseFormer(nn.Module):
    cfg: ModelConfig
    dtype: Any = jnp.float32  # backbone compute dtype (bf16 for speed)

    def setup(self):
        if self.cfg.backbone.kind == "hrnet":
            self.backbone = HRNet(cfg=self.cfg.backbone, dtype=self.dtype)
        elif self.cfg.backbone.kind == "cpn":
            from contextaware_poseformer_tpu.models.cpn import CPN

            self.backbone = CPN(cfg=self.cfg.backbone, dtype=self.dtype)
        else:
            raise ValueError(f"unknown backbone kind: {self.cfg.backbone.kind}")
        self.lifter = PoseLifter(
            cfg=self.cfg.lifter, feature_dims=self.cfg.backbone.feature_dims
        )

    def __call__(
        self,
        images: jax.Array,  # (b, H, W, 3) normalized
        keypoints_2d: jax.Array,  # (b, J, 2) full-frame normalized coords
        keypoints_2d_crop: jax.Array,  # (b, J, 2) crop PIXEL coords
        deterministic: bool = True,
    ) -> jax.Array:
        ref = crop_coords_to_grid(keypoints_2d_crop, self.cfg.image_shape)

        out = self.backbone(images)
        # cpn_int8_maps: the backbone hands over (s8 maps, dequant scales);
        # the lifter folds the scales into its sampling consumers
        feat_scales = None
        if isinstance(out, tuple):
            features, feat_scales = out
        else:
            features = out
        if self.cfg.backbone.frozen:
            # reference freezes backbone params (conpose.py:22-25); the lax
            # equivalent keeps grads from flowing into the conv stack.
            features = [jax.lax.stop_gradient(f) for f in features]
        # features feed the lifter in its compute dtype (fp32 on the parity
        # path; with a bf16 lifter the bf16 backbone maps flow through
        # uncast, skipping a full HBM round trip per level); int8 maps stay
        # int8 — the sampler treats the values as raw numbers
        feat_dtype = jnp.dtype(self.cfg.lifter.compute_dtype)
        features = [
            f if f.dtype == jnp.int8 else f.astype(feat_dtype)
            for f in features
        ]

        return self.lifter(
            keypoints_2d, ref, features, deterministic,
            feat_scales=feat_scales,
        )
