"""Device-side batch preparation: normalization, root-centering, flip
augmentation, and test-time flip stacking.

This is the jit-compiled, reproducible redesign of the reference's
data_prefetcher side-stream logic (ContextPose/mvn/datasets/utils.py:15-89)
and 3DHP get_varialbe (ContextPose_mpi/common/utils.py:150-191):

- BGR->RGB channel flip (prefetcher does torch.flip(images,[-1]) on HWC,
  utils.py:45) happens HERE so the host loader can hand over raw decoded
  uint8 BGR frames;
- per-backbone normalization: ImageNet mean/std for HRNet, pixel-mean/255 for
  CPN (utils.py:24-29,47-50);
- 3D root-centering: subtract the root joint, zero it (utils.py:52-53 for
  H36M root 0; run_3dhp.py:66 zeroes joint 14 for 3DHP);
- train-time random horizontal flip of image + 2D + crop-2D + 3D with
  left/right joint swap (utils.py:55-65) — per BATCH, as in the reference
  (one coin per batch, not per sample), under an explicit jax.random key;
- eval-time flip stacking (utils.py:67-78): returns the flipped copy for the
  flip-test average (train.py:170-181).

All functions are shape-preserving and jit/vmap/pjit-safe.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
CPN_PIXEL_MEAN = (122.7717, 115.9465, 102.9801)  # RGB, /255 at use


class Batch(NamedTuple):
    """One device batch. images are float NHWC; keypoints_3d root-relative."""

    images: jax.Array  # (b, H, W, 3)
    keypoints_3d: jax.Array  # (b, J, 3)
    keypoints_2d: jax.Array  # (b, J, 2) full-frame normalized
    keypoints_2d_crop: jax.Array  # (b, J, 2) crop pixels


def normalize_images(
    images_u8_bgr: jax.Array, backbone_kind: str, dtype=jnp.float32
) -> jax.Array:
    """Raw decoded uint8 BGR HWC frames -> normalized float RGB.

    `dtype`: output dtype. Pass the backbone compute dtype (bf16) on the
    deployment path — emitting bf16 here fuses the downcast into this
    elementwise chain instead of paying a separate 75 MB convert+relayout
    pass before the stem conv (copy.198 in TPU traces, ~180us at batch 128).
    Normalization math itself always runs in float32.
    """
    x = images_u8_bgr[..., ::-1].astype(jnp.float32)  # BGR -> RGB
    if backbone_kind == "hrnet":
        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)
        return ((x / 255.0 - mean) / std).astype(dtype)
    if backbone_kind == "cpn":
        mean = jnp.asarray(CPN_PIXEL_MEAN) / 255.0
        return (x / 255.0 - mean).astype(dtype)
    raise ValueError(backbone_kind)


def serving_images(
    images_u8_bgr: jax.Array, backbone_cfg, dtype=jnp.bfloat16
) -> jax.Array:
    """Model-input images for a SERVING graph, honoring cpn_fold_normalize.

    When the backbone folds normalization into its stem conv
    (config.BackboneConfig.cpn_fold_normalize, serve-only), the model takes
    the raw uint8 BGR frames directly — the u8->float convert + relayout
    this skips was ~174 us/iter at batch 128 (round-4b trace copy.522).
    Otherwise this is normalize_images at the backbone compute dtype.
    """
    if (
        backbone_cfg.kind == "cpn"
        and backbone_cfg.quantize == "serve"
        and backbone_cfg.cpn_fold_normalize
    ):
        return images_u8_bgr
    return normalize_images(images_u8_bgr, backbone_cfg.kind, dtype=dtype)


def root_center(keypoints_3d: jax.Array, root_idx: int) -> jax.Array:
    """Subtract the root joint and zero it (utils.py:52-53)."""
    root = keypoints_3d[..., root_idx : root_idx + 1, :]
    out = keypoints_3d - root
    return out.at[..., root_idx, :].set(0.0)


def flip_batch(
    images: jax.Array,
    keypoints_3d: jax.Array,
    keypoints_2d: jax.Array,
    keypoints_2d_crop: jax.Array,
    flip_perm: jax.Array,
    crop_width: int,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Horizontal flip of every stream (utils.py:55-65):
    image width axis reversed; x of normalized 2D negated; crop x ->
    (W - x - 1); 3D x negated; left/right joints swapped everywhere."""
    images_f = images[:, :, ::-1]
    kp2d_f = keypoints_2d.at[..., 0].multiply(-1.0)[..., flip_perm, :]
    crop_f = (
        keypoints_2d_crop.at[..., 0]
        .set(crop_width - keypoints_2d_crop[..., 0] - 1.0)[..., flip_perm, :]
    )
    kp3d_f = keypoints_3d.at[..., 0].multiply(-1.0)[..., flip_perm, :]
    return images_f, kp3d_f, kp2d_f, crop_f


def train_augment(
    rng: jax.Array,
    batch: Batch,
    flip_perm: np.ndarray,
    crop_width: int,
) -> Batch:
    """Batch-level random flip with probability 0.5 (utils.py:55: one
    random.random() per batch)."""
    perm = jnp.asarray(flip_perm)
    do_flip = jax.random.bernoulli(rng, 0.5)
    flipped = flip_batch(
        batch.images, batch.keypoints_3d, batch.keypoints_2d,
        batch.keypoints_2d_crop, perm, crop_width,
    )
    picked = jax.tree.map(
        lambda a, b: jnp.where(do_flip, b, a),
        (batch.images, batch.keypoints_3d, batch.keypoints_2d,
         batch.keypoints_2d_crop),
        flipped,
    )
    return Batch(*picked)


def flip_test_inputs(
    batch: Batch, flip_perm: np.ndarray, crop_width: int
) -> Batch:
    """The flipped model inputs for flip-test evaluation (utils.py:67-78).
    3D GT is passed through unchanged (only inputs are flipped)."""
    perm = jnp.asarray(flip_perm)
    images_f, _, kp2d_f, crop_f = flip_batch(
        batch.images, batch.keypoints_3d, batch.keypoints_2d,
        batch.keypoints_2d_crop, perm, crop_width,
    )
    return Batch(images_f, batch.keypoints_3d, kp2d_f, crop_f)


def flip_test_merge(
    pred: jax.Array, pred_flip: jax.Array, flip_perm: np.ndarray
) -> jax.Array:
    """Un-flip the flipped prediction and average (train.py:170-181):
    negate x, swap left/right joints, mean."""
    perm = jnp.asarray(flip_perm)
    unflipped = pred_flip.at[..., 0].multiply(-1.0)[..., perm, :]
    return 0.5 * (pred + unflipped)


def erase_regions(
    images: jax.Array,  # (b, H, W, 3) float
    centers: jax.Array,  # (b, K, 2) xy pixel centers
    size: int = 70,
    use_mean: bool = True,
) -> jax.Array:
    """Occlusion augmentation: square regions around `centers` replaced by the
    region mean (or zero). jit-safe re-design of erase_image
    (mvn/utils/img.py:179-198); off-image centers are skipped like the
    reference. Applied per batch with static K."""
    b, h, w, _ = images.shape
    ys = jnp.arange(h)[None, :, None]  # (1, H, 1)
    xs = jnp.arange(w)[None, None, :]  # (1, 1, W)
    out = images
    half = size // 2
    for k in range(centers.shape[1]):
        cx = jnp.floor(centers[:, k, 0]).astype(jnp.int32)[:, None, None]
        cy = jnp.floor(centers[:, k, 1]).astype(jnp.int32)[:, None, None]
        valid = (
            (cx >= 0) & (cy >= 0) & (cx < w) & (cy < h)
        )  # (b, 1, 1)
        mask = (
            (xs >= cx - half) & (xs <= cx + half)
            & (ys >= cy - half) & (ys <= cy + half)
            & valid
        )[..., None]  # (b, H, W, 1)
        if use_mean:
            msum = jnp.sum(jnp.where(mask, out, 0.0), axis=(1, 2), keepdims=True)
            mcount = jnp.maximum(jnp.sum(mask, axis=(1, 2), keepdims=True), 1)
            fill = msum / mcount
        else:
            fill = jnp.zeros_like(out[:, :1, :1])
        out = jnp.where(mask, fill, out)
    return out


def gamma_correct(images: jax.Array, gamma: jax.Array | float) -> jax.Array:
    """Gamma transform on [0,255] or [0,1] images (img.py:200-206
    gamma_trans, without the uint8 LUT quantization)."""
    scale = jnp.where(jnp.max(images) > 2.0, 255.0, 1.0)
    x = jnp.clip(images / scale, 0.0, 1.0)
    return jnp.power(x, gamma) * scale
