"""Loss library (reference: ContextPose/mvn/models/loss.py:16-201,
ContextPose_mpi/common/utils.py:14-111).

Training losses are jnp (jit-compatible); Procrustes-aligned P-MPJPE and the
velocity error stay host-side numpy exactly like the reference (numpy SVD at
loss.py:48-57, np.diff at loss.py:96-100) — they are evaluation-only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# jit-compatible losses
# ---------------------------------------------------------------------------


def mpjpe(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Mean per-joint position error: mean L2 over the last axis
    (loss.py:16-22; identical to 3DHP mpjpe_cal, common/utils.py:14)."""
    assert pred.shape == gt.shape, (pred.shape, gt.shape)
    return jnp.mean(jnp.linalg.norm(pred - gt, axis=-1))


def n_mpjpe(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Scale-normalized MPJPE (loss.py:71-85): optimal per-sample scale
    applied to the prediction before MPJPE."""
    assert pred.shape == gt.shape
    norm_pred = jnp.mean(
        jnp.sum(pred**2, axis=-1, keepdims=True), axis=-2, keepdims=True
    )
    norm_gt = jnp.mean(
        jnp.sum(gt * pred, axis=-1, keepdims=True), axis=-2, keepdims=True
    )
    scale = norm_gt / norm_pred
    return mpjpe(scale * pred, gt)


def keypoints_mse(pred, gt, validity=None):
    """Masked MSE (loss.py:104-115)."""
    diff2 = (pred - gt) ** 2
    if validity is None:
        return jnp.mean(diff2)
    dim = pred.shape[-1]
    return jnp.sum(diff2 * validity) / (dim * jnp.maximum(jnp.sum(validity), 1.0))


def keypoints_mse_smooth(pred, gt, validity=None, threshold: float = 400.0):
    """Smooth-clipped MSE (loss.py:118-131): above `threshold` the squared
    error is compressed via (e^0.1 * t^0.9)."""
    diff2 = (pred - gt) ** 2
    diff2 = jnp.where(
        diff2 > threshold, (diff2**0.1) * (threshold**0.9), diff2
    )
    if validity is None:
        return jnp.mean(diff2)
    dim = pred.shape[-1]
    return jnp.sum(diff2 * validity) / (dim * jnp.maximum(jnp.sum(validity), 1.0))


def keypoints_mae(pred, gt, validity=None):
    """Masked MAE (loss.py:134-141)."""
    diff = jnp.abs(pred - gt)
    if validity is None:
        return jnp.mean(diff)
    dim = pred.shape[-1]
    return jnp.sum(diff * validity) / (dim * jnp.maximum(jnp.sum(validity), 1.0))


def keypoints_l2(pred, gt, validity=None):
    """Masked mean L2 distance (loss.py:144-147)."""
    dist = jnp.sqrt(jnp.sum((pred - gt) ** 2, axis=-1))
    if validity is None:
        return jnp.mean(dist)
    v = jnp.squeeze(validity, axis=-1) if validity.ndim == dist.ndim + 1 else validity
    return jnp.sum(dist * v) / jnp.maximum(jnp.sum(v), 1.0)


H36M_LIMB_PAIRS = (
    (0, 1), (1, 2), (2, 3), (0, 4), (4, 5), (5, 6), (0, 7), (7, 8),
    (8, 9), (9, 10), (8, 11), (11, 12), (12, 13), (8, 14), (14, 15), (15, 16),
)

# the reference's CONNECTIVITY_DICT (loss.py:185) — legacy joint order
REFERENCE_CONNECTIVITY = (
    (0, 1), (1, 2), (2, 6), (5, 4), (4, 3), (3, 6), (6, 7), (7, 8),
    (8, 16), (9, 16), (8, 12), (11, 12), (10, 11), (8, 13), (13, 14), (14, 15),
)


def limb_length_error(pred, gt, pairs=REFERENCE_CONNECTIVITY):
    """Mean |limb length difference| over limb pairs (loss.py:181-201
    LimbLengthError; default pairs = the reference's CONNECTIVITY_DICT,
    H36M_LIMB_PAIRS gives the VideoPose-order kinematic tree)."""
    a = jnp.asarray([p[0] for p in pairs])
    b = jnp.asarray([p[1] for p in pairs])
    lp = jnp.linalg.norm(pred[..., a, :] - pred[..., b, :], axis=-1)
    lg = jnp.linalg.norm(gt[..., a, :] - gt[..., b, :], axis=-1)
    return jnp.mean(jnp.abs(lp - lg))


LOSSES = {
    "MPJPE": mpjpe,
    "MSE": keypoints_mse,
    "MSESmooth": keypoints_mse_smooth,
    "MAE": keypoints_mae,
    "L2": keypoints_l2,
}


# ---------------------------------------------------------------------------
# host-side evaluation metrics (numpy, matching reference numerics)
# ---------------------------------------------------------------------------


def p_mpjpe(pred: np.ndarray, gt: np.ndarray) -> float:
    """Procrustes-aligned MPJPE, "Protocol #2" (loss.py:25-68): optimal
    similarity transform (scale+rotation+translation) per sample via SVD."""
    assert pred.shape == gt.shape and pred.ndim == 3  # (N, J, 3)
    mu_x = np.mean(gt, axis=1, keepdims=True)
    mu_y = np.mean(pred, axis=1, keepdims=True)
    x0 = gt - mu_x
    y0 = pred - mu_y
    norm_x = np.sqrt(np.sum(x0**2, axis=(1, 2), keepdims=True))
    norm_y = np.sqrt(np.sum(y0**2, axis=(1, 2), keepdims=True))
    x0 /= norm_x
    y0 /= norm_y

    h = np.matmul(x0.transpose(0, 2, 1), y0)
    u, s, vt = np.linalg.svd(h)
    v = vt.transpose(0, 2, 1)
    r = np.matmul(v, u.transpose(0, 2, 1))
    # fix improper rotations (reflections)
    sign_det = np.sign(np.expand_dims(np.linalg.det(r), axis=1))
    v[:, :, -1] *= sign_det
    s[:, -1] *= sign_det.flatten()
    r = np.matmul(v, u.transpose(0, 2, 1))

    tr = np.expand_dims(np.sum(s, axis=1, keepdims=True), axis=2)
    a = tr * norm_x / norm_y
    t = mu_x - a * np.matmul(mu_y, r)
    aligned = a * np.matmul(pred, r) + t
    return float(np.mean(np.linalg.norm(aligned - gt, axis=-1)))


def mpjve(pred: np.ndarray, gt: np.ndarray) -> float:
    """Mean per-joint velocity error: MPJPE of the first temporal derivative
    (loss.py:87-101). Inputs ordered along axis 0 by time."""
    assert pred.shape == gt.shape
    if pred.shape[0] < 2:
        return 0.0
    vel_p = np.diff(pred, axis=0)
    vel_g = np.diff(gt, axis=0)
    return float(np.mean(np.linalg.norm(vel_p - vel_g, axis=-1)))


def uncertainty_loss(sigma_list, pred, gt):
    """Heteroscedastic uncertainty loss (loss.py:8-13 UNCERTAINTY): L2 scaled
    by per-joint sigma plus a log-sigma regularizer."""
    diff = pred - gt
    total = 0.0
    for sigma in sigma_list:
        total = total + (
            jnp.mean(jnp.linalg.norm(diff / (sigma + 1e-6), axis=-1))
            + 0.01 * jnp.mean(jnp.log(sigma + 1e-6))
        )
    return total


def volumetric_ce_loss(coord_volumes, volumes_pred, keypoints_gt, validity):
    """Volumetric cross-entropy (loss.py:150-178 VolumetricCELoss, the legacy
    ContextPose volumetric head): -log of the predicted probability at the
    voxel nearest each GT joint, masked by validity.

    coord_volumes: (b, X, Y, Z, 3); volumes_pred: (b, j, X, Y, Z) softmaxed;
    keypoints_gt: (b, j, 3); validity: (b, j, 1).
    """
    b, j = keypoints_gt.shape[:2]
    vol_shape = volumes_pred.shape[-3:]
    coords = coord_volumes.reshape(b, 1, -1, 3)
    dists = jnp.sum(
        (coords - keypoints_gt[:, :, None, :]) ** 2, axis=-1
    )  # (b, j, XYZ)
    idx = jnp.argmin(dists, axis=-1)  # (b, j)
    flat = volumes_pred.reshape(b, j, -1)
    picked = jnp.take_along_axis(flat, idx[..., None], axis=-1)[..., 0]
    losses_ = -jnp.log(picked + 1e-6) * validity[..., 0]
    return jnp.sum(losses_) / (b * j)


# ---------------------------------------------------------------------------
# CPN COCO detector losses (mvn/models/cpn/train.py:83-128)
# ---------------------------------------------------------------------------


def coco_global_loss(global_outs, targets, valid):
    """Sum of the 4 globalNet head losses (cpn/train.py:118-123).

    Each level: MSELoss(output, target * (valid > 1.1)) / 2 — the label is
    ZEROED (not the loss masked) for joints that are not fully visible, so
    invisible joints still push the prediction toward 0.

    global_outs/targets: 4 x (N, Ho, Wo, K) NHWC (deepest-first, paired with
    the gk15/11/9/7 targets in that order); valid: (N, K).
    """
    mask = (valid > 1.1).astype(jnp.float32)[:, None, None, :]
    total = 0.0
    for out, tgt in zip(global_outs, targets):
        total = total + jnp.mean((out - tgt * mask) ** 2) / 2.0
    return total


def coco_refine_ohkm_loss(refine_out, target, valid, top_k: int = 8):
    """Online hard-keypoint-mining refine loss (cpn/train.py:85-93,124-127):
    per-(sample, joint) MSE over the map, masked by (valid > 0.1), then the
    mean of each sample's top-8 joint losses, averaged over the batch.

    refine_out/target: (N, Ho, Wo, K) NHWC; valid: (N, K).
    """
    per_joint = jnp.mean((refine_out - target) ** 2, axis=(1, 2))  # (N, K)
    per_joint = per_joint * (valid > 0.1).astype(jnp.float32)
    topk, _ = jax.lax.top_k(per_joint, top_k)
    return jnp.mean(jnp.sum(topk, axis=1) / top_k)
