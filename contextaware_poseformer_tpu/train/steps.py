"""jit/pjit train and eval steps.

Reproduces the reference recipe (ContextPose/train.py:140-213,337-345,410-412):
AdamW(weight_decay=0.1) over the LIFTER parameters only (the backbone is
frozen — param_labels mask, matching `param_dicts` of volume_net params at
train.py:337-345), MPJPE loss, exponential per-epoch LR decay, train-time
random flip, eval-time flip-test averaging.

Everything device-side is one compiled function per phase:
  train_step: raw uint8 batch -> normalize -> augment -> fwd -> loss -> update
  eval_step:  raw uint8 batch -> normalize -> double fwd (flip test) -> preds

Sharding: batch on the mesh "data" axis, params replicated (or TP on "model");
XLA inserts gradient all-reduces. No hand-written collectives, no prefetcher
thread on the device side — the host loader overlaps via double-buffered
device_put (data/pipeline.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from contextaware_poseformer_tpu.config import Config
from contextaware_poseformer_tpu.data import augment
from contextaware_poseformer_tpu.train import losses
from contextaware_poseformer_tpu.utils import skeleton


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


@dataclasses.dataclass(frozen=True)
class Task:
    """Dataset-dependent constants baked into the compiled steps."""

    root_idx: int
    flip_perm: np.ndarray
    crop_width: int

    @staticmethod
    def for_config(cfg: Config) -> "Task":
        if cfg.data.dataset == "human36m":
            return Task(skeleton.H36M_ROOT, skeleton.H36M_FLIP_PERM,
                        cfg.model.image_shape[1])
        return Task(skeleton.MPI3DHP_ROOT, skeleton.MPI3DHP_FLIP_PERM,
                    cfg.model.image_shape[1])


def lr_schedule(cfg: Config, steps_per_epoch: int) -> Callable[[jax.Array], jax.Array]:
    """lr0 * decay^epoch, stepped at epoch boundaries (train.py:410-412);
    3DHP additionally halves every `large_decay_epoch` (run_3dhp.py:318-325)."""
    t = cfg.train

    def fn(step):
        epoch = step // steps_per_epoch
        lr = t.lr * (t.lr_decay ** epoch)
        if t.large_decay_epoch:
            lr = lr * (t.lr_decay_large ** (epoch // t.large_decay_epoch))
        return lr

    return fn


def make_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    """AdamW(wd=0.1) on the lifter partition; backbone pinned (set_to_zero).

    NOTE: masking matters beyond zero grads — AdamW's decoupled weight decay
    would otherwise shrink the frozen backbone every step.
    """
    sched = lr_schedule(cfg, steps_per_epoch)
    tx = optax.adamw(learning_rate=sched, weight_decay=cfg.train.weight_decay)
    if cfg.train.grad_clip:
        # reference scales the clip norm by 1/lr (train.py:196-200)
        tx = optax.chain(
            optax.clip_by_global_norm(cfg.train.grad_clip / cfg.train.lr), tx
        )
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, _label_params
    )


def _label_params(params):
    return {
        k: jax.tree.map(lambda _: "train" if k == "lifter" else "freeze", v)
        for k, v in params.items()
    }


class RawBatch(NamedTuple):
    """Host-produced device batch: raw images + labels, fixed shapes."""

    images_u8: jax.Array  # (b, H, W, 3) uint8 BGR, pre-cropped
    keypoints_3d: jax.Array  # (b, J, 3) camera-space (NOT yet root-centered)
    keypoints_2d: jax.Array  # (b, J, 2) full-frame normalized
    keypoints_2d_crop: jax.Array  # (b, J, 2) crop pixels


def _prepare(raw: RawBatch, backbone_cfg, task: Task,
             image_dtype=None) -> augment.Batch:
    # serving_images: raw u8 passthrough when the serve graph folds
    # normalization into the stem (cpn_fold_normalize); else normalize
    return augment.Batch(
        images=augment.serving_images(
            raw.images_u8, backbone_cfg, dtype=image_dtype or jnp.float32
        ),
        keypoints_3d=augment.root_center(raw.keypoints_3d, task.root_idx),
        keypoints_2d=raw.keypoints_2d,
        keypoints_2d_crop=raw.keypoints_2d_crop,
    )


def make_train_step(model, cfg: Config, optimizer) -> Callable:
    if cfg.model.backbone.quantize in ("serve", "static"):
        raise ValueError(
            f'quantize="{cfg.model.backbone.quantize}" is inference-only '
            "(needs calibrated activation scales); train with quantize="
            '"none" or "c128" and switch via config.deploy for serving'
        )
    task = Task.for_config(cfg)
    bcfg = cfg.model.backbone
    loss_fn_name = cfg.train.loss
    loss_fn = losses.LOSSES[loss_fn_name]

    def train_step(state: TrainState, raw: RawBatch, rng: jax.Array):
        aug_rng, erase_rng, drop_rng = jax.random.split(
            jax.random.fold_in(rng, state.step), 3
        )
        batch = _prepare(raw, bcfg, task)
        if cfg.train.flip_aug:
            batch = augment.train_augment(aug_rng, batch, task.flip_perm,
                                          task.crop_width)
        if cfg.train.erase_aug:
            # erase around randomly chosen joints (img.py:179-198 semantics)
            b = batch.keypoints_2d_crop.shape[0]
            j = cfg.model.lifter.num_joints
            picks = jax.random.randint(
                erase_rng, (b, cfg.train.erase_joints), 0, j
            )
            centers = jnp.take_along_axis(
                batch.keypoints_2d_crop, picks[..., None], axis=1
            )
            batch = batch._replace(
                images=augment.erase_regions(
                    batch.images, centers, size=cfg.train.erase_size
                )
            )

        def compute_loss(params):
            pred = model.apply(
                {"params": params},
                batch.images, batch.keypoints_2d, batch.keypoints_2d_crop,
                deterministic=False,
                rngs={"dropout": drop_rng},
            )
            return loss_fn(pred, batch.keypoints_3d)

        loss, grads = jax.value_and_grad(compute_loss)(state.params)
        # NaN guard (train.py:194): skip the update if loss is non-finite.
        ok = jnp.isfinite(loss)
        grads = jax.tree.map(lambda g: jnp.where(ok, g, 0.0), grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.step + 1)
        return new_state, {"loss": loss, "finite": ok}

    return train_step


def make_eval_step(model, cfg: Config, extra_variables: dict | None = None) -> Callable:
    """`extra_variables`: non-param collections the model needs at inference
    (e.g. "calib"/"qweights" from models.prepare_serving for the
    quantize="serve" deployment mode); closed over, not traced per call."""
    task = Task.for_config(cfg)
    bcfg = cfg.model.backbone
    extra = extra_variables or {}
    # deploy numerics: normalize straight into the backbone compute dtype
    # (the separate f32->bf16 convert pass cost ~180us/batch in traces)
    img_dtype = (
        jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else None
    )

    def eval_step(params, raw: RawBatch):
        batch = _prepare(raw, bcfg, task, image_dtype=img_dtype)

        def fwd(images, kp2d, kp2d_crop):
            return model.apply(
                {"params": params, **extra}, images, kp2d, kp2d_crop
            )

        if cfg.train.flip_test:
            # flip-test with the flipped copy FOLDED INTO THE BATCH AXIS: one
            # forward of 2B instead of two of B (same math as the reference's
            # double forward, train.py:170-181, but a single dispatch that
            # keeps the MXU saturated and shards cleanly — SURVEY.md sec. 7)
            flipped = augment.flip_test_inputs(batch, task.flip_perm,
                                               task.crop_width)
            b = batch.images.shape[0]
            pred2 = fwd(
                jnp.concatenate([batch.images, flipped.images], axis=0),
                jnp.concatenate([batch.keypoints_2d, flipped.keypoints_2d]),
                jnp.concatenate(
                    [batch.keypoints_2d_crop, flipped.keypoints_2d_crop]
                ),
            )
            pred = augment.flip_test_merge(
                pred2[:b], pred2[b:], task.flip_perm
            )
        else:
            pred = fwd(batch.images, batch.keypoints_2d,
                       batch.keypoints_2d_crop)
        return pred, batch.keypoints_3d

    return eval_step


def init_state(model, cfg: Config, optimizer, rng: jax.Array,
               sample: RawBatch) -> TrainState:
    task = Task.for_config(cfg)
    sample = RawBatch(*(jnp.asarray(x) for x in sample))  # host numpy ok
    batch = _prepare(sample, cfg.model.backbone, task)
    params = model.init(
        rng, batch.images, batch.keypoints_2d, batch.keypoints_2d_crop
    )["params"]
    opt_state = optimizer.init(params)
    return TrainState(params, opt_state, jnp.zeros((), jnp.int32))
