"""CPN COCO 2D-detector training / evaluation driver.

Runnable TPU-native equivalent of ContextPose/mvn/models/cpn/{train,test}.py
(which ship unrunnable in the reference — their dataloader/network/utils
imports are not vendored). Recipe per cpn/config.py + train.py: Adam
lr 5e-4, torch-style L2 weight decay 1e-5, lr x0.5 at epochs 6,12,18,...,
batch 32, 32 epochs; losses = 4 zeroed-label global MSEs + top-8 OHKM
refine loss; test = optional flip-test, two-peak quarter-pixel decode,
OKS AP (native evaluator — the reference shells out to pycocotools).

  # train on COCO person keypoints:
  python -m contextaware_poseformer_tpu.train.train_coco \
      --ann annotations/person_keypoints_train2017.json \
      --image-dir train2017 --checkpoint ckpt_cpn_coco

  # evaluate a checkpoint on person detections:
  python -m contextaware_poseformer_tpu.train.train_coco --eval \
      --ann annotations/person_keypoints_val2017.json \
      --dets dets_val2017.json --image-dir val2017 \
      --checkpoint ckpt_cpn_coco --result result/

  # smoke test without data:
  python -m contextaware_poseformer_tpu.train.train_coco \
      --synthetic --tiny --epochs 1 --steps-per-epoch 2
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from contextaware_poseformer_tpu.config import BackboneConfig, cpn_backbone
from contextaware_poseformer_tpu.data import coco as coco_data
from contextaware_poseformer_tpu.models.cpn_coco import CPNCoco
from contextaware_poseformer_tpu.train import coco_eval, losses

# cpn/config.py:17-22
LR = 5e-4
LR_GAMMA = 0.5
LR_DEC_EPOCHS = tuple(range(6, 40, 6))
WEIGHT_DECAY = 1e-5
BATCH_SIZE = 32
EPOCHS = 32


def tiny_backbone() -> BackboneConfig:
    return dataclasses.replace(cpn_backbone(), cpn_layers=(1, 1, 1, 1))


def lr_schedule(steps_per_epoch: int):
    return optax.piecewise_constant_schedule(
        LR,
        {e * steps_per_epoch: LR_GAMMA for e in LR_DEC_EPOCHS},
    )


def make_optimizer(steps_per_epoch: int) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, weight_decay) (cpn/train.py:33-35): L2 decay is
    added to the GRADIENT before the Adam moments (unlike AdamW)."""
    return optax.chain(
        optax.add_decayed_weights(WEIGHT_DECAY),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(lr_schedule(steps_per_epoch)),
    )


def loss_fn(params, batch_stats, model, batch):
    (global_outs, refine_out), mutated = model.apply(
        {"params": params, "batch_stats": batch_stats},
        batch["image"],
        mutable=["batch_stats"],
    )
    g = losses.coco_global_loss(global_outs, batch["targets"], batch["valid"])
    r = losses.coco_refine_ohkm_loss(refine_out, batch["targets"][3], batch["valid"])
    return g + r, (g, r, mutated["batch_stats"])


@functools.partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2, 3, 4))
def train_step(model, tx, params, batch_stats, opt_state, batch):
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (loss, (g, r, new_stats)), grads = grad_fn(params, batch_stats, model, batch)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, new_stats, opt_state, {
        "loss": loss, "global": g, "refine": r,
    }


@functools.partial(jax.jit, static_argnums=(0, 3))
def eval_step(model, variables, image, flip: bool):
    """Refine heatmaps, optionally averaged with the mirrored input's
    (cpn/test.py:44-70). The flip pass rides the batch axis: ONE 2B forward."""
    if not flip:
        _, refine = model.apply(variables, image)
        return refine
    both = jnp.concatenate([image, image[:, :, ::-1, :]], axis=0)
    _, refine = model.apply(variables, both)
    n = image.shape[0]
    direct, flipped = refine[:n], refine[n:]
    f = flipped[:, :, ::-1, :]
    idx = np.arange(coco_data.NUM_JOINTS)
    for a, b in coco_data.SYMMETRY:
        idx[a], idx[b] = b, a
    return (direct + f[..., idx]) / 2.0


def _synthetic_batches(rng, steps, batch, img_hw=(64, 64)):
    h, w = img_hw
    oh, ow = h // 4, w // 4
    for _ in range(steps):
        yield {
            "image": rng.randn(batch, h, w, 3).astype(np.float32),
            "targets": tuple(
                rng.rand(batch, oh, ow, coco_data.NUM_JOINTS).astype(np.float32)
                * 255.0
                for _ in range(4)
            ),
            "valid": rng.randint(0, 3, (batch, coco_data.NUM_JOINTS)).astype(
                np.float32
            ),
        }


def train(args) -> dict:
    rng = np.random.RandomState(args.seed)
    backbone = tiny_backbone() if args.tiny else cpn_backbone()
    model = CPNCoco(cfg=backbone, train=True)

    if args.synthetic:
        hw = (64, 64)
        steps_per_epoch = args.steps_per_epoch
        def epoch_batches():
            return _synthetic_batches(rng, steps_per_epoch, args.batch, hw)
    else:
        ds = coco_data.CocoKeypointDataset.from_annotations(
            args.ann, args.image_dir, train=True)
        steps_per_epoch = args.steps_per_epoch or len(ds) // args.batch
        def epoch_batches():
            return ds.batches(args.batch, rng=rng)
        hw = coco_data.DATA_SHAPE

    variables = model.init(
        jax.random.PRNGKey(args.seed), jnp.zeros((1, *hw, 3), jnp.float32))
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = make_optimizer(steps_per_epoch)
    opt_state = tx.init(params)

    history = []
    for epoch in range(args.epochs):
        total, n = 0.0, 0
        for i, batch in enumerate(epoch_batches()):
            if args.steps_per_epoch and i >= args.steps_per_epoch:
                break
            batch = jax.tree.map(jnp.asarray, batch)
            params, batch_stats, opt_state, m = train_step(
                model, tx, params, batch_stats, opt_state, batch)
            total += float(m["loss"])
            n += 1
        avg = total / max(n, 1)
        history.append(avg)
        print(f"epoch {epoch + 1}/{args.epochs} | train_loss {avg:.5f}")
        if args.checkpoint:
            _save(args.checkpoint, epoch, params, batch_stats)
    return {"history": history, "params": params, "batch_stats": batch_stats}


def _save(directory, epoch, params, batch_stats):
    os.makedirs(directory, exist_ok=True)
    flat = {}
    for tree, tag in ((params, "p"), (batch_stats, "s")):
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            key = tag + "/".join(str(k) for k in path)
            flat[key] = np.asarray(leaf)
    np.savez(os.path.join(directory, "latest.npz"), epoch=epoch, **flat)


def _restore(directory, params, batch_stats):
    data = np.load(os.path.join(directory, "latest.npz"))
    def fill(tree, tag):
        leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
        out = [
            jnp.asarray(data[tag + "/".join(str(k) for k in path)])
            for path, _ in leaves
        ]
        return jax.tree_util.tree_unflatten(treedef, out)
    return fill(params, "p"), fill(batch_stats, "s"), int(data["epoch"])


def evaluate(args) -> dict:
    backbone = tiny_backbone() if args.tiny else cpn_backbone()
    model = CPNCoco(cfg=backbone, train=False)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, *coco_data.DATA_SHAPE, 3), jnp.float32))
    params, batch_stats = variables["params"], variables["batch_stats"]
    if args.checkpoint and os.path.exists(
            os.path.join(args.checkpoint, "latest.npz")):
        params, batch_stats, _ = _restore(args.checkpoint, params, batch_stats)
    elif args.torch_ckpt:
        import torch

        from contextaware_poseformer_tpu.models.convert import (
            convert_cpn_coco, load_torch_state_dict)

        sd = load_torch_state_dict(args.torch_ckpt)
        shapes = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jnp.zeros((1, *coco_data.DATA_SHAPE, 3), jnp.float32))
        out = convert_cpn_coco(sd, shapes)
        params, batch_stats = out["params"], out["batch_stats"]
    variables = {"params": params, "batch_stats": batch_stats}

    if args.dets:
        ds = coco_data.CocoKeypointDataset.from_detections(
            args.dets, args.ann, args.image_dir)
    else:
        ds = coco_data.CocoKeypointDataset.from_annotations(
            args.ann, args.image_dir, train=False)

    results = []
    for batch in ds.batches(args.batch, drop_last=False):
        maps = np.asarray(eval_step(
            model, variables, jnp.asarray(batch["image"]), args.flip))
        results += coco_eval.decode_batch(
            maps, batch["details"], batch["det_score"], batch["image_id"])

    if args.result:
        os.makedirs(args.result, exist_ok=True)
        with open(os.path.join(args.result, "result.json"), "w") as f:
            json.dump(results, f)

    with open(args.ann) as f:
        gt = json.load(f)["annotations"]
    summary = coco_eval.oks_ap(results, gt)
    for k, v in summary.items():
        print(f"{k:>10}: {v:.4f}")
    return summary


def main(argv=None):
    ap = argparse.ArgumentParser(description="CPN COCO detector")
    ap.add_argument("--eval", action="store_true")
    ap.add_argument("--ann", help="person_keypoints_*.json path")
    ap.add_argument("--image-dir", default=".")
    ap.add_argument("--dets", help="COCO detection results json (eval)")
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--torch-ckpt", help="reference CPN256x192 .pth.tar")
    ap.add_argument("--result", default="")
    ap.add_argument("--epochs", type=int, default=EPOCHS)
    ap.add_argument("--batch", type=int, default=BATCH_SIZE)
    ap.add_argument("--steps-per-epoch", type=int, default=0)
    ap.add_argument("--flip", action="store_true", default=True)
    ap.add_argument("--no-flip", dest="flip", action="store_false")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    if args.eval:
        return evaluate(args)
    return train(args)


if __name__ == "__main__":
    main()
