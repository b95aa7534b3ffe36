"""MPI-INF-3DHP training / evaluation driver.

Equivalent of ContextPose_mpi/run_3dhp.py: GT-2D inputs, no deformable
blocks, HRNet backbone only, root = joint 14 zeroed in every loss/metric,
batch 160, AdamW wd 0.1, lr x0.97/epoch with x0.5 every 80 epochs, flip-test
eval. Improvements: PCK@150/AUC computed natively in-process (the reference
needs MATLAB), optional `inference_data.mat` export kept for the vendored
MATLAB pipeline, orbax best-P1 checkpoints with true resume.

  python -m contextaware_poseformer_tpu.train.train_3dhp \
      --preset mpi_3dhp_hrnet_32 --data-root dataset/mpi_inf_3dhp \
      --backbone-ckpt data/pretrained/coco/pose_hrnet_w32_256x192.pth

  # smoke test without data:
  python -m contextaware_poseformer_tpu.train.train_3dhp --synthetic --tiny \
      --epochs 1 --steps-per-epoch 4
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import jax
import numpy as np

from contextaware_poseformer_tpu.train import metrics as metrics_lib
from contextaware_poseformer_tpu.train.loop import Trainer


class Trainer3dhp(Trainer):
    """3DHP evaluation: P1 over all joints (root zeroed on BOTH sides,
    run_3dhp.py:109,118) + native PCK/AUC per sequence."""

    def evaluate(self, params, max_batches: int | None = None):
        from contextaware_poseformer_tpu.data import pipeline
        from contextaware_poseformer_tpu.parallel import distributed

        self._ensure_serving_ready(params)
        host_iter = pipeline.batch_iterator(
            self.val_ds, self.cfg.train.batch_size,
            shuffle=False, drop_remainder=False,
            num_workers=self.cfg.data.num_workers,
        )
        preds, gts, total = [], [], 0
        for i, (batch, valid) in enumerate(
            pipeline.device_prefetch(host_iter, self._put)
        ):
            pred, gt = self._eval_step(params, batch)
            preds.append(distributed.local_rows(pred)[:valid])
            gts.append(distributed.local_rows(gt)[:valid])
            total += valid
            if max_batches and i + 1 >= max_batches:
                break
        pred = distributed.allgather_hosts(np.concatenate(preds))
        gt = distributed.allgather_hosts(np.concatenate(gts))
        pred[:, 14] = 0.0  # root zeroed before error (run_3dhp.py:118)

        p1 = float(np.mean(np.linalg.norm(pred - gt, axis=-1)))
        seq_idx = distributed.allgather_hosts(
            np.asarray(self.val_ds.seq_idx[:total])
        )
        errors = metrics_lib.joint_errors_mm(pred, gt)
        seq_errors = {
            name: errors[seq_idx == i]
            for i, name in enumerate(self.val_ds.seq_names)
            if (seq_idx == i).any()
        }
        tables = metrics_lib.mpi3dhp_evaluate(seq_errors)
        overall = tables.get("All", {})
        summary = {
            "p1_mm": p1,
            "pck": overall.get("pck", 0.0),
            "auc": overall.get("auc", 0.0),
        }
        # Trainer.fit logs summary and checkpoints on p1_mm
        self._last_pred = pred
        self._last_tables = tables
        return summary, tables

    def fit(self, state, n_epochs, rng, **kw):
        # reuse parent loop; its summary comes from our evaluate()
        return super().fit(state, n_epochs, rng, **kw)


def build_argparser():
    p = argparse.ArgumentParser(description="Context-Aware PoseFormer (TPU) - 3DHP")
    p.add_argument(
        "--preset", default="mpi_3dhp_hrnet_32",
        choices=[
            n + s
            for n in ("mpi_3dhp_hrnet_32", "mpi_3dhp_hrnet_48")
            for s in ("", "_deploy")
        ],
    )
    p.add_argument("--eval", action="store_true")
    p.add_argument("--data-root", default="dataset")
    p.add_argument("--train-npz", default=None)
    p.add_argument("--test-npz", default=None)
    p.add_argument("--backbone-ckpt", default=None)
    p.add_argument("--logdir", default="logs/3dhp")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--export-mat", default=None,
                   help="write inference_data.mat for the MATLAB pipeline")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--eval-batches", type=int, default=None)
    p.add_argument("--model-parallel", type=int, default=1)
    p.add_argument("--distributed", action="store_true")
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p


def make_config(args):
    from contextaware_poseformer_tpu.train.train_h36m import make_config as _mk

    # reuse the H36M arg plumbing for shared fields
    ns = argparse.Namespace(
        preset=args.preset, config=None, epochs=args.epochs,
        batch_size=args.batch_size, seed=0, data_root=None,
        train_labels=None, val_labels=None, tiny=args.tiny,
    )
    cfg = _mk(ns)
    if args.tiny:
        # keep the 3DHP lifter flavor (no deformable blocks)
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model,
                lifter=dataclasses.replace(
                    cfg.model.lifter, use_deformable=False
                ),
            ),
        )
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, dataset="mpi_inf_3dhp")
    )
    return cfg


def make_datasets(cfg, args):
    if args.synthetic:
        from contextaware_poseformer_tpu.data.synthetic import (
            SyntheticPoseDataset,
        )

        mk = lambda size, seed: SyntheticPoseDataset(  # noqa: E731
            size=size, image_shape=cfg.model.image_shape, seed=seed,
            root_idx=14, num_seqs=6,
        )
        return (
            mk(max(cfg.train.batch_size * 4, 64), 0),
            mk(max(cfg.train.batch_size * 2, 32), 99),
        )
    from contextaware_poseformer_tpu.data import mpi3dhp

    train_npz = args.train_npz or os.path.join(args.data_root, "data_train_3dhp.npz")
    test_npz = args.test_npz or os.path.join(args.data_root, "data_test_3dhp.npz")
    train_ds = mpi3dhp.load_train(
        train_npz, os.path.join(args.data_root, "mpi_inf_3dhp", "images"),
        frame_store=cfg.data.train_frame_store or None,
    )
    val_ds = mpi3dhp.load_test(
        test_npz, os.path.join(args.data_root, "mpi_inf_3dhp_test_set", "images"),
        frame_store=cfg.data.val_frame_store or None,
    )
    return train_ds, val_ds


def main(argv=None):
    from contextaware_poseformer_tpu.train.train_h36m import (
        setup_distributed,
        shard_datasets,
    )

    args = build_argparser().parse_args(argv)
    topo = setup_distributed(args)
    cfg = make_config(args)
    train_ds, val_ds = shard_datasets(*make_datasets(cfg, args), topo)

    trainer = Trainer3dhp(cfg, train_ds, val_ds, logdir=args.logdir,
                          model_parallel=args.model_parallel)
    print(f"devices: {jax.devices()} | mesh: {dict(trainer.mesh.shape)}")
    state = trainer.init_state(jax.random.PRNGKey(cfg.train.seed))
    n_lifter = sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(state.params["lifter"])
    )
    print(f"Trainable parameter count: {n_lifter}")

    if args.backbone_ckpt:
        state = trainer.load_backbone(state, args.backbone_ckpt)
        print(f"Loaded backbone from {args.backbone_ckpt}")

    start_epoch = 0
    if args.resume and trainer.ckpt:
        state, start_epoch = trainer.ckpt.restore(state)
        print(f"Resumed from epoch {start_epoch - 1}")

    if args.eval:
        summary, tables = trainer.evaluate(state.params,
                                           max_batches=args.eval_batches)
        for name, row in tables.items():
            line = " ".join(f"{k}={v:.2f}" for k, v in row.items()
                            if not k.startswith(("pck_", "auc_")))
            print(f"{name}: {line}")
        print(f"p1: {summary['p1_mm']:.2f} pck: {summary['pck']:.2f} "
              f"auc: {summary['auc']:.2f}")
        if args.export_mat:
            from contextaware_poseformer_tpu.data.mpi3dhp import (
                export_inference_mat,
            )

            n = len(trainer._last_pred)
            export_inference_mat(
                args.export_mat, trainer._last_pred,
                np.asarray(val_ds.seq_idx[:n]), val_ds.seq_names,
            )
            print(f"wrote {args.export_mat}")
        return summary

    state, best_p1 = trainer.fit(
        state, cfg.train.n_epochs, jax.random.PRNGKey(cfg.train.seed + 1),
        max_steps_per_epoch=args.steps_per_epoch,
        eval_batches=args.eval_batches, start_epoch=start_epoch,
    )
    print(f"best p1: {best_p1:.2f}")
    return best_p1


if __name__ == "__main__":
    main()
