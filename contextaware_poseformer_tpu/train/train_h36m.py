"""Human3.6M training / evaluation driver.

CLI equivalent of ContextPose/train.py (reference recipe: AdamW wd 0.1 over
the lifter, lr 6.4e-4 x0.99/epoch, batch 512, flip aug + flip-test eval,
best-P1 checkpointing), TPU-native: one jit'd train step over a device mesh,
threaded host loader, orbax checkpoints with true resume.

  python -m contextaware_poseformer_tpu.train.train_h36m \
      --preset h36m_hrnet_32 --data-root data/h36m/images \
      --train-labels data/h36m/h36m_train.pkl \
      --val-labels data/h36m/h36m_validation.pkl \
      --backbone-ckpt data/pretrained/coco/pose_hrnet_w32_256x192.pth

  # smoke test without data:
  python -m contextaware_poseformer_tpu.train.train_h36m --synthetic \
      --tiny --epochs 2 --steps-per-epoch 4
"""

from __future__ import annotations

import argparse
import dataclasses

import jax
import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Context-Aware PoseFormer (TPU) - H36M")
    p.add_argument(
        "--preset", default="h36m_hrnet_32",
        choices=[
            n + s
            for n in ("h36m_hrnet_32", "h36m_hrnet_48", "h36m_cpn")
            for s in ("", "_deploy")
        ],
    )
    p.add_argument("--config", default=None, help="YAML overlay path")
    p.add_argument("--eval", action="store_true", help="evaluate only")
    p.add_argument("--data-root", default=None)
    p.add_argument("--train-labels", default=None)
    p.add_argument("--val-labels", default=None)
    p.add_argument("--backbone-ckpt", default=None,
                   help="COCO-pretrained torch backbone checkpoint")
    p.add_argument("--model-ckpt", default=None,
                   help="trained torch CA_PF checkpoint to convert+load")
    p.add_argument("--logdir", default="logs/h36m")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--model-parallel", type=int, default=1)
    p.add_argument("--synthetic", action="store_true",
                   help="synthetic data smoke mode (no H36M needed)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model (synthetic smoke/testing)")
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--eval-batches", type=int, default=None)
    # multi-host (the reference's torch.distributed.launch analog): on TPU
    # pods --distributed alone auto-detects; on CPU/GPU give the rendezvous
    p.add_argument("--distributed", action="store_true",
                   help="jax.distributed multi-process run")
    p.add_argument("--coordinator", default=None,
                   help="coordinator host:port (auto-detected on TPU)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p


def setup_distributed(args):
    """Initialize multi-host collectives + report topology; called before
    any device use. Returns the topology dict (process_index/count)."""
    from contextaware_poseformer_tpu.parallel import distributed

    if not args.distributed:
        return {"process_index": 0, "process_count": 1}
    return distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )


def shard_datasets(train_ds, val_ds, topo):
    """Per-process contiguous dataset shards (the reference's per-rank label
    slicing + DistributedSampler, human36m.py:536-552 / train.py:68-71).
    Both train AND val shard: eval results ride allgather_hosts back."""
    if topo["process_count"] > 1:
        train_ds.shard(topo["process_index"], topo["process_count"])
        val_ds.shard(topo["process_index"], topo["process_count"])
    return train_ds, val_ds


def make_config(args):
    from contextaware_poseformer_tpu import config as cfglib

    # "<name>_deploy" selects deployment numerics (config.deploy) — useful
    # for --eval serving-throughput runs; training keeps fp32 presets
    cfg = cfglib.preset_or_deploy(args.preset)
    if args.config:
        cfg = cfglib.load_config(args.config, base=cfg)
    train_overrides = {}
    if args.epochs is not None:
        train_overrides["n_epochs"] = args.epochs
    if args.batch_size is not None:
        train_overrides["batch_size"] = args.batch_size
    if args.seed:
        train_overrides["seed"] = args.seed
    if train_overrides:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, **train_overrides)
        )
    data_overrides = {}
    if args.data_root:
        data_overrides["root"] = args.data_root
    if args.train_labels:
        data_overrides["train_labels_path"] = args.train_labels
    if args.val_labels:
        data_overrides["val_labels_path"] = args.val_labels
    if data_overrides:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, **data_overrides)
        )
    if args.tiny:
        from contextaware_poseformer_tpu.config import HRNetStageConfig

        w = 8
        c = (w, 2 * w, 4 * w, 8 * w)
        # shrink structure only — numerics knobs (quantize, compute dtypes,
        # fused kernels) survive so "--tiny --preset <x>_deploy" still
        # exercises the deployment modes
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model,
                backbone=dataclasses.replace(
                    cfg.model.backbone, kind="hrnet", width=w,
                    stage2=HRNetStageConfig(1, 2, (2, 2), c[:2]),
                    stage3=HRNetStageConfig(1, 3, (2, 2, 2), c[:3]),
                    stage4=HRNetStageConfig(1, 4, (2, 2, 2, 2), c),
                ),
                lifter=dataclasses.replace(
                    cfg.model.lifter,
                    embed_dim_ratio=32, depth=2, levels=4,
                ),
                image_shape=(64, 64),
            ),
        )
    return cfg


def make_datasets(cfg, args):
    if args.synthetic:
        from contextaware_poseformer_tpu.data.synthetic import (
            SyntheticPoseDataset,
        )

        train_ds = SyntheticPoseDataset(
            size=max(cfg.train.batch_size * 4, 64),
            image_shape=cfg.model.image_shape, seed=cfg.train.seed,
        )
        val_ds = SyntheticPoseDataset(
            size=max(cfg.train.batch_size * 2, 32),
            image_shape=cfg.model.image_shape, seed=cfg.train.seed + 99,
        )
        return train_ds, val_ds
    from contextaware_poseformer_tpu.data.h36m import H36MDataset

    train_ds = H36MDataset.from_pickle(
        cfg.data.train_labels_path, cfg.data.root, cfg.model.image_shape,
        frame_store=cfg.data.train_frame_store or None,
    )
    val_ds = H36MDataset.from_pickle(
        cfg.data.val_labels_path, cfg.data.root, cfg.model.image_shape,
        frame_store=cfg.data.val_frame_store or None,
    )
    return train_ds, val_ds


def main(argv=None):
    args = build_argparser().parse_args(argv)
    topo = setup_distributed(args)
    cfg = make_config(args)
    train_ds, val_ds = shard_datasets(*make_datasets(cfg, args), topo)

    from contextaware_poseformer_tpu.train.loop import Trainer

    trainer = Trainer(cfg, train_ds, val_ds, logdir=args.logdir,
                      model_parallel=args.model_parallel)
    print(f"devices: {jax.devices()} | mesh: {dict(trainer.mesh.shape)}")
    state = trainer.init_state(jax.random.PRNGKey(cfg.train.seed))

    n_lifter = sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(state.params["lifter"])
    )
    print(f"Trainable parameter count: {n_lifter}")  # train.py:358-359

    if args.backbone_ckpt:
        state = trainer.load_backbone(state, args.backbone_ckpt)
        print(f"Loaded backbone from {args.backbone_ckpt}")
    if args.model_ckpt:
        from contextaware_poseformer_tpu.models import convert

        sd = convert.load_torch_state_dict(args.model_ckpt)
        full = convert.convert_composite(
            sd,
            jax.tree.map(np.asarray, state.params["backbone"]),
            depth=cfg.model.lifter.depth,
            levels=cfg.model.lifter.levels,
            use_deformable=cfg.model.lifter.use_deformable,
            backbone_kind=cfg.model.backbone.kind,
        )
        from contextaware_poseformer_tpu.parallel import param_shardings

        state = state._replace(
            params=jax.device_put(full, param_shardings(full, trainer.mesh))
        )
        print(f"Loaded full model from {args.model_ckpt}")

    start_epoch = 0
    if args.resume and trainer.ckpt:
        state, start_epoch = trainer.ckpt.restore(state)
        print(f"Resumed from epoch {start_epoch - 1}")

    if args.eval:
        summary, scores = trainer.evaluate(
            state.params, max_batches=args.eval_batches
        )
        for action, s in scores.items():
            print(
                f"{action}: p1={s['MPJPE']*1000:.2f}, p2={s['P_MPJPE']*1000:.2f}, "
                f"e_vel={s['MPJVE']*1000:.2f}"
            )
        print(
            "avg p1:", round(summary["p1_mm"], 1),
            "p2:", round(summary["p2_mm"], 1),
            "MPJVE:", round(summary["mpjve_mm"], 2),
        )
        return summary

    state, best_p1 = trainer.fit(
        state,
        cfg.train.n_epochs,
        jax.random.PRNGKey(cfg.train.seed + 1),
        max_steps_per_epoch=args.steps_per_epoch,
        eval_batches=args.eval_batches,
        start_epoch=start_epoch,
    )
    print(f"best p1: {best_p1:.2f} mm")
    return best_p1


if __name__ == "__main__":
    main()
