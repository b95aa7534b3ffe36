"""Epoch-level training/eval orchestration shared by the H36M and 3DHP
drivers (reference: ContextPose/train.py:140-213,369-412 and
ContextPose_mpi/run_3dhp.py:31-150,279-325).

The device work is two compiled functions (train/steps.py); this loop owns
data iteration, prefetch, metric aggregation, per-epoch logging, and the
best-P1 checkpoint policy.
"""

from __future__ import annotations

import dataclasses
import datetime
import json
import os
import subprocess
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from contextaware_poseformer_tpu.config import Config
from contextaware_poseformer_tpu.data import pipeline
from contextaware_poseformer_tpu.models import ContextAwarePoseFormer
from contextaware_poseformer_tpu.parallel import (
    batch_sharding,
    distributed,
    make_mesh,
    param_shardings,
    replicated,
)
from contextaware_poseformer_tpu.train import metrics as metrics_lib
from contextaware_poseformer_tpu.train import steps
from contextaware_poseformer_tpu.train.checkpoint import CheckpointManager


class MetricWriter:
    """stdout + jsonl metric sink (replacing the reference's tqdm prints and
    write-only tensorboardX writer, train.py:135-136,391-395)."""

    def __init__(self, logdir: str | None):
        self.path = None
        if logdir:
            os.makedirs(logdir, exist_ok=True)
            self.path = os.path.join(logdir, "metrics.jsonl")

    def write(self, record: dict[str, Any]) -> None:
        msg = " | ".join(
            f"{k}: {v:.4f}" if isinstance(v, float) else f"{k}: {v}"
            for k, v in record.items()
        )
        print(msg, flush=True)
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(record) + "\n")


def make_experiment_dir(logdir: str, name: str) -> str:
    """Timestamped experiment dir with a config/source snapshot — the
    reference copies its config and model sources per run
    (train.py:122-138,283-286); we snapshot the full resolved config as JSON
    plus the git commit."""
    stamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    exp = os.path.join(logdir, f"{name}@{stamp}")
    os.makedirs(exp, exist_ok=True)
    return exp


def snapshot_config(exp_dir: str, cfg: Config) -> None:
    with open(os.path.join(exp_dir, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2, default=str)
    try:
        commit = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip()
        with open(os.path.join(exp_dir, "GIT_COMMIT"), "w") as f:
            f.write(commit + "\n")
    except Exception:
        pass


class Trainer:
    def __init__(self, cfg: Config, train_ds, val_ds, logdir: str | None = None,
                 model_parallel: int = 1, experiment_dir: bool = False):
        self.cfg = cfg
        self.train_ds = train_ds
        self.val_ds = val_ds
        self.mesh = make_mesh(model_parallel=model_parallel)
        import jax.numpy as jnp

        dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
        self.model = ContextAwarePoseFormer(cfg=cfg.model, dtype=dtype)
        if logdir and experiment_dir:
            logdir = make_experiment_dir(logdir, cfg.name)
            snapshot_config(logdir, cfg)
        self.logdir = logdir
        self.steps_per_epoch = max(len(train_ds) // cfg.train.batch_size, 1)
        self.optimizer = steps.make_optimizer(cfg, self.steps_per_epoch)
        # multi-host: only process 0 writes metrics/checkpoints (the
        # reference's master-rank guard, train.py:228-237)
        self.is_main = jax.process_index() == 0
        self.writer = MetricWriter(logdir if self.is_main else None)
        self.ckpt = (
            CheckpointManager(os.path.join(logdir, "checkpoints"))
            if logdir and self.is_main else None
        )

        # lazy: inference-only quantize modes reject train-step construction,
        # and an eval-only Trainer (--eval with a *_deploy preset) never
        # needs one
        self.__train_step = None
        self._eval_step = jax.jit(steps.make_eval_step(self.model, cfg))
        # quantize="serve"/"static" needs activation calibration; done
        # lazily on the first evaluate() call (real val data). Keyed on the
        # params object so a later evaluate(other_params) re-calibrates
        # instead of silently mixing new float params with stale
        # qweights/calib scales.
        self._needs_serving = cfg.model.backbone.quantize in ("serve", "static")
        # strong reference to the calibrated params tree: identity (`is`)
        # comparison is only sound while the tree is alive — id() alone can
        # be recycled by CPython after a gc, silently skipping recalibration
        self._serving_params = None

    @property
    def _train_step(self):
        if self.__train_step is None:
            self.__train_step = jax.jit(
                steps.make_train_step(self.model, self.cfg, self.optimizer),
                donate_argnums=0,
            )
        return self.__train_step

    # -- state ---------------------------------------------------------------

    def init_state(self, rng) -> steps.TrainState:
        first = next(
            pipeline.batch_iterator(
                self.train_ds, min(self.cfg.train.batch_size, 2),
                shuffle=False, num_workers=2,
            )
        )[0]
        state = steps.init_state(self.model, self.cfg, self.optimizer, rng, first)
        pspecs = param_shardings(state.params, self.mesh)
        return steps.TrainState(
            jax.device_put(state.params, pspecs),
            jax.device_put(state.opt_state, replicated(self.mesh)),
            jax.device_put(state.step, replicated(self.mesh)),
        )

    def load_backbone(self, state: steps.TrainState, checkpoint_path: str
                      ) -> steps.TrainState:
        """COCO-pretrained backbone init (train.py:292-304)."""
        from contextaware_poseformer_tpu.models import convert

        sd = convert.load_torch_state_dict(checkpoint_path)
        skips = (
            (r"final_layer\.",)
            if self.cfg.model.backbone.kind == "hrnet"
            else (r"global_net\.predict\.", r"refine_net\.final_predict\.")
        )
        shapes = jax.tree.map(np.asarray, state.params["backbone"])
        bb = convert.convert_conv_backbone(sd, shapes, skip_patterns=skips)
        params = dict(state.params)
        params["backbone"] = jax.device_put(
            bb, param_shardings(bb, self.mesh)
        )
        return steps.TrainState(params, state.opt_state, state.step)

    # -- epochs --------------------------------------------------------------

    def _put(self, batch: steps.RawBatch) -> steps.RawBatch:
        # multi-host: each process contributes its local batch; global batch
        # = process_count x local batch (parallel/distributed.put_batch)
        return distributed.put_batch(batch, batch_sharding(self.mesh))

    def train_epoch(self, state: steps.TrainState, epoch: int, rng,
                    max_steps: int | None = None):
        host_iter = pipeline.batch_iterator(
            self.train_ds, self.cfg.train.batch_size,
            shuffle=True, seed=self.cfg.train.seed, epoch=epoch,
            num_workers=self.cfg.data.num_workers,
        )
        losses, n = [], 0
        t0 = time.time()
        for batch, valid in pipeline.device_prefetch(host_iter, self._put):
            state, m = self._train_step(state, batch, rng)
            losses.append(m["loss"])
            n += 1
            if max_steps and n >= max_steps:
                break
        mean_loss = float(np.mean([float(l) for l in losses])) if losses else float("nan")
        return state, {"train_loss": mean_loss, "epoch_time_s": time.time() - t0,
                       "steps": n}

    def _ensure_serving_ready(self, params) -> None:
        """quantize="serve"/"static" calibration from val batches (>= 64
        samples when the dataset has them); rebuilds the eval step with the
        calib/qweights collections. Called by every evaluate() implementation
        (incl. Trainer3dhp's). Re-runs whenever a DIFFERENT params tree is
        evaluated — the pre-quantized kernels and activation scales are
        derived from the params and must not outlive them."""
        if not self._needs_serving or self._serving_params is params:
            return
        from contextaware_poseformer_tpu.data import augment
        from contextaware_poseformer_tpu.models import prepare_serving

        # drop_remainder=False: tiny val sets (< batch size) still yield one
        # padded batch, which is fine for amax calibration
        it = pipeline.batch_iterator(
            self.val_ds, min(self.cfg.train.batch_size, 16),
            shuffle=False, drop_remainder=False, num_workers=2,
        )
        n_batches = max(1, -(-64 // min(self.cfg.train.batch_size, 16)))
        batches = []
        for raw, _valid in it:
            batches.append((
                augment.serving_images(
                    jnp.asarray(raw.images_u8), self.cfg.model.backbone,
                    dtype=jnp.float32,
                ),
                jnp.asarray(raw.keypoints_2d),
                jnp.asarray(raw.keypoints_2d_crop),
            ))
            if len(batches) >= n_batches:
                break
        v = prepare_serving(
            self.model, {"params": params}, batches[0], batches=batches
        )
        extra = {k: val for k, val in v.items() if k != "params"}
        # multi-host: each process calibrated from its OWN val shard above;
        # using per-rank scales would make gathered eval predictions
        # rank-count-dependent. Broadcast process 0's calib/qweights so every
        # rank serves the identical quantized model.
        extra = distributed.broadcast_pytree(extra)
        self._eval_step = jax.jit(
            steps.make_eval_step(self.model, self.cfg, extra)
        )
        self._serving_params = params

    def evaluate(self, params, max_batches: int | None = None) -> dict[str, float]:
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
            # local_rows: this process's shard rows (multi-host safe; plain
            # np.asarray on a single host)
            preds.append(distributed.local_rows(pred)[:valid])
            gts.append(distributed.local_rows(gt)[:valid])
            total += valid
            if max_batches and i + 1 >= max_batches:
                break
        # gather per-host results (reference: padded all_gather + dist_size
        # trim, train.py:216-226); val_ds is the process-LOCAL shard, so
        # action indices ride the same gather to stay aligned
        pred = distributed.allgather_hosts(np.concatenate(preds, axis=0))
        gt = distributed.allgather_hosts(np.concatenate(gts, axis=0))
        action_idx = distributed.allgather_hosts(
            np.asarray(self.val_ds.action_idx[:total])
        )
        scores = metrics_lib.h36m_evaluate(gt, pred, action_idx)
        return metrics_lib.h36m_summary(scores), scores

    def fit(self, state: steps.TrainState, n_epochs: int, rng,
            max_steps_per_epoch: int | None = None,
            eval_batches: int | None = None,
            start_epoch: int = 0):
        best_p1 = float("inf")
        for epoch in range(start_epoch, n_epochs):
            state, train_m = self.train_epoch(
                state, epoch, rng, max_steps=max_steps_per_epoch
            )
            summary, _ = self.evaluate(state.params, max_batches=eval_batches)
            lr = float(
                steps.lr_schedule(self.cfg, self.steps_per_epoch)(
                    int(state.step)
                )
            )
            record = {"epoch": epoch, "lr": lr, **train_m, **summary}
            if self.is_main:
                self.writer.write(record)
            if self.ckpt:
                self.ckpt.save(epoch, state, {"p1_mm": summary["p1_mm"]})
            best_p1 = min(best_p1, summary["p1_mm"])
        return state, best_p1
