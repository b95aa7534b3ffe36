"""Orbax checkpointing with best-metric policy and TRUE resume.

Capability upgrade over the reference (SURVEY.md section 5): the reference
saves {epoch, lr, model, optimizer} only on new-best P1 (train.py:398-407) and
has no mid-training resume path (optimizer state saved but never reloaded);
3DHP saves weights-only files with the metric mangled into the filename
(common/utils.py:241-249). Here: every save captures params + optimizer state
+ step + epoch + best metric, `latest` enables preemption-safe resume (TPU
pods preempt), and `best` tracks the reference's best-P1 policy.
"""

from __future__ import annotations

import os
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                best_fn=lambda m: -m["p1_mm"],  # smaller MPJPE is better
                best_mode="max",
            ),
        )

    def save(self, epoch: int, state, metrics: dict[str, float]) -> None:
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
            "epoch": np.asarray(epoch),
        }
        self._mgr.save(
            epoch, args=ocp.args.StandardSave(payload), metrics=dict(metrics)
        )
        self._mgr.wait_until_finished()

    def restore(self, state, epoch: int | None = None):
        """Restore into the structure of `state`; returns (state, epoch)."""
        step = self.best_epoch() if epoch == "best" else epoch
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return state, 0
        template = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
            "epoch": np.asarray(0),
        }
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template)
        )
        new_state = type(state)(
            restored["params"], restored["opt_state"], restored["step"]
        )
        return new_state, int(restored["epoch"]) + 1

    def best_epoch(self) -> int | None:
        return self._mgr.best_step()

    def latest_epoch(self) -> int | None:
        return self._mgr.latest_step()
