import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from contextaware_poseformer_tpu.config import (
    Config,
    DataConfig,
    LifterConfig,
    ModelConfig,
    TrainConfig,
)
from contextaware_poseformer_tpu.models import ContextAwarePoseFormer
from contextaware_poseformer_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
)
from contextaware_poseformer_tpu.train import steps

from test_hrnet import tiny_cfg


def small_cfg(batch_size=8) -> Config:
    return Config(
        model=ModelConfig(
            backbone=tiny_cfg(width=8),
            lifter=LifterConfig(embed_dim_ratio=32, depth=2, levels=4,
                                num_heads=8),
            image_shape=(64, 64),
        ),
        data=DataConfig(dataset="human36m"),
        train=TrainConfig(batch_size=batch_size, lr=1e-3, flip_test=True),
    )


def make_raw_batch(rng, b, hw=(64, 64)):
    return steps.RawBatch(
        images_u8=jnp.asarray(
            rng.randint(0, 256, (b, *hw, 3)).astype(np.uint8)
        ),
        keypoints_3d=jnp.asarray(rng.randn(b, 17, 3).astype(np.float32) * 0.1),
        keypoints_2d=jnp.asarray(
            rng.uniform(-1, 1, (b, 17, 2)).astype(np.float32)
        ),
        keypoints_2d_crop=jnp.asarray(
            rng.uniform(0, 64, (b, 17, 2)).astype(np.float32)
        ),
    )


@pytest.mark.slow
@pytest.mark.parametrize("model_parallel", [1, 2])
def test_sharded_train_step_runs_and_learns(model_parallel):
    assert len(jax.devices()) == 8
    mesh = make_mesh(model_parallel=model_parallel)
    cfg = small_cfg()
    model = ContextAwarePoseFormer(cfg=cfg.model)
    optimizer = steps.make_optimizer(cfg, steps_per_epoch=100)

    rng = np.random.RandomState(0)
    raw = make_raw_batch(rng, cfg.train.batch_size)
    state = steps.init_state(model, cfg, optimizer, jax.random.PRNGKey(0), raw)

    pspecs = param_shardings(state.params, mesh)
    state = steps.TrainState(
        jax.device_put(state.params, pspecs),
        jax.device_put(state.opt_state, replicated(mesh))
        if model_parallel == 1
        else state.opt_state,
        jax.device_put(state.step, replicated(mesh)),
    )
    raw = jax.device_put(raw, batch_sharding(mesh))

    train_step = jax.jit(steps.make_train_step(model, cfg, optimizer),
                         donate_argnums=0)
    key = jax.random.PRNGKey(42)

    losses_seen = []
    for _ in range(5):
        state, m = train_step(state, raw, key)
        losses_seen.append(float(m["loss"]))
        assert bool(m["finite"])
    # optimizing the same batch must reduce the loss
    assert losses_seen[-1] < losses_seen[0]
    # backbone stayed exactly frozen (both grad-zero AND no weight decay)
    # while lifter moved
    assert int(state.step) == 5


@pytest.mark.slow
def test_frozen_backbone_unchanged_by_adamw():
    cfg = small_cfg(batch_size=4)
    model = ContextAwarePoseFormer(cfg=cfg.model)
    optimizer = steps.make_optimizer(cfg, steps_per_epoch=10)
    rng = np.random.RandomState(1)
    raw = make_raw_batch(rng, 4)
    state = steps.init_state(model, cfg, optimizer, jax.random.PRNGKey(0), raw)
    bb0 = jax.tree.map(np.asarray, state.params["backbone"])
    lf0 = jax.tree.map(np.asarray, state.params["lifter"])

    train_step = jax.jit(steps.make_train_step(model, cfg, optimizer))
    state, _ = train_step(state, raw, jax.random.PRNGKey(7))
    state, _ = train_step(state, raw, jax.random.PRNGKey(7))

    bb1 = state.params["backbone"]
    changed = [
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(bb0), jax.tree.leaves(bb1))
    ]
    assert not any(changed), "backbone must not move (grads AND weight decay)"
    lf1 = state.params["lifter"]
    moved = [
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(lf0), jax.tree.leaves(lf1))
    ]
    assert any(moved), "lifter must train"


def test_eval_step_flip_test_and_gather():
    mesh = make_mesh(model_parallel=1)
    cfg = small_cfg()
    model = ContextAwarePoseFormer(cfg=cfg.model)
    optimizer = steps.make_optimizer(cfg, steps_per_epoch=10)
    rng = np.random.RandomState(2)
    raw = make_raw_batch(rng, 8)
    state = steps.init_state(model, cfg, optimizer, jax.random.PRNGKey(0), raw)

    params = jax.device_put(state.params, replicated(mesh))
    raw = jax.device_put(raw, batch_sharding(mesh))
    eval_step = jax.jit(steps.make_eval_step(model, cfg))
    pred, gt = eval_step(params, raw)
    assert pred.shape == (8, 17, 3) and gt.shape == (8, 17, 3)
    # gathers to host cleanly (the all-gather analog of train.py:216-226)
    pred_np = np.asarray(jax.device_get(pred))
    assert np.isfinite(pred_np).all()
    # root stays centered in GT
    assert np.abs(np.asarray(gt)[:, 0]).max() == 0.0


def test_lr_schedule_matches_reference_decay():
    cfg = small_cfg()
    sched = steps.lr_schedule(cfg, steps_per_epoch=100)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(99)) == pytest.approx(1e-3)
    assert float(sched(100)) == pytest.approx(1e-3 * 0.99)
    assert float(sched(500)) == pytest.approx(1e-3 * 0.99**5)

    # 3DHP-style large decay
    cfg3 = Config(
        model=cfg.model,
        train=TrainConfig(lr=7e-4, lr_decay=0.97, large_decay_epoch=3,
                          lr_decay_large=0.5),
    )
    sched3 = steps.lr_schedule(cfg3, steps_per_epoch=10)
    assert float(sched3(35)) == pytest.approx(7e-4 * 0.97**3 * 0.5)


def test_folded_flip_test_equals_two_pass():
    """The batched flip-test (one 2B forward) must equal the reference's
    two-forward formulation exactly."""
    import dataclasses
    from contextaware_poseformer_tpu.data import augment
    from contextaware_poseformer_tpu.train.steps import Task

    cfg = small_cfg(batch_size=4)
    model = ContextAwarePoseFormer(cfg=cfg.model)
    optimizer = steps.make_optimizer(cfg, steps_per_epoch=10)
    rng = np.random.RandomState(5)
    raw = make_raw_batch(rng, 4)
    state = steps.init_state(model, cfg, optimizer, jax.random.PRNGKey(0), raw)

    eval_step = jax.jit(steps.make_eval_step(model, cfg))
    pred_folded, gt = eval_step(state.params, raw)

    # manual two-pass
    task = Task.for_config(cfg)
    batch = augment.Batch(
        images=augment.normalize_images(raw.images_u8, "hrnet"),
        keypoints_3d=augment.root_center(raw.keypoints_3d, task.root_idx),
        keypoints_2d=raw.keypoints_2d,
        keypoints_2d_crop=raw.keypoints_2d_crop,
    )
    fwd = lambda b: model.apply(  # noqa: E731
        {"params": state.params}, b.images, b.keypoints_2d, b.keypoints_2d_crop
    )
    p1 = fwd(batch)
    p2 = fwd(augment.flip_test_inputs(batch, task.flip_perm, task.crop_width))
    pred_two = augment.flip_test_merge(p1, p2, task.flip_perm)
    np.testing.assert_allclose(
        np.asarray(pred_folded), np.asarray(pred_two), rtol=1e-5, atol=1e-6
    )


@pytest.mark.slow
def test_erase_aug_train_step():
    import dataclasses

    cfg = small_cfg(batch_size=4)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, erase_aug=True,
                                       erase_size=8, flip_aug=False)
    )
    model = ContextAwarePoseFormer(cfg=cfg.model)
    optimizer = steps.make_optimizer(cfg, steps_per_epoch=10)
    rng = np.random.RandomState(6)
    raw = make_raw_batch(rng, 4)
    state = steps.init_state(model, cfg, optimizer, jax.random.PRNGKey(0), raw)
    train_step = jax.jit(steps.make_train_step(model, cfg, optimizer))
    state, m = train_step(state, raw, jax.random.PRNGKey(9))
    assert bool(m["finite"]) and np.isfinite(float(m["loss"]))
