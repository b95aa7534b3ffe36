import numpy as np
import pytest

import jax
import jax.numpy as jnp

from contextaware_poseformer_tpu.config import LifterConfig, ModelConfig
from contextaware_poseformer_tpu.models import ContextAwarePoseFormer
from contextaware_poseformer_tpu.models.capf import crop_coords_to_grid

from test_hrnet import tiny_cfg


def small_model_cfg():
    return ModelConfig(
        backbone=tiny_cfg(width=8),
        lifter=LifterConfig(embed_dim_ratio=32, depth=2, levels=4),
        image_shape=(64, 64),
    )


def test_crop_coord_normalization_matches_reference():
    # conpose.py:34-35: divide by [192//2, 256//2] then subtract 1
    kp = jnp.asarray([[[0.0, 0.0], [96.0, 128.0], [191.0, 255.0]]])
    out = np.asarray(crop_coords_to_grid(kp, (256, 192)))
    np.testing.assert_allclose(
        out, [[[-1.0, -1.0], [0.0, 0.0], [191 / 96 - 1, 255 / 128 - 1]]],
        rtol=1e-6,
    )


@pytest.mark.slow
def test_composite_forward_and_frozen_backbone():
    cfg = small_model_cfg()
    model = ContextAwarePoseFormer(cfg=cfg)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    kp = jnp.asarray(rng.uniform(-1, 1, (2, 17, 2)).astype(np.float32))
    kpc = jnp.asarray(rng.uniform(0, 64, (2, 17, 2)).astype(np.float32))

    params = model.init(jax.random.PRNGKey(0), imgs, kp, kpc)
    out = model.apply(params, imgs, kp, kpc)
    assert out.shape == (2, 17, 3)
    assert np.isfinite(np.asarray(out)).all()

    # frozen backbone: loss grads must vanish on backbone params and be
    # nonzero on lifter params
    def loss(p):
        return jnp.mean(model.apply(p, imgs, kp, kpc) ** 2)

    g = jax.grad(loss)(params)["params"]
    bb = jax.tree.leaves(g["backbone"])
    lf = jax.tree.leaves(g["lifter"])
    assert all(float(jnp.abs(x).max()) == 0.0 for x in bb)
    assert any(float(jnp.abs(x).max()) > 0.0 for x in lf)


def test_composite_bf16_backbone():
    cfg = small_model_cfg()
    model = ContextAwarePoseFormer(cfg=cfg, dtype=jnp.bfloat16)
    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    kp = jnp.asarray(rng.uniform(-1, 1, (2, 17, 2)).astype(np.float32))
    kpc = jnp.asarray(rng.uniform(0, 64, (2, 17, 2)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), imgs, kp, kpc)
    out = model.apply(params, imgs, kp, kpc)
    assert out.dtype == jnp.float32  # lifter stays fp32
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_cpn_composite_through_eval_step():
    """CPN preset wiring through the compiled eval step (small input)."""
    import dataclasses

    from contextaware_poseformer_tpu.config import (
        Config, DataConfig, LifterConfig, ModelConfig, TrainConfig,
        cpn_backbone,
    )
    from contextaware_poseformer_tpu.train import steps

    cfg = Config(
        model=ModelConfig(
            backbone=cpn_backbone(),
            lifter=LifterConfig(embed_dim_ratio=32, depth=1, levels=4),
            image_shape=(64, 64),
        ),
        data=DataConfig(dataset="human36m"),
        train=TrainConfig(batch_size=2, flip_test=True),
    )
    model = ContextAwarePoseFormer(cfg=cfg.model)
    optimizer = steps.make_optimizer(cfg, steps_per_epoch=10)
    rng = np.random.RandomState(0)
    raw = steps.RawBatch(
        images_u8=jnp.asarray(rng.randint(0, 256, (2, 64, 64, 3)).astype(np.uint8)),
        keypoints_3d=jnp.asarray(rng.randn(2, 17, 3).astype(np.float32) * 0.1),
        keypoints_2d=jnp.asarray(rng.uniform(-1, 1, (2, 17, 2)).astype(np.float32)),
        keypoints_2d_crop=jnp.asarray(rng.uniform(0, 64, (2, 17, 2)).astype(np.float32)),
    )
    state = steps.init_state(model, cfg, optimizer, jax.random.PRNGKey(0), raw)
    pred, gt = jax.jit(steps.make_eval_step(model, cfg))(state.params, raw)
    assert pred.shape == (2, 17, 3)
    assert np.isfinite(np.asarray(pred)).all()


@pytest.mark.slow
def test_composite_bf16_deploy_path():
    """Full deployment numerics (bf16 backbone + bf16 lifter stream) stays
    close to the fp32 parity path on the same params; output is fp32 (head
    and LayerNorms always compute in fp32)."""
    import dataclasses

    cfg = small_model_cfg()
    deploy = dataclasses.replace(
        cfg, lifter=dataclasses.replace(cfg.lifter, compute_dtype="bfloat16")
    )
    rng = np.random.RandomState(2)
    imgs = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    kp = jnp.asarray(rng.uniform(-1, 1, (2, 17, 2)).astype(np.float32))
    kpc = jnp.asarray(rng.uniform(0, 64, (2, 17, 2)).astype(np.float32))

    m32 = ContextAwarePoseFormer(cfg=cfg)
    params = m32.init(jax.random.PRNGKey(0), imgs, kp, kpc)
    out32 = m32.apply(params, imgs, kp, kpc)

    m16 = ContextAwarePoseFormer(cfg=deploy)
    out16 = m16.apply(params, imgs, kp, kpc)
    assert out16.dtype == jnp.float32
    # bf16 stream through 12 blocks: loose tolerance; trained-model P1 deltas
    # measured at <0.1 mm (PERF.md deploy-numerics note)
    np.testing.assert_allclose(
        np.asarray(out16), np.asarray(out32), rtol=0.1, atol=0.02
    )


@pytest.mark.slow
def test_prepare_serving_stale_qweights_guard():
    """prepare_serving stamps a params fingerprint (qmeta) and fails loudly
    when handed stored qweights prepared for a DIFFERENT params tree
    (VERDICT r2 item 7: the stale-kernel hazard of prepare_int8_weights)."""
    import dataclasses

    from contextaware_poseformer_tpu.models import prepare_serving
    from contextaware_poseformer_tpu.models.backbone_common import (
        check_serving_fresh,
    )

    cfg = small_model_cfg()
    cfg = dataclasses.replace(
        cfg,
        backbone=dataclasses.replace(cfg.backbone, quantize="static"),
        lifter=dataclasses.replace(cfg.lifter, sampler="gather"),
    )
    model = ContextAwarePoseFormer(cfg=cfg)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    kp = jnp.asarray(rng.uniform(-1, 1, (2, 17, 2)).astype(np.float32))
    kpc = jnp.asarray(rng.uniform(0, 64, (2, 17, 2)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), imgs, kp, kpc)

    prepared = prepare_serving(model, variables, (imgs, kp, kpc))
    assert prepared.get("qweights"), "static tiny cfg should quantize convs"
    assert "params_fingerprint" in prepared["qmeta"]

    # the extra qmeta collection must not break model application
    out = model.apply(prepared, imgs, kp, kpc)
    assert np.isfinite(np.asarray(out)).all()

    # same params: re-preparing with the stored collections is fine
    check_serving_fresh(prepared)
    prepare_serving(model, prepared, (imgs, kp, kpc))

    # different params under the SAME stored qweights: loud failure
    new_params = {
        **prepared["params"],
        "backbone": jax.tree.map(
            lambda x: x * 1.01, prepared["params"]["backbone"]
        ),
    }
    stale = {**prepared, "params": new_params}
    with pytest.raises(ValueError, match="stale serving"):
        check_serving_fresh(stale)
    with pytest.raises(ValueError, match="stale serving"):
        prepare_serving(model, stale, (imgs, kp, kpc))


@pytest.mark.slow
def test_cpn_native_pyramid_composite_closeness():
    """cpn_native_pyramid end to end: same params, the lifter samples the
    native /32../4 pyramid instead of the /4-materialized one. Deviation
    exists only inside fine cells straddling a coarse-grid crease
    (config.BackboneConfig docstring); bound it here on random weights so a
    regression in the coordinate convention (per-level align-corners
    unnormalize) shows up as a large error, while the genuine crease
    smoothing stays small."""
    import dataclasses

    from contextaware_poseformer_tpu.config import (
        Config, DataConfig, LifterConfig, ModelConfig, TrainConfig,
        cpn_backbone,
    )

    def mk(native):
        return ModelConfig(
            backbone=dataclasses.replace(
                cpn_backbone(), cpn_native_pyramid=native
            ),
            lifter=LifterConfig(embed_dim_ratio=32, depth=1, levels=4),
            image_shape=(64, 64),
        )

    rng = np.random.RandomState(5)
    imgs = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    kp = jnp.asarray(rng.uniform(-1, 1, (2, 17, 2)).astype(np.float32))
    kpc = jnp.asarray(rng.uniform(0, 64, (2, 17, 2)).astype(np.float32))

    m_ref = ContextAwarePoseFormer(cfg=mk(False))
    params = m_ref.init(jax.random.PRNGKey(0), imgs, kp, kpc)
    out_ref = np.asarray(m_ref.apply(params, imgs, kp, kpc))

    m_nat = ContextAwarePoseFormer(cfg=mk(True))
    out_nat = np.asarray(m_nat.apply(params, imgs, kp, kpc))

    scale = np.sqrt(np.mean(out_ref**2))
    rel = np.abs(out_nat - out_ref) / scale
    # coordinate-convention bugs produce rel ~O(1); crease smoothing on
    # random weights measured well under this bound
    assert rel.max() < 0.2, rel.max()
    assert rel.mean() < 0.02, rel.mean()
