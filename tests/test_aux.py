"""Tests for the auxiliary additions: legacy losses, 2D PCKh, erase/gamma
augmentation, profiling utilities."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from contextaware_poseformer_tpu.data import augment
from contextaware_poseformer_tpu.train import losses, metrics
from contextaware_poseformer_tpu.utils import profiling


def test_volumetric_ce_loss():
    b, j, v = 2, 3, 4
    xs = np.linspace(-1, 1, v)
    grid = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
    coord_volumes = np.tile(grid[None], (b, 1, 1, 1, 1)).astype(np.float32)
    # gt exactly at voxel (1, 2, 3)
    gt = np.tile(grid[1, 2, 3][None, None], (b, j, 1)).astype(np.float32)
    vol = np.full((b, j, v, v, v), 1e-8, np.float32)
    vol[:, :, 1, 2, 3] = 1.0  # all mass at the right voxel
    validity = np.ones((b, j, 1), np.float32)
    loss = float(losses.volumetric_ce_loss(
        jnp.asarray(coord_volumes), jnp.asarray(vol), jnp.asarray(gt),
        jnp.asarray(validity),
    ))
    assert loss < 1e-5
    # mass elsewhere -> large loss
    vol2 = np.full((b, j, v, v, v), 1e-8, np.float32)
    vol2[:, :, 0, 0, 0] = 1.0
    loss2 = float(losses.volumetric_ce_loss(
        jnp.asarray(coord_volumes), jnp.asarray(vol2), jnp.asarray(gt),
        jnp.asarray(validity),
    ))
    assert loss2 > 5.0


def test_uncertainty_loss_monotone_in_sigma():
    rng = np.random.RandomState(0)
    pred = jnp.asarray(rng.randn(4, 17, 3).astype(np.float32))
    gt = jnp.asarray(rng.randn(4, 17, 3).astype(np.float32))
    small = jnp.full((4, 17, 1), 0.1)
    big = jnp.full((4, 17, 1), 10.0)
    l_small = float(losses.uncertainty_loss([small], pred, gt))
    l_big = float(losses.uncertainty_loss([big], pred, gt))
    assert l_small > l_big  # big sigma discounts the error term


def test_limb_length_error_reference_connectivity():
    rng = np.random.RandomState(1)
    gt = jnp.asarray(rng.randn(4, 17, 3).astype(np.float32))
    assert float(losses.limb_length_error(gt, gt)) == 0.0
    assert float(losses.limb_length_error(gt * 2.0, gt)) > 0.0


def test_pckh_2d():
    gt = np.zeros((10, 17, 2))
    pred = gt.copy()
    pred[:, 0, 0] = 100.0  # joint 0 always off by 100px
    out = metrics.pckh_2d(pred, gt, headsize=19.2, thresholds=(0.5, 10.0))
    assert out[0.5]["per_joint"][0] == 0.0
    assert out[0.5]["per_joint"][1] == 1.0
    assert abs(out[0.5]["mean"] - 16 / 17) < 1e-9
    assert out[10.0]["mean"] == 1.0  # 192px threshold catches the 100px miss


def test_erase_regions():
    rng = np.random.RandomState(2)
    imgs = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    centers = jnp.asarray([[[16.0, 16.0]], [[-5.0, 10.0]]])  # 2nd off-image
    out = augment.erase_regions(imgs, centers, size=8, use_mean=False)
    out = np.asarray(out)
    assert out[0, 16, 16].sum() == 0.0  # erased
    assert out[0, 0, 0].sum() > 0.0  # untouched corner
    np.testing.assert_array_equal(out[1], np.asarray(imgs[1]))  # skipped

    out_mean = np.asarray(
        augment.erase_regions(imgs, centers, size=8, use_mean=True)
    )
    region = np.asarray(imgs)[0, 12:21, 12:21]
    np.testing.assert_allclose(out_mean[0, 16, 16], region.mean(axis=(0, 1)),
                               rtol=1e-5)


def test_gamma_correct():
    img = jnp.full((1, 4, 4, 3), 128.0)
    out = np.asarray(augment.gamma_correct(img, 2.0))
    np.testing.assert_allclose(out, (128 / 255) ** 2 * 255, rtol=1e-6)
    # gamma < 1 brightens
    assert np.all(np.asarray(augment.gamma_correct(img, 0.5)) > 128.0)


def test_sustained_timer_and_trace(tmp_path):
    f = jax.jit(lambda x: x * 2 + 1)

    res = profiling.sustained_timer(
        f, lambda i: (jnp.full((8, 8), float(i)),), iters=3, bursts=2
    )
    assert res["sec_per_iter"] > 0 and np.isfinite(res["iters_per_sec"])

    logdir = str(tmp_path / "trace")
    with profiling.trace(logdir):
        jax.block_until_ready(f(jnp.ones((8, 8))))
    assert os.path.exists(logdir)

    prof = profiling.StepWindowProfiler(str(tmp_path / "w"), start=1, stop=2)
    for _ in range(3):
        jax.block_until_ready(f(jnp.ones((4, 4))))
        prof.step()
    prof.close()
    assert os.path.exists(str(tmp_path / "w"))


def test_deploy_preset_and_suffix():
    from contextaware_poseformer_tpu import config as cfglib

    base = cfglib.preset("h36m_hrnet_32")
    dep = cfglib.deploy(base)
    assert dep.model.compute_dtype == "bfloat16"
    assert dep.model.backbone.quantize == "serve"
    assert dep.model.lifter.compute_dtype == "bfloat16"
    assert dep.model.lifter.sampler_precision == "default"
    assert dep.model.lifter.attention == "fused"
    # training recipe untouched
    assert dep.train == base.train

    via_suffix = cfglib.preset_or_deploy("h36m_hrnet_32_deploy")
    assert via_suffix == dep
    assert cfglib.preset_or_deploy("h36m_hrnet_32") == base
