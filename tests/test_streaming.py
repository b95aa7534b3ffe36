import numpy as np
import jax
import pytest

from contextaware_poseformer_tpu.config import ModelConfig, LifterConfig
from contextaware_poseformer_tpu.models import ContextAwarePoseFormer
from contextaware_poseformer_tpu.models.streaming import (
    StreamingConfig,
    StreamingLifter,
)

from test_hrnet import tiny_cfg


def _setup():
    cfg = ModelConfig(
        backbone=tiny_cfg(width=8),
        lifter=LifterConfig(embed_dim_ratio=32, depth=1, levels=4,
                            sampler="gather"),
        image_shape=(64, 64),
    )
    model = ContextAwarePoseFormer(cfg=cfg)
    rng = np.random.RandomState(0)
    imgs = np.zeros((1, 64, 64, 3), np.float32)
    kp = rng.uniform(-1, 1, (1, 17, 2)).astype(np.float32)
    kpc = rng.uniform(0, 64, (1, 17, 2)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), imgs, kp, kpc)
    return cfg, params


@pytest.mark.slow
def test_lift_batch_with_padding():
    cfg, params = _setup()
    sl = StreamingLifter(cfg, params,
                         StreamingConfig(batch_size=4, use_bf16=False))
    rng = np.random.RandomState(1)
    n = 6  # not divisible by batch_size -> padding path
    frames = rng.randint(0, 255, (n, 64, 64, 3)).astype(np.uint8)
    kp_full = rng.uniform(100, 900, (n, 17, 2))
    centers = np.full((n, 2), 500.0)
    scales = np.full((n, 2), 1.0)
    out = sl.lift_batch(frames, kp_full, (1000, 1000), centers, scales)
    assert out.shape == (6, 17, 3)
    assert np.isfinite(out).all()
    # padded path must give identical results to exact-batch path
    sl2 = StreamingLifter(cfg, params,
                          StreamingConfig(batch_size=6, use_bf16=False))
    out2 = sl2.lift_batch(frames, kp_full, (1000, 1000), centers, scales)
    np.testing.assert_allclose(out, out2, rtol=1e-4, atol=1e-5)


def test_stream_multi_camera_ema():
    cfg, params = _setup()
    sl = StreamingLifter(
        cfg, params,
        StreamingConfig(batch_size=4, use_bf16=False, ema_alpha=0.5),
    )
    rng = np.random.RandomState(2)

    def gen():
        for t in range(3):
            for cam in range(2):
                frame = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
                kp = rng.uniform(100, 900, (17, 2))
                yield cam, frame, kp

    cs = lambda cam: (np.array([500.0, 500.0]), np.array([1.0, 1.0]))  # noqa
    results = list(sl.stream(gen(), (1000, 1000), cs))
    assert len(results) == 6
    cams = [c for c, _ in results]
    assert sorted(set(cams)) == [0, 1]
    for _, pose in results:
        assert pose.shape == (17, 3) and np.isfinite(pose).all()


@pytest.mark.slow
def test_streaming_serve_mode_requires_and_uses_prepare():
    """quantize='serve' streaming: lift_batch refuses before prepare(); after
    prepare() (calibration + weight pre-quantization on real frames) the
    pipeline runs and stays close to the float path."""
    import dataclasses

    import pytest

    cfg, params = _setup()
    scfg = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, quantize="serve")
    )
    rng = np.random.RandomState(3)
    n = 4
    frames = rng.randint(0, 255, (n, 64, 64, 3)).astype(np.uint8)
    kp_full = rng.uniform(100, 900, (n, 17, 2))
    centers = np.full((n, 2), 500.0)
    scales = np.full((n, 2), 1.0)

    sl = StreamingLifter(scfg, dict(params),
                         StreamingConfig(batch_size=4, use_bf16=False))
    with pytest.raises(ValueError, match="prepare"):
        sl.lift_batch(frames, kp_full, (1000, 1000), centers, scales)

    sl.prepare(frames, kp_full, (1000, 1000), centers, scales)
    out = sl.lift_batch(frames, kp_full, (1000, 1000), centers, scales)
    assert out.shape == (n, 17, 3)
    assert np.isfinite(out).all()

    base = StreamingLifter(cfg, params,
                           StreamingConfig(batch_size=4, use_bf16=False))
    ref = base.lift_batch(frames, kp_full, (1000, 1000), centers, scales)
    # int8 layer1 noise stays small relative to the output scale
    scale = np.abs(ref).mean() + 1e-9
    assert np.abs(out - ref).max() / scale < 0.5


def test_latency_stats_windowed_frames():
    """frames_per_sec must be computed over the SAME trimmed window as the
    latency percentiles (ADVICE r2): after >4096 recorded batches the
    all-time frame count must not inflate throughput."""
    cfg, params = _setup()
    sl = StreamingLifter(cfg, params,
                         StreamingConfig(batch_size=4, use_bf16=False))
    # 5000 batches of 4 frames at exactly 10 ms each -> 400 frames/sec
    for _ in range(5000):
        sl._record_latency(10.0, 4)
    stats = sl.latency_stats()
    assert stats["n"] == 4096
    np.testing.assert_allclose(stats["frames_per_sec"], 400.0, rtol=1e-6)
    np.testing.assert_allclose(stats["p50_ms"], 10.0, rtol=1e-6)
