"""End-to-end driver test: synthetic data, tiny model, real CLI entry."""

import json
import os

import numpy as np
import pytest


pytestmark = pytest.mark.slow


def test_smoke_train_resume_eval(tmp_path):
    from contextaware_poseformer_tpu.train import train_h36m

    logdir = str(tmp_path / "run")
    args = [
        "--synthetic", "--tiny", "--batch-size", "16",
        "--steps-per-epoch", "4", "--eval-batches", "1",
        "--logdir", logdir,
    ]
    best = train_h36m.main(args + ["--epochs", "1"])
    assert np.isfinite(best)

    # metrics written
    lines = open(os.path.join(logdir, "metrics.jsonl")).read().splitlines()
    recs = [json.loads(l) for l in lines]
    assert recs[0]["epoch"] == 0 and np.isfinite(recs[0]["train_loss"])

    # checkpoint exists and resume continues at epoch 1
    best2 = train_h36m.main(args + ["--epochs", "2", "--resume"])
    recs = [json.loads(l) for l in
            open(os.path.join(logdir, "metrics.jsonl")).read().splitlines()]
    assert [r["epoch"] for r in recs] == [0, 1]

    # eval-only path returns the summary dict
    summary = train_h36m.main(args + ["--eval", "--resume"])
    assert set(summary) == {"p1_mm", "p2_mm", "mpjve_mm"}


def test_synthetic_learnability_sanity():
    """The synthetic task is learnable: short training must beat the
    untrained model by a wide margin (pipeline-wiring oracle)."""
    from contextaware_poseformer_tpu.train import train_h36m

    args = [
        "--synthetic", "--tiny", "--batch-size", "32",
        "--steps-per-epoch", "100", "--eval-batches", "2",
        "--logdir", "",
    ]
    # untrained eval baseline: random-init lifter
    base = train_h36m.main(args + ["--eval"])
    best = train_h36m.main(args + ["--epochs", "3"])
    assert best < base["p1_mm"] * 0.6, (best, base)


def test_eval_with_serve_deploy_preset(tmp_path):
    """--eval with a *_deploy preset (quantize="serve"): the Trainer
    calibrates lazily on the first evaluate() call and the eval runs int8
    layer1 end to end; train-step construction with a serve config raises."""
    import dataclasses

    import pytest as _pytest

    from contextaware_poseformer_tpu.train import train_h36m

    logdir = str(tmp_path / "run")
    args = [
        "--preset", "h36m_hrnet_32_deploy", "--synthetic", "--tiny",
        "--batch-size", "16", "--eval-batches", "1", "--logdir", logdir,
    ]
    summary = train_h36m.main(args + ["--eval"])
    assert set(summary) == {"p1_mm", "p2_mm", "mpjve_mm"}
    assert np.isfinite(summary["p1_mm"])

    # serve mode is inference-only: training with it must fail loudly
    from contextaware_poseformer_tpu import config as cfglib
    from contextaware_poseformer_tpu.train import steps

    cfg = train_h36m.make_config(train_h36m.build_argparser().parse_args(args))
    assert cfg.model.backbone.quantize == "serve"
    with _pytest.raises(ValueError, match="inference-only"):
        steps.make_train_step(None, cfg, None)


def test_on_disk_mini_h36m_eval_end_to_end(tmp_path):
    """The full production seam on REAL files (VERDICT r2 item 4): a labels
    pickle + full-frame JPEGs in the reference on-disk layout
    (s_%02d_act_%02d_subact_%02d_ca_%02d/..., human36m.py:554-584), driven
    through the real CLI — from_pickle -> threaded jpeg decode ->
    cv2.warpAffine crop -> eval step -> per-action metrics. Makes the day
    real H36M data arrives a non-event."""
    import pickle

    import cv2

    from contextaware_poseformer_tpu.data.h36m import H36MDataset
    from contextaware_poseformer_tpu.train import train_h36m
    from contextaware_poseformer_tpu.utils import geometry

    rng = np.random.RandomState(7)
    root = tmp_path / "images"
    labels = []
    full_hw = (320, 320)
    crop_hw = (64, 64)  # --tiny image_shape
    subject, action = 1, 2
    for subaction in (1, 2):
        cam = 0  # stored 0-based; directory name uses camera_id + 1
        subdir = f"s_{subject:02d}_act_{action:02d}_subact_{subaction:02d}_ca_{cam + 1:02d}"
        (root / subdir).mkdir(parents=True)
        for image_id in range(4):
            # deterministic, content-bearing frame: smooth gradients + noise
            yy, xx = np.mgrid[0:full_hw[0], 0:full_hw[1]]
            frame = np.stack([
                (xx * 255 / full_hw[1]),
                (yy * 255 / full_hw[0]),
                rng.randint(0, 256, full_hw),
            ], axis=-1).astype(np.uint8)
            name = f"{subdir}_{image_id:06d}.jpg"
            assert cv2.imwrite(str(root / subdir / name), frame,
                               [cv2.IMWRITE_JPEG_QUALITY, 92])
            center = np.asarray([160.0, 160.0]) + rng.uniform(-20, 20, 2)
            scale = np.asarray([0.64, 0.64])  # x200 -> 128px box
            kp_crop = rng.uniform(4, crop_hw[1] - 4, (17, 2))
            labels.append({
                "subject": subject, "action": action,
                "subaction": subaction, "camera_id": cam,
                "image_id": image_id, "video_id": subaction,
                "joints_3d": rng.randn(17, 3).astype(np.float32) * 0.2,
                "joints_2d_cpn": rng.uniform(-1, 1, (17, 2)).astype(np.float32),
                "joints_2d_cpn_crop": kp_crop.astype(np.float32),
                "center": center.astype(np.float32),
                "scale": scale.astype(np.float32),
            })
    lp = tmp_path / "h36m_validation.pkl"
    with open(lp, "wb") as f:
        pickle.dump(labels, f)

    # decode+warp cross-check: the cv2 production path vs the independent
    # numpy bilinear warp on the SAME decoded frame
    ds = H36MDataset.from_pickle(str(lp), str(root), crop_hw)
    assert len(ds) == 8
    img = ds.load_image(3)
    assert img.shape == (*crop_hw, 3) and img.dtype == np.uint8
    full = cv2.imread(str(root / ds.image_paths[3]))
    trans = geometry.get_affine_transform(
        ds.center[3], ds.scale[3], (crop_hw[1], crop_hw[0])
    )
    ref = geometry.warp_affine_bilinear(full, trans, (crop_hw[1], crop_hw[0]))
    diff = np.abs(img.astype(np.int32) - np.asarray(ref, np.int32))
    assert np.median(diff) <= 1 and diff.mean() < 2.0, (
        diff.mean(), np.median(diff))

    summary = train_h36m.main([
        "--eval", "--tiny", "--batch-size", "8",
        "--data-root", str(root),
        "--train-labels", str(lp), "--val-labels", str(lp),
        "--logdir", "",
    ])
    assert set(summary) == {"p1_mm", "p2_mm", "mpjve_mm"}
    assert np.isfinite(summary["p1_mm"]) and summary["p1_mm"] > 0
