import os

import numpy as np

from contextaware_poseformer_tpu.utils import visualization as vis


def _sample():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (256, 192, 3)).astype(np.uint8)
    kp = rng.uniform([10, 10], [180, 245], (17, 2)).astype(np.float32)
    return img, kp


def test_draw_pose_2d_paints_in_place_copy():
    img, kp = _sample()
    out = vis.draw_pose_2d(img, kp)
    assert out.shape == img.shape
    assert not np.array_equal(out, img)  # painted something
    # original untouched
    assert img.max() < 256


def test_draw_offsets_weights():
    img, kp = _sample()
    rng = np.random.RandomState(1)
    samples = kp[:, None] + rng.uniform(-20, 20, (17, 16, 2))
    w = np.abs(rng.randn(17, 16))
    w /= w.sum(-1, keepdims=True)
    out = vis.draw_offsets(img, kp, samples, w, joint=3)
    assert out.shape == img.shape and not np.array_equal(out, img)


def test_render_pose_3d_and_grid(tmp_path):
    rng = np.random.RandomState(2)
    pose = rng.randn(17, 3) * 0.2
    p = vis.render_pose_3d(pose, str(tmp_path / "pose.png"), gt_3d=pose * 1.1)
    assert os.path.exists(p) and os.path.getsize(p) > 1000

    img, kp = _sample()
    path = vis.render_prediction_grid(
        np.stack([img, img]), np.stack([kp, kp]),
        rng.randn(2, 17, 3) * 0.2, str(tmp_path / "grid.png"),
        gts_3d=rng.randn(2, 17, 3) * 0.2,
    )
    assert os.path.exists(path) and os.path.getsize(path) > 1000


def test_render_animation_gif(tmp_path):
    from contextaware_poseformer_tpu.utils.visualization import (
        render_animation,
    )

    rng = np.random.RandomState(0)
    poses = rng.randn(3, 17, 3).astype(np.float32) * 0.1
    frames = rng.randint(0, 255, (3, 32, 32, 3)).astype(np.uint8)
    out = render_animation(poses, str(tmp_path / "seq.gif"),
                           frames_bgr=frames, gts_3d=poses + 0.01, fps=5)
    assert os.path.exists(out) and os.path.getsize(out) > 0
