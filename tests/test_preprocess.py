import os
import pickle

import numpy as np
import pytest

from contextaware_poseformer_tpu.data.preprocess import camera, h36m_labels
from contextaware_poseformer_tpu.utils import geometry


def _unit_quat(rng):
    q = rng.randn(4)
    return q / np.linalg.norm(q)


def test_world_camera_roundtrip():
    rng = np.random.RandomState(0)
    q = _unit_quat(rng)
    t = rng.randn(3)
    x = rng.randn(10, 17, 3)
    cam = camera.world_to_camera(x, q, t)
    back = camera.camera_to_world(cam, q, t)
    np.testing.assert_allclose(back, x, atol=1e-10)


def test_qrot_matches_rotation_matrix():
    # quaternion rotation must equal the equivalent matrix rotation
    theta = 0.73
    q = np.array([np.cos(theta / 2), 0.0, 0.0, np.sin(theta / 2)])  # about z
    r = np.array(
        [[np.cos(theta), -np.sin(theta), 0],
         [np.sin(theta), np.cos(theta), 0],
         [0, 0, 1]]
    )
    v = np.random.RandomState(1).randn(5, 3)
    np.testing.assert_allclose(
        camera.qrot(np.tile(q, (5, 1)), v), v @ r.T, atol=1e-12
    )


def test_project_to_2d_distortion():
    # without distortion coefficients, matches the linear pinhole
    rng = np.random.RandomState(2)
    x = rng.randn(4, 17, 3)
    x[..., 2] += 5.0
    params = np.zeros((4, 9))
    params[:, :2] = [1100.0, 1100.0]
    params[:, 2:4] = [500.0, 500.0]
    np.testing.assert_allclose(
        camera.project_to_2d(x, params),
        camera.project_to_2d_linear(x, params),
        atol=1e-9,
    )
    # radial distortion bends points away from center monotonically in k1
    params_k = params.copy()
    params_k[:, 4] = 0.1
    p0 = camera.project_to_2d(x, params)
    p1 = camera.project_to_2d(x, params_k)
    d0 = np.linalg.norm(p0 - [500, 500], axis=-1)
    d1 = np.linalg.norm(p1 - [500, 500], axis=-1)
    assert np.all(d1 >= d0 - 1e-9)


def _synthetic_sequence(n=4, seed=0):
    rng = np.random.RandomState(seed)
    cam = {"fx": 1145.0, "fy": 1143.0, "cx": 512.0, "cy": 515.0}
    pose3d = rng.randn(n, 32, 3) * 200
    pose3d[..., 2] += 5000.0
    pose2d = camera.project_to_2d_linear(
        pose3d, np.tile([cam["fx"], cam["fy"], cam["cx"], cam["cy"], 0, 0, 0, 0, 0], (n, 1))
    )
    cpn = pose2d[:, list(h36m_labels.JOINT_SUBSET)] + rng.randn(n, 17, 2)
    return h36m_labels.SequenceData(
        pose3d_camera_mm=pose3d,
        pose2d_gt=pose2d,
        pose2d_cpn=cpn,
        camera=cam,
        image_wh=(1000, 1002),
    )


def test_build_labels_structure_and_pickles(tmp_path):
    seqs = {}

    def source(s, a, sa, c):
        if a > 3 or sa > 1 or c > 2:
            return None
        key = (s, a, sa, c)
        if key not in seqs:
            seqs[key] = _synthetic_sequence(seed=hash(key) % 2**31)
        return seqs[key]

    out_train = str(tmp_path / "h36m_train.pkl")
    out_val = str(tmp_path / "h36m_validation.pkl")
    train_db, test_db = h36m_labels.build_labels(source, out_train, out_val)

    # 5 train subjects x 2 actions x 1 subaction x 2 cams x 4 frames
    assert len(train_db) == 5 * 2 * 1 * 2 * 4
    assert len(test_db) == 2 * 2 * 1 * 2 * 4

    d = train_db[0]
    assert d["joints_3d"].shape == (17, 3)
    assert np.abs(d["joints_3d"]).max() < 10  # meters, not mm
    assert d["joints_2d_cpn"].shape == (17, 2)
    assert np.abs(d["joints_2d_cpn"]).max() <= 1.5  # normalized coords
    # crop coords consistent with the affine of center/scale
    trans = geometry.get_affine_transform(d["center"], d["scale"], (192, 256))
    # un-normalize full-frame coords and re-apply the crop affine
    full = geometry.image_coordinates(d["joints_2d_cpn"], 1000, 1002)
    np.testing.assert_allclose(
        geometry.affine_transform(full, trans), d["joints_2d_cpn_crop"],
        atol=1e-3,
    )

    # the pickles round-trip through the runtime dataset loader
    from contextaware_poseformer_tpu.data.h36m import H36MDataset

    ds = H36MDataset.from_pickle(out_train, root="/nonexistent")
    assert len(ds) == len(train_db)
    assert ds.action_idx.min() >= 0 and ds.action_idx.max() < 30


def test_metadata_parser(tmp_path):
    xml = """<root><mapping>
      <mapping><cell>idx</cell><cell>idx2</cell><cell>S1</cell><cell>S5</cell></mapping>
      <mapping><cell>2</cell><cell>1</cell><cell>Directions 1</cell><cell>Directions 1</cell></mapping>
    </mapping>
    <actionnames><actionname act="2">Directions</actionname></actionnames></root>"""
    p = tmp_path / "metadata.xml"
    p.write_text(xml)
    from contextaware_poseformer_tpu.data.preprocess.h36m_metadata import (
        load_metadata,
    )

    md = load_metadata(str(p))
    assert md.get_base_filename("S1", "2", "1", md.camera_ids[0]) == \
        "Directions 1.54138969"
    assert md.action_names["2"] == "Directions"
