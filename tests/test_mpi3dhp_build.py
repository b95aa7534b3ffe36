import os

import numpy as np
import pytest

from contextaware_poseformer_tpu.data import mpi3dhp
from contextaware_poseformer_tpu.data.preprocess import mpi3dhp_build as B

scio = pytest.importorskip("scipy.io")
h5py = pytest.importorskip("h5py")


def _write_fake_train(root):
    rng = np.random.RandomState(0)
    # shrink the frame budget for the test
    B.SEQUENCE_INFO["1 1"] = (5, 25)
    d = os.path.join(root, "S1", "Seq1")
    os.makedirs(d)
    annot2 = np.empty((14, 1), dtype=object)
    annot3 = np.empty((14, 1), dtype=object)
    for cam in range(14):
        annot2[cam, 0] = rng.uniform(0, 2048, (8, 28 * 2))
        a3 = rng.randn(8, 28 * 3) * 100 + 500
        a3[:, 2::3] = np.abs(a3[:, 2::3]) + 3000  # positive depth
        annot3[cam, 0] = a3
    scio.savemat(os.path.join(d, "annot.mat"),
                 {"annot2": annot2, "univ_annot3": annot3,
                  "cameras": np.arange(14)[None]})


def _write_fake_test(root):
    rng = np.random.RandomState(1)
    for seq in ("TS1", "TS5"):
        d = os.path.join(root, seq)
        os.makedirs(d)
        with h5py.File(os.path.join(d, "annot_data.mat"), "w") as f:
            n = 6
            f["valid_frame"] = np.array([1, 0, 1, 1, 0, 1]).reshape(n, 1)
            f["annot2"] = rng.uniform(0, 1900, (n, 1, 17, 2))
            a3 = rng.randn(n, 1, 17, 3) * 100 + 500
            a3[..., 2] = np.abs(a3[..., 2]) + 3000
            f["univ_annot3"] = a3


def test_train_builder_roundtrip(tmp_path):
    _write_fake_train(str(tmp_path))
    out = str(tmp_path / "data_train_3dhp.npz")
    dic = B.build_train_npz(str(tmp_path), out)
    assert "S1 Seq1" in dic
    cams = dic["S1 Seq1"][0]
    assert set(cams) == {str(c) for c in B.CAM_SET}
    assert cams["0"]["data_2d"].shape == (5, 17, 2)  # frame-count clamped
    assert cams["0"]["data_3d"].shape == (5, 17, 3)

    # consumable by the runtime loader
    ds = mpi3dhp.load_train(out, str(tmp_path))
    assert len(ds) == 5 * len(B.CAM_SET)
    assert np.abs(ds.joints_3d[:, 14]).max() == 0.0


def test_test_builder_roundtrip(tmp_path):
    _write_fake_test(str(tmp_path))
    out = str(tmp_path / "data_test_3dhp.npz")
    dic = B.build_test_npz(str(tmp_path), out)
    assert set(dic) == {"TS1", "TS5"}
    assert dic["TS1"]["data_2d"].shape == (6, 17, 2)
    assert dic["TS1"]["valid"].sum() == 4

    ds = mpi3dhp.load_test(out, str(tmp_path))
    assert len(ds) == 8  # 4 valid x 2 seqs
    assert ds.seq_names == ("TS1", "TS5")


def test_crop_coordinates_affine_consistency():
    rng = np.random.RandomState(2)
    pose3d = rng.randn(3, 17, 3) * 100
    pose3d[..., 2] = np.abs(pose3d[..., 2]) + 3000
    pose2d = rng.uniform(0, 2048, (3, 17, 2))
    cam = B.CAMERA_INTRINSICS[0]
    crop = B.crop_coordinates(pose2d, pose3d, cam)
    assert crop.shape == pose2d.shape
    # root joint of the crop should land near the crop center by construction
    from contextaware_poseformer_tpu.utils import geometry

    c4 = {"fx": cam["focal_length"][0], "fy": cam["focal_length"][1],
          "cx": cam["center"][0], "cy": cam["center"][1]}
    for i in range(3):
        box = geometry.infer_bbox(pose3d[i], c4, 14)
        center = np.array([(box[0] + box[2]) / 2, (box[1] + box[3]) / 2])
        scale = np.array([(box[2] - box[0]) / 200, (box[3] - box[1]) / 200])
        t = geometry.get_affine_transform(center, scale, (192, 256))
        np.testing.assert_allclose(
            crop[i], geometry.affine_transform(pose2d[i], t), atol=1e-9
        )
