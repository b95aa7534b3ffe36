import os

import numpy as np
import pytest

from contextaware_poseformer_tpu.data import mpi3dhp


def _fake_train_npz(path):
    rng = np.random.RandomState(0)
    data = {}
    for seq in ["S1 Seq1", "S2 Seq2"]:
        cams = {}
        for cam in ["0", "4"]:
            n = 5
            cams[cam] = {
                "data_3d": rng.randn(n, 17, 3).astype(np.float64) * 100 + 500,
                "data_2d": rng.uniform(0, 2048, (n, 17, 2)),
                "data_2d_crop": rng.uniform(0, 192, (n, 17, 2)),
            }
        data[seq] = {0: cams}
    np.savez(path, data=np.asarray(data, dtype=object))


def _fake_test_npz(path):
    rng = np.random.RandomState(1)
    data = {}
    for seq, wh in [("TS1", 2048), ("TS5", 1920)]:
        n = 6
        data[seq] = {
            "data_3d": rng.randn(n, 17, 3) * 100 + 500,
            "data_2d": rng.uniform(0, wh, (n, 17, 2)),
            "data_2d_crop": rng.uniform(0, 192, (n, 17, 2)),
            "valid": np.array([1, 0, 1, 1, 0, 1]),
        }
    np.savez(path, data=np.asarray(data, dtype=object))


def test_load_train(tmp_path):
    p = str(tmp_path / "train.npz")
    _fake_train_npz(p)
    ds = mpi3dhp.load_train(p, str(tmp_path))
    assert len(ds) == 2 * 2 * 5
    # root joint centered to exactly zero
    assert np.abs(ds.joints_3d[:, 14]).max() == 0.0
    # 2D normalized to [-1, 1]
    assert ds.joints_2d.min() >= -1.0 and ds.joints_2d.max() <= 1.0
    # path format matches generator_3dhp.py:130-139
    assert str(ds.image_paths[0]).startswith("s_01_seq_01_ca_00/")
    assert str(ds.image_paths[0]).endswith("_000001.jpg")
    assert len(ds.seq_names) == 4


def test_load_test_valid_filter(tmp_path):
    p = str(tmp_path / "test.npz")
    _fake_test_npz(p)
    ds = mpi3dhp.load_test(p, str(tmp_path))
    assert len(ds) == 8  # 4 valid frames per seq x 2 seqs
    assert ds.seq_names == ("TS1", "TS5")
    # frame ids follow the ORIGINAL indices of valid frames
    assert str(ds.image_paths[0]) == os.path.join("TS1", "TS1_000001.jpg")
    assert str(ds.image_paths[1]) == os.path.join("TS1", "TS1_000003.jpg")
    # TS5 normalized by 1920x1080 (aspect != 1 -> y range differs from x)
    ts5 = ds.joints_2d[ds.seq_idx == 1]
    assert ts5[..., 1].min() >= -1080 / 1920 - 1e-6


def test_export_inference_mat_roundtrip(tmp_path):
    import scipy.io as scio

    pred = np.random.RandomState(2).randn(10, 17, 3).astype(np.float32)
    seq_idx = np.asarray([0] * 6 + [1] * 4)
    path = str(tmp_path / "inference_data.mat")
    mpi3dhp.export_inference_mat(path, pred, seq_idx, ("TS1", "TS2"))
    m = scio.loadmat(path)
    assert m["TS1"].shape == (3, 17, 1, 6)
    assert m["TS2"].shape == (3, 17, 1, 4)
    # MATLAB consumer reads pred_seq(:,:,:,i) as (3,17) pose
    # (mpii_test_predictions_py.m:49-52)
    np.testing.assert_allclose(m["TS1"][:, :, 0, 2], pred[2].T, rtol=1e-6)


@pytest.mark.slow
def test_3dhp_driver_smoke(tmp_path):
    from contextaware_poseformer_tpu.train import train_3dhp

    best = train_3dhp.main([
        "--synthetic", "--tiny", "--batch-size", "16",
        "--steps-per-epoch", "2", "--eval-batches", "1",
        "--epochs", "1", "--logdir", str(tmp_path / "run"),
    ])
    assert np.isfinite(best)


@pytest.mark.slow
def test_3dhp_deploy_preset_eval(tmp_path):
    """--eval with the *_deploy preset (quantize="serve"): Trainer3dhp's
    evaluate calibrates lazily via _ensure_serving_ready (regression: it
    bypassed the base-class calibration and crashed on the empty calib
    collection)."""
    from contextaware_poseformer_tpu.train import train_3dhp

    summary = train_3dhp.main([
        "--preset", "mpi_3dhp_hrnet_32_deploy", "--synthetic", "--tiny",
        "--batch-size", "16", "--eval-batches", "1", "--eval",
        "--logdir", str(tmp_path / "run"),
    ])
    assert np.isfinite(summary["p1_mm"])
    assert 0.0 <= summary["pck"] <= 100.0
