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


# ---------------------------------------------------------------------------
# Multi-frame chunk windows (-f > 1): directly-ported numpy oracle of the
# reference's indexing (generator_3dhp.py:19-63 pair building, :147-207
# edge-padded window slicing), compared bit-for-bit with our gather-based
# formulation (edge-pad == clipped-index gather).
# ---------------------------------------------------------------------------


def _oracle_pairs(seq_lengths, train, chunk_length, reverse_aug, valid=None):
    pairs = []
    for sid, T in enumerate(seq_lengths):
        n_chunks = (T + chunk_length - 1) // chunk_length
        offset = (n_chunks * chunk_length - T) // 2
        if train:
            bounds = np.arange(n_chunks + 1) * chunk_length - offset
            av = np.full(len(bounds) - 1, False)
            base = list(zip([sid] * (len(bounds) - 1), bounds[:-1],
                            bounds[1:], av, av))
            pairs += base
            if reverse_aug:
                pairs += [(s, lo, hi, f, True) for s, lo, hi, f, _ in base]
        else:
            bounds = np.arange(n_chunks) * chunk_length - offset
            lo = bounds[np.asarray(valid[sid]).astype(bool)]
            hi = lo + 1
            av = np.full(len(lo), False)
            pairs += list(zip([sid] * len(lo), lo, hi, av, av))
    return pairs


def _oracle_window(seq_2d, seq_3d, start, end, pad, reverse, out_all=True,
                   seq_2d_crop=None):
    """generator_3dhp.py:147-207 with np.pad 'edge', verbatim semantics.

    batch_2d_crop is sliced/padded alongside batch_2d (:157-161) but NOT
    reversed (:179-180 reverses only batch_2d; :206-207 only batch_3d) —
    the crop window stays forward under reverse augmentation.
    """
    start_2d, end_2d = start - pad, end + pad
    low = max(start_2d, 0)
    high = min(end_2d, seq_2d.shape[0])
    pl, pr = low - start_2d, end_2d - high
    w2 = np.pad(seq_2d[low:high], ((pl, pr), (0, 0), (0, 0)), "edge") \
        if (pl or pr) else seq_2d[low:high]
    w2c = None
    if seq_2d_crop is not None:
        w2c = np.pad(seq_2d_crop[low:high], ((pl, pr), (0, 0), (0, 0)),
                     "edge") if (pl or pr) else seq_2d_crop[low:high]
    if out_all:
        w3 = np.pad(seq_3d[low:high], ((pl, pr), (0, 0), (0, 0)), "edge") \
            if (pl or pr) else seq_3d[low:high]
    else:
        l3, h3 = max(start, 0), min(end, seq_3d.shape[0])
        pl3, pr3 = l3 - start, end - h3
        w3 = np.pad(seq_3d[l3:h3], ((pl3, pr3), (0, 0), (0, 0)), "edge") \
            if (pl3 or pr3) else seq_3d[l3:h3]
    if reverse:
        w2, w3 = w2[::-1].copy(), w3[::-1].copy()
    if seq_2d_crop is not None:
        return w2, w3, w2c
    return w2, w3


def _windowed_train_ds(tmp_path):
    p = str(tmp_path / "train.npz")
    _fake_train_npz(p)
    return mpi3dhp.load_train(p, str(tmp_path))


@pytest.mark.parametrize("frames", [1, 3, 9])
@pytest.mark.parametrize("chunk_length", [1, 3])
def test_train_windows_match_reference_oracle(tmp_path, frames, chunk_length):
    ds = _windowed_train_ds(tmp_path)
    win = mpi3dhp.make_windows(
        ds, frames=frames, train=True, chunk_length=chunk_length,
        reverse_aug=True,
    )
    pad = (frames - 1) // 2
    assert win.pad == pad
    seq_lengths = [int((ds.seq_idx == s).sum()) for s in range(4)]
    oracle = _oracle_pairs(seq_lengths, True, chunk_length, reverse_aug=True)
    assert len(win) == len(oracle)
    starts = np.concatenate([[0], np.cumsum(seq_lengths)[:-1]])
    for i, (sid, lo, hi, flip, rev) in enumerate(oracle):
        got = win[i]
        s = starts[sid]
        n = seq_lengths[sid]
        w2, w3, w2c = _oracle_window(
            ds.joints_2d[s:s + n], ds.joints_3d[s:s + n],
            int(lo), int(hi), pad, bool(rev),
            seq_2d_crop=ds.joints_2d_crop[s:s + n],
        )
        assert got["seq_id"] == sid and got["flip"] == bool(flip)
        assert got["joints_2d"].shape[0] == (hi - lo) + 2 * pad
        np.testing.assert_array_equal(got["joints_2d"], w2)
        np.testing.assert_array_equal(got["joints_3d"], w3)
        # crop coords are NOT reversed under reverse_aug (generator_3dhp.py)
        np.testing.assert_array_equal(got["joints_2d_crop"], w2c)
        # image = single frame at the (clamped) chunk start
        assert got["image_index"] == s + int(np.clip(lo, 0, n - 1))


@pytest.mark.parametrize("frames", [1, 3, 9])
def test_test_windows_valid_filter_matches_oracle(tmp_path, frames):
    p = str(tmp_path / "test.npz")
    _fake_test_npz(p)
    ds = mpi3dhp.load_test(p, str(tmp_path), keep_invalid=True)
    valid = [np.asarray(ds.valid_mask[ds.seq_idx == s]) for s in range(2)]
    assert [int(v.sum()) for v in valid] == [4, 4]
    win = mpi3dhp.make_windows(ds, frames=frames, train=False)
    pad = (frames - 1) // 2
    seq_lengths = [int((ds.seq_idx == s).sum()) for s in range(2)]
    oracle = _oracle_pairs(seq_lengths, False, 1, False, valid=valid)
    assert len(win) == len(oracle) == 8
    starts = np.concatenate([[0], np.cumsum(seq_lengths)[:-1]])
    for i, (sid, lo, hi, _flip, rev) in enumerate(oracle):
        got = win[i]
        s = starts[sid]
        n = seq_lengths[sid]
        w2, w3 = _oracle_window(
            ds.joints_2d[s:s + n], ds.joints_3d[s:s + n],
            int(lo), int(hi), pad, bool(rev),
        )
        np.testing.assert_array_equal(got["joints_2d"], w2)
        np.testing.assert_array_equal(got["joints_3d"], w3)
        # every chunk center is a valid frame
        assert valid[sid][int(lo)]


def test_test_windows_multiframe_requires_keep_invalid(tmp_path):
    p = str(tmp_path / "test.npz")
    _fake_test_npz(p)
    ds = mpi3dhp.load_test(p, str(tmp_path))  # invalid frames dropped
    with pytest.raises(ValueError, match="keep_invalid"):
        mpi3dhp.make_windows(ds, frames=3, train=False)
    # frames=1 on the dropped-frames dataset is the live path and fine
    win = mpi3dhp.make_windows(ds, frames=1, train=False)
    assert len(win) == len(ds)
