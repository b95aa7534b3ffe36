"""Packed raw-frame store (data/frame_store.py): build -> open -> serve.

VERDICT r3 item 5: a zero-decode memmap store so the host pipeline stops
paying the per-item JPEG decode wall (PERF.md host page). Correctness
contract: a store-backed dataset feeds BYTE-IDENTICAL batches to the JPEG
pipeline it replaces."""

import os
import pickle

import numpy as np
import pytest

from contextaware_poseformer_tpu.data import frame_store, mpi3dhp
from contextaware_poseformer_tpu.data.h36m import H36MDataset

cv2 = pytest.importorskip("cv2")


def _mini_h36m(tmp_path, n_frames=6, crop_hw=(64, 64)):
    """Miniature on-disk H36M: full-frame JPEGs + labels pickle (the
    reference layout, same as test_driver_h36m)."""
    rng = np.random.RandomState(11)
    root = tmp_path / "images"
    labels = []
    full_hw = (160, 160)
    subject, action, subaction, cam = 1, 2, 1, 0
    subdir = f"s_{subject:02d}_act_{action:02d}_subact_{subaction:02d}_ca_{cam + 1:02d}"
    (root / subdir).mkdir(parents=True)
    for image_id in range(n_frames):
        frame = rng.randint(0, 256, (*full_hw, 3)).astype(np.uint8)
        name = f"{subdir}_{image_id:06d}.jpg"
        assert cv2.imwrite(str(root / subdir / name), frame,
                           [cv2.IMWRITE_JPEG_QUALITY, 92])
        labels.append({
            "subject": subject, "action": action, "subaction": subaction,
            "camera_id": cam, "image_id": image_id, "video_id": 0,
            "joints_3d": rng.randn(17, 3).astype(np.float32),
            "joints_2d_cpn": rng.uniform(-1, 1, (17, 2)).astype(np.float32),
            "joints_2d_cpn_crop": rng.uniform(0, 60, (17, 2)).astype(np.float32),
            "center": np.asarray([80.0, 80.0], np.float32),
            "scale": np.asarray([0.4, 0.4], np.float32),
        })
    lp = tmp_path / "labels.pkl"
    with open(lp, "wb") as f:
        pickle.dump(labels, f)
    return str(lp), str(root), crop_hw


def test_h36m_store_roundtrip(tmp_path):
    lp, root, crop_hw = _mini_h36m(tmp_path)
    ds = H36MDataset.from_pickle(lp, root, crop_hw)
    out = str(tmp_path / "frames.npy")
    frame_store.build_store(ds, out, batch_size=4, log=None)

    st = H36MDataset.from_pickle(lp, root, crop_hw, frame_store=out)
    assert st.frame_store is not None
    for i in range(len(ds)):
        np.testing.assert_array_equal(st.load_image(i), ds.load_image(i))
    idxs = np.asarray([4, 0, 2])
    batch = st.load_batch(idxs)
    ref = np.stack([ds.load_image(int(i)) for i in idxs])
    np.testing.assert_array_equal(batch, ref)
    assert batch.dtype == np.uint8 and batch.shape == (3, *crop_hw, 3)


def test_h36m_store_retain_and_shard(tmp_path):
    """A FULL-pickle store serves any retain_every_n view; shard() slices
    the store index alongside the labels."""
    lp, root, crop_hw = _mini_h36m(tmp_path)
    ds = H36MDataset.from_pickle(lp, root, crop_hw)
    out = str(tmp_path / "frames.npy")
    frame_store.build_store(ds, out, batch_size=4, log=None)

    st = H36MDataset.from_pickle(lp, root, crop_hw, retain_every_n=2,
                                 frame_store=out)
    assert len(st) == 3
    for i, orig in enumerate([0, 2, 4]):
        np.testing.assert_array_equal(st.load_image(i), ds.load_image(orig))

    st.shard(rank=1, world_size=2)  # retained items [2, 4] -> rank1 gets [4]
    np.testing.assert_array_equal(st.load_image(len(st) - 1),
                                  ds.load_image(4))

    # length mismatch: truncated store
    bad = str(tmp_path / "bad.npy")
    np.save(bad, np.zeros((4, *crop_hw, 3), np.uint8))
    with pytest.raises(ValueError, match="store has 4"):
        H36MDataset.from_pickle(lp, root, crop_hw, frame_store=bad)


def test_store_geometry_validation(tmp_path):
    bad = str(tmp_path / "bad.npy")
    np.save(bad, np.zeros((3, 8, 8, 3), np.float32))
    with pytest.raises(ValueError, match="uint8"):
        frame_store.open_store(bad, (8, 8))
    np.save(bad, np.zeros((3, 9, 8, 3), np.uint8))
    with pytest.raises(ValueError, match="expected"):
        frame_store.open_store(bad, (8, 8))


def test_3dhp_store_roundtrip(tmp_path):
    """3DHP stores are built in dataset item order; precropped frames on
    disk (convert_to_small.py layout)."""
    rng = np.random.RandomState(3)
    data = {}
    for seq, wh in [("TS1", 2048)]:
        n = 5
        data[seq] = {
            "data_3d": rng.randn(n, 17, 3) * 100 + 500,
            "data_2d": rng.uniform(0, wh, (n, 17, 2)),
            "data_2d_crop": rng.uniform(0, 192, (n, 17, 2)),
            "valid": np.array([1, 0, 1, 1, 1]),
        }
    npz = str(tmp_path / "test.npz")
    np.savez(npz, data=np.asarray(data, dtype=object))
    img_root = tmp_path / "imgs"
    (img_root / "TS1").mkdir(parents=True)
    for i in range(5):
        frame = rng.randint(0, 256, (256, 192, 3)).astype(np.uint8)
        assert cv2.imwrite(str(img_root / "TS1" / f"TS1_{i + 1:06d}.jpg"),
                           frame, [cv2.IMWRITE_JPEG_QUALITY, 95])

    ds = mpi3dhp.load_test(npz, str(img_root))
    out = str(tmp_path / "frames.npy")
    frame_store.build_store(ds, out, batch_size=2, log=None)
    st = mpi3dhp.load_test(npz, str(img_root), frame_store=out)
    batch = st.load_batch(np.asarray([3, 1]))
    ref = np.stack([ds.load_image(3), ds.load_image(1)])
    np.testing.assert_array_equal(batch, ref)

    # keep_invalid changes the item count -> length mismatch must raise
    with pytest.raises(ValueError, match="same loader arguments"):
        mpi3dhp.load_test(npz, str(img_root), keep_invalid=True,
                          frame_store=out)


def test_pipeline_integration(tmp_path):
    """batch_iterator over a store-backed dataset matches the JPEG-path
    iterator batch-for-batch (the production seam)."""
    from contextaware_poseformer_tpu.data import pipeline

    lp, root, crop_hw = _mini_h36m(tmp_path)
    ds = H36MDataset.from_pickle(lp, root, crop_hw)
    out = str(tmp_path / "frames.npy")
    frame_store.build_store(ds, out, batch_size=4, log=None)
    st = H36MDataset.from_pickle(lp, root, crop_hw, frame_store=out)

    a = list(pipeline.batch_iterator(ds, batch_size=4, shuffle=False,
                                     num_workers=2))
    b = list(pipeline.batch_iterator(st, batch_size=4, shuffle=False,
                                     num_workers=2))
    assert len(a) == len(b) > 0
    for (ba, na), (bb, nb) in zip(a, b):
        assert na == nb
        np.testing.assert_array_equal(ba.images_u8, bb.images_u8)
        np.testing.assert_array_equal(ba.keypoints_3d, bb.keypoints_3d)
