"""Native C++ loader: build, decode parity vs cv2, crop parity, batch path."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from contextaware_poseformer_tpu.data import native_loader
from contextaware_poseformer_tpu.utils import geometry

pytestmark = pytest.mark.skipif(
    not native_loader.buildable(), reason="native toolchain unavailable"
)


@pytest.fixture(autouse=True)
def _force_native(monkeypatch):
    """Force the native path for THESE tests only. A module-level
    os.environ assignment here executes at pytest COLLECTION time and
    leaks into every other test in the process — it made
    frame_store.build_store take the native load_batch path while the
    frame-store tests compared against cv2 load_image (+-1 LSB decoder
    difference, order-dependent suite failure)."""
    monkeypatch.setenv("CAPF_NATIVE_LOADER", "1")


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    paths = []
    for i in range(6):
        # smooth-ish content so JPEG round-trip is predictable
        img = cv2.GaussianBlur(
            rng.randint(0, 255, (100, 80, 3)).astype(np.uint8), (15, 15), 5
        )
        p = str(d / f"img{i}.jpg")
        cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
        paths.append(p)
    return paths


def test_decode_matches_cv2(jpegs):
    ours = native_loader.decode_jpeg(jpegs[0])
    theirs = cv2.imread(jpegs[0], cv2.IMREAD_COLOR)
    assert ours.shape == theirs.shape
    diff = np.abs(ours.astype(int) - theirs.astype(int))
    # IDCT implementations may differ by a couple of LSBs on few pixels
    assert (diff <= 2).mean() > 0.995, diff.max()
    assert np.median(diff) == 0


def test_batch_crop_matches_cv2_warp(jpegs):
    n = len(jpegs)
    rng = np.random.RandomState(1)
    trans = np.stack([
        geometry.get_affine_transform(
            rng.uniform(20, 60, 2), rng.uniform(0.2, 0.4, 2), (48, 64)
        )
        for _ in range(n)
    ])
    batch = native_loader.load_crop_batch(jpegs, trans, (64, 48), n_threads=3)
    assert batch.shape == (n, 64, 48, 3)
    for i, p in enumerate(jpegs):
        src = cv2.imread(p, cv2.IMREAD_COLOR)
        golden = cv2.warpAffine(src, trans[i], (48, 64), flags=cv2.INTER_LINEAR)
        diff = np.abs(batch[i].astype(int) - golden.astype(int))
        assert (diff <= 2).mean() > 0.99, (i, diff.max())


def test_precropped_fast_path(tmp_path):
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (64, 48, 3)).astype(np.uint8)
    p = str(tmp_path / "pre.jpg")
    cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 100])
    batch = native_loader.load_crop_batch([p], None, (64, 48), precropped=True)
    golden = cv2.imread(p, cv2.IMREAD_COLOR)
    diff = np.abs(batch[0].astype(int) - golden.astype(int))
    assert (diff <= 2).mean() > 0.995


def test_missing_file_reports_index(jpegs):
    bad = list(jpegs)
    bad[2] = "/nonexistent/x.jpg"
    with pytest.raises(FileNotFoundError, match="item 2"):
        native_loader.load_crop_batch(
            bad, np.tile(np.eye(2, 3), (len(bad), 1, 1)), (64, 48)
        )


def test_pipeline_uses_native_batch_path(tmp_path):
    """End-to-end: dataset with jpegs on disk -> batch_iterator must produce
    the same images through the native path as per-item cv2 loading."""
    from contextaware_poseformer_tpu.data import pipeline
    from contextaware_poseformer_tpu.data.h36m import H36MDataset

    rng = np.random.RandomState(3)
    root = tmp_path / "imgs"
    root.mkdir()
    n = 5
    paths = []
    for i in range(n):
        img = cv2.GaussianBlur(
            rng.randint(0, 255, (64, 48, 3)).astype(np.uint8), (9, 9), 3
        )
        p = f"im_{i}.jpg"
        cv2.imwrite(str(root / p), img, [cv2.IMWRITE_JPEG_QUALITY, 100])
        paths.append(p)

    ds = H36MDataset(
        root=str(root),
        joints_3d=rng.randn(n, 17, 3).astype(np.float32),
        joints_2d=rng.randn(n, 17, 2).astype(np.float32),
        joints_2d_crop=rng.rand(n, 17, 2).astype(np.float32) * 48,
        center=np.full((n, 2), 24.0, np.float32),
        scale=np.full((n, 2), 0.3, np.float32),
        action_idx=np.zeros(n, np.int32),
        subject_idx=np.zeros(n, np.int32),
        video_idx=np.zeros(n, np.int64),
        image_paths=np.asarray(paths),
        image_shape=(64, 48),
    )

    (batch, valid), = list(
        pipeline.batch_iterator(ds, 5, shuffle=False, num_workers=2)
    )
    assert valid == 5
    native = np.asarray(batch.images_u8)
    # per-item reference path
    for i in range(n):
        ref = ds.load_image(i)
        diff = np.abs(native[i].astype(int) - ref.astype(int))
        assert (diff <= 2).mean() > 0.99, (i, diff.max())
