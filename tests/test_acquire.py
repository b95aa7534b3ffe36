"""Dataset acquisition module (data/preprocess/acquire.py) — mock-fetcher
tests; no network. Covers the reference contracts: H36M manifest/cookie/MD5
skip-and-verify (download_all.py), common-prefix tgz extraction
(extract_all.py), 3DHP per-sequence layout with unzip -j semantics
(get_dataset.sh/get_testset.sh), plus the traversal guards the reference
lacks."""

import hashlib
import io
import os
import tarfile
import zipfile

import numpy as np
import pytest

from contextaware_poseformer_tpu.data.preprocess import acquire


def test_h36m_manifest_complete_and_cookie_addressing():
    files = acquire.h36m_manifest()
    assert len(files) == 35  # 7 subjects x 5 archive kinds
    names = [n for n, _ in files]
    assert len(set(names)) == 35
    assert "Videos_S11.tgz" in names
    # site file ids differ from subject tags (S5 -> SubjectSpecific_6.tgz)
    url = dict(files)["Poses_D2_Positions_S5.tgz"]
    assert "filename=SubjectSpecific_6.tgz" in url
    assert url.startswith(acquire.H36M_BASE_URL)
    assert set(names) == set(acquire.H36M_MD5)


def _mock_fetcher(payloads):
    calls = []

    def fetch(url, dest, headers):
        calls.append((url, dest, dict(headers)))
        with open(dest, "wb") as f:
            f.write(payloads(url))

    fetch.calls = calls
    return fetch


def test_download_h36m_verifies_and_skips(tmp_path):
    # only archives whose MD5 we fake: restrict the manifest via checksums
    payload = b"tgz-bytes-S1"
    sums = {"Poses_D2_Positions_S1.tgz": hashlib.md5(payload).hexdigest()}
    # pre-verified file is skipped entirely
    dest = tmp_path / "archives"
    dest.mkdir()
    (dest / "Poses_D2_Positions_S1.tgz").write_bytes(payload)

    fetch = _mock_fetcher(lambda url: payload)
    out = acquire.download_h36m(
        str(dest), "COOKIE123", fetcher=fetch, checksums=sums, verbose=False
    )
    assert len(out) == 35
    fetched = {os.path.basename(d) for _, d, _ in fetch.calls}
    assert "Poses_D2_Positions_S1.tgz" not in fetched  # checksum skip
    assert len(fetched) == 34
    assert all(
        h["Cookie"] == "PHPSESSID=COOKIE123" for _, _, h in fetch.calls
    )

    # corrupted download (login HTML page) raises
    bad = {"Poses_D3_Positions_S1.tgz": "0" * 32}
    with pytest.raises(IOError, match="MD5 mismatch"):
        acquire.download_h36m(
            str(tmp_path / "a2"), "x", fetcher=fetch, checksums=bad,
            verbose=False,
        )


def _make_tgz(path, entries):
    with tarfile.open(path, "w:gz") as tar:
        for name, data in entries:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))


def test_extract_tgz_flat_strips_common_prefix(tmp_path):
    tgz = tmp_path / "a.tgz"
    _make_tgz(tgz, [
        ("top/inner/S1/f1.cdf", b"one"),
        ("top/inner/S1/sub/f2.cdf", b"two"),
    ])
    out = tmp_path / "out"
    acquire.extract_tgz_flat(str(tgz), str(out))
    assert (out / "f1.cdf").read_bytes() == b"one"
    assert (out / "sub" / "f2.cdf").read_bytes() == b"two"
    # existing dest -> no-op (extract_all.py:22-23)
    acquire.extract_tgz_flat(str(tgz), str(out))


def test_extract_rejects_traversal(tmp_path):
    tgz = tmp_path / "evil.tgz"
    _make_tgz(tgz, [("../../escape.txt", b"x")])
    with pytest.raises(IOError, match="unsafe"):
        acquire.extract_tgz_flat(str(tgz), str(tmp_path / "o"))


def test_extract_h36m_layout(tmp_path):
    archives = tmp_path / "archives"
    archives.mkdir()
    for tag, _ in acquire.H36M_SUBJECTS:
        _make_tgz(
            archives / f"Poses_D2_Positions_{tag}.tgz",
            [
                (f"{tag}/MyPoseFeatures/D2_Positions/Walking.cdf", b"d"),
                (f"{tag}/MySegmentsMat/meta.mat", b"m"),
            ],
        )
    out = tmp_path / "extracted"
    acquire.extract_h36m(str(archives), str(out), verbose=False)
    # common prefix = the subject dir; inner structure preserved
    assert (
        out / "S9" / "Poses_D2_Positions" / "MyPoseFeatures"
        / "D2_Positions" / "Walking.cdf"
    ).exists()
    assert (
        out / "S1" / "Poses_D2_Positions" / "MySegmentsMat" / "meta.mat"
    ).exists()


def _zip_bytes(entries):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in entries:
            zf.writestr(name, data)
    return buf.getvalue()


def test_download_mpi3dhp_layout(tmp_path):
    vid = _zip_bytes([
        ("imageSequence/video_0.avi", b"v0"),
        ("imageSequence/video_8.avi", b"v8"),
    ])

    def payloads(url):
        if url.endswith(".zip"):
            return vid
        return b"meta:" + url.encode()

    fetch = _mock_fetcher(payloads)
    acquire.download_mpi3dhp(
        str(tmp_path), subjects=[1, 3], fetcher=fetch, verbose=False
    )
    for s in (1, 3):
        for seq in (1, 2):
            d = tmp_path / f"S{s}" / f"Seq{seq}"
            assert (d / "annot.mat").exists()
            assert (d / "camera.calibration").exists()
            # unzip -j flattened, zip removed (get_dataset.sh:63-67)
            assert (d / "imageSequence" / "video_0.avi").read_bytes() == b"v0"
            assert not (d / "imageSequence" / "vnect_cameras.zip").exists()
    assert not (tmp_path / "S2").exists()


def test_download_mpi3dhp_testset(tmp_path):
    ts = _zip_bytes([
        ("TS1/annot_data.mat", b"a"),
        ("test_util/camera_calibration/ts.calib", b"c"),
    ])
    fetch = _mock_fetcher(lambda url: ts)
    acquire.download_mpi3dhp_testset(str(tmp_path), fetcher=fetch)
    root = tmp_path / "mpi_inf_3dhp_test_set"
    assert (root / "TS1" / "annot_data.mat").read_bytes() == b"a"
    assert not (tmp_path / "mpi_inf_3dhp_test_set.zip").exists()


def test_cli_mpi3dhp_subject_parsing(tmp_path, monkeypatch):
    seen = {}

    def fake_dl(dest, subjects, masks=False, **kw):
        seen["subjects"] = list(subjects)
        seen["masks"] = masks

    monkeypatch.setattr(acquire, "download_mpi3dhp", fake_dl)
    acquire.main(["mpi3dhp", "--dest", str(tmp_path), "--subjects", "2-4",
                  "--masks"])
    assert seen == {"subjects": [2, 3, 4], "masks": True}
    acquire.main(["mpi3dhp", "--dest", str(tmp_path), "--subjects", "1,7"])
    assert seen["subjects"] == [1, 7]


def test_extract_atomic_repairs_interrupted_run(tmp_path):
    """A leftover temp dir from an interrupted extraction must be discarded
    and re-extracted; extraction is DeprecationWarning-free (extractall gets
    an explicit filter=) and only a COMPLETE dest_dir short-circuits."""
    import warnings

    tgz = tmp_path / "a.tgz"
    _make_tgz(tgz, [("top/S1/f1.cdf", b"one"), ("top/S1/f2.cdf", b"two")])
    out = tmp_path / "out"

    # simulate an interrupted earlier run: junk in the in-progress temp dir,
    # dest absent
    tmp_leftover = tmp_path / "out.extracting"
    tmp_leftover.mkdir()
    (tmp_leftover / "partial.cdf").write_bytes(b"junk")

    with warnings.catch_warnings():
        warnings.simplefilter("error", DeprecationWarning)
        acquire.extract_tgz_flat(str(tgz), str(out))

    assert (out / "f1.cdf").read_bytes() == b"one"
    assert (out / "f2.cdf").read_bytes() == b"two"
    assert not (out / "partial.cdf").exists()
    assert not tmp_leftover.exists()
