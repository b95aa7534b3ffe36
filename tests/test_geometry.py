import numpy as np
import pytest

from contextaware_poseformer_tpu.utils import geometry, skeleton


def test_affine_transform_roundtrip():
    center = np.array([500.0, 400.0])
    scale = np.array([1.2, 1.6])
    out_size = (192, 256)
    t = geometry.get_affine_transform(center, scale, out_size)
    t_inv = geometry.get_affine_transform(center, scale, out_size, inv=True)

    pts = np.random.RandomState(0).uniform(0, 1000, size=(10, 2))
    cropped = geometry.affine_transform(pts, t)
    back = geometry.affine_transform(cropped, t_inv)
    np.testing.assert_allclose(back, pts, atol=1e-6)


def test_affine_transform_center_maps_to_output_center():
    center = np.array([320.0, 240.0])
    scale = np.array([1.0, 1.0])
    t = geometry.get_affine_transform(center, scale, (192, 256))
    out = geometry.affine_transform(center[None], t)[0]
    # (w-1)*0.5 convention (img.py:37)
    np.testing.assert_allclose(out, [(192 - 1) * 0.5, (256 - 1) * 0.5], atol=1e-6)


def test_affine_matches_cv2_when_available():
    cv2 = pytest.importorskip("cv2")
    center, scale = np.array([432.1, 210.9]), np.array([1.37, 1.88])
    ours = geometry.get_affine_transform(center, scale, (192, 256))

    # Rebuild via cv2 using the same three source/dest points.
    scale_tmp = scale * 200.0
    src_dir = np.array([0, (scale_tmp[0] - 1) * -0.5], np.float32)
    dst_dir = np.array([0, (192 - 1) * -0.5], np.float32)
    src = np.zeros((3, 2), np.float32)
    dst = np.zeros((3, 2), np.float32)
    src[0], src[1] = center, center + src_dir
    dst[0] = [(192 - 1) * 0.5, (256 - 1) * 0.5]
    dst[1] = dst[0] + dst_dir
    d = src[0] - src[1]
    src[2] = src[1] + np.array([-d[1], d[0]])
    d = dst[0] - dst[1]
    dst[2] = dst[1] + np.array([-d[1], d[0]])
    theirs = cv2.getAffineTransform(src, dst)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_normalize_screen_coordinates_roundtrip():
    pts = np.random.RandomState(1).uniform(0, 1000, size=(17, 2))
    norm = geometry.normalize_screen_coordinates(pts, 1000, 1002)
    back = geometry.image_coordinates(norm, 1000, 1002)
    np.testing.assert_allclose(back, pts, atol=1e-9)
    # x in [0,w] maps to [-1,1]
    lo = geometry.normalize_screen_coordinates(np.zeros((1, 2)), 1000, 1000)
    hi = geometry.normalize_screen_coordinates(np.full((1, 2), 1000.0), 1000, 1000)
    np.testing.assert_allclose(lo, [[-1, -1]])
    np.testing.assert_allclose(hi, [[1, 1]])


def test_infer_bbox_matches_reference_formula():
    cam = {"fx": 1145.0, "fy": 1143.8, "cx": 512.5, "cy": 515.4}
    pose = np.zeros((17, 3))
    pose[0] = [100.0, -50.0, 5000.0]
    box = geometry.infer_bbox(pose, cam, root_idx=0)
    tl = np.array([100.0 - 1000.0, -50.0 - 900.0, 5000.0])
    br = np.array([100.0 + 1000.0, -50.0 + 1100.0, 5000.0])
    exp = np.array(
        [
            tl[0] / tl[2] * cam["fx"] + cam["cx"],
            tl[1] / tl[2] * cam["fy"] + cam["cy"],
            br[0] / br[2] * cam["fx"] + cam["cx"],
            br[1] / br[2] * cam["fy"] + cam["cy"],
        ]
    )
    np.testing.assert_allclose(box, exp, atol=1e-9)


def test_warp_affine_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, size=(100, 80, 3), dtype=np.uint8)
    t = geometry.get_affine_transform([40.0, 50.0], [0.3, 0.4], (48, 64))
    ours = geometry.warp_affine_bilinear(img, t, (48, 64))
    theirs = cv2.warpAffine(img, t, (48, 64), flags=cv2.INTER_LINEAR)
    # Allow off-by-one from rounding ties; bulk must match exactly.
    diff = np.abs(ours.astype(int) - theirs.astype(int))
    assert (diff <= 1).mean() > 0.999
    assert np.median(diff) == 0


def test_flip_permutation_is_involution():
    perm = skeleton.H36M_FLIP_PERM
    assert np.array_equal(perm[perm], np.arange(17))
    assert perm[0] == 0  # root fixed
    assert perm[1] == 4 and perm[4] == 1
    perm3 = skeleton.MPI3DHP_FLIP_PERM
    assert np.array_equal(perm3[perm3], np.arange(17))
    assert perm3[14] == 14  # 3DHP root fixed


def test_config_presets_and_overlay(tmp_path):
    from contextaware_poseformer_tpu import config as cfglib

    for name in cfglib.PRESETS:
        cfg = cfglib.preset(name)
        assert cfg.model.lifter.num_joints == 17
    cfg32 = cfglib.preset("h36m_hrnet_32")
    assert cfg32.model.backbone.feature_dims == (32, 64, 128, 256)
    cfg48 = cfglib.preset("h36m_hrnet_48")
    assert cfg48.model.backbone.feature_dims == (48, 96, 192, 384)
    cfgc = cfglib.preset("h36m_cpn")
    assert cfgc.model.backbone.feature_dims == (256, 256, 256, 256)
    assert cfgc.train.batch_size == 256
    cfg3dhp = cfglib.preset("mpi_3dhp_hrnet_32")
    assert not cfg3dhp.model.lifter.use_deformable
    assert cfg3dhp.model.lifter.embed_dim_ratio == 64

    p = tmp_path / "exp.yaml"
    p.write_text("preset: h36m_hrnet_32\ntrain:\n  batch_size: 64\n")
    cfg = cfglib.load_config(str(p))
    assert cfg.train.batch_size == 64
    assert cfg.model.backbone.width == 32

    p2 = tmp_path / "bad.yaml"
    p2.write_text("train:\n  not_a_field: 1\n")
    import pytest as _pytest

    with _pytest.raises(KeyError):
        cfglib.load_config(str(p2))
