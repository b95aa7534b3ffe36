import numpy as np
import pytest

import jax
import jax.numpy as jnp

from contextaware_poseformer_tpu.config import cpn_backbone
from contextaware_poseformer_tpu.models.backbone_common import (
    resize_bilinear_align_corners,
)
from contextaware_poseformer_tpu.models.convert import convert_conv_backbone
from contextaware_poseformer_tpu.models.cpn import CPN

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
import torch_oracle  # noqa: E402

CPN_SKIPS = (r"global_net\.predict\.", r"refine_net\.final_predict\.")


def test_bilinear_align_corners_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 6, 5).astype(np.float32)
    for out_hw in [(16, 12), (64, 48), (7, 5), (8, 6)]:
        ours = np.asarray(
            resize_bilinear_align_corners(jnp.asarray(x), out_hw)
        )
        golden = F.interpolate(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            size=out_hw, mode="bilinear", align_corners=True,
        ).numpy()
        np.testing.assert_allclose(
            ours, np.transpose(golden, (0, 2, 3, 1)), rtol=1e-5, atol=1e-5
        )


@pytest.mark.slow
def test_cpn_matches_torch_oracle_via_converter():
    model = CPN(cfg=cpn_backbone())
    rng = np.random.RandomState(0)
    # small input (div by 32): 64x64 -> /4 = 16x16 output maps
    x = rng.randn(1, 64, 64, 3).astype(np.float32)

    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), jnp.zeros_like(x))
    flat = shapes["params"]
    sd = torch_oracle.random_state_dict_for(flat, rng)
    params = {"params": convert_conv_backbone(sd, flat, skip_patterns=CPN_SKIPS)}

    ours = model.apply(params, jnp.asarray(x))
    golden = torch_oracle.cpn_forward(sd, np.transpose(x, (0, 3, 1, 2)))

    assert len(ours) == 4
    for lvl, (a, b) in enumerate(zip(ours, golden)):
        a = np.asarray(a)
        b = np.transpose(b, (0, 2, 3, 1))
        assert a.shape == b.shape == (1, 16, 16, 256), (lvl, a.shape, b.shape)
        # error normalized by the level's value scale (fp32 summation-order
        # noise through a ~50-conv stack; parity means rel ~1e-6)
        scale = np.sqrt(np.mean(b**2))
        rel = np.abs(a - b) / scale
        assert rel.max() < 1e-4, f"level {lvl}: worst {rel.max()}"


def test_cpn_resnet_param_count():
    # ResNet-50 conv params ~23.5M; laterals+upsamples+cascades add ~5M
    model = CPN(cfg=cpn_backbone())
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )
    n = sum(
        int(np.prod(l.shape)) for l in jax.tree.leaves(shapes) if l.ndim == 4
    )
    assert 25e6 < n < 32e6, n


@pytest.mark.slow
def test_cpn_serve_prepare_with_no_static_convs():
    """CPN under quantize='serve' has only dynamic-quant wide convs — no
    calibration variables exist. prepare_serving must handle the empty
    collections (regression: KeyError 'calib') and the prepared model must
    run."""
    import dataclasses

    import jax
    import numpy as np
    import jax.numpy as jnp

    from contextaware_poseformer_tpu.config import deploy, preset
    from contextaware_poseformer_tpu.models import (
        ContextAwarePoseFormer,
        prepare_serving,
    )

    cfg = preset("h36m_cpn")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, image_shape=(64, 64))
    )
    model = ContextAwarePoseFormer(cfg=deploy(cfg).model)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    kp = jnp.asarray(rng.uniform(-1, 1, (2, 17, 2)).astype(np.float32))
    kpc = jnp.asarray(rng.uniform(0, 64, (2, 17, 2)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), imgs[:1], kp[:1], kpc[:1])
    v = prepare_serving(model, v, (imgs, kp, kpc))
    assert "calib" in v and "qweights" in v
    out = model.apply(v, imgs, kp, kpc)
    assert out.shape == (2, 17, 3)
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.slow
def test_cpn_int8_stream_matches_serve_path():
    """cpn_int8_stream (e2e int8 through the resnet/refine chains) must
    reproduce the per-conv serve graph up to its extra quantization points:
    same map shapes, finite values, small relative deviation on a tiny
    random backbone. Also checks the calibration pass records the chain
    scales (resnet.in_amax, per-block t1/t2/out, refine cascade entries)
    that the inference graph reads."""
    import dataclasses

    from contextaware_poseformer_tpu.models.backbone_common import (
        calibrate_quantization,
        prepare_int8_weights,
    )

    cfg = dataclasses.replace(
        cpn_backbone(), quantize="serve", serve_static_amax=True,
        calib_quantile=0.999, cpn_layers=(1, 1, 1, 1),
    )
    cfg_s = dataclasses.replace(cfg, cpn_int8_stream=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))

    m0, m1 = CPN(cfg=cfg), CPN(cfg=cfg_s)
    params = {"params": m1.init(jax.random.PRNGKey(0), x)["params"]}

    def prep(m):
        v = calibrate_quantization(
            lambda vv, b, **kw: m.apply(vv, b, **kw), dict(params), [x, x]
        )
        return prepare_int8_weights(
            lambda vv, b, **kw: m.apply(vv, b, **kw), v, x
        )

    v0, v1 = prep(m0), prep(m1)
    # the stream calibration must record the chain scales
    calib_keys = {
        "/".join(str(k) for k in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(v1["calib"])[0]
    }
    for want in ("resnet.in_amax", "resnet.layer1.0.t1_amax",
                 "resnet.layer4.0.out_amax",
                 "refine_net.cascade.0.in_amax",
                 "refine_net.cascade.0.0.t2_amax"):
        assert any(want in k for k in calib_keys), (want, sorted(calib_keys))

    o0, o1 = m0.apply(v0, x), m1.apply(v1, x)
    assert [a.shape for a in o0] == [a.shape for a in o1]
    for lvl, (a, b) in enumerate(zip(o0, o1)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(b)), lvl
        rel = np.sqrt(np.mean((a - b) ** 2)) / (np.sqrt(np.mean(a**2)) + 1e-9)
        # extra int8 quantization points only — structural bugs show up as
        # O(1) relative error; observed ~0.03 on this tiny random model
        assert rel < 0.15, (lvl, rel)


@pytest.mark.slow
def test_cpn_int8_topdown_matches_stream_path():
    """cpn_int8_topdown carries the globalNet top-down (x2-upsampled)
    tensors as s8 with per-hop calibrated scales. Must reproduce the
    int8-stream graph up to one requant point per hop: same shapes,
    finite, small relative deviation; calibration records the hop scales
    the inference graph reads (global_net.topdown.{i}_amax)."""
    import dataclasses

    from contextaware_poseformer_tpu.models.backbone_common import (
        calibrate_quantization,
        prepare_int8_weights,
    )

    cfg = dataclasses.replace(
        cpn_backbone(), quantize="serve", serve_static_amax=True,
        calib_quantile=0.999, cpn_layers=(1, 1, 1, 1), cpn_int8_stream=True,
    )
    cfg_t = dataclasses.replace(cfg, cpn_int8_topdown=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))

    m0, m1 = CPN(cfg=cfg), CPN(cfg=cfg_t)
    params = {"params": m1.init(jax.random.PRNGKey(0), x)["params"]}

    def prep(m):
        v = calibrate_quantization(
            lambda vv, b, **kw: m.apply(vv, b, **kw), dict(params), [x, x]
        )
        return prepare_int8_weights(
            lambda vv, b, **kw: m.apply(vv, b, **kw), v, x
        )

    v0, v1 = prep(m0), prep(m1)
    calib_keys = {
        "/".join(str(k) for k in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(v1["calib"])[0]
    }
    for i in range(3):
        want = f"global_net.topdown.{i}_amax"
        assert any(want in k for k in calib_keys), (want, sorted(calib_keys))

    o0, o1 = m0.apply(v0, x), m1.apply(v1, x)
    assert [a.shape for a in o0] == [a.shape for a in o1]
    for lvl, (a, b) in enumerate(zip(o0, o1)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(b)), lvl
        rel = np.sqrt(np.mean((a - b) ** 2)) / (np.sqrt(np.mean(a**2)) + 1e-9)
        # one extra requant per top-down hop only
        assert rel < 0.15, (lvl, rel)


@pytest.mark.slow
def test_cpn_int8_maps_composite():
    """cpn_int8_maps hands the lifter s8 pyramid maps + dequant scales.
    The composite must stay close to the bf16-map deploy graph (the only
    new error source is the 8-bit map quantization), the calibration pass
    must record the /4-level feature scale, and the fused (interpret)
    sampler path must agree with the gather path on s8 maps."""
    import dataclasses

    from contextaware_poseformer_tpu.config import deploy, preset
    from contextaware_poseformer_tpu.models import (
        ContextAwarePoseFormer,
        prepare_serving,
    )

    cfg = preset("h36m_cpn")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, image_shape=(64, 64))
    )
    dep = deploy(cfg).model
    dep = dataclasses.replace(
        dep, backbone=dataclasses.replace(dep.backbone, cpn_layers=(1, 1, 1, 1))
    )
    dmaps = dataclasses.replace(
        dep, backbone=dataclasses.replace(dep.backbone, cpn_int8_maps=True)
    )

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    kp = jnp.asarray(rng.uniform(-1, 1, (2, 17, 2)).astype(np.float32))
    kpc = jnp.asarray(rng.uniform(0, 64, (2, 17, 2)).astype(np.float32))

    def run(model_cfg):
        m = ContextAwarePoseFormer(cfg=model_cfg)
        v = m.init(jax.random.PRNGKey(0), imgs[:1], kp[:1], kpc[:1])
        v = prepare_serving(m, v, (imgs, kp, kpc))
        return np.asarray(m.apply(v, imgs, kp, kpc)), v

    out0, _ = run(dep)
    out1, v1 = run(dmaps)
    calib_keys = {
        "/".join(str(k) for k in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(v1["calib"])[0]
    }
    assert any("refine_net.feature3_amax" in k for k in calib_keys), sorted(
        calib_keys
    )
    assert np.all(np.isfinite(out1))
    rel = np.sqrt(np.mean((out0 - out1) ** 2)) / (
        np.sqrt(np.mean(out0**2)) + 1e-9
    )
    assert rel < 0.08, rel  # 8-bit map quantization only

    # fused (interpret) sampler on s8 maps must match the gather path
    dmaps_k = dataclasses.replace(
        dmaps, lifter=dataclasses.replace(
            dmaps.lifter, sampler="fused_interpret"
        )
    )
    out2, _ = run(dmaps_k)
    relk = np.sqrt(np.mean((out1 - out2) ** 2)) / (
        np.sqrt(np.mean(out1**2)) + 1e-9
    )
    assert relk < 5e-2, relk  # bf16 kernel passes vs f32 gather


@pytest.mark.slow
def test_native_pyramid_backbone_equivalence():
    """cpn_native_pyramid returns the SAME refine maps pre-resize: upsampling
    the native pyramid with the reference resize reproduces the default
    graph bit-for-bit (the knob only moves the resize out of the backbone)."""
    import dataclasses

    cfg_r = cpn_backbone()
    cfg_n = dataclasses.replace(cfg_r, cpn_native_pyramid=True)
    assert cfg_n.feature_strides == (32, 16, 8, 4)

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    model_r, model_n = CPN(cfg=cfg_r), CPN(cfg=cfg_n)
    params = model_r.init(jax.random.PRNGKey(0), x)
    fr = model_r.apply(params, x)
    fn = model_n.apply(params, x)

    assert [f.shape[1:3] for f in fn] == [(2, 2), (4, 4), (8, 8), (16, 16)]
    for i in range(4):
        up = resize_bilinear_align_corners(fn[i], (16, 16))
        np.testing.assert_allclose(
            np.asarray(up), np.asarray(fr[i]), rtol=1e-6, atol=1e-6
        )


def test_cpn_fold_normalize_stem_exact():
    """cpn_fold_normalize feeds RAW u8 BGR and folds the normalization into
    the stem conv: conv(x_norm) = conv_i8(u8-128) / 255 + conv(c*mask) with
    c = (128 - pixel_mean)/255 and zero padding applied to BOTH terms — the
    border ring must be exact, not just the interior. White-box oracle from
    the module's own params + int8 weight grid; also checks the end-to-end
    maps stay close to the float-input serve graph (only the stem weight
    rounding differs)."""
    import dataclasses

    from contextaware_poseformer_tpu.data.augment import (
        CPN_PIXEL_MEAN,
        normalize_images,
    )

    cfg = dataclasses.replace(
        cpn_backbone(), quantize="serve", cpn_layers=(1, 1, 1, 1),
        cpn_fold_normalize=True,
    )
    m = CPN(cfg=cfg)
    rng = np.random.RandomState(3)
    u8 = jnp.asarray(rng.randint(0, 256, (2, 64, 64, 3)).astype(np.uint8))
    xf = normalize_images(u8, "cpn")
    v = m.init(jax.random.PRNGKey(0), xf[:1])

    out_fold, inter = m.apply(
        v, u8, capture_intermediates=True, mutable=["intermediates"]
    )
    calls = inter["intermediates"]["resnet.conv1"]["__call__"]
    assert len(calls) == 2  # (bias_map raw call, s8 x_quant call)
    stem_model = np.asarray(jax.nn.relu(calls[0] + calls[1]))

    # oracle straight from params + the documented folding algebra
    p = v["params"]["resnet.conv1"]
    k = np.asarray(p["kernel"], np.float64)
    wscale = np.abs(k).max(axis=(0, 1, 2)) / 127.0
    kq = np.round(k / wscale)
    s8 = (np.asarray(u8).astype(np.int16) - 128).astype(np.float64)[..., ::-1]

    def conv(x, kk):
        return np.asarray(jax.lax.conv_general_dilated(
            jnp.asarray(x, jnp.float32), jnp.asarray(kk, jnp.float32),
            window_strides=(2, 2), padding=[(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ), np.float64)

    c_off = (128.0 - np.asarray(CPN_PIXEL_MEAN)) / 255.0
    cimg = np.broadcast_to(c_off, (1, 64, 64, 3))
    lin = conv(s8, kq) * wscale / 255.0 + conv(cimg, k)
    oracle = np.maximum(
        lin * np.asarray(p["scale"], np.float64)
        + np.asarray(p["bias"], np.float64), 0.0,
    )
    np.testing.assert_allclose(stem_model, oracle, rtol=1e-4, atol=1e-5)

    # end-to-end: fold(u8) vs float serve graph on normalize_images(u8) —
    # the stem weight int8 rounding is the ONLY difference
    out_float = m.apply(v, xf)
    for lvl, (a, b) in enumerate(zip(out_float, out_fold)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(b)), lvl
        rel = np.sqrt(np.mean((a - b) ** 2)) / (np.sqrt(np.mean(a**2)) + 1e-9)
        assert rel < 0.05, (lvl, rel)


def test_serving_images_dispatch():
    """serving_images: raw-u8 passthrough ONLY for cpn serve graphs with
    the fold knob; every other combination normalizes."""
    import dataclasses

    from contextaware_poseformer_tpu.data import augment

    u8 = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (1, 8, 8, 3), np.uint8)
    )
    base = cpn_backbone()
    fold = dataclasses.replace(
        base, quantize="serve", cpn_fold_normalize=True
    )
    assert augment.serving_images(u8, fold) is u8
    out = augment.serving_images(u8, base, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(augment.normalize_images(u8, "cpn")),
        rtol=0, atol=0,
    )
    # fold knob without serve quantization stays on the normalize path
    fold_noserve = dataclasses.replace(base, cpn_fold_normalize=True)
    assert augment.serving_images(u8, fold_noserve).dtype == jnp.bfloat16
