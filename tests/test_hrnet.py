import numpy as np
import pytest

import jax
import jax.numpy as jnp

from contextaware_poseformer_tpu.config import (
    BackboneConfig,
    HRNetStageConfig,
    hrnet_backbone,
)
from contextaware_poseformer_tpu.models.convert import convert_conv_backbone
from contextaware_poseformer_tpu.models.hrnet import HRNet

torch = pytest.importorskip("torch")
import torch_oracle  # noqa: E402


def tiny_cfg(width=8):
    """Structurally complete but small HRNet (all 4 stages, multi-module)."""
    c = (width, 2 * width, 4 * width, 8 * width)
    return BackboneConfig(
        kind="hrnet",
        width=width,
        stage2=HRNetStageConfig(1, 2, (2, 2), c[:2]),
        stage3=HRNetStageConfig(2, 3, (2, 2, 2), c[:3]),
        stage4=HRNetStageConfig(2, 4, (2, 2, 2, 2), c),
    )


def test_hrnet_matches_torch_oracle_via_converter():
    cfg = tiny_cfg()
    model = HRNet(cfg=cfg)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 64, 64, 3).astype(np.float32)

    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), jnp.zeros_like(x))
    flat = shapes["params"]

    sd = torch_oracle.random_state_dict_for(flat, rng)
    params = {"params": convert_conv_backbone(sd, flat)}

    ours = model.apply(params, jnp.asarray(x))
    golden = torch_oracle.hrnet_forward(sd, np.transpose(x, (0, 3, 1, 2)), cfg)

    assert len(ours) == 4
    for lvl, (a, b) in enumerate(zip(ours, golden)):
        a = np.asarray(a)
        b = np.transpose(b, (0, 2, 3, 1))
        assert a.shape == b.shape, (lvl, a.shape, b.shape)
        # error normalized by the level's value scale (fp32 summation-order
        # noise through a ~20-conv stack)
        scale = np.sqrt(np.mean(b**2))
        rel = np.abs(a - b) / scale
        assert rel.max() < 1e-4, f"level {lvl}: worst {rel.max()}"


def test_hrnet_output_shapes_full_size():
    cfg = hrnet_backbone(32)
    model = HRNet(cfg=cfg)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 256, 192, 3))
    )
    out = jax.eval_shape(
        lambda p, x: model.apply(p, x), shapes, jnp.zeros((1, 256, 192, 3))
    )
    dims = [(64, 48, 32), (32, 24, 64), (16, 12, 128), (8, 6, 256)]
    for o, (h, w, c) in zip(out, dims):
        assert o.shape == (1, h, w, c)

    # parameter count sanity: HRNet-W32 backbone sans final layer ~28.5M
    n = sum(
        int(np.prod(l.shape))
        for l in jax.tree.leaves(shapes)
        if l.ndim == 4  # conv kernels
    )
    assert 27e6 < n < 30e6, n


def test_converter_rejects_shape_mismatch_and_leftovers():
    cfg = tiny_cfg()
    model = HRNet(cfg=cfg)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )["params"]
    rng = np.random.RandomState(1)
    sd = torch_oracle.random_state_dict_for(shapes, rng)

    bad = dict(sd)
    bad["conv1.weight"] = bad["conv1.weight"][:, :, :1, :1]
    with pytest.raises(ValueError):
        convert_conv_backbone(bad, shapes)

    extra = dict(sd)
    extra["some_extra.weight"] = np.zeros((1,), np.float32)
    with pytest.raises(ValueError, match="unconsumed"):
        convert_conv_backbone(extra, shapes)
    # final_layer keys are expected leftovers (strict=False load in reference)
    extra2 = dict(sd)
    extra2["final_layer.weight"] = np.zeros((1,), np.float32)
    convert_conv_backbone(extra2, shapes)  # no raise


@pytest.mark.slow
def test_quantize_c128_close_and_narrow_untouched():
    """quantize='c128' switches only convs with both channel counts >= 128
    to int8; on a width-8 tiny config NO conv qualifies, so outputs are
    bit-identical. On a width-32 config (branch2/3 reach 128/256 channels)
    features stay within a few percent RMS of fp32 (trained-model P1 delta
    measured at +0.006 mm, PERF.md)."""
    import dataclasses

    import jax
    import numpy as np
    import jax.numpy as jnp

    from contextaware_poseformer_tpu.models.hrnet import HRNet

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))

    cfg = tiny_cfg()  # width 8: no conv qualifies
    bb = HRNet(cfg=cfg)
    params = bb.init(jax.random.PRNGKey(0), x)
    base = bb.apply(params, x)
    bbq = HRNet(cfg=dataclasses.replace(cfg, quantize="c128"))
    quant = bbq.apply(params, x)
    for a, b in zip(base, quant):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    cfg32 = tiny_cfg(width=32)  # branch2=128, branch3=256 qualify
    bb = HRNet(cfg=cfg32)
    params = bb.init(jax.random.PRNGKey(0), x)
    base = bb.apply(params, x)
    bbq = HRNet(cfg=dataclasses.replace(cfg32, quantize="c128"))
    quant = bbq.apply(params, x)
    changed = False
    for a, b in zip(base, quant):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        rms_rel = np.sqrt(((a - b) ** 2).mean()) / (a.std() + 1e-9)
        assert rms_rel < 0.05, rms_rel
        changed = changed or (np.abs(a - b).max() > 0)
    assert changed  # the int8 path actually ran


@pytest.mark.slow
def test_quantize_static_calibration_flow():
    """quantize='static': init-with-zeros leaves calib unpopulated (and
    check_calibrated raises); a calibration pass is float-exact and records
    activation scales; the calibrated int8 apply stays within a few percent
    RMS of fp32 (per-conv RMS error ~1%, PERF.md)."""
    import dataclasses

    from contextaware_poseformer_tpu.models.backbone_common import (
        calibrate_quantization,
        check_calibrated,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))

    cfg = tiny_cfg(width=16)  # 3x3 convs with both channels >= 16 qualify
    bb = HRNet(cfg=cfg)
    params = bb.init(jax.random.PRNGKey(0), x)
    base = bb.apply(params, x)

    bbq = HRNet(cfg=dataclasses.replace(cfg, quantize="static"))
    variables = bbq.init(jax.random.PRNGKey(0), jnp.zeros_like(x))
    assert "calib" in variables
    with pytest.raises(ValueError, match="uncalibrated"):
        check_calibrated(variables)

    # calibration pass computes in float: bit-identical to the fp32 model
    calibrated, upd = bbq.apply(
        {**variables, "params": params["params"]}, x, mutable=["calib"]
    )
    for a, b in zip(base, calibrated):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    variables = calibrate_quantization(
        lambda v, b, **kw: bbq.apply(v, b, **kw),
        {**variables, "params": params["params"]},
        [x],
    )
    check_calibrated(variables)

    quant = bbq.apply(variables, x)
    changed = False
    for a, b in zip(base, quant):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        rms_rel = np.sqrt(((a - b) ** 2).mean()) / (a.std() + 1e-9)
        assert rms_rel < 0.06, rms_rel
        changed = changed or rms_rel > 1e-6
    assert changed  # the int8 path actually engaged

    # pre-quantized weights: bit-identical to on-the-fly quantization
    from contextaware_poseformer_tpu.models.backbone_common import (
        prepare_int8_weights,
    )

    stored = prepare_int8_weights(
        lambda v, b, **kw: bbq.apply(v, b, **kw), variables, x
    )
    assert "qweights" in stored
    quant2 = bbq.apply(stored, x)
    for a, b in zip(quant, quant2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_quantize_serve_end_to_end_int8_layer1():
    """quantize='serve' = c128 dynamic int8 for wide convs + END-TO-END int8
    layer1 with static calibrated scales (HRNet._layer1_int8). Checks: param
    tree unchanged, calibration pass bit-matches the c128 model (layer1 runs
    float while observing), calibrated inference stays within a few percent
    RMS, and pre-quantized weights are bit-identical."""
    import dataclasses

    from contextaware_poseformer_tpu.config import hrnet_backbone
    from contextaware_poseformer_tpu.models.backbone_common import (
        calibrate_quantization,
        check_calibrated,
        prepare_int8_weights,
    )

    cfg = hrnet_backbone(32)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    bb = HRNet(cfg=cfg)
    params = bb.init(jax.random.PRNGKey(0), x)
    base = bb.apply(params, x)
    base_c128 = HRNet(
        cfg=dataclasses.replace(cfg, quantize="c128")
    ).apply(params, x)

    bbs = HRNet(cfg=dataclasses.replace(cfg, quantize="serve"))
    vs = bbs.init(jax.random.PRNGKey(0), jnp.zeros_like(x))
    paths = lambda t: {
        "/".join(map(str, p))
        for p, _ in jax.tree_util.tree_flatten_with_path(t)[0]
    }
    assert paths(params["params"]) == paths(vs["params"])

    vs = {**vs, "params": params["params"]}
    cal, _ = bbs.apply(vs, x, mutable=["calib"])
    for a, b in zip(base_c128, cal):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    vs = calibrate_quantization(
        lambda v, b, **kw: bbs.apply(v, b, **kw), vs, [x]
    )
    check_calibrated(vs)
    out = bbs.apply(vs, x)
    for a, b in zip(base, out):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        rms_rel = np.sqrt(((a - b) ** 2).mean()) / (a.std() + 1e-9)
        assert 1e-7 < rms_rel < 0.06, rms_rel  # engaged, bounded

    stored = prepare_int8_weights(
        lambda v, b, **kw: bbs.apply(v, b, **kw), vs, x
    )
    out2 = bbs.apply(stored, x)
    for a, b in zip(out, out2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_layer1_pallas_chain_matches_xla_serve():
    """layer1_impl='pallas' (ops/layer1_chain.py, interpret on CPU) must
    bit-match the XLA e2e-int8 layer1 graph through the REAL serve model:
    same calib variables, same pre-quantized weights, identical outputs.
    (On real TPU the kernel is an opt-in negative-result artifact — the
    int32->bf16 epilogue double-rounds differently in Mosaic and the int8
    matmul floor loses to XLA; PERF.md round-2 session 3.)"""
    import dataclasses

    from contextaware_poseformer_tpu.config import hrnet_backbone
    from contextaware_poseformer_tpu.models.backbone_common import (
        calibrate_quantization,
        prepare_int8_weights,
    )

    cfg = dataclasses.replace(hrnet_backbone(32), quantize="serve")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32)).astype(
        jnp.bfloat16
    )
    bb_x = HRNet(cfg=cfg, dtype=jnp.bfloat16)
    vs = bb_x.init(jax.random.PRNGKey(0), x)
    apply = lambda v, b, **kw: bb_x.apply(v, b, **kw)
    vs = calibrate_quantization(apply, vs, [x])
    out_x = bb_x.apply(vs, x)

    bb_p = HRNet(
        cfg=dataclasses.replace(cfg, layer1_impl="pallas"),
        dtype=jnp.bfloat16,
    )
    out_p = bb_p.apply(vs, x)
    for a, b in zip(out_x, out_p):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    stored = prepare_int8_weights(apply, vs, x)
    out_p2 = bb_p.apply(stored, x)
    for a, b in zip(out_x, out_p2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_serve_static_amax_close_to_dynamic():
    """serve_static_amax=True replaces the wide convs' runtime max|x|
    reduce with the calibrated static scale. Calibration runs the c128
    graph (float layer1) while serve inference runs int8 layer1, so
    post-layer1 static amaxes differ from inference-dynamic ones by the
    layer1 quantization error — outputs must be close, not bit-equal,
    even when calibrating on the inference batch itself."""
    import dataclasses

    from contextaware_poseformer_tpu.config import hrnet_backbone
    from contextaware_poseformer_tpu.models.backbone_common import (
        calibrate_quantization,
        check_calibrated,
    )

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    cfg = dataclasses.replace(hrnet_backbone(32), quantize="serve")
    bb_dyn = HRNet(cfg=cfg)
    vs = bb_dyn.init(jax.random.PRNGKey(0), x)
    apply_dyn = lambda v, b, **kw: bb_dyn.apply(v, b, **kw)
    vs_dyn = calibrate_quantization(apply_dyn, vs, [x])
    out_dyn = bb_dyn.apply(vs_dyn, x)

    bb_st = HRNet(
        cfg=dataclasses.replace(cfg, serve_static_amax=True)
    )
    apply_st = lambda v, b, **kw: bb_st.apply(v, b, **kw)
    vs_st = calibrate_quantization(apply_st, vs, [x])
    check_calibrated(vs_st)
    # static mode records amax for every wide conv (superset of the
    # dynamic model's layer1-only calib tree)
    n_dyn = len(jax.tree.leaves(vs_dyn["calib"]))
    n_st = len(jax.tree.leaves(vs_st["calib"]))
    assert n_st > n_dyn
    out_st = bb_st.apply(vs_st, x)
    for a, b in zip(out_dyn, out_st):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        rms_rel = np.sqrt(((a - b) ** 2).mean()) / (a.std() + 1e-9)
        assert 0.0 <= rms_rel < 0.05, rms_rel  # engaged elsewhere, bounded


def test_stage4_truncate_levels_1_3_bit_identical():
    """hrnet_stage4_truncate drops stage-4 modules 1-2. Levels 1-3 are the
    FIRST stage-4 module's pre-fuse branch outputs in BOTH graphs (the
    reference aliasing quirk, pose_hrnet.py:289-290,501), so with the same
    full-graph params they must be BIT-identical; only level0 changes
    (module 0's fused output vs module 2's). A full-graph checkpoint applies
    to the truncated graph directly — modules 1-2 params just go unused."""
    import dataclasses

    cfg = tiny_cfg()  # stage4 has 2 modules: truncation drops module 1
    full = HRNet(cfg=cfg)
    trunc = HRNet(
        cfg=dataclasses.replace(cfg, hrnet_stage4_truncate=True)
    )
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    params = full.init(jax.random.PRNGKey(0), x)
    out_f = full.apply(params, x)
    out_t = trunc.apply(params, x)
    assert len(out_t) == 4
    for lvl in (1, 2, 3):
        np.testing.assert_array_equal(
            np.asarray(out_f[lvl]), np.asarray(out_t[lvl]), err_msg=f"level {lvl}"
        )
    assert out_t[0].shape == out_f[0].shape
    assert not np.allclose(np.asarray(out_f[0]), np.asarray(out_t[0]))
    # the truncated graph's own param tree is a strict subset: no module-1
    # params, no module-0 multi-scale fuse rows (fuse_layers.1..3)
    p_t = {str(k) for k, _ in jax.tree_util.tree_flatten_with_path(
        trunc.init(jax.random.PRNGKey(0), x)["params"])[0]}
    p_f = {str(k) for k, _ in jax.tree_util.tree_flatten_with_path(
        params["params"])[0]}
    assert p_t < p_f
    assert not any("stage4.1" in k for k in p_t)
