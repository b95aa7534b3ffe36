"""Reproducible evidence for the deployment-numerics accuracy claims.

Two measurements (PERF.md cites the numbers these produce):

1. full-size output deltas: the flagship composite, same random-init params,
   fp32 parity config vs config.deploy (bf16 stream + fused kernels + int8
   c>=128 convs), reported in mm of root-relative 3D output. Random init is
   the PESSIMISTIC regime — the head LayerNorm amplifies precision noise
   that trained weights suppress.
2. trained-model P1 A/B: trains a small model on the synthetic
   geometric-consistency task (data/synthetic.py), then evaluates P1 with
   both numerics on the same trained params. This is the number that
   actually matters for serving. Width 32 so the int8 c>=128 rule engages
   (branch2=128ch, branch3=256ch).

    python tools/deploy_numerics.py            # both, CPU-friendly
    python tools/deploy_numerics.py --skip-trained
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def output_delta(preset_name: str = "h36m_hrnet_32",
                 batch: int = 4) -> dict:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from contextaware_poseformer_tpu import config as cfglib
    from contextaware_poseformer_tpu.models import ContextAwarePoseFormer

    cfg = cfglib.preset(preset_name)
    b = batch
    h, w = cfg.model.image_shape
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32))
    kp = jnp.asarray(rng.uniform(-1, 1, (b, 17, 2)).astype(np.float32))
    kpc = jnp.asarray(rng.uniform(0, w, (b, 17, 2)).astype(np.float32))

    m32 = ContextAwarePoseFormer(cfg=cfg.model)
    params = m32.init(jax.random.PRNGKey(0), imgs[:1], kp[:1], kpc[:1])
    out32 = np.asarray(m32.apply(params, imgs, kp, kpc), np.float64)

    from contextaware_poseformer_tpu.models import prepare_serving

    dep = cfglib.deploy(cfg).model
    mdep = ContextAwarePoseFormer(cfg=dep, dtype=jnp.bfloat16)
    vdep = prepare_serving(mdep, dict(params), (imgs, kp, kpc))
    outd = np.asarray(mdep.apply(vdep, imgs, kp, kpc), np.float64)

    d = np.abs(out32 - outd) * 1000
    res = {
        "preset": preset_name,
        "fullsize_delta_max_mm": round(float(d.max()), 4),
        "fullsize_delta_mean_mm": round(float(d.mean()), 4),
        "output_scale_mm": round(float(np.abs(out32).mean() * 1000), 1),
    }
    print(f"[{preset_name}] full-size random-init output delta "
          f"(PESSIMISTIC): max {d.max():.3f} mm, mean {d.mean():.3f} mm "
          f"(output scale {np.abs(out32).mean() * 1000:.1f} mm)")
    return res


def trained_ab(steps_n: int = 250):
    import numpy as np

    import jax
    import jax.numpy as jnp

    from contextaware_poseformer_tpu import config as cfglib
    from contextaware_poseformer_tpu.config import (
        BackboneConfig,
        HRNetStageConfig,
        LifterConfig,
    )
    from contextaware_poseformer_tpu.data.synthetic import SyntheticPoseDataset
    from contextaware_poseformer_tpu.models import ContextAwarePoseFormer
    from contextaware_poseformer_tpu.train import steps

    w = 32
    c = (w, 2 * w, 4 * w, 8 * w)
    cfg = cfglib.preset("h36m_hrnet_32")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            backbone=BackboneConfig(
                kind="hrnet", width=w,
                stage2=HRNetStageConfig(1, 2, (2, 2), c[:2]),
                stage3=HRNetStageConfig(1, 3, (2, 2, 2), c[:3]),
                stage4=HRNetStageConfig(1, 4, (2, 2, 2, 2), c),
            ),
            lifter=LifterConfig(embed_dim_ratio=32, depth=2, levels=4),
            image_shape=(64, 64),
        ),
        train=dataclasses.replace(cfg.train, batch_size=16),
    )

    train_ds = SyntheticPoseDataset(size=128, image_shape=(64, 64), seed=0)
    val_ds = SyntheticPoseDataset(size=64, image_shape=(64, 64), seed=99)
    model = ContextAwarePoseFormer(cfg=cfg.model)
    opt = steps.make_optimizer(cfg, steps_per_epoch=100)
    train_step = jax.jit(steps.make_train_step(model, cfg, opt))

    def batch_of(ds, idx):
        return steps.RawBatch(
            jnp.asarray(ds._images[idx]), jnp.asarray(ds.joints_3d[idx]),
            jnp.asarray(ds.joints_2d[idx]),
            jnp.asarray(ds.joints_2d_crop[idx]),
        )

    rng = np.random.RandomState(0)
    state = steps.init_state(model, cfg, opt, jax.random.PRNGKey(0),
                             batch_of(train_ds, np.arange(16)))
    key = jax.random.PRNGKey(1)
    for _ in range(steps_n):
        idx = rng.randint(0, len(train_ds), 16)
        state, aux = train_step(state, batch_of(train_ds, idx), key)
    print(f"trained {steps_n} steps, final loss {float(aux['loss']):.4f}")

    def eval_p1(model_cfg, calib_n: int = 64):
        from contextaware_poseformer_tpu.data import augment
        from contextaware_poseformer_tpu.models import prepare_serving

        m = ContextAwarePoseFormer(cfg=model_cfg)
        # serve-mode calibration on >= 64 val samples (normalized the same
        # way the eval step normalizes) — VERDICT round-1 item 6
        extra = None
        if model_cfg.backbone.quantize != "none":
            batches = []
            for s in range(0, calib_n, 16):
                b = batch_of(val_ds, np.arange(s, s + 16))
                batches.append((
                    augment.serving_images(
                        b.images_u8, model_cfg.backbone, dtype=jnp.float32
                    ),
                    b.keypoints_2d, b.keypoints_2d_crop,
                ))
            v = prepare_serving(
                m, {"params": state.params}, batches[0], batches=batches
            )
            extra = {k: v[k] for k in v if k != "params"}
        estep = jax.jit(steps.make_eval_step(
            m, dataclasses.replace(cfg, model=model_cfg),
            extra_variables=extra))
        errs = []
        for s in range(0, len(val_ds), 16):
            idx = np.arange(s, min(s + 16, len(val_ds)))
            pred, gt = estep(state.params, batch_of(val_ds, idx))
            errs.append(np.linalg.norm(
                np.asarray(pred) - np.asarray(gt), axis=-1))
        return float(np.concatenate(errs).mean() * 1000)

    p1 = eval_p1(cfg.model)
    dep = cfglib.deploy(cfg).model
    p1d = eval_p1(dep)
    print(f"trained P1: fp32 {p1:.3f} mm | deploy {p1d:.3f} mm | "
          f"delta {p1d - p1:+.3f} mm")
    # calibration-quality sweep (PERF.md serve-calibration lever): histogram
    # percentile amax vs max, all at 64 calibration samples
    for q in (0.9999, 0.999):
        mq = dataclasses.replace(
            dep, backbone=dataclasses.replace(dep.backbone, calib_quantile=q)
        )
        p1q = eval_p1(mq)
        print(f"trained P1: deploy q={q} {p1q:.3f} mm | "
              f"delta vs fp32 {p1q - p1:+.3f} mm")
    # serve_static_amax: wide convs on calibrated static scales (no runtime
    # abs-reduce) at the deploy calibration quantile
    ms = dataclasses.replace(
        dep, backbone=dataclasses.replace(
            dep.backbone, serve_static_amax=True
        )
    )
    p1s = eval_p1(ms)
    print(f"trained P1: deploy static-amax {p1s:.3f} mm | "
          f"delta vs fp32 {p1s - p1:+.3f} mm")


def trained_cpn_ab(steps_n: int = 250):
    """P1 delta of cpn_native_pyramid on a trained tiny-CPN model.

    The knob's only numeric effect is the sampler reading the native /32../4
    pyramid instead of the /4-materialized maps (crease smoothing, see
    config.BackboneConfig); a tiny cpn_layers=(1,1,1,1) backbone keeps the
    same sampler geometry (4 levels, same strides) at CPU-trainable cost.
    """
    import numpy as np

    import jax
    import jax.numpy as jnp

    from contextaware_poseformer_tpu import config as cfglib
    from contextaware_poseformer_tpu.config import LifterConfig
    from contextaware_poseformer_tpu.data.synthetic import SyntheticPoseDataset
    from contextaware_poseformer_tpu.models import ContextAwarePoseFormer
    from contextaware_poseformer_tpu.train import steps

    cfg = cfglib.preset("h36m_cpn")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            backbone=dataclasses.replace(
                cfg.model.backbone, cpn_layers=(1, 1, 1, 1)
            ),
            lifter=LifterConfig(embed_dim_ratio=32, depth=2, levels=4),
            image_shape=(64, 64),
        ),
        train=dataclasses.replace(cfg.train, batch_size=16),
    )

    train_ds = SyntheticPoseDataset(size=128, image_shape=(64, 64), seed=0)
    val_ds = SyntheticPoseDataset(size=64, image_shape=(64, 64), seed=99)
    model = ContextAwarePoseFormer(cfg=cfg.model)
    opt = steps.make_optimizer(cfg, steps_per_epoch=100)
    train_step = jax.jit(steps.make_train_step(model, cfg, opt))

    def batch_of(ds, idx):
        return steps.RawBatch(
            jnp.asarray(ds._images[idx]), jnp.asarray(ds.joints_3d[idx]),
            jnp.asarray(ds.joints_2d[idx]),
            jnp.asarray(ds.joints_2d_crop[idx]),
        )

    rng = np.random.RandomState(0)
    state = steps.init_state(model, cfg, opt, jax.random.PRNGKey(0),
                             batch_of(train_ds, np.arange(16)))
    key = jax.random.PRNGKey(1)
    for _ in range(steps_n):
        idx = rng.randint(0, len(train_ds), 16)
        state, aux = train_step(state, batch_of(train_ds, idx), key)
    print(f"[cpn] trained {steps_n} steps, final loss {float(aux['loss']):.4f}")

    def eval_p1(model_cfg, calib_n: int = 64):
        from contextaware_poseformer_tpu.data import augment
        from contextaware_poseformer_tpu.models import prepare_serving

        m = ContextAwarePoseFormer(cfg=model_cfg)
        extra = None
        if model_cfg.backbone.quantize != "none":
            batches = []
            for s in range(0, calib_n, 16):
                b = batch_of(val_ds, np.arange(s, s + 16))
                batches.append((
                    augment.serving_images(
                        b.images_u8, model_cfg.backbone, dtype=jnp.float32
                    ),
                    b.keypoints_2d, b.keypoints_2d_crop,
                ))
            v = prepare_serving(
                m, {"params": state.params}, batches[0], batches=batches
            )
            extra = {k: v[k] for k in v if k != "params"}
        estep = jax.jit(steps.make_eval_step(
            m, dataclasses.replace(cfg, model=model_cfg),
            extra_variables=extra))
        errs = []
        for s in range(0, len(val_ds), 16):
            idx = np.arange(s, min(s + 16, len(val_ds)))
            pred, gt = estep(state.params, batch_of(val_ds, idx))
            errs.append(np.linalg.norm(
                np.asarray(pred) - np.asarray(gt), axis=-1))
        return float(np.concatenate(errs).mean() * 1000)

    p1 = eval_p1(cfg.model)
    nat = dataclasses.replace(
        cfg.model,
        backbone=dataclasses.replace(
            cfg.model.backbone, cpn_native_pyramid=True
        ),
    )
    p1n = eval_p1(nat)
    print(f"[cpn] trained P1: resized {p1:.3f} mm | native-pyramid "
          f"{p1n:.3f} mm | delta {p1n - p1:+.3f} mm")
    # full CPN deploy stack (serve quant + calib + native pyramid), then
    # + serve_static_amax — the accuracy gate for the per-preset ship
    # decision (PERF.md round-3 static-amax page)
    dep = cfglib.deploy(cfg).model
    p1d = eval_p1(dep)
    print(f"[cpn] trained P1: deploy {p1d:.3f} mm | "
          f"delta vs fp32 {p1d - p1:+.3f} mm")
    ms = dataclasses.replace(
        dep, backbone=dataclasses.replace(
            dep.backbone, serve_static_amax=True
        )
    )
    p1s = eval_p1(ms)
    print(f"[cpn] trained P1: deploy static-amax {p1s:.3f} mm | "
          f"delta vs fp32 {p1s - p1:+.3f} mm")
    # + cpn_int8_stream: e2e int8 through the resnet/refine chains (the
    # round-4 lever — extra quantization points vs per-conv serve)
    mstream = dataclasses.replace(
        ms, backbone=dataclasses.replace(
            ms.backbone, cpn_int8_stream=True
        )
    )
    p1e = eval_p1(mstream)
    print(f"[cpn] trained P1: deploy int8-stream {p1e:.3f} mm | "
          f"delta vs fp32 {p1e - p1:+.3f} mm | vs static-amax "
          f"{p1e - p1s:+.3f} mm")
    # + cpn_int8_maps: int8 pyramid maps into the lifter sampler (the
    # round-4 HBM lever — the lifter's context now reads 8-bit maps)
    mmaps = dataclasses.replace(
        mstream, backbone=dataclasses.replace(
            mstream.backbone, cpn_int8_maps=True
        )
    )
    p1m = eval_p1(mmaps)
    print(f"[cpn] trained P1: deploy int8-maps {p1m:.3f} mm | "
          f"delta vs fp32 {p1m - p1:+.3f} mm | vs int8-stream "
          f"{p1m - p1e:+.3f} mm")
    # + cpn_fold_normalize: raw-u8 input, normalize folded into the stem
    # conv (round-5 lever — the only approximation is the stem weight int8
    # rounding; the eval step + calibration feed u8 via serving_images)
    mfold = dataclasses.replace(
        mmaps, backbone=dataclasses.replace(
            mmaps.backbone, cpn_fold_normalize=True
        )
    )
    p1f = eval_p1(mfold)
    print(f"[cpn] trained P1: deploy fold-normalize {p1f:.3f} mm | "
          f"delta vs fp32 {p1f - p1:+.3f} mm | vs int8-maps "
          f"{p1f - p1m:+.3f} mm")
    # + cpn_int8_topdown: s8 globalNet top-down stream (round-5 lever —
    # the x2-upsampled lateral maps move through HBM at s8 width; one
    # requant point per top-down hop). Stacked on int8-maps (the shipped
    # deploy stack), NOT on fold-normalize (measured-negative, closed).
    mtd = dataclasses.replace(
        mmaps, backbone=dataclasses.replace(
            mmaps.backbone, cpn_int8_topdown=True
        )
    )
    p1t = eval_p1(mtd)
    print(f"[cpn] trained P1: deploy int8-topdown {p1t:.3f} mm | "
          f"delta vs fp32 {p1t - p1:+.3f} mm | vs int8-maps "
          f"{p1t - p1m:+.3f} mm")


def trained_truncate_ab(steps_n: int = 250):
    """Trained-P1 gate for hrnet_stage4_truncate (VERDICT r3 item 2).

    The standard tiny protocol uses a 1-module stage4 (nothing to drop), so
    this one trains a tiny model with the reference's THREE stage-4 modules
    and evaluates two framings:

    1. POST-HOC drop on the full-graph-trained model (fp32+truncate,
       deploy+truncate). Measured CATASTROPHIC (+556 mm): level0 becomes
       module 0's fused output, whose statistics the lifter never saw.
    2. TRAINED-TRUNCATED: train a second model from scratch WITH
       hrnet_stage4_truncate=True (same init seed / data / steps) and
       compare its P1 to the full-graph model's. This is the deployable
       framing — a topology choice made before training, like choosing a
       smaller width.
    """
    import numpy as np

    import jax
    import jax.numpy as jnp

    from contextaware_poseformer_tpu import config as cfglib
    from contextaware_poseformer_tpu.config import (
        BackboneConfig,
        HRNetStageConfig,
        LifterConfig,
    )
    from contextaware_poseformer_tpu.data.synthetic import SyntheticPoseDataset
    from contextaware_poseformer_tpu.models import ContextAwarePoseFormer
    from contextaware_poseformer_tpu.train import steps

    w = 32
    c = (w, 2 * w, 4 * w, 8 * w)
    cfg = cfglib.preset("h36m_hrnet_32")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            backbone=BackboneConfig(
                kind="hrnet", width=w,
                stage2=HRNetStageConfig(1, 2, (2, 2), c[:2]),
                stage3=HRNetStageConfig(1, 3, (2, 2, 2), c[:3]),
                # the REFERENCE's 3 stage-4 modules (shrunk blocks) so the
                # truncation actually removes modules 1-2
                stage4=HRNetStageConfig(3, 4, (2, 2, 2, 2), c),
            ),
            lifter=LifterConfig(embed_dim_ratio=32, depth=2, levels=4),
            image_shape=(64, 64),
        ),
        train=dataclasses.replace(cfg.train, batch_size=16),
    )

    train_ds = SyntheticPoseDataset(size=128, image_shape=(64, 64), seed=0)
    val_ds = SyntheticPoseDataset(size=64, image_shape=(64, 64), seed=99)

    def batch_of(ds, idx):
        return steps.RawBatch(
            jnp.asarray(ds._images[idx]), jnp.asarray(ds.joints_3d[idx]),
            jnp.asarray(ds.joints_2d[idx]),
            jnp.asarray(ds.joints_2d_crop[idx]),
        )

    def train_model(train_cfg, tag):
        model = ContextAwarePoseFormer(cfg=train_cfg.model)
        opt = steps.make_optimizer(train_cfg, steps_per_epoch=100)
        train_step = jax.jit(steps.make_train_step(model, train_cfg, opt))
        rng = np.random.RandomState(0)
        state = steps.init_state(model, train_cfg, opt, jax.random.PRNGKey(0),
                                 batch_of(train_ds, np.arange(16)))
        key = jax.random.PRNGKey(1)
        aux = None
        for _ in range(steps_n):
            idx = rng.randint(0, len(train_ds), 16)
            state, aux = train_step(state, batch_of(train_ds, idx), key)
        print(f"[s4tr] {tag}: trained {steps_n} steps, "
              f"final loss {float(aux['loss']):.4f}")
        return state

    def eval_p1(state, model_cfg, calib_n: int = 64):
        from contextaware_poseformer_tpu.data import augment
        from contextaware_poseformer_tpu.models import prepare_serving

        m = ContextAwarePoseFormer(cfg=model_cfg)
        extra = None
        if model_cfg.backbone.quantize != "none":
            batches = []
            for s in range(0, calib_n, 16):
                b = batch_of(val_ds, np.arange(s, s + 16))
                batches.append((
                    augment.serving_images(
                        b.images_u8, model_cfg.backbone, dtype=jnp.float32
                    ),
                    b.keypoints_2d, b.keypoints_2d_crop,
                ))
            v = prepare_serving(
                m, {"params": state.params}, batches[0], batches=batches
            )
            extra = {k: v[k] for k in v if k != "params"}
        estep = jax.jit(steps.make_eval_step(
            m, dataclasses.replace(cfg, model=model_cfg),
            extra_variables=extra))
        errs = []
        for s in range(0, len(val_ds), 16):
            idx = np.arange(s, min(s + 16, len(val_ds)))
            pred, gt = estep(state.params, batch_of(val_ds, idx))
            errs.append(np.linalg.norm(
                np.asarray(pred) - np.asarray(gt), axis=-1))
        return float(np.concatenate(errs).mean() * 1000)

    def with_truncate(model_cfg):
        return dataclasses.replace(
            model_cfg,
            backbone=dataclasses.replace(
                model_cfg.backbone, hrnet_stage4_truncate=True
            ),
        )

    # framing 1: full-graph training, post-hoc drop
    state = train_model(cfg, "full topology")
    p1 = eval_p1(state, cfg.model)
    p1t = eval_p1(state, with_truncate(cfg.model))
    print(f"[s4tr] trained P1: fp32 {p1:.3f} mm | fp32+POST-HOC-truncate "
          f"{p1t:.3f} mm | delta {p1t - p1:+.3f} mm")
    dep = cfglib.deploy(cfg).model
    p1d = eval_p1(state, dep)
    p1dt = eval_p1(state, with_truncate(dep))
    print(f"[s4tr] trained P1: deploy {p1d:.3f} mm | deploy+POST-HOC-truncate "
          f"{p1dt:.3f} mm | delta vs fp32 {p1dt - p1:+.3f} mm")

    # framing 2: train WITH the truncated topology from scratch
    cfg_tr = dataclasses.replace(
        cfg, model=with_truncate(cfg.model)
    )
    state_tr = train_model(cfg_tr, "truncated topology")
    p1_tr = eval_p1(state_tr, cfg_tr.model)
    p1_trd = eval_p1(state_tr, with_truncate(dep))
    print(f"[s4tr] TRAINED-TRUNCATED P1: fp32 {p1_tr:.3f} mm "
          f"(full-topology fp32 {p1:.3f} mm, delta {p1_tr - p1:+.3f}) | "
          f"deploy {p1_trd:.3f} mm (delta vs own fp32 {p1_trd - p1_tr:+.3f})")


def _tiny_cfg(preset_name: str):
    """Tiny trainable config in the PRESET's deploy-knob class.

    hrnet presets: width-32 tiny stages so the int8 c>=128 serve rule
    engages (branch2=128ch, branch3=256ch). cpn: cpn_layers=(1,1,1,1)
    keeps the 4-level /32../4 sampler geometry. 3dhp presets keep
    use_deformable=False (the lifter variant that preset class serves).
    """
    from contextaware_poseformer_tpu import config as cfglib
    from contextaware_poseformer_tpu.config import (
        BackboneConfig,
        HRNetStageConfig,
    )

    cfg = cfglib.preset(preset_name)
    if cfg.model.backbone.kind == "cpn":
        backbone = dataclasses.replace(
            cfg.model.backbone, cpn_layers=(1, 1, 1, 1)
        )
    else:
        w = 32
        c = (w, 2 * w, 4 * w, 8 * w)
        backbone = BackboneConfig(
            kind="hrnet", width=w,
            stage2=HRNetStageConfig(1, 2, (2, 2), c[:2]),
            stage3=HRNetStageConfig(1, 3, (2, 2, 2), c[:3]),
            stage4=HRNetStageConfig(1, 4, (2, 2, 2, 2), c),
        )
    lifter = dataclasses.replace(
        cfg.model.lifter, embed_dim_ratio=32, depth=2, levels=4
    )
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, backbone=backbone, lifter=lifter,
            image_shape=(64, 64),
        ),
        train=dataclasses.replace(cfg.train, batch_size=16),
    )


def preset_gate(preset_name: str, steps_n: int = 250) -> dict:
    """fp32 vs COMPLETE config.deploy serve stack, trained tiny protocol.

    One number per preset per round (VERDICT r4 item 6): the P1 delta of
    the exact shipped deploy stack (whatever config.deploy currently adds
    for this preset kind) on a model trained on the synthetic task.
    """
    import numpy as np

    import jax
    import jax.numpy as jnp

    from contextaware_poseformer_tpu import config as cfglib
    from contextaware_poseformer_tpu.data import augment
    from contextaware_poseformer_tpu.data.synthetic import SyntheticPoseDataset
    from contextaware_poseformer_tpu.models import (
        ContextAwarePoseFormer,
        prepare_serving,
    )
    from contextaware_poseformer_tpu.train import steps

    cfg = _tiny_cfg(preset_name)
    train_ds = SyntheticPoseDataset(size=128, image_shape=(64, 64), seed=0)
    val_ds = SyntheticPoseDataset(size=64, image_shape=(64, 64), seed=99)
    model = ContextAwarePoseFormer(cfg=cfg.model)
    opt = steps.make_optimizer(cfg, steps_per_epoch=100)
    train_step = jax.jit(steps.make_train_step(model, cfg, opt))

    def batch_of(ds, idx):
        return steps.RawBatch(
            jnp.asarray(ds._images[idx]), jnp.asarray(ds.joints_3d[idx]),
            jnp.asarray(ds.joints_2d[idx]),
            jnp.asarray(ds.joints_2d_crop[idx]),
        )

    rng = np.random.RandomState(0)
    state = steps.init_state(model, cfg, opt, jax.random.PRNGKey(0),
                             batch_of(train_ds, np.arange(16)))
    key = jax.random.PRNGKey(1)
    for _ in range(steps_n):
        idx = rng.randint(0, len(train_ds), 16)
        state, aux = train_step(state, batch_of(train_ds, idx), key)
    print(f"[{preset_name}] trained {steps_n} steps, "
          f"final loss {float(aux['loss']):.4f}")

    def eval_p1(model_cfg, calib_n: int = 64):
        m = ContextAwarePoseFormer(cfg=model_cfg)
        extra = None
        if model_cfg.backbone.quantize != "none":
            batches = []
            for s in range(0, calib_n, 16):
                b = batch_of(val_ds, np.arange(s, s + 16))
                batches.append((
                    augment.serving_images(
                        b.images_u8, model_cfg.backbone, dtype=jnp.float32
                    ),
                    b.keypoints_2d, b.keypoints_2d_crop,
                ))
            v = prepare_serving(
                m, {"params": state.params}, batches[0], batches=batches
            )
            extra = {k: v[k] for k in v if k != "params"}
        estep = jax.jit(steps.make_eval_step(
            m, dataclasses.replace(cfg, model=model_cfg),
            extra_variables=extra))
        errs = []
        for s in range(0, len(val_ds), 16):
            idx = np.arange(s, min(s + 16, len(val_ds)))
            pred, gt = estep(state.params, batch_of(val_ds, idx))
            errs.append(np.linalg.norm(
                np.asarray(pred) - np.asarray(gt), axis=-1))
        return float(np.concatenate(errs).mean() * 1000)

    p1 = eval_p1(cfg.model)
    p1d = eval_p1(cfglib.deploy(cfg).model)
    print(f"[{preset_name}] trained P1: fp32 {p1:.3f} mm | "
          f"full deploy stack {p1d:.3f} mm | delta {p1d - p1:+.3f} mm")
    return {
        "preset": preset_name,
        "tiny_trained_fp32_p1_mm": round(p1, 4),
        "tiny_trained_deploy_p1_mm": round(p1d, 4),
        "tiny_trained_delta_mm": round(p1d - p1, 4),
    }


def preset_table(presets, steps_n: int, out_path: str | None,
                 fullsize_batch: int = 2) -> None:
    """Emit the per-round deploy-numerics table (DEPLOY_NUMERICS_r*.json):
    full-size random-init output delta + tiny trained P1 delta for every
    preset, each under the COMPLETE current serve stack."""
    import json

    rows = {}
    for name in presets:
        row = output_delta(name, batch=fullsize_batch)
        row.update(preset_gate(name, steps_n))
        rows[name] = row
    payload = {
        "protocol": {
            "fullsize": f"random-init batch-{fullsize_batch} output |delta| "
                        "fp32 parity vs config.deploy, mm",
            "tiny_trained": f"{steps_n}-step synthetic-task training, P1 on "
                            "64 val samples, fp32 vs config.deploy",
        },
        "presets": rows,
    }
    print(json.dumps(payload))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"wrote {out_path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-trained", action="store_true")
    ap.add_argument("--skip-output", action="store_true",
                    help="skip the full-size output-delta pass (TPU-heavy)")
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--cpn", action="store_true",
                    help="also run the cpn_native_pyramid trained A/B")
    ap.add_argument("--cpn-only", action="store_true")
    ap.add_argument("--truncate", action="store_true",
                    help="run ONLY the stage4-truncation trained A/B")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon plugin ignores "
                         "JAX_PLATFORMS; this uses jax.config directly)")
    ap.add_argument("--table", action="store_true",
                    help="emit the per-preset round table (full-size "
                         "random-init delta + tiny trained gate, all "
                         "presets, complete serve stack)")
    ap.add_argument("--json-out", default=None,
                    help="with --table: write DEPLOY_NUMERICS_r*.json here")
    ap.add_argument("--presets", default=None,
                    help="with --table: comma-separated preset subset")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.table:
        from contextaware_poseformer_tpu import config as cfglib

        names = (args.presets.split(",") if args.presets
                 else list(cfglib.PRESETS))
        preset_table(names, args.steps, args.json_out)
        return
    if args.truncate:
        trained_truncate_ab(args.steps)
        return
    if args.cpn_only:
        trained_cpn_ab(args.steps)
        return
    if not args.skip_output:
        output_delta()
    if not args.skip_trained:
        trained_ab(args.steps)
    if args.cpn:
        trained_cpn_ab(args.steps)


if __name__ == "__main__":
    main()
