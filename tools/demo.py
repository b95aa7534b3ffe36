"""End-to-end demo: frames -> streaming lifter -> rendered 3D predictions.

With no dataset in this environment the demo runs on the synthetic geometric
dataset; point --images/--labels at real H36M artifacts to run on real data.

    python tools/demo.py --out /tmp/demo.png [--tiny] [--bf16]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="demo.png")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--n", type=int, default=4)
    args = p.parse_args(argv)

    import jax

    from contextaware_poseformer_tpu.config import preset
    from contextaware_poseformer_tpu.data.synthetic import SyntheticPoseDataset
    from contextaware_poseformer_tpu.models import ContextAwarePoseFormer
    from contextaware_poseformer_tpu.utils import visualization as vis

    if args.tiny:
        from contextaware_poseformer_tpu.config import (
            BackboneConfig, HRNetStageConfig, LifterConfig, ModelConfig,
        )

        w = 8
        c = (w, 2 * w, 4 * w, 8 * w)
        model_cfg = ModelConfig(
            backbone=BackboneConfig(
                kind="hrnet", width=w,
                stage2=HRNetStageConfig(1, 2, (2, 2), c[:2]),
                stage3=HRNetStageConfig(1, 3, (2, 2, 2), c[:3]),
                stage4=HRNetStageConfig(1, 4, (2, 2, 2, 2), c),
            ),
            lifter=LifterConfig(embed_dim_ratio=32, depth=2, levels=4),
            image_shape=(64, 64),
        )
    else:
        model_cfg = preset("h36m_hrnet_32").model

    h, w = model_cfg.image_shape
    ds = SyntheticPoseDataset(size=args.n, image_shape=(h, w), seed=7)

    import jax.numpy as jnp

    from contextaware_poseformer_tpu.data import augment

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = ContextAwarePoseFormer(cfg=model_cfg, dtype=dtype)
    imgs = np.stack([ds.load_image(i) for i in range(args.n)])
    kp = jnp.asarray(ds.joints_2d[: args.n])
    kpc = jnp.asarray(ds.joints_2d_crop[: args.n])
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)), kp[:1], kpc[:1]
    )

    @jax.jit
    def lift(params, raw, kp, kpc):
        return model.apply(
            params, augment.normalize_images(raw, model_cfg.backbone.kind),
            kp, kpc,
        )

    preds = np.asarray(lift(params, jnp.asarray(imgs), kp, kpc))
    path = vis.render_prediction_grid(
        imgs, np.asarray(kpc), preds, args.out,
        gts_3d=ds.joints_3d[: args.n],
    )
    print(f"wrote {path} | preds finite: {np.isfinite(preds).all()}")
    return path


if __name__ == "__main__":
    main()
