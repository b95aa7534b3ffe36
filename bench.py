"""Benchmark: single-frame 3D lifts/sec/chip on the flagship model.

Measures the full deployment path on one TPU chip: raw uint8 frames ->
normalization -> frozen HRNet-32 backbone -> context sampling -> lifting
transformer -> 3D joints, jitted as one graph (the reference's inference path,
ContextPose/train.py:183 + mvn/models/conpose.py:30-42).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: the reference publishes no throughput number; the denominator is
a documented estimate of the PyTorch reference on an A100: HRNet-W32 256x192
inference at large batch runs ~2000 img/s on A100 with fp16/cudnn-benchmark
(the BASELINE.md north-star "≥10x vs A100 PyTorch" target therefore equals
vs_baseline >= 10).
"""

from __future__ import annotations

import json
import time

import numpy as np

A100_PYTORCH_BASELINE_LIFTS_PER_SEC = 2000.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from contextaware_poseformer_tpu.config import preset
    from contextaware_poseformer_tpu.data import augment
    from contextaware_poseformer_tpu.models import ContextAwarePoseFormer

    cfg = preset("h36m_hrnet_32")
    model = ContextAwarePoseFormer(cfg=cfg.model)
    h, w = cfg.model.image_shape

    rng = np.random.RandomState(0)
    batch = 128
    imgs_u8 = jnp.asarray(rng.randint(0, 256, (batch, h, w, 3)).astype(np.uint8))
    kp = jnp.asarray(rng.uniform(-1, 1, (batch, 17, 2)).astype(np.float32))
    kpc = jnp.asarray(rng.uniform(0, w, (batch, 17, 2)).astype(np.float32))

    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, h, w, 3), jnp.float32), kp[:1], kpc[:1],
    )

    @jax.jit
    def lift(params, imgs_u8, kp, kpc, chain):
        # `chain` forces a data dependency between timed iterations so the
        # measurement can't be fooled by async dispatch or result caching
        # (observed: per-iter block_until_ready under-reports on the axon
        # tunnel backend by >10x).
        imgs = augment.normalize_images(imgs_u8, cfg.model.backbone.kind) + chain
        return model.apply(params, imgs, kp, kpc)

    chain = jnp.zeros(())
    out = lift(params, imgs_u8, kp, kpc, chain)  # warmup / compile
    out.block_until_ready()

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = lift(params, imgs_u8, kp, kpc, chain)
        chain = out.mean() * 0.0
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    lifts_per_sec = batch / dt

    print(
        json.dumps(
            {
                "metric": "single_frame_lifts_per_sec_per_chip",
                "value": round(lifts_per_sec, 1),
                "unit": "frames/sec (HRNet-32 backbone + lifting, batch 128, uint8 in)",
                "vs_baseline": round(
                    lifts_per_sec / A100_PYTORCH_BASELINE_LIFTS_PER_SEC, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
