"""Per-preset model FLOPs via XLA cost analysis (CPU compile, no TPU needed).

Counts the PARITY graph (fp32, XLA-only: gather sampler, einsum attention,
no quantization) — i.e. the model's mathematical work, which is the right
MFU numerator regardless of which fused/int8 implementation serves it.
The count is taken at batch 8 and divided by batch (everything in this
model is batch-linear; fixed-cost ops are noise at this size).

Writes FLOPS.json at the repo root:

    {preset: {"gflops_per_frame": ..., "bytes_accessed_mb_per_frame": ...}}

bench.py reads that file to emit `model_gflops_per_frame` and `mfu` in its
JSON line (VERDICT r3 item 1). Re-run this tool after any model-topology
change:

    JAX_PLATFORM_NAME=cpu python tools/model_flops.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BATCH = 8


def preset_cost(name: str, batch: int = BATCH) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from contextaware_poseformer_tpu.config import preset
    from contextaware_poseformer_tpu.models import ContextAwarePoseFormer

    cfg = preset(name)
    model = ContextAwarePoseFormer(cfg=cfg.model)
    h, w = cfg.model.image_shape
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.uniform(-1, 1, (batch, h, w, 3)).astype(np.float32))
    kp = jnp.asarray(rng.uniform(-1, 1, (batch, 17, 2)).astype(np.float32))
    kpc = jnp.asarray(rng.uniform(0, w, (batch, 17, 2)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), imgs[:1], kp[:1], kpc[:1])

    def fwd(params, imgs, kp, kpc):
        return model.apply(params, imgs, kp, kpc)

    ca = jax.jit(fwd).lower(params, imgs, kp, kpc).compile().cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per device
        ca = ca[0]
    return {
        "gflops_per_frame": round(float(ca["flops"]) / batch / 1e9, 3),
        "bytes_accessed_mb_per_frame": round(
            float(ca.get("bytes accessed", 0.0)) / batch / 1e6, 2
        ),
    }


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from contextaware_poseformer_tpu.config import PRESETS

    out = {}
    for name in PRESETS:
        out[name] = preset_cost(name)
        print(name, out[name], flush=True)
    path = os.path.join(REPO, "FLOPS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
