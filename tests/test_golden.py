"""Golden regression: fixed-seed composite outputs committed to the repo so
numeric drift across refactors/rounds is caught immediately.

Regenerate intentionally with:
    python tests/test_golden.py regen
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_composite.npz")


def _build():
    from contextaware_poseformer_tpu.config import LifterConfig, ModelConfig
    from contextaware_poseformer_tpu.models import ContextAwarePoseFormer
    from test_hrnet import tiny_cfg

    cfg = ModelConfig(
        backbone=tiny_cfg(width=8),
        lifter=LifterConfig(embed_dim_ratio=32, depth=2, levels=4,
                            sampler="gather"),
        image_shape=(64, 64),
    )
    model = ContextAwarePoseFormer(cfg=cfg)
    rng = np.random.RandomState(1234)
    imgs = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    kp = jnp.asarray(rng.uniform(-1, 1, (2, 17, 2)).astype(np.float32))
    kpc = jnp.asarray(rng.uniform(0, 64, (2, 17, 2)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), imgs, kp, kpc)
    out = np.asarray(model.apply(params, imgs, kp, kpc))
    return out


def test_composite_matches_golden():
    out = _build()
    assert os.path.exists(GOLDEN_PATH), (
        "golden file missing — run `python tests/test_golden.py regen`"
    )
    golden = np.load(GOLDEN_PATH)["out"]
    np.testing.assert_allclose(out, golden, rtol=1e-5, atol=1e-6)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        sys.path.insert(0, os.path.dirname(__file__))
        np.savez(GOLDEN_PATH, out=_build())
        print(f"wrote {GOLDEN_PATH}")
