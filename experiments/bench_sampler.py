"""Micro-bench: fused multi-level sampler at flagship context-block shapes."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from contextaware_poseformer_tpu.ops import deformable
from contextaware_poseformer_tpu.utils.profiling import sustained_timer

B = 128
shapes = [(64, 48, 32), (32, 24, 64), (16, 12, 128), (8, 6, 256)]
rng = np.random.RandomState(0)
feats = tuple(jnp.asarray(rng.randn(B, h, w, c).astype(np.float32)).astype(jnp.bfloat16)
              for h, w, c in shapes)
pts = jnp.asarray(rng.uniform(-1, 1, (B, 4, 17, 16, 2)).astype(np.float32))

@jax.jit
def run(feats, pts, salt):
    out = deformable.sample_points_levels(
        feats, pts + salt, padding_mode="border", impl="fused",
        precision="default")
    return out[0]

r = sustained_timer(run, lambda i: (feats, pts, jnp.float32(i * 1e-6)),
                    iters=30, bursts=4)
print(f"sample_points_levels (context-block shapes): {r['sec_per_iter']*1e6:.1f} us/call")

# calibration: a known-cost matmul (4096^3 bf16 ~ 0.7ms at peak)
a = jnp.asarray(rng.randn(4096, 4096).astype(np.float32)).astype(jnp.bfloat16)
mm = jax.jit(lambda a, s: (a + s) @ a)
r2 = sustained_timer(mm, lambda i: (a, jnp.bfloat16(i * 1e-6)), iters=30, bursts=4)
print(f"4096^3 bf16 matmul: {r2['sec_per_iter']*1e6:.1f} us/call "
      f"({2*4096**3/r2['sec_per_iter']/1e12:.0f} TF/s)")
