"""Trace-based sampler micro-bench (device durations are immune to the
tunnel's service throttling, unlike wall-clock)."""
import sys, tempfile
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from contextaware_poseformer_tpu.ops import deformable

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

jax.block_until_ready(run(feats, pts, jnp.float32(0)))
tmp = tempfile.mkdtemp(prefix="sampler_")
jax.profiler.start_trace(tmp)
out = None
for i in range(3):
    out = run(feats, pts, jnp.float32((i + 1) * 1e-6))
jax.block_until_ready(out)
jax.profiler.stop_trace()

import glob, gzip, json, collections
files = glob.glob(tmp + "/plugins/profile/*/*.trace.json.gz")
data = json.load(gzip.open(sorted(files)[-1]))
events = data["traceEvents"]
pids = {e["pid"]: e["args"].get("name","") for e in events if e.get("ph")=="M" and e.get("name")=="process_name"}
dev = {p for p,n in pids.items() if "/device:" in n and "CPU" not in n}
agg = collections.Counter()
for e in events:
    if e.get("ph")=="X" and e.get("pid") in dev and not e.get("name","").startswith("jit_"):
        agg[e["name"]] += e.get("dur",0)
for name, dur in agg.most_common(8):
    print(f"{dur/3:9.1f} us/iter  {name}")
print(f"TOTAL {sum(agg.values())/3e3:.3f} ms/iter")
