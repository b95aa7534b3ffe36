"""A/B trace: VPU vs expander mixing-matrix builds, one process, one trace."""
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

def make(tag):
    @jax.jit
    def run(feats, pts, salt):
        out = deformable.sample_points_levels(
            feats, pts + salt, padding_mode="border", impl="fused",
            precision="default")
        return out[0] + 0  # distinct output op per closure
    return run

deformable.MIX_BUILD = "vpu"
run_vpu = make("vpu")
jax.block_until_ready(run_vpu(feats, pts, jnp.float32(0)))
deformable.MIX_BUILD = "expander"
run_exp = make("exp")
jax.block_until_ready(run_exp(feats, pts, jnp.float32(0)))

tmp = tempfile.mkdtemp(prefix="sampler_ab_")
jax.profiler.start_trace(tmp)
o = None
for i in range(4):
    o = run_vpu(feats, pts, jnp.float32((i + 1) * 1e-6))
jax.block_until_ready(o)
for i in range(4):
    o = run_exp(feats, pts, jnp.float32((i + 11) * 1e-6))
jax.block_until_ready(o)
jax.profiler.stop_trace()

import glob, gzip, json, collections
files = glob.glob(tmp + "/plugins/profile/*/*.trace.json.gz")
data = json.load(gzip.open(sorted(files)[-1]))
events = data["traceEvents"]
pids = {e["pid"]: e["args"].get("name","") for e in events if e.get("ph")=="M" and e.get("name")=="process_name"}
dev = {p for p,n in pids.items() if "/device:" in n and "CPU" not in n}
# kernels appear in time order: first 4 = vpu, last 4 = expander
times = []
for e in events:
    if e.get("ph")=="X" and e.get("pid") in dev and "run" in e.get("name",""):
        a = e.get("args", {})
        if "pallas_call" in a.get("tf_op", ""):
            times.append((e["ts"], e["dur"]))
times.sort()
n = len(times)
print("pallas kernel durations (us), time-ordered:", [t[1] for t in times])
half = n // 2
print(f"VPU build mean:      {np.mean([t[1] for t in times[:half]]):.1f} us")
print(f"expander build mean: {np.mean([t[1] for t in times[half:]]):.1f} us")
