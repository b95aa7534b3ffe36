"""A/B/C trace: PREPROJECT_2STAGE modes on the multi-level fused sampler.

Round-4 lever (VERDICT r3 item 3 "untried headroom"): the big separable
level0 (64x48xC32/48) was excluded from in-kernel channel projection.
Modes measured here, deploy numerics (bf16 feats, precision="default"):

  off:      level0 unprojected two-stage (shipped round-3 behavior); its
            samples project AFTER the kernel (that XLA einsum is NOT in the
            kernel time shown — it is ~C*hd*P tiny).
  fold:     projection folded into the two-stage column-reduction matmul.
  onestage: map projected in VMEM, one-stage sampling at hd lanes.

Usage: python experiments/preproject2_ab.py [--preset hr32|hr48]
"""
import argparse
import sys
import os
import tempfile

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from contextaware_poseformer_tpu.ops import deformable

ap = argparse.ArgumentParser()
ap.add_argument("--preset", default="hr32", choices=["hr32", "hr48"])
ap.add_argument("--batch", type=int, default=128)
ap.add_argument("--iters", type=int, default=4)
args = ap.parse_args()

B = args.batch
HD = 8  # head_dim = embed_dim_ratio(32) / num_heads(4)
shapes = {
    "hr32": [(64, 48, 32), (32, 24, 64), (16, 12, 128), (8, 6, 256)],
    "hr48": [(64, 48, 48), (32, 24, 96), (16, 12, 192), (8, 6, 384)],
}[args.preset]
rng = np.random.RandomState(0)
feats = tuple(
    jnp.asarray(rng.randn(B, h, w, c).astype(np.float32)).astype(jnp.bfloat16)
    for h, w, c in shapes
)
pts = jnp.asarray(rng.uniform(-1, 1, (B, 4, 17, 16, 2)).astype(np.float32))
projs_all = tuple(
    jnp.asarray((rng.randn(c, HD) / np.sqrt(c)).astype(np.float32))
    for _, _, c in shapes
)
biases_all = tuple(
    jnp.asarray(rng.randn(HD).astype(np.float32)) for _ in shapes
)

MODES = ["off", "fold", "onestage"]


def make(mode):
    projs = tuple(
        (w if deformable.kernel_can_preproject(h, wd, c, HD) else None)
        for w, (h, wd, c) in zip(projs_all, shapes)
    )
    biases = tuple(
        (b if p is not None else None) for b, p in zip(biases_all, projs)
    )

    @jax.jit
    def run(feats, pts, salt):
        outs = deformable.sample_points_levels(
            feats, pts + salt, padding_mode="border", impl="fused",
            precision="default", projs=projs, biases=biases,
        )
        # post-project unprojected levels so every mode returns hd channels
        # (charges "off" its external projection, outside the kernel time)
        outs = [
            o if o.shape[-1] == HD else
            jnp.einsum("...c,cd->...d", o, projs_all[l]) + biases_all[l]
            for l, o in enumerate(outs)
        ]
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    return run


runs = {}
for mode in MODES:
    os.environ["CAPF_PREPROJECT_2STAGE"] = mode
    runs[mode] = make(mode)
    jax.block_until_ready(runs[mode](feats, pts, jnp.float32(0)))

tmp = tempfile.mkdtemp(prefix="preproject2_ab_")
jax.profiler.start_trace(tmp)
o = None
for k, mode in enumerate(MODES):
    os.environ["CAPF_PREPROJECT_2STAGE"] = mode
    for i in range(args.iters):
        o = runs[mode](feats, pts, jnp.float32((k * 100 + i + 1) * 1e-6))
    jax.block_until_ready(o)
jax.profiler.stop_trace()

import collections
import glob
import gzip
import json

files = glob.glob(tmp + "/plugins/profile/*/*.trace.json.gz")
data = json.load(gzip.open(sorted(files)[-1]))
events = data["traceEvents"]
pids = {
    e["pid"]: e["args"].get("name", "")
    for e in events
    if e.get("ph") == "M" and e.get("name") == "process_name"
}
dev = {p for p, n in pids.items() if "/device:" in n and "CPU" not in n}
times = []
for e in events:
    if e.get("ph") == "X" and e.get("pid") in dev:
        a = e.get("args", {})
        if "pallas_call" in a.get("tf_op", ""):
            times.append((e["ts"], e["dur"], e.get("name", "")))
times.sort()
# launches/iter differ per mode (VMEM grouping changes with projection) —
# compute each mode's expected launch count exactly like the dispatcher
p_pad = deformable._round_up(17 * 16, 8)  # points.shape[2:-1] per level
launches = {}
for mode in MODES:
    os.environ["CAPF_PREPROJECT_2STAGE"] = mode
    pd = [
        (HD if deformable.kernel_can_preproject(h, w, c, HD) else 0)
        for h, w, c in shapes
    ]
    launches[mode] = len(deformable._vmem_level_groups(
        tuple(shapes), p_pad, 2, pd))
total_expected = sum(launches[m] for m in MODES) * args.iters
print(f"{len(times)} pallas kernel timings; expected {total_expected} "
      f"({ {m: launches[m] for m in MODES} } launches/iter x {args.iters})")
per_iter = collections.defaultdict(float)
pos = 0
for mode in MODES:
    n_each = launches[mode] * args.iters
    chunk = times[pos:pos + n_each]
    pos += n_each
    tot = sum(d for _, d, _ in chunk) / args.iters
    per_iter[mode] = tot
    print(f"{mode:9s}: {tot:8.1f} us/iter kernel time "
          f"({launches[mode]} launches/iter)")
best = min(per_iter, key=per_iter.get)
print(f"winner: {best} "
      f"({per_iter['off'] / per_iter[best]:.2f}x vs off)")
