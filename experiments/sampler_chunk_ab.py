"""Interleaved device A/B of CAPF_SAMPLER_BATCH_CHUNK values on the FULL
deploy graph (companion to experiments/deploy_knob_ab.py, which toggles
BackboneConfig booleans; this one sweeps the env knob, which
ops/deformable reads per call — so each variant compiles under its own
value in ONE process and the bursts interleave).

Usage: python experiments/sampler_chunk_ab.py --values 4,8 \
           [--preset h36m_cpn] [--batch 128] [--iters 4] [--bursts 3]
A value that fails to compile (Mosaic VMEM scope) is reported and
skipped — that is itself the measurement.
"""
import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

ap = argparse.ArgumentParser()
ap.add_argument("--values", default="4,8")
ap.add_argument("--preset", default="h36m_cpn")
ap.add_argument("--batch", type=int, default=128)
ap.add_argument("--iters", type=int, default=4)
ap.add_argument("--bursts", type=int, default=3)
args = ap.parse_args()

from contextaware_poseformer_tpu.config import deploy, preset
from contextaware_poseformer_tpu.data import augment
from contextaware_poseformer_tpu.models import (
    ContextAwarePoseFormer,
    prepare_serving,
)

cfg = preset(args.preset)
model_cfg = deploy(cfg).model
h, w = cfg.model.image_shape
B = args.batch

rng = np.random.RandomState(0)
imgs_u8 = jnp.asarray(rng.randint(0, 256, (B, h, w, 3)).astype(np.uint8))
kp = jnp.asarray(rng.uniform(-1, 1, (B, 17, 2)).astype(np.float32))
kpc = jnp.asarray(rng.uniform(0, w, (B, 17, 2)).astype(np.float32))

model = ContextAwarePoseFormer(cfg=model_cfg, dtype=jnp.bfloat16)
params = model.init(
    jax.random.PRNGKey(0),
    jnp.zeros((1, h, w, 3), jnp.float32), kp[:1], kpc[:1],
)
params = jax.tree_util.tree_map_with_path(
    lambda path, x: x.astype(jnp.bfloat16)
    if getattr(x, "ndim", 0) == 4 and "backbone" in str(path) else x,
    params,
)
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    cal_imgs = augment.serving_images(
        jnp.asarray(np.asarray(imgs_u8[:8])), model_cfg.backbone,
        dtype=jnp.float32,
    )
    cal_vars = prepare_serving(
        model,
        jax.device_put(params, cpu),
        (cal_imgs, np.asarray(kp[:8]), np.asarray(kpc[:8])),
    )
tpu = jax.devices()[0]
params = {
    "params": params["params"],
    **{
        k: jax.device_put(v, tpu)
        for k, v in cal_vars.items() if k != "params"
    },
}


def build(value: str):
    os.environ["CAPF_SAMPLER_BATCH_CHUNK"] = value

    # a fresh function object per value: the env knob is read at trace
    # time, so each jit must trace under its own setting (a shared
    # function would hit the jit cache and silently reuse the first)
    def lift(params, imgs_u8, kp, kpc, salt):
        imgs = augment.serving_images(
            imgs_u8, model_cfg.backbone, dtype=jnp.bfloat16
        )
        return model.apply(params, imgs, kp + salt, kpc)

    fn = jax.jit(lift)
    jax.block_until_ready(fn(params, imgs_u8, kp, kpc, jnp.float32(0)))
    return fn


def device_us(trace_dir: str) -> float:
    files = glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")
    )
    data = json.load(gzip.open(sorted(files)[-1]))
    events = data.get("traceEvents", [])
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev = {p for p, n in pids.items() if "/device:" in n and "CPU" not in n}
    return sum(
        e.get("dur", 0) for e in events
        if e.get("ph") == "X" and e.get("pid") in dev
        and not e.get("name", "").startswith("jit_")
    )


values = args.values.split(",")
fns = {}
for v in values:
    try:
        fns[v] = build(v)
        print(f"compiled + warm: chunk={v}", flush=True)
    except Exception as e:  # noqa: BLE001 — Mosaic scope failures expected
        print(f"chunk={v} FAILED TO COMPILE: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)

results = collections.defaultdict(list)
order = [v for _ in range(args.bursts) for v in fns]
for k, v in enumerate(order):
    os.environ["CAPF_SAMPLER_BATCH_CHUNK"] = v  # belt&braces; traced already
    tmp = tempfile.mkdtemp(prefix=f"chunkab_{v}_")
    jax.profiler.start_trace(tmp)
    out = None
    for i in range(args.iters):
        out = fns[v](params, imgs_u8, kp, kpc,
                     jnp.float32((k * 10 + i) * 1e-9))
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    us = device_us(tmp) / args.iters
    results[v].append(us)
    print(f"burst {k} chunk={v}: {us:9.1f} us/iter device (trace {tmp})",
          flush=True)

best = {v: min(r) for v, r in results.items()}
for v, us in best.items():
    print(f"chunk={v} best: {us:9.1f} us/iter")
if len(best) > 1:
    ref = best[values[0]]
    for v in values[1:]:
        if v in best:
            print(f"chunk={v} vs {values[0]}: {ref - best[v]:+.1f} us/iter "
                  f"({(ref - best[v]) / ref * 100:+.2f}%)")
