"""Interleaved device A/B of ONE BackboneConfig boolean on the FULL
deploy graph (generalizes experiments/fold_normalize_ab.py).

Protocol (CLAUDE.md: A/B only valid interleaved in ONE process): both
variants compile in one process and trace in alternating bursts
(off,on,off,on,...), each burst in its own jax.profiler trace dir;
reports per-variant device-op time per iter, best burst per variant.

Usage: python experiments/deploy_knob_ab.py --knob cpn_int8_topdown \
           [--preset h36m_cpn] [--batch 128] [--iters 4] [--bursts 3]
"""
import argparse
import collections
import dataclasses
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
ap.add_argument("--knob", required=True)
ap.add_argument("--preset", default="h36m_cpn")
ap.add_argument("--batch", type=int, default=128)
ap.add_argument("--iters", type=int, default=4)
ap.add_argument("--bursts", type=int, default=3, help="bursts per variant")
args = ap.parse_args()

from contextaware_poseformer_tpu.config import deploy, preset
from contextaware_poseformer_tpu.data import augment
from contextaware_poseformer_tpu.models import (
    ContextAwarePoseFormer,
    prepare_serving,
)

cfg = preset(args.preset)
base_model_cfg = deploy(cfg).model
h, w = cfg.model.image_shape
B = args.batch

rng = np.random.RandomState(0)
imgs_u8 = jnp.asarray(rng.randint(0, 256, (B, h, w, 3)).astype(np.uint8))
kp = jnp.asarray(rng.uniform(-1, 1, (B, 17, 2)).astype(np.float32))
kpc = jnp.asarray(rng.uniform(0, w, (B, 17, 2)).astype(np.float32))


def build(on: bool):
    model_cfg = dataclasses.replace(
        base_model_cfg,
        backbone=dataclasses.replace(
            base_model_cfg.backbone, **{args.knob: on}
        ),
    )
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

    @jax.jit
    def lift(params, imgs_u8, kp, kpc, salt):
        imgs = augment.serving_images(
            imgs_u8, model_cfg.backbone, dtype=jnp.bfloat16
        )
        return model.apply(params, imgs, kp + salt, kpc)

    return lift, params


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
    tot = 0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev:
            if e.get("name", "").startswith("jit_"):
                continue
            tot += e.get("dur", 0)
    return tot


variants = {}
for name, on in [("off", False), ("on", True)]:
    variants[name] = build(on)
    lift, params = variants[name]
    jax.block_until_ready(lift(params, imgs_u8, kp, kpc, jnp.float32(0)))
    print(f"compiled + warm: {args.knob}={name}", flush=True)

results = collections.defaultdict(list)
order = ["off", "on"] * args.bursts
for k, name in enumerate(order):
    lift, params = variants[name]
    tmp = tempfile.mkdtemp(prefix=f"knobab_{name}_")
    jax.profiler.start_trace(tmp)
    out = None
    for i in range(args.iters):
        out = lift(params, imgs_u8, kp, kpc, jnp.float32((k * 10 + i) * 1e-9))
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    us = device_us(tmp) / args.iters
    results[name].append(us)
    print(f"burst {k} {args.knob}={name}: {us:9.1f} us/iter device "
          f"(trace {tmp})", flush=True)

off = min(results["off"])
on = min(results["on"])
print(f"\n{args.knob}=off best: {off:9.1f} us/iter")
print(f"{args.knob}=on  best: {on:9.1f} us/iter")
print(f"delta: {off - on:+.1f} us/iter ({(off - on) / off * 100:+.2f}%)")
print("verdict:", "knob WINS" if on < off - 30 else
      ("knob LOSES" if on > off + 30 else "wash"))
