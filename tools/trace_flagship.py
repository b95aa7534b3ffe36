"""Trace the FULL flagship deploy composite (the exact graph bench.py times)
and print both the op-family rollup and the top individual ops.

    python tools/trace_flagship.py [--batch 128] [--preset h36m_hrnet_32]
    python tools/trace_flagship.py --no-deploy    # parity-config graph
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def analyze_trace_detailed(trace_dir: str, top_ops: int = 40):
    files = glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")
    )
    if not files:
        raise FileNotFoundError(f"no trace json under {trace_dir}")
    data = json.load(gzip.open(sorted(files)[-1]))
    events = data.get("traceEvents", [])
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    device_pids = {p for p, n in pids.items() if "/device:" in n and "CPU" not in n}
    fam: collections.Counter = collections.Counter()
    ops: collections.Counter = collections.Counter()
    counts: collections.Counter = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            name = e.get("name", "?")
            if name.startswith("jit_"):
                continue
            fam[re.sub(r"[.\d]+$", "", name)] += e.get("dur", 0)
            ops[name] += e.get("dur", 0)
            counts[name] += 1
    total = sum(fam.values())
    print(f"\ndevice op time: {total / 1e3:.1f} ms total (all timed iters)")
    print("\n== families ==")
    for name, dur in fam.most_common(15):
        print(f"{dur / total * 100:5.1f}%  {dur / 1e3:8.2f} ms  {name[:60]}")
    print(f"\n== top {top_ops} individual ops ==")
    for name, dur in ops.most_common(top_ops):
        print(
            f"{dur / total * 100:5.1f}%  {dur / 1e3:8.2f} ms  x{counts[name]:<3d}"
            f" {name[:76]}"
        )
    return ops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--preset", default="h36m_hrnet_32")
    ap.add_argument("--no-deploy", action="store_true")
    ap.add_argument("--static-amax", action="store_true",
                    help="serve_static_amax=True on top of deploy")
    ap.add_argument("--native-pyramid", action="store_true",
                    help="cpn_native_pyramid=True (CPN presets only)")
    ap.add_argument("--truncate", action="store_true",
                    help="hrnet_stage4_truncate=True (hrnet presets only)")
    ap.add_argument("--int8-stream", action="store_true",
                    help="cpn_int8_stream=True (CPN presets only)")
    ap.add_argument("--int8-maps", action="store_true",
                    help="cpn_int8_maps=True (CPN presets only)")
    ap.add_argument("--fold-normalize", action="store_true",
                    help="cpn_fold_normalize: raw-u8 input, normalize "
                         "folded into the stem conv")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import dataclasses

    import numpy as np

    import jax
    import jax.numpy as jnp

    from contextaware_poseformer_tpu.config import deploy, preset
    from contextaware_poseformer_tpu.data import augment
    from contextaware_poseformer_tpu.models import (
        ContextAwarePoseFormer,
        prepare_serving,
    )

    cfg = preset(args.preset)
    model_cfg = cfg.model if args.no_deploy else deploy(cfg).model
    if args.static_amax:
        model_cfg = dataclasses.replace(
            model_cfg,
            backbone=dataclasses.replace(
                model_cfg.backbone, serve_static_amax=True
            ),
        )
    if args.native_pyramid:
        model_cfg = dataclasses.replace(
            model_cfg,
            backbone=dataclasses.replace(
                model_cfg.backbone, cpn_native_pyramid=True
            ),
        )
    if args.truncate:
        model_cfg = dataclasses.replace(
            model_cfg,
            backbone=dataclasses.replace(
                model_cfg.backbone, hrnet_stage4_truncate=True
            ),
        )
    if args.int8_stream:
        model_cfg = dataclasses.replace(
            model_cfg,
            backbone=dataclasses.replace(
                model_cfg.backbone, cpn_int8_stream=True
            ),
        )
    if args.int8_maps:
        model_cfg = dataclasses.replace(
            model_cfg,
            backbone=dataclasses.replace(
                model_cfg.backbone, cpn_int8_maps=True
            ),
        )
    if args.fold_normalize:
        model_cfg = dataclasses.replace(
            model_cfg,
            backbone=dataclasses.replace(
                model_cfg.backbone, cpn_fold_normalize=True
            ),
        )
    model = ContextAwarePoseFormer(cfg=model_cfg, dtype=jnp.bfloat16)
    h, w = cfg.model.image_shape
    B = args.batch

    rng = np.random.RandomState(0)
    imgs_u8 = jnp.asarray(rng.randint(0, 256, (B, h, w, 3)).astype(np.uint8))
    kp = jnp.asarray(rng.uniform(-1, 1, (B, 17, 2)).astype(np.float32))
    kpc = jnp.asarray(rng.uniform(0, w, (B, 17, 2)).astype(np.float32))

    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, h, w, 3), jnp.float32), kp[:1], kpc[:1],
    )
    params = jax.tree_util.tree_map_with_path(
        lambda path, x: x.astype(jnp.bfloat16)
        if getattr(x, "ndim", 0) == 4 and "backbone" in str(path) else x,
        params,
    )
    if model_cfg.backbone.quantize != "none":
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

    from tools.trace_ops import trace_and_report  # noqa: F401  (path setup)

    jax.block_until_ready(lift(params, imgs_u8, kp, kpc, jnp.float32(0)))
    tmp = tempfile.mkdtemp(prefix="jaxtrace_")
    jax.profiler.start_trace(tmp)
    out = None
    for i in range(args.iters):
        out = lift(params, imgs_u8, kp, kpc, jnp.float32((i + 1) * 1e-9))
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    analyze_trace_detailed(tmp, args.top)
    print(f"\ntrace dir: {tmp}")


if __name__ == "__main__":
    main()
