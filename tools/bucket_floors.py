"""Per-bucket MXU arithmetic floors for the DEPLOY serving graph.

Pairs with tools/trace_budget.py (measured us/iter per subsystem bucket):
this walks the jaxpr of the exact serving graph and sums MAC FLOPs per
bucket (flax module path from eqn.source_info.name_stack, classified with
the SAME rules as trace_budget), then converts to a 100%-MFU floor at the
equation's dtype peak (s8 394 TOPS, bf16 197 TF/s, fp32 197/3 — v5e).

This makes the roofline gap adjudicable PER BUCKET (VERDICT r4 items 3/5):
measured/floor >> 1 on an MXU-dominated bucket = implementation headroom;
measured >> floor on a VPU bucket (sampler m-build, softmax) = the floor
is not the binding constraint and the bucket needs a VPU/HBM argument
instead. Ops inside pallas_call bodies inherit the call's bucket.

    JAX_PLATFORM_NAME=cpu python tools/bucket_floors.py --preset h36m_cpn \
        [--batch 128] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_US_PER_GF = {  # us per GFLOP at 100% MFU
    "int8": 1e6 / 394e3,
    "bf16": 1e6 / 197e3,
    "fp32": 3e6 / 197e3,  # bf16_3x decomposition
}


def _conv_flops(eqn) -> float:
    rhs = eqn.invars[1].aval
    out = eqn.outvars[0].aval
    dn = eqn.params["dimension_numbers"]
    groups = eqn.params.get("feature_group_count", 1)
    rhs_spec = dn.rhs_spec
    kspatial = [rhs.shape[i] for i in rhs_spec[2:]]
    c_in_per_group = rhs.shape[rhs_spec[1]]
    del groups
    return 2.0 * math.prod(out.shape) * c_in_per_group * math.prod(kspatial)


def _dot_flops(eqn) -> float:
    lhs = eqn.invars[0].aval
    out = eqn.outvars[0].aval
    ((lc, _), _) = eqn.params["dimension_numbers"]
    contract = math.prod(lhs.shape[i] for i in lc)
    return 2.0 * math.prod(out.shape) * contract


def _dtype_class(eqn) -> str:
    kinds = {str(v.aval.dtype) for v in eqn.invars[:2]}
    if kinds <= {"int8", "int32", "uint8"}:
        return "int8"
    if "float32" in kinds and "bfloat16" not in kinds:
        return "fp32"
    return "bf16"


def _walk(jaxpr, bucket_ctx, acc, classify):
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        # bucket: inherited (inside pallas_call) or from the name stack
        if bucket_ctx is not None:
            bucket = bucket_ctx
        else:
            stack = str(eqn.source_info.name_stack)
            bucket = classify(stack, "") or (
                f"?{stack[:60]}" if stack else "unscoped kernels (lifter pallas/XLA glue)"
            )
        if prim == "conv_general_dilated":
            acc.setdefault(bucket, {}).setdefault(_dtype_class(eqn), [0.0])[0] += _conv_flops(eqn)
        elif prim == "dot_general":
            acc.setdefault(bucket, {}).setdefault(_dtype_class(eqn), [0.0])[0] += _dot_flops(eqn)
        sub_ctx = bucket if prim == "pallas_call" else bucket_ctx
        for sub in eqn.params.values():
            for s in (sub if isinstance(sub, (tuple, list)) else (sub,)):
                inner = getattr(s, "jaxpr", s if hasattr(s, "eqns") else None)
                if inner is not None and hasattr(inner, "eqns"):
                    _walk(inner, sub_ctx, acc, classify)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="h36m_cpn")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    from contextaware_poseformer_tpu.config import deploy, preset
    from contextaware_poseformer_tpu.data import augment
    from contextaware_poseformer_tpu.models import (
        ContextAwarePoseFormer,
        prepare_serving,
    )
    from tools.trace_budget import classify

    cfg = preset(args.preset)
    model_cfg = deploy(cfg).model
    model = ContextAwarePoseFormer(cfg=model_cfg, dtype=jnp.bfloat16)
    h, w = cfg.model.image_shape
    B = args.batch

    rng = np.random.RandomState(0)
    imgs_u8 = np.asarray(rng.randint(0, 256, (2, h, w, 3)), np.uint8)
    kp = rng.uniform(-1, 1, (2, 17, 2)).astype(np.float32)
    kpc = rng.uniform(0, w, (2, 17, 2)).astype(np.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32),
        jnp.asarray(kp[:1]), jnp.asarray(kpc[:1]),
    )
    cal_imgs = augment.serving_images(
        jnp.asarray(imgs_u8), model_cfg.backbone, dtype=jnp.float32
    )
    variables = prepare_serving(
        model, params, (cal_imgs, jnp.asarray(kp), jnp.asarray(kpc))
    )

    def fwd(v, raw, k, kc):
        imgs = augment.serving_images(raw, model_cfg.backbone, dtype=jnp.bfloat16)
        return model.apply(v, imgs, k, kc)

    jaxpr = jax.make_jaxpr(fwd)(
        variables,
        jax.ShapeDtypeStruct((B, h, w, 3), jnp.uint8),
        jax.ShapeDtypeStruct((B, 17, 2), jnp.float32),
        jax.ShapeDtypeStruct((B, 17, 2), jnp.float32),
    )
    acc: dict[str, dict[str, list[float]]] = {}
    _walk(jaxpr.jaxpr, None, acc, classify)

    rows = []
    for bucket, kinds in acc.items():
        gf = {k: v[0] / 1e9 for k, v in kinds.items()}
        floor_us = sum(g * V5E_PEAK_US_PER_GF[k] for k, g in gf.items())
        rows.append({
            "bucket": bucket,
            "gf_per_iter": round(sum(gf.values()), 3),
            "gf_int8": round(gf.get("int8", 0.0), 3),
            "gf_bf16": round(gf.get("bf16", 0.0), 3),
            "gf_fp32": round(gf.get("fp32", 0.0), 3),
            "floor_us_per_iter": round(floor_us, 1),
        })
    rows.sort(key=lambda r: -r["floor_us_per_iter"])
    total_floor = sum(r["floor_us_per_iter"] for r in rows)
    print(f"{'bucket':38s} {'GF/iter':>8s} {'int8':>7s} {'bf16':>7s} "
          f"{'floor us':>9s}")
    for r in rows:
        print(f"{r['bucket']:38s} {r['gf_per_iter']:8.2f} {r['gf_int8']:7.2f}"
              f" {r['gf_bf16']:7.2f} {r['floor_us_per_iter']:9.1f}")
    print(f"\nTOTAL MXU floor: {total_floor / 1e3:.3f} ms/iter "
          f"(batch {B}, {args.preset} deploy graph)")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"preset": args.preset, "batch": B,
                       "total_floor_us": round(total_floor, 1),
                       "buckets": rows}, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
