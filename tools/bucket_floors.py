"""Per-bucket rooflines for the DEPLOY serving graph: three floors each.

Pairs with tools/trace_budget.py (measured us/iter per subsystem bucket):
this walks the jaxpr of the exact serving graph and computes, per bucket
(flax module path from eqn.source_info.name_stack, classified with the
SAME rules as trace_budget):

  arith    — MAC FLOPs at the dtype peak (s8 394 TOPS, bf16 197 TF/s,
             fp32 197/3 — v5e), the classic 100%-MFU bound;
  lanefill — arith divided by the MXU output-column fill c_out/128,
             applied ONLY to dots inside pallas_call bodies: we fixed
             those shapes, so a 32-wide output genuinely caps the MXU at
             25% — a STRUCTURAL bound on the kernel as written. XLA
             convs/dots get fill=1: the TPU conv emitter packs spatial
             positions into lanes and measurably beats c_out/128 (hr32
             runs 55% MFU on a graph full of 32-channel branch convs),
             so claiming the naive fill there would put the "floor"
             above measured time;
  hbm      — bytes of every DISTINCT tensor an MXU op touches (lhs,
             weights, out) at ~819 GB/s, as a true LOWER bound:
             (a) deduped globally by jaxpr var AND by alias class
                 (reshape/transpose/convert chains are one materialized
                 tensor), so fan-out and producer/consumer pairs count
                 once — fusion can collapse a boundary's write+read into
                 one traversal, but a materialized tensor cannot move
                 less than once;
             (b) counted at the NARROWEST dtype reachable through the
                 op's downstream elementwise chain (a conv accumulator
                 whose epilogue requantizes to s8 materializes 1 byte/
                 elem, not 4 — XLA fuses the epilogue).
             pallas_call kernels count their call-boundary operands
             (inner dots move VMEM, not HBM).

The bucket's floor is max(arith, lanefill, hbm); the binding column names
the constraint. This makes the roofline gap adjudicable PER BUCKET
(VERDICT r4 items 3/5): measured >> all three floors = implementation
headroom; measured ~= hbm = bandwidth-bound (only narrower dtypes or
fusion restructuring move it); measured ~= lanefill = channel-width
structural (only a different trained topology moves it). Ops inside
pallas_call bodies inherit the call's bucket.

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
V5E_HBM_BYTES_PER_US = 819e3  # ~819 GB/s


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


def _aval_bytes(v) -> float:
    a = v.aval
    return math.prod(a.shape) * a.dtype.itemsize if a.shape else 0.0


def _lane_fill(eqn) -> float:
    """MXU output-column fill: c_out (conv) / trailing out dim (dot) vs
    the 128-lane MXU width. The dominant structural underfill for narrow
    convs (a 32-out-channel conv can never exceed 25% MFU regardless of
    implementation)."""
    if eqn.primitive.name == "conv_general_dilated":
        dn = eqn.params["dimension_numbers"]
        c_out = eqn.invars[1].aval.shape[dn.rhs_spec[0]]
    else:
        c_out = eqn.outvars[0].aval.shape[-1]
    return min(1.0, c_out / 128.0)


def _bump(acc, bucket, kind, flops, fill, bytes_):
    b = acc.setdefault(bucket, {"gf": {}, "gf_fill": {}, "bytes": 0.0})
    b["gf"][kind] = b["gf"].get(kind, 0.0) + flops
    b["gf_fill"][kind] = b["gf_fill"].get(kind, 0.0) + flops / max(fill, 1e-6)
    b["bytes"] += bytes_


# ops that produce a NEW var for the SAME materialized tensor
_ALIAS = {"reshape", "transpose", "convert_element_type", "squeeze",
          "expand_dims", "copy", "bitcast_convert_type"}
# elementwise ops XLA fuses into a producer's epilogue — a narrowing
# convert at the end of such a chain sets the materialized width
_EPILOGUE = _ALIAS | {
    "add", "sub", "mul", "div", "max", "min", "clamp", "round",
    "floor", "ceil", "sign", "abs", "neg", "exp", "tanh", "logistic",
    "rsqrt", "sqrt", "integer_pow", "pow", "select_n", "ge", "gt",
    "le", "lt", "eq", "ne", "and", "or", "not", "xor", "rem",
    "nextafter", "erf", "custom_jvp_call", "stop_gradient",
}


class _TensorIndex:
    """Alias classes + downstream-narrowing widths over one jaxpr."""

    def __init__(self):
        self.root: dict[int, int] = {}   # id(var) -> id(root var)
        self.width: dict[int, float] = {}  # id(root) -> min downstream itemsize
        self.seen: set[int] = set()

    def find(self, v) -> int:
        k = id(v)
        while k in self.root:
            k = self.root[k]
        return k

    def build(self, jaxpr):
        eqns = []

        def flat(j):
            for e in j.eqns:
                eqns.append(e)
                for sub in e.params.values():
                    for s in (sub if isinstance(sub, (tuple, list)) else (sub,)):
                        inner = getattr(s, "jaxpr", s if hasattr(s, "eqns") else None)
                        if inner is not None and hasattr(inner, "eqns"):
                            flat(inner)

        flat(jaxpr)
        for e in eqns:  # forward: union alias chains
            if e.primitive.name in _ALIAS and len(e.outvars) == 1:
                iv = e.invars[0]
                if hasattr(iv, "aval"):
                    self.root[id(e.outvars[0])] = self.find(iv)
        for e in reversed(eqns):  # reverse: propagate narrowing widths
            if e.primitive.name not in _EPILOGUE or len(e.outvars) != 1:
                continue
            ov = e.outvars[0]
            w = min(self.width.get(self.find(ov), float("inf")),
                    ov.aval.dtype.itemsize if ov.aval.shape else 0)
            for iv in e.invars:
                if not hasattr(iv, "aval") or not getattr(iv.aval, "shape", None):
                    continue
                r = self.find(iv)
                self.width[r] = min(self.width.get(r, float("inf")), w)

    def uniq_bytes(self, vs) -> float:
        """Bytes of tensors not yet counted anywhere in the graph, each at
        its narrowest materialized width — a true lower bound under
        arbitrary fan-out, fusion, and requant epilogues."""
        total = 0.0
        for v in vs:
            if not hasattr(v, "aval"):
                continue
            r = self.find(v)
            if r in self.seen:
                continue
            self.seen.add(r)
            a = v.aval
            if not a.shape:
                continue
            w = min(a.dtype.itemsize, self.width.get(r, float("inf")))
            total += math.prod(a.shape) * w
        return total


def _walk(jaxpr, bucket_ctx, acc, classify, idx, in_pallas=False):
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
        if prim == "pallas_call":
            # kernel HBM traffic = the call's operands+outputs, once;
            # inner dots contribute FLOPs only (they move VMEM, not HBM)
            by = idx.uniq_bytes(list(eqn.invars) + list(eqn.outvars))
            _bump(acc, bucket, "bf16", 0.0, 1.0, by)
        elif prim == "conv_general_dilated":
            by = 0.0 if in_pallas else idx.uniq_bytes(
                [eqn.invars[0], eqn.invars[1], eqn.outvars[0]]
            )
            _bump(acc, bucket, _dtype_class(eqn), _conv_flops(eqn),
                  _lane_fill(eqn) if in_pallas else 1.0, by)
        elif prim == "dot_general":
            by = 0.0 if in_pallas else idx.uniq_bytes(
                [eqn.invars[0], eqn.invars[1], eqn.outvars[0]]
            )
            _bump(acc, bucket, _dtype_class(eqn), _dot_flops(eqn),
                  _lane_fill(eqn) if in_pallas else 1.0, by)
        sub_ctx = bucket if prim == "pallas_call" else bucket_ctx
        for sub in eqn.params.values():
            for s in (sub if isinstance(sub, (tuple, list)) else (sub,)):
                inner = getattr(s, "jaxpr", s if hasattr(s, "eqns") else None)
                if inner is not None and hasattr(inner, "eqns"):
                    _walk(inner, sub_ctx, acc, classify, idx,
                          in_pallas or prim == "pallas_call")


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
    idx = _TensorIndex()
    idx.build(jaxpr.jaxpr)
    _walk(jaxpr.jaxpr, None, acc, classify, idx)

    rows = []
    for bucket, b in acc.items():
        gf = {k: v / 1e9 for k, v in b["gf"].items()}
        gff = {k: v / 1e9 for k, v in b["gf_fill"].items()}
        arith = sum(g * V5E_PEAK_US_PER_GF[k] for k, g in gf.items())
        lanefill = sum(g * V5E_PEAK_US_PER_GF[k] for k, g in gff.items())
        hbm = b["bytes"] / V5E_HBM_BYTES_PER_US
        rows.append({
            "bucket": bucket,
            "gf_per_iter": round(sum(gf.values()), 3),
            "gf_int8": round(gf.get("int8", 0.0), 3),
            "gf_bf16": round(gf.get("bf16", 0.0), 3),
            "gf_fp32": round(gf.get("fp32", 0.0), 3),
            "arith_floor_us": round(arith, 1),
            "lanefill_floor_us": round(lanefill, 1),
            "hbm_floor_us": round(hbm, 1),
            "floor_us_per_iter": round(max(arith, lanefill, hbm), 1),
        })
    rows.sort(key=lambda r: -r["floor_us_per_iter"])
    total_floor = sum(r["floor_us_per_iter"] for r in rows)
    total_arith = sum(r["arith_floor_us"] for r in rows)
    print(f"{'bucket':38s} {'GF/iter':>8s} {'arith':>8s} {'lanefil':>8s} "
          f"{'hbm':>8s} {'floor us':>9s}")
    for r in rows:
        print(f"{r['bucket']:38s} {r['gf_per_iter']:8.2f}"
              f" {r['arith_floor_us']:8.1f} {r['lanefill_floor_us']:8.1f}"
              f" {r['hbm_floor_us']:8.1f} {r['floor_us_per_iter']:9.1f}")
    print(f"\nTOTAL floor (per-bucket max of arith/lanefill/HBM): "
          f"{total_floor / 1e3:.3f} ms/iter — arithmetic-only "
          f"{total_arith / 1e3:.3f} ms/iter "
          f"(batch {B}, {args.preset} deploy graph)")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"preset": args.preset, "batch": B,
                       "total_floor_us": round(total_floor, 1),
                       "total_arith_floor_us": round(total_arith, 1),
                       "buckets": rows}, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
