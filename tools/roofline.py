"""Per-preset roofline: classify the parity graph's MXU FLOPs and compute
the arithmetic throughput ceiling on one TPU v5e chip (VERDICT r3 item 1).

Method: trace the parity forward (jax.make_jaxpr on ShapeDtypeStructs — no
compile, no compute) and walk the jaxpr for `conv_general_dilated` /
`dot_general` equations, summing MAC FLOPs per equation. Each equation is
classified:

  int8-eligible: a conv with BOTH channel counts >= 128 — the deploy
      graph serves these in int8 (models/backbone_common.py `wide` rule),
      peak 394 TOPS on v5e;
  bf16: everything else on the MXU, peak 197 TFLOP/s.

The per-preset arithmetic ceiling at 100% MFU is

    ceiling_fps = 1 / (GF_int8/394e3 + GF_bf16/197e3)   [frames/s]

an UPPER bound that charges zero time for VPU work (samplers, softmax,
LayerNorm, quant/requant passes), copies, and HBM stalls — the real graph
pays all of those, so achieved/ceiling < 1 always. `vs_baseline` divides
by the A100 torch estimate bench.py uses (2,000 lifts/s). The point of the
table (PERF.md round-4 roofline page) is the SIGN of `ceiling_x`: if the
100%-MFU ceiling is below 10x, no implementation-level lever can reach the
north star on one chip at these model FLOPs — only algorithmic FLOP
reduction (e.g. trained-topology stage-4 truncation) moves the bound.

    JAX_PLATFORM_NAME=cpu python tools/roofline.py [--json ROOFLINE.json]

Flop convention matches XLA cost analysis (2*MACs); cross-check the
`gf_total` column against FLOPS.json (gather-sampler parity graph; small
differences come from non-MXU ops counted there).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

V5E_BF16_TFLOPS = 197.0
V5E_INT8_TOPS = 394.0
A100_BASELINE_FPS = 2000.0


def _conv_flops(eqn) -> tuple[float, int, int]:
    """(flops, c_in, c_out) for a conv_general_dilated equation."""
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    out = eqn.outvars[0].aval
    dn = eqn.params["dimension_numbers"]
    # feature_group_count-aware: flops = 2 * prod(out spatial+batch) *
    # c_out * (c_in/groups) * prod(kernel spatial)
    groups = eqn.params.get("feature_group_count", 1)
    rhs_spec = dn.rhs_spec  # (out_c, in_c, *spatial) positions
    kspatial = [rhs.shape[i] for i in rhs_spec[2:]]
    c_out = rhs.shape[rhs_spec[0]]
    c_in = rhs.shape[rhs_spec[1]] * groups  # rhs stores c_in/groups
    out_elems = math.prod(out.shape)
    flops = 2.0 * out_elems * (c_in // groups) * math.prod(kspatial)
    return flops, c_in, c_out


def _dot_flops(eqn) -> float:
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    out = eqn.outvars[0].aval
    ((lc, rc), _) = eqn.params["dimension_numbers"]
    contract = math.prod(lhs.shape[i] for i in lc)
    return 2.0 * math.prod(out.shape) * contract


def _walk(jaxpr, acc):
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "conv_general_dilated":
            f, ci, co = _conv_flops(eqn)
            key = "int8" if (ci >= 128 and co >= 128) else "bf16"
            acc[key] += f
            acc["conv"] += f
        elif prim == "dot_general":
            f = _dot_flops(eqn)
            acc["bf16"] += f
            acc["dot"] += f
        for sub in eqn.params.values():
            # recurse into pjit/closed_call/scan/cond bodies
            for s in (sub if isinstance(sub, (tuple, list)) else (sub,)):
                if hasattr(s, "jaxpr"):
                    _walk(s.jaxpr, acc)
    return acc


def preset_roofline(name: str, truncate: bool = False,
                    achieved_fps: float | None = None) -> dict:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from contextaware_poseformer_tpu.config import preset
    from contextaware_poseformer_tpu.models import ContextAwarePoseFormer

    cfg = preset(name)
    model_cfg = cfg.model
    if truncate:
        model_cfg = dataclasses.replace(
            model_cfg,
            backbone=dataclasses.replace(
                model_cfg.backbone, hrnet_stage4_truncate=True
            ),
        )
    model = ContextAwarePoseFormer(cfg=model_cfg)
    h, w = cfg.model.image_shape
    imgs = jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32)
    kp = jax.ShapeDtypeStruct((1, 17, 2), jnp.float32)
    kpc = jax.ShapeDtypeStruct((1, 17, 2), jnp.float32)
    params = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), imgs, kp, kpc
    )
    jaxpr = jax.make_jaxpr(
        lambda p, i, k, kc: model.apply(p, i, k, kc)
    )(params, imgs, kp, kpc)
    acc = _walk(jaxpr.jaxpr, {"int8": 0.0, "bf16": 0.0, "conv": 0.0,
                              "dot": 0.0})
    gf_int8 = acc["int8"] / 1e9
    gf_bf16 = acc["bf16"] / 1e9
    gf_total = gf_int8 + gf_bf16
    ceiling_fps = 1.0 / (
        gf_int8 / (V5E_INT8_TOPS * 1e3) + gf_bf16 / (V5E_BF16_TFLOPS * 1e3)
    )
    bf16_only_fps = V5E_BF16_TFLOPS * 1e3 / gf_total
    out = {
        "gf_mxu_per_frame": round(gf_total, 3),
        "gf_int8_eligible": round(gf_int8, 3),
        "int8_fraction": round(gf_int8 / gf_total, 3),
        "ceiling_fps_bf16_only": round(bf16_only_fps, 0),
        "ceiling_x_bf16_only": round(bf16_only_fps / A100_BASELINE_FPS, 2),
        "ceiling_fps_int8_mix": round(ceiling_fps, 0),
        "ceiling_x_int8_mix": round(ceiling_fps / A100_BASELINE_FPS, 2),
    }
    if achieved_fps:
        out["achieved_fps"] = achieved_fps
        out["achieved_x"] = round(achieved_fps / A100_BASELINE_FPS, 2)
        out["pct_of_int8_mix_ceiling"] = round(
            100.0 * achieved_fps / ceiling_fps, 1
        )
    return out


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=os.path.join(REPO, "ROOFLINE.json"))
    ap.add_argument(
        "--achieved", default="",
        help="comma list preset=fps overriding the built-in measured table",
    )
    args = ap.parse_args()

    # measured lifts/s (PERF.md round-3/4 tables; refreshed rows override)
    achieved = {
        "h36m_hrnet_32": 6247.5,
        "h36m_cpn": 7543.3,
        "mpi_3dhp_hrnet_32": 7045.1,
        "h36m_hrnet_48": 3265.0,  # round-4 trace-implied (39.2 ms @ 128)
    }
    for kv in filter(None, args.achieved.split(",")):
        k, v = kv.split("=")
        achieved[k] = float(v)

    rows = {}
    for name in ["h36m_hrnet_32", "h36m_hrnet_48", "h36m_cpn",
                 "mpi_3dhp_hrnet_32", "mpi_3dhp_hrnet_48"]:
        rows[name] = preset_roofline(name, achieved_fps=achieved.get(name))
        print(name, json.dumps(rows[name]), flush=True)
    for name in ["h36m_hrnet_32", "h36m_hrnet_48"]:
        key = name + "__truncated"
        rows[key] = preset_roofline(name, truncate=True)
        print(key, json.dumps(rows[key]), flush=True)

    with open(args.json, "w") as f:
        json.dump(rows, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {args.json}")

    # markdown for PERF.md
    print("\n| preset | GF(MXU)/frame | int8-elig | ceiling f/s (int8 mix) "
          "| ceiling x | achieved f/s | achieved x | % of ceiling |")
    print("|---|---|---|---|---|---|---|---|")
    for name, r in rows.items():
        print(
            f"| {name} | {r['gf_mxu_per_frame']} | "
            f"{r['int8_fraction']:.0%} | {r['ceiling_fps_int8_mix']:.0f} | "
            f"{r['ceiling_x_int8_mix']} | "
            f"{r.get('achieved_fps', '—')} | {r.get('achieved_x', '—')} | "
            f"{r.get('pct_of_int8_mix_ceiling', '—')} |"
        )


if __name__ == "__main__":
    main()
