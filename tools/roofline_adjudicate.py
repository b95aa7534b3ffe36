"""Merge a measured bucket budget (tools/trace_budget.py --json) with the
three-floor bounds (tools/bucket_floors.py --json) into ROOFLINE.json as a
signed per-bucket adjudication (VERDICT r4 items 3/5).

Per bucket: measured us/iter, floor us/iter, which constraint binds
(arith / lanefill / hbm), measured/floor ratio, and a verdict:

  AT FLOOR    ratio <= 1.15 — the bucket is closed; only a different
              trained topology (lanefill), narrower dtypes (hbm), or
              more chips (arith) move it.
  HEADROOM    ratio > 1.15 — implementation gap; the binding column says
              what an ideal implementation is limited by.
  OVERHEAD    no MXU floor (copies, normalize, host glue) — target for
              elimination, floor ~0.

Preset summary: measured total, floor total, efficiency = floor/measured,
and floor-implied throughput (batch / floor_total) — the adjudicated
reachable number for this graph on one chip.

    python tools/roofline_adjudicate.py --preset h36m_cpn \
        --budget /tmp/budget.json --floors /tmp/floors.json \
        [--bench-fps N] [--roofline ROOFLINE.json]
"""

from __future__ import annotations

import argparse
import json


# the fused lifter Pallas kernels (LN+MLP+residual, joint blocks) lose
# their flax scope in the jaxpr, so bucket_floors lumps them as "unscoped
# kernels" while the trace budget splits them — adjudicate as one group
_GROUP = {
    "lifter other (pallas/XLA)": "lifter glue (MLP/LN, joint, pallas)",
    "lifter MLP/LN": "lifter glue (MLP/LN, joint, pallas)",
    "lifter joint res-blocks": "lifter glue (MLP/LN, joint, pallas)",
    "unscoped kernels (lifter pallas/XLA glue)":
        "lifter glue (MLP/LN, joint, pallas)",
}


def adjudicate(budget: dict, floors: dict, bench_fps: float | None):
    fl: dict[str, dict] = {}
    for r in floors["buckets"]:
        name = _GROUP.get(r["bucket"], r["bucket"])
        if name in fl:
            for k in ("arith_floor_us", "lanefill_floor_us",
                      "hbm_floor_us", "floor_us_per_iter"):
                fl[name][k] += r[k]
        else:
            fl[name] = dict(r)
    meas_by: dict[str, float] = {}
    for bucket, meas in budget["buckets"].items():
        if bucket in ("UNATTRIBUTED", "host transfer"):
            continue
        name = _GROUP.get(bucket, bucket)
        meas_by[name] = meas_by.get(name, 0.0) + meas
    rows = []
    for bucket, meas in meas_by.items():
        f = fl.pop(bucket, None)
        if f is None:
            rows.append({
                "bucket": bucket, "measured_us": meas, "floor_us": 0.0,
                "binding": None, "ratio": None, "verdict": "OVERHEAD",
            })
            continue
        floor = f["floor_us_per_iter"]
        binding = max(
            ("arith", f["arith_floor_us"]),
            ("lanefill", f["lanefill_floor_us"]),
            ("hbm", f["hbm_floor_us"]),
            key=lambda kv: kv[1],
        )[0]
        ratio = round(meas / floor, 2) if floor else None
        verdict = ("AT FLOOR" if ratio is not None and ratio <= 1.15
                   else "HEADROOM")
        rows.append({
            "bucket": bucket, "measured_us": meas, "floor_us": floor,
            "binding": binding, "ratio": ratio, "verdict": verdict,
        })
    # floor-only buckets (measured trace attributed them elsewhere)
    for bucket, f in fl.items():
        rows.append({
            "bucket": bucket, "measured_us": 0.0,
            "floor_us": f["floor_us_per_iter"],
            "binding": None, "ratio": None,
            "verdict": "UNMATCHED (attribution skew)",
        })
    rows.sort(key=lambda r: -r["measured_us"])
    meas_total = budget["total_us_per_iter"]
    floor_total = floors["total_floor_us"]
    batch = floors["batch"]
    out = {
        "batch": batch,
        "measured_total_us": meas_total,
        "floor_total_us": floor_total,
        "efficiency_vs_floor": round(floor_total / meas_total, 3),
        "floor_implied_fps": round(batch / floor_total * 1e6, 1),
        "trace_dir": budget.get("trace_dir"),
        "buckets": rows,
    }
    if bench_fps:
        out["bench_fps"] = bench_fps
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", required=True)
    ap.add_argument("--budget", required=True)
    ap.add_argument("--floors", required=True)
    ap.add_argument("--bench-fps", type=float, default=None)
    ap.add_argument("--roofline", default="ROOFLINE.json")
    args = ap.parse_args()

    budget = json.load(open(args.budget))
    floors = json.load(open(args.floors))
    assert floors["preset"] == args.preset, (floors["preset"], args.preset)
    adj = adjudicate(budget, floors, args.bench_fps)

    print(f"{'bucket':38s} {'meas us':>9s} {'floor':>8s} {'bind':>8s} "
          f"{'ratio':>6s}  verdict")
    for r in adj["buckets"]:
        print(f"{r['bucket']:38s} {r['measured_us']:9.1f} "
              f"{r['floor_us']:8.1f} {str(r['binding'] or '-'):>8s} "
              f"{str(r['ratio'] if r['ratio'] is not None else '-'):>6s}  "
              f"{r['verdict']}")
    print(f"\nmeasured {adj['measured_total_us'] / 1e3:.3f} ms vs floor "
          f"{adj['floor_total_us'] / 1e3:.3f} ms — efficiency "
          f"{adj['efficiency_vs_floor']:.1%}; floor-implied "
          f"{adj['floor_implied_fps']:.0f} fps at batch {adj['batch']}")

    roof = json.load(open(args.roofline))
    roof.setdefault(args.preset, {})["bucket_adjudication_r05"] = adj
    with open(args.roofline, "w") as f:
        json.dump(roof, f, indent=1, sort_keys=True)
    print(f"updated {args.roofline}[{args.preset}].bucket_adjudication_r05")


if __name__ == "__main__":
    main()
