"""Attribute EVERY device microsecond of a saved trace to a named
subsystem bucket (VERDICT r4 item 3: buckets must sum to >=95% of device
time, no "misc fusion" dumping ground).

    python tools/trace_budget.py <trace_dir> [iters] [--json out.json]

Classification walks each op's XLA source metadata (tf_op: the flax
module path, e.g. ".../backbone/layer2_0/conv2/...") with op-name
fallbacks for relayout copies and infeed. Ops that match no rule are
listed individually so the rules can be tightened — the tool FAILS
(exit 2) if unattributed time exceeds 5%.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import sys

# (bucket, substrings-any) — first match wins, order matters.
RULES: list[tuple[str, list[str]]] = [
    ("input normalize/bitcast", ["serving_images", "normalize",
                                 "jit(lift)/convert_element_type"]),
    ("sampler (context_block)", ["context_block", "deformable", "multi_level_sample", "sampler"]),
    # "resnet.conv1" (CPN stem) / "backbone/conv1|2" (HRNet stem), NOT bare
    # "conv1" — every bottleneck has a .conv1 and the stem rule precedes
    # the layer rules.
    ("backbone stem", ["resnet.conv1", "backbone/conv1", "backbone/conv2",
                       "/bn1", "maxpool", "stem", "reduce_window_max"]),
    ("backbone layer1", ["layer1"]),
    ("backbone layer2", ["layer2"]),
    ("backbone layer3", ["layer3"]),
    ("backbone layer4", ["layer4"]),
    # 2^k separable fuse-upsample einsums (round-4b conv-then-upsample):
    # row (oh,nhwc->nowc) and col (pw,nowc->nopc) interpolation matmuls.
    ("pyramid 2^k upsample einsums", ["pw,nowc", "oh,nhwc", "2k_upsample"]),
    ("globalNet laterals+upsample", ["global_net", "globalnet", "lateral"]),
    ("refineNet", ["refine_net", "refinenet", "refine"]),
    ("hrnet transitions+fuse", ["transition", "fuse_", "_fuse", ".fuse"]),
    ("hrnet stage2", ["stage2"]),
    ("hrnet stage3", ["stage3"]),
    ("hrnet stage4", ["stage4"]),
    ("lifter attention", ["attention", "attn"]),
    ("lifter MLP/LN", ["mlp", "layernorm", "norm1", "norm2", "ln_"]),
    ("lifter joint res-blocks", ["res_block"]),
    ("lifter embed/head", ["embed", "head", "regress", "joint_"]),
    ("lifter other (pallas/XLA)", ["/lifter/"]),
    ("requant/clamp (unattributed)", ["clamp", "quant"]),
    ("copies/relayout (unattributed)", []),  # op-name fallback below
]


def classify(tf_op: str, name: str) -> str | None:
    low = tf_op.lower()
    for bucket, needles in RULES:
        for n in needles:
            if n in low:
                return bucket
    # op-name fallbacks: relayout copies and infeed carry no useful tf_op
    base = name.rstrip("0123456789.")
    if base in ("copy", "copy-start", "copy-done", "bitcast-convert",
                "slice-start", "slice-done", "reshape"):
        return "copies/relayout (unattributed)"
    if base.startswith(("infeed", "outfeed")):
        return "host transfer"
    return None


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    trace_dir = argv[0]
    iters = int(argv[1]) if len(argv) > 1 else 3
    files = glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz")
    data = json.load(gzip.open(sorted(files)[-1]))
    events = data["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev = {p for p, n in pids.items() if "/device:" in n and "CPU" not in n}
    buckets: collections.Counter = collections.Counter()
    unk: collections.Counter = collections.Counter()
    unk_meta: dict[str, str] = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev:
            continue
        name = e.get("name", "")
        if name.startswith("jit_"):
            continue
        dur = e.get("dur", 0)
        tf_op = e.get("args", {}).get("tf_op", "")
        b = classify(tf_op, name)
        if b is None:
            unk[name] += dur
            unk_meta.setdefault(name, tf_op)
            b = "UNATTRIBUTED"
        buckets[b] += dur
    total = sum(buckets.values())
    print(f"device total: {total / iters / 1e3:.3f} ms/iter ({iters} iters)")
    print(f"{'bucket':38s} {'us/iter':>9s} {'%':>6s}")
    for b, dur in buckets.most_common():
        print(f"{b:38s} {dur / iters:9.1f} {dur / total * 100:6.2f}")
    cov = 1 - buckets.get("UNATTRIBUTED", 0) / max(total, 1)
    print(f"\nattributed coverage: {cov * 100:.2f}%")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({
                "trace_dir": trace_dir, "iters": iters,
                "total_us_per_iter": round(total / iters, 1),
                "attributed_pct": round(cov * 100, 2),
                "buckets": {b: round(d / iters, 1)
                            for b, d in buckets.most_common()},
            }, f, indent=1)
        print(f"wrote {json_out}")
    if buckets.get("UNATTRIBUTED", 0):
        print("\n== top unattributed ops (tighten RULES) ==")
        for name, dur in unk.most_common(25):
            print(f"{dur / iters:9.1f} us/it  {name[:40]:40s} {unk_meta[name][-70:]}")
    return 0 if cov >= 0.95 else 2


if __name__ == "__main__":
    sys.exit(main())
