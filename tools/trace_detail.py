"""Detailed per-op listing for one subsystem from a saved trace dir.

    python tools/trace_detail.py <trace_dir> <tf_op substring> [top]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import sys


def main():
    trace_dir, needle = sys.argv[1], sys.argv[2]
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 60
    files = glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz")
    data = json.load(gzip.open(sorted(files)[-1]))
    events = data["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev = {p for p, n in pids.items() if "/device:" in n and "CPU" not in n}
    agg = collections.Counter()
    info = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev:
            continue
        name = e.get("name", "")
        if name.startswith("jit_"):
            continue
        a = e.get("args", {})
        if needle not in a.get("tf_op", "") and needle not in name:
            continue
        agg[name] += e.get("dur", 0)
        info.setdefault(name, a)
    total = sum(agg.values())
    print(f"{total/3e3:.3f} ms/iter total for '{needle}'")
    for name, dur in agg.most_common(top):
        a = info[name]
        print(
            f"{dur/3:9.1f} us/it  {name[:34]:34s} "
            f"{a.get('shape_with_layout','')[:44]:44s} "
            f"{a.get('tf_op','')[-72:]}"
        )


if __name__ == "__main__":
    main()
