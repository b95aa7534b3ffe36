"""Capture a device trace of a jitted function and print the op-time
breakdown. Works through the axon tunnel (verified: /device:TPU:0 lanes are
populated even on the remote chip).

    python tools/trace_ops.py            # traces the flagship backbone
    # or programmatic:
    from tools.trace_ops import trace_and_report
    trace_and_report(fn, args_fn, iters=3)

The tensorboard_plugin_profile converters in this image are version-broken;
we parse the trace-viewer JSON directly instead.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def analyze_trace(trace_dir: str, top: int = 15) -> dict[str, float]:
    """Aggregate device-op self-times (us) by op family from a jax trace."""
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
    agg: collections.Counter = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            name = e.get("name", "?")
            if name.startswith("jit_"):  # parent span double-counts
                continue
            agg[re.sub(r"[.\d]+$", "", name)] += e.get("dur", 0)
    total = sum(agg.values())
    print(f"device op time: {total / 1e3:.1f} ms total")
    for name, dur in agg.most_common(top):
        print(f"{dur / total * 100:5.1f}%  {name[:70]}")
    return dict(agg)


def trace_and_report(fn, args_fn, iters: int = 3, top: int = 15):
    import jax

    jax.block_until_ready(fn(*args_fn(0)))  # compile outside the trace
    tmp = tempfile.mkdtemp(prefix="jaxtrace_")
    jax.profiler.start_trace(tmp)
    out = None
    for i in range(iters):
        out = fn(*args_fn(i + 1))
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    return analyze_trace(tmp, top)


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from contextaware_poseformer_tpu.config import preset
    from contextaware_poseformer_tpu.models import HRNet

    cfg = preset("h36m_hrnet_32").model
    bb = HRNet(cfg=cfg.backbone, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(
        rng.randn(128, 256, 192, 3).astype(np.float32)
    ).astype(jnp.bfloat16)
    p = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16),
        bb.init(jax.random.PRNGKey(0), imgs[:1]),
    )
    f = jax.jit(lambda p, x, c: bb.apply(p, x + c))
    trace_and_report(f, lambda i: (p, imgs, jnp.bfloat16(i)))


if __name__ == "__main__":
    main()
