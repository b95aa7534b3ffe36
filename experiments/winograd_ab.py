"""A/B: Winograd F(2x2,3x3) vs direct bf16 conv on the HRNet branch shapes.

Verdict item: the first ALGORITHM-level reformulation measured on device.
Direct-formulation roofline (PERF.md round-2): branch0 (C=32) runs at
~98.7 TF/s = 50% bf16 peak, which IS the best-known W-group packing for
C=32 — a ceiling only a different formulation can move. Winograd does
2.25x fewer MACs but its transformed-domain GEMMs have K=N=C, so the MXU
pads C=32 operands 16x (pack=1) unless 4 tile positions are merged
block-diagonally (pack=4: 4x executed MACs at full tiles).

Predicted executed-MXU-volume ratios vs direct (see ops/winograd.py):
  C=32 : pack1 3.6x WORSE, pack4 0.9x (~even, before transform cost)
  C=64 : pack1 1.8x worse, pack4 0.9x
  C=128: pack1 0.44x (2.25x fewer, full tiles already)
The A/B measures each branch shape both as one conv and as a 4-BasicBlock
chain (8 convs, affine+relu epilogues, residual adds) — the chain is what
would actually ship. Interleaved in one process, device-trace durations
(wall clock is unreliable through the tunnel, PERF.md).

Run ALONE on the real TPU: python experiments/winograd_ab.py
"""
import sys, tempfile, glob, gzip, json

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from contextaware_poseformer_tpu.ops.winograd import (
    transform_kernel,
    winograd_conv3x3,
)

B = 128
SHAPES = [  # (name, H, W, C) — deploy budget rows, PERF.md
    ("branch0", 64, 48, 32),
    ("branch1", 32, 24, 64),
    ("branch2", 16, 12, 128),
]
NBLOCKS = 4  # chain depth: 4 BasicBlocks = 8 convs

rng = np.random.RandomState(0)


def make_params(c):
    ks, us, scales, biases = [], [], [], []
    for _ in range(2 * NBLOCKS):
        k = jnp.asarray((rng.randn(3, 3, c, c) * 0.08).astype(np.float32))
        ks.append(k.astype(jnp.bfloat16))
        us.append(transform_kernel(k).astype(jnp.bfloat16))
        scales.append(jnp.asarray(rng.rand(c).astype(np.float32) * 0.5 + 0.7))
        biases.append(jnp.asarray(rng.randn(c).astype(np.float32) * 0.05))
    return ks, us, scales, biases


def direct_chain(x, ks, scales, biases):
    for i in range(NBLOCKS):
        y = x
        for j in range(2):
            n = 2 * i + j
            y = jax.lax.conv_general_dilated(
                y.astype(jnp.bfloat16), ks[n], (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).astype(jnp.float32) * scales[n] + biases[n]
            if j == 0:
                y = jax.nn.relu(y)
        x = jax.nn.relu(y + x)
    return x


def wino_chain(x, us, scales, biases, pack):
    for i in range(NBLOCKS):
        y = x
        for j in range(2):
            n = 2 * i + j
            y = winograd_conv3x3(
                y, us[n], pack=pack, mm_dtype=jnp.bfloat16
            ) * scales[n] + biases[n]
            if j == 0:
                y = jax.nn.relu(y)
        x = jax.nn.relu(y + x)
    return x


def trace_and_report(fns, x, label):
    tmp = tempfile.mkdtemp(prefix="winoab_")
    jax.profiler.start_trace(tmp)
    outs = []
    for i in range(6):
        salt = x + jnp.float32(i * 1e-3)
        for f in fns.values():
            outs.append(f(salt))
    jax.block_until_ready(outs)
    jax.profiler.stop_trace()
    files = glob.glob(tmp + "/plugins/profile/*/*.trace.json.gz")
    data = json.load(gzip.open(sorted(files)[-1]))
    events = data["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in pids.items() if "/device:" in n and "CPU" not in n}
    # jit function totals: aggregate by the jit_<name> top-level module name
    agg = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev:
            name = e.get("name", "")
            for key in fns:
                if key in name:
                    agg.setdefault(key, []).append(e["dur"])
    print(f"\n== {label} (device us, median of per-iter sums) ==")
    for key in fns:
        v = agg.get(key, [])
        if not v:
            print(f"  {key}: NOT FOUND in trace")
            continue
        per_iter = np.sum(v) / 6.0
        print(f"  {key}: {per_iter:9.1f} us/iter  ({len(v)} events)")


def main():
    print("backend:", jax.default_backend())
    for name, h, w, c in SHAPES:
        ks, us, scales, biases = make_params(c)
        x = jnp.asarray(rng.randn(B, h, w, c).astype(np.float32))

        def mk(key, fn):
            # the function __name__ becomes the jit module name in traces
            fn.__name__ = key
            return jax.jit(fn)

        fns = {
            f"direct_{name}": mk(
                f"direct_{name}",
                lambda x, ks=ks: direct_chain(x, ks, scales, biases),
            ),
            f"wino1_{name}": mk(
                f"wino1_{name}",
                lambda x, us=us: wino_chain(x, us, scales, biases, 1),
            ),
            f"wino4_{name}": mk(
                f"wino4_{name}",
                lambda x, us=us: wino_chain(x, us, scales, biases, 4),
            ),
        }
        # parity first (bf16 tolerance)
        ref = np.asarray(fns[f"direct_{name}"](x))
        for key in (f"wino1_{name}", f"wino4_{name}"):
            got = np.asarray(fns[key](x))
            rel = np.abs(got - ref).max() / np.abs(ref).max()
            print(f"{key}: rel-vs-direct {rel:.2e}")
            assert rel < 5e-2, (key, rel)
        trace_and_report(fns, x, f"{name} B={B} {h}x{w}x{c} chain={NBLOCKS}blk")


if __name__ == "__main__":
    main()
