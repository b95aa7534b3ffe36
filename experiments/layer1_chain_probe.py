"""Probe the fused layer1 chain kernel (ops/layer1_chain.py) on real TPU.

1. Numerics: single-BLOCK Pallas vs XLA mismatch stats — distinguishes an
   LSB-level bf16-epilogue rounding divergence (expected, cascades through
   the 4 requant stages into the A/B's 78% bit-match) from a real bug.
2. Perf variants, device-trace timed (interleaved in one process):
   v0 full kernel as shipped (3 dy-band matmuls, int32 output masks)
   v1 576-wide single-matmul conv2 (int8 window concat via bitcast rolls,
      input-side edge masks) — exact same integer math, fewer VPU passes
   xla reference chain

Run ALONE on the real TPU: python experiments/layer1_chain_probe.py
"""
import functools
import sys, tempfile, glob, gzip, json

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import experiments.layer1_chain_ab as ab
from contextaware_poseformer_tpu.ops import layer1_chain as l1

B, H, W = 128, 64, 48
PLANES, EXP = 64, 256
M = H * W


def _kernel_v1(x_ref, w1_0, w1_r, w2, w3, wds, s1, b1, s2, b2, s3, b3,
               sds, bds, sca, out_ref, *, h, w, nblocks=4):
    """576-window variant: conv2 as ONE (m,576)x(576,64) int8 matmul."""
    m = h * w
    qin = sca[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (m, PLANES), 0) % w
    left_edge = col == 0
    right_edge = col == w - 1
    row192 = jax.lax.broadcasted_iota(jnp.int32, (m, 3 * PLANES), 0)
    top192 = row192 < w
    bot192 = row192 >= m - w
    fzero = jnp.zeros((m, PLANES), jnp.float32)
    izero = jnp.zeros((m, 3 * PLANES), jnp.int8)

    x = x_ref[...]
    xq0 = l1._quant(x.astype(jnp.float32), qin)
    xq = xq0
    for i in range(nblocks):
        rq1, rq2, rqo = sca[1 + i], sca[5 + i], sca[9 + i]
        wk = w1_0[...] if i == 0 else w1_r[i - 1]
        acc = jnp.dot(xq, wk, preferred_element_type=jnp.int32)
        y1 = jnp.maximum(acc.astype(jnp.bfloat16) * s1[i] + b1[i], 0)

        yf = y1.astype(jnp.float32)
        left = jnp.where(left_edge, fzero, pltpu.roll(yf, 1, 0))
        right = jnp.where(right_edge, fzero, pltpu.roll(yf, m - 1, 0))
        xw = l1._quant(jnp.concatenate([left, yf, right], 1), rq1)
        x32 = pltpu.bitcast(xw, jnp.int32)
        up = jnp.where(
            top192, izero,
            pltpu.bitcast(pltpu.roll(x32, w // 4, 0), jnp.int8))
        dn = jnp.where(
            bot192, izero,
            pltpu.bitcast(pltpu.roll(x32, x32.shape[0] - w // 4, 0),
                          jnp.int8))
        big = jnp.concatenate([up, xw, dn], 1)  # (m, 576)
        acc = jnp.dot(big, w2[i], preferred_element_type=jnp.int32)
        y2 = jnp.maximum(acc.astype(jnp.bfloat16) * s2[i] + b2[i], 0)
        t2q = l1._quant(y2.astype(jnp.float32), rq2)

        acc = jnp.dot(t2q, w3[i], preferred_element_type=jnp.int32)
        y3 = acc.astype(jnp.bfloat16) * s3[i] + b3[i]
        if i == 0:
            accd = jnp.dot(xq0, wds[...], preferred_element_type=jnp.int32)
            res = accd.astype(jnp.bfloat16) * sds[0] + bds[0]
        else:
            res = xq.astype(jnp.bfloat16) * sca[13 + i].astype(jnp.bfloat16)
        o = jnp.maximum(y3 + res, 0)
        xq = l1._quant(o.astype(jnp.float32), rqo)
    out_ref[...] = xq


def chain_v1(x, pack, nblocks=4):
    b, h, w, cin = x.shape
    m = h * w
    x_t = x.reshape(b * m, cin)
    # w2 (4, 3, 192, 64) dy bands -> (4, 576, 64) stacked [up, mid, dn]
    w2b = jnp.concatenate([pack["w2"][:, 0], pack["w2"][:, 1],
                           pack["w2"][:, 2]], axis=1)
    full = lambda a: pl.BlockSpec(a.shape, lambda i, nd=a.ndim: (0,) * nd)
    out = pl.pallas_call(
        functools.partial(_kernel_v1, h=h, w=w, nblocks=nblocks),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((m, cin), lambda i: (i, 0)),
            full(pack["w1_0"]), full(pack["w1_r"]), full(w2b),
            full(pack["w3"]), full(pack["wds"]),
            full(pack["s1"]), full(pack["b1"]), full(pack["s2"]),
            full(pack["b2"]), full(pack["s3"]), full(pack["b3"]),
            full(pack["sds"]), full(pack["bds"]),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((m, EXP), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * m, EXP), jnp.int8),
        interpret=jax.default_backend() != "tpu",
    )(x_t, pack["w1_0"], pack["w1_r"], w2b, pack["w3"], pack["wds"],
      pack["s1"], pack["b1"], pack["s2"], pack["b2"], pack["s3"],
      pack["b3"], pack["sds"], pack["bds"], pack["sca"])
    return out.reshape(b, h, w, EXP)


def xla_1block(x, p):
    sca = p["sca"]
    quant = lambda t, s: jnp.clip(
        jnp.round(t.astype(jnp.float32) * s), -127, 127).astype(jnp.int8)
    xq = quant(x, sca[0])
    y = jax.lax.dot_general(xq, p["w1_0"], (((3,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = jnp.maximum(y.astype(jnp.bfloat16) * p["s1"][0] + p["b1"][0], 0)
    y = quant(y, sca[1])
    k = p["w2"][0].reshape(3, 3, PLANES, PLANES)
    y = jax.lax.conv_general_dilated(
        y, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = jnp.maximum(y.astype(jnp.bfloat16) * p["s2"][0] + p["b2"][0], 0)
    y = quant(y, sca[5])
    y = jax.lax.dot_general(y, p["w3"][0], (((3,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.bfloat16) * p["s3"][0] + p["b3"][0]
    res = jax.lax.dot_general(xq, p["wds"], (((3,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    res = res.astype(jnp.bfloat16) * p["sds"][0] + p["bds"][0]
    return quant(jnp.maximum(y + res, 0), sca[9])


def pallas_1block(x, pack):
    b, h, w, cin = x.shape
    m = h * w
    x_t = x.reshape(b * m, cin)
    full = lambda a: pl.BlockSpec(a.shape, lambda i, nd=a.ndim: (0,) * nd)
    out = pl.pallas_call(
        functools.partial(l1._kernel, h=h, w=w),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((m, cin), lambda i: (i, 0)),
            full(pack["w1_0"]), full(pack["w1_r"]), full(pack["w2"]),
            full(pack["w3"]), full(pack["wds"]),
            full(pack["s1"]), full(pack["b1"]), full(pack["s2"]),
            full(pack["b2"]), full(pack["s3"]), full(pack["b3"]),
            full(pack["sds"]), full(pack["bds"]),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((m, EXP), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * m, EXP), jnp.int8),
        interpret=jax.default_backend() != "tpu",
    )(x_t, pack["w1_0"], pack["w1_r"], pack["w2"], pack["w3"], pack["wds"],
      pack["s1"], pack["b1"], pack["s2"], pack["b2"], pack["s3"],
      pack["b3"], pack["sds"], pack["bds"], pack["sca"])
    return out.reshape(b, h, w, EXP)


def stats(a, b, tag):
    a = np.asarray(a).astype(np.int32)
    b = np.asarray(b).astype(np.int32)
    d = np.abs(a - b)
    print(f"{tag}: match={(d == 0).mean() * 100:.4f}%  maxdiff={d.max()}  "
          f"frac|d|>1={(d > 1).mean() * 100:.4f}%")


def main():
    print("backend:", jax.default_backend())
    ab.B, ab.H, ab.W = B, H, W
    pack = ab.rand_pack()
    rng = ab.rng
    x = jnp.asarray(rng.randn(B, H, W, PLANES).astype(np.float32)).astype(
        jnp.bfloat16)

    # hack: 1-block variant of the shipped kernel via nblocks param of v1;
    # for the shipped kernel use a full-chain compare only.
    one_p = jax.jit(lambda x: chain_v1(x, pack, nblocks=1))
    one_x = jax.jit(lambda x: xla_1block(x, pack))
    stats(jax.block_until_ready(one_p(x)), jax.block_until_ready(one_x(x)),
          "1-block v1 vs xla")

    def run_v0(x):
        return l1.layer1_chain(x, pack)

    def run_v1(x):
        return chain_v1(x, pack)

    def run_xla(x):
        return ab.xla_chain(x, pack)

    f_v0, f_v1, f_xla = jax.jit(run_v0), jax.jit(run_v1), jax.jit(run_xla)
    a0 = np.asarray(jax.block_until_ready(f_v0(x)))
    a1 = np.asarray(jax.block_until_ready(f_v1(x)))
    stats(a0, a1, "full v0 vs v1 (must be 100%)")

    tmp = tempfile.mkdtemp(prefix="l1probe_")
    jax.profiler.start_trace(tmp)
    outs = []
    for i in range(6):
        salt = x + jnp.bfloat16(i * 1e-3)
        outs = [f_v0(salt), f_v1(salt), f_xla(salt)]
    jax.block_until_ready(outs)
    jax.profiler.stop_trace()

    files = glob.glob(tmp + "/plugins/profile/*/*.trace.json.gz")
    data = json.load(gzip.open(sorted(files)[-1]))
    events = data["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in pids.items() if "/device:" in n and "CPU" not in n}
    agg = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev:
            agg.setdefault(e.get("name", ""), []).append(e["dur"])
    print("\nper-op device durations (us, count x median):")
    rows = sorted(((np.median(v), len(v), k) for k, v in agg.items()),
                  reverse=True)
    for med, n, k in rows[:30]:
        print(f"{med:9.1f} x{n:<3d} {k[:70]}")


if __name__ == "__main__":
    main()
