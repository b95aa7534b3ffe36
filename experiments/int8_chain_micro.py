"""Micro-timings of int8 chain-conv kernel pieces at branch0 scale.

Pieces (each an 8x-unrolled in-VMEM loop, one pallas_call, batch-8 blocks,
grid 16 == full batch 128):
  matmul3: dy rolls + 3 int8 matmuls + int32 edge masks + accumulate
  requant: int32 acc -> scale/bias/relu -> window build -> int8 quant
  matmul1: single concat-K (M,576)@(576,128) int8 matmul (no rolls/masks)
"""
import sys, tempfile, glob, gzip, json
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RPI, G, K, N = 768, 12, 192, 128
B, b_blk, REP = 128, 2, 4
M = RPI * b_blk

def matmul3_kernel(x_ref, w_ref, out_ref):
    row = jax.lax.broadcasted_iota(jnp.int32, (M, N), 0) % RPI
    up_edge, dn_edge = row < G, row >= RPI - G
    x = x_ref[...]
    acc = jnp.zeros((M, N), jnp.int32)
    for i in range(REP):
        a = jnp.dot(x, w_ref[i, 1], preferred_element_type=jnp.int32)
        x32 = pltpu.bitcast(x, jnp.int32)
        xup = pltpu.bitcast(pltpu.roll(x32, G // 4, 0), jnp.int8)
        a += jnp.where(up_edge, 0,
                       jnp.dot(xup, w_ref[i, 0], preferred_element_type=jnp.int32))
        xdn = pltpu.bitcast(pltpu.roll(x32, x32.shape[0] - G // 4, 0), jnp.int8)
        a += jnp.where(dn_edge, 0,
                       jnp.dot(xdn, w_ref[i, 2], preferred_element_type=jnp.int32))
        acc += a
    out_ref[...] = acc

def matmul3_nomask_kernel(x_ref, w_ref, out_ref):
    x = x_ref[...]
    acc = jnp.zeros((M, N), jnp.int32)
    for i in range(REP):
        a = jnp.dot(x, w_ref[i, 1], preferred_element_type=jnp.int32)
        x32 = pltpu.bitcast(x, jnp.int32)
        xup = pltpu.bitcast(pltpu.roll(x32, G // 4, 0), jnp.int8)
        a += jnp.dot(xup, w_ref[i, 0], preferred_element_type=jnp.int32)
        xdn = pltpu.bitcast(pltpu.roll(x32, x32.shape[0] - G // 4, 0), jnp.int8)
        a += jnp.dot(xdn, w_ref[i, 2], preferred_element_type=jnp.int32)
        acc += a
    out_ref[...] = acc

def requant_kernel(a_ref, s_ref, b_ref, out_ref):
    g32 = jax.lax.broadcasted_iota(jnp.int32, (M, 32), 0) % G
    zero32 = jnp.zeros((M, 32), jnp.float32)
    acc = a_ref[...]
    out = jnp.zeros((M, K), jnp.int8)
    for i in range(REP):
        y = jnp.maximum(acc.astype(jnp.float32) * s_ref[i] + b_ref[i], 0.0)
        left = jnp.where(g32 == 0, zero32, pltpu.roll(y, 1, 0)[:, 96:128])
        right = jnp.where(g32 == G - 1, zero32,
                          pltpu.roll(y, M - 1, 0)[:, 0:32])
        xw = jnp.concatenate([left, y, right], 1) * 25.0
        xq = jnp.clip(jnp.round(xw), -127, 127).astype(jnp.int8)
        out = jnp.bitwise_xor(out, xq)
        acc = acc + 1
    out_ref[...] = out

def matmul1_kernel(x_ref, w_ref, out_ref):
    x = x_ref[...]
    acc = jnp.zeros((M, N), jnp.int32)
    for i in range(REP):
        x32 = pltpu.bitcast(x, jnp.int32)
        xup = pltpu.bitcast(pltpu.roll(x32, G // 4, 0), jnp.int8)
        xdn = pltpu.bitcast(pltpu.roll(x32, x32.shape[0] - G // 4, 0), jnp.int8)
        x3 = jnp.concatenate([xup, x, xdn], 1)
        acc += jnp.dot(x3, w_ref[i], preferred_element_type=jnp.int32)
    out_ref[...] = acc

def bf16_matmul3_kernel(x_ref, w_ref, out_ref):
    x = x_ref[...]
    acc = jnp.zeros((M, N), jnp.float32)
    for i in range(REP):
        a = jnp.dot(x, w_ref[i, 1], preferred_element_type=jnp.float32)
        xup = pltpu.roll(x, G, 0)
        a += jnp.dot(xup, w_ref[i, 0], preferred_element_type=jnp.float32)
        xdn = pltpu.roll(x, M - G, 0)
        a += jnp.dot(xdn, w_ref[i, 2], preferred_element_type=jnp.float32)
        acc += a
    out_ref[...] = acc

rng = np.random.RandomState(0)
xq = jnp.asarray(rng.randint(-127, 128, (RPI * B, K)).astype(np.int8))
xb = jnp.asarray(rng.randn(RPI * B, K).astype(np.float32)).astype(jnp.bfloat16)
accin = jnp.asarray(rng.randint(-2000, 2000, (RPI * B, N)).astype(np.int32))
w3 = jnp.asarray(rng.randint(-8, 9, (REP, 3, K, N)).astype(np.int8))
w3b = jnp.asarray(rng.randn(REP, 3, K, N).astype(np.float32)).astype(jnp.bfloat16)
w1 = jnp.asarray(rng.randint(-8, 9, (REP, 3 * K, N)).astype(np.int8))
sc = jnp.asarray(rng.rand(REP, 1, N).astype(np.float32))
bi = jnp.asarray(rng.randn(REP, 1, N).astype(np.float32))

def pc(kernel, ins, out_shape, out_dtype):
    specs = []
    for a in ins:
        if a.shape[0] == RPI * B:
            nd = a.ndim
            specs.append(pl.BlockSpec((M,) + a.shape[1:],
                                      lambda i, nd=nd: (i,) + (0,) * (nd - 1)))
        else:
            nd = a.ndim
            specs.append(pl.BlockSpec(a.shape, lambda i, nd=nd: (0,) * nd))
    return jax.jit(lambda *xs: pl.pallas_call(
        kernel, grid=(B // b_blk,), in_specs=specs,
        out_specs=pl.BlockSpec((M,) + out_shape[1:],
                               lambda i: (i,) + (0,) * (len(out_shape) - 1)),
        out_shape=jax.ShapeDtypeStruct(out_shape, out_dtype))(*xs))

Mfull = RPI * B
cases = [
    ("matmul3", pc(matmul3_kernel, [xq, w3], (Mfull, N), jnp.int32), [xq, w3]),
    ("matmul3_nomask", pc(matmul3_nomask_kernel, [xq, w3], (Mfull, N), jnp.int32), [xq, w3]),
    ("matmul1_concatK", pc(matmul1_kernel, [xq, w1], (Mfull, N), jnp.int32), [xq, w1]),
    ("requant_window", pc(requant_kernel, [accin, sc, bi], (Mfull, K), jnp.int8), [accin, sc, bi]),

]

for name, fn, args in cases:
    jax.block_until_ready(fn(*args))

tmp = tempfile.mkdtemp(prefix="int8micro_")
jax.profiler.start_trace(tmp)
for name, fn, args in cases:
    o = None
    for i in range(4):
        a0 = args[0]
        salt = (jnp.bitwise_xor(a0, a0.dtype.type(i)) if a0.dtype != jnp.bfloat16
                else a0 + jnp.bfloat16(i * 1e-3))
        o = fn(salt, *args[1:])
    jax.block_until_ready(o)
jax.profiler.stop_trace()

files = glob.glob(tmp + "/plugins/profile/*/*.trace.json.gz")
data = json.load(gzip.open(sorted(files)[-1]))
events = data["traceEvents"]
pids = {e["pid"]: e["args"].get("name", "") for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"}
dev = {p for p, n in pids.items() if "/device:" in n and "CPU" not in n}
times = sorted((e["ts"], e["dur"], e.get("name", "")) for e in events
               if e.get("ph") == "X" and e.get("pid") in dev
               and ("pallas" in e.get("name", "")
                    or "pallas" in e.get("args", {}).get("tf_op", "")))
for t in times:
    print(f"{t[1]:8.1f} us  {t[2][:60]}")
