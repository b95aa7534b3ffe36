"""Floor probe: layer1 chain kernel with the requant/window VPU stages
stripped (numerics intentionally wrong) — bounds how much of the 3.77 ms
(vs XLA 2.72) is MXU+epilogue vs the quant/window build VPU passes.

Variants (device-trace timed, interleaved):
  mm   conv1/conv3/ds matmuls + bf16 epilogue only; conv2 replaced by a
       center-band (m,192)x(192,64) matmul on a reused int8 window
  full the shipped kernel (ops/layer1_chain.py)
"""
import functools, sys, tempfile, glob, gzip, json
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import experiments.layer1_chain_ab as ab
from contextaware_poseformer_tpu.ops import layer1_chain as l1

B, H, W = 128, 64, 48
PLANES, EXP = 64, 256
M = H * W

def _kernel_mm(x_ref, w1_0, w1_r, w2, w3, wds, s1, b1, s2, b2, s3, b3,
               sds, bds, sca, out_ref, *, h, w):
    m = h * w
    x = x_ref[...]
    xq0 = l1._quant(x.astype(jnp.float32), sca[0])
    # one static int8 window reused by every conv2 (wrong numerics, right cost shape)
    xw = jnp.concatenate([xq0, xq0, xq0], 1)  # (m, 192)
    xq = xq0
    for i in range(4):
        wk = w1_0[...] if i == 0 else w1_r[i - 1]
        acc = jnp.dot(xq, wk, preferred_element_type=jnp.int32)
        y1 = jnp.maximum(acc.astype(jnp.bfloat16) * s1[i] + b1[i], 0)
        acc = jnp.dot(xw, w2[i, 1], preferred_element_type=jnp.int32)
        y2 = jnp.maximum(acc.astype(jnp.bfloat16) * s2[i] + b2[i], 0)
        t2q = y2.astype(jnp.int8)  # cheap cast, no round/clip
        acc = jnp.dot(t2q, w3[i], preferred_element_type=jnp.int32)
        y3 = acc.astype(jnp.bfloat16) * s3[i] + b3[i]
        if i == 0:
            accd = jnp.dot(xq0, wds[...], preferred_element_type=jnp.int32)
            res = accd.astype(jnp.bfloat16) * sds[0] + bds[0]
        else:
            res = xq.astype(jnp.bfloat16) * sca[13 + i].astype(jnp.bfloat16)
        o = jnp.maximum(y3 + res, 0)
        xq = o.astype(jnp.int8)
    out_ref[...] = xq

def chain_mm(x, pack):
    b, h, w, cin = x.shape
    m = h * w
    x_t = x.reshape(b * m, cin)
    full = lambda a: pl.BlockSpec(a.shape, lambda i, nd=a.ndim: (0,) * nd)
    out = pl.pallas_call(
        functools.partial(_kernel_mm, h=h, w=w), grid=(b,),
        in_specs=[pl.BlockSpec((m, cin), lambda i: (i, 0)),
                  full(pack["w1_0"]), full(pack["w1_r"]), full(pack["w2"]),
                  full(pack["w3"]), full(pack["wds"]),
                  full(pack["s1"]), full(pack["b1"]), full(pack["s2"]),
                  full(pack["b2"]), full(pack["s3"]), full(pack["b3"]),
                  full(pack["sds"]), full(pack["bds"]),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((m, EXP), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * m, EXP), jnp.int8),
        interpret=jax.default_backend() != "tpu",
    )(x_t, pack["w1_0"], pack["w1_r"], pack["w2"], pack["w3"], pack["wds"],
      pack["s1"], pack["b1"], pack["s2"], pack["b2"], pack["s3"],
      pack["b3"], pack["sds"], pack["bds"], pack["sca"])
    return out.reshape(b, h, w, EXP)

def main():
    print("backend:", jax.default_backend())
    ab.B, ab.H, ab.W = B, H, W
    pack = ab.rand_pack()
    x = jnp.asarray(ab.rng.randn(B, H, W, PLANES).astype(np.float32)).astype(jnp.bfloat16)
    def run_mm(x): return chain_mm(x, pack)
    def run_full(x): return l1.layer1_chain(x, pack)
    f_mm, f_full = jax.jit(run_mm), jax.jit(run_full)
    jax.block_until_ready((f_mm(x), f_full(x)))
    tmp = tempfile.mkdtemp(prefix="l1floor_")
    jax.profiler.start_trace(tmp)
    outs = []
    for i in range(6):
        salt = x + jnp.bfloat16(i * 1e-3)
        outs = [f_mm(salt), f_full(salt)]
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
    for med, n, k in sorted(((np.median(v), len(v), k) for k, v in agg.items()), reverse=True)[:8]:
        print(f"{med:9.1f} x{n:<3d} {k[:70]}")

if __name__ == "__main__":
    main()
