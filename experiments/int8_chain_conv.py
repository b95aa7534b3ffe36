"""Speed probe: int8 banded-matmul conv chain kernel vs XLA bf16 conv.

Branch0 shape (64x48x32). Packing: rows = (y, x-group of 4), lanes =
windowed 6 positions x 32 ch = 192 in / 4 positions x 32 ch = 128 out.
Per conv: 3 dy-band int8 matmuls (int32 acc, masked at image-row edges),
dequant+bias+relu, f32 window rebuild, requant -> int8 for the next conv.
dy shifts via int32-bitcast roll (exactness proven in int8_primitives.py).

Measures an n_convs-deep chain in ONE pallas_call (HBM touched only at
chain ends -- the deployment form) and a 1-conv kernel, vs XLA's bf16
conv3x3+scale+bias+relu on the same logical op (branch0 measured 78us/conv
in the composite trace).
"""
import sys, tempfile, glob, gzip, json
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, C = 64, 48, 32
G = W // 4            # 12 row-groups per image row
RPI = H * G           # 768 rows per image
K, N = 192, 128

def np_window(y_f, g):
    """f32 (M,128) post-relu -> windowed int8 (M,192), numpy reference."""
    left = np.roll(y_f, 1, 0)[:, 96:128].copy();  left[g == 0] = 0
    right = np.roll(y_f, -1, 0)[:, 0:32].copy();  right[g == G - 1] = 0
    return np.concatenate([left, y_f, right], 1)

def np_chain(xq, wbs, scales, biases, qscales, n_convs, n_img):
    """Numpy reference of the chain on int8 windowed input (M,192)."""
    M = xq.shape[0]
    row = np.arange(M) % RPI
    g = np.arange(M) % G
    x = xq.astype(np.int32)
    for i in range(n_convs):
        wb = wbs[i].astype(np.int32)
        acc = x @ wb[1]
        up = np.roll(x, G, 0) @ wb[0]          # input row y-1
        up[row < G] = 0
        dn = np.roll(x, -G, 0) @ wb[2]         # input row y+1
        dn[row >= RPI - G] = 0
        acc = acc + up + dn
        y = np.maximum(acc.astype(np.float32) * scales[i] + biases[i], 0.0)
        xw = np_window(y, g) * qscales[i]
        x = np.clip(np.round(xw), -127, 127).astype(np.int32)
    return x.astype(np.int8)

def make_kernel(n_convs, b_blk):
    M = RPI * b_blk

    def kernel(x_ref, w_ref, s_ref, b_ref, q_ref, out_ref):
        row = jax.lax.broadcasted_iota(jnp.int32, (M, N), 0) % RPI
        up_edge = row < G
        dn_edge = row >= RPI - G
        g32 = jax.lax.broadcasted_iota(jnp.int32, (M, 32), 0) % G
        zero32 = jnp.zeros((M, 32), jnp.float32)
        x = x_ref[...]
        for i in range(n_convs):
            acc = jnp.dot(x, w_ref[i, 1], preferred_element_type=jnp.int32)
            x32 = pltpu.bitcast(x, jnp.int32)
            xup = pltpu.bitcast(pltpu.roll(x32, G // 4, 0), jnp.int8)
            up = jnp.dot(xup, w_ref[i, 0], preferred_element_type=jnp.int32)
            acc += jnp.where(up_edge, 0, up)
            xdn = pltpu.bitcast(
                pltpu.roll(x32, x32.shape[0] - G // 4, 0), jnp.int8)
            dn = jnp.dot(xdn, w_ref[i, 2], preferred_element_type=jnp.int32)
            acc += jnp.where(dn_edge, 0, dn)
            y = jnp.maximum(
                acc.astype(jnp.float32) * s_ref[i] + b_ref[i], 0.0)
            left = jnp.where(g32 == 0, zero32, pltpu.roll(y, 1, 0)[:, 96:128])
            right = jnp.where(g32 == G - 1, zero32,
                              pltpu.roll(y, M - 1, 0)[:, 0:32])
            xw = jnp.concatenate([left, y, right], 1) * q_ref[i, 0]
            x = jnp.clip(jnp.round(xw), -127, 127).astype(jnp.int8)
        out_ref[...] = x

    def run(xq, wbs, scales, biases, qscales):
        B = xq.shape[0] // RPI
        return pl.pallas_call(
            kernel,
            grid=(B // b_blk,),
            in_specs=[
                pl.BlockSpec((M, K), lambda i: (i, 0)),
                pl.BlockSpec(wbs.shape, lambda i: (0, 0, 0, 0)),
                pl.BlockSpec(scales.shape, lambda i: (0, 0, 0)),
                pl.BlockSpec(biases.shape, lambda i: (0, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((M, K), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct(xq.shape, jnp.int8),
        )(xq, wbs, scales, biases, qscales)

    return run

def main():
    rng = np.random.RandomState(0)
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    b_blk = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    B = 128

    # correctness at small batch
    nb = 2 * b_blk if 2 * b_blk <= 8 else b_blk
    xq_s = rng.randint(-127, 128, (RPI * nb, K)).astype(np.int8)
    wbs = rng.randint(-8, 9, (n_convs, 3, K, N)).astype(np.int8)
    scales = (rng.rand(n_convs, 1, N).astype(np.float32) * 1e-3 + 1e-4)
    biases = rng.randn(n_convs, 1, N).astype(np.float32) * 0.1
    qscales = np.full((n_convs, 1), 25.0, np.float32)
    want = np_chain(xq_s, wbs, scales, biases, qscales[:, 0, None],
                    n_convs, nb)
    run = make_kernel(n_convs, b_blk)
    got = np.asarray(run(jnp.asarray(xq_s), jnp.asarray(wbs),
                         jnp.asarray(scales), jnp.asarray(biases),
                         jnp.asarray(qscales)))
    exact = np.array_equal(got, want)
    print(f"n_convs={n_convs} b_blk={b_blk} exact={exact} "
          f"maxdiff={np.abs(got.astype(np.int32) - want.astype(np.int32)).max()}")

    # speed at batch 128, vs XLA bf16 conv+scale+bias+relu
    xq = jnp.asarray(rng.randint(-127, 128, (RPI * B, K)).astype(np.int8))
    jwbs, jsc = jnp.asarray(wbs), jnp.asarray(scales)
    jbi, jqs = jnp.asarray(biases), jnp.asarray(qscales)
    chain = jax.jit(lambda x: run(x, jwbs, jsc, jbi, jqs))

    xf = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32)).astype(jnp.bfloat16)
    wk = jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32)).astype(jnp.bfloat16)
    sc = jnp.asarray(rng.rand(C).astype(np.float32))
    bi = jnp.asarray(rng.randn(C).astype(np.float32))

    @jax.jit
    def xla_chain(x):
        for _ in range(n_convs):
            y = jax.lax.conv_general_dilated(
                x, wk, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jnp.maximum(y.astype(jnp.float32) * sc + bi, 0.0
                            ).astype(jnp.bfloat16)
        return x

    jax.block_until_ready(chain(xq))
    jax.block_until_ready(xla_chain(xf))

    tmp = tempfile.mkdtemp(prefix="int8chain_")
    jax.profiler.start_trace(tmp)
    o = None
    for i in range(6):
        o = chain(jnp.bitwise_xor(xq, jnp.int8(i)))
    jax.block_until_ready(o)
    for i in range(6):
        o = xla_chain(xf + jnp.bfloat16(i * 1e-3))
    jax.block_until_ready(o)
    jax.profiler.stop_trace()

    files = glob.glob(tmp + "/plugins/profile/*/*.trace.json.gz")
    data = json.load(gzip.open(sorted(files)[-1]))
    events = data["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in pids.items() if "/device:" in n and "CPU" not in n}
    pall, conv = [], []
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev:
            continue
        name = e.get("name", "")
        if "pallas" in name or "pallas" in e.get("args", {}).get("tf_op", ""):
            pall.append((e["ts"], e["dur"]))
        elif "conv" in name or "fusion" in name:
            conv.append((e["ts"], e["dur"]))
    pall.sort(); conv.sort()
    per_iter_pallas = sum(d for _, d in pall) / 6
    per_iter_conv = sum(d for _, d in conv) / 6
    print(f"pallas chain: {per_iter_pallas:.0f} us/iter, "
          f"{per_iter_pallas / n_convs:.1f} us/conv")
    print(f"XLA bf16:     {per_iter_conv:.0f} us/iter, "
          f"{per_iter_conv / n_convs:.1f} us/conv")
    print("pallas events/iter:", len(pall) // 6, " conv events/iter:",
          len(conv) // 6)

if __name__ == "__main__":
    main()
