"""A/B: fused Pallas layer1 chain (ops/layer1_chain.py) vs the XLA e2e-int8
graph at the flagship deploy shape (batch 128, 64x48 stem output).

Both sides run the SAME quantized arithmetic on the same random
weights/scales; the script first bit-checks them against each other on the
real device, then traces both interleaved and reports device durations.
XLA-side composite baseline from PERF.md round-2 budget: 2.25 ms.

Run ALONE on the real TPU (tunnel): python experiments/layer1_chain_ab.py
"""
import sys, tempfile, glob, gzip, json

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from contextaware_poseformer_tpu.ops.layer1_chain import layer1_chain

B, H, W = 128, 64, 48
PLANES, EXP = 64, 256

rng = np.random.RandomState(0)


def rand_pack():
    def w(shape):
        return jnp.asarray(rng.randint(-127, 128, shape).astype(np.int8))

    def aff(c):
        return (
            jnp.asarray(rng.rand(4, 1, c).astype(np.float32) * 0.01).astype(
                jnp.bfloat16
            ),
            jnp.asarray(rng.randn(4, 1, c).astype(np.float32) * 0.05).astype(
                jnp.bfloat16
            ),
        )

    s1, b1 = aff(PLANES)
    s2, b2 = aff(PLANES)
    s3, b3 = aff(EXP)
    amaxes = rng.rand(17).astype(np.float32) + 0.5
    sca = np.empty(17, np.float32)
    sca[:13] = 127.0 / amaxes[:13]
    sca[13:] = amaxes[13:] / 127.0
    return {
        "w1_0": w((PLANES, PLANES)),
        "w1_r": w((3, EXP, PLANES)),
        "w2": w((4, 3, 3 * PLANES, PLANES)),
        "w3": w((4, PLANES, EXP)),
        "wds": w((PLANES, EXP)),
        "s1": s1, "b1": b1, "s2": s2, "b2": b2,
        "s3": s3[:, :, :], "b3": b3,
        "sds": jnp.asarray(
            rng.rand(1, 1, EXP).astype(np.float32) * 0.01
        ).astype(jnp.bfloat16),
        "bds": jnp.asarray(
            rng.randn(1, 1, EXP).astype(np.float32) * 0.05
        ).astype(jnp.bfloat16),
        "sca": jnp.asarray(sca),
    }


def xla_chain(x, p):
    """The exact HRNet._layer1_int8 inference graph on the pack's pieces."""
    sca = p["sca"]

    def quant(t, scale):
        return jnp.clip(
            jnp.round(t.astype(jnp.float32) * scale), -127, 127
        ).astype(jnp.int8)

    def conv1x1(xq, wk, s, b):
        acc = jax.lax.dot_general(
            xq, wk, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.bfloat16) * s + b

    def conv3x3(xq, wk, s, b):
        # wk: (3, 192, 64) dy bands -> HWIO (3,3,64,64)
        k = wk.reshape(3, 3, PLANES, PLANES)
        acc = jax.lax.conv_general_dilated(
            xq, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.bfloat16) * s + b

    xq = quant(x, sca[0])
    for i in range(4):
        wk = p["w1_0"] if i == 0 else p["w1_r"][i - 1]
        y = jnp.maximum(conv1x1(xq, wk, p["s1"][i], p["b1"][i]), 0)
        y = quant(y, sca[1 + i])
        y = jnp.maximum(conv3x3(y, p["w2"][i], p["s2"][i], p["b2"][i]), 0)
        y = quant(y, sca[5 + i])
        y = conv1x1(y, p["w3"][i], p["s3"][i], p["b3"][i])
        if i == 0:
            res = conv1x1(xq, p["wds"], p["sds"][0], p["bds"][0])
        else:
            res = xq.astype(jnp.bfloat16) * sca[13 + i].astype(jnp.bfloat16)
        o = jnp.maximum(y + res, 0)
        xq = quant(o, sca[9 + i])
    return xq


def main():
    print("backend:", jax.default_backend())
    pack = rand_pack()
    x = jnp.asarray(rng.randn(B, H, W, PLANES).astype(np.float32)).astype(
        jnp.bfloat16
    )

    f_pallas = jax.jit(lambda x: layer1_chain(x, pack))
    f_xla = jax.jit(lambda x: xla_chain(x, pack))

    a = np.asarray(jax.block_until_ready(f_pallas(x)))
    b = np.asarray(jax.block_until_ready(f_xla(x)))
    exact = (a == b).mean()
    print(f"bit-match: {exact * 100:.4f}%  maxdiff={np.abs(a.astype(np.int32) - b.astype(np.int32)).max()}")

    tmp = tempfile.mkdtemp(prefix="l1ab_")
    jax.profiler.start_trace(tmp)
    o = None
    for i in range(6):
        salt = x + jnp.bfloat16(i * 1e-3)
        o = f_pallas(salt)
        o2 = f_xla(salt)
    jax.block_until_ready((o, o2))
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
    rows = sorted(
        ((np.median(v), len(v), k) for k, v in agg.items()), reverse=True
    )
    for med, n, k in rows[:25]:
        print(f"{med:9.1f} x{n:<3d} {k[:70]}")


if __name__ == "__main__":
    main()
