"""A/B: joint-block attention einsum (shipped) vs the grouped Pallas middle
(ops/joint_attention.py) at the flagship deploy shape — batch 128, 17
tokens, dim 640, 8 heads, bf16 stream.

Both sides include the XLA qkv/proj matmuls (identical); the difference is
the scores/softmax/AV middle. Numerics checked first, then interleaved
device-trace timing (the valid A/B on the shared chip).

Run ALONE on the real TPU: python experiments/joint_attention_ab.py
"""
import sys, tempfile, glob, gzip, json

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from contextaware_poseformer_tpu.models.layers import Attention

B, N, D, H = 128, 17, 640, 8


def main():
    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, N, D).astype(np.float32) * 0.3).astype(
        jnp.bfloat16)

    a_e = Attention(H, impl="einsum", dtype=jnp.bfloat16)
    a_g = Attention(H, impl="grouped", dtype=jnp.bfloat16)
    params = a_e.init(jax.random.PRNGKey(0), x)

    def run_einsum(x):
        return a_e.apply(params, x)

    def run_grouped(x):
        return a_g.apply(params, x)

    f_e, f_g = jax.jit(run_einsum), jax.jit(run_grouped)
    oe = np.asarray(jax.block_until_ready(f_e(x)), np.float64)
    og = np.asarray(jax.block_until_ready(f_g(x)), np.float64)
    rms = np.sqrt(((oe - og) ** 2).mean()) / (oe.std() + 1e-9)
    print(f"rel RMS einsum vs grouped (bf16): {rms:.3e}")

    tmp = tempfile.mkdtemp(prefix="jaab_")
    jax.profiler.start_trace(tmp)
    outs = []
    for i in range(6):
        salt = x + jnp.bfloat16(i * 1e-3)
        outs = [f_e(salt), f_g(salt)]
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
    for med, n, k in sorted(((np.median(v), len(v), k)
                             for k, v in agg.items()), reverse=True)[:14]:
        print(f"{med:9.1f} x{n:<3d} {k[:70]}")


if __name__ == "__main__":
    main()
