"""A/B: multi-level fused sampler fed PACKED lane-major points vs the
shipped (…, 2)-minor contract (VERDICT/PERF 'packed-offsets -> (P,2)
relayout copies, ~0.4 ms' lever).

The DeformableBlock computes offsets in packed (b, L, p, 2*nh*ns) rows
(models/lifter.py:118-125 — the unpacked layout ran the VPU at 2%); the
shipped sampler contract then forces an XLA relayout to (b, L, p, nh*ns, 2)
(~100 us x 4 blocks at batch 128). Variant B teaches the kernel to consume
the packed rows directly: per level, a one-hot row-expand matmul
(P, p_rows) @ (p_rows, 2*nh*ns) -> (P, 2*nh*ns) on the MXU (f32 HIGHEST —
one-hot selection is exact) and two masked lane reductions produce the x/y
vectors in-VMEM, feeding the existing _sample_body_xy. Risk: the expander
negative result (PERF.md round-2 session 1) showed little matmuls in this
kernel can cost more than the VPU work they replace.

Both variants are jitted from the SAME packed input so variant A pays the
relayout inside its own graph, as the composite does.

Run ALONE on the real TPU: python experiments/packed_points_ab.py
"""
import functools
import sys, tempfile, glob, gzip, json

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from contextaware_poseformer_tpu.ops import deformable as D

B, P_JOINTS, NHNS = 128, 17, 16
LEVEL_SHAPES = ((64, 48, 32), (32, 24, 64), (16, 12, 128), (8, 6, 256))
PR_PAD = 24  # round_up(17, 8)
P = P_JOINTS * NHNS  # 272


def _packed_multi_kernel(pts_ref, *rest, shapes, border, align_corners,
                         precision):
    """pts (1, L*PR_PAD, 2*NHNS) packed level-major rows of interleaved
    (x, y) sample pairs."""
    levels = len(shapes)
    f_refs = rest[:levels]
    out_refs = rest[levels:]
    hi = jax.lax.Precision.HIGHEST

    # shared unpack operands (identical for every level)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (P, PR_PAD), 0)
    j_iota = jax.lax.broadcasted_iota(jnp.int32, (P, PR_PAD), 1)
    A = jnp.where(r_iota // NHNS == j_iota, 1.0, 0.0)  # (P, PR_PAD)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (P, 2 * NHNS), 1)
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (P, 2 * NHNS), 0) % NHNS
    mx = jnp.where(l_iota == 2 * s_iota, 1.0, 0.0)
    my = jnp.where(l_iota == 2 * s_iota + 1, 1.0, 0.0)

    for l, (h, w, c) in enumerate(shapes):
        blk = pts_ref[0, l * PR_PAD:(l + 1) * PR_PAD]  # (PR_PAD, 2*NHNS)
        R = jnp.dot(A, blk, preferred_element_type=jnp.float32,
                    precision=hi)  # (P, 2*NHNS) row-expanded
        x = jnp.sum(R * mx, axis=1)  # one nonzero/row -> exact
        y = jnp.sum(R * my, axis=1)
        out_refs[l][0] = D._sample_body_xy(
            x, y, f_refs[l][0], h=h, w=w, c=c, border=border,
            align_corners=align_corners, precision=precision,
            two_stage=D._use_two_stage(h, w, c), out_dtype=out_refs[l].dtype,
        )


def sample_packed(features, pts_packed, precision="default"):
    """features: L x (b, h, w, c); pts_packed: (b, L, P_JOINTS, 2*NHNS)."""
    b = features[0].shape[0]
    pts = jnp.pad(pts_packed, ((0, 0), (0, 0), (0, PR_PAD - P_JOINTS),
                               (0, 0)))
    pts = pts.reshape(b, len(features) * PR_PAD, 2 * NHNS)
    shapes = tuple(f.shape[1:] for f in features)
    f_ins, f_specs = [], []
    for f in features:
        _, h, w, c = f.shape
        if D._use_two_stage(h, w, c):
            f_ins.append(f.reshape(b, h, w * c))
            f_specs.append(pl.BlockSpec((1, h, w * c), lambda i: (i, 0, 0),
                                        memory_space=pltpu.VMEM))
        else:
            f_ins.append(f.reshape(b, h * w, c))
            f_specs.append(pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                                        memory_space=pltpu.VMEM))
    kernel = functools.partial(
        _packed_multi_kernel, shapes=shapes, border=True,
        align_corners=True, precision=precision,
    )
    p_pad = D._round_up(P, 8)
    outs = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, len(features) * PR_PAD, 2 * NHNS),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *f_specs,
        ],
        out_specs=[
            pl.BlockSpec((1, p_pad, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for (_, _, c) in shapes
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, p_pad, c), f.dtype)
            for f, (_, _, c) in zip(features, shapes)
        ],
        interpret=jax.default_backend() != "tpu",
    )(pts, *f_ins)
    return tuple(o[:, :P].reshape(b, P_JOINTS, NHNS, o.shape[-1])
                 for o in outs)


def main():
    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)
    feats = [
        jnp.asarray(rng.randn(B, h, w, c).astype(np.float32)).astype(
            jnp.bfloat16)
        for (h, w, c) in LEVEL_SHAPES
    ]
    packed = jnp.asarray(
        rng.uniform(-1, 1, (B, 4, P_JOINTS, 2 * NHNS)).astype(np.float32))

    def run_a(pk):
        pts = pk.reshape(B, 4, P_JOINTS, NHNS, 2)
        return D.sample_points_levels(
            tuple(feats), pts, padding_mode="border", align_corners=True,
            impl="fused" if jax.default_backend() == "tpu"
            else "fused_interpret",
            precision="default")

    def run_b(pk):
        return sample_packed(tuple(feats), pk)

    f_a, f_b = jax.jit(run_a), jax.jit(run_b)
    oa = jax.block_until_ready(f_a(packed))
    ob = jax.block_until_ready(f_b(packed))
    for l, (a, b) in enumerate(zip(oa, ob)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        d = np.abs(a - b).max()
        print(f"level {l}: shapes {a.shape}~{b.shape} maxdiff {d:.3e}")

    tmp = tempfile.mkdtemp(prefix="ppab_")
    jax.profiler.start_trace(tmp)
    outs = []
    for i in range(6):
        salt = packed + np.float32(i * 1e-4)
        outs = [f_a(salt), f_b(salt)]
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
