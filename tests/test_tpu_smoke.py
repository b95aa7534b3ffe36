"""Opt-in REAL-TPU smoke tests for the Pallas kernels.

The default suite forces the CPU backend, so the kernels only run in
interpret mode there; a Mosaic regression (layout rule change, reshape
restriction, precision default) would otherwise first surface as a failed
10-minute bench. These compile the two flagship kernels on actual hardware:

    CAPF_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -v

Skipped entirely unless CAPF_TPU_TESTS=1 AND a TPU backend is present.
Keep shapes tiny — each pallas_call is a fresh ~20-40s tunnel compile.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        os.environ.get("CAPF_TPU_TESTS") != "1",
        reason="opt-in: set CAPF_TPU_TESTS=1 and run this file alone",
    ),
]


@pytest.fixture(scope="module")
def tpu():
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend available")
    return jax.devices()[0]


def test_fused_sampler_on_tpu(tpu):
    import jax
    import jax.numpy as jnp

    from contextaware_poseformer_tpu.ops import deformable, grid_sample

    rng = np.random.RandomState(0)
    feats = tuple(
        jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
        for (h, w, c) in ((64, 48, 32), (8, 6, 64))
    )
    pts = jnp.asarray(rng.uniform(-1.1, 1.1, (2, 2, 17, 4, 2)).astype(np.float32))

    got = jax.jit(
        lambda f, p: deformable.sample_points_levels(
            f, p, padding_mode="border", impl="fused"
        )
    )(feats, pts)
    want = tuple(
        grid_sample.grid_sample_points(f, pts[:, l], padding_mode="border")
        for l, f in enumerate(feats)
    )
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w_), rtol=2e-5, atol=2e-5
        )


def test_fused_sampler_chunked_on_tpu(tpu, monkeypatch):
    """The deploy-batch regime: batch LARGER than the sampler chunk.

    The round-4 HEAD regression (coord BlockSpec (chunk, L*P) on a
    (b, L*P) array) lowered fine whenever chunk == batch — which is all
    the other smoke cases cover — and failed Mosaic's sublane rule only
    at chunk < batch (deploy batch 128, chunk 4). This case pins
    chunk=4 at batch 16 so that regression class fails HERE, in a 30s
    smoke compile, instead of zeroing a 10-minute bench."""
    import jax
    import jax.numpy as jnp

    from contextaware_poseformer_tpu.ops import deformable, grid_sample

    monkeypatch.setenv("CAPF_SAMPLER_BATCH_CHUNK", "4")
    rng = np.random.RandomState(6)
    b = 16
    feats = tuple(
        jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        for (h, w, c) in ((64, 48, 32), (8, 6, 64))
    )
    pts = jnp.asarray(
        rng.uniform(-1.1, 1.1, (b, 2, 17, 4, 2)).astype(np.float32))

    got = jax.jit(
        lambda f, p: deformable.sample_points_levels(
            f, p, padding_mode="border", impl="fused"
        )
    )(feats, pts)
    want = tuple(
        grid_sample.grid_sample_points(f, pts[:, l], padding_mode="border")
        for l, f in enumerate(feats)
    )
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w_), rtol=2e-5, atol=2e-5
        )


def test_fused_attention_on_tpu(tpu):
    import jax
    import jax.numpy as jnp

    from contextaware_poseformer_tpu.ops import small_attention as sa

    rng = np.random.RandomState(1)
    r, n, d, heads = 34, 5, 128, 8
    x = jnp.asarray(rng.randn(r, n, d).astype(np.float32) * 0.2)
    wqkv = jnp.asarray(rng.randn(d, 3 * d).astype(np.float32) * 0.05)
    bqkv = jnp.asarray(rng.randn(3 * d).astype(np.float32) * 0.01)
    wproj = jnp.asarray(rng.randn(d, d).astype(np.float32) * 0.05)
    bproj = jnp.asarray(rng.randn(d).astype(np.float32) * 0.01)

    got = jax.jit(
        lambda *a: sa.small_attention(*a, heads)
    )(x, wqkv, bqkv, wproj, bproj)
    want = sa.attention_reference(x, wqkv, bqkv, wproj, bproj, heads)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3
    )


def test_projected_sampler_on_tpu(tpu):
    """In-kernel channel projection (sample_project_points_multi) on real
    hardware: Mosaic must accept the extra VMEM matmul + bias add, and the
    result must match project-then-gather."""
    import jax
    import jax.numpy as jnp

    from contextaware_poseformer_tpu.ops import deformable, grid_sample

    rng = np.random.RandomState(2)
    shapes = ((16, 12, 64), (8, 8, 128))
    feats = tuple(
        jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
        for (h, w, c) in shapes
    )
    pts = jnp.asarray(
        rng.uniform(-1, 1, (2, 2, 17, 4, 2)).astype(np.float32))
    projs = [
        jnp.asarray(rng.randn(c, 32).astype(np.float32) * 0.1)
        for (_, _, c) in shapes
    ]
    biases = [
        jnp.asarray(rng.randn(32).astype(np.float32) * 0.1)
        for _ in shapes
    ]

    got = jax.jit(
        lambda f, p, pj, bi: deformable.sample_points_levels(
            f, p, padding_mode="border", impl="fused",
            projs=pj, biases=bi,
        )
    )(feats, pts, projs, biases)
    for l, f in enumerate(feats):
        fp = jnp.einsum("bhwc,cd->bhwd", f, projs[l]) + biases[l]
        want = grid_sample.grid_sample_points(
            fp, pts[:, l], padding_mode="border")
        np.testing.assert_allclose(
            np.asarray(got[l]), np.asarray(want), rtol=2e-5, atol=2e-5
        )


def test_fused_mlp_on_tpu(tpu):
    """LN+MLP+residual kernel (ops/fused_mlp.py) on real hardware."""
    import jax
    import jax.numpy as jnp

    from contextaware_poseformer_tpu.ops import fused_mlp as fm

    rng = np.random.RandomState(3)
    rows, d, hidden = 40, 128, 256
    x = jnp.asarray(rng.randn(rows, d).astype(np.float32) * 0.3)
    ls = jnp.asarray(rng.rand(d).astype(np.float32) + 0.5)
    lb = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)
    k1 = jnp.asarray(rng.randn(d, hidden).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.randn(hidden).astype(np.float32) * 0.01)
    k2 = jnp.asarray(rng.randn(hidden, d).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(d).astype(np.float32) * 0.01)

    # conftest pins jax_default_matmul_precision=highest, so the jnp
    # reference computes fp32-exact here. The kernel's "highest" branch
    # must match it tightly; the "default" (bf16 MXU) branch only to the
    # bf16 envelope (measured 3.7e-3 max abs at this shape on hardware —
    # that gap is fp32-vs-bf16, not a kernel defect).
    want = np.asarray(fm.ln_mlp_reference(x, ls, lb, k1, b1, k2, b2, 1e-6))
    got_hi = jax.jit(
        lambda *a: fm.ln_mlp_residual(*a, precision="highest")
    )(x, ls, lb, k1, b1, k2, b2)
    np.testing.assert_allclose(np.asarray(got_hi), want, rtol=2e-5, atol=2e-5)
    got_bf = jax.jit(
        lambda *a: fm.ln_mlp_residual(*a, precision="default")
    )(x, ls, lb, k1, b1, k2, b2)
    np.testing.assert_allclose(np.asarray(got_bf), want, rtol=2e-2, atol=1e-2)


def test_grouped_attention_on_tpu(tpu):
    """Head-batched joint-attention middle (ops/joint_attention.py) on
    real hardware — covers the lane-contracting ("NT") dot_general and the
    block-diagonal image masking."""
    import jax
    import jax.numpy as jnp

    from contextaware_poseformer_tpu.ops import joint_attention as ja

    rng = np.random.RandomState(4)
    qkv = jnp.asarray(rng.randn(11, 17, 3 * 640).astype(np.float32) * 0.2)
    got = jax.jit(lambda q: ja.attention_middle(q, 8))(qkv)
    want = ja.attention_middle_reference(qkv, 8)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_sampler_backward_on_tpu(tpu, monkeypatch):
    """Pallas training backward for the fused sampler on real hardware.

    _BWD_IMPL defaults to "reference" until the kernel is hardware-proven,
    so force the Pallas path here — this test IS the hardware proof."""
    import jax
    import jax.numpy as jnp

    from contextaware_poseformer_tpu.ops import deformable as D

    monkeypatch.setattr(D, "_BWD_IMPL", "pallas")
    rng = np.random.RandomState(5)
    shapes = ((16, 12, 32), (8, 8, 64))
    feats = tuple(
        jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
        for h, w, c in shapes
    )
    pts = jnp.asarray(
        rng.uniform(-1.1, 1.1, (2, 2, 17, 4, 2)).astype(np.float32))

    def loss(fs, p):
        o = D.sample_points_levels(
            fs, p, padding_mode="border", impl="fused")
        return sum(jnp.sum(jnp.sin(x)) for x in o)

    gf, gp = jax.jit(jax.grad(loss, argnums=(0, 1)))(feats, pts)

    def ref_loss(fs, p):
        from contextaware_poseformer_tpu.ops import grid_sample

        o = tuple(
            grid_sample.grid_sample_points(
                f, p[:, l], padding_mode="border")
            for l, f in enumerate(fs)
        )
        return sum(jnp.sum(jnp.sin(x)) for x in o)

    rf, rp = jax.jit(jax.grad(ref_loss, argnums=(0, 1)))(feats, pts)
    for a, b in zip(gf, rf):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(gp), np.asarray(rp), rtol=2e-4, atol=2e-4)
