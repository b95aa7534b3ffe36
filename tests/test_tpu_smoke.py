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
