"""Fused short-sequence attention kernel (ops/small_attention.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from contextaware_poseformer_tpu.ops.small_attention import (
    attention_reference,
    small_attention,
)


def _params(rng, d):
    return (
        jnp.asarray((rng.randn(d, 3 * d) * 0.05).astype(np.float32)),
        jnp.asarray(rng.randn(3 * d).astype(np.float32) * 0.02),
        jnp.asarray((rng.randn(d, d) * 0.05).astype(np.float32)),
        jnp.asarray(rng.randn(d).astype(np.float32) * 0.02),
    )


@pytest.mark.parametrize("r,n,d,h", [(300, 5, 128, 8), (64, 5, 32, 4)])
def test_forward_matches_reference(r, n, d, h):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(r, n, d).astype(np.float32))
    wqkv, bqkv, wproj, bproj = _params(rng, d)
    ref = attention_reference(x, wqkv, bqkv, wproj, bproj, h)
    out = small_attention(x, wqkv, bqkv, wproj, bproj, h, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_grad_matches_reference():
    rng = np.random.RandomState(1)
    r, n, d, h = 40, 5, 64, 8
    x = jnp.asarray(rng.randn(r, n, d).astype(np.float32))
    params = _params(rng, d)

    g_ref = jax.grad(
        lambda *a: jnp.sum(attention_reference(*a, h) ** 2),
        argnums=tuple(range(5)),
    )(x, *params)
    g_ker = jax.grad(
        lambda *a: jnp.sum(small_attention(*a, h, True) ** 2),
        argnums=tuple(range(5)),
    )(x, *params)
    for a, b in zip(g_ref, g_ker):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_lifter_fused_attention_param_tree_and_output():
    """cfg.attention='fused' must keep the EXACT param tree of the einsum
    path (checkpoint compatibility) and match its outputs."""
    import dataclasses

    from contextaware_poseformer_tpu.config import LifterConfig
    from contextaware_poseformer_tpu.models.lifter import PoseLifter

    rng = np.random.RandomState(2)
    b, p = 3, 17
    dims = (8, 16, 32, 64)
    feats = [
        jnp.asarray(rng.randn(b, 16 // (2 ** l), 16 // (2 ** l), c)
                    .astype(np.float32))
        for l, c in enumerate(dims)
    ]
    kp = jnp.asarray(rng.uniform(-1, 1, (b, p, 2)).astype(np.float32))
    ref_pts = jnp.asarray(rng.uniform(-1, 1, (b, p, 2)).astype(np.float32))

    cfg = LifterConfig(embed_dim_ratio=32, depth=2, levels=4,
                       sampler="gather")
    m_e = PoseLifter(cfg=cfg, feature_dims=dims)
    params = m_e.init(jax.random.PRNGKey(0), kp, ref_pts, feats)
    out_e = m_e.apply(params, kp, ref_pts, feats)

    fused_cfg = dataclasses.replace(cfg, attention="fused")
    m_f = PoseLifter(cfg=fused_cfg, feature_dims=dims)
    params_f = m_f.init(jax.random.PRNGKey(0), kp, ref_pts, feats)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_f)
    assert all(
        a.shape == b_.shape
        for a, b_ in zip(jax.tree.leaves(params), jax.tree.leaves(params_f))
    )

    # NOTE: on CPU the fused kernel runs through the interpreter only when
    # asked; apply with the SAME params as the einsum init
    out_f = m_f.apply(params, kp, ref_pts, feats)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_e),
                               rtol=1e-4, atol=1e-5)


def test_grouped_attention_middle_matches_reference():
    """ops/joint_attention.attention_middle (interpret) vs the einsum
    reference at the joint-block shape (17 tokens, dim 640, 8 heads) and
    at a non-multiple batch (padding rows/images masked correctly)."""
    from contextaware_poseformer_tpu.ops import joint_attention as ja

    rng = np.random.RandomState(0)
    for b in (16, 11):
        qkv = jnp.asarray(rng.randn(b, 17, 3 * 640).astype(np.float32) * 0.2)
        got = ja.attention_middle(qkv, 8, True)
        want = ja.attention_middle_reference(qkv, 8)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )


def test_grouped_attention_through_block():
    """Attention(impl='grouped') == Attention(impl='einsum') on the same
    params (identical tree), plus grads through the custom vjp."""
    from contextaware_poseformer_tpu.models.layers import Attention

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(5, 17, 128).astype(np.float32) * 0.3)
    a_e = Attention(8, impl="einsum")
    a_g = Attention(8, impl="grouped")
    params = a_e.init(jax.random.PRNGKey(0), x)
    paths = lambda t: {
        "/".join(map(str, p))
        for p, _ in jax.tree_util.tree_flatten_with_path(t)[0]
    }
    assert paths(a_g.init(jax.random.PRNGKey(0), x)) == paths(params)
    oe = a_e.apply(params, x)
    og = a_g.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(og), np.asarray(oe), rtol=2e-5, atol=2e-5
    )
    ge = jax.grad(lambda p: jnp.sum(a_e.apply(p, x) ** 2))(params)
    gg = jax.grad(lambda p: jnp.sum(a_g.apply(p, x) ** 2))(params)
    for a, b in zip(jax.tree.leaves(ge), jax.tree.leaves(gg)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
