"""Fused LN+MLP+residual kernel (ops/fused_mlp.py) correctness."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from contextaware_poseformer_tpu.ops import fused_mlp


def _params(d, h, seed=0):
    rng = np.random.RandomState(seed)
    return dict(
        x=jnp.asarray(rng.randn(37, 5, d).astype(np.float32) * 0.5),
        ls=jnp.asarray(1.0 + 0.1 * rng.randn(d).astype(np.float32)),
        lb=jnp.asarray(0.1 * rng.randn(d).astype(np.float32)),
        w1=jnp.asarray(rng.randn(d, h).astype(np.float32) * 0.08),
        b1=jnp.asarray(0.1 * rng.randn(h).astype(np.float32)),
        w2=jnp.asarray(rng.randn(h, d).astype(np.float32) * 0.08),
        b2=jnp.asarray(0.1 * rng.randn(d).astype(np.float32)),
    )


@pytest.mark.parametrize("precision", ["highest", "default"])
def test_kernel_matches_reference(precision):
    p = _params(128, 256)
    got = fused_mlp.ln_mlp_residual(
        p["x"], p["ls"], p["lb"], p["w1"], p["b1"], p["w2"], p["b2"],
        1e-6, precision, True,  # interpret on CPU
    )
    want = fused_mlp.ln_mlp_reference(
        p["x"], p["ls"], p["lb"], p["w1"], p["b1"], p["w2"], p["b2"], 1e-6
    )
    tol = 1e-6 if precision == "highest" else 2e-2
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=tol, atol=tol)


def test_block_fused_mlp_matches_einsum_and_param_tree():
    from contextaware_poseformer_tpu.models.layers import Block

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(22, 5, 64).astype(np.float32) * 0.3)

    blk_e = Block(num_heads=4, mlp_impl="einsum")
    blk_f = Block(num_heads=4, mlp_impl="fused")
    params = blk_e.init(jax.random.PRNGKey(0), x)

    # identical param tree: fused init must produce the same structure
    params_f = blk_f.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_f)

    out_e = blk_e.apply(params, x, True)
    out_f = blk_f.apply(params, x, True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_e),
                               rtol=2e-5, atol=2e-5)


def test_deformable_block_fused_mlp_param_tree():
    import dataclasses

    from contextaware_poseformer_tpu.config import LifterConfig
    from contextaware_poseformer_tpu.models.lifter import PoseLifter

    rng = np.random.RandomState(2)
    b, j = 2, 17
    feats = [jnp.asarray(rng.randn(b, 16, 12, c).astype(np.float32) / 4)
             for c in (8, 16, 32, 64)]
    kp = jnp.asarray(rng.uniform(-1, 1, (b, j, 2)).astype(np.float32))
    ref = jnp.asarray(rng.uniform(-0.9, 0.9, (b, j, 2)).astype(np.float32))

    cfg = LifterConfig(embed_dim_ratio=32, depth=1, levels=4,
                       sampler="gather", drop_path_rate=0.0)
    m_e = PoseLifter(cfg=cfg, feature_dims=(8, 16, 32, 64))
    m_f = PoseLifter(cfg=dataclasses.replace(cfg, mlp="fused"),
                     feature_dims=(8, 16, 32, 64))
    params = m_e.init(jax.random.PRNGKey(0), kp, ref, feats)
    params_f = m_f.init(jax.random.PRNGKey(0), kp, ref, feats)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_f)

    out_e = m_e.apply(params, kp, ref, feats)
    out_f = m_f.apply(params, kp, ref, feats)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_e),
                               rtol=5e-5, atol=5e-5)


def test_grad_matches_reference():
    p = _params(64, 128, seed=3)
    args = (p["x"], p["ls"], p["lb"], p["w1"], p["b1"], p["w2"], p["b2"])

    def loss_fused(*a):
        return jnp.sum(fused_mlp.ln_mlp_residual(*a, 1e-6, "highest", True) ** 2)

    def loss_ref(*a):
        return jnp.sum(fused_mlp.ln_mlp_reference(*a, 1e-6) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 3, 5))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 3, 5))(*args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
