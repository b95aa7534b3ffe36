import numpy as np
import pytest

import jax
import jax.numpy as jnp

from contextaware_poseformer_tpu.config import LifterConfig
from contextaware_poseformer_tpu.models import PoseLifter

torch = pytest.importorskip("torch")
from torch_oracle import lifter_forward  # noqa: E402


def _make_inputs(rng, batch=2, joints=17, dims=(8, 16, 24, 40), sizes=((16, 12), (8, 6), (4, 3), (2, 2))):
    kp2d = rng.uniform(-1, 1, size=(batch, joints, 2)).astype(np.float32)
    ref = rng.uniform(-0.95, 0.95, size=(batch, joints, 2)).astype(np.float32)
    feats = [
        rng.randn(batch, h, w, c).astype(np.float32)
        for (h, w), c in zip(sizes, dims)
    ]
    return kp2d, ref, feats


def _to_numpy_tree(params):
    return jax.tree.map(np.asarray, params)


@pytest.mark.parametrize("use_deformable", [True, False])
def test_lifter_matches_torch_oracle(use_deformable):
    rng = np.random.RandomState(0)
    dims = (8, 16, 24, 40)
    cfg = LifterConfig(
        embed_dim_ratio=32, depth=2, levels=4, num_heads=8,
        use_deformable=use_deformable, drop_path_rate=0.2,
    )
    kp2d, ref, feats = _make_inputs(rng, dims=dims)

    model = PoseLifter(cfg=cfg, feature_dims=dims)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(kp2d), jnp.asarray(ref),
        [jnp.asarray(f) for f in feats],
    )
    # randomize pos_embed (zeros-init would hide mapping bugs)
    params = jax.tree.map(lambda x: x, params)
    pe = 0.1 * rng.randn(*params["params"]["pos_embed"].shape).astype(np.float32)
    params["params"]["pos_embed"] = jnp.asarray(pe)

    ours = np.asarray(
        model.apply(params, jnp.asarray(kp2d), jnp.asarray(ref),
                    [jnp.asarray(f) for f in feats])
    )

    feats_nchw = [np.transpose(f, (0, 3, 1, 2)) for f in feats]
    golden = lifter_forward(
        _to_numpy_tree(params["params"]), kp2d, ref, feats_nchw,
        depth=cfg.depth, num_heads=cfg.num_heads, use_deformable=use_deformable,
    )
    assert ours.shape == (2, 17, 3)
    np.testing.assert_allclose(ours, golden, rtol=2e-4, atol=2e-5)


def test_deformable_offset_init_matches_reference_formula():
    import math

    cfg = LifterConfig(embed_dim_ratio=32, depth=1, levels=4, use_deformable=True)
    dims = (8, 16, 24, 40)
    rng = np.random.RandomState(0)
    kp2d, ref, feats = _make_inputs(rng, dims=dims)
    model = PoseLifter(cfg=cfg, feature_dims=dims)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(kp2d), jnp.asarray(ref),
        [jnp.asarray(f) for f in feats],
    )["params"]

    blk = params["context_block_0"]
    # zero-initialized weight matrices
    assert np.all(np.asarray(blk["sampling_offsets"]["dense"]["kernel"]) == 0)
    assert np.all(np.asarray(blk["attention_weights"]["dense"]["kernel"]) == 0)
    assert np.all(np.asarray(blk["attention_weights"]["dense"]["bias"]) == 0)

    bias = np.asarray(blk["sampling_offsets"]["dense"]["bias"]).reshape(4, 4, 2)
    thetas = np.arange(4) * (2 * math.pi / 4)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    expected = 0.01 * grid[:, None, :] * (np.arange(4) + 1)[None, :, None]
    np.testing.assert_allclose(bias, expected, atol=1e-7)


def test_lifter_train_mode_stochastic():
    cfg = LifterConfig(embed_dim_ratio=32, depth=2, levels=4, drop_path_rate=0.5)
    dims = (8, 16, 24, 40)
    rng = np.random.RandomState(3)
    kp2d, ref, feats = _make_inputs(rng, dims=dims)
    model = PoseLifter(cfg=cfg, feature_dims=dims)
    args = (jnp.asarray(kp2d), jnp.asarray(ref), [jnp.asarray(f) for f in feats])
    params = model.init(jax.random.PRNGKey(0), *args)

    out1 = model.apply(params, *args, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(1)})
    out2 = model.apply(params, *args, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(2)})
    # drop-path must actually randomize the graph in train mode
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    # and be the identity in eval mode
    out3 = model.apply(params, *args)
    out4 = model.apply(params, *args)
    np.testing.assert_array_equal(np.asarray(out3), np.asarray(out4))


@pytest.mark.slow
def test_lifter_jit_and_grad():
    cfg = LifterConfig(embed_dim_ratio=32, depth=2, levels=4)
    dims = (8, 16, 24, 40)
    rng = np.random.RandomState(4)
    kp2d, ref, feats = _make_inputs(rng, dims=dims)
    model = PoseLifter(cfg=cfg, feature_dims=dims)
    args = (jnp.asarray(kp2d), jnp.asarray(ref), [jnp.asarray(f) for f in feats])
    params = model.init(jax.random.PRNGKey(0), *args)

    @jax.jit
    def loss_fn(p):
        out = model.apply(p, *args)
        return jnp.mean(out**2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    # gradient reaches the deformable offsets (through the sampler)
    gb = g["params"]["context_block_0"]["sampling_offsets"]["dense"]["kernel"]
    assert np.abs(np.asarray(gb)).sum() > 0


def test_pre_project_matches_reference_order():
    """sampler_pre_project=True (project-then-sample, deploy preset) must
    match the reference sample-then-project order on the same params:
    bilinear sampling is linear in channels and border-mode mixing weights
    sum to 1, so the difference is float associativity only. Levels with
    C_l <= head_dim (here head_dim=32 > dims[0]=8) keep the post order —
    every embed_proj param must exist in both modes."""
    import dataclasses

    rng = np.random.RandomState(3)
    dims = (8, 16, 24, 40)
    cfg = LifterConfig(
        embed_dim_ratio=32, depth=2, levels=4, num_heads=8,
        use_deformable=True,
    )
    kp2d, ref, feats = _make_inputs(rng, dims=dims)
    j = lambda a: jnp.asarray(a)  # noqa: E731
    jf = [j(f) for f in feats]

    model = PoseLifter(cfg=cfg, feature_dims=dims)
    params = model.init(jax.random.PRNGKey(0), j(kp2d), j(ref), jf)
    # randomize: zero-init offsets/weights would make sampling trivial
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = jax.tree.unflatten(
        treedef,
        [0.05 * jax.random.normal(k, l.shape, l.dtype)
         for k, l in zip(keys, leaves)],
    )

    base = np.asarray(model.apply(params, j(kp2d), j(ref), jf))
    mpre = PoseLifter(
        cfg=dataclasses.replace(cfg, sampler_pre_project=True),
        feature_dims=dims,
    )
    # identical param trees (no new/missing embed_proj params)
    pre_init = mpre.init(jax.random.PRNGKey(0), j(kp2d), j(ref), jf)
    paths = lambda t: {
        "/".join(map(str, p))
        for p, _ in jax.tree_util.tree_flatten_with_path(t)[0]
    }
    assert paths(pre_init) == paths(params)
    out = np.asarray(mpre.apply(params, j(kp2d), j(ref), jf))
    np.testing.assert_allclose(out, base, rtol=1e-5, atol=1e-6)

    # fused path (interpret mode): the projection runs IN-KERNEL
    mfused = PoseLifter(
        cfg=dataclasses.replace(
            cfg, sampler_pre_project=True, sampler="fused_interpret"
        ),
        feature_dims=dims,
    )
    outf = np.asarray(mfused.apply(params, j(kp2d), j(ref), jf))
    np.testing.assert_allclose(outf, base, rtol=1e-5, atol=1e-6)


def test_lifter_grads_with_pallas_sampler_backward():
    """Full lifter backward with the Pallas sampler bwd (interpret) must
    match the gather-VJP backward on every param grad — the training-path
    integration check for ops/deformable._multi_bwd_pallas."""
    from contextaware_poseformer_tpu.ops import deformable as D

    rng = np.random.RandomState(5)
    dims = (8, 16, 24, 40)
    cfg = LifterConfig(
        embed_dim_ratio=32, depth=1, levels=4, num_heads=8,
        use_deformable=True, sampler="fused_interpret",
    )
    kp2d, ref, feats = _make_inputs(rng, dims=dims)
    j = lambda a: jnp.asarray(a)  # noqa: E731
    jf = [j(f) for f in feats]
    model = PoseLifter(cfg=cfg, feature_dims=dims)
    params = model.init(jax.random.PRNGKey(0), j(kp2d), j(ref), jf)
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    params = jax.tree.unflatten(
        treedef,
        [0.05 * jax.random.normal(k, l.shape, l.dtype)
         for k, l in zip(keys, leaves)],
    )

    def loss(p):
        return jnp.sum(model.apply(p, j(kp2d), j(ref), jf) ** 2)

    impl = D._BWD_IMPL
    try:
        D._BWD_IMPL = "reference"
        gr = jax.grad(loss)(params)
        D._BWD_IMPL = "pallas"
        gp = jax.grad(loss)(params)
    finally:
        D._BWD_IMPL = impl
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)
