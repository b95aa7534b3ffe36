import numpy as np
import pytest

import jax
import jax.numpy as jnp

from contextaware_poseformer_tpu.ops import grid_sample
from contextaware_poseformer_tpu.ops.deformable import (
    sample_points,
    sample_points_fused,
)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
@pytest.mark.parametrize("shape", [(2, 16, 16, 32), (1, 8, 16, 128)])
def test_fused_matches_gather(padding_mode, shape):
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(*shape).astype(np.float32))
    pts = jnp.asarray(
        rng.uniform(-1.2, 1.2, (shape[0], 17, 16, 2)).astype(np.float32)
    )
    ref = grid_sample.grid_sample_points(feats, pts, padding_mode=padding_mode)
    fused = sample_points_fused(feats, pts, padding_mode, True, True)  # interpret
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_zero_contribution_out_of_bounds():
    feats = jnp.ones((1, 8, 8, 32), jnp.float32)
    pts = jnp.asarray([[[-3.0, -3.0], [3.0, 3.0], [0.0, 0.0]]], jnp.float32)
    out = sample_points_fused(feats, pts, "zeros", True, True)
    np.testing.assert_allclose(np.asarray(out[0, 0]), 0.0)
    np.testing.assert_allclose(np.asarray(out[0, 2]), 1.0, rtol=1e-6)


def test_fused_grad_matches_gather_grad():
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(1, 8, 8, 32).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, (1, 5, 2)).astype(np.float32))

    def loss_fused(f, p):
        return jnp.sum(sample_points_fused(f, p, "border", True, True) ** 2)

    def loss_gather(f, p):
        return jnp.sum(
            grid_sample.grid_sample_points(f, p, padding_mode="border") ** 2
        )

    gf = jax.grad(loss_fused, argnums=(0, 1))(feats, pts)
    gg = jax.grad(loss_gather, argnums=(0, 1))(feats, pts)
    for a, b in zip(gf, gg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_dispatcher():
    rng = np.random.RandomState(2)
    feats = jnp.asarray(rng.randn(1, 8, 8, 32).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-1, 1, (1, 5, 2)).astype(np.float32))
    a = sample_points(feats, pts, impl="gather")
    b = sample_points(feats, pts, impl="fused_interpret")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)
    with pytest.raises(ValueError):
        sample_points(feats, pts, impl="nope")


def test_fused_default_precision_close_to_gather():
    """precision='default' (single bf16 MXU pass) tracks the exact result
    within bf16 rounding — the deployment mode for bf16 backbones."""
    rng = np.random.RandomState(3)
    feats = jnp.asarray(rng.randn(2, 8, 8, 32).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 7, 2)).astype(np.float32))
    exact = sample_points(feats, pts, impl="gather")
    approx = sample_points(feats, pts, impl="fused_interpret",
                           precision="default")
    np.testing.assert_allclose(np.asarray(approx), np.asarray(exact),
                               rtol=0.03, atol=0.03)


@pytest.mark.parametrize("mode", ["zeros", "border"])
def test_fused_two_stage_path_matches_gather(mode):
    """Maps with h*w >= 1024 and c < 64 dispatch to the separable
    (row-matmul + column-blend) kernel; same math incl. out-of-bounds."""
    rng = np.random.RandomState(4)
    feats = jnp.asarray(rng.randn(2, 64, 48, 32).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-1.2, 1.2, (2, 9, 2)).astype(np.float32))
    exact = grid_sample.grid_sample_points(feats, pts, padding_mode=mode)
    fused = sample_points(feats, pts, padding_mode=mode,
                          impl="fused_interpret")
    np.testing.assert_allclose(np.asarray(fused), np.asarray(exact),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["zeros", "border"])
def test_multi_level_fused_matches_per_level(mode):
    """sample_points_levels (one kernel launch for all pyramid levels) must
    match per-level gathers exactly, including grads."""
    from contextaware_poseformer_tpu.ops.deformable import (
        sample_points_levels,
    )

    rng = np.random.RandomState(5)
    b, p = 2, 11
    dims = ((64, 48, 32), (32, 24, 64), (16, 12, 128), (8, 6, 256))
    feats = tuple(
        jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        for h, w, c in dims
    )
    pts = jnp.asarray(
        rng.uniform(-1.2, 1.2, (b, len(dims), p, 2)).astype(np.float32)
    )

    ref = sample_points_levels(feats, pts, padding_mode=mode, impl="gather")
    fused = sample_points_levels(feats, pts, padding_mode=mode,
                                 impl="fused_interpret")
    for a, c in zip(ref, fused):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)

    def loss(fn):
        return lambda fs, ps: sum(
            jnp.sum(o ** 2) for o in sample_points_levels(
                fs, ps, padding_mode=mode, impl=fn)
        )

    g_ref = jax.grad(loss("gather"), argnums=(0, 1))(feats, pts)
    g_fus = jax.grad(loss("fused_interpret"), argnums=(0, 1))(feats, pts)
    for a, c in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fus)):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("proj2", ["fold", "onestage"])
def test_two_stage_preproject_matches_gather(proj2, monkeypatch):
    """PREPROJECT_2STAGE extends in-kernel channel projection to SEPARABLE
    levels (round-4 lever, VERDICT r3 item 3): "fold" routes the projection
    through the W-axis reduction matmul, "onestage" projects the map in
    VMEM and drops to the one-stage body. Both must match gather-path
    project-before-sample exactly (border mode: mixing weights sum to 1,
    so the after-sampling bias add is exact), including grads through
    sample_project_points_multi's VJP."""
    from contextaware_poseformer_tpu.ops import deformable as D

    monkeypatch.setenv("CAPF_PREPROJECT_2STAGE", proj2)
    rng = np.random.RandomState(6)
    b, p, hd = 2, 11, 8
    dims = ((64, 48, 32), (32, 24, 64))  # separable level + one-stage level
    assert D.kernel_can_preproject(64, 48, 32, hd)
    feats = tuple(
        jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        for h, w, c in dims
    )
    pts = jnp.asarray(
        rng.uniform(-1.2, 1.2, (b, len(dims), p, 2)).astype(np.float32)
    )
    projs = tuple(
        jnp.asarray((rng.randn(c, hd) / np.sqrt(c)).astype(np.float32))
        for _, _, c in dims
    )
    biases = tuple(
        jnp.asarray(rng.randn(hd).astype(np.float32)) for _ in dims
    )

    from contextaware_poseformer_tpu.ops.deformable import (
        sample_points_levels,
    )

    kw = dict(padding_mode="border", projs=projs, biases=biases)
    ref = sample_points_levels(feats, pts, impl="gather", **kw)
    fused = sample_points_levels(feats, pts, impl="fused_interpret", **kw)
    for a, c in zip(ref, fused):
        assert c.shape[-1] == hd
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)

    def loss(fn):
        return lambda fs, ps, ws, bs: sum(
            jnp.sum(o ** 2) for o in sample_points_levels(
                fs, ps, padding_mode="border", impl=fn, projs=ws, biases=bs)
        )

    g_ref = jax.grad(loss("gather"), argnums=(0, 1, 2, 3))(
        feats, pts, projs, biases)
    g_fus = jax.grad(loss("fused_interpret"), argnums=(0, 1, 2, 3))(
        feats, pts, projs, biases)
    for a, c in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fus)):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_deformable_aggregate_matches_reference():
    """deformable_aggregate (fused sampling + per-level projection + weighted
    sample pooling) matches its jnp reference composition, forward and
    gradients. Not on the flagship path (measured slower there — see the op
    docstring / PERF.md) but kept as a tested alternative formulation."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from contextaware_poseformer_tpu.ops.deformable import (
        deformable_aggregate,
    )

    rng = np.random.RandomState(0)
    b, levels, p, nh, ns, hd = 2, 4, 17, 4, 4, 32
    shapes = [(8, 6, 32), (4, 3, 64), (2, 2, 128), (1, 1, 256)]
    feats = [
        jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        for h, w, c in shapes
    ]
    pts = jnp.asarray(
        rng.uniform(-1.2, 1.2, (b, levels, p, nh * ns, 2)).astype(np.float32)
    )
    wts = jax.nn.softmax(
        jnp.asarray(rng.randn(b, levels, p, nh, ns).astype(np.float32)), -1
    )
    projs = [
        jnp.asarray(rng.randn(c, hd).astype(np.float32) * 0.1)
        for _, _, c in shapes
    ]
    biases = [
        jnp.asarray(rng.randn(hd).astype(np.float32) * 0.1) for _ in shapes
    ]

    ref = deformable_aggregate(feats, pts, wts, projs, biases, impl="gather")
    fus = deformable_aggregate(
        feats, pts, wts, projs, biases, impl="fused_interpret"
    )
    assert ref.shape == fus.shape == (b, levels, p, nh * hd)
    scale = float(jnp.sqrt(jnp.mean(ref**2)))
    assert float(jnp.max(jnp.abs(ref - fus))) / scale < 1e-5

    def loss(impl):
        def fn(f0, pt, w, pr0):
            out = deformable_aggregate(
                [f0] + feats[1:], pt, w, [pr0] + projs[1:], biases, impl=impl
            )
            return jnp.sum(out**2)
        return fn

    gg = jax.grad(loss("gather"), argnums=(0, 1, 2, 3))(
        feats[0], pts, wts, projs[0]
    )
    gf = jax.grad(loss("fused_interpret"), argnums=(0, 1, 2, 3))(
        feats[0], pts, wts, projs[0]
    )
    for a, bb in zip(gg, gf):
        s = float(jnp.sqrt(jnp.mean(jnp.asarray(a) ** 2))) + 1e-12
        assert float(jnp.max(jnp.abs(a - bb))) / s < 1e-4


def test_vmem_level_groups_presets():
    """Grouping must split CPN's all-256-channel pyramid (measured 16.28 MB
    scoped-VMEM OOM as one launch) while keeping both HRNet pyramids and the
    ref-point call in a single launch."""
    from contextaware_poseformer_tpu.ops.deformable import _vmem_level_groups

    hr32 = ((64, 48, 32), (32, 24, 64), (16, 12, 128), (8, 6, 256))
    hr48 = ((64, 48, 48), (32, 24, 96), (16, 12, 192), (8, 6, 384))
    cpn = ((64, 48, 256), (32, 24, 256), (16, 12, 256), (8, 6, 256))
    assert _vmem_level_groups(hr32, 272, 2) == [(0, 4)]
    assert _vmem_level_groups(hr48, 272, 2) == [(0, 4)]
    assert _vmem_level_groups(cpn, 272, 2) == [(0, 1), (1, 4)]
    assert _vmem_level_groups(cpn, 24, 2) == [(0, 4)]  # ref points


def test_split_groups_match_single_launch():
    """Forcing one level per launch must be bit-identical to the single
    fused launch, and the custom-vjp backward must survive the split."""
    from contextaware_poseformer_tpu.ops import deformable as D

    rng = np.random.RandomState(0)
    shapes = ((16, 12, 8), (8, 6, 16), (4, 4, 32))
    feats = tuple(
        jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
        for h, w, c in shapes
    )
    pts = jnp.asarray(rng.uniform(-1, 1, (2, 3, 17, 16, 2)).astype(np.float32))
    kw = dict(padding_mode="border", impl="fused_interpret")
    single = D.sample_points_levels(feats, pts, **kw)
    budget = D._VMEM_GROUP_BUDGET
    try:
        D._VMEM_GROUP_BUDGET = 1
        split = D.sample_points_levels(feats, pts, **kw)
        g = jax.grad(
            lambda p: sum(
                jnp.sum(o) for o in D.sample_points_levels(feats, p, **kw)
            )
        )(pts)
    finally:
        D._VMEM_GROUP_BUDGET = budget
    for a, b in zip(single, split):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert g.shape == pts.shape and float(jnp.abs(g).sum()) > 0


@pytest.mark.parametrize("mode", ["border", "zeros"])
def test_pallas_backward_matches_reference_vjp(mode):
    """The Pallas training backward (_multi_bwd_pallas: dF = M^T @ g on the
    MXU + one-hot-difference coordinate grads) must match jax.vjp of the
    gather formulation for features AND points, both padding modes,
    including out-of-range points (clip-gradient masking)."""
    from contextaware_poseformer_tpu.ops import deformable as D

    rng = np.random.RandomState(7)
    shapes = ((16, 12, 8), (8, 6, 16), (4, 4, 32))
    feats = tuple(
        jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
        for h, w, c in shapes
    )
    pts = jnp.asarray(
        rng.uniform(-1.2, 1.2, (2, 3, 17, 16, 2)).astype(np.float32))

    def loss(fs, p):
        o = D.sample_points_levels(
            fs, p, padding_mode=mode, impl="fused_interpret")
        return sum(jnp.sum(jnp.sin(x)) for x in o)

    impl = D._BWD_IMPL
    try:
        D._BWD_IMPL = "reference"
        gr = jax.grad(loss, argnums=(0, 1))(feats, pts)
        D._BWD_IMPL = "pallas"
        gp = jax.grad(loss, argnums=(0, 1))(feats, pts)
    finally:
        D._BWD_IMPL = impl
    for a, b in zip(gr[0], gp[0]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gr[1]), np.asarray(gp[1]), rtol=1e-5, atol=1e-5)
