import numpy as np
import pytest

import jax.numpy as jnp

from contextaware_poseformer_tpu.ops import grid_sample_points

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_sample_points(feats_nhwc, pts, padding_mode, align_corners):
    """Golden values via torch grid_sample (NCHW, grid (N,1,P,2))."""
    t_feats = torch.from_numpy(np.transpose(feats_nhwc, (0, 3, 1, 2)))
    t_grid = torch.from_numpy(pts[:, None])  # (N,1,P,2)
    out = F.grid_sample(
        t_feats, t_grid, mode="bilinear",
        padding_mode=padding_mode, align_corners=align_corners,
    )  # (N,C,1,P)
    return out[:, :, 0].permute(0, 2, 1).numpy()  # (N,P,C)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
@pytest.mark.parametrize("align_corners", [True, False])
def test_matches_torch_random(padding_mode, align_corners):
    rng = np.random.RandomState(0)
    feats = rng.randn(3, 16, 12, 5).astype(np.float32)
    # include far out-of-range points, exact corners, exact pixel centers
    pts = np.concatenate(
        [
            rng.uniform(-1.3, 1.3, size=(3, 40, 2)),
            np.tile(np.array([[[-1.0, -1.0], [1.0, 1.0], [0.0, 0.0], [-2.5, 0.7]]]), (3, 1, 1)),
        ],
        axis=1,
    ).astype(np.float32)

    golden = _torch_sample_points(feats, pts, padding_mode, align_corners)
    ours = np.asarray(
        grid_sample_points(
            jnp.asarray(feats), jnp.asarray(pts),
            padding_mode=padding_mode, align_corners=align_corners,
        )
    )
    np.testing.assert_allclose(ours, golden, rtol=1e-5, atol=1e-5)


def test_reference_point_shapes_and_batch_dims():
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(2, 64, 48, 32).astype(np.float32))
    # lifter-style (b, 17, 2) reference points
    ref = jnp.asarray(rng.uniform(-1, 1, size=(2, 17, 2)).astype(np.float32))
    out = grid_sample_points(feats, ref)
    assert out.shape == (2, 17, 32)
    # deformable-style (b, 17, 16, 2) sample positions
    pos = jnp.asarray(rng.uniform(-1.2, 1.2, size=(2, 17, 16, 2)).astype(np.float32))
    out = grid_sample_points(feats, pos, padding_mode="border")
    assert out.shape == (2, 17, 16, 32)


def test_grad_flows_through_points():
    import jax

    rng = np.random.RandomState(2)
    feats = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, size=(1, 5, 2)).astype(np.float32))

    def loss(p):
        return grid_sample_points(feats, p, padding_mode="border").sum()

    g = jax.grad(loss)(pts)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
