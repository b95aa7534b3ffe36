import numpy as np
import jax
import jax.numpy as jnp

from contextaware_poseformer_tpu.data import augment
from contextaware_poseformer_tpu.utils import skeleton


def _batch(rng, b=2, h=16, w=12):
    return augment.Batch(
        images=jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32)),
        keypoints_3d=jnp.asarray(rng.randn(b, 17, 3).astype(np.float32)),
        keypoints_2d=jnp.asarray(rng.uniform(-1, 1, (b, 17, 2)).astype(np.float32)),
        keypoints_2d_crop=jnp.asarray(
            rng.uniform(0, 12, (b, 17, 2)).astype(np.float32)
        ),
    )


def test_normalize_images_hrnet_and_cpn():
    img = np.zeros((1, 2, 2, 3), np.uint8)
    img[..., 0] = 255  # BGR: blue channel saturated
    out = np.asarray(augment.normalize_images(jnp.asarray(img), "hrnet"))
    # after BGR->RGB, channel 2 (blue) is 1.0 before standardization
    exp_blue = (1.0 - 0.406) / 0.225
    exp_red = (0.0 - 0.485) / 0.229
    np.testing.assert_allclose(out[0, 0, 0, 2], exp_blue, rtol=1e-5)
    np.testing.assert_allclose(out[0, 0, 0, 0], exp_red, rtol=1e-5)

    out = np.asarray(augment.normalize_images(jnp.asarray(img), "cpn"))
    np.testing.assert_allclose(
        out[0, 0, 0, 2], 1.0 - 102.9801 / 255.0, rtol=1e-5
    )


def test_root_center():
    kp = jnp.asarray(np.random.RandomState(0).randn(2, 17, 3).astype(np.float32))
    out = np.asarray(augment.root_center(kp, 0))
    assert np.all(out[:, 0] == 0)
    np.testing.assert_allclose(
        out[:, 1:], np.asarray(kp)[:, 1:] - np.asarray(kp)[:, :1], rtol=1e-6
    )


def test_flip_is_involution_on_inputs():
    rng = np.random.RandomState(1)
    b = _batch(rng)
    perm = skeleton.H36M_FLIP_PERM
    w = 12
    f = augment.flip_batch(
        b.images, b.keypoints_3d, b.keypoints_2d, b.keypoints_2d_crop,
        jnp.asarray(perm), w,
    )
    ff = augment.flip_batch(*f, jnp.asarray(perm), w)
    for orig, back in zip(
        (b.images, b.keypoints_3d, b.keypoints_2d, b.keypoints_2d_crop), ff
    ):
        np.testing.assert_allclose(np.asarray(back), np.asarray(orig), atol=1e-6)


def test_train_augment_branches():
    rng = np.random.RandomState(2)
    b = _batch(rng)
    perm = skeleton.H36M_FLIP_PERM
    # find keys that flip and keys that don't
    flipped = no_flip = None
    for seed in range(20):
        out = augment.train_augment(jax.random.PRNGKey(seed), b, perm, 12)
        if np.allclose(np.asarray(out.images), np.asarray(b.images)):
            no_flip = out
        else:
            flipped = out
        if flipped is not None and no_flip is not None:
            break
    assert flipped is not None and no_flip is not None
    # flipped branch equals deterministic flip
    det = augment.flip_batch(
        b.images, b.keypoints_3d, b.keypoints_2d, b.keypoints_2d_crop,
        jnp.asarray(perm), 12,
    )
    np.testing.assert_allclose(np.asarray(flipped.images), np.asarray(det[0]))
    np.testing.assert_allclose(np.asarray(flipped.keypoints_3d), np.asarray(det[1]))


def test_flip_test_merge_consistency():
    """A model that is exactly flip-equivariant must yield pred == merged."""
    rng = np.random.RandomState(3)
    b = _batch(rng)
    perm = skeleton.H36M_FLIP_PERM

    def fake_model(batch: augment.Batch):
        # depends only on 2D keypoints, equivariantly: y = kp2d padded to 3D
        out = jnp.concatenate(
            [batch.keypoints_2d, jnp.zeros_like(batch.keypoints_2d[..., :1])],
            axis=-1,
        )
        return out

    pred = fake_model(b)
    flipped_inputs = augment.flip_test_inputs(b, perm, 12)
    pred_flip = fake_model(flipped_inputs)
    merged = augment.flip_test_merge(pred, pred_flip, perm)
    np.testing.assert_allclose(np.asarray(merged), np.asarray(pred), atol=1e-6)
