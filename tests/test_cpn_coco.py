"""CPN COCO detector harness tests (models/cpn_coco.py, data/coco.py,
train/{train_coco,coco_eval}.py) — the runnable equivalent of the
reference's unrunnable mvn/models/cpn/{train,test}.py."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from contextaware_poseformer_tpu.data import coco as coco_data
from contextaware_poseformer_tpu.models.convert import convert_cpn_coco
from contextaware_poseformer_tpu.models.cpn_coco import BatchNormLive, CPNCoco
from contextaware_poseformer_tpu.train import coco_eval, losses
from contextaware_poseformer_tpu.train import train_coco

torch = pytest.importorskip("torch")
import torch_oracle  # noqa: E402

TINY = train_coco.tiny_backbone()


def _tiny_variables(train=False):
    model = CPNCoco(cfg=TINY, train=train)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )
    return model, shapes


@pytest.mark.slow
def test_cpn_coco_matches_torch_oracle():
    """Eval-mode forward parity (heads included) through the converter."""
    model, shapes = _tiny_variables(train=False)
    rng = np.random.RandomState(0)
    sd = torch_oracle.random_state_dict_for_coco(shapes, rng)
    variables = convert_cpn_coco(sd, shapes)
    variables = jax.tree.map(jnp.asarray, variables)

    x = rng.randn(2, 64, 64, 3).astype(np.float32)
    global_outs, refine = model.apply(variables, jnp.asarray(x))
    g_gold, r_gold = torch_oracle.cpn_coco_forward(sd, np.transpose(x, (0, 3, 1, 2)))

    assert len(global_outs) == 4
    for lvl, (a, b) in enumerate(zip(global_outs, g_gold)):
        a, b = np.asarray(a), np.transpose(b, (0, 2, 3, 1))
        assert a.shape == b.shape == (2, 16, 16, 17)
        scale = np.sqrt(np.mean(b**2)) + 1e-8
        assert np.abs(a - b).max() / scale < 1e-4, lvl
    r = np.asarray(refine)
    r_gold = np.transpose(r_gold, (0, 2, 3, 1))
    scale = np.sqrt(np.mean(r_gold**2)) + 1e-8
    assert np.abs(r - r_gold).max() / scale < 1e-4


def test_convert_cpn_coco_strict_leftovers():
    _, shapes = _tiny_variables()
    rng = np.random.RandomState(1)
    sd = torch_oracle.random_state_dict_for_coco(shapes, rng)
    sd["stray.weight"] = np.zeros(3, np.float32)
    with pytest.raises(ValueError, match="unconsumed"):
        convert_cpn_coco(sd, shapes)


def test_batchnorm_live_matches_torch_training():
    """Train-mode forward + running-stat update vs torch BatchNorm2d
    (biased batch var for normalization, unbiased for the running update)."""
    rng = np.random.RandomState(0)
    x = rng.randn(4, 5, 6, 3).astype(np.float32) * 2.0 + 1.0

    mod = BatchNormLive(3, train=True)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables["params"] = {
        "scale": jnp.asarray([1.5, 0.5, 1.0]),
        "bias": jnp.asarray([0.1, -0.2, 0.0]),
    }
    y, mut = mod.apply(variables, jnp.asarray(x), mutable=["batch_stats"])

    tm = torch.nn.BatchNorm2d(3, eps=1e-5, momentum=0.1)
    tm.weight.data = torch.tensor([1.5, 0.5, 1.0])
    tm.bias.data = torch.tensor([0.1, -0.2, 0.0])
    tm.train()
    ty = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

    np.testing.assert_allclose(
        np.asarray(y), np.transpose(ty.detach().numpy(), (0, 2, 3, 1)),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["mean"]),
        tm.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["var"]),
        tm.running_var.numpy(), rtol=1e-5, atol=1e-6)


def test_coco_losses_match_torch_reference():
    """coco_global_loss / coco_refine_ohkm_loss vs a direct torch
    restatement of cpn/train.py:83-128."""
    rng = np.random.RandomState(0)
    n, oh, ow, k = 3, 8, 6, 17
    outs = [rng.randn(n, oh, ow, k).astype(np.float32) for _ in range(4)]
    tgts = [rng.rand(n, oh, ow, k).astype(np.float32) for _ in range(4)]
    refine = rng.randn(n, oh, ow, k).astype(np.float32)
    valid = rng.randint(0, 3, (n, k)).astype(np.float32)

    ours_g = float(losses.coco_global_loss(
        [jnp.asarray(o) for o in outs], [jnp.asarray(t) for t in tgts],
        jnp.asarray(valid)))
    ours_r = float(losses.coco_refine_ohkm_loss(
        jnp.asarray(refine), jnp.asarray(tgts[3]), jnp.asarray(valid)))

    tv = torch.from_numpy(valid)
    g_gold = 0.0
    for o, t in zip(outs, tgts):
        to = torch.from_numpy(np.transpose(o, (0, 3, 1, 2)))
        tt = torch.from_numpy(np.transpose(t, (0, 3, 1, 2)))
        label = tt * (tv > 1.1).float().view(n, k, 1, 1)
        g_gold += torch.nn.functional.mse_loss(to, label).item() / 2.0

    tr = torch.from_numpy(np.transpose(refine, (0, 3, 1, 2)))
    tt7 = torch.from_numpy(np.transpose(tgts[3], (0, 3, 1, 2)))
    rl = ((tr - tt7) ** 2).mean(dim=3).mean(dim=2)
    rl = rl * (tv > 0.1).float()
    ohkm = 0.0
    for i in range(n):
        top, _ = torch.topk(rl[i], k=8, dim=0)
        ohkm += top.sum().item() / 8
    ohkm /= n

    assert abs(ours_g - g_gold) < 1e-5 * max(1.0, abs(g_gold))
    assert abs(ours_r - ohkm) < 1e-5 * max(1.0, abs(ohkm))


def test_decode_recovers_planted_peaks():
    """A gaussian bump planted at known heatmap coords decodes to the
    matching original-image pixel through the crop-window map."""
    n, (oh, ow) = 1, coco_data.OUTPUT_SHAPE
    maps = np.zeros((n, oh, ow, 17), np.float32)
    planted = []
    rng = np.random.RandomState(0)
    for j in range(17):
        x, y = int(rng.randint(6, ow - 6)), int(rng.randint(6, oh - 6))
        coco_data.place_gaussian(maps[0, :, :, j], x, y, 7)
        planted.append((x, y))
    details = np.array([[30.0, 40.0, 30.0 + 192.0, 40.0 + 256.0]])
    res = coco_eval.decode_batch(maps, details, np.array([0.9]), np.array([7]))
    assert len(res) == 1 and res[0]["image_id"] == 7
    kps = np.asarray(res[0]["keypoints"]).reshape(17, 3)
    for j, (x, y) in enumerate(planted):
        # crop is identity-scale here: heatmap pixel -> 4*x + 2 + offset
        assert abs(kps[j, 0] - (30.0 + 4 * x + 2)) < 3.0
        assert abs(kps[j, 1] - (40.0 + 4 * y + 2)) < 3.0
    assert 0.9 * 0.5 < res[0]["score"] < 0.9 * 1.6


def test_flip_merge_symmetry():
    maps = np.random.RandomState(0).rand(2, 8, 6, 17).astype(np.float32)
    merged = coco_eval.flip_merge(maps, maps[:, :, ::-1, :].copy())
    # flipping the flipped input back must reproduce the direct maps for
    # symmetric-joint-swapped channels; joint 0 (nose) is its own pair
    np.testing.assert_allclose(merged[..., 0], maps[..., 0], rtol=1e-6)
    a, b = coco_data.SYMMETRY[0]
    np.testing.assert_allclose(
        merged[..., a], (maps[..., a] + maps[..., b]) / 2, rtol=1e-6)


def test_oks_ap_perfect_then_degraded():
    rng = np.random.RandomState(0)
    gts, results = [], []
    for img in range(6):
        kps = np.zeros((17, 3))
        kps[:, 0] = rng.uniform(100, 300, 17)
        kps[:, 1] = rng.uniform(100, 300, 17)
        kps[:, 2] = 2
        gts.append({
            "image_id": img, "keypoints": kps.reshape(-1).tolist(),
            "area": 200.0 * 200.0, "num_keypoints": 17, "bbox": [100, 100, 200, 200],
        })
        results.append({
            "image_id": img, "category_id": 1,
            "keypoints": kps.reshape(-1).tolist(), "score": 0.9,
        })
    perfect = coco_eval.oks_ap(results, gts)
    assert perfect["AP"] > 0.99 and perfect["AP50"] > 0.99

    noisy = []
    for r in results:
        kps = np.asarray(r["keypoints"]).reshape(17, 3)
        kps[:, :2] += rng.randn(17, 2) * 60.0
        noisy.append({**r, "keypoints": kps.reshape(-1).tolist()})
    degraded = coco_eval.oks_ap(noisy, gts)
    assert degraded["AP"] < perfect["AP"] - 0.2


def _write_tiny_coco(tmp_path, n_imgs=2):
    cv2 = coco_data._cv2()
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir, exist_ok=True)
    images, anns = [], []
    rng = np.random.RandomState(0)
    for i in range(n_imgs):
        w, h = 96, 80
        arr = rng.randint(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(str(img_dir / f"{i:012d}.jpg"), arr)
        images.append({"id": i, "file_name": f"{i:012d}.jpg",
                       "width": w, "height": h})
        kps = np.zeros((17, 3))
        kps[:, 0] = rng.uniform(25, 70, 17)
        kps[:, 1] = rng.uniform(20, 60, 17)
        kps[:, 2] = rng.randint(1, 3, 17)
        anns.append({
            "id": 100 + i, "image_id": i, "category_id": 1,
            "keypoints": kps.reshape(-1).tolist(),
            "num_keypoints": 17, "iscrowd": 0,
            "bbox": [20.0, 15.0, 55.0, 50.0], "area": 55.0 * 50.0,
        })
    ann_path = tmp_path / "ann.json"
    with open(ann_path, "w") as f:
        json.dump({"images": images, "annotations": anns}, f)
    return str(ann_path), str(img_dir)


def test_coco_dataset_train_batches(tmp_path):
    ann, img_dir = _write_tiny_coco(tmp_path)
    ds = coco_data.CocoKeypointDataset.from_annotations(ann, img_dir)
    assert len(ds) == 2
    rng = np.random.RandomState(0)
    (batch,) = list(ds.batches(2, rng=rng, augment=True))
    assert batch["image"].shape == (2, 256, 192, 3)
    assert len(batch["targets"]) == 4
    for t in batch["targets"]:
        assert t.shape == (2, 64, 48, 17)
        assert 0.0 <= t.max() <= 255.0 + 1e-3
    # gk15 spreads wider than gk7: more nonzero support
    assert (batch["targets"][0] > 0).sum() > (batch["targets"][3] > 0).sum()
    assert batch["valid"].shape == (2, 17)
    assert set(np.unique(batch["valid"])) <= {0.0, 1.0, 2.0}


def test_coco_dataset_eval_and_driver_eval(tmp_path):
    """End-to-end eval through the driver on random tiny weights: detections
    json -> crops -> forward -> decode -> result.json -> OKS AP summary."""
    ann, img_dir = _write_tiny_coco(tmp_path)
    dets = [{"image_id": i, "bbox": [20.0, 15.0, 55.0, 50.0], "score": 0.8,
             "category_id": 1} for i in range(2)]
    det_path = tmp_path / "dets.json"
    with open(det_path, "w") as f:
        json.dump(dets, f)

    summary = train_coco.main([
        "--eval", "--ann", ann, "--dets", str(det_path),
        "--image-dir", img_dir, "--tiny", "--batch", "2",
        "--result", str(tmp_path / "out"),
    ])
    assert set(summary) == {"AP", "AP50", "AP75", "AP_medium", "AP_large", "AR"}
    with open(tmp_path / "out" / "result.json") as f:
        results = json.load(f)
    assert len(results) == 2
    assert all(len(r["keypoints"]) == 51 for r in results)


@pytest.mark.slow
def test_train_coco_synthetic_step():
    out = train_coco.main([
        "--synthetic", "--tiny", "--epochs", "1", "--steps-per-epoch", "2",
        "--batch", "2",
    ])
    assert np.isfinite(out["history"][0])
    # live BN: running stats moved off their init values
    stats = jax.tree.leaves(out["batch_stats"])
    assert any(float(jnp.abs(s).sum()) > 0 for s in stats)
