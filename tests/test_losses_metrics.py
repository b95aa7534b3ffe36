import numpy as np
import jax.numpy as jnp

from contextaware_poseformer_tpu.train import losses, metrics
from contextaware_poseformer_tpu.utils import skeleton


def test_mpjpe_basic():
    gt = np.zeros((4, 17, 3), np.float32)
    pred = gt + np.array([3.0, 4.0, 0.0], np.float32)  # each joint off by 5
    assert float(losses.mpjpe(jnp.asarray(pred), jnp.asarray(gt))) == 5.0


def test_p_mpjpe_invariance():
    rng = np.random.RandomState(0)
    gt = rng.randn(8, 17, 3).astype(np.float64)
    # random rigid+scale transform of gt must align to ~0 error
    theta = 0.7
    rot = np.array(
        [[np.cos(theta), -np.sin(theta), 0],
         [np.sin(theta), np.cos(theta), 0],
         [0, 0, 1]]
    )
    pred = 1.7 * gt @ rot.T + np.array([0.3, -0.2, 0.9])
    assert losses.p_mpjpe(pred, gt) < 1e-9
    # and a noisy version scores below raw MPJPE
    noisy = pred + 0.05 * rng.randn(*pred.shape)
    raw = float(np.mean(np.linalg.norm(noisy - gt, axis=-1)))
    assert losses.p_mpjpe(noisy, gt) < raw


def test_n_mpjpe_scale_invariance():
    rng = np.random.RandomState(1)
    gt = rng.randn(2, 1, 17, 3).astype(np.float32)
    pred = 3.0 * gt
    assert float(losses.n_mpjpe(jnp.asarray(pred), jnp.asarray(gt))) < 1e-5


def test_mpjve_matches_manual_diff():
    rng = np.random.RandomState(2)
    gt = rng.randn(5, 17, 3)
    pred = rng.randn(5, 17, 3)
    v = losses.mpjve(pred, gt)
    manual = np.mean(
        np.linalg.norm(np.diff(pred, axis=0) - np.diff(gt, axis=0), axis=-1)
    )
    assert abs(v - manual) < 1e-9


def test_masked_losses():
    pred = jnp.ones((2, 1, 17, 3))
    gt = jnp.zeros((2, 1, 17, 3))
    validity = jnp.zeros((2, 1, 17, 1)).at[0].set(1.0)
    assert abs(float(losses.keypoints_mse(pred, gt, validity)) - 1.0) < 1e-6
    assert abs(float(losses.keypoints_mae(pred, gt, validity)) - 1.0) < 1e-6
    # smooth clip: big error compressed below plain MSE
    pred_big = 100.0 * pred
    plain = float(losses.keypoints_mse(pred_big, gt))
    smooth = float(losses.keypoints_mse_smooth(pred_big, gt, threshold=400.0))
    assert smooth < plain


def test_h36m_evaluate_trial_merging_and_summary():
    n_actions = len(skeleton.H36M_ACTION_NAMES)
    per = 4
    n = n_actions * per
    gt = np.random.RandomState(4).randn(n, 17, 3).astype(np.float32) * 0.1
    pred = gt.copy()
    action_idx = np.repeat(np.arange(n_actions), per)
    # give Directions-1 error 0.010 (meters), Directions-2 error 0.030
    pred[action_idx == 0] += np.array([0.010, 0, 0], np.float32)
    pred[action_idx == 1] += np.array([0.030, 0, 0], np.float32)

    scores = metrics.h36m_evaluate(gt, pred, action_idx)
    assert "Directions" in scores and "Directions-1" not in scores
    # frame-weighted merge of equal-sized trials = 20mm
    assert abs(scores["Directions"]["MPJPE"] * 1000 - 20.0) < 1e-4
    summary = metrics.h36m_summary(scores)
    assert abs(summary["p1_mm"] - 20.0 / 15) < 1e-4  # 15 merged actions


def test_pck_auc_semantics():
    # all-zero errors: perfect scores
    e = np.zeros((10, 17))
    out = metrics.pck_auc(e)
    assert out["pck"] == 100.0
    # AUC excludes t=0 (strict <): 30/31 thresholds pass
    assert abs(out["auc"] - 100.0 * 30 / 31) < 1e-6
    # errors exactly 150 fail the strict < at every threshold
    out = metrics.pck_auc(np.full((10, 17), 150.0))
    assert out["pck"] == 0.0 and out["auc"] == 0.0
    # 149mm: passes PCK@150 only
    out = metrics.pck_auc(np.full((10, 17), 149.0))
    assert out["pck"] == 100.0
    assert abs(out["auc"] - 100.0 / 31) < 1e-6


def test_mpi3dhp_scene_weighting():
    rng = np.random.RandomState(3)
    seq_errors = {
        s: np.abs(rng.randn(nf, 17)) * 100
        for s, nf in [("TS1", 20), ("TS2", 10), ("TS3", 8), ("TS4", 8),
                      ("TS5", 8), ("TS6", 8)]
    }
    res = metrics.mpi3dhp_evaluate(seq_errors)
    assert set(skeleton.MPI3DHP_TEST_SEQUENCES) <= set(res)
    # scene weighting uses the documented frame counts, not actual lengths
    w1, w2 = 603, 540
    exp = (res["TS1"]["pck"] * w1 + res["TS2"]["pck"] * w2) / (w1 + w2)
    assert abs(res["studio_green_screen"]["pck"] - exp) < 1e-9
    assert "All" in res and res["All"]["mpjpe"] > 0
