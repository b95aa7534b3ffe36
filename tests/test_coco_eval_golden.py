"""Hand-derived exact-value golden fixtures for the native OKS AP evaluator
(VERDICT r3 item 7).

pycocotools is not installable in this image, so the oracle is arithmetic:
each scenario is built so that every OKS value, match outcome, and PR curve
is derivable by hand, and the tests assert the EXACT AP/AR numbers (not
just orderings). The scenarios deliberately exercise the protocol's subtle
rules — per-joint sigma scaling, the greedy real-before-ignored matching
order, the unmatched-detection area-range ignore, crowd absorption via the
bbox-fallback OKS — so a deviation in any of them shifts a pinned value.

Derivation conventions: thresholds .50:.05:.95 (10), 101-point interpolated
precision, detection OKS displacement per joint d_i = c * 2*sigma_i *
sqrt(area) makes every joint's similarity term exp(-c^2/2), so the pair's
OKS is exactly that common value.
"""

from __future__ import annotations

import numpy as np
import pytest

from contextaware_poseformer_tpu.train.coco_eval import (
    NUM_JOINTS,
    OKS_SIGMAS,
    compute_oks,
    oks_ap,
)


def _kps(xs, ys, v=2):
    k = np.zeros((NUM_JOINTS, 3))
    k[:, 0] = xs
    k[:, 1] = ys
    k[:, 2] = v
    return k.reshape(-1).tolist()


def _gt(image_id, kps, area, bbox, iscrowd=0, num_keypoints=None):
    k = np.asarray(kps).reshape(NUM_JOINTS, 3)
    return {
        "image_id": image_id, "keypoints": kps, "area": area, "bbox": bbox,
        "iscrowd": iscrowd,
        "num_keypoints": (int((k[:, 2] > 0).sum())
                          if num_keypoints is None else num_keypoints),
    }


def _dt(image_id, kps, score):
    return {"image_id": image_id, "category_id": 1, "keypoints": kps,
            "score": score}


def _displaced(xs, area, target_oks):
    """x-offsets making every joint's OKS term equal target_oks exactly."""
    c = np.sqrt(-2.0 * np.log(target_oks))
    # compute_oks divides by (area + spacing); invert that exactly
    return np.asarray(xs) + c * 2 * OKS_SIGMAS * np.sqrt(
        area + np.spacing(1))


I = np.arange(NUM_JOINTS, dtype=np.float64)


def test_two_dets_two_gts_exact_ap_values():
    """GT A (medium, area 4096) hit exactly (OKS 1.0) by d1; GT B (large,
    area 16384) hit at OKS exactly 0.72 by d2. Hand-derived:

    - all:    thr <= .70: both TP -> precision 1 at every recall (5 thrs);
              thr >= .75: d2 is a FP after d1 -> 51/101 (5 thrs)
              AP = (5*1 + 5*51/101)/10;  AP50 = 1;  AP75 = 51/101; AR = .75
    - medium: only A counts; d2 matches ignored B at thr <= .70 and is
              range-ignored when unmatched at thr >= .75 (its keypoint
              extent is 'large') -> AP_medium = 1.0 exactly.  A wrong
              unmatched-detection rule turns the high thresholds into FP
              curves and breaks this value.
    - large:  d1 is absorbed by ignored A; d2 TP at thr <= .70, FP (extent
              in range) at thr >= .75 -> AP_large = 0.5
    """
    ax = 500 + 3 * I
    ay = 50 + 4 * I
    bx = 200 + 7.5 * I
    by = 100 + 8 * I
    area_a, area_b = 4096.0, 16384.0
    gts = [
        _gt(1, _kps(ax, ay), area_a, [500, 50, 48, 64]),
        _gt(1, _kps(bx, by), area_b, [200, 100, 120, 128]),
    ]
    d2x = _displaced(bx, area_b, 0.72)
    dts = [
        _dt(1, _kps(ax, ay), 0.9),
        _dt(1, _kps(d2x, by), 0.8),
    ]
    # preconditions of the derivation, asserted so the fixture can't rot:
    oks_d2_b = compute_oks(
        np.asarray(dts[1]["keypoints"]).reshape(-1, 3),
        np.asarray(gts[1]["keypoints"]).reshape(-1, 3), area_b)
    assert oks_d2_b == pytest.approx(0.72, abs=1e-12)
    d2_extent = (d2x.max() - d2x.min()) * (by.max() - by.min())
    assert 96.0**2 < d2_extent < 1e10  # 'large' extent
    assert 32.0**2 < 48 * 64 < 96.0**2  # d1 extent 'medium'

    res = oks_ap(dts, gts)
    ap75 = 51.0 / 101.0
    assert res["AP50"] == pytest.approx(1.0, abs=1e-12)
    assert res["AP75"] == pytest.approx(ap75, rel=1e-12)
    assert res["AP"] == pytest.approx((5 * 1.0 + 5 * ap75) / 10, rel=1e-12)
    assert res["AP_medium"] == pytest.approx(1.0, abs=1e-12)
    assert res["AP_large"] == pytest.approx(0.5, rel=1e-12)
    assert res["AR"] == pytest.approx(0.75, rel=1e-12)


def test_missed_gt_halves_recall():
    """Two labeled gts, one perfect detection: recall plateaus at 1/2, so
    every threshold's AP is exactly 51/101 and AR is exactly 0.5."""
    x1 = 100 + 3 * I
    x2 = 400 + 3 * I
    y = 50 + 4 * I
    gts = [
        _gt(1, _kps(x1, y), 4000.0, [100, 50, 48, 64]),
        _gt(1, _kps(x2, y), 4000.0, [400, 50, 48, 64]),
    ]
    dts = [_dt(1, _kps(x1, y), 0.9)]
    res = oks_ap(dts, gts)
    ap = 51.0 / 101.0
    assert res["AP"] == pytest.approx(ap, rel=1e-12)
    assert res["AP50"] == pytest.approx(ap, rel=1e-12)
    assert res["AP75"] == pytest.approx(ap, rel=1e-12)
    assert res["AR"] == pytest.approx(0.5, rel=1e-12)


def test_crowd_absorbs_high_scoring_detection():
    """A spurious high-scoring detection inside a crowd region must be
    ignored (bbox-fallback OKS match to the crowd gt), leaving a perfect
    PR curve: AP = 1.0 exactly. Counting it as a FP would give 0.5."""
    crowd_bbox = [100.0, 100.0, 50.0, 60.0]
    rx = 300 + 3 * I
    ry = 50 + 4 * I
    gts = [
        _gt(1, _kps(np.zeros(NUM_JOINTS), np.zeros(NUM_JOINTS), v=0),
            3000.0, crowd_bbox, iscrowd=1, num_keypoints=0),
        _gt(1, _kps(rx, ry), 4096.0, [300, 50, 48, 64]),
    ]
    inside_x = 110 + 2 * I  # well inside the (inflated) crowd bbox
    inside_y = 110 + 2 * I
    dts = [
        _dt(1, _kps(inside_x, inside_y), 0.95),  # higher score than the TP
        _dt(1, _kps(rx, ry), 0.9),
    ]
    # precondition: the crowd fallback OKS is exactly 1 inside the bbox
    assert compute_oks(
        np.asarray(dts[0]["keypoints"]).reshape(-1, 3),
        np.asarray(gts[0]["keypoints"]).reshape(-1, 3),
        3000.0, np.asarray(crowd_bbox)) == pytest.approx(1.0, abs=1e-12)
    res = oks_ap(dts, gts)
    assert res["AP"] == pytest.approx(1.0, abs=1e-12)
    assert res["AR"] == pytest.approx(1.0, abs=1e-12)


def test_unlabeled_gt_is_not_a_target():
    """A gt with num_keypoints == 0 (not crowd) is ignored: it neither
    counts in the denominator nor turns its detection into a TP."""
    ux = 100 + 3 * I
    uy = 100 + 4 * I
    rx = 300 + 3 * I
    gts = [
        _gt(1, _kps(ux, uy, v=0), 4096.0, [100, 100, 48, 64],
            num_keypoints=0),
        _gt(1, _kps(rx, uy), 4096.0, [300, 100, 48, 64]),
    ]
    dts = [_dt(1, _kps(rx, uy), 0.9)]
    res = oks_ap(dts, gts)
    assert res["AP"] == pytest.approx(1.0, abs=1e-12)
    assert res["AR"] == pytest.approx(1.0, abs=1e-12)
