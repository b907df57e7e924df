"""KITTI-protocol (VoD) AP_R40 evaluation tests.

Hand-checkable cases pin the official algorithm's transcription
(kitti_official_evaluate.py).  Note a property of the official protocol:
AP_R40 fills one of 41 recall sample points per emitted threshold, so
with fewer than ~41 ground truths even perfect predictions score below
100 — tests use enough GT to saturate the grid where 100 is expected.
"""

import numpy as np
import pytest

from rcbevdet_tpu.evaluation.kitti_metrics import (
    VOD_CORRIDOR,
    evaluate_kitti,
    eval_class,
    get_thresholds,
)


def _box(x, y, z=0.0, dx=4.0, dy=2.0, dz=1.5, yaw=0.0):
    return [x, y, z, dx, dy, dz, yaw, 0.0, 0.0]


def _grid_boxes(n, x0=0.0, y0=0.0):
    return np.array(
        [_box(x0 + 8 * (i % 10), y0 + 8 * (i // 10)) for i in range(n)]
    )


def test_perfect_predictions_score_100():
    n = 60
    boxes = _grid_boxes(n)
    gt = {"a": (boxes, np.zeros(n, int))}
    preds = {
        "a": (boxes.copy(), np.linspace(0.99, 0.5, n), np.zeros(n, int))
    }
    m = evaluate_kitti(preds, gt, classes=("Car",),
                      iou_thresholds={"Car": 0.5})
    assert m["AP_BEV_R40_Car"] == pytest.approx(100.0)
    assert m["AP_3D_R40_Car"] == pytest.approx(100.0)
    assert m["mAP_BEV_R40"] == pytest.approx(100.0)


def test_no_predictions_score_0():
    gt = {"a": (np.array([_box(0, 0)]), np.array([0]))}
    preds = {"a": (np.zeros((0, 9)), np.zeros(0), np.zeros(0, int))}
    m = evaluate_kitti(preds, gt, classes=("Car",),
                      iou_thresholds={"Car": 0.5})
    assert m["AP_BEV_R40_Car"] == 0.0


def test_threshold_grid_official_semantics():
    """get_thresholds walks the recall axis in 1/40 steps (transcription
    of kitti_official_evaluate.py:9-29): full recall over >=41 GT fills
    the whole grid; one TP over 2 GT emits a single threshold."""
    assert len(get_thresholds([0.9], num_gt=2)) == 1
    full = get_thresholds(np.linspace(0.99, 0.5, 60), num_gt=60)
    assert len(full) == 41


def test_half_recall_with_fp_closed_form():
    """60 GT, 30 exact matches (distinct scores) + one far low-score FP.

    Thresholds cover recall up to 0.5 -> 21 sample points (0..20); the FP
    scores below every threshold, so precision is 1.0 at each emitted
    point.  AP_R40 = 20/40 * 100 (point 0 excluded)."""
    n = 60
    boxes = _grid_boxes(n)
    gt = {"a": (boxes, np.zeros(n, int))}
    dboxes = np.concatenate([boxes[:30], [_box(500, 500)]])
    scores = np.concatenate([np.linspace(0.99, 0.6, 30), [0.1]])
    preds = {"a": (dboxes, scores, np.zeros(31, int))}
    r = eval_class(preds, gt, 0, 0.5, metric="bev")
    ths = get_thresholds(np.linspace(0.99, 0.6, 30), num_gt=n)
    assert len(ths) == 21
    assert r["ap_r40"] == pytest.approx(20 / 40 * 100.0)


def test_fp_lowers_precision():
    """An FP scoring above every TP drags each precision point down."""
    n = 60
    boxes = _grid_boxes(n)
    gt = {"a": (boxes, np.zeros(n, int))}
    dboxes = np.concatenate([[_box(500, 500)], boxes])
    scores = np.concatenate([[0.999], np.linspace(0.99, 0.5, n)])
    preds = {"a": (dboxes, scores, np.zeros(n + 1, int))}
    r = eval_class(preds, gt, 0, 0.5, metric="bev")
    assert 0.0 < r["ap_r40"] < 100.0


def test_roi_filter_corridor():
    """GT outside the driving corridor is excluded entirely."""
    inside = np.array([_box(0.5 * (i % 8) - 2, 3 + 0.5 * (i // 8),
                            dx=0.4, dy=0.4) for i in range(45)])
    outside = np.array([_box(30, 30), _box(-30, 30)])
    gt = {"a": (np.concatenate([inside, outside]), np.zeros(47, int))}
    preds = {
        "a": (inside.copy(), np.linspace(0.99, 0.5, 45), np.zeros(45, int))
    }
    m_roi = evaluate_kitti(preds, gt, classes=("Car",),
                          iou_thresholds={"Car": 0.5}, roi=VOD_CORRIDOR)
    m_all = evaluate_kitti(preds, gt, classes=("Car",),
                          iou_thresholds={"Car": 0.5})
    assert m_roi["AP_BEV_R40_Car"] == pytest.approx(100.0)
    assert m_all["AP_BEV_R40_Car"] < m_roi["AP_BEV_R40_Car"]


def test_3d_iou_z_overlap():
    """3D metric penalizes vertical misalignment that BEV ignores."""
    n = 60
    boxes = _grid_boxes(n)
    gt = {"a": (boxes, np.zeros(n, int))}
    shifted = boxes.copy()
    shifted[:, 2] += 1.4  # dz=1.5 -> sliver of z overlap
    preds = {
        "a": (shifted, np.linspace(0.99, 0.5, n), np.zeros(n, int))
    }
    m = evaluate_kitti(preds, gt, classes=("Car",),
                      iou_thresholds={"Car": 0.5})
    assert m["AP_BEV_R40_Car"] == pytest.approx(100.0)
    assert m["AP_3D_R40_Car"] == 0.0
