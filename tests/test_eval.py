"""Self-contained nuScenes evaluator sanity checks."""

import numpy as np

from rcbevdet_tpu.evaluation.nuscenes_metrics import (
    DetectionEvalConfig,
    evaluate_detections,
)
from rcbevdet_tpu.evaluation.format import format_nuscenes_results


def _box(x, y, yaw=0.0, dims=(2.0, 4.0, 1.5), vel=(0.0, 0.0), z=0.0):
    return np.array([x, y, z, *dims, yaw, *vel], np.float32)


def test_perfect_predictions_max_score():
    gts, preds = {}, {}
    for s in range(4):
        tok = f"s{s}"
        boxes = np.stack([_box(5 + s, 1), _box(-8, 3 + s)])
        labels = np.array([0, 8])  # car, pedestrian
        gts[tok] = (boxes, labels)
        preds[tok] = (boxes.copy(), np.array([0.9, 0.8]), labels.copy())
    m = evaluate_detections(preds, gts)
    assert m["mAP"] > 0.95
    assert m["NDS"] > 0.85  # mAAE excluded -> contributes 0
    assert m["mATE"] < 1e-6
    assert m["mASE"] < 1e-6
    assert m["mAOE"] < 1e-6


def test_missed_and_false_positives_reduce_ap():
    gts = {"a": (np.stack([_box(0, 0), _box(10, 10)]), np.array([0, 0]))}
    # one perfect, one far-away FP
    preds = {
        "a": (
            np.stack([_box(0, 0), _box(30, -30)]),
            np.array([0.9, 0.8]),
            np.array([0, 0]),
        )
    }
    m = evaluate_detections(preds, gts)
    assert 0.0 < m["mAP"] < 0.6


def test_translation_error_measured():
    gts = {"a": (np.stack([_box(0, 0)]), np.array([0]))}
    preds = {"a": (np.stack([_box(1.0, 0)]), np.array([0.9]), np.array([0]))}
    m = evaluate_detections(preds, gts)
    np.testing.assert_allclose(m["mATE"], 1.0, rtol=1e-5)
    # matched at 2m and 4m thresholds only -> AP = mean(0, 0, ap, ap)
    assert 0.3 < m["mAP"] < 0.6


def test_orientation_period_barrier():
    gts = {"a": (np.stack([_box(0, 0, yaw=0.0)]), np.array([5]))}  # barrier
    preds = {
        "a": (np.stack([_box(0, 0, yaw=np.pi)]), np.array([0.9]), np.array([5]))
    }
    m = evaluate_detections(preds, gts)
    np.testing.assert_allclose(m["mAOE"], 0.0, atol=1e-6)  # period pi


def test_format_results_global_frame():
    from rcbevdet_tpu.data.synthetic import synthetic_info

    rng = np.random.default_rng(0)
    info = synthetic_info(rng, timestamp=3)
    preds = {
        info["token"]: (
            np.stack([_box(1, 2, yaw=0.3, vel=(1.0, 0.0))]),
            np.array([0.7]),
            np.array([0]),
        )
    }
    sub = format_nuscenes_results(
        preds, {info["token"]: info}, class_names=["car"] + ["x"] * 9
    )
    ann = sub["results"][info["token"]][0]
    assert ann["detection_name"] == "car"
    # ego2global translation is (30, 0, 0) for timestamp 3
    np.testing.assert_allclose(ann["translation"][0], 31.0, atol=1e-5)
    assert ann["attribute_name"] == "vehicle.moving"  # speed > 0.2
    assert ann["size"] == [4.0, 2.0, 1.5]  # wlh ordering
