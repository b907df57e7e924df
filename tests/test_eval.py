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


def test_maae_hand_computed_on_attributed_gt():
    """Hand-computed mAAE: predictions carry no explicit attributes, so the
    evaluator applies the reference's speed-based default rule
    (nuscenes_dataset_rc.py:433-453) before comparing with GT attributes
    exactly like NuScenesEval's attr_acc (NaN when the GT has none).

    Per-class attr curves are kept CONSTANT so the devkit's
    recall-interpolated TP average is hand-computable exactly:
      car:   both matches hit the GT attribute        -> attr curve 0.0
      truck: one miss + one attribute-less GT (NaN)   -> attr curve 1.0
      mAAE = mean(0, 1) = 0.5
    """
    car = np.stack([_box(0, 0), _box(10, 0, vel=(2.0, 0))])
    truck = np.stack([_box(0, 10, vel=(3.0, 0)), _box(-10, 0)])
    # car preds: still on parked GT -> 'vehicle.parked' hit; fast on moving
    # GT -> 'vehicle.moving' hit.  truck preds: still on the moving GT ->
    # 'vehicle.parked' MISS; anything on the NaN GT is excluded.
    truck_pred = truck.copy()
    truck_pred[0, 7:9] = 0.0
    boxes = np.concatenate([car, truck])
    pred_boxes = np.concatenate([car.copy(), truck_pred])
    labels = np.array([0, 0, 1, 1], np.int64)
    gts = {"a": (boxes, labels,
                 ["vehicle.parked", "vehicle.moving", "vehicle.moving", ""])}
    preds = {"a": (pred_boxes, np.array([0.9, 0.8, 0.7, 0.6]), labels)}
    m = evaluate_detections(preds, gts)
    np.testing.assert_allclose(m["mAAE"], 0.5, rtol=1e-6)
    assert m["mATE"] < 1e-6


def test_maae_explicit_pred_attributes_and_slow_branch():
    """Explicit prediction attributes bypass the default rule; the slow
    branch of the rule maps pedestrian->standing and bus->stopped."""
    from rcbevdet_tpu.evaluation.format import _attribute_for

    assert _attribute_for("pedestrian", (0.0, 0.0)) == "pedestrian.standing"
    assert _attribute_for("bus", (0.1, 0.0)) == "vehicle.stopped"
    assert _attribute_for("bus", (1.0, 0.0)) == "vehicle.moving"
    assert _attribute_for("pedestrian", (1.0, 0.0)) == "pedestrian.moving"

    boxes = np.stack([_box(0, 0)])
    labels = np.zeros(1, np.int64)
    gts = {"a": (boxes, labels, ["vehicle.moving"])}
    # geometry says parked, but the explicit attribute says moving -> hit
    preds = {"a": (boxes.copy(), np.array([0.9]), labels,
                   ["vehicle.moving"])}
    m = evaluate_detections(preds, gts)
    np.testing.assert_allclose(m["mAAE"], 0.0, atol=1e-9)


def test_maae_without_gt_attrs_folds_worst_case():
    """Legacy 2-tuple GT (no attributes): every attr match is NaN and mAAE
    reports the worst case 1.0, keeping NDS comparable to older runs."""
    boxes = np.stack([_box(0, 0)])
    labels = np.zeros(1, np.int64)
    m = evaluate_detections(
        {"a": (boxes.copy(), np.array([0.9]), labels)},
        {"a": (boxes, labels)},
    )
    assert m["mAAE"] == 1.0
