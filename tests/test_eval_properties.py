"""Property-based checks of the self-contained nuScenes evaluator.

test_eval_golden.py validates evaluate_detections against a transcription
of the devkit protocol written in this same repo — a shared-misreading
blind spot.  These tests are derived independently from the PROTOCOL
DEFINITION (nuScenes devkit detection eval: greedy center-distance
matching, 101-point interpolated AP over recall/precision > 10%, NDS =
(5*mAP + sum(1 - min(1, err))) / 10), so a misreading would have to be
made twice in different forms to pass.  Reference delegation point:
/root/reference/mmdet3d/datasets/nuscenes_dataset_rc.py:481-538.
"""

import numpy as np
import pytest

from rcbevdet_tpu.evaluation.nuscenes_metrics import (
    DetectionEvalConfig,
    evaluate_detections,
)


def _box(x, y, yaw=0.0, dims=(2.0, 4.0, 1.5), vel=(0.0, 0.0), z=0.0):
    return np.array([x, y, z, *dims, yaw, *vel], np.float32)


def _random_scene(rng, n_samples=4, n_gt=6, n_pred=10, n_cls=3):
    gts, preds = {}, {}
    for s in range(n_samples):
        tok = f"s{s}"
        gb = np.stack([
            _box(rng.uniform(-20, 20), rng.uniform(-20, 20),
                 yaw=rng.uniform(-np.pi, np.pi),
                 dims=rng.uniform(1.0, 4.0, 3),
                 vel=rng.normal(0, 2, 2))
            for _ in range(n_gt)
        ])
        gl = rng.integers(0, n_cls, n_gt)
        pb = np.stack([
            _box(rng.uniform(-22, 22), rng.uniform(-22, 22),
                 yaw=rng.uniform(-np.pi, np.pi),
                 dims=rng.uniform(1.0, 4.0, 3),
                 vel=rng.normal(0, 2, 2))
            for _ in range(n_pred)
        ])
        ps = rng.uniform(0.01, 1.0, n_pred)
        pl = rng.integers(0, n_cls, n_pred)
        gts[tok] = (gb, gl)
        preds[tok] = (pb, ps, pl)
    return preds, gts


@pytest.fixture
def rng():
    return np.random.default_rng(123)


def test_metric_bounds_random_scene(rng):
    preds, gts = _random_scene(rng)
    m = evaluate_detections(preds, gts)
    assert 0.0 <= m["mAP"] <= 1.0
    assert 0.0 <= m["NDS"] <= 1.0
    for k in ("mATE", "mASE", "mAOE", "mAVE", "mAAE"):
        assert m[k] >= 0.0, k


def test_nds_recomposes_from_components(rng):
    """NDS must equal its published closed form over the reported
    components — an internal-consistency identity no transcription error
    in the accumulation code can fake."""
    preds, gts = _random_scene(rng)
    m = evaluate_detections(preds, gts)
    tp = [m["mATE"], m["mASE"], m["mAOE"], m["mAVE"], m["mAAE"]]
    nds = (5.0 * m["mAP"] + sum(1.0 - min(1.0, e) for e in tp)) / 10.0
    np.testing.assert_allclose(m["NDS"], nds, rtol=1e-9)


def test_prediction_order_permutation_invariance(rng):
    """Matching is by score, never by input order."""
    preds, gts = _random_scene(rng)
    m1 = evaluate_detections(preds, gts)
    shuffled = {}
    for tok, (b, s, l) in preds.items():
        p = rng.permutation(len(s))
        shuffled[tok] = (b[p], s[p], l[p])
    m2 = evaluate_detections(shuffled, gts)
    for k, v in m1.items():
        np.testing.assert_allclose(m2[k], v, rtol=1e-9, err_msg=k)


def test_score_monotone_transform_invariance(rng):
    """AP depends only on the score RANKING: any strictly increasing
    transform of the confidences leaves every metric unchanged."""
    preds, gts = _random_scene(rng)
    m1 = evaluate_detections(preds, gts)
    squeezed = {
        tok: (b, 0.05 + 0.9 * s**3, l) for tok, (b, s, l) in preds.items()
    }
    m2 = evaluate_detections(squeezed, gts)
    for k, v in m1.items():
        np.testing.assert_allclose(m2[k], v, rtol=1e-9, err_msg=k)


def test_improving_a_prediction_never_hurts_map(rng):
    """Replace the worst-scored far-away FP with an exact copy of an
    unmatched GT at the same score: mAP must not decrease."""
    preds, gts = _random_scene(rng)
    m1 = evaluate_detections(preds, gts)
    tok = "s0"
    b, s, l = preds[tok]
    gb, gl = gts[tok]
    i = int(np.argmin(s))
    b2, l2 = b.copy(), l.copy()
    b2[i] = gb[0]
    l2[i] = gl[0]
    preds2 = dict(preds)
    preds2[tok] = (b2, s, l2)
    m2 = evaluate_detections(preds2, gts)
    assert m2["mAP"] >= m1["mAP"] - 1e-12


def test_duplicate_detections_counted_as_fp():
    """A second detection on an already-matched GT is a false positive
    (greedy matching takes each GT once), so AP must drop below the
    single-detection value."""
    gts = {"a": (np.stack([_box(0, 0)]), np.array([0]))}
    one = {"a": (np.stack([_box(0, 0)]), np.array([0.9]), np.array([0]))}
    two = {
        "a": (
            np.stack([_box(0, 0), _box(0.2, 0)]),
            np.array([0.9, 0.8]),
            np.array([0, 0]),
        )
    }
    m1 = evaluate_detections(one, gts)
    m2 = evaluate_detections(two, gts)
    assert m2["mAP"] < m1["mAP"]


def test_ap_is_101_point_interpolated_half_recall():
    """One of two GTs matched perfectly: recall tops out at 0.5, so the
    101-point interpolated AP with the 10% recall/precision floors is
    (0.5 - 0.1) / (1 - 0.1) = 4/9 exactly — derived from the published
    formula, not from the implementation."""
    gts = {"a": (np.stack([_box(0, 0), _box(15, 15)]), np.array([0, 0]))}
    preds = {"a": (np.stack([_box(0, 0)]), np.array([0.9]), np.array([0]))}
    m = evaluate_detections(preds, gts)
    np.testing.assert_allclose(m["AP_car"], 4.0 / 9.0, rtol=1e-6)


def test_tp_errors_scored_at_2m_threshold_only():
    """A match at 1.5 m center distance exists for the 2 m and 4 m
    thresholds but TP errors come from the 2 m curve; mATE must report
    the 1.5 m distance, not an average with the unmatched thresholds."""
    gts = {"a": (np.stack([_box(0, 0)]), np.array([0]))}
    preds = {"a": (np.stack([_box(1.5, 0)]), np.array([0.9]), np.array([0]))}
    m = evaluate_detections(preds, gts)
    np.testing.assert_allclose(m["mATE"], 1.5, rtol=1e-6)


def test_class_range_filter_excludes_far_gt():
    """GT/pred beyond the per-class eval range (barrier: 30 m) must be
    invisible to the metrics; the same box within range must count."""
    far, near = _box(40, 0), _box(10, 0)
    m_far = evaluate_detections(
        {"a": (np.stack([far]), np.array([0.9]), np.array([5]))},
        {"a": (np.stack([far]), np.array([5]))},
    )
    m_near = evaluate_detections(
        {"a": (np.stack([near]), np.array([0.9]), np.array([5]))},
        {"a": (np.stack([near]), np.array([5]))},
    )
    assert "AP_barrier" not in m_far  # no in-range GT -> class skipped
    np.testing.assert_allclose(m_near["AP_barrier"], 1.0, rtol=1e-6)
