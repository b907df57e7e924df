"""Greedy tracker + AMOTA evaluation (RCBEVDet++ 3D MOT counterpart)."""

import numpy as np
import pytest

from rcbevdet_tpu.evaluation.tracking import (
    evaluate_tracking,
    greedy_track,
)

CLASSES = (
    "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
    "motorcycle", "bicycle", "pedestrian", "traffic_cone",
)


def _det(x, y, vx=0.0, vy=0.0, label=0, score=0.9):
    return np.array([x, y, 0, 4, 2, 1.5, 0, vx, vy]), score, label


def _frames_from(dets_per_frame, t0=0.0, dt=0.5):
    frames = []
    for i, dets in enumerate(dets_per_frame):
        if dets:
            boxes, scores, labels = zip(*dets)
            frames.append(
                (t0 + i * dt, np.stack(boxes), np.array(scores),
                 np.array(labels))
            )
        else:
            frames.append(
                (t0 + i * dt, np.zeros((0, 9)), np.zeros(0),
                 np.zeros(0, int))
            )
    return frames


def test_tracker_follows_moving_object():
    """A car moving at 10 m/s keeps one track id across frames thanks to
    velocity propagation."""
    frames = _frames_from([
        [_det(0, 0, vx=10.0)],
        [_det(5, 0, vx=10.0)],   # +5 m in 0.5 s
        [_det(10, 0, vx=10.0)],
    ])
    out = greedy_track(frames, CLASSES)
    ids = [o[3][0] for o in out]
    assert ids[0] == ids[1] == ids[2]


def test_tracker_spawns_new_track_beyond_gate():
    frames = _frames_from([
        [_det(0, 0)],
        [_det(50, 50)],  # far away: new identity
    ])
    out = greedy_track(frames, CLASSES)
    assert out[0][3][0] != out[1][3][0]


def test_tracker_survives_missed_frame():
    frames = _frames_from([
        [_det(0, 0, vx=10.0)],
        [],                      # missed detection
        [_det(10, 0, vx=10.0)],  # reappears where propagation expects
    ])
    out = greedy_track(frames, CLASSES, max_age=3)
    assert out[0][3][0] == out[2][3][0]


def test_amota_perfect_tracking():
    """Exact boxes with consistent ids at full recall -> AMOTA 1."""
    gt, trk = {}, {}
    for i in range(5):
        boxes = np.array([[i * 2.0, 0, 0, 4, 2, 1.5, 0, 4, 0],
                          [0, i * 2.0, 0, 4, 2, 1.5, 0, 0, 4]])
        labels = np.array([0, 0])
        gt[f"f{i}"] = (boxes, labels, np.array([100, 200]))
        trk[f"f{i}"] = (boxes.copy(), np.array([0.9, 0.8]), labels,
                        np.array([1, 2]))
    m = evaluate_tracking(trk, gt, CLASSES, classes=("car",))
    assert m["AMOTA_car"] == pytest.approx(1.0)
    assert m["AMOTP_car"] == pytest.approx(0.0, abs=1e-9)


def test_amota_penalizes_id_switch():
    gt, good, switchy = {}, {}, {}
    for i in range(6):
        boxes = np.array([[i * 2.0, 0, 0, 4, 2, 1.5, 0, 4, 0]])
        labels = np.array([0])
        gt[f"f{i}"] = (boxes, labels, np.array([100]))
        good[f"f{i}"] = (boxes.copy(), np.array([0.9]), labels,
                         np.array([1]))
        # identity flips halfway through
        switchy[f"f{i}"] = (boxes.copy(), np.array([0.9]), labels,
                            np.array([1 if i < 3 else 2]))
    m_good = evaluate_tracking(good, gt, CLASSES, classes=("car",))
    m_bad = evaluate_tracking(switchy, gt, CLASSES, classes=("car",))
    assert m_bad["AMOTA_car"] < m_good["AMOTA_car"]


def test_amota_no_detections_zero():
    gt = {"f0": (np.array([[0, 0, 0, 4, 2, 1.5, 0, 0, 0]]),
                 np.array([0]), np.array([7]))}
    trk = {"f0": (np.zeros((0, 9)), np.zeros(0), np.zeros(0, int),
                  np.zeros(0, int))}
    m = evaluate_tracking(trk, gt, CLASSES, classes=("car",))
    assert m["AMOTA_car"] == 0.0


def test_end_to_end_track_then_evaluate():
    """Detections from two crossing objects -> tracker -> AMOTA ~ 1."""
    rng = np.random.default_rng(0)
    gt, frames, toks = {}, [], []
    for i in range(8):
        t = i * 0.5
        a = np.array([i * 2.0, 0, 0, 4, 2, 1.5, 0, 4, 0])
        b = np.array([14 - i * 2.0, 6, 0, 4, 2, 1.5, 0, -4, 0])
        boxes = np.stack([a, b])
        noisy = boxes.copy()
        noisy[:, :2] += rng.normal(0, 0.05, (2, 2))
        gt[f"f{i}"] = (boxes, np.array([0, 0]), np.array([10, 20]))
        frames.append((t, noisy, np.array([0.9, 0.85]), np.array([0, 0])))
        toks.append(f"f{i}")
    out = greedy_track(frames, CLASSES)
    trk = {tok: o for tok, o in zip(toks, out)}
    m = evaluate_tracking(trk, gt, CLASSES, classes=("car",))
    assert m["AMOTA_car"] == pytest.approx(1.0)
    assert m["AMOTP_car"] < 0.2
