"""GT-paste augmentation (DataBaseSampler / ObjectSample / FadeHook)."""

import numpy as np
import pytest

from rcbevdet_tpu.core.nms import rotated_iou_matrix_np
from rcbevdet_tpu.data.dbsampler import DBSampler, build_gt_database


def _db_with(cls_boxes):
    """{cls: list of 9-dim boxes} -> database with one radar point each."""
    db = {}
    for cls, boxes in cls_boxes.items():
        db[cls] = [
            {
                "box": np.asarray(b, np.float32),
                "points": np.array(
                    [[0.1, 0.2, 0.0, 1.0, 0.0, 5.0, 0.0]], np.float32
                ),
            }
            for b in boxes
        ]
    return db


def test_sampler_fills_group_and_pastes_points():
    db = _db_with({1: [[20, 20, 0, 4, 2, 1.5, 0, 0, 0],
                       [-20, -20, 0, 4, 2, 1.5, 0, 0, 0]]})
    sampler = DBSampler(db, {1: 2}, rng=np.random.default_rng(0))
    gt_boxes = np.array([[0, 0, 0, 4, 2, 1.5, 0, 0, 0]], np.float32)
    gt_labels = np.array([0])
    boxes, labels, radar = sampler.sample(gt_boxes, gt_labels)
    assert len(boxes) == 3 and (labels == 1).sum() == 2
    # pasted radar points moved with their boxes
    assert len(radar) == 2
    for p in radar:
        d = np.min(np.hypot(boxes[1:, 0] - (p[0] - 0.1),
                            boxes[1:, 1] - (p[1] - 0.2)))
        assert d < 1e-5


def test_sampler_rejects_bev_collisions():
    # candidate overlaps the existing GT at the origin -> rejected
    db = _db_with({1: [[0.5, 0.0, 0, 4, 2, 1.5, 0, 0, 0]]})
    sampler = DBSampler(db, {1: 1}, rng=np.random.default_rng(0))
    gt_boxes = np.array([[0, 0, 0, 4, 2, 1.5, 0, 0, 0]], np.float32)
    boxes, labels, radar = sampler.sample(gt_boxes, np.array([0]))
    assert len(boxes) == 1  # nothing pasted
    assert len(radar) == 0


def test_sampler_no_mutual_collisions():
    rng = np.random.default_rng(3)
    db = _db_with({
        1: [[x, y, 0, 4, 2, 1.5, 0.3, 0, 0]
            for x in (-20, -10, 0, 10, 20) for y in (-20, -10, 0, 10, 20)]
    })
    sampler = DBSampler(db, {1: 10}, rng=rng)
    boxes, labels, _ = sampler.sample(
        np.zeros((0, 9), np.float32), np.zeros(0, np.int64)
    )
    assert len(boxes) == 10
    iou = rotated_iou_matrix_np(
        boxes[:, (0, 1, 3, 4, 6)], boxes[:, (0, 1, 3, 4, 6)]
    )
    np.fill_diagonal(iou, 0.0)
    assert iou.max() == 0.0


def test_build_database_from_synthetic_infos():
    from rcbevdet_tpu.data.synthetic import synthetic_sample

    _, ds = synthetic_sample(num_adj=1, correlated_radar=True)
    db = build_gt_database(
        ds.data_infos, num_classes=10, pcd_loader=ds.pcd_loader
    )
    total = sum(len(v) for v in db.values())
    assert total > 0
    entry = next(e for v in db.values() for e in v)
    assert entry["box"].shape == (9,)
    # correlated radar puts returns at box centers -> relative coords small
    with_pts = [e for v in db.values() for e in v if len(e["points"])]
    assert with_pts, "correlated radar should land inside some boxes"
    rel = np.concatenate([e["points"][:, :2] for e in with_pts])
    assert np.abs(rel).max() < 10.0


def test_dataset_pastes_and_fades():
    from rcbevdet_tpu.data.synthetic import synthetic_sample

    _, ds0 = synthetic_sample(num_adj=1, correlated_radar=True)
    db = build_gt_database(
        ds0.data_infos, num_classes=10, pcd_loader=ds0.pcd_loader
    )
    sampler = DBSampler(
        db, {c: 12 for c in range(10)}, rng=np.random.default_rng(0)
    )
    _, ds = synthetic_sample(
        num_adj=1, correlated_radar=True, object_sampler=sampler
    )
    n_pasted = int(np.sum(ds[0]["gt_labels"] >= 0))
    ds.object_sample_enabled = False  # what the fade hook does
    n_plain = int(np.sum(ds[0]["gt_labels"] >= 0))
    assert n_pasted > n_plain
