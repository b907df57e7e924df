"""GT-paste augmentation: ground-truth database sampler + fade control.

Counterpart of the reference's ``DataBaseSampler`` / ``ObjectSample``
pipeline stage (datasets/pipelines/dbsampler.py:1, transforms_3d.py
ObjectSample) + ``FadeOjectSampleHook`` (core/hook/fade_hook.py):

- ``build_gt_database`` walks a dataset's infos and collects, per class,
  every GT box together with the radar returns inside its BEV footprint
  (stored box-relative, so pasting is a rigid move).  The reference
  builds its database offline with points_in_boxes CUDA
  (tools/data_converter/create_gt_database.py); here the same membership
  test is the pure-array core/nms.points_in_rotated_boxes.
- ``DBSampler.sample`` draws boxes per class up to the configured group
  sizes, rejecting candidates whose BEV rectangle collides with existing
  GT or with already-accepted samples (dbsampler.py's
  box_collision_test), and emits the pasted radar points in the scene
  frame (pre-BDA — the dataset applies BDA to everything afterwards,
  matching the reference's ObjectSample-before-GlobalRotScaleTrans
  ordering).
- fading: the runner disables the sampler for the last epochs via
  ``dataset.object_sample_enabled`` exactly like FadeOjectSampleHook
  removes ObjectSample near the end of training.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core.nms import points_in_rotated_boxes, rotated_iou_matrix_np


def _bev5(boxes):
    return np.asarray(boxes, np.float32)[:, (0, 1, 3, 4, 6)]


def build_gt_database(
    infos: Sequence[dict],
    num_classes: int = 10,
    pcd_loader=None,
    radar_sweeps: int = 8,
    min_points: int = 1,
) -> Dict[int, List[dict]]:
    """{class id: [{'box': [9], 'points': [P, D] box-relative}]}.

    Radar points are optional — entries with no returns carry an empty
    array and still paste the box (the camera/lidar-only configs use the
    boxes alone).
    """
    from .radar_pipeline import load_radar_sweeps

    db: Dict[int, List[dict]] = {c: [] for c in range(num_classes)}
    for info in infos:
        boxes, labels = info["ann_infos"]
        boxes = np.asarray(boxes, np.float32).reshape(-1, 9)
        labels = np.asarray(labels, np.int64).reshape(-1)
        if len(boxes) == 0:
            continue
        pts = None
        if "radars" in info:
            pts = load_radar_sweeps(
                info["radars"], sweeps_num=radar_sweeps,
                pcd_loader=pcd_loader,
            )
        if pts is not None and len(pts):
            member = points_in_rotated_boxes(pts[:, :2], _bev5(boxes))
        else:
            member = np.zeros((0, len(boxes)), bool)
        for bi, (box, label) in enumerate(zip(boxes, labels)):
            if label < 0 or label >= num_classes:
                continue
            if member.shape[0]:
                inside = pts[member[:, bi]]
                rel = inside.copy()
                rel[:, :2] -= box[:2]
            else:
                rel = np.zeros((0, pts.shape[1] if pts is not None else 7),
                               np.float32)
            if pts is not None and len(rel) < min_points and "radars" in info:
                # radar-sparse objects are still useful for box-only paste
                pass
            db[int(label)].append({"box": box.copy(), "points": rel})
    return db


class DBSampler:
    """Class-balanced GT-paste sampler with BEV collision rejection."""

    def __init__(
        self,
        db: Dict[int, List[dict]],
        sample_groups: Dict[int, int],
        rng: Optional[np.random.Generator] = None,
    ):
        """sample_groups: {class id: target number of instances} — classes
        below target get pasted instances (dbsampler.py sample_all)."""
        self.db = db
        self.sample_groups = dict(sample_groups)
        self.rng = rng or np.random.default_rng(0)

    def sample(self, gt_boxes: np.ndarray, gt_labels: np.ndarray):
        """Returns (boxes [N+S, 9], labels [N+S], pasted radar [P, D])."""
        gt_boxes = np.asarray(gt_boxes, np.float32).reshape(-1, 9)
        gt_labels = np.asarray(gt_labels, np.int64).reshape(-1)
        placed = list(gt_boxes)
        new_boxes, new_labels, new_points = [], [], []
        for cls, target in self.sample_groups.items():
            have = int(np.sum(gt_labels == cls))
            want = max(0, target - have)
            pool = self.db.get(cls, [])
            if want == 0 or not pool:
                continue
            order = self.rng.permutation(len(pool))
            taken = 0
            for idx in order:
                if taken >= want:
                    break
                cand = pool[idx]
                box = cand["box"]
                if placed:
                    iou = rotated_iou_matrix_np(
                        _bev5(box[None]), _bev5(np.stack(placed))
                    )
                    if iou.max() > 0.0:  # any BEV overlap rejects
                        continue
                placed.append(box)
                new_boxes.append(box)
                new_labels.append(cls)
                if len(cand["points"]):
                    p = cand["points"].copy()
                    p[:, :2] += box[:2]
                    new_points.append(p)
                taken += 1
        if new_boxes:
            out_boxes = np.concatenate([gt_boxes, np.stack(new_boxes)], 0)
            out_labels = np.concatenate(
                [gt_labels, np.asarray(new_labels, np.int64)]
            )
        else:
            out_boxes, out_labels = gt_boxes, gt_labels
        pasted = (
            np.concatenate(new_points, 0)
            if new_points else np.zeros((0, 7), np.float32)
        )
        return out_boxes, out_labels, pasted
