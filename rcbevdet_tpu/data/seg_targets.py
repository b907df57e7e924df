"""BEV segmentation targets (host, numpy).

Counterpart of the reference ``LoadBEVSegmentation``
(datasets/pipelines/loading.py:2494-2622): per-class boolean BEV masks on
a metric canvas.  Two sources:

- ``vehicle``: rasterized from the (post-BDA) GT boxes of the vehicle-like
  classes.  The reference fills the box-corner polygon with cv2.fillPoly
  (:2589-2609); here a cell is set when its CENTER lies inside the rotated
  BEV rectangle — same geometry, sub-cell edge semantics differ by at most
  half a cell (documented deviation; no cv2 dependency).
- map layers (drivable_area*, divider, ...): require the nuScenes map
  expansion via ``map_mask_fn`` — a callable
  ``(location, patch_box, patch_angle, layer_names, canvas_size) -> [L, H, W]``
  (e.g. ``NuScenesMap.get_map_mask``), injected so the devkit stays an
  optional dependency exactly like the reference's NuScenesMap usage.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

# reference loading.py:2596: box classes rasterized into the vehicle layer
VEHICLE_CLASSES = (
    "car", "truck", "construction_vehicle", "bus", "trailer",
    "motorcycle", "bicycle",
)

# reference loading.py:2554-2560
LAYER_MAPPINGS = {
    "drivable_area*": ["road_segment", "lane"],
    "divider": ["road_divider", "lane_divider"],
}


def rasterize_vehicle_mask(gt_boxes, gt_labels, class_names,
                           xbound, ybound,
                           needed_classes: Sequence[str] = VEHICLE_CLASSES):
    """[H, W] uint8 mask of cells whose centers fall inside a vehicle box.

    Args:
      gt_boxes: [M, >=7] (x, y, z, dx, dy, dz, yaw, ...) post-BDA.
      gt_labels: [M] int class ids into ``class_names``.
      xbound/ybound: (lo, hi, step) metric canvas bounds.
    """
    from ..core.nms import points_in_rotated_boxes

    h = int(round((ybound[1] - ybound[0]) / ybound[2]))
    w = int(round((xbound[1] - xbound[0]) / xbound[2]))
    gt_boxes = np.asarray(gt_boxes, np.float32)
    if gt_boxes.size == 0:
        gt_boxes = gt_boxes.reshape(0, 9)
    gt_labels = np.asarray(gt_labels).reshape(-1)
    keep = np.array(
        [
            0 <= int(l) < len(class_names)
            and class_names[int(l)] in needed_classes
            for l in gt_labels
        ],
        bool,
    )
    boxes = gt_boxes[keep]
    if len(boxes) == 0:
        return np.zeros((h, w), np.uint8)
    xs = (np.arange(w) + 0.5) * xbound[2] + xbound[0]
    ys = (np.arange(h) + 0.5) * ybound[2] + ybound[0]
    xx, yy = np.meshgrid(xs, ys, indexing="xy")  # [H, W]
    pts = np.stack([xx.reshape(-1), yy.reshape(-1)], -1)
    bev = boxes[:, [0, 1, 3, 4, 6]]  # (cx, cy, dx, dy, yaw)
    inside = points_in_rotated_boxes(pts, bev).any(axis=1)
    return inside.reshape(h, w).astype(np.uint8)


def build_seg_masks(classes: Sequence[str], gt_boxes, gt_labels,
                    class_names, xbound, ybound,
                    location: Optional[str] = None,
                    ego2global: Optional[np.ndarray] = None,
                    map_mask_fn=None,
                    flip_dx=False, flip_dy=False, scale=1.0):
    """[H, W, C] float32 mask stack in the order of ``classes``.

    'vehicle' (if present, must be first — reference loading.py:2512-2514)
    comes from the GT boxes; other classes come from ``map_mask_fn``.
    Map-layer classes without a ``map_mask_fn`` raise.
    """
    if "vehicle" in classes and classes[0] != "vehicle":
        raise ValueError("vehicle must be first in the seg class list")
    h = int(round((ybound[1] - ybound[0]) / ybound[2]))
    w = int(round((xbound[1] - xbound[0]) / xbound[2]))
    out = np.zeros((h, w, len(classes)), np.float32)
    map_classes = [c for c in classes if c != "vehicle"]
    if map_classes:
        if map_mask_fn is None:
            raise ValueError(
                "map-layer seg classes need map_mask_fn (nuScenes map "
                "expansion), like the reference's NuScenesMap"
            )
        patch = (ybound[1] - ybound[0]) / scale, (xbound[1] - xbound[0]) / scale
        pose = np.asarray(ego2global, np.float64)
        yaw = np.arctan2(pose[1, 0], pose[0, 0])
        patch_box = (pose[0, 3], pose[1, 3], patch[0], patch[1])
        layer_names = []
        for name in map_classes:
            layer_names.extend(LAYER_MAPPINGS.get(name, [name]))
        layer_names = sorted(set(layer_names))
        masks = np.asarray(
            map_mask_fn(location, patch_box, yaw / np.pi * 180.0,
                        layer_names, (h, w)),
            bool,
        ).transpose(0, 2, 1)  # reference loading.py:2575
        for name in map_classes:
            k = classes.index(name)
            for ln in LAYER_MAPPINGS.get(name, [name]):
                out[:, :, k] = np.maximum(
                    out[:, :, k], masks[layer_names.index(ln)]
                )
        if flip_dx:
            out = out[::-1].copy()
        if flip_dy:
            out = out[:, ::-1].copy()
    if "vehicle" in classes:
        out[:, :, 0] = rasterize_vehicle_mask(
            gt_boxes, gt_labels, class_names, xbound, ybound
        )
    return out
