"""CenterPoint target assignment (NumPy, input-pipeline side).

The reference renders heatmap/regression targets on-device with a Python loop
over GT boxes inside the loss (centerpoint_head.py:441-590).  TPU-first, we
render them CPU-side in the data loader: targets depend only on labels, so
this keeps the jitted train step free of dynamic shapes, and the loader
overlaps rendering with device compute.

Single-task configuration (the RCBEVDet config uses one task with 10 classes,
configs/rcbevdet/rcbevdet-...py:148-158); multi-task is a thin loop on top.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from .gaussian import draw_heatmap_gaussian_np, gaussian_radius_np


class CenterPointTargets(NamedTuple):
    heatmap: np.ndarray  # [num_classes, H, W]
    anno_box: np.ndarray  # [max_objs, 10]
    inds: np.ndarray  # [max_objs] int64 flat position (y * W + x)
    mask: np.ndarray  # [max_objs] float validity


def centerpoint_targets_single(
    gt_boxes,
    gt_labels,
    num_classes,
    grid_size,
    point_cloud_range,
    voxel_size,
    out_size_factor=8,
    gaussian_overlap=0.1,
    min_radius=2,
    max_objs=500,
    norm_bbox=True,
):
    """Render training targets for one sample.

    Args:
      gt_boxes: [N, 9] gravity-centered boxes (x, y, z, dx, dy, dz, yaw, vx, vy).
      gt_labels: [N] int class ids in [0, num_classes).
      grid_size: (nx, ny) of the full-resolution grid (e.g. 1024, 1024).
      point_cloud_range: 6-tuple.
      voxel_size: (vx, vy) of the full-resolution grid (e.g. 0.1, 0.1).
      out_size_factor: feature-map downsample (8 -> 128x128 targets).

    Returns:
      CenterPointTargets.  anno_box rows are
      (dx_frac, dy_frac, z, log dx, log dy, log dz, sin yaw, cos yaw, vx, vy)
      matching centerpoint_head.py:556-580.
    """
    fw = int(grid_size[0]) // out_size_factor
    fh = int(grid_size[1]) // out_size_factor
    heatmap = np.zeros((num_classes, fh, fw), np.float32)
    anno_box = np.zeros((max_objs, 10), np.float32)
    inds = np.zeros((max_objs,), np.int64)
    mask = np.zeros((max_objs,), np.float32)

    num_objs = min(len(gt_boxes), max_objs)
    for k in range(num_objs):
        cls_id = int(gt_labels[k])
        if cls_id < 0 or cls_id >= num_classes:
            continue
        width = gt_boxes[k][3] / voxel_size[0] / out_size_factor
        length = gt_boxes[k][4] / voxel_size[1] / out_size_factor
        if width <= 0 or length <= 0:
            continue
        radius = gaussian_radius_np((length, width), min_overlap=gaussian_overlap)
        radius = max(min_radius, int(radius))

        x, y, z = gt_boxes[k][0], gt_boxes[k][1], gt_boxes[k][2]
        coor_x = (x - point_cloud_range[0]) / voxel_size[0] / out_size_factor
        coor_y = (y - point_cloud_range[1]) / voxel_size[1] / out_size_factor
        cx, cy = int(coor_x), int(coor_y)
        if not (0 <= cx < fw and 0 <= cy < fh):
            continue
        draw_heatmap_gaussian_np(heatmap[cls_id], (cx, cy), radius)

        inds[k] = cy * fw + cx
        mask[k] = 1.0
        dim = gt_boxes[k][3:6]
        if norm_bbox:
            dim = np.log(dim)
        rot = gt_boxes[k][6]
        anno_box[k] = np.array(
            [
                coor_x - cx,
                coor_y - cy,
                z,
                dim[0],
                dim[1],
                dim[2],
                np.sin(rot),
                np.cos(rot),
                gt_boxes[k][7],
                gt_boxes[k][8],
            ],
            np.float32,
        )
    return CenterPointTargets(heatmap, anno_box, inds, mask)


def centerpoint_targets_multi_task(
    gt_boxes,
    gt_labels,
    task_groups,
    **kwargs,
):
    """Per-task targets for a MultiTaskCenterHead (reference
    get_targets_single's task re-bucketing, centerpoint_head.py:470-491):
    global class ids are remapped to each task's local ids and boxes split by
    group.

    Returns a list of CenterPointTargets, one per task.
    """
    gt_labels = np.asarray(gt_labels).reshape(-1)
    out = []
    for group in task_groups:
        local = {g: i for i, g in enumerate(group)}
        sel = np.isin(gt_labels, list(group))
        boxes_t = np.asarray(gt_boxes).reshape(-1, 9)[sel]
        labels_t = np.asarray([local[int(l)] for l in gt_labels[sel]], np.int64)
        out.append(
            centerpoint_targets_single(
                boxes_t, labels_t, num_classes=len(group), **kwargs
            )
        )
    return out
