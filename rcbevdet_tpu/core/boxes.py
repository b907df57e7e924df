"""3D box utilities (LiDAR-frame).

Internal box layout (code_size 9): ``(x, y, z, dx, dy, dz, yaw, vx, vy)``
with **z at the gravity center** of the box.  The reference mixes two
conventions (annotations arrive gravity-centered, mmdet3d's
``LiDARInstance3DBoxes`` stores bottom-centered, and the head's decode shifts
back at output time, centerpoint_head.py:775-777); we keep gravity-centered
everywhere and convert only at the nuScenes-JSON boundary.

These are plain NumPy functions used CPU-side (data pipeline, NMS, eval).
"""

from __future__ import annotations

import numpy as np


def gravity_center(boxes):
    """Identity accessor kept for API parity: [..., 9] -> [..., 3] centers."""
    return boxes[..., :3]


def boxes_bev(boxes):
    """[..., >=7] -> [..., 5] BEV boxes (x, y, dx, dy, yaw)."""
    return boxes[..., [0, 1, 3, 4, 6]]


def box_corners_bev(bev_boxes):
    """[..., 5] (x, y, dx, dy, yaw) -> [..., 4, 2] BEV corner points (CCW)."""
    x, y, dx, dy, yaw = (bev_boxes[..., i] for i in range(5))
    hx, hy = dx * 0.5, dy * 0.5
    local = np.stack(
        [
            np.stack([hx, hy], -1),
            np.stack([-hx, hy], -1),
            np.stack([-hx, -hy], -1),
            np.stack([hx, -hy], -1),
        ],
        axis=-2,
    )  # [..., 4, 2]
    c, s = np.cos(yaw), np.sin(yaw)
    rot = np.stack(
        [np.stack([c, -s], -1), np.stack([s, c], -1)], axis=-2
    )  # [..., 2, 2]
    pts = np.einsum("...ij,...kj->...ki", rot, local)
    return pts + np.stack([x, y], -1)[..., None, :]


def bda_matrix(rot_angle_deg, scale_ratio, flip_dx, flip_dy):
    """The 3x3 BEV-augmentation matrix ``flip @ scale @ rot``.

    Mirrors ``LoadAnnotationsBEVDepth.bev_transform``
    (reference datasets/pipelines/loading.py:2153-2169): this full matrix is
    what the model receives as ``bda`` (loading.py:2247-2248).
    """
    ang = np.deg2rad(rot_angle_deg)
    c, s = np.cos(ang), np.sin(ang)
    rot_mat = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=np.float64)
    scale_mat = np.eye(3) * scale_ratio
    flip_mat = np.eye(3)
    if flip_dx:
        flip_mat = flip_mat @ np.diag([-1.0, 1.0, 1.0])
    if flip_dy:
        flip_mat = flip_mat @ np.diag([1.0, -1.0, 1.0])
    return (flip_mat @ (scale_mat @ rot_mat)).astype(np.float32)


def transform_boxes_bda(boxes, rot_angle_deg, scale_ratio, flip_dx, flip_dy):
    """Apply BEV data augmentation to GT boxes (NumPy, pipeline-side).

    Mirrors ``LoadAnnotationsBEVDepth.bev_transform``
    (reference loading.py:2153-2183): centers go through the full
    flip@scale@rot matrix, dims scale, yaw accumulates rotation then flips,
    velocities go through the full matrix's 2x2 block.

    Args:
      boxes: [N, 9] float array (gravity-centered z).
      rot_angle_deg: rotation in degrees (the reference samples degrees).
      scale_ratio: float.
      flip_dx, flip_dy: bools.

    Returns:
      (boxes [N, 9], bda [3, 3]) — bda is the matrix fed to the model.
    """
    boxes = np.array(boxes, dtype=np.float64, copy=True)
    ang = np.deg2rad(rot_angle_deg)
    fsr = bda_matrix(rot_angle_deg, scale_ratio, flip_dx, flip_dy).astype(
        np.float64
    )
    if boxes.shape[0] > 0:
        boxes[:, :3] = boxes[:, :3] @ fsr.T
        boxes[:, 3:6] *= scale_ratio
        boxes[:, 6] += ang
        if flip_dx:
            boxes[:, 6] = np.pi - boxes[:, 6]
        if flip_dy:
            boxes[:, 6] = -boxes[:, 6]
        if boxes.shape[1] > 7:
            boxes[:, 7:9] = boxes[:, 7:9] @ fsr[:2, :2].T
    return boxes.astype(np.float32), fsr.astype(np.float32)


def transform_points_bda(points_xyz, bda):
    """Apply the BDA matrix to points (radar/lidar), NumPy pipeline-side.

    Mirrors ``GlobalRotScaleTrans_radar`` (transforms_3d.py:868) /
    LoadAnnotationsBEVDepth's point transform (loading.py:2217).
    """
    return points_xyz @ bda.T


def transform_radar_points_bda(points, bda):
    """Radar points carry velocities in dims 3:5 which rotate/flip/scale with
    the BEV aug (reference core/points/radar_points.py:4 — flip/scale/rotate
    also transform velocity dims 3:5).

    Args:
      points: [N, D] with (x, y, z, vx, vy, ...) in dims 0:5.
      bda: [3, 3].
    """
    points = np.array(points, copy=True)
    points[:, :3] = points[:, :3] @ bda.T
    points[:, 3:5] = points[:, 3:5] @ bda[:2, :2].T
    return points
