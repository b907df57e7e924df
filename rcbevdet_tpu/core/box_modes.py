"""3D box coordinate modes (LiDAR / Camera / Depth) and conversions.

Array-level equivalent of the reference's box-structure zoo
(mmdet3d/core/bbox/structures/box_3d_mode.py:66-180, cam_box3d.py,
depth_box3d.py): mode conversion with the standard axis-remap matrices,
dim permutations and yaw re-phasing, plus camera-frame corners and image
projection.  Operates on plain [..., 7+] arrays in the reference's
BOTTOM-CENTER storage convention (the infos-pkl / eval format; the RC
model path itself uses gravity-centered boxes, core/boxes.py).

Modes:
  LIDAR: x forward, y left, z up; yaw around z; origin (0.5, 0.5, 0).
  CAM:   x right, y down, z forward; yaw around y; origin (0.5, 1.0, 0.5).
  DEPTH: x right, y forward, z up; yaw around z; origin (0.5, 0.5, 0).
"""

from __future__ import annotations

import numpy as np

LIDAR = "lidar"
CAM = "cam"
DEPTH = "depth"

# default rotation matrices and (dim permutation, yaw transform) per pair,
# matching box_3d_mode.py:117-156
_DEFAULT_RT = {
    (LIDAR, CAM): np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float64),
    (CAM, LIDAR): np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float64),
    (DEPTH, CAM): np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float64),
    (CAM, DEPTH): np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], np.float64),
    (LIDAR, DEPTH): np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float64),
    (DEPTH, LIDAR): np.array([[0, 1, 0], [-1, 0, 0], [0, 0, 1]], np.float64),
}
_DIM_PERM = {
    (LIDAR, CAM): (0, 2, 1),
    (CAM, LIDAR): (0, 2, 1),
    (DEPTH, CAM): (0, 2, 1),
    (CAM, DEPTH): (0, 2, 1),
    (LIDAR, DEPTH): (0, 1, 2),
    (DEPTH, LIDAR): (0, 1, 2),
}


def limit_period(val, offset=0.5, period=np.pi):
    """Wrap to [-offset*period, (1-offset)*period) (utils.py semantics)."""
    return val - np.floor(val / period + offset) * period


def _yaw_convert(yaw, src, dst):
    if (src, dst) in ((LIDAR, CAM), (CAM, LIDAR)):
        return limit_period(-yaw - np.pi / 2, period=2 * np.pi)
    if (src, dst) in ((DEPTH, CAM), (CAM, DEPTH)):
        return -yaw  # no period wrap here (box_3d_mode.py:136,142)
    if (src, dst) == (LIDAR, DEPTH):
        return limit_period(yaw + np.pi / 2, period=2 * np.pi)
    if (src, dst) == (DEPTH, LIDAR):
        return limit_period(yaw - np.pi / 2, period=2 * np.pi)
    raise ValueError(f"unsupported {src}->{dst}")


def convert_boxes(boxes, src, dst, rt_mat=None):
    """Convert [..., 7+] boxes between coordinate modes.

    ``rt_mat`` overrides the default axis remap with a real extrinsic
    ([3, 3] or [3, 4], e.g. lidar2cam).  Extra trailing dims (velocities
    etc.) pass through untouched.
    """
    boxes = np.asarray(boxes, np.float64)
    if src == dst:
        return boxes
    if rt_mat is None:
        rt_mat = _DEFAULT_RT[(src, dst)]
    rt_mat = np.asarray(rt_mat, np.float64)

    xyz = boxes[..., :3]
    if rt_mat.shape[-1] == 4:
        xyz = (
            np.concatenate([xyz, np.ones_like(xyz[..., :1])], -1)
            @ rt_mat.T
        )[..., :3]
    else:
        xyz = xyz @ rt_mat.T
    perm = _DIM_PERM[(src, dst)]
    dims = boxes[..., 3:6][..., list(perm)]
    yaw = _yaw_convert(boxes[..., 6:7], src, dst)
    return np.concatenate([xyz, dims, yaw, boxes[..., 7:]], axis=-1)


def cam_box_corners(boxes):
    """[N, 7] CAM-mode boxes (bottom-center storage) -> [N, 8, 3] corners.

    Corner order matches cam_box3d.py:117-160: unravel-index order over
    (x, y, z) in {0,1}^3, origin shifted to (0.5, 1.0, 0.5), rotated
    around y by yaw.
    """
    boxes = np.asarray(boxes, np.float64)
    dims = boxes[:, 3:6]
    corners_norm = np.stack(
        np.unravel_index(np.arange(8), (2, 2, 2)), axis=1
    ).astype(np.float64)  # (x0y0z0, x0y0z1, ...)
    corners_norm = corners_norm - np.array([0.5, 1.0, 0.5])
    corners = dims[:, None, :] * corners_norm[None]

    yaw = boxes[:, 6]
    c, s = np.cos(yaw), np.sin(yaw)
    zeros, ones = np.zeros_like(c), np.ones_like(c)
    # rotation around y (cam_box3d rotation axis=1)
    rot = np.stack(
        [
            np.stack([c, zeros, s], -1),
            np.stack([zeros, ones, zeros], -1),
            np.stack([-s, zeros, c], -1),
        ],
        -2,
    )  # [N, 3, 3]
    corners = np.einsum("nij,nkj->nki", rot, corners)
    return corners + boxes[:, None, :3]


def project_cam_corners(corners, intrinsics):
    """[N, 8, 3] cam-frame corners -> [N, 8, 2] pixels (+ [N, 8] depth)."""
    corners = np.asarray(corners, np.float64)
    k = np.asarray(intrinsics, np.float64)[:3, :3]
    pts = corners @ k.T
    depth = pts[..., 2]
    uv = pts[..., :2] / np.clip(depth[..., None], 1e-6, None)
    return uv, depth
