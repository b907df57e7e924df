"""Sparse per-pixel depth ground truth from lidar points (CPU-side).

Re-design of ``PointToMultiViewDepth`` (reference
datasets/pipelines/loading.py:1291-1380): project BDA-augmented lidar points
into each augmented camera image, keep the nearest depth per pixel, emit a
dense [N, H, W] map with zeros for empty pixels.
"""

from __future__ import annotations

import numpy as np

from .image_pipeline import pose_to_matrix


def points_to_depth_map(points_img, height, width, depth_range, downsample=1):
    """points_img: [M, 3] (u, v, depth) in augmented image coords."""
    height, width = height // downsample, width // downsample
    depth_map = np.zeros((height, width), np.float32)
    coor = np.round(points_img[:, :2] / downsample)
    depth = points_img[:, 2]
    kept = (
        (coor[:, 0] >= 0) & (coor[:, 0] < width)
        & (coor[:, 1] >= 0) & (coor[:, 1] < height)
        & (depth < depth_range[1]) & (depth >= depth_range[0])
    )
    coor, depth = coor[kept], depth[kept]
    ranks = coor[:, 0] + coor[:, 1] * width
    order = np.argsort(ranks + depth / 100.0, kind="stable")
    coor, depth, ranks = coor[order], depth[order], ranks[order]
    keep_first = np.ones(len(ranks), bool)
    keep_first[1:] = ranks[1:] != ranks[:-1]
    coor, depth = coor[keep_first].astype(np.int64), depth[keep_first]
    depth_map[coor[:, 1], coor[:, 0]] = depth
    return depth_map


def points_to_depth_maps(
    points_lidar,
    key_info,
    cam_names,
    intrins,
    post_rots,
    post_trans,
    input_size,
    depth_range=(1.0, 60.0),
    downsample=1,
):
    """Project lidar points into every camera and rasterize nearest depth.

    Args:
      points_lidar: [M, 3+] lidar-frame points (pre-BDA; the model's depth
        GT is built from un-augmented lidar geometry + image aug, matching
        the reference pipeline order where PointToMultiViewDepth runs after
        LoadPointsFromFile but uses the key-frame calibration).
      key_info: nuScenes info dict for the key sample.
      intrins/post_rots: [N, 3, 3]; post_trans: [N, 3] for the KEY frame.

    Returns:
      [N, H, W] float32 depth maps.
    """
    h, w = input_size
    lidar2lidarego = pose_to_matrix(
        key_info["lidar2ego_rotation"], key_info["lidar2ego_translation"]
    )
    lidarego2global = pose_to_matrix(
        key_info["ego2global_rotation"], key_info["ego2global_translation"]
    )
    maps = []
    for ci, cam in enumerate(cam_names):
        cdat = key_info["cams"][cam]
        cam2camego = pose_to_matrix(
            cdat["sensor2ego_rotation"], cdat["sensor2ego_translation"]
        )
        camego2global = pose_to_matrix(
            cdat["ego2global_rotation"], cdat["ego2global_translation"]
        )
        cam2img = np.eye(4)
        cam2img[:3, :3] = intrins[ci]
        lidar2cam = np.linalg.inv(camego2global @ cam2camego) @ (
            lidarego2global @ lidar2lidarego
        )
        lidar2img = cam2img @ lidar2cam
        pts = points_lidar[:, :3] @ lidar2img[:3, :3].T + lidar2img[:3, 3]
        with np.errstate(divide="ignore", invalid="ignore"):
            uv = pts[:, :2] / pts[:, 2:3]
        pts_img = np.concatenate([uv, pts[:, 2:3]], 1)
        pts_img = pts_img @ np.asarray(post_rots[ci]).T + np.asarray(post_trans[ci])
        pts_img = pts_img[np.isfinite(pts_img).all(1)]
        maps.append(
            points_to_depth_map(pts_img, h, w, depth_range, downsample)
        )
    return np.stack(maps).astype(np.float32)
