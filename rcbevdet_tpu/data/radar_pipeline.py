"""Radar multi-sweep loading (NumPy, CPU-side).

Re-design of the reference ``LoadRadarPointsMultiSweeps``
(datasets/pipelines/loading.py:624-790): for each of the 5 radar sensors,
load up to ``sweeps_num`` sweeps, rotate sensor-frame velocities (raw and
ego-motion-compensated) into the lidar frame, move positions into the lidar
frame, append the time offset to the key sweep, select the 7 used dims
[x, y, z, vx_comp, vy_comp, rcs, time_diff], and rotate everything by -pi/2
to match the camera BEV axis convention (:782-784).

Unlike the reference (which leaves ``_pad_or_drop`` unused and emits a
variable-length cloud), the output here is PADDED to ``max_num`` with a mask
— the fixed-capacity contract of the TPU model.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from .pcd import load_radar_pcd

RADAR_USE_DIMS = (0, 1, 2, 8, 9, 5, 18)  # x y z vx_comp vy_comp rcs time_diff


def load_radar_sweeps(
    radars_dict: Dict[str, List[dict]],
    sweeps_num: int = 8,
    use_dim: Sequence[int] = RADAR_USE_DIMS,
    rote90: bool = True,
    pcd_loader=None,
):
    """Assemble the multi-sensor multi-sweep radar cloud for one sample.

    Args:
      radars_dict: per-sensor list of sweep dicts with keys data_path,
        timestamp, sensor2lidar_rotation, sensor2lidar_translation.
      pcd_loader: callable(path) -> [N, 18] (injectable for tests).

    Returns:
      [M, len(use_dim)] float32 points in the (rotated) lidar frame.
    """
    if pcd_loader is None:
        pcd_loader = load_radar_pcd
    out = []
    for key, sweeps in radars_dict.items():
        idxes = range(min(len(sweeps), sweeps_num))
        if len(sweeps) == 0:
            continue
        ts = sweeps[0]["timestamp"] * 1e-6
        for idx in idxes:
            sweep = sweeps[idx]
            pts = np.asarray(pcd_loader(sweep["data_path"]), np.float32)
            if pts.size == 0:
                continue
            rot = np.asarray(sweep["sensor2lidar_rotation"], np.float32)
            tran = np.asarray(sweep["sensor2lidar_translation"], np.float32)
            time_diff = np.full((pts.shape[0], 1), ts - sweep["timestamp"] * 1e-6,
                                np.float32)

            def rot_vel(v):  # [N, 2] velocities rotated into lidar frame
                v3 = np.concatenate([v, np.zeros((v.shape[0], 1), np.float32)], 1)
                return (v3 @ rot.T)[:, :2]

            velo = rot_vel(pts[:, 6:8])
            velo_comp = rot_vel(pts[:, 8:10])
            xyz = pts[:, :3] @ rot.T + tran
            # layout matches the reference's re-concat (loading.py:765-768):
            # [:6] raw, 6:8 velo, 8:10 velo_comp, 10:18 tail, 18 time_diff
            merged = np.concatenate(
                [xyz, pts[:, 3:6], velo, velo_comp, pts[:, 10:18], time_diff], 1
            )
            out.append(merged)

    if not out:
        return np.zeros((0, len(use_dim)), np.float32)
    points = np.concatenate(out, 0)[:, list(use_dim)]
    if rote90:
        # RadarPoints.rotate(-pi/2) (radar_points.py:53-99): (x, y) -> (y, -x),
        # and the same rotation for the velocity dims 3:5.
        points[:, :2] = np.stack([points[:, 1], -points[:, 0]], -1)
        points[:, 3:5] = np.stack([points[:, 4], -points[:, 3]], -1)
    return points.astype(np.float32)


def pad_radar_points(points, max_num=1200, rng=None):
    """Pad/subsample to a fixed capacity with a validity mask
    (the scheme the reference's unused ``_pad_or_drop`` sketches,
    loading.py:682-711)."""
    n, d = points.shape
    out = np.zeros((max_num, d), np.float32)
    mask = np.zeros((max_num,), bool)
    if n > max_num:
        if rng is None:
            sel = np.arange(max_num)
        else:
            sel = rng.permutation(n)[:max_num]
        out[:] = points[sel]
        mask[:] = True
    else:
        out[:n] = points
        mask[:n] = True
    return out, mask
