"""Synthetic data generation: fake nuScenes infos + batches.

No nuScenes data ships in the build environment, so tests, the benchmark,
and the compile-check entry point all run on synthetic samples with the real
shapes and calibration structure of the nuScenes RC pipeline.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

from .image_pipeline import ImageAugConfig

NUSC_CAM_NAMES = (
    "CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
    "CAM_BACK_LEFT", "CAM_BACK", "CAM_BACK_RIGHT",
)
RADAR_NAMES = (
    "RADAR_FRONT", "RADAR_FRONT_LEFT", "RADAR_FRONT_RIGHT",
    "RADAR_BACK_LEFT", "RADAR_BACK_RIGHT",
)


def _rand_quat(rng):
    q = rng.standard_normal(4)
    return q / np.linalg.norm(q)


def synthetic_info(rng, scene_token="scene0", timestamp=0, src_size=(900, 1600),
                   num_objs=12, num_radar_pts=120, box_range=40.0):
    """One fake info dict with the keys the RC pipeline consumes."""
    cams = {}
    for cam in NUSC_CAM_NAMES:
        cams[cam] = dict(
            data_path=f"synthetic://{cam}/{timestamp}",
            cam_intrinsic=np.array(
                [[1200.0, 0, src_size[1] / 2], [0, 1200.0, src_size[0] / 2],
                 [0, 0, 1]]
            ),
            sensor2ego_rotation=_rand_quat(rng),
            sensor2ego_translation=rng.standard_normal(3) * 0.5,
            ego2global_rotation=np.array([1.0, 0, 0, 0]),
            ego2global_translation=np.array([10.0 * timestamp, 0, 0]),
        )
    radars = {}
    for name in RADAR_NAMES:
        radars[name] = [
            dict(
                data_path=f"synthetic://{name}/{timestamp}/{s}",
                timestamp=(timestamp - 0.05 * s) * 1e6,
                sensor2lidar_rotation=np.eye(3),
                sensor2lidar_translation=rng.standard_normal(3) * 0.2,
            )
            for s in range(3)
        ]
    boxes = []
    labels = []
    for _ in range(num_objs):
        xy = rng.uniform(-box_range, box_range, 2)
        boxes.append(
            np.array(
                [xy[0], xy[1], rng.uniform(-1, 1), *rng.uniform(0.5, 4, 3),
                 rng.uniform(-np.pi, np.pi), *rng.uniform(-2, 2, 2)]
            )
        )
        labels.append(int(rng.integers(0, 10)))
    return dict(
        token=f"tok{timestamp}",
        scene_token=scene_token,
        timestamp=timestamp,
        cams=cams,
        radars=radars,
        ann_infos=(boxes, labels),
        lidar2ego_rotation=np.array([1.0, 0, 0, 0]),
        lidar2ego_translation=np.zeros(3),
        ego2global_rotation=np.array([1.0, 0, 0, 0]),
        ego2global_translation=np.array([10.0 * timestamp, 0, 0]),
        lidar_path=f"synthetic://lidar/{timestamp}",
        _num_radar_pts=num_radar_pts,
    )


def synthetic_loaders(rng, src_size=(900, 1600)):
    """(image_loader, pcd_loader, lidar_loader) producing deterministic fakes."""

    def image_loader(path):
        h, w = src_size
        arr = (rng.random((h // 10, w // 10, 3)) * 255).astype(np.uint8)
        img = Image.fromarray(arr).resize((w, h))
        return img

    def pcd_loader(path):
        n = 40
        pts = np.zeros((n, 18), np.float32)
        pts[:, 0] = rng.uniform(0, 60, n)  # x forward in sensor frame
        pts[:, 1] = rng.uniform(-30, 30, n)
        pts[:, 2] = rng.uniform(-1, 1, n)
        pts[:, 5] = rng.uniform(-5, 20, n)  # rcs
        pts[:, 6:10] = rng.standard_normal((n, 4))
        return pts

    def lidar_loader(path):
        n = 5000
        pts = np.zeros((n, 5), np.float32)
        pts[:, 0] = rng.uniform(-50, 50, n)
        pts[:, 1] = rng.uniform(-50, 50, n)
        pts[:, 2] = rng.uniform(-3, 2, n)
        return pts

    return image_loader, pcd_loader, lidar_loader


def correlated_pcd_loader(infos, rng, pts_per_box=6, clutter=20):
    """Radar returns CLUSTERED AT THE GT BOX CENTERS — learnable synthetic
    data for end-to-end training runs (the random loader gives data with
    zero mutual information between inputs and targets).

    The radar pipeline rotates points by -pi/2 ((x,y)->(y,-x),
    radar_pipeline.py:79-84), so the emitted sensor-frame points are
    PRE-rotated with the inverse map (x,y)->(-y,x); the compensated
    velocity columns carry the box velocity through the same pre-rotation.
    """
    by_ts = {info["timestamp"]: info for info in infos}

    def pcd_loader(path):
        # path: synthetic://{NAME}/{timestamp}/{sweep}
        t = int(path.split("/")[-2])
        boxes, _ = by_ts[t]["ann_infos"]
        rows = []
        for bx in boxes:
            x, y = bx[0], bx[1]
            vx, vy = bx[7], bx[8]
            p = np.zeros((pts_per_box, 18), np.float32)
            p[:, 0] = -y + rng.standard_normal(pts_per_box) * 0.3
            p[:, 1] = x + rng.standard_normal(pts_per_box) * 0.3
            p[:, 2] = rng.uniform(-1, 1, pts_per_box)
            p[:, 5] = rng.uniform(1, 20, pts_per_box)  # rcs
            p[:, 8] = -vy
            p[:, 9] = vx
            rows.append(p)
        c = np.zeros((clutter, 18), np.float32)
        c[:, 0] = rng.uniform(-40, 40, clutter)
        c[:, 1] = rng.uniform(-40, 40, clutter)
        c[:, 5] = rng.uniform(-5, 5, clutter)
        rows.append(c)
        return np.concatenate(rows, 0)

    return pcd_loader


def synthetic_sample(rng=None, img_config=None, num_adj=8, is_train=True,
                     num_samples=None, correlated_radar=False,
                     **dataset_kwargs):
    """One fully-processed sample through the REAL dataset pipeline.

    dataset_kwargs forward to NuScenesRCDataset (pc range, radar capacity,
    grid size, ...), so synthetic runs can match any model config.
    ``correlated_radar`` makes the task learnable (radar clusters at GT
    centers) for training-run validation.
    """
    from .dataset import NuScenesRCDataset

    rng = rng or np.random.default_rng(0)
    img_config = img_config or ImageAugConfig()
    n = num_samples or (num_adj + 2)
    pcr = dataset_kwargs.get("point_cloud_range", (-51.2,) * 3 + (51.2,) * 3)
    box_range = 0.8 * pcr[3]
    infos = [
        synthetic_info(rng, timestamp=t, box_range=box_range) for t in range(n)
    ]
    img_l, pcd_l, lidar_l = synthetic_loaders(rng, img_config.src_size)
    if correlated_radar:
        pcd_l = correlated_pcd_loader(infos, rng)
    ds = NuScenesRCDataset(
        infos, img_config=img_config, is_train=is_train,
        multi_adj_frame_ids=tuple(range(1, num_adj + 1)),
        image_loader=img_l, pcd_loader=pcd_l, lidar_loader=lidar_l,
        **dataset_kwargs,
    )
    return ds[len(ds) - 1], ds


def synthetic_batch(batch_size=1, rng=None, **kwargs):
    from .dataset import collate_samples

    rng = rng or np.random.default_rng(0)
    samples = [synthetic_sample(rng, **kwargs)[0] for _ in range(batch_size)]
    return collate_samples(samples)
