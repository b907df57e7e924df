"""View-of-Delft (VoD) dataset: KITTI-format infos -> model inputs.

TPU-native analog of the reference's VoD support, which rides the KITTI
machinery (mmdet3d/datasets/kitti_dataset.py + the *VOD pipeline variants
in pipelines/loading.py:204,1383,2663 + core/evaluation/vod_utils/).
Consumes the standard KITTI info-pkl schema:

  info = {
    'image':       {'image_idx', 'image_path', 'image_shape'},
    'point_cloud': {'velodyne_path'},       # VoD stores RADAR here
    'calib':       {'P2', 'R0_rect', 'Tr_velo_to_cam'},
    'annos':       {'name', 'location', 'dimensions', 'rotation_y',
                    'bbox', 'truncated', 'occluded', 'alpha'},
  }

Annotations live in the rectified CAMERA frame; ``get_ann_info`` converts
them to gravity-centered lidar-frame boxes via
``core.box_modes.convert_boxes`` with the real ``inv(R0_rect @
Tr_velo_to_cam)`` extrinsic (kitti_dataset.py:172-206 semantics).
Evaluation goes through ``evaluation.kitti_metrics.evaluate_kitti``
(AP_BEV/3D_R40 at the VoD thresholds, entire-area + driving-corridor).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Optional, Sequence

import numpy as np

from ..core.box_modes import CAM, LIDAR, convert_boxes
from ..evaluation.kitti_metrics import (
    VOD_CLASSES,
    VOD_CORRIDOR,
    evaluate_kitti,
)


def _pad4(m):
    out = np.eye(4)
    out[: m.shape[0], : m.shape[1]] = m
    return out


def kitti_anno_to_lidar(annos: Dict, rect: np.ndarray, trv2c: np.ndarray,
                        classes: Sequence[str] = VOD_CLASSES):
    """KITTI camera-frame annos -> (boxes_lidar [N, 7], labels [N]).

    KITTI boxes store (location = bottom center in rect-cam frame,
    dimensions = l, h, w, rotation_y); the array convention for mode
    conversion is (x, y, z, x_size=l, y_size=h, z_size=w, yaw) in CAM
    mode.  'DontCare' and unknown names get label -1.
    """
    names = np.asarray(annos["name"]).reshape(-1)
    n = len(names)
    if n == 0:
        return np.zeros((0, 7)), np.zeros((0,), np.int64)
    loc = np.asarray(annos["location"], np.float64).reshape(n, 3)
    dims = np.asarray(annos["dimensions"], np.float64).reshape(n, 3)  # l,h,w
    rots = np.asarray(annos["rotation_y"], np.float64).reshape(n, 1)
    cam_boxes = np.concatenate([loc, dims, rots], axis=1)
    lidar = convert_boxes(
        cam_boxes, CAM, LIDAR, rt_mat=np.linalg.inv(rect @ trv2c)[:3]
    )
    # bottom-center -> gravity center (the model convention, core/boxes.py)
    lidar[:, 2] += lidar[:, 5] / 2.0
    label_map = {name: i for i, name in enumerate(classes)}
    labels = np.asarray(
        [label_map.get(nm, -1) for nm in names], np.int64
    )
    return lidar, labels


class VoDDataset:
    """Minimal map-style VoD dataset over KITTI-format infos.

    Yields per-sample dicts with the single front camera, radar points
    (VoD's 'velodyne' files hold 7-dim radar: x, y, z, RCS, v_r,
    v_r_comp, time), calibration, and lidar-frame GT.  File IO is
    injectable for tests (``point_loader`` / ``image_loader``).
    """

    def __init__(
        self,
        info_path: str,
        data_root: str = "",
        classes: Sequence[str] = VOD_CLASSES,
        radar_dims: int = 7,
        max_radar_points: int = 1200,
        point_loader=None,
        image_loader=None,
        infos: Optional[list] = None,
    ):
        if infos is None:
            with open(info_path, "rb") as f:
                infos = pickle.load(f)
        self.infos = infos
        self.data_root = data_root
        self.classes = list(classes)
        self.radar_dims = radar_dims
        self.max_radar_points = max_radar_points
        self.point_loader = point_loader or self._load_points
        self.image_loader = image_loader

    def __len__(self):
        return len(self.infos)

    def _load_points(self, path):
        return np.fromfile(
            os.path.join(self.data_root, path), np.float32
        ).reshape(-1, self.radar_dims)

    def calib(self, index):
        c = self.infos[index]["calib"]
        rect = _pad4(np.asarray(c["R0_rect"], np.float64)[:3, :3])
        trv2c = _pad4(np.asarray(c["Tr_velo_to_cam"], np.float64)[:3, :4])
        p2 = _pad4(np.asarray(c["P2"], np.float64)[:3, :4])
        return rect, trv2c, p2

    def get_ann_info(self, index):
        rect, trv2c, _ = self.calib(index)
        return kitti_anno_to_lidar(
            self.infos[index]["annos"], rect, trv2c, self.classes
        )

    def __getitem__(self, index):
        info = self.infos[index]
        rect, trv2c, p2 = self.calib(index)
        pts = self.point_loader(info["point_cloud"]["velodyne_path"])
        n = min(len(pts), self.max_radar_points)
        radar = np.zeros((self.max_radar_points, pts.shape[-1]), np.float32)
        radar[:n] = pts[:n]
        mask = np.zeros((self.max_radar_points,), bool)
        mask[:n] = True
        gt_boxes, gt_labels = self.get_ann_info(index)
        sample = {
            "token": str(info["image"]["image_idx"]),
            "radar_points": radar,
            "radar_mask": mask,
            "lidar2img": (p2 @ rect @ trv2c).astype(np.float32),
            "lidar2cam": (rect @ trv2c).astype(np.float32),
            "gt_boxes": gt_boxes.astype(np.float32),
            "gt_labels": gt_labels,
        }
        if self.image_loader is not None:
            sample["image"] = self.image_loader(info["image"]["image_path"])
        return sample

    def evaluate(self, predictions, roi_corridor: bool = True):
        """predictions: {token: (boxes [N, >=7], scores, labels)} in the
        gravity-centered lidar frame.  Returns the VoD AP_R40 table for
        the entire annotated area and (optionally) the driving corridor.
        """
        gts = {
            str(info["image"]["image_idx"]): self.get_ann_info(i)
            for i, info in enumerate(self.infos)
        }
        out = evaluate_kitti(predictions, gts, classes=self.classes)
        if roi_corridor:
            corr = evaluate_kitti(
                predictions, gts, classes=self.classes, roi=VOD_CORRIDOR
            )
            out.update({f"corridor/{k}": v for k, v in corr.items()})
        return out
