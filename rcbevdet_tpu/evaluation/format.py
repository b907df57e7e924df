"""nuScenes result JSON formatting.

Mirrors ``NuScenesDatasetRC._format_bbox`` (reference
datasets/nuscenes_dataset_rc.py:394-480): detection-frame boxes are moved to
the global frame via the sample's ego pose, velocities rotated along, and a
default attribute assigned per class from the speed rule.  The output dict
is the official ``results_nusc.json`` schema consumed by nuscenes-devkit.
"""

from __future__ import annotations

import json
from typing import Dict

import numpy as np

from ..data.image_pipeline import quaternion_matrix

DEFAULT_ATTRIBUTES = {
    "car": "vehicle.parked",
    "pedestrian": "pedestrian.moving",
    "trailer": "vehicle.parked",
    "truck": "vehicle.parked",
    "bus": "vehicle.moving",
    "motorcycle": "cycle.without_rider",
    "construction_vehicle": "vehicle.parked",
    "bicycle": "cycle.without_rider",
    "barrier": "",
    "traffic_cone": "",
}


def _yaw_to_quaternion(yaw):
    return [float(np.cos(yaw / 2)), 0.0, 0.0, float(np.sin(yaw / 2))]


def _attribute_for(name, velocity):
    """The reference's speed-based default-attribute rule
    (nuscenes_dataset_rc.py:433-453): moving vehicles/cycles get the
    moving attribute; SLOW pedestrians/buses get standing/stopped; all
    else falls back to the class default."""
    speed = float(np.hypot(velocity[0], velocity[1]))
    if speed > 0.2:
        if name in ("car", "construction_vehicle", "bus", "truck", "trailer"):
            return "vehicle.moving"
        if name in ("bicycle", "motorcycle"):
            return "cycle.with_rider"
    else:
        if name == "pedestrian":
            return "pedestrian.standing"
        if name == "bus":
            return "vehicle.stopped"
    return DEFAULT_ATTRIBUTES[name]


def format_nuscenes_results(
    predictions: Dict[str, tuple],
    infos_by_token: Dict[str, dict],
    class_names,
    out_path=None,
):
    """predictions: {token: (boxes [N, 9] gravity-centered detection-frame,
    scores [N], labels [N])}.  Returns the nuScenes submission dict."""
    results = {}
    for token, (boxes, scores, labels) in predictions.items():
        info = infos_by_token[token]
        # detection frame == key CAM_FRONT ego frame (converter get_gt);
        # move to global via that ego pose.
        e2g_front = info["cams"]["CAM_FRONT"]
        rot = quaternion_matrix(e2g_front["ego2global_rotation"])
        tran = np.asarray(e2g_front["ego2global_translation"], np.float64)
        yaw_ego = np.arctan2(rot[1, 0], rot[0, 0])

        anns = []
        for b, s, l in zip(np.asarray(boxes), np.asarray(scores), np.asarray(labels)):
            name = class_names[int(l)]
            center = rot @ b[:3] + tran
            vel = rot[:2, :2] @ b[7:9]
            yaw = float(b[6]) + yaw_ego
            anns.append(
                dict(
                    sample_token=token,
                    translation=[float(v) for v in center],
                    size=[float(b[4]), float(b[3]), float(b[5])],  # wlh
                    rotation=_yaw_to_quaternion(yaw),
                    velocity=[float(v) for v in vel],
                    detection_name=name,
                    detection_score=float(s),
                    attribute_name=_attribute_for(name, vel),
                )
            )
        results[token] = anns

    submission = dict(
        meta=dict(
            use_camera=True, use_lidar=False, use_radar=True,
            use_map=False, use_external=False,
        ),
        results=results,
    )
    if out_path is not None:
        with open(out_path, "w") as f:
            json.dump(submission, f)
    return submission
