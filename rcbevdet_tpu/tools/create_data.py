"""nuScenes RC data preparation.

Counterpart of the reference's tools/create_data_nuscenes_RC.py +
tools/data_converter/nuscenes_converter_RC.py: builds
``nuscenes_RC_infos_{train,val}.pkl`` with per-sample camera calibrations,
lidar path, 5-radar sweep lists, and gravity-centered GT boxes in the key
CAM_FRONT ego frame.

Requires nuscenes-devkit (the only stage that does — training/eval consume
the pkl without it).  Run:
  python -m rcbevdet_tpu.tools.create_data --root data/nuscenes \
      --version v1.0-trainval --out-prefix nuscenes_RC
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

RADAR_NAMES = (
    "RADAR_FRONT", "RADAR_FRONT_LEFT", "RADAR_FRONT_RIGHT",
    "RADAR_BACK_LEFT", "RADAR_BACK_RIGHT",
)
CAM_NAMES = (
    "CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
    "CAM_BACK_LEFT", "CAM_BACK", "CAM_BACK_RIGHT",
)
NAME_MAP = {
    "human.pedestrian.adult": "pedestrian",
    "human.pedestrian.child": "pedestrian",
    "human.pedestrian.wheelchair": "ignore",
    "human.pedestrian.stroller": "ignore",
    "human.pedestrian.personal_mobility": "ignore",
    "human.pedestrian.police_officer": "pedestrian",
    "human.pedestrian.construction_worker": "pedestrian",
    "animal": "ignore",
    "vehicle.car": "car",
    "vehicle.motorcycle": "motorcycle",
    "vehicle.bicycle": "bicycle",
    "vehicle.bus.bendy": "bus",
    "vehicle.bus.rigid": "bus",
    "vehicle.truck": "truck",
    "vehicle.construction": "construction_vehicle",
    "vehicle.emergency.ambulance": "ignore",
    "vehicle.emergency.police": "ignore",
    "vehicle.trailer": "trailer",
    "movable_object.barrier": "barrier",
    "movable_object.trafficcone": "traffic_cone",
    "movable_object.pushable_pullable": "ignore",
    "movable_object.debris": "ignore",
    "static_object.bicycle_rack": "ignore",
}
CLASSES = (
    "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
    "motorcycle", "bicycle", "pedestrian", "traffic_cone",
)


def _require_devkit():
    try:
        from nuscenes import NuScenes  # noqa: F401
        from nuscenes.utils import splits  # noqa: F401
    except ImportError as e:
        raise SystemExit(
            "nuscenes-devkit is required for data preparation (only). "
            "pip install nuscenes-devkit, then re-run."
        ) from e


def _quat_list(q):
    return [q.w, q.x, q.y, q.z] if hasattr(q, "w") else list(q)


def _cam_info(nusc, sd_token):
    from pyquaternion import Quaternion

    sd = nusc.get("sample_data", sd_token)
    cs = nusc.get("calibrated_sensor", sd["calibrated_sensor_token"])
    pose = nusc.get("ego_pose", sd["ego_pose_token"])
    return dict(
        data_path=str(nusc.get_sample_data_path(sd_token)),
        sample_data_token=sd_token,
        sensor2ego_rotation=cs["rotation"],
        sensor2ego_translation=cs["translation"],
        ego2global_rotation=pose["rotation"],
        ego2global_translation=pose["translation"],
        cam_intrinsic=np.asarray(cs["camera_intrinsic"]),
        timestamp=sd["timestamp"],
    )


def _radar_sweeps(nusc, sample, radar_name, max_sweeps):
    """Walk the prev chain of one radar sensor, with sensor->lidar-frame
    transforms at the KEY timestamp (converter_RC.py:225-258)."""
    from pyquaternion import Quaternion

    lidar_sd = nusc.get("sample_data", sample["data"]["LIDAR_TOP"])
    l_cs = nusc.get("calibrated_sensor", lidar_sd["calibrated_sensor_token"])
    l_pose = nusc.get("ego_pose", lidar_sd["ego_pose_token"])
    l2e_r = Quaternion(l_cs["rotation"]).rotation_matrix
    l2e_t = np.asarray(l_cs["translation"])
    e2g_r = Quaternion(l_pose["rotation"]).rotation_matrix
    e2g_t = np.asarray(l_pose["translation"])

    sweeps = []
    sd_token = sample["data"][radar_name]
    while len(sweeps) < max_sweeps and sd_token:
        sd = nusc.get("sample_data", sd_token)
        cs = nusc.get("calibrated_sensor", sd["calibrated_sensor_token"])
        pose = nusc.get("ego_pose", sd["ego_pose_token"])
        s2e_r = Quaternion(cs["rotation"]).rotation_matrix
        s2e_t = np.asarray(cs["translation"])
        se2g_r = Quaternion(pose["rotation"]).rotation_matrix
        se2g_t = np.asarray(pose["translation"])
        # sensor (at sweep time) -> key lidar frame
        r = (np.linalg.inv(l2e_r) @ np.linalg.inv(e2g_r) @ se2g_r @ s2e_r)
        t = np.linalg.inv(l2e_r) @ (
            np.linalg.inv(e2g_r) @ (se2g_r @ s2e_t + se2g_t - e2g_t) - l2e_t
        )
        sweeps.append(
            dict(
                data_path=str(nusc.get_sample_data_path(sd_token)),
                timestamp=sd["timestamp"],
                sensor2lidar_rotation=r,
                sensor2lidar_translation=t,
            )
        )
        sd_token = sd["prev"]
    return sweeps


def _gt_from_sample(nusc, sample, info):
    """Gravity-centered boxes in the key CAM_FRONT ego frame
    (create_data_nuscenes_RC.py:44-75)."""
    from nuscenes.utils.data_classes import Box
    from pyquaternion import Quaternion

    rot = Quaternion(info["cams"]["CAM_FRONT"]["ego2global_rotation"]).inverse
    trans = -np.asarray(info["cams"]["CAM_FRONT"]["ego2global_translation"])
    gt_boxes, gt_labels, gt_attrs = [], [], []
    for ann_token in sample["anns"]:
        ann = nusc.get("sample_annotation", ann_token)
        name = NAME_MAP.get(ann["category_name"], "ignore")
        if name not in CLASSES:
            continue
        if ann["num_lidar_pts"] + ann["num_radar_pts"] <= 0:
            continue
        vel = nusc.box_velocity(ann_token)
        if np.any(np.isnan(vel)):
            vel = np.zeros(3)
        box = Box(ann["translation"], ann["size"], Quaternion(ann["rotation"]),
                  velocity=tuple(vel))
        box.translate(trans)
        box.rotate(rot)
        xyz = np.asarray(box.center)
        dxdydz = np.asarray(box.wlh)[[1, 0, 2]]
        yaw = box.orientation.yaw_pitch_roll[0]
        gt_boxes.append(np.concatenate([xyz, dxdydz, [yaw], box.velocity[:2]]))
        gt_labels.append(CLASSES.index(name))
        # GT attribute name ('' when the ann carries none) — what
        # NuScenesEval scores mAAE against; nuScenes anns have 0 or 1
        # attribute tokens
        ats = ann.get("attribute_tokens", [])
        gt_attrs.append(
            nusc.get("attribute", ats[0])["name"] if ats else ""
        )
    return gt_boxes, gt_labels, gt_attrs


def create_infos(root, version="v1.0-trainval", max_radar_sweeps=8):
    _require_devkit()
    from nuscenes import NuScenes
    from nuscenes.utils import splits

    nusc = NuScenes(version=version, dataroot=root, verbose=True)
    if "mini" in version:
        train_scenes, val_scenes = splits.mini_train, splits.mini_val
    elif "test" in version:
        train_scenes, val_scenes = splits.test, []
    else:
        train_scenes, val_scenes = splits.train, splits.val
    scene_name = {s["token"]: s["name"] for s in nusc.scene}

    train_infos, val_infos = [], []
    for sample in nusc.sample:
        lidar_sd = nusc.get("sample_data", sample["data"]["LIDAR_TOP"])
        l_cs = nusc.get("calibrated_sensor", lidar_sd["calibrated_sensor_token"])
        l_pose = nusc.get("ego_pose", lidar_sd["ego_pose_token"])
        info = dict(
            token=sample["token"],
            scene_token=sample["scene_token"],
            timestamp=sample["timestamp"],
            lidar_path=str(nusc.get_sample_data_path(sample["data"]["LIDAR_TOP"])),
            lidar2ego_rotation=l_cs["rotation"],
            lidar2ego_translation=l_cs["translation"],
            ego2global_rotation=l_pose["rotation"],
            ego2global_translation=l_pose["translation"],
            cams={},
            radars={},
        )
        for cam in CAM_NAMES:
            info["cams"][cam] = _cam_info(nusc, sample["data"][cam])
        for radar in RADAR_NAMES:
            info["radars"][radar] = _radar_sweeps(
                nusc, sample, radar, max_radar_sweeps
            )
        info["ann_infos"] = _gt_from_sample(nusc, sample, info)
        name = scene_name[sample["scene_token"]]
        if name in train_scenes:
            train_infos.append(info)
        elif name in val_scenes:
            val_infos.append(info)
    return train_infos, val_infos


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="data/nuscenes")
    p.add_argument("--version", default="v1.0-trainval")
    p.add_argument("--out-prefix", default="nuscenes_RC")
    p.add_argument("--max-radar-sweeps", type=int, default=8)
    args = p.parse_args(argv)

    train_infos, val_infos = create_infos(
        args.root, args.version, args.max_radar_sweeps
    )
    meta = dict(version=args.version)
    for split, infos in (("train", train_infos), ("val", val_infos)):
        path = os.path.join(args.root, f"{args.out_prefix}_infos_{split}.pkl")
        with open(path, "wb") as f:
            pickle.dump(dict(infos=infos, metadata=meta), f)
        print(f"wrote {path} ({len(infos)} samples)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
