"""nuScenes radar-camera dataset, CBGS resampling, batching.

Re-design of ``NuScenesDatasetRC`` / ``Custom3DDatasetradar`` /
``CBGSDataset`` (reference datasets/nuscenes_dataset_rc.py:20,
custom_3d_radar.py:17, dataset_wrappers.py:8).  Consumes the same
``nuscenes_RC_infos_{train,val}.pkl`` files.  Each sample is a dict of fixed
-shape NumPy arrays (padded + masked) ready for device transfer, including
CPU-rendered CenterPoint targets (core/targets.py) — the TPU-first
replacement for the reference's on-device per-GT target loop.
"""

from __future__ import annotations

import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..core.boxes import transform_boxes_bda, transform_radar_points_bda
from ..core.targets import centerpoint_targets_single
from .depth_gt import points_to_depth_maps
from .image_pipeline import ImageAugConfig, prepare_image_inputs
from .radar_pipeline import load_radar_sweeps, pad_radar_points

CLASSES = (
    "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
    "motorcycle", "bicycle", "pedestrian", "traffic_cone",
)


def limit_period(val, offset=0.5, period=2 * np.pi):
    return val - np.floor(val / period + offset) * period


class NuScenesRCDataset:
    """Map-style dataset over a BEVDet-format infos pkl."""

    def __init__(
        self,
        ann_file,
        img_config: Optional[ImageAugConfig] = None,
        classes: Sequence[str] = CLASSES,
        is_train: bool = True,
        multi_adj_frame_ids: Sequence[int] = tuple(range(1, 9)),
        multi_adj_frame_ids_longterm: Optional[Sequence[int]] = None,
        radar_sweeps: int = 8,
        radar_max_num: int = 1200,
        point_cloud_range=(-51.2, -51.2, -5.0, 51.2, 51.2, 3.0),
        bda_aug_conf: Optional[dict] = None,
        grid_size=(1024, 1024),
        voxel_size=(0.1, 0.1),
        out_size_factor: int = 8,
        max_objs: int = 500,
        with_depth_gt: bool = True,
        seg_classes: Optional[Sequence[str]] = None,
        seg_xbound=(-50.0, 50.0, 0.5),
        seg_ybound=(-50.0, 50.0, 0.5),
        map_mask_fn=None,
        with_hop_targets: bool = False,
        hop_aux_task_groups=None,
        stereo: bool = False,
        use_valid_flag: bool = True,
        object_sampler=None,
        seed: int = 0,
        image_loader=None,
        pcd_loader=None,
        lidar_loader=None,
    ):
        self.img_config = img_config or ImageAugConfig()
        self.classes = list(classes)
        self.is_train = is_train
        self.adj_ids = list(multi_adj_frame_ids)
        # optional second, longer-stride history window (reference
        # get_adj_info_lt + PrepareImageInputsLongterm,
        # nuscenes_dataset_rc.py:318-327, pipelines/loading.py:1917; the
        # reference loads it as a separate pipeline step with its own
        # augmentation draw — data-side only, no shipped model consumes it)
        self.adj_ids_lt = (
            list(multi_adj_frame_ids_longterm)
            if multi_adj_frame_ids_longterm else None
        )
        self.stereo = stereo
        if stereo and self.adj_ids:
            # one extra reference frame for the temporal-stereo cost volume
            # (reference get_adj_info appends it, nuscenes_dataset_rc.py:332-335)
            self.adj_ids = self.adj_ids + [self.adj_ids[-1] + 1]
        self.radar_sweeps = radar_sweeps
        self.radar_max_num = radar_max_num
        self.pc_range = point_cloud_range
        self.bda_aug_conf = bda_aug_conf or dict(
            rot_lim=(-22.5, 22.5), scale_lim=(0.95, 1.05),
            flip_dx_ratio=0.5, flip_dy_ratio=0.5,
        )
        self.grid_size = grid_size
        self.voxel_size = voxel_size
        self.out_size_factor = out_size_factor
        self.max_objs = max_objs
        self.with_depth_gt = with_depth_gt
        self.seg_classes = list(seg_classes) if seg_classes else None
        self.seg_xbound = seg_xbound
        self.seg_ybound = seg_ybound
        self.map_mask_fn = map_mask_fn
        self.with_hop_targets = with_hop_targets
        self.hop_aux_task_groups = (
            tuple(map(tuple, hop_aux_task_groups))
            if hop_aux_task_groups else None
        )
        # GT-paste augmentation (data/dbsampler.py); the runner toggles
        # object_sample_enabled off for the fade epochs
        # (FadeOjectSampleHook counterpart)
        self.object_sampler = object_sampler
        self.object_sample_enabled = object_sampler is not None
        self.rng = np.random.default_rng(seed)
        self.image_loader = image_loader
        self.pcd_loader = pcd_loader
        self.lidar_loader = lidar_loader or self._load_lidar_bin

        if isinstance(ann_file, str):
            with open(ann_file, "rb") as f:
                data = pickle.load(f)
            infos = data["infos"]
            self.metadata = data.get("metadata", {})
        else:  # pre-loaded list of infos (tests)
            infos = ann_file
            self.metadata = {}
        self.data_infos = sorted(infos, key=lambda e: e["timestamp"])

    def __len__(self):
        return len(self.data_infos)

    @staticmethod
    def _load_lidar_bin(path):
        return np.fromfile(path, np.float32).reshape(-1, 5)

    def get_adj_infos(self, info, index, adj_ids=None):
        """Adjacent-frame infos, clamped to scene boundaries
        (reference nuscenes_dataset_rc.py:329-343; with ``adj_ids`` the
        long-term id list, the get_adj_info_lt variant :318-327)."""
        out = []
        for select_id in (self.adj_ids if adj_ids is None else adj_ids):
            sid = min(max(index - select_id, 0), len(self.data_infos) - 1)
            cand = self.data_infos[sid]
            out.append(cand if cand["scene_token"] == info["scene_token"] else info)
        return out

    def get_cat_ids(self, index):
        """Class ids present in a sample (for CBGS)."""
        boxes, labels = self.data_infos[index]["ann_infos"]
        return set(int(l) for l in labels)

    def sample_bda(self):
        if self.is_train:
            conf = self.bda_aug_conf
            rot = self.rng.uniform(*conf["rot_lim"])
            scale = self.rng.uniform(*conf["scale_lim"])
            flip_dx = self.rng.random() < conf["flip_dx_ratio"]
            flip_dy = self.rng.random() < conf["flip_dy_ratio"]
            return rot, scale, flip_dx, flip_dy
        return 0.0, 1.0, False, False

    def __getitem__(self, index) -> Dict[str, np.ndarray]:
        info = self.data_infos[index]
        adj_infos = self.get_adj_infos(info, index)

        sample = prepare_image_inputs(
            info, adj_infos, self.img_config, self.is_train, self.rng,
            image_loader=self.image_loader,
        )
        if self.adj_ids_lt:
            # independent augmentation draw, like the reference's separate
            # PrepareImageInputsLongterm pipeline step; frame 0 (the key
            # frame) is dropped — only the history window is kept
            lt_infos = self.get_adj_infos(info, index, adj_ids=self.adj_ids_lt)
            lt = prepare_image_inputs(
                info, lt_infos, self.img_config, self.is_train, self.rng,
                image_loader=self.image_loader,
            )
            for k in ("imgs", "sensor2keyegos", "intrins", "post_rots",
                      "post_trans"):
                sample[k + "_lt"] = lt[k][1:]
        if self.stereo:
            # current-sensor -> next-older-sensor chains, float64 on host
            # (reference prepare_inputs stereo branch, bevdet_rc.py:711-728)
            s2e = sample["sensor2egos"].astype(np.float64)
            e2g = sample["ego2globals"].astype(np.float64)
            cam2glob = e2g @ s2e  # [F, N, 4, 4]
            k2s = np.linalg.inv(cam2glob[1:]) @ cam2glob[:-1]
            sample["k2s_sensor"] = k2s.astype(np.float32)

        # ---- annotations + BDA ----
        ann = info["ann_infos"]
        gt_boxes, gt_labels = ann[0], ann[1]
        # per-ann GT attribute names, present in pkls written by
        # tools/create_data.py since the mAAE support ('' = no attribute);
        # older 2-tuple pkls still load
        gt_attrs = np.asarray(
            ann[2] if len(ann) > 2 else [""] * len(gt_labels), dtype=object
        )
        gt_boxes = np.asarray(gt_boxes, np.float32).reshape(-1, 9)
        gt_labels = np.asarray(gt_labels, np.int64).reshape(-1)
        pasted_radar = None
        if (self.object_sampler is not None and self.object_sample_enabled
                and self.is_train):
            # GT-paste BEFORE BDA, like the reference's ObjectSample stage
            # running ahead of GlobalRotScaleTrans (config pipeline order)
            n_orig = len(gt_labels)
            gt_boxes, gt_labels, pasted_radar = self.object_sampler.sample(
                gt_boxes, gt_labels
            )
            gt_attrs = np.concatenate(
                [gt_attrs,
                 np.asarray([""] * (len(gt_labels) - n_orig), object)]
            )
        rot, scale, flip_dx, flip_dy = self.sample_bda()
        gt_boxes, bda = transform_boxes_bda(gt_boxes, rot, scale, flip_dx, flip_dy)
        sample["bda"] = bda

        # ObjectRangeFilter (transforms_3d.py): BEV-range + yaw limiting
        if len(gt_boxes):
            pcr = self.pc_range
            keep = (
                (gt_boxes[:, 0] > pcr[0]) & (gt_boxes[:, 0] < pcr[3])
                & (gt_boxes[:, 1] > pcr[1]) & (gt_boxes[:, 1] < pcr[4])
            )
            gt_boxes, gt_labels = gt_boxes[keep], gt_labels[keep]
            gt_attrs = gt_attrs[keep]
            gt_boxes[:, 6] = limit_period(gt_boxes[:, 6], 0.5, 2 * np.pi)

        targets = centerpoint_targets_single(
            gt_boxes, gt_labels, num_classes=len(self.classes),
            grid_size=self.grid_size, point_cloud_range=self.pc_range,
            voxel_size=self.voxel_size, out_size_factor=self.out_size_factor,
            max_objs=self.max_objs,
        )
        sample["heatmap_t"] = targets.heatmap
        sample["anno_box_t"] = targets.anno_box
        sample["inds_t"] = targets.inds.astype(np.int32)
        sample["mask_t"] = targets.mask

        padded_boxes = np.zeros((self.max_objs, 9), np.float32)
        padded_labels = np.full((self.max_objs,), -1, np.int64)
        padded_attrs = np.asarray([""] * self.max_objs, dtype=object)
        n = min(len(gt_boxes), self.max_objs)
        padded_boxes[:n] = gt_boxes[:n]
        padded_labels[:n] = gt_labels[:n]
        padded_attrs[:n] = gt_attrs[:n]
        sample["gt_boxes"] = padded_boxes
        sample["gt_labels"] = padded_labels
        sample["gt_attrs"] = padded_attrs

        if self.seg_classes:
            # [H, W, C] rasterized masks (reference LoadBEVSegmentation,
            # pipelines/loading.py:2494-2622); vehicle from post-BDA boxes
            from .seg_targets import build_seg_masks

            sample["gt_masks_bev"] = build_seg_masks(
                self.seg_classes, gt_boxes, gt_labels, self.classes,
                self.seg_xbound, self.seg_ybound,
                location=info.get("location"),
                ego2global=info.get("ego2global"),
                map_mask_fn=self.map_mask_fn,
                flip_dx=flip_dx, flip_dy=flip_dy, scale=scale,
            )

        # ---- HoP auxiliary targets: frame t-1 GT under the same BDA ----
        # (reference builds img_meta['adj_gt_3d'] for the history decoder's
        # reconstruction loss, bevdet.py:1389-1396)
        if self.with_hop_targets and adj_infos and "ann_infos" in adj_infos[0]:
            aux_boxes, aux_labels = adj_infos[0]["ann_infos"]
            aux_boxes = np.asarray(aux_boxes, np.float32).reshape(-1, 9)
            aux_labels = np.asarray(aux_labels, np.int64).reshape(-1)
            aux_boxes, _ = transform_boxes_bda(
                aux_boxes, rot, scale, flip_dx, flip_dy
            )
            if len(aux_boxes):
                pcr = self.pc_range
                keep = (
                    (aux_boxes[:, 0] > pcr[0]) & (aux_boxes[:, 0] < pcr[3])
                    & (aux_boxes[:, 1] > pcr[1]) & (aux_boxes[:, 1] < pcr[4])
                )
                aux_boxes, aux_labels = aux_boxes[keep], aux_labels[keep]
                aux_boxes[:, 6] = limit_period(aux_boxes[:, 6], 0.5, 2 * np.pi)
            tkw = dict(
                grid_size=self.grid_size, point_cloud_range=self.pc_range,
                voxel_size=self.voxel_size,
                out_size_factor=self.out_size_factor, max_objs=self.max_objs,
            )
            if self.hop_aux_task_groups:
                # per-task targets for the reference's 6-task aux grouping
                # (det-...-withHoP-...py:194-200)
                from ..core.targets import centerpoint_targets_multi_task

                per_task = centerpoint_targets_multi_task(
                    aux_boxes, aux_labels, self.hop_aux_task_groups, **tkw
                )
                for tid, t in enumerate(per_task):
                    sample[f"aux{tid}_heatmap_t"] = t.heatmap
                    sample[f"aux{tid}_anno_box_t"] = t.anno_box
                    sample[f"aux{tid}_inds_t"] = t.inds.astype(np.int32)
                    sample[f"aux{tid}_mask_t"] = t.mask
            else:
                aux_t = centerpoint_targets_single(
                    aux_boxes, aux_labels, num_classes=len(self.classes),
                    **tkw,
                )
                sample["aux_heatmap_t"] = aux_t.heatmap
                sample["aux_anno_box_t"] = aux_t.anno_box
                sample["aux_inds_t"] = aux_t.inds.astype(np.int32)
                sample["aux_mask_t"] = aux_t.mask

        # ---- radar ----
        if "radars" in info:
            pts = load_radar_sweeps(
                info["radars"], sweeps_num=self.radar_sweeps,
                pcd_loader=self.pcd_loader,
            )
            if pasted_radar is not None and len(pasted_radar):
                pts = np.concatenate(
                    [pts, pasted_radar[:, : pts.shape[1]]], axis=0
                )
            pts = transform_radar_points_bda(pts, bda)
            radar, radar_mask = pad_radar_points(
                pts, self.radar_max_num,
                rng=self.rng if self.is_train else None,
            )
            sample["radar_points"] = radar
            sample["radar_mask"] = radar_mask

        # ---- depth GT (train only) ----
        if self.with_depth_gt and self.is_train and "lidar_path" in info:
            lidar = self.lidar_loader(info["lidar_path"])
            sample["gt_depth"] = points_to_depth_maps(
                lidar, info, list(self.img_config.cams),
                sample["intrins"][0], sample["post_rots"][0],
                sample["post_trans"][0], self.img_config.input_size,
            )

        sample["token"] = info["token"]
        return sample


def cbgs_indices(dataset, rng=None):
    """Class-balanced resampling index list (reference
    dataset_wrappers.py:8-75): duplicate sample indices so every class makes
    up ~1/num_classes of the (index, class) pairs."""
    rng = rng or np.random.default_rng(0)
    num_classes = len(dataset.classes)
    class_sample_idxs = {i: [] for i in range(num_classes)}
    for idx in range(len(dataset)):
        for cat in dataset.get_cat_ids(idx):
            if 0 <= cat < num_classes:
                class_sample_idxs[cat].append(idx)
    duplicated = sum(len(v) for v in class_sample_idxs.values())
    if duplicated == 0:
        return list(range(len(dataset)))
    frac = 1.0 / num_classes
    indices = []
    for cls_inds in class_sample_idxs.values():
        if not cls_inds:
            continue
        ratio = frac / (len(cls_inds) / duplicated)
        take = int(len(cls_inds) * ratio)
        indices += rng.choice(cls_inds, take).tolist()
    return indices


def collate_samples(samples: List[Dict[str, np.ndarray]]):
    """Stack per-sample dicts into batch arrays (tokens kept as a list)."""
    out = {}
    for key in samples[0]:
        if key in ("token", "gt_attrs"):
            # host-side metadata: tokens are strings, gt_attrs are
            # attribute-name object arrays — never device inputs
            out[key] = [s[key] for s in samples]
        else:
            out[key] = np.stack([s[key] for s in samples])
    return out
