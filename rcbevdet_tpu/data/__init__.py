from .pcd import load_radar_pcd
from .image_pipeline import ImageAugConfig, prepare_image_inputs, sample_image_augmentation
from .radar_pipeline import load_radar_sweeps, pad_radar_points
from .depth_gt import points_to_depth_maps
from .dataset import NuScenesRCDataset, cbgs_indices, collate_samples
from .samplers import (
    DistributedGroupSampler,
    InfiniteGroupStreamSampler,
    scene_flags,
)
from .map_masks import nuscenes_map_mask_fn, polygon_map_mask_fn
from .synthetic import synthetic_batch, synthetic_sample

__all__ = [
    "load_radar_pcd",
    "ImageAugConfig",
    "prepare_image_inputs",
    "sample_image_augmentation",
    "load_radar_sweeps",
    "pad_radar_points",
    "points_to_depth_maps",
    "NuScenesRCDataset",
    "cbgs_indices",
    "collate_samples",
    "DistributedGroupSampler",
    "InfiniteGroupStreamSampler",
    "scene_flags",
    "nuscenes_map_mask_fn",
    "polygon_map_mask_fn",
    "synthetic_batch",
    "synthetic_sample",
]
from .vod_dataset import VoDDataset, kitti_anno_to_lidar
