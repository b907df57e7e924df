"""Build model / optimizer / datasets from a Config.

The thin counterpart of the reference's registry plumbing
(mmdet3d/models/builder.py): our configs name structured dataclasses rather
than string-typed registry entries, so building is direct construction.
"""

from __future__ import annotations

from typing import Optional

from .config import Config
from .data.dataset import NuScenesRCDataset
from .data.image_pipeline import ImageAugConfig
from .models.detectors import RCBEVDet, RCBEVDetConfig


def build_model_config(cfg: Config) -> RCBEVDetConfig:
    m = cfg.model
    gc = {k: tuple(v) for k, v in m["grid_config"].items()}
    return RCBEVDetConfig(
        input_size=tuple(m["input_size"]),
        img_backbone_type=m.get("img_backbone_type", "resnet"),
        resnet_depth=m.get("resnet_depth", 50),
        vovnet_spec=m.get("vovnet_spec", "V-99"),
        img_neck_channels=m.get("img_neck_channels", 512),
        num_trans_channels=m.get("num_trans_channels", 80),
        num_adj=m.get("num_adj", 8),
        grid_config=gc,
        aspp_mid_channels=m.get("aspp_mid_channels", 96),
        depth_net_type=m.get("depth_net_type", "bevdepth"),
        use_radar=m.get("use_radar", True),
        radar_in_channels=m.get("radar_in_channels", 7),
        radar_feat_channels=tuple(m.get("radar_feat_channels", (32, 64))),
        radar_voxel_size=tuple(m.get("radar_voxel_size", (0.2, 0.2, 8.0))),
        point_cloud_range=tuple(m.get("point_cloud_range", cfg.point_cloud_range)),
        radar_max_pillars=m.get("radar_max_pillars", 1200),
        radar_max_points_per_pillar=m.get("radar_max_points_per_pillar", 10),
        radar_canvas=tuple(m.get("radar_canvas", (512, 512))),
        radar_second_channels=tuple(m.get("radar_second_channels", (64, 128, 256))),
        radar_second_layers=tuple(m.get("radar_second_layers", (3, 5, 5))),
        radar_fpn_channels=tuple(m.get("radar_fpn_channels", (128, 128, 128))),
        imc=m.get("imc", 256),
        bev_size=m.get("bev_size", 128),
        num_classes=m.get("num_classes", 10),
        freeze_img=m.get("freeze_img", False),
        bev_pool_impl=m.get("bev_pool_impl", "xla"),
        with_hop=m.get("with_hop", False),
        hop_embed_dims=m.get("hop_embed_dims", 160),
        stereo=m.get("stereo", False),
        compute_dtype=m.get("compute_dtype", None),
        train_camera_dtype=m.get("train_camera_dtype", None),
    )


def build_model(cfg: Config) -> tuple:
    """Build the detector named by ``cfg.model['type']`` (the reference's
    ``DETECTORS.build`` analog; defaults to the RCBEVDet family — all the
    shipped rcbevdet/det configs — with RCBEVDetPlusPlus selectable for
    the sparse-query decoder family)."""
    mtype = cfg.model.get("type", "RCBEVDet")
    if mtype == "RCBEVDetPlusPlus":
        from .models.rcbevdetpp import RCBEVDetPlusPlus

        m = cfg.model
        model = RCBEVDetPlusPlus(
            dim=m.get("dim", 256),
            num_queries=m.get("num_queries", 200),
            num_layers=m.get("num_layers", 3),
            num_classes=m.get("num_classes", 10),
            num_points=m.get("num_points", 8),
            depth=m.get("resnet_depth", 50),
            point_cloud_range=tuple(
                m.get("point_cloud_range", cfg.point_cloud_range)
            ),
        )
        return model, None
    mc = build_model_config(cfg)
    return RCBEVDet(mc), mc


def build_image_aug_config(cfg: Config) -> ImageAugConfig:
    d = cfg.data_config
    return ImageAugConfig(
        cams=tuple(d["cams"]),
        input_size=tuple(d["input_size"]),
        src_size=tuple(d.get("src_size", (900, 1600))),
        resize=tuple(d.get("resize", (0.0, 0.0))),
        rot=tuple(d.get("rot", (0.0, 0.0))),
        flip=d.get("flip", False),
        crop_h=tuple(d.get("crop_h", (0.0, 0.0))),
        resize_test=d.get("resize_test", 0.0),
    )


def build_dataset(cfg: Config, split="train", **overrides) -> NuScenesRCDataset:
    mc = build_model_config(cfg)
    dcfg = cfg.data[split]
    tcfg = cfg.get("train_cfg", {})
    adj = tuple(range(*cfg.multi_adj_frame_id_cfg))
    kwargs = dict(
        ann_file=dcfg["ann_file"],
        img_config=build_image_aug_config(cfg),
        classes=cfg.class_names,
        is_train=(split == "train"),
        multi_adj_frame_ids=adj,
        radar_sweeps=cfg.data.get("radar_sweeps", 8),
        radar_max_num=cfg.data.get("radar_max_num", 1200),
        point_cloud_range=tuple(cfg.point_cloud_range),
        bda_aug_conf=cfg.get("bda_aug_conf"),
        grid_size=tuple(tcfg.get("grid_size", (1024, 1024))[:2]),
        voxel_size=tuple(tcfg.get("voxel_size", (0.1, 0.1))[:2]),
        out_size_factor=tcfg.get("out_size_factor", 8),
        max_objs=tcfg.get("max_objs", 500),
        with_depth_gt=(split == "train"),
        with_hop_targets=(split == "train" and mc.with_hop),
        hop_aux_task_groups=mc.hop_aux_task_groups if mc.with_hop else None,
        stereo=mc.stereo,
    )
    kwargs.update(overrides)
    return NuScenesRCDataset(**kwargs)


def build_test_cfg(cfg: Config) -> dict:
    t = cfg.test_cfg
    return dict(
        pc_range=tuple(t["pc_range"]),
        voxel_size=tuple(t["voxel_size"]),
        out_size_factor=t["out_size_factor"],
        post_center_range=tuple(t["post_center_limit_range"]),
        max_num=t.get("max_per_img", 500),
        score_threshold=t.get("score_threshold", 0.1),
        nms_type=t.get("nms_type", "rotate"),
        nms_thr=t.get("nms_thr", 0.2),
        nms_rescale_factor=tuple(t.get("nms_rescale_factor", (1.0,) * 10)),
        pre_max_size=t.get("pre_max_size", 1000),
        post_max_size=t.get("post_max_size", 500),
        min_radius=tuple(t.get("min_radius", (4, 12, 10, 1, 0.85, 0.175))),
    )
