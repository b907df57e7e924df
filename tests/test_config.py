"""Config system + builders."""

import os

import numpy as np

from rcbevdet_tpu.builder import (
    build_image_aug_config,
    build_model_config,
    build_test_cfg,
)
from rcbevdet_tpu.config import Config

CFG_DIR = os.path.join(
    os.path.dirname(__file__), "..", "rcbevdet_tpu", "configs", "rcbevdet"
)


def test_rc_config_loads():
    cfg = Config.fromfile(
        os.path.join(CFG_DIR, "rcbevdet-256x704-r50-BEV128-9kf-depth-cbgs12e.py")
    )
    assert cfg.model["type"] == "RCBEVDet"
    assert cfg.point_cloud_range[0] == -51.2  # from _base_ nus-3d.py
    assert cfg.class_names[0] == "car"
    mc = build_model_config(cfg)
    assert mc.use_radar and mc.freeze_img
    assert mc.num_frames == 9
    assert mc.rac == 384
    assert mc.grid_config["depth"] == (1.0, 60.0, 0.5)
    tc = build_test_cfg(cfg)
    assert tc["nms_type"] == "rotate"
    assert len(tc["nms_rescale_factor"]) == 10
    ic = build_image_aug_config(cfg)
    assert ic.input_size == (256, 704)


def test_camera_config_inherits_and_overrides():
    cfg = Config.fromfile(
        os.path.join(CFG_DIR, "det-256x704-r50-BEV128-9kf-depth-cbgs.py")
    )
    mc = build_model_config(cfg)
    assert not mc.use_radar
    assert not mc.freeze_img
    # inherited from the RC config
    assert mc.num_trans_channels == 80
    assert cfg.runner["max_epochs"] == 8
    tc = build_test_cfg(cfg)
    # reference det-...-circlelarger.py:150 ships Scale-NMS (nms_type=['rotate'])
    assert tc["nms_type"] == "rotate"


def test_cfg_options_override():
    cfg = Config.fromfile(
        os.path.join(CFG_DIR, "rcbevdet-256x704-r50-BEV128-9kf-depth-cbgs12e.py")
    )
    cfg.merge_from_options({"model.num_adj": "2", "optimizer.lr": "0.001"})
    assert cfg.model["num_adj"] == 2
    assert cfg.optimizer["lr"] == 0.001
    mc = build_model_config(cfg)
    assert mc.num_frames == 3
