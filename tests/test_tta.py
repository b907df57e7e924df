"""BEV-flip TTA wrapper (MultiScaleFlipAug3D / merge_aug counterpart)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rcbevdet_tpu.evaluation.tta import (
    FLIPS, flip_batch, predict_tta, unflip_boxes,
)


def test_unflip_is_inverse_of_bda_flip():
    """Flipping GT via the pipeline's bev_transform and then unflipping
    recovers the original boxes (yaw modulo 2*pi)."""
    from rcbevdet_tpu.core.boxes import transform_boxes_bda

    rng = np.random.default_rng(0)
    boxes = np.zeros((6, 9), np.float32)
    boxes[:, :3] = rng.uniform(-30, 30, (6, 3))
    boxes[:, 3:6] = rng.uniform(1, 4, (6, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, 6)
    boxes[:, 7:9] = rng.normal(0, 5, (6, 2))

    for name, (fdx, fdy) in FLIPS.items():
        flipped, _ = transform_boxes_bda(boxes, 0.0, 1.0, fdx, fdy)
        back = unflip_boxes(flipped, fdx, fdy)
        np.testing.assert_allclose(back[:, :6], boxes[:, :6], atol=1e-5)
        np.testing.assert_allclose(back[:, 7:9], boxes[:, 7:9], atol=1e-5)
        yaw_diff = (back[:, 6] - boxes[:, 6] + np.pi) % (2 * np.pi) - np.pi
        np.testing.assert_allclose(yaw_diff, 0.0, atol=1e-5)


def test_flip_batch_transforms_radar_and_bda():
    batch = {
        "bda": jnp.eye(3)[None],
        "radar_points": jnp.asarray(
            [[[1.0, 2.0, 0.5, 3.0, -4.0, 9.0, 7.0]]]
        ),
    }
    out = flip_batch(batch, True, False)
    np.testing.assert_allclose(np.asarray(out["bda"][0, 0, 0]), -1.0)
    p = np.asarray(out["radar_points"][0, 0])
    np.testing.assert_allclose(p, [-1.0, 2.0, 0.5, -3.0, -4.0, 9.0, 7.0])
    # identity flip returns the batch unchanged (no copy)
    assert flip_batch(batch, False, False) is batch


def test_predict_tta_runs_and_matches_single_on_identity(rng):
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from __graft_entry__ import _example_batch
    from rcbevdet_tpu.inference import predict
    from rcbevdet_tpu.models import RCBEVDet, RCBEVDetConfig

    cfg = RCBEVDetConfig(
        input_size=(32, 96), resnet_depth=18, img_neck_channels=32,
        num_trans_channels=8, num_adj=0,
        grid_config={"x": (-4.0, 4.0, 1.0), "y": (-4.0, 4.0, 1.0),
                     "z": (-5.0, 3.0, 8.0), "depth": (1.0, 5.0, 0.5)},
        aspp_mid_channels=8, radar_feat_channels=(8, 8),
        radar_voxel_size=(0.5, 0.5, 8.0),
        point_cloud_range=(-4.0, -4.0, -5.0, 4.0, 4.0, 3.0),
        radar_max_pillars=32, radar_max_points_per_pillar=4,
        radar_canvas=(32, 32), radar_second_channels=(8, 8, 8),
        radar_second_layers=(1, 1, 1), radar_fpn_channels=(8, 8, 8),
        rcs_r_max=2, imc=32, bev_size=8,
    )
    model = RCBEVDet(cfg)
    batch = _example_batch(cfg, b=1, n=1, nmax_radar=32, rng=rng)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    test_cfg = dict(
        pc_range=(-4.0, -4.0), voxel_size=(0.125, 0.125), out_size_factor=8,
        post_center_range=(-5.0, -5.0, -10.0, 5.0, 5.0, 10.0), max_num=20,
        score_threshold=0.0, nms_type="rotate", nms_thr=0.2,
        nms_rescale_factor=(1.0,) * 10, pre_max_size=100, post_max_size=20,
        min_radius=(1.0,),
    )
    single = predict(model, variables, batch, test_cfg=test_cfg)
    tta_id = predict_tta(
        model, variables, batch, test_cfg=test_cfg, flips=("none",)
    )
    np.testing.assert_allclose(tta_id[0][0], single[0][0], atol=1e-5)

    merged = predict_tta(
        model, variables, batch, test_cfg=test_cfg,
        flips=("none", "x", "y", "xy"),
    )
    boxes, scores, labels = merged[0]
    assert boxes.shape[1] == 9
    assert len(boxes) == len(scores) == len(labels)
    assert np.isfinite(boxes).all()
