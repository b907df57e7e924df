"""Multi-task CenterHead: grouping, targets, losses, merged decode."""

import jax
import jax.numpy as jnp
import numpy as np

from rcbevdet_tpu.core.targets import centerpoint_targets_multi_task
from rcbevdet_tpu.inference import decode_predictions_multi
from rcbevdet_tpu.models.centerpoint_head import (
    NUSCENES_TASK_GROUPS,
    MultiTaskCenterHead,
    multi_task_loss,
)

KW = dict(
    grid_size=(128, 128), point_cloud_range=(-6.4, -6.4, -5, 6.4, 6.4, 3),
    voxel_size=(0.1, 0.1), out_size_factor=8, max_objs=20,
)


def test_multi_task_targets_grouping():
    boxes = np.zeros((3, 9), np.float32)
    boxes[:, 3:6] = 2.0
    boxes[0, :2] = (1.0, 1.0)   # class 0 (car) -> task 0
    boxes[1, :2] = (-1.0, 2.0)  # class 2 (constr) -> task 1 local id 1
    boxes[2, :2] = (3.0, -2.0)  # class 9 (cone) -> task 5 local id 1
    labels = np.array([0, 2, 9])
    tgts = centerpoint_targets_multi_task(boxes, labels, NUSCENES_TASK_GROUPS, **KW)
    assert len(tgts) == 6
    assert tgts[0].heatmap.shape == (1, 16, 16)
    assert tgts[1].heatmap.shape == (2, 16, 16)
    assert tgts[0].mask.sum() == 1
    assert tgts[1].mask.sum() == 1
    assert tgts[1].heatmap[1].max() == 1.0  # local id 1
    assert tgts[2].mask.sum() == 0
    assert tgts[5].heatmap[1].max() == 1.0


def test_multi_task_head_and_loss(rng):
    head = MultiTaskCenterHead(in_channels=16, share_conv_channel=8)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 16)), jnp.float32)
    variables = head.init(jax.random.PRNGKey(0), x)
    preds = head.apply(variables, x)
    assert len(preds) == 6
    assert preds[0]["heatmap"].shape == (1, 16, 16, 1)
    assert preds[1]["heatmap"].shape == (1, 16, 16, 2)

    boxes = np.zeros((2, 9), np.float32)
    boxes[:, 3:6] = 2.0
    labels = np.array([0, 3])
    tgts = centerpoint_targets_multi_task(boxes, labels, NUSCENES_TASK_GROUPS, **KW)
    task_targets = [
        (
            jnp.asarray(t.heatmap)[None], jnp.asarray(t.anno_box)[None],
            jnp.asarray(t.inds.astype(np.int32))[None], jnp.asarray(t.mask)[None],
        )
        for t in tgts
    ]
    losses = multi_task_loss(preds, task_targets)
    assert len(losses) == 6 * 6
    for v in losses.values():
        assert np.isfinite(float(v))


def test_multi_task_decode_merges_global_labels(rng):
    head = MultiTaskCenterHead(in_channels=8, share_conv_channel=8)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 8)), jnp.float32)
    variables = head.init(jax.random.PRNGKey(0), x)
    preds = head.apply(variables, x)
    cfg = dict(
        pc_range=(-6.4, -6.4), voxel_size=(0.1, 0.1), out_size_factor=8,
        post_center_range=(-10, -10, -10, 10, 10, 10), max_num=10,
        score_threshold=0.0, nms_type="rotate", nms_thr=0.2,
        nms_rescale_factor=(1.0,) * 10, pre_max_size=100, post_max_size=50,
        min_radius=(4, 12, 10, 1, 0.85, 0.175),
    )
    dec = decode_predictions_multi(preds, NUSCENES_TASK_GROUPS, cfg)
    assert dec.bboxes.shape == (1, 60, 9)
    labels = np.asarray(dec.labels[0])
    # task 3 slots can only be global class 5 (barrier)
    np.testing.assert_array_equal(np.unique(labels[30:40]), [5])
    # task 1 slots are truck/construction_vehicle
    assert set(np.unique(labels[10:20])).issubset({1, 2})
