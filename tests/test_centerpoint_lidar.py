"""CenterPoint-lidar (PointPillars) assembly tests."""

import jax
import jax.numpy as jnp
import numpy as np

from rcbevdet_tpu.models import CenterPointPillars
from rcbevdet_tpu.models.centerpoint_head import centerpoint_loss
from rcbevdet_tpu.core.targets import centerpoint_targets_single


def test_centerpoint_pillars_forward_and_loss(rng):
    model = CenterPointPillars(
        num_classes=4,
        max_pillars=256,
        max_points_per_pillar=8,
        pfn_channels=(16,),
        voxel_size=(1.0, 1.0, 8.0),
        point_cloud_range=(-16.0, -16.0, -5.0, 16.0, 16.0, 3.0),
        second_channels=(16, 32, 64),
        fpn_out_channels=(16, 16, 16),
    )
    b, n = 2, 300
    pts = rng.uniform(-15, 15, (b, n, 5)).astype(np.float32)
    pts[..., 2] = rng.uniform(-2, 1, (b, n))
    mask = rng.uniform(size=(b, n)) > 0.1
    preds = model.init(
        jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(mask)
    )
    out = model.apply(preds, jnp.asarray(pts), jnp.asarray(mask))
    # canvas 32x32 -> strides 2,2,2 with upsample (1,2,4) -> 16x16
    assert out["heatmap"].shape == (b, 16, 16, 4)
    assert out["reg"].shape == (b, 16, 16, 2)
    assert np.isfinite(np.asarray(out["heatmap"])).all()


def test_centerpoint_pillars_grads(rng):
    model = CenterPointPillars(
        num_classes=2,
        max_pillars=128,
        max_points_per_pillar=4,
        pfn_channels=(8,),
        voxel_size=(2.0, 2.0, 8.0),
        point_cloud_range=(-16.0, -16.0, -5.0, 16.0, 16.0, 3.0),
        second_channels=(8, 16, 32),
        fpn_out_channels=(8, 8, 8),
    )
    b, n = 1, 120
    pts = jnp.asarray(rng.uniform(-15, 15, (b, n, 5)).astype(np.float32))
    mask = jnp.ones((b, n), bool)
    variables = model.init(jax.random.PRNGKey(0), pts, mask)

    # one GT box; CPU-rendered targets like the training pipeline
    gt_boxes = np.array([[[0.0, 0.0, -1.0, 2.0, 2.0, 1.5, 0.3, 0.0, 0.0]]],
                        np.float32)
    gt_labels = np.array([[0]], np.int64)
    t = centerpoint_targets_single(
        gt_boxes[0], gt_labels[0], num_classes=2, grid_size=(16, 16),
        point_cloud_range=(-16.0, -16.0, -5.0, 16.0, 16.0, 3.0),
        voxel_size=(2.0, 2.0), out_size_factor=2, max_objs=8,
    )
    heat_t = jnp.asarray(t.heatmap)[None]
    anno_t = jnp.asarray(t.anno_box)[None]
    inds_t = jnp.asarray(t.inds)[None]
    mask_t = jnp.asarray(t.mask)[None]

    def loss_fn(params):
        preds, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pts, mask, train=True, mutable=["batch_stats"],
        )
        losses = centerpoint_loss(preds, heat_t, anno_t, inds_t, mask_t)
        return sum(losses.values())

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gsum = sum(float(jnp.abs(g).sum())
               for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gsum) and gsum > 0
