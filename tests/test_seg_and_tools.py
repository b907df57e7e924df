"""BEV seg head, profiling utilities, log analysis."""

import jax
import jax.numpy as jnp
import numpy as np

from rcbevdet_tpu.models.seg_head import BEVSegHead, seg_iou, seg_loss
from rcbevdet_tpu.utils.profiling import flops_of, timeit


def test_seg_head_forward_and_loss(rng):
    head = BEVSegHead(classes=("vehicle", "drivable"), conv_channels=(16, 16))
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)), jnp.float32)
    variables = head.init(jax.random.PRNGKey(0), x)
    logits = head.apply(variables, x)
    assert logits.shape == (2, 16, 16, 2)
    masks = jnp.asarray(rng.random((2, 16, 16, 2)) > 0.5, jnp.float32)
    for lt in ("focal", "bce"):
        l = seg_loss(logits, masks, loss_type=lt)
        assert np.isfinite(float(l))
    iou = seg_iou(logits, masks)
    assert iou.shape == (2,)
    assert (np.asarray(iou) >= 0).all() and (np.asarray(iou) <= 1).all()


def test_seg_iou_perfect():
    masks = jnp.zeros((1, 8, 8, 1)).at[0, 2:5, 2:5, 0].set(1.0)
    logits = (masks - 0.5) * 100
    np.testing.assert_allclose(np.asarray(seg_iou(logits, masks)), 1.0)


def test_flops_of_matmul():
    a = jnp.ones((64, 64))
    cost = flops_of(lambda x: x @ x, a)
    # 64^3 MACs ~ 2*64^3 flops (XLA counts fused variants; just sanity-check
    # the right order of magnitude)
    assert cost["flops"] > 64**3


def test_timeit_runs():
    f = jax.jit(lambda x: x * 2)
    t = timeit(f, jnp.ones(8), iters=3, warmup=1)
    assert t >= 0


def test_analyze_logs(tmp_path):
    from rcbevdet_tpu.tools.analyze_logs import parse_log

    log = tmp_path / "t.log"
    log.write_text(
        '2026-01-01 epoch 0 iter 50/100 0.50s/it {"loss": 10.0}\n'
        '2026-01-01 epoch 0 iter 100/100 0.40s/it {"loss": 8.0}\n'
        "noise line\n"
    )
    recs = parse_log(str(log))
    assert len(recs) == 2
    assert recs[0]["loss"] == 10.0
    assert recs[1]["sec_per_iter"] == 0.40


def test_vehicle_mask_rasterization():
    """Axis-aligned box covers exactly the expected cells; rotation tested
    against points_in_rotated_boxes semantics."""
    from rcbevdet_tpu.data.seg_targets import rasterize_vehicle_mask

    classes = ["car", "pedestrian"]
    boxes = np.array([[0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0, 0.0, 0.0]])
    labels = np.array([0])
    m = rasterize_vehicle_mask(
        boxes, labels, classes, (-8.0, 8.0, 1.0), (-8.0, 8.0, 1.0)
    )
    assert m.shape == (16, 16)
    # box spans x in [-2, 2], y in [-1, 1]: cell centers -1.5..1.5 x, +-0.5 y
    ys, xs = np.nonzero(m)
    assert m.sum() == 8 and set(ys) == {7, 8} and set(xs) == {6, 7, 8, 9}
    # non-vehicle classes don't rasterize
    m2 = rasterize_vehicle_mask(
        boxes, np.array([1]), classes, (-8.0, 8.0, 1.0), (-8.0, 8.0, 1.0)
    )
    assert m2.sum() == 0


def test_seg_training_step(rng):
    """cfg.with_seg adds a seg head + loss; one train step updates it."""
    import jax
    import jax.numpy as jnp
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from test_models import tiny_config
    import dataclasses

    from __graft_entry__ import _example_batch
    from rcbevdet_tpu.models import RCBEVDet
    from rcbevdet_tpu.training.train_step import (
        create_train_state, make_optimizer, make_train_step,
    )

    cfg = dataclasses.replace(
        tiny_config(use_radar=True), with_seg=True, seg_classes=("vehicle",)
    )
    model = RCBEVDet(cfg)
    b = 1
    batch = _example_batch(cfg, b=b, rng=rng)
    ny = nx = cfg.bev_size
    batch["heatmap_t"] = jnp.zeros((b, 10, ny, nx)).at[:, 0, 4, 4].set(1.0)
    batch["anno_box_t"] = jnp.zeros((b, 100, 10))
    batch["inds_t"] = jnp.zeros((b, 100), jnp.int32)
    batch["mask_t"] = jnp.zeros((b, 100)).at[:, 0].set(1.0)
    batch["gt_masks_bev"] = (
        jnp.zeros((b, ny, nx, 1)).at[:, 4:8, 4:8].set(1.0)
    )
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    assert "pts_seg_head" in variables["params"]
    tx = make_optimizer(
        total_steps=10, freeze_img=True, params=variables["params"]
    )
    state = create_train_state(model, variables, tx)
    step = jax.jit(make_train_step(model, tx, cfg))
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss_seg"]))
    moved = sum(
        float(np.abs(np.asarray(a) - np.asarray(b_)).sum())
        for a, b_ in zip(
            jax.tree_util.tree_leaves(variables["params"]["pts_seg_head"]),
            jax.tree_util.tree_leaves(
                jax.device_get(new_state.params["pts_seg_head"])
            ),
        )
    )
    assert moved > 0.0
