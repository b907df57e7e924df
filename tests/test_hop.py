"""HoP auxiliary training: reconstruction decoder + aux head + losses."""

import jax
import jax.numpy as jnp
import numpy as np

from rcbevdet_tpu.models.hop import HoPTemporalPredictor
from rcbevdet_tpu.models.centerpoint_head import centerpoint_loss


def test_hop_predictor_shapes(rng):
    model = HoPTemporalPredictor(
        in_channels=8, embed_dims=16, out_channels=32, reduction=4,
        num_heads_short=2, num_heads_long=2,
    )
    frames = jnp.asarray(rng.standard_normal((2, 3, 8, 8, 8)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), frames)
    out = model.apply(variables, frames)
    assert out.shape == (2, 8, 8, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_hop_gradients_flow(rng):
    model = HoPTemporalPredictor(
        in_channels=8, embed_dims=16, out_channels=32, reduction=4,
        num_heads_short=2, num_heads_long=2,
    )
    frames = jnp.asarray(rng.standard_normal((1, 3, 8, 8, 8)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), frames)

    def loss(params, frames):
        out = model.apply({"params": params}, frames)
        return jnp.sum(out**2)

    g_params, g_frames = jax.grad(loss, argnums=(0, 1))(
        variables["params"], frames
    )
    total = sum(
        float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(g_params)
    )
    assert total > 0
    assert float(jnp.abs(g_frames).sum()) > 0


AUX_GROUPS = ((0,), (1, 2), (3, 4), (5,), (6, 7), (8, 9))


def test_hop_dataset_multitask_targets():
    """The reference HoP aux head groups 10 classes into 6 tasks
    (det-...-withHoP-...py:194-200); the dataset renders per-task targets."""
    from rcbevdet_tpu.data.synthetic import synthetic_sample

    sample, _ = synthetic_sample(
        num_adj=2, with_hop_targets=True, hop_aux_task_groups=AUX_GROUPS
    )
    for tid, group in enumerate(AUX_GROUPS):
        assert sample[f"aux{tid}_heatmap_t"].shape == (len(group), 128, 128)
        assert sample[f"aux{tid}_inds_t"].shape == (500,)
        assert sample[f"aux{tid}_mask_t"].shape == (500,)
    # single-task key absent in multi-task mode
    assert "aux_heatmap_t" not in sample


def test_hop_multitask_train_step(rng):
    """One jitted train step of a tiny HoP model with the 6-task aux head:
    per-task aux losses appear in the metrics and are finite."""
    import sys, os
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from __graft_entry__ import _example_batch
    from rcbevdet_tpu.core.targets import centerpoint_targets_multi_task
    from rcbevdet_tpu.models import RCBEVDet, RCBEVDetConfig
    from rcbevdet_tpu.training.train_step import (
        create_train_state, make_optimizer, make_train_step,
    )

    cfg = RCBEVDetConfig(
        input_size=(32, 96), resnet_depth=18, img_neck_channels=32,
        num_trans_channels=8, num_adj=2,
        grid_config={"x": (-4.0, 4.0, 1.0), "y": (-4.0, 4.0, 1.0),
                     "z": (-5.0, 3.0, 8.0), "depth": (1.0, 5.0, 0.5)},
        aspp_mid_channels=8, use_radar=False, imc=32, bev_size=8,
        freeze_img=True, with_hop=True, hop_embed_dims=16,
    )
    model = RCBEVDet(cfg)
    b = 1
    batch = _example_batch(cfg, b=b, n=1, nmax_radar=8, rng=rng)
    batch["heatmap_t"] = jnp.zeros((b, 10, 8, 8)).at[:, 0, 4, 4].set(1.0)
    batch["anno_box_t"] = jnp.zeros((b, 100, 10))
    batch["inds_t"] = jnp.zeros((b, 100), jnp.int32)
    batch["mask_t"] = jnp.zeros((b, 100)).at[:, 0].set(1.0)

    boxes = np.array([[0.5, 0.5, 0.0, 1.0, 1.0, 1.0, 0.1, 0.0, 0.0]])
    per_task = centerpoint_targets_multi_task(
        boxes, np.array([1]), AUX_GROUPS, grid_size=(64, 64),
        point_cloud_range=(-4.0, -4.0, -5.0, 4.0, 4.0, 3.0),
        voxel_size=(0.125, 0.125), out_size_factor=8, max_objs=100,
    )
    for tid, t in enumerate(per_task):
        batch[f"aux{tid}_heatmap_t"] = jnp.asarray(t.heatmap)[None]
        batch[f"aux{tid}_anno_box_t"] = jnp.asarray(t.anno_box)[None]
        batch[f"aux{tid}_inds_t"] = jnp.asarray(t.inds.astype(np.int32))[None]
        batch[f"aux{tid}_mask_t"] = jnp.asarray(t.mask)[None]

    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    # the 6-task aux head exists with per-task heatmap widths
    aux_params = variables["params"]["aux_bbox_head"]
    assert "task0" in aux_params and "task5" in aux_params

    tx = make_optimizer(
        total_steps=4, freeze_img=True, params=variables["params"]
    )
    state = create_train_state(model, variables, tx)
    step = jax.jit(make_train_step(model, tx, cfg))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    aux_keys = [k for k in metrics if k.startswith("aux_task")]
    assert len(aux_keys) == 6 * 6  # 6 tasks x 6 loss components
    for k in aux_keys:
        assert np.isfinite(float(metrics[k])), k


def test_hop_dataset_targets():
    from rcbevdet_tpu.data.synthetic import synthetic_sample

    sample, _ = synthetic_sample(num_adj=2, with_hop_targets=True)
    assert sample["aux_heatmap_t"].shape == (10, 128, 128)
    assert sample["aux_inds_t"].shape == (500,)
    # aux losses compute on the rendered targets
    h, w = 128, 128
    preds = {
        "heatmap": jnp.zeros((1, h, w, 10)),
        "reg": jnp.zeros((1, h, w, 2)),
        "height": jnp.zeros((1, h, w, 1)),
        "dim": jnp.zeros((1, h, w, 3)),
        "rot": jnp.zeros((1, h, w, 2)),
        "vel": jnp.zeros((1, h, w, 2)),
    }
    losses = centerpoint_loss(
        preds,
        jnp.asarray(sample["aux_heatmap_t"])[None],
        jnp.asarray(sample["aux_anno_box_t"])[None],
        jnp.asarray(sample["aux_inds_t"])[None],
        jnp.asarray(sample["aux_mask_t"])[None],
        cls_weight=0.5, bbox_weight=0.125,
    )
    for v in losses.values():
        assert np.isfinite(float(v))
