"""End-to-end model smoke tests on a tiny configuration (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rcbevdet_tpu.models import RCBEVDet, RCBEVDetConfig, centerpoint_loss
from rcbevdet_tpu.models.view_transformer import depth_loss


def tiny_config(use_radar=True, freeze_img=True):
    return RCBEVDetConfig(
        input_size=(64, 176),
        resnet_depth=18,
        img_neck_channels=64,
        num_trans_channels=16,
        num_adj=1,
        grid_config={
            "x": (-8.0, 8.0, 1.0),
            "y": (-8.0, 8.0, 1.0),
            "z": (-5.0, 3.0, 8.0),
            "depth": (1.0, 9.0, 0.5),
        },
        aspp_mid_channels=16,
        use_radar=use_radar,
        radar_feat_channels=(8, 16),
        radar_voxel_size=(0.25, 0.25, 8.0),
        point_cloud_range=(-8.0, -8.0, -5.0, 8.0, 8.0, 3.0),
        radar_max_pillars=64,
        radar_max_points_per_pillar=4,
        radar_canvas=(64, 64),
        radar_second_channels=(16, 32, 64),
        radar_second_layers=(1, 1, 1),
        radar_fpn_channels=(16, 16, 16),
        rcs_r_max=4,
        imc=64,
        bev_size=16,
        num_classes=10,
        freeze_img=freeze_img,
    )


def tiny_batch(rng, cfg, b=1, n=2):
    f = cfg.num_frames
    h, w = cfg.input_size
    eye4 = np.broadcast_to(np.eye(4, dtype=np.float32), (b, f, n, 4, 4)).copy()
    eye4[..., 0, 3] = 0.5  # small translation
    intr = np.broadcast_to(np.eye(3, dtype=np.float32), (b, f, n, 3, 3)).copy()
    intr[..., 0, 0] = 100.0
    intr[..., 1, 1] = 100.0
    intr[..., 0, 2] = w / 2
    intr[..., 1, 2] = h / 2
    batch = {
        "imgs": rng.standard_normal((b, f, n, h, w, 3)).astype(np.float32),
        "sensor2keyegos": eye4,
        "intrins": intr,
        "post_rots": np.broadcast_to(
            np.eye(3, dtype=np.float32), (b, f, n, 3, 3)
        ).copy(),
        "post_trans": np.zeros((b, f, n, 3), np.float32),
        "bda": np.broadcast_to(np.eye(3, dtype=np.float32), (b, 3, 3)).copy(),
        "radar_points": (rng.standard_normal((b, 96, 7)) * 4).astype(np.float32),
        "radar_mask": np.ones((b, 96), bool),
    }
    return {k: jnp.asarray(v) for k, v in batch.items()}


@pytest.fixture(scope="module")
def rc_setup():
    cfg = tiny_config(use_radar=True)
    model = RCBEVDet(cfg)
    rng = np.random.default_rng(1)
    batch = tiny_batch(rng, cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    return cfg, model, batch, variables


def test_rcbevdet_forward_shapes(rc_setup):
    cfg, model, batch, variables = rc_setup
    preds, depth = model.apply(variables, batch, train=False)
    assert preds["heatmap"].shape == (1, 16, 16, 10)
    assert preds["reg"].shape == (1, 16, 16, 2)
    assert preds["dim"].shape == (1, 16, 16, 3)
    assert depth.shape == (1, 2, 4, 11, 16)
    np.testing.assert_allclose(
        np.asarray(depth.sum(-1)), 1.0, rtol=1e-4
    )  # softmax over bins
    for v in preds.values():
        assert np.isfinite(np.asarray(v)).all()


def test_rcbevdet_train_loss_and_grads(rc_setup):
    cfg, model, batch, variables = rc_setup
    params = variables["params"]
    heat_t = np.zeros((1, 10, 16, 16), np.float32)
    heat_t[0, 3, 8, 8] = 1.0
    anno_t = np.zeros((1, 500, 10), np.float32)
    inds_t = np.zeros((1, 500), np.int32)
    inds_t[0, 0] = 8 * 16 + 8
    mask_t = np.zeros((1, 500), np.float32)
    mask_t[0, 0] = 1.0
    gt_depth = np.zeros((1, 2, 64, 176), np.float32)
    gt_depth[0, :, ::7, ::11] = 5.0

    def loss_fn(params):
        (preds, depth), updates = model.apply(
            {**variables, "params": params}, batch, train=True,
            mutable=["batch_stats"],
        )
        losses = centerpoint_loss(
            preds, jnp.asarray(heat_t), jnp.asarray(anno_t),
            jnp.asarray(inds_t), jnp.asarray(mask_t),
        )
        losses["loss_depth"] = depth_loss(
            jnp.asarray(gt_depth), depth, cfg.downsample,
            cfg.grid_config["depth"],
        )
        return sum(losses.values()), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(total))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    # radar/fusion/head branches receive gradients
    gnorm = jax.tree_util.tree_map(lambda g: float(jnp.abs(g).sum()), grads)
    flat = jax.tree_util.tree_leaves_with_path(gnorm)
    camf_g = sum(v for p, v in flat if "camf" in jax.tree_util.keystr(p))
    head_g = sum(v for p, v in flat if "pts_bbox_head" in jax.tree_util.keystr(p))
    radar_g = sum(v for p, v in flat if "radar" in jax.tree_util.keystr(p))
    assert camf_g > 0 and head_g > 0 and radar_g > 0


def test_train_lss_pool_tables_match_dense_forward_and_grads():
    """batch['lss_pool'] (loader-precomputed accelerate-mode train pooling,
    ROADMAP r5 lever 1) must reproduce the dense train path: forward preds
    AND parameter gradients — camera UNFROZEN so cotangents actually flow
    through the custom-VJP pool on the key frame."""
    from rcbevdet_tpu.models.view_transformer import make_lss_pool_transform

    cfg = tiny_config(use_radar=True, freeze_img=False)
    model = RCBEVDet(cfg)
    rng = np.random.default_rng(5)
    batch = tiny_batch(rng, cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    tf = make_lss_pool_transform(cfg, point_fraction=1.0)
    b_np = {k: np.asarray(v) for k, v in batch.items()}
    b_np = tf(b_np)
    assert b_np["lss_pool"]["perm"].shape[:2] == (1, cfg.num_frames)
    batch_meta = dict(batch)
    batch_meta["lss_pool"] = jax.tree_util.tree_map(
        jnp.asarray, b_np["lss_pool"]
    )

    def loss_fn(params, b):
        (preds, depth), _ = model.apply(
            {**variables, "params": params}, b, train=True,
            mutable=["batch_stats"],
        )
        return (
            jnp.sum(preds["heatmap"] ** 2) + jnp.sum(preds["reg"] ** 2),
            (preds, depth),
        )

    (l_d, (preds_d, depth_d)), g_d = jax.value_and_grad(
        loss_fn, has_aux=True
    )(variables["params"], batch)
    (l_a, (preds_a, depth_a)), g_a = jax.value_and_grad(
        loss_fn, has_aux=True
    )(variables["params"], batch_meta)

    np.testing.assert_allclose(np.asarray(depth_a), np.asarray(depth_d),
                               rtol=1e-5, atol=1e-5)
    for k in preds_d:
        np.testing.assert_allclose(
            np.asarray(preds_a[k]), np.asarray(preds_d[k]),
            rtol=1e-4, atol=1e-4, err_msg=k,
        )
    np.testing.assert_allclose(float(l_a), float(l_d), rtol=1e-5)
    flat_d = jax.tree_util.tree_leaves_with_path(g_d)
    flat_a = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(g_a)
    )
    # pooling accumulation order differs (sorted tiles vs segment-sum), and
    # the quadratic loss amplifies the f32 noise — near-cancelling bias
    # grads (~1e-5 sums of ~1e3 contributions) can't meet an elementwise
    # tolerance.  Checked separately: the host/device rank tables are
    # IDENTICAL for this geometry, so any real wiring bug would show as
    # O(1) relative error on the large leaves / a rotated global gradient.
    gmax = max(float(np.abs(np.asarray(v)).max()) for _, v in flat_d)
    dots = sq_a = sq_d = 0.0
    for p, v in flat_d:
        v = np.asarray(v)
        a = np.asarray(flat_a[jax.tree_util.keystr(p)])
        np.testing.assert_allclose(
            a, v, rtol=5e-3, atol=1e-4 * gmax,
            err_msg=jax.tree_util.keystr(p),
        )
        dots += float(np.sum(a * v))
        sq_a += float(np.sum(a * a))
        sq_d += float(np.sum(v * v))
    cos = dots / np.sqrt(sq_a * sq_d)
    assert cos > 1.0 - 1e-7, cos


def test_camera_only_forward():
    cfg = tiny_config(use_radar=False, freeze_img=False)
    model = RCBEVDet(cfg)
    rng = np.random.default_rng(2)
    batch = tiny_batch(rng, cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    preds, depth = model.apply(variables, batch, train=False)
    assert preds["heatmap"].shape == (1, 16, 16, 10)
    assert np.isfinite(np.asarray(preds["heatmap"])).all()


def test_bn_frame_groups_matches_per_frame_loop():
    """bn_frame_groups: one batched call over [b, g] flattened frames ==
    looping BatchNorm over each frame separately (the reference's frozen
    per-frame normalization, bevdet_rc.py:753-775)."""
    from rcbevdet_tpu.models.layers import BatchNorm, bn_frame_groups

    rng = np.random.default_rng(7)
    b, g, n, h, w, c = 2, 3, 4, 5, 6, 8
    x = jnp.asarray(rng.standard_normal((b, g, n, h, w, c)), jnp.float32)
    bn = BatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), x.reshape(-1, h, w, c),
                        use_running_average=False, update_stats=False)
    # make scale/bias non-trivial
    variables = {
        "params": {
            "scale": jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32),
            "bias": jnp.asarray(rng.standard_normal(c), jnp.float32),
        },
        "batch_stats": variables["batch_stats"],
    }
    with bn_frame_groups(b, g):
        out = bn.apply(
            variables, x.reshape(b * g * n, h, w, c),
            use_running_average=False, update_stats=False,
        ).reshape(b, g, n, h, w, c)
    for f in range(g):
        ref = bn.apply(
            variables, x[:, f].reshape(b * n, h, w, c),
            use_running_average=False, update_stats=False,
        ).reshape(b, n, h, w, c)
        np.testing.assert_allclose(
            np.asarray(out[:, f]), np.asarray(ref), rtol=1e-5, atol=1e-5
        )
