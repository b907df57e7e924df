"""SparseBEV-style sparse-query decoder (RCBEVDet++ surface)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rcbevdet_tpu.models.sparse_decoder import (
    SparseBEVDecoder,
    hungarian_match,
    set_prediction_loss,
)


def _meta(b=1, n=2, h=32, w=48):
    # simple pinhole cams looking +x / +y
    l2i = np.zeros((b, n, 4, 4), np.float32)
    for c in range(n):
        intr = np.array(
            [[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]], np.float32
        )
        rot = np.eye(4, dtype=np.float32)
        if c == 1:  # second camera rotated 90deg
            rot[:3, :3] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]],
                                   np.float32)
        # lidar x forward -> camera z forward
        axes = np.array(
            [[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1]],
            np.float32,
        )
        proj = np.eye(4, dtype=np.float32)
        proj[:3, :3] = intr
        l2i[:, c] = proj @ axes @ rot
    return {"lidar2img": jnp.asarray(l2i), "input_size": (h, w)}


def _feats(rng, b=1, n=2, h=32, w=48, c=32, levels=4):
    return [
        jnp.asarray(
            rng.standard_normal((b, n, h // 2**i, w // 2**i, c)), jnp.float32
        )
        for i in range(levels)
    ]


def test_hungarian_match_exact():
    cost = jnp.asarray(
        [[[1.0, 9.0], [9.0, 1.0], [5.0, 5.0]]]
    )  # [1, Q=3, M=2]
    mask = jnp.asarray([[1.0, 1.0]])
    a = hungarian_match(cost, mask)
    np.testing.assert_array_equal(np.asarray(a), [[0, 1]])
    # padded GT gets -1
    mask2 = jnp.asarray([[1.0, 0.0]])
    a2 = hungarian_match(cost, mask2)
    np.testing.assert_array_equal(np.asarray(a2), [[0, -1]])


def test_auction_matches_scipy_near_optimally(rng):
    """The device-side auction must land within eps of scipy's Hungarian
    optimum and produce a valid one-to-one assignment."""
    from scipy.optimize import linear_sum_assignment

    for trial in range(5):
        q, m = 40, 7
        cost = rng.uniform(0, 10, (1, q, m)).astype(np.float32)
        mask = np.ones((1, m), np.float32)
        a = np.asarray(hungarian_match(jnp.asarray(cost), jnp.asarray(mask)))
        assert (a >= 0).all()
        assert len(set(a[0].tolist())) == m  # one-to-one
        ours = cost[0][a[0], np.arange(m)].sum()
        rows, cols = linear_sum_assignment(cost[0])
        opt = cost[0][rows, cols].sum()
        assert ours <= opt + 0.02 * 10 * m + 1e-4


def test_decoder_shapes_and_refinement(rng):
    dec = SparseBEVDecoder(
        dim=32, num_queries=12, num_layers=2, num_points=4, num_levels=4,
        point_cloud_range=(-20.0, -20.0, -5.0, 20.0, 20.0, 3.0),
    )
    feats = _feats(rng)
    meta = _meta()
    variables = dec.init(jax.random.PRNGKey(0), feats, meta)
    outs = dec.apply(variables, feats, meta)
    assert len(outs) == 2
    for logits, boxes in outs:
        assert logits.shape == (1, 12, 10)
        assert boxes.shape == (1, 12, 9)
        assert np.isfinite(np.asarray(boxes)).all()
    # zero-init refinement head -> layer boxes start from the layer input,
    # but queries themselves must lie inside the pc range
    b0 = np.asarray(outs[0][1])
    assert (b0[..., 0] >= -20.5).all() and (b0[..., 0] <= 20.5).all()


def test_set_prediction_loss_and_grads(rng):
    dec = SparseBEVDecoder(
        dim=32, num_queries=12, num_layers=2, num_points=4, num_levels=4,
        point_cloud_range=(-20.0, -20.0, -5.0, 20.0, 20.0, 3.0),
    )
    feats = _feats(rng)
    meta = _meta()
    variables = dec.init(jax.random.PRNGKey(0), feats, meta)

    m = 3
    gt_boxes = jnp.asarray(
        rng.uniform(-10, 10, (1, m, 9)).astype(np.float32)
    )
    gt_labels = jnp.asarray([[1, 4, 0]])
    gt_mask = jnp.asarray([[1.0, 1.0, 0.0]])

    def loss_fn(params):
        outs = dec.apply({"params": params}, feats, meta)
        losses = set_prediction_loss(outs, gt_boxes, gt_labels, gt_mask)
        return sum(losses.values()), losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(total))
    assert "layer0_loss_cls" in losses and "layer1_loss_box" in losses
    gsum = sum(
        float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads)
    )
    assert np.isfinite(gsum) and gsum > 0


def test_loss_prefers_correct_boxes(rng):
    """The matched-box L1 goes to ~0 when a layer's boxes contain the GT
    exactly (loss is sane, not just finite)."""
    gt_boxes = jnp.asarray(rng.uniform(-5, 5, (1, 2, 9)).astype(np.float32))
    gt_labels = jnp.asarray([[0, 1]])
    gt_mask = jnp.asarray([[1.0, 1.0]])
    q = 6
    boxes = jnp.concatenate(
        [gt_boxes, jnp.asarray(rng.uniform(10, 20, (1, q - 2, 9)),
                               jnp.float32)], axis=1
    )
    logits = jnp.full((1, q, 10), -4.0)
    logits = logits.at[0, 0, 0].set(4.0).at[0, 1, 1].set(4.0)
    losses = set_prediction_loss([(logits, boxes)], gt_boxes, gt_labels,
                                 gt_mask)
    assert float(losses["layer0_loss_box"]) == pytest.approx(0.0, abs=1e-5)
    bad_boxes = boxes + 1.0
    worse = set_prediction_loss([(logits, bad_boxes)], gt_boxes, gt_labels,
                                gt_mask)
    assert float(worse["layer0_loss_box"]) > 0.1


def test_rcbevdetpp_assembly(rng):
    """Full RCBEVDet++ forward + loss + grads on tiny shapes."""
    from rcbevdet_tpu.models import RCBEVDetPlusPlus

    model = RCBEVDetPlusPlus(
        dim=32, num_queries=10, num_layers=2, num_points=4, depth=18,
        point_cloud_range=(-20.0, -20.0, -5.0, 20.0, 20.0, 3.0),
    )
    b, n, h, w = 1, 2, 64, 96
    imgs = jnp.asarray(rng.standard_normal((b, n, h, w, 3)), jnp.float32)
    l2i = np.tile(np.eye(4, dtype=np.float32), (b, n, 1, 1))
    l2i[..., 0, 0] = l2i[..., 1, 1] = 40.0
    meta_l2i = jnp.asarray(l2i)
    variables = model.init(
        jax.random.PRNGKey(0), imgs, meta_l2i, (h, w)
    )
    gt_boxes = jnp.asarray(rng.uniform(-5, 5, (b, 2, 9)).astype(np.float32))
    gt_labels = jnp.asarray([[0, 3]])
    gt_mask = jnp.asarray([[1.0, 1.0]])

    def loss_fn(params):
        outs = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            imgs, meta_l2i, (h, w), train=True,
        )
        return sum(model.loss(outs, gt_boxes, gt_labels, gt_mask).values())

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gsum = sum(
        float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads)
    )
    assert np.isfinite(gsum) and gsum > 0
