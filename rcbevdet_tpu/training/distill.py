"""Knowledge-distillation losses + distill train step.

TPU-native re-design of the reference's distillation stack
(models/losses/pkd_loss.py, models/losses/unidistill_loss.py,
tools/distill_tools/train_distiller.py): a frozen teacher (e.g. the
radar-camera RCBEVDet) supervises a student (e.g. camera-only) through

- ``PKDFeatureLoss`` — PKD (arXiv 2207.02039): per-channel feature
  standardization, a learnable 1x1-conv MLP on the student side, MSE/2
  (pkd_loss.py:28-93; the mlp_block at :31-35 is this fork's addition).
- ``unidistill_response_kl`` — spatial softmax KL at temperature tau
  (unidistill_loss.py:25-56).
- ``unidistill_feature_loss`` / ``unidistill_bev_affinity_loss`` — L1 on
  9-point box-anchored feature samples, and L1 between their 9x9
  normalized affinity (Gram) matrices (unidistill_loss.py:57-180),
  formulated with fixed-capacity masked boxes instead of boolean indexing.
- ``response_distill_loss`` — per-pixel L1 on concatenated head maps under
  a GT gaussian mask (unidistill_loss.py:182-243; the reference's "iou"
  head is not part of this head convention and is omitted).

All losses are channels-last and shape-static.  The reference's
``reduce_mean`` of normalizers maps to an optional ``pmean`` hook exactly
like centerpoint_loss.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.warp import grid_sample_2d


def _channel_standardize(feat, eps=1e-6):
    """Zero-mean unit-variance per channel over (N, H, W) (pkd_loss.norm,
    pkd_loss.py:37-52; torch .std() is the unbiased estimator)."""
    n, h, w, c = feat.shape
    x = feat.reshape(-1, c)
    mean = jnp.mean(x, axis=0)
    var = jnp.var(x, axis=0) * (x.shape[0] / max(x.shape[0] - 1, 1))
    std = jnp.sqrt(var)
    return ((x - mean) / (std + eps)).reshape(n, h, w, c)


class PKDFeatureLoss(nn.Module):
    """PKD feature-imitation loss with the fork's learnable student MLP.

    Call with NHWC student/teacher features; returns a scalar.
    """

    channels: int = 256
    loss_weight: float = 1.0
    resize_stu: bool = True

    @nn.compact
    def __call__(self, feat_s, feat_t):
        from ..ops.warp import bilinear_resize

        if feat_s.shape[1:3] != feat_t.shape[1:3]:
            # F.interpolate(mode='bilinear') default align_corners=False
            if self.resize_stu:
                feat_s = bilinear_resize(
                    feat_s, *feat_t.shape[1:3], align_corners=False
                )
            else:
                feat_t = bilinear_resize(
                    feat_t, *feat_s.shape[1:3], align_corners=False
                )
        norm_s = _channel_standardize(feat_s)
        norm_t = _channel_standardize(jax.lax.stop_gradient(feat_t))
        y = nn.Conv(self.channels, (1, 1), name="mlp0")(norm_s)
        y = nn.Conv(self.channels, (1, 1), name="mlp1")(nn.relu(y))
        return self.loss_weight * 0.5 * jnp.mean((y - norm_t) ** 2)


def unidistill_response_kl(preds_s, preds_t, tau=1.0, loss_weight=1.0):
    """Spatial-distribution KL (UniDistillLoss.forward,
    unidistill_loss.py:25-56): softmax over H*W per (sample, channel) row,
    sum softmax_T * (log_softmax_T - log_softmax_S) * tau^2 / (N*C)."""
    n, h, w, c = preds_s.shape
    s = jnp.moveaxis(preds_s, -1, 1).reshape(n * c, h * w) / tau
    t = jnp.moveaxis(jax.lax.stop_gradient(preds_t), -1, 1).reshape(
        n * c, h * w
    ) / tau
    log_p_t = jax.nn.log_softmax(t, axis=1)
    log_p_s = jax.nn.log_softmax(s, axis=1)
    p_t = jnp.exp(log_p_t)
    kl = jnp.sum(p_t * (log_p_t - log_p_s)) * tau**2
    return loss_weight * kl / (n * c)


def _nine_point_grid(corners):
    """[B, M, 4, 2] box corners (BEV grid pixels) -> [B, M, 9, 2]: the 4
    corners, the center, and the 4 edge midpoints
    (unidistill_loss.py:58-82)."""
    center = jnp.mean(corners, axis=2, keepdims=True)
    e1 = jnp.mean(corners[:, :, (0, 1)], axis=2, keepdims=True)
    e2 = jnp.mean(corners[:, :, (1, 2)], axis=2, keepdims=True)
    e3 = jnp.mean(corners[:, :, (2, 3)], axis=2, keepdims=True)
    e4 = jnp.mean(corners[:, :, (0, 3)], axis=2, keepdims=True)
    return jnp.concatenate([corners, center, e1, e2, e3, e4], axis=2)


def _sample_box_points(feat, corners):
    """Bilinearly sample NHWC ``feat`` at the 9 box-anchored points.

    corners: [B, M, 4, 2] as (x, y) in feature-grid pixel units (the
    reference stores them pre-swapped and un-swaps before sampling,
    unidistill_loss.py:84-86 — we take plain (x, y) directly).
    Returns [B, M, 9, C].  Matches the reference's default-mode
    ``F.grid_sample`` (align_corners=False, zeros padding).
    """
    h, w = feat.shape[1:3]
    pts = _nine_point_grid(corners)  # [B, M, 9, 2]
    gx = (pts[..., 0] - w / 2.0) / (w / 2.0)
    gy = (pts[..., 1] - h / 2.0) / (h / 2.0)
    grid = jnp.stack([gx, gy], axis=-1)
    out = jax.vmap(
        lambda f, g: grid_sample_2d(f, g, align_corners=False)
    )(feat, grid)  # [B, M, 9, C]
    return out


def unidistill_feature_loss(feat_s, feat_t, gt_corners, gt_mask, pmean=None):
    """Masked L1 on 9-point box-feature samples
    (FeatureDistillLoss, unidistill_loss.py:57-104)."""
    if pmean is None:
        pmean = lambda x: x
    s = _sample_box_points(feat_s, gt_corners)
    t = _sample_box_points(jax.lax.stop_gradient(feat_t), gt_corners)
    per_box = jnp.mean(jnp.abs(s - t), axis=(2, 3))  # [B, M]
    weight = pmean(jnp.sum(gt_mask))
    return jnp.sum(per_box * gt_mask) / (weight + 1e-4)


def unidistill_bev_affinity_loss(
    feat_s, feat_t, gt_corners, gt_mask, pmean=None
):
    """Masked L1 between per-box 9x9 normalized affinity matrices
    (BEVDistillLoss, unidistill_loss.py:105-180)."""
    if pmean is None:
        pmean = lambda x: x

    def gram(x):
        x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-4)
        return jnp.einsum("bmpc,bmqc->bmpq", x, x)

    s = gram(_sample_box_points(feat_s, gt_corners))
    t = gram(_sample_box_points(jax.lax.stop_gradient(feat_t), gt_corners))
    per_box = jnp.mean(jnp.abs(s - t), axis=(2, 3))  # [B, M]
    weight = pmean(jnp.sum(gt_mask))
    return jnp.sum(per_box * gt_mask) / (weight + 1e-4)


def box_mask_gaussian(
    heat_shape, gt_boxes, gt_mask, point_cloud_range, voxel_size,
    out_size_scale,
):
    """[B, H, W] gaussian mask over GT footprints
    (calculate_box_mask_gaussian used by ResponseDistillLoss): a gaussian
    bump at each box center with the CenterPoint radius for its BEV size,
    max-composited.  Vectorized over the padded [B, M, 9] boxes."""
    from ..core.gaussian import gaussian_radius_batch, render_gaussian_masked

    b, h, w = heat_shape
    dx = voxel_size[0] * out_size_scale
    dy = voxel_size[1] * out_size_scale
    cx = (gt_boxes[..., 0] - point_cloud_range[0]) / dx
    cy = (gt_boxes[..., 1] - point_cloud_range[1]) / dy
    wx = gt_boxes[..., 3] / dx
    wy = gt_boxes[..., 4] / dy
    radius = jnp.maximum(gaussian_radius_batch(wy, wx, 0.1), 2.0)
    return render_gaussian_masked(cx, cy, radius, gt_mask, (h, w))


class Distiller(nn.Module):
    """Student + learnable distill heads, trained against a frozen teacher.

    The reference's train_distiller.py builds an 'algorithm' wrapping
    student/teacher and adds distill losses on neck features and head
    responses; here the student detector and the PKD projection MLP live in
    one flax module (the PKD MLP is trainable, pkd_loss.py:31-35), while
    the teacher runs outside the gradient as a constant function.
    """

    student: nn.Module
    pkd_weight: float = 1.0
    kd_tau: float = 1.0
    kd_weight: float = 1.0
    feature_weight: float = 0.0
    affinity_weight: float = 0.0

    @nn.compact
    def __call__(self, batch, teacher_feats, teacher_preds, train=True,
                 gt_corners=None, gt_mask=None, with_prev=True):
        out = self.student(
            batch, train=train, with_prev=with_prev, return_feats=True
        )
        preds, depth, fused = out[0], out[1], out[-1]
        losses = {}
        if self.pkd_weight:
            losses["loss_distill_pkd"] = PKDFeatureLoss(
                channels=fused.shape[-1], loss_weight=self.pkd_weight,
                name="pkd",
            )(fused, teacher_feats)
        if self.kd_weight:
            losses["loss_distill_kd"] = unidistill_response_kl(
                preds["heatmap"], teacher_preds["heatmap"], tau=self.kd_tau,
                loss_weight=self.kd_weight,
            )
        if self.feature_weight and gt_corners is not None:
            losses["loss_distill_feat"] = (
                self.feature_weight
                * unidistill_feature_loss(
                    fused, teacher_feats, gt_corners, gt_mask
                )
            )
        if self.affinity_weight and gt_corners is not None:
            losses["loss_distill_affinity"] = (
                self.affinity_weight
                * unidistill_bev_affinity_loss(
                    fused, teacher_feats, gt_corners, gt_mask
                )
            )
        return preds, depth, losses


def make_distill_train_step(
    distiller, teacher, teacher_variables, tx, cfg,
    loss_depth_weight=3.0, with_prev=True,
):
    """Jittable distillation train step.

    The teacher forward runs in eval mode inside the step (its variables
    are closed over as constants, so XLA folds/dedups them; stop_gradient
    is implicit because only ``params`` is differentiated).
    """
    import optax

    from ..models.centerpoint_head import centerpoint_loss
    from ..models.view_transformer import depth_loss as depth_loss_fn
    from .train_step import TrainState, update_ema

    def teacher_forward(batch):
        preds_t, _, feats_t = teacher.apply(
            teacher_variables, batch, train=False, return_feats=True
        )
        return jax.lax.stop_gradient(preds_t), jax.lax.stop_gradient(feats_t)

    def loss_fn(params, batch_stats, batch, teacher_out):
        preds_t, feats_t = teacher_out
        (preds, depth, dlosses), updates = distiller.apply(
            {"params": params, "batch_stats": batch_stats},
            batch, feats_t, preds_t, train=True, with_prev=with_prev,
            gt_corners=batch.get("gt_corners_bev"),
            gt_mask=batch.get("mask_t"),
            mutable=["batch_stats"],
        )
        losses = centerpoint_loss(
            preds, batch["heatmap_t"], batch["anno_box_t"],
            batch["inds_t"], batch["mask_t"],
        )
        if "gt_depth" in batch:
            losses["loss_depth"] = depth_loss_fn(
                batch["gt_depth"], depth, cfg.downsample,
                cfg.grid_config["depth"], weight=loss_depth_weight,
            )
        losses.update(dlosses)
        total = sum(losses.values())
        return total, (losses, updates["batch_stats"])

    def train_step(state: TrainState, batch):
        teacher_out = teacher_forward(batch)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (total, (losses, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, teacher_out
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        n_updates = state.ema_updates + 1
        new_state = state.replace(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            ema_params=update_ema(state.ema_params, new_params, n_updates),
            ema_batch_stats=update_ema(
                state.ema_batch_stats, new_stats, n_updates
            ),
            step=state.step + 1,
            ema_updates=n_updates,
        )
        metrics = dict(losses)
        metrics["loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def response_distill_loss(
    preds_s, preds_t, gt_boxes, gt_mask, point_cloud_range, voxel_size,
    out_size_scale, pmean=None,
):
    """Per-pixel L1 on head maps under a GT gaussian mask
    (ResponseDistillLoss, unidistill_loss.py:182-243).  preds are this
    framework's head dicts (NHWC); teacher heatmaps pass through
    sigmoid(x/2) as in the reference (:196), the student's raw.
    """
    if pmean is None:
        pmean = lambda x: x
    preds_t = jax.tree_util.tree_map(jax.lax.stop_gradient, preds_t)
    reg_keys = ("reg", "height", "dim", "rot", "vel")
    reg_s = jnp.concatenate([preds_s[k] for k in reg_keys], axis=-1)
    reg_t = jnp.concatenate([preds_t[k] for k in reg_keys], axis=-1)
    cls_s = jnp.max(preds_s["heatmap"], axis=-1)
    cls_t = jnp.max(jax.nn.sigmoid(preds_t["heatmap"] / 2.0), axis=-1)

    b, h, w = cls_s.shape
    mask = box_mask_gaussian(
        (b, h, w), gt_boxes, gt_mask, point_cloud_range, voxel_size,
        out_size_scale,
    )
    diff_reg = jnp.mean(jnp.abs(reg_s - reg_t), axis=-1) * mask
    diff_cls = jnp.abs(cls_s - cls_t) * mask
    weight = pmean(jnp.sum(mask))
    return (
        jnp.sum(diff_cls) / (weight + 1e-4),
        jnp.sum(diff_reg) / (weight + 1e-4),
    )
