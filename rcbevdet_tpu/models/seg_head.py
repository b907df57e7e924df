"""BEV semantic segmentation head.

Re-design of the reference ``BEVSegHead`` (models/dense_heads/
vanilla_seg.py:93-180): a small conv-BN-ReLU stack + 1x1 classifier over the
fused BEV feature, trained with per-pixel sigmoid focal or BCE loss against
rasterized map masks — the RCBEVDet++ BEV-segmentation capability
(reference README seg table, mIoU 62.8 R101).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.warp import bilinear_resize
from .layers import BatchNorm


class BEVGridTransform(nn.Module):
    """Resample the detection BEV grid onto the segmentation grid
    (vanilla_seg.py:49-90): a bilinear resize between two axis-aligned
    metric grids."""

    input_scope: Tuple[Tuple[float, float, float], ...]  # ((lo, hi, step) x/y)
    output_scope: Tuple[Tuple[float, float, float], ...]

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        out_h = int(round(
            (self.output_scope[1][1] - self.output_scope[1][0])
            / self.output_scope[1][2]
        ))
        out_w = int(round(
            (self.output_scope[0][1] - self.output_scope[0][0])
            / self.output_scope[0][2]
        ))
        # map output metric coords into input pixel coords, then sample
        ys = (jnp.arange(out_h) + 0.5) * self.output_scope[1][2] + self.output_scope[1][0]
        xs = (jnp.arange(out_w) + 0.5) * self.output_scope[0][2] + self.output_scope[0][0]
        iy = (ys - self.input_scope[1][0]) / self.input_scope[1][2] - 0.5
        ix = (xs - self.input_scope[0][0]) / self.input_scope[0][2] - 0.5
        gy = iy / (h - 1) * 2 - 1
        gx = ix / (w - 1) * 2 - 1
        gxx, gyy = jnp.meshgrid(gx, gy, indexing="xy")
        grid = jnp.stack([gxx, gyy], -1)
        from ..ops.warp import grid_sample_2d

        return jax.vmap(
            lambda f: grid_sample_2d(f, grid, align_corners=True)
        )(x)


class BEVSegHead(nn.Module):
    classes: Sequence[str] = ("vehicle",)
    conv_channels: Sequence[int] = (256, 256)
    grid_transform: Tuple | None = None

    @nn.compact
    def __call__(self, x, train=False, update_stats=True):
        if self.grid_transform is not None:
            x = BEVGridTransform(*self.grid_transform, name="transform")(x)
        for i, ch in enumerate(self.conv_channels):
            x = nn.Conv(
                ch, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                name=f"conv{i}",
            )(x)
            x = BatchNorm(name=f"bn{i}")(
                x, use_running_average=not train, update_stats=update_stats
            )
            x = nn.relu(x)
        return nn.Conv(len(self.classes), (1, 1), name="classifier")(x)


def sigmoid_focal_loss(logits, targets, alpha=-1.0, gamma=2.0):
    """Per-pixel sigmoid focal loss, mean-reduced (vanilla_seg.py:24-46)."""
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_bce(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return jnp.mean(loss)


def optax_sigmoid_bce(logits, labels):
    """Numerically-stable BCE-with-logits."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def seg_loss(logits, masks, loss_type="focal", loss_weight=1.0):
    """logits/masks: [B, H, W, num_classes]."""
    if loss_type == "focal":
        return loss_weight * sigmoid_focal_loss(logits, masks)
    return loss_weight * jnp.mean(optax_sigmoid_bce(logits, masks))


def seg_iou(logits, masks, threshold=0.5):
    """Per-class IoU for evaluation (mIoU over classes)."""
    pred = jax.nn.sigmoid(logits) > threshold
    gt = masks > 0.5
    inter = jnp.sum(pred & gt, axis=(0, 1, 2))
    union = jnp.sum(pred | gt, axis=(0, 1, 2))
    return inter / jnp.maximum(union, 1)
