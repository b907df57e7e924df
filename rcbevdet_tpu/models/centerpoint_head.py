"""CenterPoint-style detection head + losses (flax / pure functions).

Re-design of the reference ``CenterHead``/``SeparateHead``
(models/dense_heads/centerpoint_head.py:19,248): shared 3x3 conv then
per-branch (reg/height/dim/rot/vel/heatmap) small conv stacks.  Target
rendering lives CPU-side (core/targets.py); the loss here consumes the
pre-rendered dense targets, so it is a pure static-shape function:
GaussianFocal on the heatmap + code-weighted L1 on gathered box targets
(centerpoint_head.py:591-683), with the reference's task-specific loss
splits (xy/z/whl/yaw/vel).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm


HEAD_SPECS = (("reg", 2), ("height", 1), ("dim", 3), ("rot", 2), ("vel", 2))


class SeparateHead(nn.Module):
    """Per-branch conv stacks (centerpoint_head.py:19-136): for each head,
    (num_conv - 1) ConvModule(k=3, BN) + final conv(k=3, bias); heatmap final
    bias initialized to -2.19."""

    heads: Tuple[Tuple[str, int], ...]
    num_classes: int
    head_conv: int = 64
    final_kernel: int = 3
    init_bias: float = -2.19

    @nn.compact
    def __call__(self, x, train=False, update_stats=True):
        fk = self.final_kernel
        pad = ((fk // 2, fk // 2),) * 2
        out = {}
        for name, ch in self.heads + (("heatmap", self.num_classes),):
            y = nn.Conv(
                self.head_conv, (fk, fk), padding=pad, use_bias=False,
                name=f"{name}_conv0",
            )(x)
            y = BatchNorm(name=f"{name}_bn0")(
                y, use_running_average=not train, update_stats=update_stats
            )
            y = nn.relu(y)
            bias_init = (
                nn.initializers.constant(self.init_bias)
                if name == "heatmap"
                else nn.initializers.zeros
            )
            out[name] = nn.Conv(
                ch, (fk, fk), padding=pad, use_bias=True,
                bias_init=bias_init, name=f"{name}_final",
            )(y)
        return out


class CenterHead(nn.Module):
    """Single-task CenterHead (config rcbevdet-...py:148-175)."""

    in_channels: int = 256
    num_classes: int = 10
    share_conv_channel: int = 64

    @nn.compact
    def __call__(self, x, train=False, update_stats=True):
        x = nn.Conv(
            self.share_conv_channel, (3, 3), padding=((1, 1), (1, 1)),
            use_bias=False, name="shared_conv",
        )(x)
        x = BatchNorm(name="shared_bn")(
            x, use_running_average=not train, update_stats=update_stats
        )
        x = nn.relu(x)
        return SeparateHead(
            heads=HEAD_SPECS, num_classes=self.num_classes, name="task0"
        )(x, train=train, update_stats=update_stats)


# the reference aux/CenterPoint task grouping (det-...-withHoP-...py:190-200)
NUSCENES_TASK_GROUPS = ((0,), (1, 2), (3, 4), (5,), (6, 7), (8, 9))


class MultiTaskCenterHead(nn.Module):
    """Task-grouped CenterHead (reference centerpoint_head.py:248-368 with
    multiple ``tasks``): one shared conv, one SeparateHead per class group.

    ``task_groups``: tuple of tuples of GLOBAL class ids; each group gets its
    own heatmap over its local classes.  Returns a list of per-task pred
    dicts (local-class heatmaps).
    """

    in_channels: int = 256
    task_groups: Tuple[Tuple[int, ...], ...] = NUSCENES_TASK_GROUPS
    share_conv_channel: int = 64

    @nn.compact
    def __call__(self, x, train=False, update_stats=True):
        x = nn.Conv(
            self.share_conv_channel, (3, 3), padding=((1, 1), (1, 1)),
            use_bias=False, name="shared_conv",
        )(x)
        x = BatchNorm(name="shared_bn")(
            x, use_running_average=not train, update_stats=update_stats
        )
        x = nn.relu(x)
        return [
            SeparateHead(
                heads=HEAD_SPECS, num_classes=len(group), name=f"task{i}"
            )(x, train=train, update_stats=update_stats)
            for i, group in enumerate(self.task_groups)
        ]


def multi_task_loss(task_preds, task_targets, code_weights=(1.0,) * 10,
                    cls_weight=6.0, bbox_weight=1.5, pmean=None):
    """Sum of per-task centerpoint losses.

    task_targets: list (per task) of (heatmap_t, anno_box_t, inds_t, mask_t).
    """
    losses = {}
    for tid, (preds, tgt) in enumerate(zip(task_preds, task_targets)):
        l = centerpoint_loss(
            preds, *tgt, code_weights=code_weights,
            cls_weight=cls_weight, bbox_weight=bbox_weight, pmean=pmean,
        )
        losses.update({f"task{tid}_{k}": v for k, v in l.items()})
    return losses


def clip_sigmoid(x, eps=1e-4):
    """Sigmoid clamped away from {0, 1} (reference models/utils/clip_sigmoid)."""
    return jnp.clip(jax.nn.sigmoid(x), eps, 1.0 - eps)


def gaussian_focal_loss(pred, target, avg_factor, alpha=2.0, gamma=4.0):
    """mmdet GaussianFocalLoss with sum/avg_factor reduction.

    pred: clipped sigmoid heatmap; target: rendered gaussian heatmap.
    """
    pos_w = (target == 1.0).astype(pred.dtype)
    neg_w = jnp.power(1.0 - target, gamma)
    pos_loss = -jnp.log(pred) * jnp.power(1.0 - pred, alpha) * pos_w
    neg_loss = -jnp.log(1.0 - pred) * jnp.power(pred, alpha) * neg_w * (1 - pos_w)
    return (jnp.sum(pos_loss) + jnp.sum(neg_loss)) / avg_factor


def gather_predictions(preds, inds):
    """Gather per-object predictions at target positions.

    preds: dict of [B, H, W, C]; inds: [B, max_objs] flat (y*W + x).
    Returns [B, max_objs, 10] in anno_box order (reg, height, dim, rot, vel).
    """
    stacked = jnp.concatenate(
        [preds[name] for name, _ in HEAD_SPECS], axis=-1
    )  # [B, H, W, 10]
    b, h, w, c = stacked.shape
    flat = stacked.reshape(b, h * w, c)
    return jax.vmap(lambda f, i: f[i])(flat, inds)


def centerpoint_loss(
    preds,
    heatmap_t,
    anno_box_t,
    inds_t,
    mask_t,
    code_weights=(1.0,) * 10,
    cls_weight=6.0,
    bbox_weight=1.5,
    pmean=None,
):
    """Head losses (centerpoint_head.py:591-683), task-specific split.

    Args:
      preds: dict of NHWC head outputs; heatmap raw logits.
      heatmap_t: [B, num_cls, H, W] rendered targets (class-first, as the CPU
        renderer emits); transposed internally.
      anno_box_t: [B, max_objs, 10]; inds_t: [B, max_objs]; mask_t: [B, max_objs].
      pmean: cross-device mean fn for loss normalizers (reference
        ``reduce_mean`` via dist.all_reduce, centerpoint_head.py:604,649);
        pass ``lambda x: jax.lax.pmean(x, 'data')`` inside pjit.

    Returns:
      dict of scalar losses.
    """
    if pmean is None:
        pmean = lambda x: x
    heat_t = jnp.transpose(heatmap_t, (0, 2, 3, 1))  # -> NHWC
    heat_p = clip_sigmoid(preds["heatmap"])
    num_pos = jnp.sum((heat_t == 1.0).astype(jnp.float32))
    cls_avg = jnp.maximum(pmean(num_pos), 1.0)
    loss_heatmap = cls_weight * gaussian_focal_loss(heat_p, heat_t, cls_avg)

    pred_box = gather_predictions(preds, inds_t)  # [B, max_objs, 10]
    num = jnp.maximum(pmean(jnp.sum(mask_t)), 1e-4)
    isnotnan = jnp.isfinite(anno_box_t).astype(jnp.float32)
    weights = mask_t[..., None] * isnotnan * jnp.asarray(code_weights)
    target = jnp.nan_to_num(anno_box_t)

    losses = {"loss_heatmap": loss_heatmap}
    slices = {"xy": (0, 2), "z": (2, 3), "whl": (3, 6), "yaw": (6, 8), "vel": (8, 10)}
    for name, (lo, hi) in slices.items():
        l1 = jnp.abs(pred_box[..., lo:hi] - target[..., lo:hi]) * weights[..., lo:hi]
        losses[f"loss_{name}"] = bbox_weight * jnp.sum(l1) / (num + 1e-4)
    return losses
