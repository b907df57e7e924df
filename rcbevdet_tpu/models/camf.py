"""CAMF: Cross-Attention Multi-layer Fusion of radar-BEV and camera-BEV.

Components re-designed from the reference:
- ``MSDeformAttn`` module (model_utils/ops/modules/ms_deform_attn.py:182-272)
  — linear projections for offsets (ring-pattern bias init :214-228), softmax
  weights, value/output projections, over the XLA sampling core.
- ``LearnedPositionalEncoding`` (:126-172): independent row/col embedding
  tables concatenated (col/x embed first) and flattened to (h*w, 2*num_feats).
- ``RadarConvFuser`` (bevdet_rc.py:28-65): concat -> 3x3 conv-BN-ReLU ->
  re-concat -> N conv-BN-ReLU blocks.
- ``CAMF`` orchestration (bevdet_rc.py:303-357): radar 384->256 reduc conv,
  dense 2D reference points, bidirectional deformable attention, conv fusion.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.deform_attn import ms_deform_attn_core
from .layers import BatchNorm, ConvKernel, conv_bn_relu_3x3


def _ring_bias_init(n_heads, n_levels, n_points):
    thetas = np.arange(n_heads, dtype=np.float32) * (2.0 * np.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # [H, 2]
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1
    return jnp.asarray(grid.reshape(-1))


class MSDeformAttn(nn.Module):
    d_model: int = 256
    n_levels: int = 1
    n_heads: int = 8
    n_points: int = 8

    @nn.compact
    def __call__(self, query, reference_points, input_flatten, spatial_shapes,
                 train=False):
        """query [B, Lq, C]; reference_points [B, Lq, n_levels, 2] in [0,1];
        input_flatten [B, sum(H*W), C]; spatial_shapes: static ((H, W), ...).

        ``train`` selects the sampling-core reduce form: the einsum
        k-contraction (small remat residuals) when training, the copy-free
        elementwise slot reduce for inference (see ops/deform_attn.py)."""
        n, lq, _ = query.shape
        h, lvl, pts = self.n_heads, self.n_levels, self.n_points
        hd = self.d_model // h

        value = nn.Dense(self.d_model, name="value_proj")(input_flatten)
        value = value.reshape(n, -1, h, hd)
        offsets = nn.Dense(
            h * lvl * pts * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda *_: _ring_bias_init(h, lvl, pts),
            name="sampling_offsets",
        )(query).reshape(n, lq, h, lvl, pts, 2)
        weights = nn.Dense(
            h * lvl * pts,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="attention_weights",
        )(query).reshape(n, lq, h, lvl * pts)
        weights = jax.nn.softmax(weights, axis=-1).reshape(n, lq, h, lvl, pts)

        normalizer = jnp.asarray(
            [[s[1], s[0]] for s in spatial_shapes], jnp.float32
        )  # (W, H) per level
        locations = (
            reference_points[:, :, None, :, None, :]
            + offsets / normalizer[None, None, None, :, None, :]
        )
        # remat: the packed-corner patch ([B*heads, Lq*P, 4*hd], ~0.5 GB
        # per layer at train shapes) must not be stored for backward.
        # 'custom' = hand-written VJP (ops/deform_attn.py::
        # packed_combine_p_reduce): re-gathers the patch in the backward
        # and builds d_patch/d_w4t in scatter/stack-native layouts — the
        # einsum autodiff's ~9.5 ms/layer of transposed patch copies
        # disappear (measured on v5e at CAMF train shapes)
        reduce = "custom" if train else "pallas"
        core = lambda v, l, w: ms_deform_attn_core(  # noqa: E731
            v, spatial_shapes, l, w, reduce=reduce
        )
        if not train:
            # inference: checkpoint is free (no backward) — keep the wrap
            # so any outer grad falls back to remat semantics
            core = jax.checkpoint(core)
        # train: NO jax.checkpoint. The 'custom' path's hand-written VJP
        # already re-gathers the patch instead of storing it; its residuals
        # are only (packed corner table ~67 MB f32, flat_idx, w4t ~16 MB)
        # per layer.  Wrapping it in checkpoint re-ran the whole core
        # (corner pack + 1M-row gather + combine kernel, ~4 ms/layer) a
        # second time in the backward just to avoid ~170 MB of residuals —
        # a bad trade at B=1 train (peak HBM is set by B>1 batching, which
        # per-chip benchmarking already rejected; see ROADMAP round-3 §4).
        out = core(value, locations, weights)
        return nn.Dense(self.d_model, name="output_proj")(out)


class LearnedPositionalEncoding(nn.Module):
    """Row/col learned embeddings -> [1, h*w, 2*num_feats]."""

    num_feats: int = 128
    row_num_embed: int = 128
    col_num_embed: int = 128

    @nn.compact
    def __call__(self, h, w):
        row = self.param(
            "row_embed",
            nn.initializers.uniform(scale=1.0),
            (self.row_num_embed, self.num_feats),
        )
        col = self.param(
            "col_embed",
            nn.initializers.uniform(scale=1.0),
            (self.col_num_embed, self.num_feats),
        )
        x_embed = jnp.broadcast_to(col[None, :w], (h, w, self.num_feats))
        y_embed = jnp.broadcast_to(row[:h, None], (h, w, self.num_feats))
        pos = jnp.concatenate([x_embed, y_embed], axis=-1)
        return pos.reshape(1, h * w, 2 * self.num_feats)


def reference_points_2d(h, w):
    """Dense normalized BEV reference grid [1, h*w, 1, 2]
    (bevdet_rc.py:289-301)."""
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    ref = jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)
    return ref[None, :, None, :]


class RadarConvFuser(nn.Module):
    out_channels: int = 256
    deconv_blocks: int = 3

    @nn.compact
    def __call__(self, a, b, train=False, update_stats=True, fast=False):
        res = jnp.concatenate([a, b], axis=-1)
        k = ConvKernel((3, 3, res.shape[-1], self.out_channels),
                       name="fuse_conv")()
        out = conv_bn_relu_3x3(res, k, BatchNorm(name="fuse_bn"),
                               train, update_stats, fast)
        out = jnp.concatenate([out, res], axis=-1)
        for i in range(self.deconv_blocks):
            k = ConvKernel((3, 3, out.shape[-1], self.out_channels),
                           name=f"deconv{i}_conv")()
            out = conv_bn_relu_3x3(out, k, BatchNorm(name=f"deconv{i}_bn"),
                                   train, update_stats, fast)
        return out


class CAMF(nn.Module):
    """Bidirectional deformable cross-attention fusion (bevdet_rc.py:303-357).

    Inputs are NHWC BEV maps: camera [B, H, W, imc], radar [B, H, W, rac].
    """

    imc: int = 256
    rac: int = 384
    bev_size: int = 128

    @nn.compact
    def __call__(self, img_bev, radar_bev, train=False, update_stats=True,
                 fast=False):
        b, h, w, _ = img_bev.shape

        # radar 384 -> 256 (ConvModule 3x3 + BN(eps 1e-3, mom 0.01) + ReLU)
        kr = ConvKernel((3, 3, radar_bev.shape[-1], self.imc),
                        name="radar_reduc_conv")()
        r = conv_bn_relu_3x3(
            radar_bev, kr,
            BatchNorm(momentum=0.01, epsilon=1e-3, name="radar_reduc_bn"),
            train, update_stats, fast,
        )

        radar_seq = r.reshape(b, h * w, self.imc)
        img_seq = img_bev.reshape(b, h * w, self.imc)

        pos1 = LearnedPositionalEncoding(
            self.imc // 2, self.bev_size, self.bev_size, name="pos1"
        )(h, w)
        pos2 = LearnedPositionalEncoding(
            self.imc // 2, self.bev_size, self.bev_size, name="pos2"
        )(h, w)
        ref = reference_points_2d(h, w)
        ref = jnp.broadcast_to(ref, (b, h * w, 1, 2))
        shapes = ((h, w),)

        f1 = MSDeformAttn(self.imc, 1, 8, 8, name="deform_attn1")(
            radar_seq + pos1, ref, img_seq + pos2, shapes, train=train
        )
        f2 = MSDeformAttn(self.imc, 1, 8, 8, name="deform_attn2")(
            img_seq + pos2, ref, radar_seq + pos1, shapes, train=train
        )
        f1 = f1.reshape(b, h, w, self.imc)
        f2 = f2.reshape(b, h, w, self.imc)
        return RadarConvFuser(self.imc, 3, name="fuser")(
            f1, f2, train=train, update_stats=update_stats, fast=fast
        )
