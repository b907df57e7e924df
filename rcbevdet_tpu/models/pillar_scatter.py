"""RCS-aware pillar-to-BEV scatter (flax).

Re-design of ``PointPillarsScatterRCS`` (reference
middle_encoders/pillar_scatter.py:107-135).  The reference scatters with
tensor indexing then draws per-pillar gaussian disks in a serial Python loop
(:128-131) — its worst hotspot.  Here the scatter is a single masked
scatter-set and the disk rendering is the vectorized window max-scatter of
``core.gaussian.render_rcs_maps``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm


class _RCSAtt(nn.Module):
    """1x1 conv over the stacked [heat, feat] RCS maps, computed
    elementwise.

    Param tree matches ``nn.Conv(features, (1, 1))`` exactly (kernel
    [1, 1, 2, C] + bias [C]) so reference-checkpoint conversion is
    unchanged — but a [B, ny, nx, 2] input tensor is never materialized:
    minor-dim 2 lane-pads to 128 on TPU (64x HBM amplification over a
    512x512 canvas).  The multiply-add runs in f32 (the maps are f32 from
    the Pallas render), at least as accurate as the bf16 conv it replaces.
    """

    features: int

    @nn.compact
    def __call__(self, heat, feat):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, 2, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k = kernel[0, 0].astype(jnp.float32)
        return (
            heat[..., None] * k[0] + feat[..., None] * k[1] + bias
        )


def scatter_pillars(pillar_feats, coors, pillar_mask, ny, nx):
    """[P, C] pillar features -> [ny, nx, C] canvas (one sample).

    Invalid pillars are routed to an out-of-bounds row and dropped by the
    scatter itself (mode="drop") — no trash row, so no [ny*nx, C] slice
    copy of the canvas afterwards, and no masked-zero write either.
    """
    p, c = pillar_feats.shape
    flat = jnp.where(
        pillar_mask, coors[:, 1] * nx + coors[:, 2], jnp.int32(1 << 30)
    ).astype(jnp.int32)
    canvas = jnp.zeros((ny * nx, c), pillar_feats.dtype)
    canvas = canvas.at[flat].set(pillar_feats, mode="drop")
    return canvas.reshape(ny, nx, c)


class _SplitConcatConv(nn.Module):
    """``nn.Conv(C, 3x3)(concat([a, b], -1))`` as a kernel-sliced sum.

    conv(concat(a, b), W) == conv(a, W[:, :, :Ca]) + conv(b, W[:, :, Ca:]),
    so the [B, ny, nx, 2C] concat is never materialized over the 512x512
    canvas.  Param tree matches ``nn.Conv`` (kernel [3, 3, 2C, C] + bias)
    so reference-checkpoint conversion is unchanged.
    """

    features: int

    @nn.compact
    def __call__(self, a, b, fast=False):
        ca, cb = a.shape[-1], b.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, ca + cb, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # r5 dead end (do not retry): routing this pair through the Pallas
        # conv3x3 kernel at inference ballooned the radar middle encoder
        # 1.70 -> 5.61 ms AND its neighbor radar_bev_backbone 0.58 -> 0.83
        # — at 64 channels the kernel's per-tap [*, 64]x[64, 64] dots
        # waste the MXU and the canvas layout pinning breaks the
        # surrounding fusions.  The XLA pair at ~6x the bandwidth floor is
        # still the in-graph winner.
        del fast
        dn = ("NHWC", "HWIO", "NHWC")
        out = jax.lax.conv_general_dilated(
            a, kernel[:, :, :ca].astype(a.dtype), (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=dn,
        ) + jax.lax.conv_general_dilated(
            b, kernel[:, :, ca:].astype(b.dtype), (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=dn,
        )
        return out + bias.astype(out.dtype)


class PointPillarsScatterRCS(nn.Module):
    """Scatter + RCS-prior attention maps + conv fusion.

    Per pillar, radius = relu(rcs * (x_hat^2 + y_hat^2)) + 1 where x_hat,
    y_hat are the pillar-mean normalized coords (rcs[:, 0:2]) and rcs is the
    pillar-mean raw RCS (index -2 of the 7 used dims) —
    pillar_scatter.py:122-126.
    """

    in_channels: int = 64
    output_shape: tuple = (512, 512)
    r_max: int = 16

    @nn.compact
    def __call__(self, pillar_feats, rcs, coors, pillar_mask,
                 train=False, update_stats=True):
        b, p, c = pillar_feats.shape
        ny, nx = self.output_shape

        # python-unrolled over B at B=1, NOT vmapped: XLA's batched-scatter
        # lowering serializes through [C, B, cells]-layout while loops
        # (~14 ms of relayout at 4-stream serving); per-sample scatters
        # stay on the fast lowering (same finding as the train-time LSS
        # pooling, view_transformer.py).  At B>1 a single COMBINED scatter
        # over batch-offset rows (neither vmapped nor looped — one
        # standalone scatter of B*P rows) writes the whole [B, ny, nx, C]
        # canvas in one buffer, instead of stacking B separate canvases.
        if b == 1:
            features = jnp.stack(
                [
                    scatter_pillars(pillar_feats[i], coors[i],
                                    pillar_mask[i], ny, nx)
                    for i in range(b)
                ]
            )  # [B, ny, nx, C]
        else:
            flat = jnp.where(
                pillar_mask,
                jnp.arange(b, dtype=jnp.int32)[:, None] * (ny * nx)
                + coors[..., 1] * nx + coors[..., 2],
                jnp.int32(1 << 30),
            ).reshape(-1)
            canvas = jnp.zeros((b * ny * nx, c), pillar_feats.dtype)
            features = canvas.at[flat].set(
                pillar_feats.reshape(-1, c), mode="drop"
            ).reshape(b, ny, nx, c)

        r2 = rcs[..., 0] ** 2 + rcs[..., 1] ** 2
        true_rcs = nn.relu(rcs[..., -2] * r2)
        radius = true_rcs + 1.0
        centers = jnp.stack([coors[..., 2], coors[..., 1]], axis=-1)  # (x, y)
        # the RCS maps are parameter-free functions of the raw radar
        # points (no grad path), so the whole ~650-op shift/reduce chain
        # runs as ONE Pallas kernel with the canvas VMEM-resident in both
        # training and inference (ops/rcs_render.py; the XLA chain in
        # core/gaussian.py stays as the oracle)
        from ..core.gaussian import compute_rcs_seeds
        from ..ops.rcs_render import render_rcs_maps_pallas

        # unrolled for the same batched-scatter-lowering reason as above
        seeds = [
            compute_rcs_seeds(centers[i], radius[i], rcs[i, ..., -2],
                              pillar_mask[i], ny, nx, self.r_max)
            for i in range(b)
        ]
        seed_r = jnp.stack([s[0] for s in seeds])
        seed_v = jnp.stack([s[1] for s in seeds])
        heat, feat = render_rcs_maps_pallas(seed_r, seed_v, self.r_max)

        # elementwise 1x1 "conv" over the two f32 maps (no [B, ny, nx, 2]
        # stack: minor-dim 2 lane-pads 64x on TPU); cast at this boundary
        # or the concat below upcasts the whole radar canvas and everything
        # after it to f32 under bf16 activations
        rcs_att = _RCSAtt(self.in_channels, name="rcs_att")(heat, feat)
        rcs_att = rcs_att.astype(pillar_feats.dtype)
        out = _SplitConcatConv(self.in_channels, name="compress")(
            features, rcs_att,
            fast=not train and not self.is_initializing(),
        )
        return out
