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
    """Parameter holder for the RCS-attention 1x1 conv.

    Param tree matches ``nn.Conv(features, (1, 1))`` exactly (kernel
    [1, 1, 2, C] + bias [C]) so reference-checkpoint conversion is
    unchanged.  The VALUES are returned instead of applying the conv: the
    [B, ny, nx, C] rcs_att tensor is never materialized — its 1x1 kernel
    is folded into the compress conv's kernel slice (see
    ``PointPillarsScatterRCS.__call__``), because a 1x1 conv followed by a
    3x3 conv is itself a 3x3 conv over the 1x1's INPUTS:
    ``conv3x3(heat*k0 + feat*k1 + b, Wb) ==
    conv3x3_taps(heat, k0@Wb) + conv3x3_taps(feat, k1@Wb) + const(b, Wb)``.
    """

    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, 2, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


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


class _CompressConv(nn.Module):
    """Parameter holder for the compress conv (kernel [3, 3, 2C, C] + bias,
    matching ``nn.Conv(C, 3x3)`` over the concat input so reference
    checkpoints convert unchanged); values returned, compute fused in
    ``PointPillarsScatterRCS.__call__``."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, self.in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


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

        # python-unrolled over B, NOT vmapped: XLA's batched-scatter
        # lowering serializes through [C, B, cells]-layout while loops
        # (~14 ms of relayout at 4-stream serving); per-sample scatters
        # stay on the fast lowering (same finding as the train-time LSS
        # pooling, view_transformer.py)
        features = jnp.stack(
            [
                scatter_pillars(pillar_feats[i], coors[i], pillar_mask[i],
                                ny, nx)
                for i in range(b)
            ]
        )  # [B, ny, nx, C]

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

        # Fused compress: conv(concat([features, rcs_att]), W) with the
        # rcs_att 1x1 conv FOLDED INTO the compress kernel's second slice —
        # neither the [B, ny, nx, 2C] concat nor the [B, ny, nx, C] rcs_att
        # tensor (f32, 67 MB at the 512x512 canvas) ever exists.  The RCS
        # contribution collapses to 18 shifted scalar-map FMAs (one XLA
        # loop fusion over the two [B, ny, nx] f32 maps; a [B, ny, nx, 2]
        # stack would lane-pad 2 -> 128, 64x HBM amplification).  Profiled
        # r4: the unfused form cost ~0.93 ms/frame of the radar tail.
        c_in = self.in_channels
        k_rcs, b_rcs = _RCSAtt(c_in, name="rcs_att")()
        k_comp, b_comp = _CompressConv(
            c_in, 2 * c_in, name="compress")()
        wa = k_comp[:, :, :c_in]
        wb = k_comp[:, :, c_in:].astype(jnp.float32)
        kr = k_rcs[0, 0].astype(jnp.float32)  # [2, C]
        w2 = jnp.einsum("mc,yxco->yxmo", kr, wb)  # [3, 3, 2, C]
        # rcs_att's bias rides a third, constant-one map: the compress conv
        # zero-pads, so at the border the bias contributes only through the
        # in-image taps — folding it into a flat output bias would be wrong
        # exactly there
        w2b = jnp.einsum("c,yxco->yxo", b_rcs.astype(jnp.float32), wb)
        out = jax.lax.conv_general_dilated(
            features, wa.astype(features.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        ones = jnp.ones_like(heat)
        maps = jnp.stack([heat, feat, ones], axis=1)  # [B, 3, ny, nx] f32
        mp = jnp.pad(maps, ((0, 0), (0, 0), (1, 1), (1, 1)))
        for dy in range(3):
            for dx in range(3):
                sl = mp[:, :, dy : dy + ny, dx : dx + nx]
                out = out + (sl[:, 0, :, :, None] * w2[dy, dx, 0]
                             + sl[:, 1, :, :, None] * w2[dy, dx, 1]
                             + sl[:, 2, :, :, None] * w2b[dy, dx])
        return (out + b_comp.astype(jnp.float32)).astype(pillar_feats.dtype)
