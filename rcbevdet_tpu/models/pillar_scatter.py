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


def scatter_pillars(pillar_feats, coors, pillar_mask, ny, nx):
    """[P, C] pillar features -> [ny, nx, C] canvas (one sample)."""
    p, c = pillar_feats.shape
    flat = jnp.where(
        pillar_mask, coors[:, 1] * nx + coors[:, 2], ny * nx
    ).astype(jnp.int32)
    canvas = jnp.zeros((ny * nx + 1, c), pillar_feats.dtype)
    canvas = canvas.at[flat].set(
        jnp.where(pillar_mask[:, None], pillar_feats, 0.0), mode="drop"
    )
    return canvas[: ny * nx].reshape(ny, nx, c)


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

        # the RCS maps render in f32 (exp/EDT math); cast at this boundary
        # or the concat below upcasts the whole radar canvas and everything
        # after it to f32 under bf16 activations
        rcs_in = jnp.stack([heat, feat], axis=-1).astype(
            pillar_feats.dtype
        )  # [B, ny, nx, 2]
        rcs_att = nn.Conv(self.in_channels, (1, 1), name="rcs_att")(rcs_in)
        out = nn.Conv(
            self.in_channels, (3, 3), padding=((1, 1), (1, 1)), name="compress"
        )(jnp.concatenate([features, rcs_att], axis=-1))
        return out
