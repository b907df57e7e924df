"""HoP: Historical Object Prediction auxiliary training.

Re-design of the reference's ``HoPBEVDet4D``/``BiTemporalPredictor``
(models/detectors/bevdet.py:1174-1450, models/backbones/temporal_backbone.py
:152-290): reconstruct the frame t-1 BEV from the OTHER frames
(t, t-2, ..., t-n) with a bi-temporal decoder — a full-width short-term
branch over the 2 nearest frames and a channel-reduced long-term branch over
all frames — and supervise the reconstruction with the t-1 ground truth
through an auxiliary CenterHead.

The reference stacks BEVFormer layers with TemporalCrossAttention; here each
branch is two blocks of (deformable cross-attention over the frame features
as levels -> LayerNorm -> FFN -> LayerNorm), built on the same MSDeformAttn
as CAMF — functionally equivalent attention pattern, one implementation.
The auxiliary head is a single-task CenterHead (the reference groups classes
into 6 tasks; single-task is this framework's head convention) with the
reference's 0.5x auxiliary loss weights.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .camf import LearnedPositionalEncoding, MSDeformAttn, reference_points_2d


class _DecoderBlock(nn.Module):
    dim: int
    num_heads: int
    num_levels: int
    ffn_dim: int

    @nn.compact
    def __call__(self, query, values, spatial_shapes, ref):
        # HoP only runs on the training path (auxiliary supervision), so
        # pin the remat-friendly einsum reduce form (see MSDeformAttn)
        attn = MSDeformAttn(
            self.dim, self.num_levels, self.num_heads, 4, name="attn"
        )(query, ref, values, spatial_shapes, train=True)
        x = nn.LayerNorm(name="norm1")(query + attn)
        y = nn.Dense(self.ffn_dim, name="ffn_fc1")(x)
        y = nn.Dense(self.dim, name="ffn_fc2")(nn.relu(y))
        return nn.LayerNorm(name="norm2")(x + y)


class _TemporalBranch(nn.Module):
    dim: int
    num_heads: int
    num_layers: int = 2
    ffn_dim: int = 512

    @nn.compact
    def __call__(self, frames):
        """frames: [B, F, H, W, dim] -> [B, H*W, dim] reconstructed BEV."""
        b, f, h, w, d = frames.shape
        values = frames.reshape(b, f * h * w, d)
        shapes = tuple((h, w) for _ in range(f))
        queries = self.param(
            "queries", nn.initializers.normal(0.02), (h * w, d)
        )
        pos = LearnedPositionalEncoding(d // 2, h, w, name="pos")(h, w)
        query = jnp.broadcast_to(queries[None], (b, h * w, d)) + pos
        ref = jnp.broadcast_to(
            reference_points_2d(h, w), (b, h * w, 1, 2)
        )
        ref = jnp.broadcast_to(ref, (b, h * w, f, 2))
        for i in range(self.num_layers):
            query = _DecoderBlock(
                self.dim, self.num_heads, f, self.ffn_dim, name=f"layer{i}"
            )(query, values, shapes, ref)
        return query


class HoPTemporalPredictor(nn.Module):
    """Bi-temporal predictor reconstructing the t-1 BEV feature.

    Config mirrors the reference (det-...-withHoP-...py:88-146): in 80ch,
    embed 160, reduction 4 (long branch 40ch), num_short 2, out 256ch.
    """

    in_channels: int = 80
    embed_dims: int = 160
    out_channels: int = 256
    reduction: int = 4
    num_short: int = 2
    num_heads_short: int = 5
    num_heads_long: int = 2

    @staticmethod
    def _fit_heads(preferred, dim):
        for h in (preferred, 5, 4, 2, 1):
            if dim % h == 0:
                return h
        return 1

    @nn.compact
    def __call__(self, frames):
        """frames: [B, F', H, W, in_channels] — frames WITHOUT t-1, nearest
        first ([t, t-2, t-3, ...]).  Returns [B, H, W, out_channels]."""
        b, f, h, w, _ = frames.shape
        x = nn.Dense(self.embed_dims, use_bias=False, name="proj")(frames)
        x = nn.LayerNorm(name="proj_ln")(x)
        frame_embeds = self.param(
            "frame_embeds", nn.initializers.normal(1.0), (f, self.embed_dims)
        )
        x = x + frame_embeds[None, :, None, None, :]

        short = _TemporalBranch(
            self.embed_dims,
            self._fit_heads(self.num_heads_short, self.embed_dims),
            ffn_dim=512, name="short",
        )(x[:, : self.num_short])

        red = self.embed_dims // self.reduction
        x_long = nn.Dense(red, name="input_proj")(x)
        x_long = nn.LayerNorm(name="input_proj_ln")(x_long)
        long = _TemporalBranch(
            red, self._fit_heads(self.num_heads_long, red),
            ffn_dim=128, name="long",
        )(x_long)

        y = jnp.concatenate([short, long], axis=-1).reshape(
            b, h, w, self.embed_dims + red
        )
        y = nn.Conv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
            use_bias=False, name="output_conv",
        )(y)
        return nn.LayerNorm(name="output_ln")(y)
