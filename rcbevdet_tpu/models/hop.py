"""HoP: Historical Object Prediction auxiliary training.

FAITHFUL re-implementation of the reference ``BiTemporalPredictor``
(models/backbones/temporal_backbone.py:152-336) and its
``TemporalDecoder`` / ``BEVFormerLayer('self_attn','norm','ffn','norm')`` /
``TemporalCrossAttention`` stack (model_utils/temporal_cross_attention.py:
25-276): reconstruct the frame t-1 BEV from the OTHER frames
(t, t-2, ..., t-n) with a full-width short-term branch over the
``num_short`` nearest frames and a channel-reduced long-term branch over
all frames, then fuse with a 3x3 conv + LayerNorm2d.

Numerics parity vs the reference source (converted weights):
tests/test_hop_parity.py.  Structure notes:

- The sine bev positional encoding (mmcv SinePositionalEncoding,
  normalize=True) is deterministic and parameter-free — precomputed as a
  constant per (H, W).
- TemporalCrossAttention softmaxes its weights over (levels*points) PER
  (head, frame-queue) and MEANS the per-queue outputs — unlike standard
  MSDeformAttn which softmaxes jointly across levels; the sampling core
  itself is the shared packed-corner bilinear machinery
  (ops/deform_attn.ms_deform_attn_core_packed, align_corners=False).
- The attention's residual identity is the PRE-positional query; the
  sine pos is re-added to the query at every layer
  (encoder.py:386-407 + temporal_cross_attention.py:183-188).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.deform_attn import ms_deform_attn_core_packed


def sine_positional_encoding(h, w, num_feats, temperature=10000.0,
                             scale=2 * math.pi, eps=1e-6):
    """mmcv SinePositionalEncoding(normalize=True) over an all-zeros mask,
    flattened to [H*W, 2*num_feats] (y-features first, like the torch
    channel order after the flatten)."""
    y = np.arange(1, h + 1, dtype=np.float32)  # cumsum of ones
    x = np.arange(1, w + 1, dtype=np.float32)
    y = y / (h + eps) * scale
    x = x / (w + eps) * scale
    dim_t = temperature ** (
        2.0 * (np.arange(num_feats, dtype=np.float32) // 2) / num_feats
    )
    pos_x = x[None, :, None] / dim_t  # [1, W, F]
    pos_y = y[:, None, None] / dim_t  # [H, 1, F]
    pos_x = np.broadcast_to(pos_x, (h, w, num_feats))
    pos_y = np.broadcast_to(pos_y, (h, w, num_feats))

    def interleave(p):
        return np.stack(
            (np.sin(p[..., 0::2]), np.cos(p[..., 1::2])), axis=-1
        ).reshape(h, w, num_feats)

    pos = np.concatenate([interleave(pos_y), interleave(pos_x)], axis=-1)
    return jnp.asarray(pos.reshape(h * w, 2 * num_feats))


def reference_points_2d_centers(h, w):
    """TemporalDecoder.get_reference_points (temporal_backbone.py:62-85):
    normalized cell centers, (x, y) order, [H*W, 2]."""
    ys = (np.linspace(0.5, h - 0.5, h, dtype=np.float32)) / h
    xs = (np.linspace(0.5, w - 0.5, w, dtype=np.float32)) / w
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    return jnp.asarray(np.stack([gx.reshape(-1), gy.reshape(-1)], -1))


class _TemporalCrossAttentionLayer(nn.Module):
    """One BEVFormerLayer: TemporalCrossAttention -> LN -> FFN -> LN."""

    dim: int
    num_heads: int
    num_points: int = 4
    ffn_dim: int = 512

    @nn.compact
    def __call__(self, query, values, bev_pos, ref, h, w):
        """query [B, L, C]; values [B, Q, L, C] (per-frame maps, frame 0
        nearest); bev_pos [L, C]; ref [L, 2] normalized centers."""
        b, l, c = query.shape
        q_frames = values.shape[1]
        hd = c // self.num_heads
        identity = query
        q = query + bev_pos[None]
        off = nn.Dense(
            q_frames * self.num_heads * self.num_points * 2,
            name="sampling_offsets",
        )(q).reshape(b, l, self.num_heads, q_frames, 1, self.num_points, 2)
        aw = nn.Dense(
            q_frames * self.num_heads * self.num_points,
            name="attention_weights",
        )(q).reshape(b, l, self.num_heads, q_frames, self.num_points)
        # softmax over levels*points PER (head, queue)
        aw = jax.nn.softmax(aw, axis=-1)
        v = nn.Dense(c, name="value_proj")(values)  # [B, Q, L, C]

        # queue-major batch, exactly the reference's permute+reshape
        off = jnp.moveaxis(off, 3, 1).reshape(
            b * q_frames, l, self.num_heads, 1, self.num_points, 2
        )
        aw = jnp.moveaxis(aw, 3, 1).reshape(
            b * q_frames, l, self.num_heads, 1, self.num_points
        )
        norm = jnp.asarray([float(w), float(h)], off.dtype)
        locs = ref[None, :, None, None, None, :] + off / norm
        out = ms_deform_attn_core_packed(
            v.reshape(b * q_frames, l, self.num_heads, hd),
            [(h, w)], locs, aw, reduce="einsum",
        )  # [B*Q, L, C]
        out = out.reshape(b, q_frames, l, c).mean(axis=1)
        out = nn.Dense(c, name="output_proj")(out)
        query = identity + out  # dropout(0) + identity
        query = nn.LayerNorm(epsilon=1e-5, name="norm0")(query)
        y = nn.Dense(self.ffn_dim, name="ffn_fc1")(query)
        y = nn.Dense(c, name="ffn_fc2")(nn.relu(y))
        query = query + y  # mmcv FFN residual (identity = own input)
        return nn.LayerNorm(epsilon=1e-5, name="norm1")(query)


class HoPTemporalPredictor(nn.Module):
    """BiTemporalPredictor (reference temporal_backbone.py:152-336).

    Config mirrors det-...-withHoP-...py:88-146: in 80ch, embed 160,
    reduction 4 (long branch 40ch), num_short 2, heads 5/2, 2 layers per
    branch, FFN 512/128, out 256ch.
    """

    in_channels: int = 80
    embed_dims: int = 160
    out_channels: int = 256
    reduction: int = 4
    num_short: int = 2
    num_heads_short: int = 5
    num_heads_long: int = 2
    num_points: int = 4
    num_layers: int = 2
    ffn_short: int = 512
    ffn_long: int = 128

    @staticmethod
    def _fit_heads(preferred, dim):
        """Largest workable head count <= preferred (tiny test configs
        shrink embed_dims below the reference's 160, where 5 | 160)."""
        for h in (preferred, 5, 4, 2, 1):
            if dim % h == 0:
                return h
        return 1

    @nn.compact
    def __call__(self, frames):
        """frames: [B, F', H, W, in_channels] — frames WITHOUT t-1, nearest
        first ([t, t-2, t-3, ...]).  Returns [B, H, W, out_channels]."""
        b, f, h, w, _ = frames.shape
        red = self.embed_dims // self.reduction
        # proj: 1x1 conv (no bias) + LayerNorm2d (channel-wise LN)
        x = nn.Conv(
            self.embed_dims, (1, 1), use_bias=False, name="proj_conv"
        )(frames)
        x = nn.LayerNorm(name="proj_ln")(x)
        frame_embeds = self.param(
            "frame_embeds", nn.initializers.normal(1.0),
            (f, self.embed_dims),
        )
        x = x + frame_embeds[None, :, None, None, :]

        v_short = x[:, : self.num_short].reshape(
            b, self.num_short, h * w, self.embed_dims
        )
        v_long = nn.Dense(red, name="input_proj")(x)
        # torch nn.LayerNorm eps=1e-5 (the 1x1-proj/output LNs are
        # LayerNorm2d with eps=1e-6 = the flax default)
        v_long = nn.LayerNorm(epsilon=1e-5, name="input_proj_ln")(v_long).reshape(
            b, f, h * w, red
        )

        q_short = self.param(
            "queries_short", nn.initializers.normal(0.02),
            (h * w, self.embed_dims),
        )
        q_long = self.param(
            "queries_long", nn.initializers.normal(0.02), (h * w, red)
        )
        pos_short = sine_positional_encoding(h, w, self.embed_dims // 2)
        pos_long = sine_positional_encoding(h, w, red // 2)
        ref = reference_points_2d_centers(h, w)

        ql = jnp.broadcast_to(q_long[None], (b, h * w, red))
        for i in range(self.num_layers):
            ql = _TemporalCrossAttentionLayer(
                red, self._fit_heads(self.num_heads_long, red),
                self.num_points, self.ffn_long, name=f"long_layer{i}",
            )(ql, v_long, pos_long, ref, h, w)
        qs = jnp.broadcast_to(q_short[None], (b, h * w, self.embed_dims))
        for i in range(self.num_layers):
            qs = _TemporalCrossAttentionLayer(
                self.embed_dims,
                self._fit_heads(self.num_heads_short, self.embed_dims),
                self.num_points, self.ffn_short, name=f"short_layer{i}",
            )(qs, v_short, pos_short, ref, h, w)

        # short first in the fuse concat (temporal_backbone.py:335)
        y = jnp.concatenate(
            [
                qs.reshape(b, h, w, self.embed_dims),
                ql.reshape(b, h, w, red),
            ],
            axis=-1,
        )
        y = nn.Conv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
            use_bias=False, name="output_conv",
        )(y)
        return nn.LayerNorm(name="output_ln")(y)
