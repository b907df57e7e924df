"""RadarBEVNet: dual-stream radar pillar encoder (flax, fixed capacity).

Re-design of the reference ``RadarBEVNet`` (models/backbones/radar_encoder.py
:265-451).  The reference processes a dynamic pillar list with a Python loop
over batch splits (:417-442); here everything is batched [B, P, K, C] with a
pillar validity mask, and the per-sample transformer streams become masked
attention over P pillar tokens.

Faithfully reproduced reference quirks (SURVEY.md "fidelity gotchas"):
- ``Extractor`` and ``SelfAttentionBlock`` REPLACE their query with the FFN
  output instead of adding a residual (radar_encoder.py:128,215); the
  ``Injector`` keeps its gated residual (:432).
- Both RFN layers are built with last_layer=False (:293-296): no
  intermediate max-pool; per-point features broadcast back from pillar
  tokens via expand (:432-434).
- f_center's x decoration uses coors column 1 — the z coordinate, always 0
  for pillars — so it degenerates to ``x - x_offset`` (:365-367). We replicate
  this to stay checkpoint-compatible.
- xyz are normalized to [0,1] in place BEFORE rcs_features is captured
  (:373-386), so the RCS scatter sees normalized coords.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm, TorchMultiheadAttention

NEG_INF = -1e9


class RFNLayer(nn.Module):
    """Linear(no bias) + BN1d + ReLU over per-point features
    (radar_encoder.py:38-74, always last_layer=False)."""

    out_channels: int

    @nn.compact
    def __call__(self, x, stats_mask, train=False, update_stats=True):
        x = nn.Dense(self.out_channels, use_bias=False, name="linear")(x)
        x = BatchNorm(momentum=0.01, epsilon=1e-3, name="norm")(
            x, use_running_average=not train, update_stats=update_stats,
            mask=stats_mask,
        )
        return nn.relu(x)


class PointEmbed(nn.Module):
    """Per-point embed with a pillar-global max branch
    (radar_encoder.py:77-104).  Conv1d(k=1) == Dense per point."""

    out_channels: int

    @nn.compact
    def __call__(self, points, stats_mask, train=False, update_stats=True):
        # conv1: Dense-BN-ReLU-Dense
        f = nn.Dense(self.out_channels, name="conv1_0")(points)
        f = BatchNorm(name="conv1_bn")(
            f, use_running_average=not train, update_stats=update_stats,
            mask=stats_mask,
        )
        f = nn.relu(f)
        f = nn.Dense(self.out_channels, name="conv1_1")(f)
        # global max over the points of each pillar (includes padded slots,
        # as in the reference where the zeroed inputs still get conv biases)
        g = jnp.max(f, axis=-2, keepdims=True)
        g = jnp.broadcast_to(g, f.shape)
        f = jnp.concatenate([g, f], axis=-1)
        f = nn.Dense(self.out_channels * 2, name="conv2_0")(f)
        f = BatchNorm(name="conv2_bn")(
            f, use_running_average=not train, update_stats=update_stats,
            mask=stats_mask,
        )
        f = nn.relu(f)
        f = nn.Dense(self.out_channels, name="conv2_1")(f)
        return f


class CrossAttention(nn.Module):
    """Plain cross-attention, qkv_bias=False (radar_encoder.py:163-191)."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, c, key_mask=None):
        b, n, d = x.shape
        h = self.num_heads
        hd = d // h
        kv = nn.Dense(d * 2, use_bias=False, name="kv")(c)
        k, v = jnp.split(kv, 2, axis=-1)
        q = nn.Dense(d, use_bias=False, name="q")(x)
        q = q.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, -1, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, -1, h, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hd**-0.5)
        if key_mask is not None:
            logits = jnp.where(key_mask[:, None, None, :], logits, NEG_INF)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
        return nn.Dense(d, name="proj")(out)


class Extractor(nn.Module):
    """Cross-attn pulling transformer info into the point stream; the FFN
    output REPLACES the query (radar_encoder.py:106-136, :128)."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, query, feat, key_mask=None):
        attn = CrossAttention(self.dim, self.num_heads, name="attn")(
            nn.LayerNorm(epsilon=1e-6, name="query_norm")(query),
            nn.LayerNorm(epsilon=1e-6, name="feat_norm")(feat),
            key_mask=key_mask,
        )
        query = query + attn
        hidden = nn.Dense(self.dim, name="ffn_fc1")(
            nn.LayerNorm(epsilon=1e-6, name="ffn_norm")(query)
        )
        return nn.Dense(self.dim, name="ffn_fc2")(nn.gelu(hidden, approximate=False))


class Injector(nn.Module):
    """Gated cross-attn adding point info into the transformer stream
    (radar_encoder.py:139-161); caller adds the residual."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, query, feat, key_mask=None):
        attn = CrossAttention(self.dim, self.num_heads, name="attn")(
            nn.LayerNorm(epsilon=1e-6, name="query_norm")(query),
            nn.LayerNorm(epsilon=1e-6, name="feat_norm")(feat),
            key_mask=key_mask,
        )
        gamma = self.param("gamma", nn.initializers.zeros, (self.dim,))
        return gamma * attn


class DMSA(nn.Module):
    """Distance-modulated self-attention (radar_encoder.py:225-261):
    additive bias ``-dist(i,j) * beta_h(i)`` from pairwise BEV center
    distances, on top of a torch-style MHA WITH residual (mmcv
    MultiheadAttention adds identity internally)."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, query_bbox, query_feat, key_mask=None):
        centers = jax.lax.stop_gradient(query_bbox[..., :2])
        dist = -jnp.linalg.norm(
            centers[:, :, None, :] - centers[:, None, :, :], axis=-1
        )  # [B, P, P], negative distances
        beta = nn.Dense(
            self.num_heads,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                key, shape, dtype, 0.0, 2.0
            ),
            name="beta",
        )(query_feat)  # [B, P, H]
        bias = dist[:, None, :, :] * beta.transpose(0, 2, 1)[..., None]
        if key_mask is not None:
            bias = jnp.where(key_mask[:, None, None, :], bias, NEG_INF)
        # distances are f32 geometry; cast so the attention logits (and the
        # whole transformer stream after them) keep the activation dtype
        bias = bias.astype(query_feat.dtype)
        out = TorchMultiheadAttention(self.dim, self.num_heads, name="attention")(
            query_feat, attn_bias=bias.reshape(-1, *bias.shape[2:])
        )
        return query_feat + out


class SelfAttentionBlock(nn.Module):
    """DMSA + FFN whose output REPLACES the stream (radar_encoder.py:193-223)."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, feat, points, key_mask=None):
        identity = feat
        feat = nn.LayerNorm(epsilon=1e-6, name="query_norm")(feat)
        feat = DMSA(self.dim, self.num_heads, name="attn")(
            points, feat, key_mask=key_mask
        )
        feat = feat + identity
        hidden = nn.Dense(self.dim * 2, name="ffn_fc1")(
            nn.LayerNorm(epsilon=1e-6, name="ffn_norm")(feat)
        )
        return nn.Dense(self.dim, name="ffn_fc2")(nn.gelu(hidden, approximate=False))


class RadarBEVNet(nn.Module):
    """Dual-stream radar pillar encoder.

    Args (config rcbevdet-...py:107-120): in_channels 7, feat_channels
    (32, 64), voxel_size (0.2, 0.2, 8), pc range nuScenes, pos embed on.

    Inputs:
      features: [B, P, K, in_channels] raw per-point features
        (x, y, z, vx, vy, rcs, t) zero-padded.
      num_points: [B, P] valid points per pillar.
      coors: [B, P, 3] (z, y, x) int32 voxel coords.
      pillar_mask: [B, P] bool.

    Returns:
      pillar_feats [B, P, feat_channels[-1]], rcs [B, P, in_channels]
      (masked mean of the xyz-normalized raw features, radar_encoder.py:450).
    """

    in_channels: int = 7
    feat_channels: Tuple[int, ...] = (32, 64)
    voxel_size: Tuple[float, float, float] = (0.2, 0.2, 8.0)
    point_cloud_range: Tuple[float, ...] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    with_pos_embed: bool = True
    num_heads: int = 2
    # activation dtype for the learned streams; the geometric decoration
    # (voxel offsets, normalized xyz, DMSA distances) always stays f32.
    # Without this boundary cast, f32 radar points keep the whole radar
    # branch -- and through CAMF's value projection, half the fusion -- in
    # f32 even when the rest of the model runs bf16 (f32 x bf16 promotes
    # to f32 under jax dtype promotion).
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, features, num_points, coors, pillar_mask,
                 train=False, update_stats=True):
        b, p, k, d = features.shape
        pc = self.point_cloud_range
        vx, vy = self.voxel_size[:2]
        x_offset = vx / 2 + pc[0]
        y_offset = vy / 2 + pc[1]

        # Reference quirk (:365-369): x decoration indexes the z coor column.
        f_center_x = features[..., 0] - (
            coors[..., 0].astype(features.dtype)[..., None] * vx + x_offset
        )
        f_center_y = features[..., 1] - (
            coors[..., 1].astype(features.dtype)[..., None] * vy + y_offset
        )
        f_center = jnp.stack([f_center_x, f_center_y], axis=-1)

        # normalize xyz to [0, 1] in place (:373-375)
        features = features.at[..., 0].set(
            (features[..., 0] - pc[0]) / (pc[3] - pc[0])
        )
        features = features.at[..., 1].set(
            (features[..., 1] - pc[1]) / (pc[4] - pc[1])
        )
        features = features.at[..., 2].set(
            (features[..., 2] - pc[2]) / (pc[5] - pc[2])
        )

        point_mask = (
            jnp.arange(k)[None, None, :] < num_points[..., None]
        ).astype(features.dtype)  # [B, P, K]
        pm = point_mask[..., None]
        denom = jnp.maximum(jnp.sum(point_mask, axis=-1, keepdims=True), 1.0)

        # masked mean over points of x and y (:381-384)
        mean_x = jnp.sum(features[..., 0] * point_mask, axis=-1) / denom[..., 0]
        mean_y = jnp.sum(features[..., 1] * point_mask, axis=-1) / denom[..., 0]
        features_mean = jnp.stack(
            [
                features[..., 0] - mean_x[..., None],
                features[..., 1] - mean_y[..., None],
            ],
            axis=-1,
        )

        rcs_features = features  # already normalized (:386)
        c = jnp.concatenate([features, features_mean, f_center], axis=-1)
        x = jnp.concatenate([features, f_center], axis=-1)
        x = x * pm
        c = c * pm
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
            c = c.astype(self.compute_dtype)

        # BN statistics over real pillars only (all K slots, like the ref).
        stats_mask = jnp.broadcast_to(pillar_mask[..., None], (b, p, k))

        c = PointEmbed(self.feat_channels[0], name="point_embed")(
            c, stats_mask, train=train, update_stats=update_stats
        )
        if self.with_pos_embed:
            pe = features[..., 0:3]
            if self.compute_dtype is not None:
                pe = pe.astype(self.compute_dtype)
            pe = nn.Dense(self.feat_channels[0], name="pos_embed_fc1")(pe)
            pe = nn.LayerNorm(name="pos_embed_ln1")(pe)
            pe = nn.relu(pe)
            pe = nn.Dense(self.feat_channels[0], name="pos_embed_fc2")(pe)
            pe = nn.LayerNorm(name="pos_embed_ln2")(pe)
            pe = nn.relu(pe)
            c = c + pe

        points_coors = jax.lax.stop_gradient(features[..., 0:3])
        key_mask = pillar_mask  # [B, P] True = real pillar

        def compress(t):  # [B, P, K, C] -> [B, P, C] pillar tokens (:357-360)
            return jnp.max(t, axis=-2)

        n_levels = len(self.feat_channels)
        for i in range(n_levels):
            x = RFNLayer(self.feat_channels[i], name=f"rfn{i}")(
                x, stats_mask, train=train, update_stats=update_stats
            )
            cc = compress(c)
            xc = compress(x)
            inj = Injector(
                self.feat_channels[i], self.num_heads, name=f"injector{i}"
            )(cc, xc, key_mask=key_mask)
            c = c + inj[:, :, None, :]
            ext = Extractor(
                self.feat_channels[i], self.num_heads, name=f"extractor{i}"
            )(compress(x), compress(c), key_mask=key_mask)
            x = x + ext[:, :, None, :]
            sab = SelfAttentionBlock(
                self.feat_channels[i], self.num_heads, name=f"transformer{i}"
            )(compress(c), compress(points_coors), key_mask=key_mask)
            c = jnp.broadcast_to(sab[:, :, None, :], c.shape[:3] + (sab.shape[-1],))
            if i < n_levels - 1:
                c = nn.Dense(self.feat_channels[i + 1], name=f"linear{i}")(c)

        out = nn.Dense(self.feat_channels[-1], name="out_linear")(
            jnp.concatenate([c, x], axis=-1)
        )
        out = jnp.max(out, axis=-2)  # [B, P, C] (:446)
        rcs = jnp.sum(rcs_features * pm, axis=-2) / denom  # [B, P, D] (:450)
        out = out * pillar_mask[..., None]
        rcs = rcs * pillar_mask[..., None]
        return out, rcs
