"""Multi-scale deformable attention sampling core (XLA formulation).

TPU-native replacement for the reference CUDA kernel
(mmdet3d/ops/deformattn/src/cuda/ms_deform_im2col_cuda.cuh:238): for each
(query, head, level, point), bilinearly sample the per-head value map at a
normalized location and accumulate with a softmaxed attention weight.
Sampling semantics match ``F.grid_sample(..., align_corners=False,
padding_mode='zeros')`` as used by the reference PyTorch fallback.

CAMF uses a single 128x128 level (bevdet_rc.py:124-125), so the XLA gather
formulation is already static-shape friendly; a fused Pallas kernel is an
optimization slot on top of this reference implementation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .warp import grid_sample_2d


def _sample_one_head(value_hw, locs, weights):
    """value_hw: [H, W, hd]; locs: [Lq, P, 2] in [0,1]; weights: [Lq, P]."""
    grid = locs * 2.0 - 1.0
    sampled = grid_sample_2d(value_hw, grid, align_corners=False)  # [Lq,P,hd]
    return jnp.einsum("qpd,qp->qd", sampled, weights)


def ms_deform_attn_core(value, spatial_shapes, sampling_locations, attention_weights):
    """Deformable attention aggregation.

    Args:
      value: [B, Len_in, n_heads, head_dim] projected values, levels
        concatenated along Len_in in the order of ``spatial_shapes``.
      spatial_shapes: list of (H, W) static ints per level.
      sampling_locations: [B, Lq, n_heads, n_levels, n_points, 2] in [0, 1].
      attention_weights: [B, Lq, n_heads, n_levels, n_points], softmaxed over
        (levels * points).

    Returns:
      [B, Lq, n_heads * head_dim]
    """
    b, len_in, n_heads, hd = value.shape
    outputs = []
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        value_l = value[:, start : start + h * w]  # [B, HW, heads, hd]
        start += h * w
        value_l = value_l.reshape(b, h, w, n_heads, hd)
        value_l = jnp.moveaxis(value_l, 3, 1)  # [B, heads, H, W, hd]
        locs_l = sampling_locations[:, :, :, lvl]  # [B, Lq, heads, P, 2]
        locs_l = jnp.moveaxis(locs_l, 2, 1)  # [B, heads, Lq, P, 2]
        w_l = jnp.moveaxis(attention_weights[:, :, :, lvl], 2, 1)
        out_l = jax.vmap(jax.vmap(_sample_one_head))(value_l, locs_l, w_l)
        outputs.append(out_l)  # [B, heads, Lq, hd]
    out = sum(outputs)
    out = jnp.moveaxis(out, 1, 2).reshape(b, -1, n_heads * hd)
    return out
