"""Multi-scale multi-view sampling (SparseBEV / RCBEVDet++ sparse decoder).

TPU-native equivalent of the reference's msmv_sampling CUDA op
(mmdet3d/ops/csrc/msmv_sampling.cpp, msmv_sampling_forward.cu:75,166): for
[B, Q, P, 3] normalized sampling locations, trilinearly sample each level
of a multi-view feature pyramid — (x, y) bilinear within a view, the third
coordinate interpolating across the view axis — scale the per-level result
by its scale weight, and sum over levels.  The reference's own PyTorch
oracle (ops/csrc/wrapper.py:14-38) expresses this as 3-D ``F.grid_sample``
with ``align_corners=True`` and zeros padding; this module is a direct XLA
gather+lerp formulation of those semantics (gradients via autodiff — the
hand-written col2im backward of msmv_sampling_backward.cu is what autodiff
produces for a gather).

Layout: channels-last.  Each level is [B, N, H_l, W_l, C] and the output is
[B, Q, P, C] (the reference returns [B, Q, C, P]; transpose at the caller
if needed).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _gather_cell(feat, n, y, x):
    """feat [N, H, W, C]; integer index arrays -> [..., C], 0 out of range."""
    nn_, h, w, _ = feat.shape
    ok = (
        (n >= 0) & (n < nn_) & (y >= 0) & (y < h) & (x >= 0) & (x < w)
    )
    nc = jnp.clip(n, 0, nn_ - 1)
    yc = jnp.clip(y, 0, h - 1)
    xc = jnp.clip(x, 0, w - 1)
    flat = feat.reshape(-1, feat.shape[-1])
    idx = (nc * h + yc) * w + xc
    vals = flat[idx]
    return vals * ok[..., None].astype(feat.dtype)


def _trilinear_one(feat, loc):
    """feat [N, H, W, C]; loc [..., 3] in [0, 1] as (x, y, view).

    align_corners=True semantics: continuous index = loc * (size - 1);
    padding_mode='zeros' — out-of-range corners contribute 0.
    """
    nn_, h, w, _ = feat.shape
    x = loc[..., 0] * (w - 1)
    y = loc[..., 1] * (h - 1)
    z = loc[..., 2] * (nn_ - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.floor(z).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    fz = (z - z0)[..., None]

    def corner(dz, dy, dx):
        return _gather_cell(feat, z0 + dz, y0 + dy, x0 + dx)

    c000 = corner(0, 0, 0)
    c001 = corner(0, 0, 1)
    c010 = corner(0, 1, 0)
    c011 = corner(0, 1, 1)
    c100 = corner(1, 0, 0)
    c101 = corner(1, 0, 1)
    c110 = corner(1, 1, 0)
    c111 = corner(1, 1, 1)
    top = (
        (c000 * (1 - fx) + c001 * fx) * (1 - fy)
        + (c010 * (1 - fx) + c011 * fx) * fy
    )
    bot = (
        (c100 * (1 - fx) + c101 * fx) * (1 - fy)
        + (c110 * (1 - fx) + c111 * fx) * fy
    )
    return top * (1 - fz) + bot * fz


def msmv_sampling(
    mlvl_feats: Sequence[jnp.ndarray],
    sampling_locations: jnp.ndarray,
    scale_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Sample a multi-view pyramid at sparse 3D locations.

    Args:
      mlvl_feats: per-level [B, N, H_l, W_l, C] features (C2..C5 or C2..C6).
      sampling_locations: [B, Q, P, 3] in [0, 1] — (x, y, view index /
        (N-1)); exactly the reference wrapper's pre-scaled coordinates
        (wrapper.py:24 maps them to [-1, 1] for grid_sample; the
        align_corners=True pixel mapping is applied here directly).
      scale_weights: [B, Q, P, L] per-level mixing weights.

    Returns:
      [B, Q, P, C]
    """
    assert scale_weights.shape[-1] == len(mlvl_feats)
    out = None
    for lvl, feat in enumerate(mlvl_feats):
        sampled = jax.vmap(_trilinear_one)(feat, sampling_locations)
        term = sampled * scale_weights[..., lvl, None]
        out = term if out is None else out + term
    return out
