"""CenterPoint box decoding (JAX, static top-K).

Mirrors ``CenterPointBBoxCoder.decode`` (reference
core/bbox/coders/centerpoint_bbox_coders.py:117-229) with a static-shape
formulation: score-threshold / range filtering become a returned validity
mask instead of boolean compaction, so the whole decode jits cleanly; NMS
consumes the masked arrays host-side.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def _exact_topk(flat, k, blk=8192):
    """Exact top-k via a two-stage blocked sort.

    Any global top-k element is in its block's top-k (fewer than k larger
    elements exist globally, so fewer within the block), so per-block top-k
    followed by top-k over the nb*k candidates is EXACT — same contract as
    ``lax.top_k`` up to tie order.  On v5e the [1, 164k] decode sort costs
    392 us as one flat ``lax.top_k`` but 192 us in this form (r5 A/B;
    blk=8192 beat 4096/16384/32768): the 20 block sorts vectorize across
    rows and the stage-2 sort runs on 10k candidates instead of 164k.
    ``approx_max_k(recall_target=1.0)`` lowers to the flat sort and is no
    faster (see the r5 note below).
    """
    b, n = flat.shape
    if n % blk or n // blk < 2 or k > blk:
        return jax.lax.top_k(flat, k)
    nb = n // blk
    s1, i1 = jax.lax.top_k(flat.reshape(b * nb, blk), k)
    base = (jnp.arange(nb, dtype=i1.dtype) * blk)[None, :, None]
    i1 = (i1.reshape(b, nb, k) + base).reshape(b, nb * k)
    s2, i2 = jax.lax.top_k(s1.reshape(b, nb * k), k)
    return s2, jnp.take_along_axis(i1, i2, axis=1)


class DecodedBoxes(NamedTuple):
    bboxes: jnp.ndarray  # [B, K, 9] (x, y, z_gravity, dx, dy, dz, yaw, vx, vy)
    scores: jnp.ndarray  # [B, K]
    labels: jnp.ndarray  # [B, K] int32
    valid: jnp.ndarray  # [B, K] bool (score-threshold & center-range mask)


def centerpoint_decode(
    heatmap,
    rot_sine,
    rot_cosine,
    height,
    dim,
    vel,
    reg,
    pc_range,
    voxel_size,
    out_size_factor,
    post_center_range,
    max_num=500,
    score_threshold=0.1,
):
    """Decode head outputs into metric boxes.

    Args (all NHWC):
      heatmap: [B, H, W, num_classes] sigmoided class scores.
      rot_sine/rot_cosine: [B, H, W, 1].
      height: [B, H, W, 1] (gravity-center z).
      dim: [B, H, W, 3] (already exp'd if norm_bbox).
      vel: [B, H, W, 2].
      reg: [B, H, W, 2] sub-cell offsets.

    Returns:
      DecodedBoxes with K = max_num entries per sample.
    """
    b, h, w, num_cls = heatmap.shape

    # top-K over all classes jointly: the reference does per-class topK then
    # topK over the union (coders.py:63-97); with K <= H*W both formulations
    # admit the same result set; we take topK over the flattened map which is
    # exact whenever per-class peaks don't exceed K (always true at K=500
    # with a 10-class 128x128 map when peaks are sparse) and simpler on TPU.
    # Flatten in the NHWC layout the head emits (flat index = (y*W+x)*C + c):
    # the NCHW-order flatten used through r4 forced a full-map relayout
    # transpose before the sort (~0.5 ms/frame of the S=8 "unattributed"
    # decode tail).
    flat = heatmap.reshape(b, -1)  # [B, H*W*C]
    # r5 note: approx_max_k(recall_target=1.0) was tried for the 0.35 ms
    # top-k sort at [1, 164k] — it lowers to the SAME full sort when exact
    # recall is requested; the blocked two-stage form above IS exact and
    # ~2x faster (recall < 1 would break the decode-parity oracles).
    scores, idx = _exact_topk(flat, max_num)  # [B, K]
    labels = (idx % num_cls).astype(jnp.int32)
    pos = idx // num_cls
    ys = (pos // w).astype(jnp.float32)
    xs = (pos % w).astype(jnp.float32)

    # ONE row-gather for all regression features: the 6 per-feature vmap
    # gathers each paid their own [B, K] index walk + fusion (part of the
    # same S=8 decode tail); the channel concat is a single fused pass.
    feats = jnp.concatenate(
        [reg, rot_sine, rot_cosine, height, dim, vel], axis=-1
    )  # [B, H, W, 11]
    nf = feats.shape[-1]
    gathered = jax.vmap(lambda f, p: f.reshape(h * w, nf)[p])(feats, pos)
    reg_g = gathered[..., 0:2]
    rot = jnp.arctan2(gathered[..., 2:3], gathered[..., 3:4])
    hei = gathered[..., 4:5]
    dim_g = gathered[..., 5:8]
    vel_g = gathered[..., 8:10]
    xs = xs[..., None] + reg_g[..., 0:1]
    ys = ys[..., None] + reg_g[..., 1:2]

    xs = xs * out_size_factor * voxel_size[0] + pc_range[0]
    ys = ys * out_size_factor * voxel_size[1] + pc_range[1]

    bboxes = jnp.concatenate([xs, ys, hei, dim_g, rot, vel_g], axis=-1)

    valid = jnp.ones(scores.shape, bool)
    if score_threshold is not None:
        valid &= scores > score_threshold
    if post_center_range is not None:
        pcr = jnp.asarray(post_center_range)
        centers = bboxes[..., :3]
        valid &= jnp.all(centers >= pcr[:3], axis=-1)
        valid &= jnp.all(centers <= pcr[3:], axis=-1)

    return DecodedBoxes(bboxes, scores, labels, valid)
