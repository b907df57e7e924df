"""BEVPoolv2-style Lift-Splat-Shoot frustum-to-BEV pooling, TPU-native.

The reference implementation (mmdet3d/ops/bev_pool_v2/src/bev_pool_cuda.cu:21
in RCBEVDet) sorts frustum points by their BEV voxel rank and launches one CUDA
thread per (interval, channel) that accumulates ``depth[rd[i]] * feat[rf[i]]``
over the interval.  That interval trick exists to avoid atomics; on TPU we
instead express the whole op as a masked segment-sum, which XLA lowers to an
efficient (sort-free on the user side) scatter-add, and autodiff produces
exactly the gradients the reference's hand-written backward computes
(bev_pool_cuda.cu:67-121): d_depth = <g[v], feat[p]>, d_feat = sum depth * g.

Static-shape design: every frustum point participates; out-of-range points are
redirected to a trash segment (index ``num_cells``) that is dropped on return.
This keeps compilation shape-stable under image/BEV augmentation, unlike the
reference's boolean-mask compaction (view_transformer.py:238-244).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bev_pool_ranks(coor, grid_lower_bound, grid_interval, grid_size):
    """Compute BEV voxel ranks for frustum points of ONE sample.

    Mirrors ``LSSViewTransformer.voxel_pooling_prepare_v2``
    (reference view_transformer.py:207-265) with a fixed-capacity formulation:
    instead of compacting valid points, invalid points get rank ``num_cells``
    (a trash cell) and the caller's segment-sum ignores them.

    Args:
      coor: [..., 3] continuous ego-frame coordinates of frustum points.
      grid_lower_bound: [3] lower bound of the BEV grid (x, y, z).
      grid_interval: [3] voxel size (x, y, z).
      grid_size: (nx, ny, nz) static ints.

    Returns:
      ranks_bev: [...] int32 flat voxel rank in ``z*ny*nx + y*nx + x`` order
        (matching the (B, Z, Y, X, C) output layout of the reference), or
        ``nx*ny*nz`` for out-of-range points.
    """
    nx, ny, nz = grid_size
    # int cast truncates toward zero, NOT floor — deliberately so: the
    # reference bins via ``coor.long()`` (view_transformer.py:230-232),
    # which sends fractional-cell coordinates in (-1, 0) to bin 0, so
    # points up to one voxel BELOW the grid lower bound contribute to the
    # first row/column of the BEV.  Floor semantics drop them; assembled
    # full-detector parity (tests/test_full_detector_parity.py) catches
    # the difference on edge cells.
    idx = (
        (coor - jnp.asarray(grid_lower_bound)) / jnp.asarray(grid_interval)
    ).astype(jnp.int32)
    ix, iy, iz = idx[..., 0], idx[..., 1], idx[..., 2]
    valid = (
        (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny) & (iz >= 0) & (iz < nz)
    )
    ranks = iz * (ny * nx) + iy * nx + ix
    return jnp.where(valid, ranks, nx * ny * nz).astype(jnp.int32)


def bev_pool(depth, feat, ranks_depth, ranks_feat, ranks_bev, num_cells):
    """Splat per-point depth-weighted features into BEV cells (one sample).

    out[v, c] = sum over points p with ranks_bev[p] == v of
                depth_flat[ranks_depth[p]] * feat_flat[ranks_feat[p], c]

    Args:
      depth: [..., any] depth weights; flattened internally. In LSS this is
        the softmaxed depth distribution of shape (N, D, Hf, Wf).
      feat: [..., C] image features; flattened to (F, C). In LSS (N, Hf, Wf, C).
      ranks_depth: [P] int32 indices into flattened depth.
      ranks_feat: [P] int32 indices into flattened feat.
      ranks_bev: [P] int32 BEV cell rank per point; ``num_cells`` = trash.
      num_cells: static int, number of real BEV cells (nx*ny*nz).

    Returns:
      [num_cells, C] pooled BEV features.
    """
    c = feat.shape[-1]
    depth_flat = depth.reshape(-1)
    feat_flat = feat.reshape(-1, c)
    vals = depth_flat[ranks_depth][:, None] * feat_flat[ranks_feat]
    out = jax.ops.segment_sum(vals, ranks_bev, num_segments=num_cells + 1)
    return out[:num_cells]


def bev_pool_batch(depth, feat, ranks_depth, ranks_feat, ranks_bev, num_cells):
    """vmapped ``bev_pool`` over a leading batch dimension.

    Args:
      depth: [B, N, D, Hf, Wf] softmax depth.
      feat: [B, N, Hf, Wf, C] image features.
      ranks_*: [B, P] per-sample int32 ranks.
      num_cells: static int.

    Returns:
      [B, num_cells, C]
    """
    return jax.vmap(bev_pool, in_axes=(0, 0, 0, 0, 0, None))(
        depth, feat, ranks_depth, ranks_feat, ranks_bev, num_cells
    )


def bev_pool_dense(depth_ndhw, feat, ranks_bev, num_cells):
    """Gather-free LSS splat for the natural frustum ordering (one sample).

    In frustum order (N, D, Hf, Wf), ``ranks_depth`` is the identity and
    ``ranks_feat`` a pure broadcast over D (view_transformer.view_transform
    builds exactly those), so the reference's indexed formulation
    (bev_pool_cuda.cu:21-48) reduces to a broadcast-multiply feeding one
    segment-sum — the per-point depth/feat gathers (~3.3 ms/step on v5e)
    vanish entirely.

    Args:
      depth_ndhw: [N, D, Hf, Wf] softmax depth.
      feat: [N, Hf, Wf, C] image features.
      ranks_bev: [N, D, Hf, Wf] int32 cell ranks (num_cells = trash).
      num_cells: static int.

    Returns:
      [num_cells, C]
    """
    c = feat.shape[-1]
    vals = depth_ndhw[..., None] * feat[:, None]  # [N, D, Hf, Wf, C]
    out = jax.ops.segment_sum(
        vals.reshape(-1, c), ranks_bev.reshape(-1),
        num_segments=num_cells + 1,
    )
    return out[:num_cells]


def bev_pool_dense_batch(depth, feat, ranks_bev, num_cells):
    """vmapped :func:`bev_pool_dense` over the batch dimension."""
    return jax.vmap(bev_pool_dense, in_axes=(0, 0, 0, None))(
        depth, feat, ranks_bev, num_cells
    )
