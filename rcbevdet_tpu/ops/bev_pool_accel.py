"""Accelerate-mode LSS pooling: static-geometry metadata + Pallas splat.

The reference's deployment benchmark precomputes the LSS rank tables once
for fixed camera geometry and reuses them every frame
(``accelerate`` mode, reference view_transformer.py:159-178,267-271;
benchmark_sequential.py:57-59).  This module is the TPU analog — and it
removes the per-frame scatter entirely:

- :func:`precompute_pool_meta` (host, numpy) sorts the frustum points by
  BEV rank, drops out-of-range points, groups the survivors by BEV *tile*
  (``cells_per_tile`` consecutive cells), and pads each tile's point list
  to ``chunk``-sized chunks.
- :func:`bev_pool_accel` (device) gathers the per-point depth x feature
  products in sorted order, then a Pallas kernel accumulates each chunk
  into its tile with ONE MXU matmul: ``out_tile += onehot(local_cell)^T @
  vals`` — the XLA scatter-add (~9 ns/row serialization, 4.7 ms/frame at
  RCBEVDet shapes on v5e) becomes ~10 GFLOP of dense matmul.

The kernel relies on chunks being ordered by tile (guaranteed by the
host precompute): Pallas keeps the output tile resident in VMEM across
consecutive chunks of the same tile and writes it back once.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PoolMeta:
    """Precomputed pooling layout (one sample, fixed geometry).

    perm:       [P'] int32 — flat frustum-point index per slot, sorted by
                BEV rank and tile-padded; padding slots hold ``p_total``
                (a sentinel row whose depth is zero-padded on device).
    rf_perm:    [P'] int32 — feature row per slot (0 for padding).
    d_perm:     [P'] int32 — depth-bin per slot (``depth_bins``, i.e. the
                zero sentinel column, for padding slots).
    local_cell: [n_chunks, chunk] int32 — cell index within the tile.
    chunk_tile: [n_chunks] int32 — tile id per chunk, nondecreasing.
    """

    perm: Any
    rf_perm: Any
    d_perm: Any
    local_cell: Any
    chunk_tile: Any
    num_cells: int = dataclasses.field(default=0)
    cells_per_tile: int = dataclasses.field(default=128)

    def tree_flatten(self):
        leaves = (self.perm, self.rf_perm, self.d_perm, self.local_cell,
                  self.chunk_tile)
        return leaves, (self.num_cells, self.cells_per_tile)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, num_cells=aux[0], cells_per_tile=aux[1])


def precompute_pool_meta(ranks_bev_flat, ranks_feat_flat, num_cells,
                         depth_bins, hw, cells_per_tile=128, chunk=1024,
                         capacity_chunks=None, on_overflow="error",
                         numpy=False):
    """Build :class:`PoolMeta` from one sample's flat rank tables (host).

    Args:
      ranks_bev_flat: [P] int array, BEV cell per frustum point
        (``num_cells`` marks out-of-range points — they are dropped here,
        mirroring the reference's valid-point compaction,
        view_transformer.py:238-244, which is legal precisely because the
        accelerate path fixes the geometry).
      ranks_feat_flat: [P] int array, feature row per frustum point.
      num_cells: static int, nx*ny*nz; must divide by cells_per_tile.
      depth_bins, hw: static frustum shape (P = N * depth_bins * hw, flat
        index order (n, d, hw)) — used to derive the per-slot depth bin.
      capacity_chunks: pad the chunk table to this STATIC size (for jit
        shape stability across samples on the train path — every batch
        element must share one chunk-table shape).  Padding chunks carry
        the last tile id (nondecreasing, so the splat kernel keeps
        accumulating zeros without re-initializing).  ``None`` keeps the
        sample-dependent size (serving: one fixed rig, one compile).
      on_overflow: when a sample needs more than ``capacity_chunks``:
        'error' raises; 'drop' trims the fullest tiles' trailing points
        (bounded accuracy loss comparable to augmentation noise) until the
        table fits.
    """
    assert num_cells % cells_per_tile == 0
    assert chunk % 8 == 0, "chunk must be sublane-aligned"
    ranks = np.asarray(ranks_bev_flat).reshape(-1)
    rf = np.asarray(ranks_feat_flat).reshape(-1)
    p_total = ranks.shape[0]
    valid = ranks < num_cells
    order = np.argsort(ranks[valid], kind="stable")
    perm_v = np.nonzero(valid)[0][order].astype(np.int64)
    ranks_v = ranks[perm_v]
    tiles_v = ranks_v // cells_per_tile
    n_tiles = num_cells // cells_per_tile

    bounds = np.searchsorted(tiles_v, np.arange(n_tiles + 1))
    cnts = (bounds[1:] - bounds[:-1]).astype(np.int64)
    n_chs = np.maximum(1, -(-cnts // chunk))  # empty tiles still get 1 chunk
    if capacity_chunks is not None and int(n_chs.sum()) > capacity_chunks:
        if on_overflow == "error":
            raise ValueError(
                f"pool meta needs {int(n_chs.sum())} chunks > capacity "
                f"{capacity_chunks}; raise capacity_chunks or use "
                "on_overflow='drop'"
            )
        while int(n_chs.sum()) > capacity_chunks:
            t = int(np.argmax(n_chs))
            if n_chs[t] <= 1:
                raise ValueError("capacity_chunks < n_tiles")
            n_chs[t] -= 1
            cnts[t] = min(cnts[t], n_chs[t] * chunk)

    perm_chunks, rf_chunks, cell_chunks, chunk_tiles = [], [], [], []
    for t in range(n_tiles):
        s = int(bounds[t])
        cnt = int(cnts[t])
        e = s + cnt
        n_ch = int(n_chs[t])
        padded = n_ch * chunk
        perm_t = np.full(padded, p_total, np.int64)
        rf_t = np.zeros(padded, np.int64)
        cell_t = np.zeros(padded, np.int64)
        perm_t[:cnt] = perm_v[s:e]
        rf_t[:cnt] = rf[perm_v[s:e]]
        cell_t[:cnt] = ranks_v[s:e] - t * cells_per_tile
        perm_chunks.append(perm_t)
        rf_chunks.append(rf_t)
        cell_chunks.append(cell_t)
        chunk_tiles.extend([t] * n_ch)
    if capacity_chunks is not None and len(chunk_tiles) < capacity_chunks:
        n_pad = capacity_chunks - len(chunk_tiles)
        perm_chunks.append(np.full(n_pad * chunk, p_total, np.int64))
        rf_chunks.append(np.zeros(n_pad * chunk, np.int64))
        cell_chunks.append(np.zeros(n_pad * chunk, np.int64))
        chunk_tiles.extend([n_tiles - 1] * n_pad)

    perm64 = np.concatenate(perm_chunks)
    perm = perm64.astype(np.int32)
    d_perm = np.where(
        perm64 < p_total, (perm64 // hw) % depth_bins, depth_bins
    ).astype(np.int32)
    # numpy=True keeps leaves on the host — for the train loader's worker
    # threads, where a per-sample device round-trip is unaffordable
    wrap = (lambda x: x) if numpy else jnp.asarray
    return PoolMeta(
        perm=wrap(perm),
        rf_perm=wrap(np.concatenate(rf_chunks).astype(np.int32)),
        d_perm=wrap(d_perm),
        # [n_chunks, 8, chunk//8]: Mosaic requires the last two block dims
        # tileable (8, 128) — a (1, chunk) block is rejected
        local_cell=wrap(
            np.concatenate(cell_chunks).astype(np.int32)
            .reshape(-1, 8, chunk // 8)
        ),
        chunk_tile=wrap(np.asarray(chunk_tiles, np.int32)),
        num_cells=num_cells,
        cells_per_tile=cells_per_tile,
    )


def _bisect_left(a, v):
    """Vectorized unrolled binary search (first i with a[i] >= v).

    ``jnp.searchsorted``'s default method is a SEQUENTIAL scan on TPU
    (measured 7.7 ms over 2.25M keys in the train step); ceil(log2(N))
    unrolled rounds of a tiny gather cost microseconds instead.
    """
    n = a.shape[0]
    lo = jnp.zeros(v.shape, jnp.int32)
    hi = jnp.full(v.shape, n, jnp.int32)
    for _ in range(max(1, int(np.ceil(np.log2(n + 1))))):
        mid = (lo + hi) // 2
        pred = a[jnp.minimum(mid, n - 1)] < v
        lo = jnp.where(pred, mid + 1, lo)
        hi = jnp.where(pred, hi, mid)
    return lo


def _bisect_right(a, v):
    """First i with a[i] > v (vectorized unrolled binary search)."""
    n = a.shape[0]
    lo = jnp.zeros(v.shape, jnp.int32)
    hi = jnp.full(v.shape, n, jnp.int32)
    for _ in range(max(1, int(np.ceil(np.log2(n + 1))))):
        mid = (lo + hi) // 2
        pred = a[jnp.minimum(mid, n - 1)] <= v
        lo = jnp.where(pred, mid + 1, lo)
        hi = jnp.where(pred, hi, mid)
    return lo


def build_pool_meta_device(ranks_bev_flat, num_cells, depth_bins, hw,
                           cells_per_tile=128, chunk=1024):
    """Device-side :class:`PoolMeta` for per-step geometry (training path).

    Same layout contract as :func:`precompute_pool_meta`, built with
    static-shape JAX ops so it can live inside ``jit`` (train-time
    geometry changes per sample under image/BEV augmentation, so the
    host precompute does not apply).  Shape-stability recipe:

    - sort by rank (``lax.sort_key_val``; ~0.35 ms for 250k keys on v5e),
    - tile-bucket boundaries via ``searchsorted`` on the sorted tiles,
    - carve per-tile chunk windows with ONE windowed gather: consecutive
      slots of a chunk read CONSECUTIVE sorted points, so the per-slot
      fetch is ``cap`` dynamic slices of length ``chunk``, not P random
      rows.

    Capacity is the static bound ``n_tiles + ceil(P/chunk)`` — each tile
    wastes less than one chunk of padding — so no sample can overflow.
    Padding chunks carry the last tile id (nondecreasing, and the splat
    kernel just accumulates their zero contributions).
    """
    assert num_cells % cells_per_tile == 0
    assert chunk % 8 == 0, "chunk must be sublane-aligned"
    p = ranks_bev_flat.shape[0]
    n_tiles = num_cells // cells_per_tile
    cap = n_tiles + -(-p // chunk)
    ranks = ranks_bev_flat.reshape(-1).astype(jnp.int32)
    rk_s, perm_s = jax.lax.sort_key_val(
        ranks, jnp.arange(p, dtype=jnp.int32)
    )
    tiles_s = rk_s // cells_per_tile  # trash rank num_cells -> n_tiles
    bounds = _bisect_left(
        tiles_s, jnp.arange(n_tiles + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    cnt = bounds[1:] - bounds[:-1]
    n_ch = jnp.maximum(1, -(-cnt // chunk))  # empty tiles still get 1 chunk
    off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(n_ch).astype(jnp.int32)]
    )
    j = jnp.arange(cap, dtype=jnp.int32)
    ct = jnp.clip(_bisect_right(off, j).astype(jnp.int32) - 1,
                  0, n_tiles - 1)
    real = j < off[-1]
    start = jnp.where(real, bounds[ct] + (j - off[ct]) * chunk, 0)
    limit = jnp.where(real, bounds[ct + 1], 0)
    k = jnp.arange(chunk, dtype=jnp.int32)
    valid = (start[:, None] + k[None, :]) < limit[:, None]
    # windowed fetch: start <= bounds[ct+1] <= p always, so padding the
    # sorted arrays by one chunk keeps every window in bounds
    rk_pad = jnp.concatenate(
        [rk_s, jnp.full((chunk,), num_cells, jnp.int32)]
    )
    perm_pad = jnp.concatenate([perm_s, jnp.full((chunk,), p, jnp.int32)])
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,)
    )
    rk_w = jax.lax.gather(
        rk_pad, start[:, None], dn, slice_sizes=(chunk,),
        mode="promise_in_bounds",
    )
    perm_w = jax.lax.gather(
        perm_pad, start[:, None], dn, slice_sizes=(chunk,),
        mode="promise_in_bounds",
    )
    perm = jnp.where(valid, perm_w, p).reshape(-1)
    local_cell = jnp.where(valid, rk_w - ct[:, None] * cells_per_tile, 0)
    rf_perm = jnp.where(
        perm < p, (perm // (depth_bins * hw)) * hw + perm % hw, 0
    )
    d_perm = jnp.where(perm < p, (perm // hw) % depth_bins, depth_bins)
    return PoolMeta(
        perm=perm,
        rf_perm=rf_perm.astype(jnp.int32),
        d_perm=d_perm.astype(jnp.int32),
        local_cell=local_cell.astype(jnp.int32).reshape(cap, 8, chunk // 8),
        chunk_tile=ct,
        num_cells=num_cells,
        cells_per_tile=cells_per_tile,
    )


def _splat_kernel(ct_ref, cell_ref, vals_ref, out_ref):
    i = pl.program_id(0)
    prev = ct_ref[jnp.maximum(i - 1, 0)]

    @pl.when(jnp.logical_or(i == 0, ct_ref[i] != prev))
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    sub, lanes = cell_ref.shape[1], cell_ref.shape[2]
    cpt = out_ref.shape[0]
    # build the one-hot in the cells' native (sub, lanes) tiling, then
    # merge the major dims into sublanes — a lane-preserving reshape
    # Mosaic supports (a (1,8,128)->(1024,1) lane->sublane cast is not)
    onehot = (
        cell_ref[0][:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (sub, lanes, cpt), 2)
    ).astype(vals_ref.dtype)
    # f32 inputs: HIGHEST, else the default single-pass bf16 MXU matmul
    # rounds vals to bf16 (~1e-3 error vs the scatter oracle).  bf16
    # inputs: leave default — products are exact and accumulate in f32
    # via preferred_element_type (Mosaic rejects HIGHEST for bf16 lhs).
    prec = (
        jax.lax.Precision.HIGHEST
        if vals_ref.dtype == jnp.float32 else None
    )
    out_ref[:] += jax.lax.dot_general(
        onehot.reshape(sub * lanes, cpt), vals_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )


@functools.partial(
    jax.jit, static_argnames=("num_cells", "cells_per_tile", "interpret")
)
def _splat(vals, local_cell, chunk_tile, num_cells, cells_per_tile,
           interpret=False):
    n_chunks, sub, lanes = local_cell.shape
    chunk = sub * lanes
    c = vals.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, sub, lanes), lambda i, ct: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, c), lambda i, ct: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (cells_per_tile, c), lambda i, ct: (ct[i], 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        _splat_kernel,
        out_shape=jax.ShapeDtypeStruct((num_cells, c), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(chunk_tile, local_cell, vals)


def bev_pool_accel(depth_ndhw, feat, meta: PoolMeta, interpret=None):
    """Pooled BEV features for ONE sample under precomputed geometry.

    Args:
      depth_ndhw: [N, D, Hf, Wf] softmax depth (frustum order — the flat
        index IS ``ranks_depth``, like ops/bev_pool.bev_pool_dense).
      feat: [N, Hf, Wf, C] image features.
      meta: :class:`PoolMeta` for this sample's geometry.

    Returns:
      [num_cells, C] pooled features (feat dtype).

    NOTE: a replicated (rf, dbin) pair-row table (C+1-lane gather, no
    depth select) was tried and REJECTED: at batched train shapes the
    table is ~740 MB and the gather loses all locality — 425 vs 232
    ms/step.  The narrow [n*hw, C+D+1] table stays VMEM-resident.
    """
    if interpret is None:  # run interpreted off-TPU (CPU tests / CLI)
        interpret = jax.default_backend() != "tpu"
    n, d, hf, wf = depth_ndhw.shape
    hw = hf * wf
    c = feat.shape[-1]
    # A flat depth gather is a single-lane gather: serialization-bound at
    # ~8 ns/index on v5e (1.2 ms for 147k slots).  Instead append each
    # pixel's D depth bins (plus one zero sentinel column) to its feature
    # row and fetch everything with ONE wide row-gather indexed by
    # rf_perm; the per-slot bin is then picked with an iota-compare
    # reduction (pure VPU, fuses with the multiply).
    depth_byrow = jnp.moveaxis(
        depth_ndhw.reshape(n, d, hw), 1, 2
    ).reshape(n * hw, d).astype(feat.dtype)
    table = jnp.concatenate(
        [
            feat.reshape(n * hw, c),
            depth_byrow,
            jnp.zeros((n * hw, 1), feat.dtype),  # sentinel bin (padding)
        ],
        axis=-1,
    )
    rows = table[meta.rf_perm]  # [S, C + D + 1]
    dsel = jnp.sum(
        rows[:, c:]
        * (
            jax.lax.broadcasted_iota(jnp.int32, (1, d + 1), 1)
            == meta.d_perm[:, None]
        ).astype(feat.dtype),
        axis=-1,
        keepdims=True,
    )
    vals = rows[:, :c] * dsel
    out = _splat(
        vals, meta.local_cell, meta.chunk_tile,
        meta.num_cells, meta.cells_per_tile, interpret=interpret,
    )
    return out.astype(feat.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def bev_pool_train(depth_ndhw, feat, ranks_bev_flat, num_cells,
                   cells_per_tile=128, chunk=1024):
    """LSS splat for the TRAINING path: sorted MXU splat fwd, dense bwd.

    The dense segment-sum forward costs ~19 ns/scatter-row on v5e
    (4.7 ms/frame at RCBEVDet shapes, 42 ms/step over 9 frames); this
    replaces it with :func:`build_pool_meta_device` (device sort +
    windowed bucketing) feeding the accelerate-mode tile-matmul splat.
    The backward keeps the dense formulation's gather + plain reductions
    (d_depth = <g[cell], feat>, d_feat = sum_D depth * g[cell] — no
    scatter anywhere, mirroring bev_pool_cuda.cu:67-121 semantics).

    Args:
      depth_ndhw: [N, D, Hf, Wf] softmax depth (frustum order).
      feat: [N, Hf, Wf, C] image features.
      ranks_bev_flat: [N*D*Hf*Wf] int32 cell ranks (num_cells = trash).

    Returns:
      [num_cells, C] pooled features (feat dtype).
    """
    n, d, hf, wf = depth_ndhw.shape
    meta = build_pool_meta_device(
        ranks_bev_flat, num_cells, d, hf * wf, cells_per_tile, chunk
    )
    return bev_pool_accel(depth_ndhw, feat, meta)


def _train_fwd(depth_ndhw, feat, ranks_bev_flat, num_cells, cells_per_tile,
               chunk):
    out = bev_pool_train(
        depth_ndhw, feat, ranks_bev_flat, num_cells, cells_per_tile, chunk
    )
    return out, (depth_ndhw, feat, ranks_bev_flat)


def _train_bwd(num_cells, cells_per_tile, chunk, res, g):
    depth_ndhw, feat, ranks_bev_flat = res
    n, d, hf, wf = depth_ndhw.shape
    hw = hf * wf
    c = feat.shape[-1]
    g = g.astype(jnp.float32)
    g_pad = jnp.concatenate([g, jnp.zeros((1, c), g.dtype)], 0)
    g_rows = g_pad[ranks_bev_flat].reshape(n, d, hw, c)
    d_depth = jnp.sum(
        g_rows * feat.astype(g.dtype).reshape(n, 1, hw, c), -1
    ).reshape(depth_ndhw.shape).astype(depth_ndhw.dtype)
    d_feat = jnp.sum(
        g_rows * depth_ndhw.astype(g.dtype).reshape(n, d, hw, 1), 1
    ).reshape(feat.shape).astype(feat.dtype)
    return d_depth, d_feat, None


bev_pool_train.defvjp(_train_fwd, _train_bwd)


def auto_cells_per_tile(num_cells, cap=128):
    """Deterministic tile size both the loader (table builder) and the
    model (splat call) derive independently: the largest power-of-two
    divisor of num_cells up to ``cap``."""
    while num_cells % cap:
        cap //= 2
    return cap


def pool_meta_capacity(num_cells, p_total, cells_per_tile=128, chunk=1024,
                       point_fraction=1.0):
    """Static chunk capacity covering ``point_fraction`` of P valid points.

    The hard bound (fraction 1.0) is n_tiles + ceil(P/chunk): each tile
    wastes less than one chunk of padding.  Real rigs land ~30-45% of the
    frustum inside the BEV grid, so the shipped train configs use a
    smaller fraction with on_overflow='drop' (the loader trims the
    pathological tail instead of paying 2-3x gather/splat work per step).
    """
    n_tiles = num_cells // cells_per_tile
    pts = int(np.ceil(p_total * point_fraction))
    return n_tiles + -(-pts // chunk)


def meta_from_packed(perm, local_cell, chunk_tile, num_cells, depth_bins,
                     hw, p_total, cells_per_tile=128):
    """Rebuild :class:`PoolMeta` from the three SHIPPED tables.

    The loader sends only (perm, local_cell, chunk_tile) per frame —
    rf_perm / d_perm are pure elementwise functions of ``perm`` (flat
    frustum index order (n, d, hw)), so recomputing them on device saves
    ~5 MB/frame of host->device transfer.
    """
    perm = perm.astype(jnp.int32)
    is_real = perm < p_total
    rf = jnp.where(
        is_real, (perm // (depth_bins * hw)) * hw + perm % hw, 0
    )
    d = jnp.where(is_real, (perm // hw) % depth_bins, depth_bins)
    return PoolMeta(
        perm=perm,
        rf_perm=rf.astype(jnp.int32),
        d_perm=d.astype(jnp.int32),
        local_cell=local_cell,
        chunk_tile=chunk_tile,
        num_cells=num_cells,
        cells_per_tile=cells_per_tile,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def bev_pool_accel_train(depth_ndhw, feat, perm, local_cell, chunk_tile,
                         ranks_bev_flat, num_cells, cells_per_tile=128):
    """LSS splat with LOADER-precomputed meta: accel fwd, dense bwd.

    The round-5 train-path lever (ROADMAP lever 1): train-time geometry is
    fully known host-side (augmentations are sampled in the data
    pipeline), so the loader emits fixed-capacity chunk tables per frame
    and the device runs only the accelerate-mode gather + MXU tile splat —
    the 4.7 ms/frame XLA scatter (42 ms/step over 9 frames) drops out.
    The backward keeps the dense formulation's exact gradient formulas
    (reference bev_pool_cuda.cu:67-121): d_depth = <g[cell], feat>,
    d_feat = sum_D depth * g[cell] — no scatter anywhere.  The cell
    assignment used by forward AND backward is the host table, so the two
    are consistent by construction.

    Args:
      depth_ndhw: [N, D, Hf, Wf] softmax depth (frustum order).
      feat: [N, Hf, Wf, C] image features.
      perm/local_cell/chunk_tile: static-capacity tables
        (:func:`precompute_pool_meta` with ``capacity_chunks``).
      ranks_bev_flat: [N*D*Hf*Wf] int32 host cell ranks (num_cells =
        trash) — backward only; pass zeros when no gradients are needed.

    Returns [num_cells, C] pooled features (feat dtype).
    """
    n, d, hf, wf = depth_ndhw.shape
    meta = meta_from_packed(
        perm, local_cell, chunk_tile, num_cells, d, hf * wf,
        n * d * hf * wf, cells_per_tile,
    )
    return bev_pool_accel(depth_ndhw, feat, meta)


def _accel_train_fwd(depth_ndhw, feat, perm, local_cell, chunk_tile,
                     ranks_bev_flat, num_cells, cells_per_tile):
    out = bev_pool_accel_train(
        depth_ndhw, feat, perm, local_cell, chunk_tile, ranks_bev_flat,
        num_cells, cells_per_tile,
    )
    return out, (depth_ndhw, feat, ranks_bev_flat)


def _accel_train_bwd(num_cells, cells_per_tile, res, g):
    d_depth, d_feat, _ = _train_bwd(num_cells, cells_per_tile, None, res, g)
    return d_depth, d_feat, None, None, None, None


bev_pool_accel_train.defvjp(_accel_train_fwd, _accel_train_bwd)
