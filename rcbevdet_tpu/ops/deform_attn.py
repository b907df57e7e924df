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

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .warp import grid_sample_2d


def _sample_one_head(value_hw, locs, weights):
    """value_hw: [H, W, hd]; locs: [Lq, P, 2] in [0,1]; weights: [Lq, P]."""
    grid = locs * 2.0 - 1.0
    sampled = grid_sample_2d(value_hw, grid, align_corners=False)  # [Lq,P,hd]
    return jnp.einsum("qpd,qp->qd", sampled, weights)


def _pack_corners(value_bhwc):
    """[N, H, W, hd] -> [N, H, W, 4*hd]: channel-pack each pixel with its
    (y,x), (y,x+1), (y+1,x), (y+1,x+1) neighbors (edge-clamped).

    TPU gather cost is dominated by the index count, not the row width (a
    [1M]->[1M,128]-lane gather is *cheaper* than [1M]->[1M,32] on v5e), so
    packing the 4 bilinear corners into one 128-lane row turns the 4
    corner-gathers of the CUDA formulation
    (ms_deform_im2col_cuda.cuh:238) into ONE row gather."""
    v = value_bhwc
    xp1 = jnp.concatenate([v[:, :, 1:], v[:, :, -1:]], 2)
    yp1 = jnp.concatenate([v[:, 1:], v[:, -1:]], 1)
    xyp1 = jnp.concatenate([xp1[:, 1:], xp1[:, -1:]], 1)
    # ONE flat 4-operand concat (not nested pair concats): every operand is
    # a shift-slice view of the input, so XLA emits a single [N,H,W,4hd]
    # buffer write instead of materializing a [N,H,W,2hd] intermediate
    # (r4 profile: the nested form cost ~0.15 ms/layer at CAMF shapes and
    # ~0.5 ms on the 8-frame temporal-warp table)
    return jnp.concatenate([v, xp1, yp1, xyp1], axis=-1)  # [N,H,W,4hd]


def packed_bilinear_parts(value_bhwc, fx, fy, h, w,
                          split_batch_gather=False):
    """Shared core of the packed-corner bilinear sample.

    value_bhwc: [N, H, W, hd]; fx/fy: [N, S] continuous pixel coords.
    Returns (patch [N, S, 4*hd], slot_w list of 4 [N, S, 1]) such that
    bilinear(value, fx, fy) = sum_s patch[..., s*hd:(s+1)*hd] * slot_w[s]
    with zero-padding semantics outside the image.

    ``split_batch_gather`` issues one gather per batch row instead of one
    flat gather over the [N*H*W] table: when the per-row table fits the
    scoped-VMEM budget but the full table does not (the temporal warp's
    8-frame 84 MB packed table), per-row gathers keep each table on the
    fast VMEM-resident path — measured 2x on the warp.
    """
    n, s = fx.shape
    hd = value_bhwc.shape[-1]
    packed = _pack_corners(value_bhwc)  # [N, H, W, 4hd]
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = (fx - x0)[..., None]
    wy = (fy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    xc = jnp.clip(x0i, 0, w - 1)
    yc = jnp.clip(y0i, 0, h - 1)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,),
        collapsed_slice_dims=(0,),
        start_index_map=(0,),
    )
    if split_batch_gather:
        flat_n = yc * w + xc  # [N, S] row within each batch entry's table
        packed_flat = packed.reshape(n, h * w, 4 * hd)
        patch = jnp.stack(
            [
                jax.lax.gather(
                    packed_flat[i], flat_n[i][:, None], dnums,
                    slice_sizes=(1, 4 * hd), mode="promise_in_bounds",
                )
                for i in range(n)
            ]
        )  # [N, S, 4hd]
    else:
        # single flattened row index: a 1-component gather from a 2-D
        # table is ~2x faster than the 3-component rank-4 form on v5e
        nidx = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[:, None], (n, s)
        )
        flat = ((nidx * h + yc) * w + xc).reshape(n * s, 1)
        patch = jax.lax.gather(
            packed.reshape(n * h * w, 4 * hd), flat, dnums,
            slice_sizes=(1, 4 * hd),
            mode="promise_in_bounds",
        ).reshape(n, s, 4 * hd)

    # Fold the corner->packed-slot remap into the (scalar) weights instead
    # of selecting on [N, S, hd] tensors: a [N,S,4,hd] reshape + per-corner
    # selects makes XLA materialize ~0.5 GB transposed copies of the patch
    # (measured ~10 ms/step); per-slot scalar weights cost [N, S] only.
    dt = value_bhwc.dtype
    slot_w = [jnp.zeros(wx.shape, dt) for _ in range(4)]
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        ty = y0i + dy
        tx = x0i + dx
        valid = (ty >= 0) & (ty < h) & (tx >= 0) & (tx < w)
        oy = jnp.clip(ty - yc, 0, 1)  # packed-slot row of the true corner
        ox = jnp.clip(tx - xc, 0, 1)
        wgt = (jnp.where(dx, wx, 1.0 - wx) * jnp.where(dy, wy, 1.0 - wy)
               * valid[..., None].astype(dt)).astype(dt)
        for si, (sy, sx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            hit = ((oy == sy) & (ox == sx))[..., None].astype(dt)
            slot_w[si] = slot_w[si] + wgt * hit
    return patch, slot_w


def packed_corner_parts_nogather(value_bhwc, fx, fy, h, w):
    """Index/weight half of :func:`packed_bilinear_parts` — no gather.

    Returns (packed_flat [N*H*W, 4hd], flat_idx [N, S] int32 global rows,
    slot_w list of 4 [N, S, 1]) so a caller can own the gather (e.g. the
    custom-VJP :func:`packed_combine_p_reduce`, which re-gathers in its
    backward instead of storing the 0.5 GB patch)."""
    n, s = fx.shape
    hd = value_bhwc.shape[-1]
    packed = _pack_corners(value_bhwc)  # [N, H, W, 4hd]
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = (fx - x0)[..., None]
    wy = (fy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    xc = jnp.clip(x0i, 0, w - 1)
    yc = jnp.clip(y0i, 0, h - 1)
    nidx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, s))
    flat_idx = (nidx * h + yc) * w + xc  # [N, S]

    dt = value_bhwc.dtype
    slot_w = [jnp.zeros(wx.shape, dt) for _ in range(4)]
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        ty = y0i + dy
        tx = x0i + dx
        valid = (ty >= 0) & (ty < h) & (tx >= 0) & (tx < w)
        oy = jnp.clip(ty - yc, 0, 1)
        ox = jnp.clip(tx - xc, 0, 1)
        wgt = (jnp.where(dx, wx, 1.0 - wx) * jnp.where(dy, wy, 1.0 - wy)
               * valid[..., None].astype(dt)).astype(dt)
        for si, (sy, sx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            hit = ((oy == sy) & (ox == sx))[..., None].astype(dt)
            slot_w[si] = slot_w[si] + wgt * hit
    return packed.reshape(n * h * w, 4 * hd), flat_idx, slot_w


def packed_gather_rows(value_bhwc, fx, fy, h, w, split_batch_gather=False,
                       prepacked=False, frame_order=None):
    """Pack corners + row-gather ONLY (no slot-weight computation).

    Feeds :func:`deform_attn_pallas.combine4_p_reduce_fused`, which derives
    the slot weights in-kernel from (fx, fy) — the XLA-side slot fusion and
    the [N, 4, S] weight stack never exist.  Returns [N, S, 4*hd].

    ``split_batch_gather``: one gather per batch row (VMEM-resident-table
    fast path for wide tables, see :func:`packed_bilinear_parts`).
    ``prepacked``: value_bhwc is ALREADY the [N, H, W, 4*hd] corner table
    (the cached-BEV serving path packs each frame ONCE when it enters the
    cache instead of re-packing all F-1 frames every step — ~0.4 ms/step
    at RCBEVDet shapes).
    ``frame_order``: optional [N] int32 (traced) — row i of the OUTPUT
    samples from table row ``frame_order[i]`` (the circular serving
    cache's age->slot mapping; fx/fy stay in output order)."""
    n, s = fx.shape
    if prepacked:
        hd = value_bhwc.shape[-1] // 4
        packed = value_bhwc
    else:
        hd = value_bhwc.shape[-1]
        packed = _pack_corners(value_bhwc)
    xc = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, w - 1)
    yc = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, h - 1)
    if split_batch_gather:
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
        )
        flat_n = yc * w + xc
        packed_flat = packed.reshape(n, h * w, 4 * hd)

        def table(i):
            if frame_order is None:
                return packed_flat[i]
            # circular cache: traced slot index — the dynamic slice is the
            # same staging copy the static slice already paid
            return jax.lax.dynamic_index_in_dim(
                packed_flat, frame_order[i], axis=0, keepdims=False
            )

        return jnp.stack(
            [
                jax.lax.gather(
                    table(i), flat_n[i][:, None], dnums,
                    slice_sizes=(1, 4 * hd), mode="promise_in_bounds",
                )
                for i in range(n)
            ]
        )
    nidx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, s))
    if frame_order is not None:
        nidx = jnp.broadcast_to(frame_order[:, None], (n, s))
    flat_idx = (nidx * h + yc) * w + xc
    return _gather_packed_rows(packed.reshape(n * h * w, 4 * hd), flat_idx)


# None = auto (Pallas combine kernels on a TPU backend only); True/False
# force the routing — True lets CPU tests exercise the Pallas-routed
# custom-VJP forward+backward end to end in interpret mode (the kernels
# self-select interpret off-TPU)
FORCE_PALLAS_COMBINE = None


def _use_pallas_combine(lq):
    use = FORCE_PALLAS_COMBINE
    if use is None:
        use = jax.default_backend() == "tpu"
    return use and lq % 128 == 0


def _gather_packed_rows(packed_flat, flat_idx):
    """[R, 4hd], [N, S] -> [N, S, 4hd] via the fast 1-component gather."""
    n, s = flat_idx.shape
    c4 = packed_flat.shape[-1]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )
    return jax.lax.gather(
        packed_flat, flat_idx.reshape(n * s, 1), dnums,
        slice_sizes=(1, c4), mode="promise_in_bounds",
    ).reshape(n, s, c4)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def packed_combine_p_reduce(packed_flat, flat_idx, w4t, p, hd):
    """Gather + slot-combine + point-reduce with a hand-written VJP.

    out[n, q, :] = sum_pp sum_si
        packed_flat[flat_idx[n, pp*Lq+q], si*hd:(si+1)*hd]
        * w4t[n, si, pp*Lq+q]

    This is the TRAIN path of the deformable-attention core.  XLA's
    autodiff of the einsum formulation materializes ~0.5 GB transposed
    copies of the patch around its backward scatter (measured ~9.5
    ms/layer of pure `copy` ops at CAMF train shapes on v5e); writing the
    VJP explicitly keeps every backward tensor in the layout its consumer
    wants: d_patch is built by an elementwise broadcast fusion feeding the
    scatter directly, and d_w4t by an elementwise multiply-reduce.
    Residuals are (packed_flat, flat_idx, w4t) — the patch is re-gathered
    in the backward (the reference CUDA backward also re-derives the
    corner values, ms_deform_attn_cuda.cu / ms_deform_im2col_cuda.cuh:238).

    Args:
      packed_flat: [N*H*W, 4*hd] packed corner table.
      flat_idx: [N, S] int32 global rows, S = P*Lq, P-major.
      w4t: [N, 4, S] combined slot*attention weights.
      p, hd: static point count / head dim.

    Returns [N, Lq, hd] in packed_flat's dtype.
    """
    n, s = flat_idx.shape
    lq = s // p
    patch = _gather_packed_rows(packed_flat, flat_idx)
    if _use_pallas_combine(lq):
        # the XLA slot combine broadcasts w4t's lane-major S axis against
        # the patch's sublane-major S axis — a relayout fusion measured at
        # 3.8 ms/layer (4.4x its write floor) at CAMF train shapes; the
        # Pallas kernel does the same contraction via its indicator
        # matmul at 0.8 ms (this fwd runs under no autodiff — custom_vjp)
        from .deform_attn_pallas import combine4_p_reduce

        return combine4_p_reduce(patch, w4t, p, hd).astype(patch.dtype)
    val = sum(
        patch[..., si * hd : (si + 1) * hd]
        * w4t[:, si, :, None].astype(patch.dtype)
        for si in range(4)
    )
    return val.reshape(n, p, lq, hd).sum(1)


def _pcpr_fwd(packed_flat, flat_idx, w4t, p, hd):
    out = packed_combine_p_reduce(packed_flat, flat_idx, w4t, p, hd)
    return out, (packed_flat, flat_idx, w4t)


def _pcpr_bwd(p, hd, res, g):
    packed_flat, flat_idx, w4t = res
    n, s = flat_idx.shape
    lq = s // p
    c4 = packed_flat.shape[-1]
    patch = _gather_packed_rows(packed_flat, flat_idx)
    if _use_pallas_combine(lq):
        # ONE fused kernel streams the re-gathered patch once and emits
        # both cotangents: d_patch via the indicator-matmul lane broadcast
        # (as dpatch_broadcast did — the XLA broadcast fusion relayouts at
        # ~6x the write floor, 4.1 ms/layer) AND d_w4t via an MXU
        # E-contraction directly in its [N, 4, S] lane-major layout (the
        # XLA 4-slot multiply-reduce + stack pays an S-sublane -> S-lane
        # relayout per slot on the VPU)
        from .deform_attn_pallas import dpatch_dw4t

        d_patch, d_w4t = dpatch_dw4t(
            w4t, g.astype(patch.dtype), patch, p, hd
        )
        d_w4t = d_w4t.astype(w4t.dtype)
    else:
        g_b = jnp.broadcast_to(
            g[:, None].astype(patch.dtype), (n, p, lq, hd)
        ).reshape(n, s, hd)
        d_w4t = jnp.stack(
            [
                jnp.sum(patch[..., si * hd : (si + 1) * hd] * g_b, -1)
                for si in range(4)
            ],
            axis=1,
        ).astype(w4t.dtype)
        d_patch = jnp.concatenate(
            [w4t[:, si, :, None].astype(patch.dtype) * g_b
             for si in range(4)],
            axis=-1,
        )  # [N, S, 4hd] — already in the scatter operand's layout
    # The scatter-add IS the right formulation here (r4 A/B): it costs
    # ~7.3 ms/layer at CAMF train shapes (1M rows x 128 lanes, ~9 ns/row
    # serialization), but replacing it with a device-sorted MXU tile splat
    # (sort_key_val + windowed tile bucketing + one-hot matmul, the
    # bev_pool_accel machinery) measured 19.5 ms/layer — the 1M-key sort
    # plus the window gathers' while-loop lowering dwarf the scatter; the
    # same pattern lost for the train-time LSS pool (232 vs 205 ms/step).
    d_packed = jnp.zeros_like(packed_flat).at[flat_idx.reshape(-1)].add(
        d_patch.reshape(-1, c4)
    )
    d_idx = np.zeros(flat_idx.shape, jax.dtypes.float0)
    return d_packed, d_idx, d_w4t


packed_combine_p_reduce.defvjp(_pcpr_fwd, _pcpr_bwd)


def _sample_packed(value_bhwc, locs, h, w):
    """Bilinear-sample via one packed-corner gather.

    value_bhwc: [N, H, W, hd]; locs: [N, S, 2] normalized (x, y) in [0,1]
    (align_corners=False, zero padding).  Returns [N, S, hd].
    """
    hd = value_bhwc.shape[-1]
    fx = locs[..., 0] * w - 0.5
    fy = locs[..., 1] * h - 0.5
    patch, slot_w = packed_bilinear_parts(value_bhwc, fx, fy, h, w)
    return (
        patch[..., 0 * hd : 1 * hd] * slot_w[0]
        + patch[..., 1 * hd : 2 * hd] * slot_w[1]
        + patch[..., 2 * hd : 3 * hd] * slot_w[2]
        + patch[..., 3 * hd : 4 * hd] * slot_w[3]
    )


def ms_deform_attn_core_packed(value, spatial_shapes, sampling_locations,
                               attention_weights, reduce="einsum"):
    """Packed-corner-gather deformable attention (TPU fast path).

    Same contract as :func:`ms_deform_attn_core`; one row-gather per level
    instead of four corner-gathers — ~8x faster on v5e at CAMF shapes
    (16384 queries x 8 heads x 8 points over a 128x128 single level).

    reduce: how the 4 packed slots x attention weights are contracted.
      'einsum'  — one k-contraction dot_general.  Under jax.checkpoint this
        keeps a single fused reduce in the remat backward (the 4 slot
        products would otherwise live as ~2 GB residuals at train shapes),
        so it is the TRAIN path — but on the forward-only path the MXU dot
        forces XLA to lay the [N, S, 4hd] patch out twice in transposed
        form (~2 ms/layer of pure copies at CAMF inference shapes).
      'slices'  — elementwise slot-slice multiply-add that fuses straight
        into the gather output with no layout copies.
      'pallas'  — the slot combine + point reduce runs as a Pallas MXU
        kernel (ops/deform_attn_pallas.py), streaming the gathered patch
        once: ~2.6x faster than the XLA loop fusion at CAMF shapes — the
        INFERENCE path (forward-only; falls back to 'slices' when Lq is
        not lane-aligned).
    """
    b, len_in, n_heads, hd = value.shape
    if b > 1:
        # one stream at a time: the flat packed-corner gather runs at the
        # gather-engine floor (~2 ns/row) only while its table stays
        # VMEM-resident (32 MB at CAMF B=1); batching the table 4x pushes
        # it to HBM random access (measured 10.8 ns/row — fusion.38 = 45
        # ms/step at 4-stream serving).  Per-stream unrolling keeps every
        # gather on the fast path for batched serving AND B>1 training.
        return jnp.concatenate(
            [
                ms_deform_attn_core_packed(
                    value[i : i + 1],
                    spatial_shapes,
                    sampling_locations[i : i + 1],
                    attention_weights[i : i + 1],
                    reduce=reduce,
                )
                for i in range(b)
            ],
            axis=0,
        )
    outputs = []
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        value_l = value[:, start : start + h * w]
        start += h * w
        value_l = value_l.reshape(b, h, w, n_heads, hd)
        value_l = jnp.moveaxis(value_l, 3, 1).reshape(b * n_heads, h, w, hd)
        locs_l = sampling_locations[:, :, :, lvl]  # [B, Lq, heads, P, 2]
        lq, p = locs_l.shape[1], locs_l.shape[3]
        if reduce == "pallas" and lq % 128:
            reduce = "slices"
        if reduce in ("slices", "pallas", "custom"):
            # P-MAJOR row order: row index = point * Lq + query, so the
            # final P-reduction is a sum of 8 contiguous [Lq, C] planes
            # (sequential reads) instead of a stride-8 sublane reduction,
            # which XLA executes ~2.5x slower at these shapes
            locs_l = jnp.transpose(locs_l, (0, 2, 3, 1, 4)).reshape(
                b * n_heads, p * lq, 2
            )
        else:
            locs_l = jnp.moveaxis(locs_l, 2, 1).reshape(
                b * n_heads, lq * p, 2
            )
        fx = locs_l[..., 0] * w - 0.5
        fy = locs_l[..., 1] * h - 0.5
        if reduce == "custom":
            # hand-written VJP (train path): the gather lives inside the
            # op and is re-issued in the backward, so neither the patch
            # nor any transposed copy of it is ever materialized
            packed_flat, flat_idx, slot_w = packed_corner_parts_nogather(
                value_l, fx, fy, h, w
            )
            aw = jnp.moveaxis(attention_weights[:, :, :, lvl], 2, 1)
            aw = jnp.moveaxis(aw, 3, 2).reshape(
                b * n_heads, p * lq, 1
            ).astype(packed_flat.dtype)
            w4t = jnp.stack(
                [(slot_w[si] * aw)[..., 0] for si in range(4)], axis=1
            )
            out_l = packed_combine_p_reduce(
                packed_flat, flat_idx, w4t, p, hd
            )
            outputs.append(out_l.reshape(b, n_heads, lq, hd))
            continue
        if reduce == "pallas":
            from .deform_attn_pallas import combine4_p_reduce_fused

            # fused path: the kernel derives the slot weights from (fx, fy)
            # on the VPU, so the XLA graph only gathers the packed rows —
            # the per-slot select fusion and the [N, 4, S] weight stack
            # (+ their HBM round-trip) are gone
            patch = packed_gather_rows(value_l, fx, fy, h, w)
            aw = jnp.moveaxis(attention_weights[:, :, :, lvl], 2, 1)
            aw = jnp.moveaxis(aw, 3, 2).reshape(b * n_heads, p * lq)
            out_l = combine4_p_reduce_fused(
                patch, fx, fy, aw.astype(jnp.float32), p=p, hd=hd, h=h, w=w
            )
            outputs.append(
                out_l.reshape(b, n_heads, lq, hd).astype(patch.dtype)
            )
            continue
        patch, slot_w = packed_bilinear_parts(value_l, fx, fy, h, w)
        # fold the attention weight into the slot weights so the per-point
        # sampled tensor is never materialized: the point reduction happens
        # in the same pass over the patch (saves a [B*heads, Lq, P, hd]
        # round-trip + a bf16 dot_general, ~3 ms/layer on v5e)
        aw = jnp.moveaxis(attention_weights[:, :, :, lvl], 2, 1)  # [B,h,Lq,P]
        if reduce == "slices":
            aw = jnp.moveaxis(aw, 3, 2)  # [B, h, P, Lq] to match P-major rows
            aw = aw.reshape(b * n_heads, p * lq, 1).astype(patch.dtype)
        else:
            aw = aw.reshape(b * n_heads, lq * p, 1).astype(patch.dtype)
        if reduce == "einsum":
            # single fused multiply-reduce over the 4 packed slots: summing
            # 4 separate slot products keeps 4 [N, S, hd] intermediates
            # live in the remat backward (4 x 2 GB at train shapes); the
            # k-contraction form reduces in one pass (the
            # [N,S,4hd]->[N,S,4,hd] reshape is a free minor-dim split)
            w4 = jnp.concatenate(
                [slot_w[si] * aw for si in range(4)], axis=-1
            )  # [N, S, 4]
            val = jnp.einsum(
                "nskh,nsk->nsh", patch.reshape(b * n_heads, lq * p, 4, hd),
                w4,
            )
        else:  # 'slices': elementwise, fuses with the gather (no copies)
            # materialize the 4 combined slot weights ([N, S, 1] each, ~8 MB
            # total at CAMF shapes) so the big patch-reduce fusion doesn't
            # recompute the floor/clip/compare slot logic per channel lane
            # (measured: the fused recompute is VPU-bound at ~1.6 ms/layer)
            w4 = jax.lax.optimization_barrier(
                tuple(slot_w[si] * aw for si in range(4))
            )
            val = sum(
                patch[..., si * hd : (si + 1) * hd] * w4[si]
                for si in range(4)
            )
        if reduce == "slices":
            # P-major rows: [p, lq] -> reduce the leading point axis as a
            # sum of contiguous [Lq, hd] planes
            outputs.append(
                jnp.sum(val.reshape(b, n_heads, p, lq, hd), axis=2)
            )
        else:
            outputs.append(
                jnp.sum(val.reshape(b, n_heads, lq, p, hd), axis=3)
            )
    out = sum(outputs)
    return jnp.moveaxis(out, 1, 2).reshape(b, -1, n_heads * hd)


def ms_deform_attn_core_gather4(value, spatial_shapes, sampling_locations,
                                attention_weights):
    """Deformable attention aggregation (4-corner-gather reference form).

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


# The packed-corner gather is numerically identical (same 4 corner terms,
# same weights; only the gather shape differs) and ~8x faster on TPU, so
# it IS the deformable-attention core; the 4-gather form stays as a
# cross-check oracle for tests.
ms_deform_attn_core = ms_deform_attn_core_packed
