"""Pallas slot-combine + point-reduce for packed deformable attention.

The packed-corner deform-attn path (``ops/deform_attn.py``) gathers a
[N, S, 4*hd] corner patch (N = batch*heads, S = points*queries, P-major
rows), then contracts the 4 bilinear corner slots with per-row weights and
reduces the point axis.  As plain XLA that contraction is a VPU-bound
loop fusion (~2.4 ms/layer at CAMF shapes on v5e): every output lane
re-broadcasts the per-row slot weights across the 128-lane vregs.

This kernel streams the patch once and does both weight broadcast and
lane-group reduction on the MXU instead:

    w128 = w4tile^T @ E      E[si] = indicator of the si-th hd-lane group
    out += (patch * w128) @ R,   R = vertically stacked I_hd

so the only VPU work is one elementwise multiply.  Measured 0.80 ms/layer
vs 2.79 ms for the XLA fusion (bf16, N=8, Lq=16384, P=8, hd=32) — the
kernel runs at ~335 GB/s of patch streaming.

Weights are taken pre-transposed as [N, 4, S]: a [N, S, 4] array would be
lane-padded 4->128 in HBM's tiled layout, costing 32x read amplification
(measured: it caps the kernel at ~130 GB/s).

Reference analog: the corner-weighted accumulation loop of
ms_deform_im2col_cuda.cuh:238 (there per-thread scalar FMAs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _slot_weights(fx, fy, h, w, dt):
    """Packed-slot bilinear weights from continuous pixel coords.

    fx/fy: [1, T] f32 tiles.  Returns [4, T] weights in ``dt`` replicating
    ``ops/deform_attn.py::packed_corner_parts_nogather``'s slot_w exactly:
    for each true corner (dy, dx), its bilinear weight (zeroed outside the
    image) accumulates into the packed slot the edge-clamped gather put it
    in (slot = (clip(ty-yc,0,1), clip(tx-xc,0,1)))."""
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    xc = jnp.clip(x0i, 0, w - 1)
    yc = jnp.clip(y0i, 0, h - 1)
    slots = [jnp.zeros(fx.shape, jnp.float32) for _ in range(4)]
    for dy in (0, 1):
        for dx in (0, 1):
            ty = y0i + dy
            tx = x0i + dx
            valid = (ty >= 0) & (ty < h) & (tx >= 0) & (tx < w)
            oy = jnp.clip(ty - yc, 0, 1)
            ox = jnp.clip(tx - xc, 0, 1)
            wgt = jnp.where(
                valid,
                (wx if dx else 1.0 - wx) * (wy if dy else 1.0 - wy),
                0.0,
            )
            si = oy * 2 + ox
            for s in range(4):
                slots[s] = slots[s] + jnp.where(si == s, wgt, 0.0)
    return jnp.concatenate(slots, axis=0).astype(dt)  # [4, T]


def _warp_flat_kernel(p_ref, fx_ref, fy_ref, e_ref, r_ref, o_ref,
                      *, n, h, w, hd, out3d=False):
    """Per-frame slot-combine writing frame-stacked channel groups.

    One grid step owns a [T, N*hd] output tile; the frame loop is unrolled
    in-kernel so each frame's [T, hd] result lands at a STATIC lane offset
    (dynamic lane starts would need 128-alignment, and hd=80 is not) —
    this is what lets the cached-BEV temporal warp emit the
    [Lq, F*C] concat layout straight from the kernel."""
    prec = (jax.lax.Precision.HIGHEST
            if p_ref.dtype == jnp.float32 else None)
    for hh in range(n):
        # fx/fy blocks are [N, 1, T]; keep the [1, T] tile shape that
        # _slot_weights' axis-0 concatenate expects
        w4 = _slot_weights(fx_ref[hh], fy_ref[hh], h, w, jnp.float32)
        w128 = jax.lax.dot_general(
            w4.astype(p_ref.dtype), e_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        val = p_ref[hh] * w128.astype(p_ref.dtype)
        acc = jax.lax.dot_general(
            val, r_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        if out3d:  # grouped: one [1, T, n*hd] block per (group, q) step
            o_ref[0, :, hh * hd:(hh + 1) * hd] = acc.astype(o_ref.dtype)
        else:
            o_ref[:, hh * hd:(hh + 1) * hd] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("hd", "h", "w", "groups", "block_q", "interpret"),
)
def warp_combine_flat(patch, fx, fy, hd, h, w, groups=1, block_q=512,
                      interpret=None):
    """Slot-combine for the batched bilinear warp, emitting [Lq, N*hd].

    Same math as :func:`combine4_p_reduce_fused` with p=1/out_dot=True, but
    the batch (frame) axis is unrolled inside the kernel and written as
    channel groups of one output tile, so the [N, Lq, hd] -> [Lq, N*hd]
    relayout (an HBM round-trip the cached-BEV path paid ~0.9 ms/frame for)
    never exists.  Output dtype follows the patch dtype.

    patch: [N, Lq, 4*hd]; fx/fy: [N, Lq] f32.  Returns [Lq, N*hd].

    ``groups`` > 1 (multi-stream serving): N = groups * frames; rows are
    group-major and each group's frames land in ITS output slab —
    returns [groups, Lq, (N // groups) * hd].
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, lq, c4 = patch.shape
    assert c4 == 4 * hd and n % groups == 0
    npg = n // groups
    t = block_q
    while lq % t:
        t //= 2
    e = jnp.asarray(
        (np.arange(c4)[None] // hd == np.arange(4)[:, None]), jnp.float32
    ).astype(patch.dtype)
    r = jnp.asarray(
        (np.arange(c4)[:, None] % hd == np.arange(hd)[None]), np.float32
    ).astype(patch.dtype)
    if groups == 1:
        row_spec = pl.BlockSpec((n, 1, t), lambda q: (0, 0, q),
                                memory_space=pltpu.VMEM)
        f = pl.pallas_call(
            functools.partial(_warp_flat_kernel, n=n, h=h, w=w, hd=hd),
            grid=(lq // t,),
            in_specs=[
                pl.BlockSpec((n, t, c4), lambda q: (0, q, 0),
                             memory_space=pltpu.VMEM),
                row_spec,
                row_spec,
                pl.BlockSpec((4, c4), lambda q: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c4, hd), lambda q: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((t, n * hd), lambda q: (q, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((lq, n * hd), patch.dtype),
            interpret=interpret,
        )
        return f(patch, fx.reshape(n, 1, lq), fy.reshape(n, 1, lq), e, r)
    row_spec = pl.BlockSpec((npg, 1, t), lambda g, q: (g, 0, q),
                            memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        functools.partial(_warp_flat_kernel, n=npg, h=h, w=w, hd=hd,
                          out3d=True),
        grid=(groups, lq // t),
        in_specs=[
            pl.BlockSpec((npg, t, c4), lambda g, q: (g, q, 0),
                         memory_space=pltpu.VMEM),
            row_spec,
            row_spec,
            pl.BlockSpec((4, c4), lambda g, q: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c4, hd), lambda g, q: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, npg * hd), lambda g, q: (g, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((groups, lq, npg * hd), patch.dtype),
        interpret=interpret,
    )
    return f(patch, fx.reshape(n, 1, lq), fy.reshape(n, 1, lq), e, r)


def _combine_fused_kernel(p_ref, fx_ref, fy_ref, aw_ref, e_ref, o_ref,
                          *, h, w, hd, out_dot, r_ref=None):
    p_idx = pl.program_id(2)

    @pl.when(p_idx == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    # f32 operands must NOT be truncated to bf16 by the MXU (default
    # precision): whether that happens depends on whether Mosaic routes
    # the dot to the VPU or MXU (tile-size dependent), so pin HIGHEST for
    # f32 inputs.  bf16 inputs are MXU-native (exact) — keep DEFAULT.
    prec = (jax.lax.Precision.HIGHEST
            if p_ref.dtype == jnp.float32 else None)
    w4 = _slot_weights(fx_ref[0], fy_ref[0], h, w, jnp.float32)  # [4, T]
    if aw_ref is not None:
        w4 = w4 * aw_ref[0].astype(jnp.float32)
    # [4, T] x [4, C4] -> [T, C4] lane broadcast via the indicator matmul;
    # the weights round to the patch dtype exactly like the XLA-side w4t
    # stack did, keeping numerics identical to combine4_p_reduce
    w128 = jax.lax.dot_general(
        w4.astype(p_ref.dtype), e_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    val = p_ref[0] * w128.astype(p_ref.dtype)
    if out_dot:
        acc = jax.lax.dot_general(
            val, r_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
    else:
        acc = (
            val[:, 0 * hd : 1 * hd].astype(jnp.float32)
            + val[:, 1 * hd : 2 * hd].astype(jnp.float32)
            + val[:, 2 * hd : 3 * hd].astype(jnp.float32)
            + val[:, 3 * hd : 4 * hd].astype(jnp.float32)
        )
    o_ref[0] += acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("p", "hd", "h", "w", "block_q", "out_dot", "interpret",
                     "out_dtype"),
)
def combine4_p_reduce_fused(patch, fx, fy, aw, p, hd, h, w,
                            block_q=None, out_dot=False, interpret=None,
                            out_dtype=None):
    """Slot-combine + point-reduce with IN-KERNEL slot weights.

    Same contract as :func:`combine4_p_reduce`, but instead of taking the
    precomputed [N, 4, S] weight stack it takes the raw continuous pixel
    coords (fx, fy: [N, S] f32) and optional per-row attention weights
    (aw: [N, S] or None) and derives the 4 packed-slot bilinear weights on
    the VPU inside the kernel.  This deletes the XLA-side slot fusion +
    [N, 4, S] stack (~0.5 ms/layer at CAMF shapes) and its HBM round-trip.

    out_dot: reduce the 4 packed lane groups with the R-matmul (works for
      any hd) instead of lane slices (needs hd % 128-friendly slices; the
      fast path for hd=32 CAMF).
    out_dtype: output dtype (default float32).  Non-f32 requires p == 1
      (the p grid axis accumulates into the output buffer).

    Returns [N, Lq, hd] in out_dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, s, c4 = patch.shape
    assert c4 == 4 * hd and s % p == 0
    lq = s // p
    if block_q is not None:
        t = block_q
    else:
        # 2 MB patch blocks.  4 MB was tried (r4): the kernel's internal
        # w128/val temporaries (~2x the block) pushed the scoped-VMEM
        # footprint to 21 MB, over the DEFAULT 16 MB limit that applies in
        # any compile without tpu_compiler_options (e.g. model.init) —
        # compile crash, no measurable win available.
        cap = max(128, (2 << 20) // (c4 * patch.dtype.itemsize))
        t = 1 << (cap.bit_length() - 1)
    while lq % t:
        t //= 2
    n_lq = lq // t
    e = jnp.asarray(
        (np.arange(c4)[None] // hd == np.arange(4)[:, None]), jnp.float32
    ).astype(patch.dtype)
    row_spec = pl.BlockSpec((1, 1, t),
                            lambda hh, q, pp: (hh, 0, pp * n_lq + q),
                            memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, t, c4), lambda hh, q, pp: (hh, pp * n_lq + q, 0),
                     memory_space=pltpu.VMEM),
        row_spec,
        row_spec,
    ]
    operands = [patch, fx.reshape(n, 1, s), fy.reshape(n, 1, s)]
    if aw is not None:
        in_specs.append(row_spec)
        operands.append(aw.reshape(n, 1, s))
    in_specs.append(
        pl.BlockSpec((4, c4), lambda hh, q, pp: (0, 0),
                     memory_space=pltpu.VMEM)
    )
    operands.append(e)
    kw = dict(h=h, w=w, hd=hd, out_dot=out_dot)
    if out_dot:
        r = jnp.asarray(
            (np.arange(c4)[:, None] % hd == np.arange(hd)[None]), np.float32
        ).astype(patch.dtype)
        in_specs.append(
            pl.BlockSpec((c4, hd), lambda hh, q, pp: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(r)
    out_dtype = jnp.float32 if out_dtype is None else out_dtype
    assert out_dtype == jnp.float32 or p == 1, \
        "non-f32 output would accumulate the p axis at reduced precision"
    f = pl.pallas_call(
        _make_fused_kernel(aw is not None, out_dot, kw),
        grid=(n, n_lq, p),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, t, hd), lambda hh, q, pp: (hh, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, lq, hd), out_dtype),
        interpret=interpret,
    )
    return f(*operands)


def _make_fused_kernel(has_aw, out_dot, kw):
    if has_aw and out_dot:
        def kernel(p_ref, fx_ref, fy_ref, aw_ref, e_ref, r_ref, o_ref):
            _combine_fused_kernel(p_ref, fx_ref, fy_ref, aw_ref, e_ref,
                                  o_ref, r_ref=r_ref, **kw)
    elif has_aw:
        def kernel(p_ref, fx_ref, fy_ref, aw_ref, e_ref, o_ref):
            _combine_fused_kernel(p_ref, fx_ref, fy_ref, aw_ref, e_ref,
                                  o_ref, **kw)
    elif out_dot:
        def kernel(p_ref, fx_ref, fy_ref, e_ref, r_ref, o_ref):
            _combine_fused_kernel(p_ref, fx_ref, fy_ref, None, e_ref,
                                  o_ref, r_ref=r_ref, **kw)
    else:
        def kernel(p_ref, fx_ref, fy_ref, e_ref, o_ref):
            _combine_fused_kernel(p_ref, fx_ref, fy_ref, None, e_ref,
                                  o_ref, **kw)
    return kernel


def _combine_kernel(p_ref, w_ref, e_ref, r_ref, o_ref):
    p_idx = pl.program_id(2)

    @pl.when(p_idx == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    # see combine4_p_reduce_fused: pin HIGHEST for f32 so the MXU doesn't
    # silently truncate to bf16 (tile-size-dependent VPU/MXU routing)
    prec = (jax.lax.Precision.HIGHEST
            if p_ref.dtype == jnp.float32 else None)
    # [4, T] x [4, C4] -> [T, C4]: contracting the sublane dim avoids an
    # explicit in-kernel transpose of the weight tile
    w128 = jax.lax.dot_general(
        w_ref[0], e_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    val = p_ref[0] * w128.astype(p_ref.dtype)
    o_ref[0] += jax.lax.dot_general(
        val, r_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )


@functools.partial(
    jax.jit, static_argnames=("p", "hd", "block_q", "interpret")
)
def combine4_p_reduce(patch, w4t, p, hd, block_q=8192, interpret=None):
    """out[n, q, :] = sum_p sum_si patch[n, p*Lq+q, si*hd:(si+1)*hd]
                                   * w4t[n, si, p*Lq+q]

    Args:
      patch: [N, P*Lq, 4*hd] packed corner rows, P-major (row = p*Lq + q).
      w4t:   [N, 4, P*Lq] combined slot weights
             (slot weight * attention weight) pre-transposed so the HBM
             layout is lane-dense.
      p, hd: static point count / head dim.

    Returns [N, Lq, hd] float32.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, s, c4 = patch.shape
    assert c4 == 4 * hd and s % p == 0
    lq = s // p
    # cap the patch block at ~2 MB so wide-channel calls (e.g. the BEV
    # temporal warp, c4=320) still double-buffer comfortably in VMEM;
    # round down to a power of two so the halving loop lands on a divisor.
    # An explicit block_q wins over the cap (block-size sweeps / callers
    # that know their VMEM budget).
    if block_q != 8192:
        t = block_q
    else:
        cap = max(128, (2 << 20) // (c4 * patch.dtype.itemsize))
        t = min(block_q, 1 << (cap.bit_length() - 1))
    while lq % t:
        t //= 2
    n_lq = lq // t
    # cast e to the operand dtype like the sibling kernels: a bf16 caller
    # (the bf16 frozen-camera train path) would otherwise issue a mixed
    # bf16 x f32 in-kernel dot that Mosaic may reject
    e = jnp.asarray(
        (np.arange(c4)[None] // hd == np.arange(4)[:, None]), jnp.float32
    ).astype(patch.dtype)
    r = jnp.asarray(
        (np.arange(c4)[:, None] % hd == np.arange(hd)[None]), np.float32
    ).astype(patch.dtype)
    f = pl.pallas_call(
        _combine_kernel,
        grid=(n, n_lq, p),
        in_specs=[
            pl.BlockSpec((1, t, c4), lambda h, q, pp: (h, pp * n_lq + q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, t), lambda h, q, pp: (h, 0, pp * n_lq + q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, c4), lambda h, q, pp: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c4, hd), lambda h, q, pp: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, hd), lambda h, q, pp: (h, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, lq, hd), jnp.float32),
        interpret=interpret,
    )
    return f(patch, w4t, e, r)


def _dpatch_dw4t_kernel(w_ref, g_ref, p_ref, e_ref, dp_ref, dw_ref):
    prec = (jax.lax.Precision.HIGHEST
            if g_ref.dtype == jnp.float32 else None)
    w128 = jax.lax.dot_general(
        w_ref[0], e_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    g = g_ref[0]
    g_rep = jnp.concatenate([g, g, g, g], axis=-1)  # [T, 4*hd]
    dp_ref[0] = (w128.astype(g.dtype) * g_rep).astype(dp_ref.dtype)
    # d_w4t[si, t] = sum_lanes patch[t, si*hd:(si+1)*hd] * g[t, :]: the
    # lane-group reduce runs as one E-contraction on the MXU, emitting the
    # [4, T] tile directly in d_w4t's lane-major layout (the XLA stack
    # formulation pays an S-sublane -> S-lane relayout per slot)
    val = p_ref[0].astype(g.dtype) * g_rep  # [T, 4*hd]
    dw = jax.lax.dot_general(
        e_ref[:], val, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # [4, T]
    dw_ref[0] = dw.astype(dw_ref.dtype)


@functools.partial(jax.jit, static_argnames=("p", "hd", "interpret"))
def dpatch_dw4t(w4t, g, patch, p, hd, interpret=None):
    """Fused deform-attn backward: one pass emitting BOTH cotangents.

        d_patch[n, pp*Lq+q, si*hd+c] = w4t[n, si, pp*Lq+q] * g[n, q, c]
        d_w4t[n, si, pp*Lq+q] = sum_c patch[n, pp*Lq+q, si*hd+c] * g[n, q, c]

    Replaces :func:`dpatch_broadcast` + the XLA d_w4t stack in
    ``ops/deform_attn.py::_pcpr_bwd``: the patch (re-gathered by the
    caller) is streamed ONCE and the d_w4t lane-group reduce happens on
    the MXU in d_w4t's own [N, 4, S] lane-major layout, instead of a
    4-slot multiply-reduce + S-relayout stack fusion on the VPU.

    w4t: [N, 4, S] (S = p*Lq, P-major); g: [N, Lq, hd]; patch: [N, S, 4*hd].
    Returns (d_patch [N, S, 4*hd] in g.dtype, d_w4t [N, 4, S] f32).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, _, s = w4t.shape
    lq = s // p
    c4 = 4 * hd
    cap = max(128, (2 << 20) // (c4 * g.dtype.itemsize))
    t = 1 << (cap.bit_length() - 1)
    while lq % t:
        t //= 2
    n_lq = lq // t
    e = jnp.asarray(
        (np.arange(c4)[None] // hd == np.arange(4)[:, None]), jnp.float32
    ).astype(g.dtype)
    f = pl.pallas_call(
        _dpatch_dw4t_kernel,
        grid=(n, n_lq, p),
        in_specs=[
            pl.BlockSpec((1, 4, t),
                         lambda hh, q, pp: (hh, 0, pp * n_lq + q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, hd), lambda hh, q, pp: (hh, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, c4),
                         lambda hh, q, pp: (hh, pp * n_lq + q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, c4), lambda hh, q, pp: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, t, c4),
                         lambda hh, q, pp: (hh, pp * n_lq + q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, t),
                         lambda hh, q, pp: (hh, 0, pp * n_lq + q),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, s, c4), g.dtype),
            jax.ShapeDtypeStruct((n, 4, s), jnp.float32),
        ],
        interpret=interpret,
    )
    return f(w4t.astype(g.dtype), g, patch, e)


def _dpatch_kernel(w_ref, g_ref, e_ref, o_ref):
    prec = (jax.lax.Precision.HIGHEST
            if g_ref.dtype == jnp.float32 else None)
    w128 = jax.lax.dot_general(
        w_ref[0], e_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    g = g_ref[0]
    g_rep = jnp.concatenate([g, g, g, g], axis=-1)  # [T, 4*hd]
    o_ref[0] = (w128.astype(g.dtype) * g_rep).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("p", "hd", "interpret"))
def dpatch_broadcast(w4t, g, p, hd, interpret=None):
    """d_patch[n, pp*Lq+q, si*hd:(si+1)*hd] = w4t[n, si, pp*Lq+q] * g[n, q].

    The deformable-attention custom-VJP backward's cotangent expansion
    (ops/deform_attn.py::_pcpr_bwd).  As an XLA fusion, broadcasting the
    lane-major [N, 4, S] weights against the sublane-major output runs at
    ~6x the write floor (4.1 ms/layer at CAMF train shapes) — the same
    S-on-lanes vs S-on-sublanes relayout the combine kernels avoid with
    the indicator matmul, reused here.

    w4t: [N, 4, S] (S = p*Lq, P-major); g: [N, Lq, hd] cotangent.
    Returns [N, S, 4*hd] in g.dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, _, s = w4t.shape
    lq = s // p
    c4 = 4 * hd
    cap = max(128, (2 << 20) // (c4 * g.dtype.itemsize))
    t = 1 << (cap.bit_length() - 1)
    while lq % t:
        t //= 2
    n_lq = lq // t
    e = jnp.asarray(
        (np.arange(c4)[None] // hd == np.arange(4)[:, None]), jnp.float32
    ).astype(g.dtype)
    f = pl.pallas_call(
        _dpatch_kernel,
        grid=(n, n_lq, p),
        in_specs=[
            pl.BlockSpec((1, 4, t),
                         lambda hh, q, pp: (hh, 0, pp * n_lq + q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, hd), lambda hh, q, pp: (hh, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, c4), lambda hh, q, pp: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, c4),
                               lambda hh, q, pp: (hh, pp * n_lq + q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, s, c4), g.dtype),
        interpret=interpret,
    )
    return f(w4t.astype(g.dtype), g, e)
