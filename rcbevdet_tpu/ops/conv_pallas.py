"""Fused 3x3 conv (+BN affine, +residual, +activation) Pallas TPU kernels.

Why this exists: XLA's conv lowering for this model's BEV-resolution convs
(128x128 NHWC, 80-768 input channels) runs at 3-30x its isolated time when
embedded in the full inference graph — the layouts its neighbors force on
the conv's input/output make XLA pick slow convolution strategies, and
optimization barriers don't help (round-2 profile: up2_conv 1.18 ms,
radar_reduc 0.82 ms; converting those moved the penalty onto the adjacent
CustomResNet blocks, so the whole BEV-resolution conv set routes through
these kernels on the inference fast path).  A Pallas kernel pins standard
layouts at its boundary and runs the conv as shifted MXU matmuls, with
the inference BatchNorm affine, the residual add and the activation fused
into the epilogue.

Stride-1 formulation (per batch row, per row-tile of the output):

    x_pad   : [H+3, W+2, Cin]  (zero-padded input, resident in VMEM)
    flat    : rows r0 .. r0+tile_h+3 flattened to [(tile_h+3)*(W+2), Cin]
    out[r]  = sum_{ky,kx} flat[r + ky*(W+2) + kx] @ K[ky, kx]

i.e. keeping the output in the PADDED-width frame makes every kernel tap a
pure row shift of one flattened [rows, Cin] tile — 9 clean MXU matmuls, no
im2col.  The junk columns per row (where the window wraps) are sliced away
when writing the [tile_h, W, Cout] output block.

Stride-2 formulation: view the padded row slab as even/odd row and column
phases ([th+2, 2, Wp/2, 2, C]); each tap (ky, kx) is then the unit-stride
slice (rows ky>>1 .., phase ky&1, cols kx>>1 .., phase kx&1) — again 9
clean matmuls, never a strided VMEM access.

Used on the inference fast path only (forward_cached / serving /
benchmark); training and CPU runs use the identical-math XLA fallback.
Reference analog: torch Conv2d+BN2d+ReLU modules (bevdet_rc.py:28-65
RadarConvFuser, :132 radar_reduc_conv; BasicBlocks of
models/backbones/resnet.py) fused by `fuse_conv_bn` in the reference
benchmark (tools/analysis_tools/benchmark_sequential.py:66).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _epilogue(acc, s_ref, b_ref, r_ref, act, o_ref):
    y = acc * s_ref[0][None, None, :] + b_ref[0][None, None, :]
    if r_ref is not None:
        y = y + r_ref[0].astype(jnp.float32)
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    o_ref[0] = y.astype(o_ref.dtype)


def _conv_kernel(x_ref, w_ref, s_ref, b_ref, *rest, tile_h, w_out, act,
                 has_res):
    r_ref, o_ref = (rest[0], rest[1]) if has_res else (None, rest[0])
    wpad = w_out + 2
    cin = x_ref.shape[-1]
    cout = o_ref.shape[-1]
    # tile_h+3 rows: the flattened tap offsets reach up to
    # (tile_h+2)*wpad + 2 (the junk columns of the last row under the
    # (ky=2, kx=2) tap), which needs one row beyond the true 3x3 halo
    rows = x_ref[0]  # [tile_h+3, W+2, Cin] halo row-block (pl.Element)
    flat = rows.reshape((tile_h + 3) * wpad, cin)
    rlen = tile_h * wpad
    prec = (jax.lax.Precision.HIGHEST
            if x_ref.dtype == jnp.float32 else None)
    acc = jnp.zeros((rlen, cout), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            off = ky * wpad + kx
            acc = acc + jax.lax.dot_general(
                flat[off : off + rlen], w_ref[ky, kx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
    acc = acc.reshape(tile_h, wpad, cout)[:, :w_out]
    _epilogue(acc, s_ref, b_ref, r_ref, act, o_ref)


def _conv_s2_kernel(p00_ref, p01_ref, p10_ref, p11_ref, w_ref, s_ref, b_ref,
                    *rest, tile_h, w_out, act, has_res):
    """Stride-2 over PRE-SPLIT row/col phases (XLA slices them outside).

    Each tap (ky, kx) reads phase (ky&1, kx&1) at row offset ky>>1, col
    offset kx>>1 — unit-stride flat slices of a per-phase tile, exactly
    like the stride-1 kernel's shifted-row trick, with no in-kernel
    even/odd reshuffles (the reshape-phase form ran at ~19 G/ms vs XLA's
    42 at 720->160; pre-splitting removes the sublane shuffles)."""
    r_ref, o_ref = (rest[0], rest[1]) if has_res else (None, rest[0])
    cin = p00_ref.shape[-1]
    cout = o_ref.shape[-1]
    # w_out + 2 phase columns: one genuine halo column plus one pad column
    # keeping the width EVEN — Mosaic rejects the flattening reshape when
    # the collapsed minor-2 dim is odd ("unsupported shape cast" at 65)
    wq = p00_ref.shape[-2]
    phases = (p00_ref, p01_ref, p10_ref, p11_ref)
    flats = [p[0].reshape((tile_h + 2) * wq, cin) for p in phases]
    rlen = tile_h * wq
    prec = (jax.lax.Precision.HIGHEST
            if p00_ref.dtype == jnp.float32 else None)
    acc = jnp.zeros((rlen, cout), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            flat = flats[(ky & 1) * 2 + (kx & 1)]
            off = (ky >> 1) * wq + (kx >> 1)
            acc = acc + jax.lax.dot_general(
                flat[off : off + rlen], w_ref[ky, kx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
    acc = acc.reshape(tile_h, wq, cout)[:, :w_out]
    _epilogue(acc, s_ref, b_ref, r_ref, act, o_ref)


@functools.partial(
    jax.jit,
    static_argnames=("act", "stride", "tile_h", "interpret"),
)
def conv3x3_bn_act(x, kernel, scale, bias, act="relu", residual=None,
                   stride=1, tile_h=16, interpret=None):
    """y = act(conv3x3(x, kernel, stride) * scale + bias [+ residual]).

    Args:
      x: [B, H, W, Cin] NHWC (H, W even when stride=2).
      kernel: [3, 3, Cin, Cout] (HWIO, the nn.Conv layout).
      scale/bias: [Cout] folded inference-BN affine
        (gamma/sqrt(var+eps), beta - mean*gamma/sqrt(var+eps)); pass
        ones/zeros for a bare conv, or (ones, conv_bias) for conv+bias.
      act: 'relu' or None.
      residual: optional [B, H/stride, W/stride, Cout] added before act.
      stride: 1 or 2 (padding fixed at 1, the 'same' 3x3 config).

    Returns [B, H/stride, W/stride, Cout] in x.dtype (f32 accumulation).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    h_out, w_out = h // stride, w // stride
    if stride == 2 and w_out % 2:
        # the pre-split phase kernel needs wq = w_out + 2 EVEN (Mosaic
        # rejects the flattening reshape when the collapsed minor-2 dim is
        # odd) — w % 4 == 2 shapes take the identical-math XLA form
        return conv3x3_bn_act_xla(x, kernel, scale, bias, act=act,
                                  residual=residual, stride=stride)
    while h_out % tile_h:
        tile_h //= 2
    # Shrink the row tile until the kernel's VMEM working set fits the
    # scoped budget (input halo block double-buffered + its flattened
    # reshape copy + weights + f32 accumulator + output block; round-3
    # lesson: the f32 CAMF-fuser shape [1,128,128,768] OOM'd scoped VMEM
    # when the whole padded slab was staged).  If even tile_h=1 is over
    # budget, use the identical-math XLA formulation instead of crashing
    # the compile.
    budget = 1024 * int(
        os.environ.get("RCBEVDET_CONV_VMEM_KIB", str(44 * 1024)))
    isz = jnp.dtype(x.dtype).itemsize
    w_bytes = 9 * cin * cout * isz

    def _footprint(th):
        if stride == 1:
            in_blocks = (th + 3) * (w + 2) * cin * isz
        else:  # 4 phase tiles
            in_blocks = 4 * (th + 2) * (w // 2 + 2) * cin * isz
        out_block = th * w_out * cout * isz
        acc = th * (w_out + 2) * cout * 4
        res = out_block if residual is not None else 0
        return 3 * in_blocks + w_bytes + acc + 2 * out_block + res

    while tile_h > 1 and _footprint(tile_h) > budget:
        tile_h //= 2
        while h_out % tile_h:
            tile_h //= 2
    if _footprint(tile_h) > budget and not interpret:
        return conv3x3_bn_act_xla(x, kernel, scale, bias, act=act,
                                  residual=residual, stride=stride)
    s2 = scale.astype(jnp.float32).reshape(1, cout)
    b2 = bias.astype(jnp.float32).reshape(1, cout)
    has_res = residual is not None
    # Overlapping halo row-blocks via elementwise start indices: each grid
    # step stages only rows [i*row_step, i*row_step + rows_in) in VMEM
    # (the last block's end lands exactly on the padded height), never the
    # whole padded slab — which at f32 CAMF-fuser shapes ([1,131,130,768])
    # blew the scoped-VMEM budget (round-3 bench crash).
    if stride == 1:
        xp = jnp.pad(x, ((0, 0), (1, 2), (1, 1), (0, 0)))
        kfn = _conv_kernel
        rows_in, row_step = tile_h + 3, tile_h
        data_specs = [
            pl.BlockSpec((pl.Element(1), pl.Element(rows_in),
                          pl.Element(w + 2), pl.Element(cin)),
                         lambda bb, i: (bb, i * row_step, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        data_operands = [xp]
    else:
        # pre-split even/odd row+col phases (4 cheap XLA strided slices):
        # each tap is then a unit-stride flat slice of one phase tile —
        # no in-kernel sublane reshuffles (see _conv_s2_kernel)
        xp = jnp.pad(x, ((0, 0), (1, 3), (1, 3), (0, 0)))
        phases = [
            xp[:, py::2, px::2] for py in (0, 1) for px in (0, 1)
        ]  # each [B, h_out + 2, w_out + 2, Cin]
        kfn = _conv_s2_kernel
        rows_in, row_step = tile_h + 2, tile_h
        spec = pl.BlockSpec(
            (pl.Element(1), pl.Element(rows_in),
             pl.Element(w_out + 2), pl.Element(cin)),
            lambda bb, i: (bb, i * row_step, 0, 0),
            memory_space=pltpu.VMEM,
        )
        data_specs = [spec] * 4
        data_operands = phases
    in_specs = data_specs + [
        pl.BlockSpec((3, 3, cin, cout), lambda bb, i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), lambda bb, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), lambda bb, i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = data_operands + [kernel.astype(x.dtype), s2, b2]
    if has_res:
        in_specs.append(
            pl.BlockSpec((1, tile_h, w_out, cout),
                         lambda bb, i: (bb, i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(residual)
    f = pl.pallas_call(
        functools.partial(kfn, tile_h=tile_h, w_out=w_out, act=act,
                          has_res=has_res),
        grid=(b, h_out // tile_h),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile_h, w_out, cout),
                               lambda bb, i: (bb, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h_out, w_out, cout), x.dtype),
        interpret=interpret,
    )
    return f(*operands)


def conv3x3_bn_act_auto(x, kernel, scale, bias, act="relu", residual=None,
                        stride=1):
    """Pallas kernel on TPU, identical-math XLA elsewhere.

    Isolated-vs-in-graph caution (r4 measurement): ISOLATED XLA beats the
    Pallas kernel at narrow/strided shapes (80ch 128x128: 0.055 vs 0.143
    ms; 720->160 s2: 0.202 vs 0.444 ms) — but routing those shapes to XLA
    IN-GRAPH regressed the full forward (+0.4 ms on those very modules and
    +0.25 ms on untouched neighbors): the layout cliff the round-2 profile
    found is a property of the surrounding graph, not the op.  Keep every
    fast-path call on the Pallas kernel; it pins its boundary layouts.
    """
    if jax.default_backend() == "tpu":
        return conv3x3_bn_act(x, kernel, scale, bias, act=act,
                              residual=residual, stride=stride)
    return conv3x3_bn_act_xla(x, kernel, scale, bias, act=act,
                              residual=residual, stride=stride)


def conv3x3_bn_act_xla(x, kernel, scale, bias, act="relu", residual=None,
                       stride=1):
    """Identical-math XLA fallback (and test oracle) for
    :func:`conv3x3_bn_act`."""
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


def _maxpool_s2_kernel(p00_ref, p01_ref, p10_ref, p11_ref, o_ref, *, tile_h,
                       w_out):
    """3x3 stride-2 max pool over PRE-SPLIT row/col phases — the stride-2
    conv kernel's flat-slice trick with jnp.maximum instead of the MXU
    dot (reference torchvision maxpool in the ResNet stem)."""
    c = p00_ref.shape[-1]
    wq = p00_ref.shape[-2]
    phases = (p00_ref, p01_ref, p10_ref, p11_ref)
    flats = [p[0].reshape((tile_h + 2) * wq, c) for p in phases]
    rlen = tile_h * wq
    acc = None
    for ky in range(3):
        for kx in range(3):
            flat = flats[(ky & 1) * 2 + (kx & 1)]
            off = (ky >> 1) * wq + (kx >> 1)
            v = flat[off : off + rlen]
            acc = v if acc is None else jnp.maximum(acc, v)
    o_ref[0] = acc.reshape(tile_h, wq, c)[:, :w_out]


@functools.partial(jax.jit, static_argnames=("tile_h", "interpret"))
def maxpool3x3_s2(x, tile_h=8, interpret=None):
    """3x3 / stride-2 / pad-1 max pool, NHWC (the ResNet stem pool).

    XLA's reduce_window runs this at ~4x its memory floor on v5e (0.44 ms
    at the RCBEVDet stem shape [6, 128, 352, 64] bf16); the r4 attempt to
    beat it with a 9-strided-slice XLA max was WORSE in-graph (+1.4 ms —
    the fusion broke neighbor conv layouts), but this kernel pins its own
    layouts like the sibling conv kernels.  H, W must be even; odd w_out
    or over-budget shapes fall back to XLA.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, c = x.shape
    h_out, w_out = h // 2, w // 2
    neg = (jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating)
           else jnp.iinfo(x.dtype).min)
    if h % 2 or w % 2 or w_out % 2:
        return nn_max_pool_xla(x)
    while h_out % tile_h:
        tile_h //= 2
    budget = 1024 * int(
        os.environ.get("RCBEVDET_CONV_VMEM_KIB", str(44 * 1024)))
    isz = jnp.dtype(x.dtype).itemsize
    in_blocks = 4 * (tile_h + 2) * (w_out + 2) * c * isz
    out_block = tile_h * w_out * c * isz
    if 3 * in_blocks + 2 * out_block > budget and not interpret:
        return nn_max_pool_xla(x)
    xp = jnp.pad(x, ((0, 0), (1, 3), (1, 3), (0, 0)),
                 constant_values=neg)
    phases = [xp[:, py::2, px::2] for py in (0, 1) for px in (0, 1)]
    spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(tile_h + 2), pl.Element(w_out + 2),
         pl.Element(c)),
        lambda bb, i: (bb, i * tile_h, 0, 0), memory_space=pltpu.VMEM,
    )
    f = pl.pallas_call(
        functools.partial(_maxpool_s2_kernel, tile_h=tile_h, w_out=w_out),
        grid=(b, h_out // tile_h),
        in_specs=[spec] * 4,
        out_specs=pl.BlockSpec((1, tile_h, w_out, c),
                               lambda bb, i: (bb, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h_out, w_out, c), x.dtype),
        interpret=interpret,
    )
    return f(*phases)


def nn_max_pool_xla(x):
    """reduce_window fallback / oracle for :func:`maxpool3x3_s2`."""
    from flax import linen as _nn

    return _nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
