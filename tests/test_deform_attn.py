"""MSDeformAttn sampling core vs a torch grid_sample oracle.

The torch oracle below reimplements the well-known pure-PyTorch fallback
semantics of multi-scale deformable attention (per-head bilinear sampling at
normalized locations with align_corners=False, weighted sum over points) that
the reference validates its CUDA kernel against (ops/deformattn/test.py).
"""

import jax.numpy as jnp
import jax
import numpy as np
import torch
import torch.nn.functional as F

from rcbevdet_tpu.ops.deform_attn import ms_deform_attn_core


def torch_deform_attn(value, shapes, locs, weights):
    """value [B, L, H, D]; locs [B, Q, H, nl, P, 2]; weights [B, Q, H, nl, P]."""
    b, _, nheads, hd = value.shape
    _, q = locs.shape[0], locs.shape[1]
    out = torch.zeros(b, q, nheads, hd)
    start = 0
    for lvl, (hh, ww) in enumerate(shapes):
        v = value[:, start : start + hh * ww]
        start += hh * ww
        v = v.permute(0, 2, 3, 1).reshape(b * nheads, hd, hh, ww)
        g = locs[:, :, :, lvl] * 2 - 1  # [B, Q, H, P, 2]
        g = g.permute(0, 2, 1, 3, 4).reshape(b * nheads, q, -1, 2)
        samp = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                             align_corners=False)  # [B*H, hd, Q, P]
        wgt = weights[:, :, :, lvl].permute(0, 2, 1, 3).reshape(b * nheads, 1, q, -1)
        o = (samp * wgt).sum(-1)  # [B*H, hd, Q]
        out += o.reshape(b, nheads, hd, q).permute(0, 3, 1, 2)
    return out.reshape(b, q, nheads * hd)


def test_deform_attn_matches_torch(rng):
    b, q, nheads, hd, npts = 2, 10, 4, 8, 6
    shapes = [(7, 9)]
    lin = sum(h * w for h, w in shapes)
    value = rng.standard_normal((b, lin, nheads, hd)).astype(np.float32)
    locs = rng.random((b, q, nheads, len(shapes), npts, 2)).astype(np.float32)
    locs = locs * 1.2 - 0.1  # include out-of-range samples
    weights = rng.random((b, q, nheads, len(shapes), npts)).astype(np.float32)

    got = ms_deform_attn_core(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(weights)
    )
    ref = torch_deform_attn(
        torch.from_numpy(value), shapes, torch.from_numpy(locs),
        torch.from_numpy(weights),
    ).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_deform_attn_multi_level(rng):
    b, q, nheads, hd, npts = 1, 5, 2, 4, 3
    shapes = [(6, 6), (3, 3)]
    lin = sum(h * w for h, w in shapes)
    value = rng.standard_normal((b, lin, nheads, hd)).astype(np.float32)
    locs = rng.random((b, q, nheads, len(shapes), npts, 2)).astype(np.float32)
    weights = rng.random((b, q, nheads, len(shapes), npts)).astype(np.float32)

    got = ms_deform_attn_core(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(weights)
    )
    ref = torch_deform_attn(
        torch.from_numpy(value), shapes, torch.from_numpy(locs),
        torch.from_numpy(weights),
    ).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_packed_equals_gather4_with_oob():
    """The packed-corner fast path must match the 4-gather form exactly,
    including out-of-range sampling locations (zero-padding semantics)."""
    from rcbevdet_tpu.ops.deform_attn import (
        ms_deform_attn_core_gather4,
        ms_deform_attn_core_packed,
    )

    rng = np.random.default_rng(7)
    b, heads, hd, lq, p = 2, 4, 8, 64, 6
    shapes = [(16, 24), (8, 12)]
    len_in = sum(h * w for h, w in shapes)
    value = jnp.asarray(
        rng.standard_normal((b, len_in, heads, hd)), jnp.float32
    )
    # locations straddle [0,1] to exercise the padding/clamp paths
    locs = jnp.asarray(
        rng.uniform(-0.3, 1.3, (b, lq, heads, len(shapes), p, 2)),
        jnp.float32,
    )
    w = jax.nn.softmax(
        jnp.asarray(
            rng.standard_normal((b, lq, heads, len(shapes) * p)), jnp.float32
        ),
        axis=-1,
    ).reshape(b, lq, heads, len(shapes), p)
    a = ms_deform_attn_core_gather4(value, shapes, locs, w)
    c = ms_deform_attn_core_packed(value, shapes, locs, w)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-6)


def test_packed_slices_reduce_equals_einsum():
    """The inference 'slices' reduce must match the train 'einsum' reduce."""
    from rcbevdet_tpu.ops.deform_attn import ms_deform_attn_core_packed

    rng = np.random.default_rng(11)
    b, heads, hd, lq, p = 2, 4, 8, 64, 6
    shapes = [(16, 24)]
    len_in = sum(h * w for h, w in shapes)
    value = jnp.asarray(
        rng.standard_normal((b, len_in, heads, hd)), jnp.float32
    )
    locs = jnp.asarray(
        rng.uniform(-0.3, 1.3, (b, lq, heads, len(shapes), p, 2)),
        jnp.float32,
    )
    w = jax.nn.softmax(
        jnp.asarray(
            rng.standard_normal((b, lq, heads, len(shapes) * p)), jnp.float32
        ),
        axis=-1,
    ).reshape(b, lq, heads, len(shapes), p)
    a = ms_deform_attn_core_packed(value, shapes, locs, w, reduce="einsum")
    c = ms_deform_attn_core_packed(value, shapes, locs, w, reduce="slices")
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-6)


def test_packed_pallas_reduce_equals_einsum():
    """The Pallas combine kernel must match the train 'einsum' reduce.

    Lq=128 exercises the real kernel path (lane-aligned); the interpret
    mode runs it off-TPU.
    """
    from rcbevdet_tpu.ops.deform_attn import ms_deform_attn_core_packed

    rng = np.random.default_rng(12)
    b, heads, hd, lq, p = 2, 4, 8, 128, 6
    shapes = [(16, 24)]
    len_in = sum(h * w for h, w in shapes)
    value = jnp.asarray(
        rng.standard_normal((b, len_in, heads, hd)), jnp.float32
    )
    locs = jnp.asarray(
        rng.uniform(-0.3, 1.3, (b, lq, heads, len(shapes), p, 2)),
        jnp.float32,
    )
    w = jax.nn.softmax(
        jnp.asarray(
            rng.standard_normal((b, lq, heads, len(shapes) * p)), jnp.float32
        ),
        axis=-1,
    ).reshape(b, lq, heads, len(shapes), p)
    a = ms_deform_attn_core_packed(value, shapes, locs, w, reduce="einsum")
    c = ms_deform_attn_core_packed(value, shapes, locs, w, reduce="pallas")
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-5)


def test_packed_pallas_reduce_falls_back_when_unaligned():
    """Lq not a multiple of 128 silently uses the 'slices' path."""
    from rcbevdet_tpu.ops.deform_attn import ms_deform_attn_core_packed

    rng = np.random.default_rng(13)
    b, heads, hd, lq, p = 1, 2, 8, 60, 4
    shapes = [(8, 8)]
    value = jnp.asarray(
        rng.standard_normal((b, 64, heads, hd)), jnp.float32
    )
    locs = jnp.asarray(
        rng.uniform(0.0, 1.0, (b, lq, heads, 1, p, 2)), jnp.float32
    )
    w = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((b, lq, heads, p)), jnp.float32),
        axis=-1,
    ).reshape(b, lq, heads, 1, p)
    a = ms_deform_attn_core_packed(value, shapes, locs, w, reduce="einsum")
    c = ms_deform_attn_core_packed(value, shapes, locs, w, reduce="pallas")
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-6)


def test_packed_custom_reduce_forward_and_grads_equal_einsum():
    """'custom' (hand-written VJP train path) == 'einsum' autodiff: both
    the forward and d(value)/d(locations)/d(weights)."""
    from rcbevdet_tpu.ops.deform_attn import ms_deform_attn_core_packed

    rng = np.random.default_rng(13)
    b, heads, hd, lq, p = 2, 4, 8, 64, 6
    shapes = [(16, 24)]
    len_in = sum(h * w for h, w in shapes)
    value = jnp.asarray(
        rng.standard_normal((b, len_in, heads, hd)), jnp.float32
    )
    locs = jnp.asarray(
        rng.uniform(-0.3, 1.3, (b, lq, heads, len(shapes), p, 2)),
        jnp.float32,
    )
    w = jax.nn.softmax(
        jnp.asarray(
            rng.standard_normal((b, lq, heads, len(shapes) * p)), jnp.float32
        ),
        axis=-1,
    ).reshape(b, lq, heads, len(shapes), p)
    cot = jnp.asarray(
        rng.standard_normal((b, lq, heads * hd)), jnp.float32
    )

    def run(reduce):
        def f(v, l, ww):
            return ms_deform_attn_core_packed(v, shapes, l, ww, reduce=reduce)

        out, vjp = jax.vjp(f, value, locs, w)
        return out, vjp(cot)

    out_e, g_e = run("einsum")
    out_c, g_c = run("custom")
    np.testing.assert_allclose(np.asarray(out_e), np.asarray(out_c),
                               atol=2e-6)
    for a, b_ in zip(g_e, g_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=2e-5)


def test_packed_custom_reduce_pallas_routing_forced():
    """Force the TPU routing gate so the Pallas-routed custom-VJP forward
    (combine4_p_reduce) AND backward (dpatch_broadcast) run end to end in
    interpret mode — covering the wiring (dtype casts, lq%128 gate,
    P-major row alignment with flat_idx), not just the isolated kernels
    (ADVICE r4)."""
    from rcbevdet_tpu.ops import deform_attn as da

    rng = np.random.default_rng(21)
    b, heads, hd, lq, p = 1, 2, 8, 128, 4  # lq % 128 == 0 passes the gate
    shapes = [(8, 16)]
    len_in = sum(h * w for h, w in shapes)
    value = jnp.asarray(
        rng.standard_normal((b, len_in, heads, hd)), jnp.float32
    )
    locs = jnp.asarray(
        rng.uniform(-0.2, 1.2, (b, lq, heads, len(shapes), p, 2)),
        jnp.float32,
    )
    w = jax.nn.softmax(
        jnp.asarray(
            rng.standard_normal((b, lq, heads, len(shapes) * p)), jnp.float32
        ),
        axis=-1,
    ).reshape(b, lq, heads, len(shapes), p)
    cot = jnp.asarray(rng.standard_normal((b, lq, heads * hd)), jnp.float32)

    def run(reduce):
        def f(v, l, ww):
            return da.ms_deform_attn_core_packed(
                v, shapes, l, ww, reduce=reduce
            )

        out, vjp = jax.vjp(f, value, locs, w)
        return out, vjp(cot)

    out_e, g_e = run("einsum")
    assert da.FORCE_PALLAS_COMBINE is None
    da.FORCE_PALLAS_COMBINE = True
    try:
        out_c, g_c = run("custom")
    finally:
        da.FORCE_PALLAS_COMBINE = None
    np.testing.assert_allclose(np.asarray(out_e), np.asarray(out_c),
                               atol=2e-6)
    for a, b_ in zip(g_e, g_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=2e-5)


def test_packed_custom_reduce_under_checkpoint():
    """The custom-VJP core composes with jax.checkpoint (CAMF wraps it)."""
    from rcbevdet_tpu.ops.deform_attn import ms_deform_attn_core_packed

    rng = np.random.default_rng(14)
    b, heads, hd, lq, p = 1, 2, 4, 32, 3
    shapes = [(8, 8)]
    len_in = sum(h * w for h, w in shapes)
    value = jnp.asarray(
        rng.standard_normal((b, len_in, heads, hd)), jnp.float32
    )
    locs = jnp.asarray(
        rng.uniform(0.0, 1.0, (b, lq, heads, len(shapes), p, 2)), jnp.float32
    )
    w = jnp.full((b, lq, heads, len(shapes), p), 1.0 / p, jnp.float32)

    def loss(v, reduce):
        core = jax.checkpoint(
            lambda vv: ms_deform_attn_core_packed(
                vv, shapes, locs, w, reduce=reduce
            )
        )
        return jnp.sum(core(v) ** 2)

    le, ge = jax.value_and_grad(lambda v: loss(v, "einsum"))(value)
    lc, gc = jax.value_and_grad(lambda v: loss(v, "custom"))(value)
    np.testing.assert_allclose(float(le), float(lc), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ge), np.asarray(gc),
                               rtol=1e-4, atol=2e-5)


def test_combine4_fused_out_dot_matches_slices():
    """combine4_p_reduce_fused: the R-matmul lane reduce (out_dot=True,
    any-hd path) must match the lane-slice reduce (hd=32 fast path)."""
    from rcbevdet_tpu.ops.deform_attn import packed_gather_rows
    from rcbevdet_tpu.ops.deform_attn_pallas import combine4_p_reduce_fused

    rng = np.random.default_rng(15)
    n, hd, h, w, p, lq = 2, 8, 16, 24, 4, 128
    s = p * lq
    value = jnp.asarray(rng.standard_normal((n, h, w, hd)), jnp.float32)
    fx = jnp.asarray(rng.uniform(-2.0, w + 2.0, (n, s)), jnp.float32)
    fy = jnp.asarray(rng.uniform(-2.0, h + 2.0, (n, s)), jnp.float32)
    aw = jnp.asarray(rng.uniform(0.0, 1.0, (n, s)), jnp.float32)
    patch = packed_gather_rows(value, fx, fy, h, w)
    a = combine4_p_reduce_fused(patch, fx, fy, aw, p=p, hd=hd, h=h, w=w)
    b = combine4_p_reduce_fused(patch, fx, fy, aw, p=p, hd=hd, h=h, w=w,
                                out_dot=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_dpatch_broadcast_matches_xla():
    """dpatch_broadcast (interpret mode) == the XLA concat-broadcast it
    replaces in the custom-VJP backward."""
    from rcbevdet_tpu.ops.deform_attn_pallas import dpatch_broadcast

    rng = np.random.default_rng(21)
    n, p, lq, hd = 3, 4, 256, 8
    s = p * lq
    w4t = jnp.asarray(rng.standard_normal((n, 4, s)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((n, lq, hd)), jnp.float32)
    got = dpatch_broadcast(w4t, g, p=p, hd=hd, interpret=True)
    g_b = jnp.broadcast_to(g[:, None], (n, p, lq, hd)).reshape(n, s, hd)
    want = jnp.concatenate(
        [w4t[:, si, :, None] * g_b for si in range(4)], axis=-1
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
