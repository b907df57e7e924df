"""Accelerate-mode pooling (ops/bev_pool_accel.py) vs the segment-sum oracle."""

import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from rcbevdet_tpu.ops.bev_pool import bev_pool_dense
from rcbevdet_tpu.ops.bev_pool_accel import (
    bev_pool_accel, bev_pool_train, build_pool_meta_device,
    precompute_pool_meta,
)


def _case(rng, n=2, d=6, hf=4, wf=5, c=16, num_cells=256, trash_frac=0.3):
    p = n * d * hf * wf
    ranks = rng.integers(0, num_cells, p)
    trash = rng.random(p) < trash_frac
    ranks = np.where(trash, num_cells, ranks).astype(np.int32)
    rf = np.broadcast_to(
        np.arange(n * hf * wf, dtype=np.int32).reshape(n, 1, hf * wf),
        (n, d, hf * wf),
    ).reshape(-1)
    depth = rng.standard_normal((n, d, hf, wf)).astype(np.float32)
    feat = rng.standard_normal((n, hf, wf, c)).astype(np.float32)
    return depth, feat, ranks, rf


def test_accel_matches_dense_oracle():
    rng = np.random.default_rng(0)
    num_cells = 256
    depth, feat, ranks, rf = _case(rng, num_cells=num_cells)
    oracle = bev_pool_dense(
        jnp.asarray(depth), jnp.asarray(feat),
        jnp.asarray(ranks).reshape(depth.shape), num_cells,
    )
    meta = precompute_pool_meta(
        ranks, rf, num_cells, depth_bins=depth.shape[1],
        hw=depth.shape[2] * depth.shape[3], cells_per_tile=32, chunk=16
    )
    out = bev_pool_accel(
        jnp.asarray(depth), jnp.asarray(feat), meta, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(oracle), rtol=1e-5, atol=1e-5
    )


def test_accel_empty_tiles_are_zero():
    """Cells whose tile receives no points must come back exactly zero."""
    rng = np.random.default_rng(1)
    num_cells = 256
    depth, feat, ranks, rf = _case(rng, num_cells=num_cells)
    # empty the 2nd tile (cells 32..63) entirely
    ranks = np.where(
        (ranks >= 32) & (ranks < 64), num_cells, ranks
    ).astype(np.int32)
    meta = precompute_pool_meta(
        ranks, rf, num_cells, depth_bins=depth.shape[1],
        hw=depth.shape[2] * depth.shape[3], cells_per_tile=32, chunk=16
    )
    out = np.asarray(bev_pool_accel(
        jnp.asarray(depth), jnp.asarray(feat), meta, interpret=True
    ))
    assert np.all(out[32:64] == 0.0)
    oracle = np.asarray(bev_pool_dense(
        jnp.asarray(depth), jnp.asarray(feat),
        jnp.asarray(ranks).reshape(depth.shape), num_cells,
    ))
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-5)


def test_device_meta_matches_host_meta_pool():
    """bev_pool_accel over the device-built meta == over the host meta."""
    rng = np.random.default_rng(2)
    num_cells = 256
    depth, feat, ranks, rf = _case(rng, num_cells=num_cells)
    host = precompute_pool_meta(
        ranks, rf, num_cells, depth_bins=depth.shape[1],
        hw=depth.shape[2] * depth.shape[3], cells_per_tile=32, chunk=16
    )
    dev = build_pool_meta_device(
        jnp.asarray(ranks), num_cells, depth_bins=depth.shape[1],
        hw=depth.shape[2] * depth.shape[3], cells_per_tile=32, chunk=16
    )
    out_h = bev_pool_accel(
        jnp.asarray(depth), jnp.asarray(feat), host, interpret=True
    )
    out_d = bev_pool_accel(
        jnp.asarray(depth), jnp.asarray(feat), dev, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out_d), np.asarray(out_h), rtol=1e-6, atol=1e-6
    )


def test_bev_pool_train_forward_and_grads_match_dense():
    """Custom-VJP sorted train pool: forward == dense oracle; grads too."""
    rng = np.random.default_rng(3)
    num_cells = 256
    depth, feat, ranks, _ = _case(rng, num_cells=num_cells)
    dj, fj = jnp.asarray(depth), jnp.asarray(feat)
    rb = jnp.asarray(ranks)

    def loss_sorted(d, f):
        out = bev_pool_train(d, f, rb, num_cells, 32, 16)
        return jnp.sum(out * out), out

    def loss_dense(d, f):
        out = bev_pool_dense(d, f, rb.reshape(d.shape), num_cells)
        return jnp.sum(out * out), out

    (ls, outs), gs = jax.value_and_grad(loss_sorted, (0, 1), has_aux=True)(
        dj, fj
    )
    (ld, outd), gd = jax.value_and_grad(loss_dense, (0, 1), has_aux=True)(
        dj, fj
    )
    np.testing.assert_allclose(np.asarray(outs), np.asarray(outd),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(ls), float(ld), rtol=1e-5)
    for a, b in zip(gs, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_bev_pool_train_batched_combined_ranks():
    """One sort over the batch (per-sample rank offsets) == per-sample
    dense pooling — the exact combined-rank-space form the view
    transformer's 'sorted' train path uses."""
    rng = np.random.default_rng(5)
    b, num_cells = 3, 256
    cases = [_case(rng, num_cells=num_cells) for _ in range(b)]
    depth = np.stack([c_[0] for c_ in cases])   # [B, N, D, Hf, Wf]
    feat = np.stack([c_[1] for c_ in cases])
    ranks = np.stack([c_[2] for c_ in cases])   # [B, P]
    n, d, hf, wf = depth.shape[1:]
    c = feat.shape[-1]
    rk = jnp.asarray(ranks)
    rk_c = jnp.where(
        rk < num_cells,
        jnp.arange(b, dtype=jnp.int32)[:, None] * num_cells + rk,
        b * num_cells,
    ).reshape(-1)
    out = bev_pool_train(
        jnp.asarray(depth).reshape(b * n, d, hf, wf),
        jnp.asarray(feat).reshape(b * n, hf, wf, c),
        rk_c, b * num_cells, 32, 16,
    ).reshape(b, num_cells, c)
    oracle = jnp.stack([
        bev_pool_dense(
            jnp.asarray(depth[i]), jnp.asarray(feat[i]),
            rk[i].reshape(depth[i].shape), num_cells,
        )
        for i in range(b)
    ])
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(oracle), rtol=1e-5, atol=1e-5
    )


def test_static_capacity_meta_matches_dense_oracle():
    """capacity_chunks padding (the train-path static shape) must not
    change the pooled result; padded chunks accumulate zeros."""
    rng = np.random.default_rng(6)
    num_cells = 256
    depth, feat, ranks, rf = _case(rng, num_cells=num_cells)
    base = precompute_pool_meta(
        ranks, rf, num_cells, depth_bins=depth.shape[1],
        hw=depth.shape[2] * depth.shape[3], cells_per_tile=32, chunk=16,
    )
    cap = base.chunk_tile.shape[0] + 5
    meta = precompute_pool_meta(
        ranks, rf, num_cells, depth_bins=depth.shape[1],
        hw=depth.shape[2] * depth.shape[3], cells_per_tile=32, chunk=16,
        capacity_chunks=cap,
    )
    assert meta.chunk_tile.shape[0] == cap
    oracle = bev_pool_dense(
        jnp.asarray(depth), jnp.asarray(feat),
        jnp.asarray(ranks).reshape(depth.shape), num_cells,
    )
    out = bev_pool_accel(
        jnp.asarray(depth), jnp.asarray(feat), meta, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(oracle), rtol=1e-5, atol=1e-5
    )


def test_capacity_overflow_drop_trims_fullest_tiles():
    """on_overflow='drop': the table fits the capacity and the pooled
    result differs from the oracle only on the trimmed tiles."""
    rng = np.random.default_rng(7)
    num_cells = 256
    depth, feat, ranks, rf = _case(rng, n=2, d=8, hf=8, wf=8,
                                   num_cells=num_cells, trash_frac=0.0)
    kw = dict(depth_bins=depth.shape[1],
              hw=depth.shape[2] * depth.shape[3],
              cells_per_tile=32, chunk=16)
    base = precompute_pool_meta(ranks, rf, num_cells, **kw)
    full = base.chunk_tile.shape[0]
    cap = full - 3
    import pytest

    with pytest.raises(ValueError):
        precompute_pool_meta(ranks, rf, num_cells, capacity_chunks=cap, **kw)
    meta = precompute_pool_meta(
        ranks, rf, num_cells, capacity_chunks=cap, on_overflow="drop", **kw
    )
    assert meta.chunk_tile.shape[0] == cap
    p_total = ranks.shape[0]
    kept = np.zeros(p_total, bool)
    perm = np.asarray(meta.perm)
    kept[perm[perm < p_total]] = True
    assert kept.sum() < (ranks < num_cells).sum()  # something was dropped
    # pooled == dense oracle over the KEPT points only
    ranks_kept = np.where(kept, ranks, num_cells).astype(np.int32)
    oracle = bev_pool_dense(
        jnp.asarray(depth), jnp.asarray(feat),
        jnp.asarray(ranks_kept).reshape(depth.shape), num_cells,
    )
    out = bev_pool_accel(
        jnp.asarray(depth), jnp.asarray(feat), meta, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(oracle), rtol=1e-5, atol=1e-5
    )


def test_accel_train_host_meta_forward_and_grads_match_dense():
    """bev_pool_accel_train (loader-meta fwd + dense-formula bwd) ==
    dense oracle for value AND gradients."""
    from rcbevdet_tpu.ops.bev_pool_accel import (
        bev_pool_accel_train, pool_meta_capacity,
    )

    rng = np.random.default_rng(8)
    num_cells = 256
    depth, feat, ranks, rf = _case(rng, num_cells=num_cells)
    cap = pool_meta_capacity(num_cells, ranks.shape[0], 32, 16)
    meta = precompute_pool_meta(
        ranks, rf, num_cells, depth_bins=depth.shape[1],
        hw=depth.shape[2] * depth.shape[3], cells_per_tile=32, chunk=16,
        capacity_chunks=cap, numpy=True,
    )
    dj, fj = jnp.asarray(depth), jnp.asarray(feat)
    rb = jnp.asarray(ranks)
    tables = (jnp.asarray(meta.perm), jnp.asarray(meta.local_cell),
              jnp.asarray(meta.chunk_tile))

    def loss_accel(d, f):
        out = bev_pool_accel_train(d, f, *tables, rb, num_cells, 32)
        return jnp.sum(out * out), out

    def loss_dense(d, f):
        out = bev_pool_dense(d, f, rb.reshape(d.shape), num_cells)
        return jnp.sum(out * out), out

    (la, outa), ga = jax.value_and_grad(loss_accel, (0, 1), has_aux=True)(
        dj, fj
    )
    (ld, outd), gd = jax.value_and_grad(loss_dense, (0, 1), has_aux=True)(
        dj, fj
    )
    np.testing.assert_allclose(np.asarray(outa), np.asarray(outd),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(la), float(ld), rtol=1e-5)
    for a, b in zip(ga, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_host_ranks_match_device_ranks():
    """_frustum_ranks_np (loader, float64) vs bev_pool_ranks (in-graph,
    f32) on a realistic-ish rig: cell assignments agree except possibly
    a vanishing fraction of exact-boundary points."""
    from rcbevdet_tpu.models.view_transformer import (
        _frustum_ranks_np, create_frustum, frustum_to_ego,
    )
    from rcbevdet_tpu.ops.bev_pool import bev_pool_ranks

    rng = np.random.default_rng(9)
    gc = {
        "x": (-8.0, 8.0, 0.4), "y": (-8.0, 8.0, 0.4),
        "z": (-5.0, 3.0, 8.0), "depth": (1.0, 9.0, 0.5),
    }
    input_size, downsample = (64, 176), 16
    n = 3
    s2k = np.broadcast_to(np.eye(4, dtype=np.float32), (n, 4, 4)).copy()
    for i in range(n):
        a = 2 * np.pi * i / n + 0.1
        # camera looks outward along heading a: standard cam-to-ego with
        # z_cam horizontal
        rot = np.array(
            [[np.cos(a), 0, np.sin(a)], [np.sin(a), 0, -np.cos(a)],
             [0, -1, 0]], np.float32,
        )
        s2k[i, :3, :3] = rot
        s2k[i, :3, 3] = rng.standard_normal(3) * 0.5
    intr = np.broadcast_to(np.eye(3, dtype=np.float32), (n, 3, 3)).copy()
    intr[:, 0, 0] = intr[:, 1, 1] = 120.0
    intr[:, 0, 2], intr[:, 1, 2] = 88.0, 32.0
    post_rots = np.broadcast_to(
        np.eye(3, dtype=np.float32), (n, 3, 3)
    ).copy() * 0.98
    post_rots[:, 2, 2] = 1.0
    post_trans = rng.standard_normal((n, 3)).astype(np.float32) * 2.0
    post_trans[:, 2] = 0.0
    th = 0.2
    bda = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0],
         [0, 0, 1]], np.float32,
    )
    host = _frustum_ranks_np(
        gc, input_size, downsample, s2k, intr, post_rots, post_trans, bda
    )
    frustum = create_frustum(gc["depth"], input_size, downsample)
    coor = frustum_to_ego(
        frustum, jnp.asarray(s2k)[None], jnp.asarray(intr)[None],
        jnp.asarray(post_rots)[None], jnp.asarray(post_trans)[None],
        jnp.asarray(bda)[None],
    )
    nx, ny, nz = 40, 40, 1
    dev = np.asarray(bev_pool_ranks(
        coor, (gc["x"][0], gc["y"][0], gc["z"][0]),
        (gc["x"][2], gc["y"][2], gc["z"][2]), (nx, ny, nz),
    )).reshape(-1)
    assert host.shape == dev.shape
    agree = np.mean(host == dev)
    assert agree > 0.999, f"host/device rank agreement {agree}"
    # sanity: the rig actually puts a healthy fraction in range
    assert np.mean(host < nx * ny * nz) > 0.2


def test_device_meta_all_invalid_and_jit():
    """All-trash sample pools to zeros; the builder works under jit."""
    rng = np.random.default_rng(4)
    num_cells = 128
    depth, feat, ranks, _ = _case(rng, num_cells=num_cells)
    ranks = np.full_like(ranks, num_cells)

    @jax.jit
    def run(d, f, r):
        return bev_pool_train(d, f, r, num_cells, 32, 16)

    out = np.asarray(run(jnp.asarray(depth), jnp.asarray(feat),
                         jnp.asarray(ranks)))
    assert out.shape == (num_cells, feat.shape[-1])
    assert np.all(out == 0.0)

