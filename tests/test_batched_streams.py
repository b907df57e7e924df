"""Batched-stream serving correctness (tiny config, CPU).

The cached-sequential step over N INDEPENDENT streams must decode each
stream exactly as the single-stream step does — this pins the per-stream
deform-attn gather unroll, the unrolled pillar scatters, and the shared
accelerate-mode pool table (ops/deform_attn.py, models/pillar_scatter.py,
models/view_transformer.py).  Reference analog: none (the torch model is
only ever served at B=1); semantics follow benchmark_sequential.py's
cached-prev-BEV path batched over vehicles.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rcbevdet_tpu.models import RCBEVDet

from tests.test_models import tiny_batch, tiny_config


def _key_batch(batch):
    return {
        k: (v[:, 0:1] if k in ("imgs", "sensor2keyegos", "intrins",
                               "post_rots", "post_trans") else v)
        for k, v in batch.items()
    }


def test_two_identical_streams_match_single_stream():
    cfg = tiny_config(use_radar=True)
    model = RCBEVDet(cfg)
    rng = np.random.default_rng(3)
    b1 = tiny_batch(rng, cfg, b=1)
    variables = model.init(jax.random.PRNGKey(0), b1, train=False)

    kb1 = _key_batch(b1)
    kb2 = {k: jnp.concatenate([v, v], axis=0) for k, v in kb1.items()}
    ny = nx = cfg.bev_size
    prev1 = jnp.asarray(
        np.random.default_rng(4).standard_normal(
            (1, cfg.num_adj, ny, nx, cfg.num_trans_channels)
        ),
        jnp.float32,
    )
    prev2 = jnp.concatenate([prev1, prev1], axis=0)
    s2k1 = jnp.asarray(b1["sensor2keyegos"][:, 1:])
    s2k2 = jnp.concatenate([s2k1, s2k1], axis=0)

    from rcbevdet_tpu.models.view_transformer import precompute_lss_pool_meta

    pool_meta = precompute_lss_pool_meta(
        cfg.grid_config, cfg.input_size, cfg.downsample,
        b1["sensor2keyegos"][0, 0], b1["intrins"][0, 0],
        b1["post_rots"][0, 0], b1["post_trans"][0, 0], b1["bda"][0],
    )

    for meta in (None, pool_meta):
        preds1, key_bev1 = model.apply(
            variables, kb1, prev1, s2k1, meta,
            method=RCBEVDet.forward_cached,
        )
        preds2, key_bev2 = model.apply(
            variables, kb2, prev2, s2k2, meta,
            method=RCBEVDet.forward_cached,
        )
        np.testing.assert_allclose(
            np.asarray(key_bev2[0]), np.asarray(key_bev1[0]),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(key_bev2[1]), np.asarray(key_bev2[0]),
            rtol=1e-6, atol=1e-6,
        )
        h1 = np.asarray(preds1["heatmap"])
        h2 = np.asarray(preds2["heatmap"])
        np.testing.assert_allclose(h2[0], h1[0], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(h2[1], h2[0], rtol=1e-6, atol=1e-6)


def test_stream_server_roll_and_reset():
    """StreamServer: jitted capacity-S step, device cache roll, host NMS,
    and per-slot reset (rcbevdet_tpu/serving.py)."""
    from rcbevdet_tpu.serving import StreamServer

    cfg = tiny_config(use_radar=True)
    model = RCBEVDet(cfg)
    rng = np.random.default_rng(7)
    b1 = tiny_batch(rng, cfg, b=1)
    variables = model.init(jax.random.PRNGKey(0), b1, train=False)

    test_cfg = dict(
        pc_range=(-8.0, -8.0), voxel_size=(0.125, 0.125),
        out_size_factor=8,
        post_center_range=(-10.0, -10.0, -10.0, 10.0, 10.0, 10.0),
        max_num=50, score_threshold=0.0, nms_type="rotate", nms_thr=0.2,
        nms_rescale_factor=(1.0,) * 10, pre_max_size=100,
        post_max_size=50, min_radius=(4, 12, 10, 1, 0.85, 0.175),
    )
    srv = StreamServer(model, variables, cfg, n_streams=2,
                       test_cfg=test_cfg)

    kb1 = _key_batch(b1)
    kb = {k: jnp.concatenate([v, v], axis=0) for k, v in kb1.items()}
    s2k = jnp.concatenate(
        [b1["sensor2keyegos"][:, 1:]] * 2, axis=0
    )

    out1 = srv.step(kb, s2k)
    assert len(out1) == 2
    for d in out1:
        assert d["bboxes"].shape[1] == 9
        assert len(d["scores"]) == len(d["labels"]) == len(d["bboxes"])
    # identical streams -> identical detections
    np.testing.assert_allclose(out1[0]["bboxes"], out1[1]["bboxes"],
                               rtol=1e-5, atol=1e-5)
    # the cache rolled: key BEV entered slot 0 of prev_bev (non-zero)
    assert float(jnp.abs(srv.prev_bev[:, 0]).sum()) > 0.0

    # second step with the warm cache still agrees across slots
    out2 = srv.step(kb, s2k)
    np.testing.assert_allclose(out2[0]["bboxes"], out2[1]["bboxes"],
                               rtol=1e-5, atol=1e-5)

    # resetting slot 1 zeroes only its cache
    srv.reset_stream(1)
    assert float(jnp.abs(srv.prev_bev[1]).sum()) == 0.0
    assert float(jnp.abs(srv.prev_bev[0]).sum()) > 0.0


def test_packed_cache_matches_unpacked():
    """forward_cached(packed_cache=True) over pre-packed corner tables ==
    the plain path: head preds identical, and the returned cache entry is
    exactly pack_corners(key_bev)."""
    from rcbevdet_tpu.ops.deform_attn import _pack_corners

    cfg = tiny_config(use_radar=True)
    model = RCBEVDet(cfg)
    rng = np.random.default_rng(9)
    b1 = tiny_batch(rng, cfg, b=1)
    variables = model.init(jax.random.PRNGKey(0), b1, train=False)
    kb = _key_batch(b1)
    ny = nx = cfg.bev_size
    prev = jnp.asarray(
        np.random.default_rng(10).standard_normal(
            (1, cfg.num_adj, ny, nx, cfg.num_trans_channels)
        ),
        jnp.float32,
    )
    s2k = jnp.asarray(b1["sensor2keyegos"][:, 1:])

    preds_u, key_u = model.apply(
        variables, kb, prev, s2k, None, method=RCBEVDet.forward_cached
    )
    prev_packed = _pack_corners(
        prev.reshape(cfg.num_adj, ny, nx, -1)
    ).reshape(1, cfg.num_adj, ny, nx, -1)
    preds_p, cache_p = model.apply(
        variables, kb, prev_packed, s2k, None, True,
        method=RCBEVDet.forward_cached,
    )
    for k in preds_u:
        np.testing.assert_allclose(
            np.asarray(preds_p[k]), np.asarray(preds_u[k]),
            rtol=1e-5, atol=1e-5, err_msg=k,
        )
    np.testing.assert_allclose(
        np.asarray(cache_p), np.asarray(_pack_corners(key_u)),
        rtol=1e-6, atol=1e-6,
    )


def test_circular_cache_ptr_matches_ordered():
    """forward_cached(cache_ptr=p) over a slot-rotated packed cache ==
    the age-ordered packed path: the circular serving cache (one-slot
    dynamic update instead of a full-cache roll) is semantics-preserving."""
    from rcbevdet_tpu.ops.deform_attn import _pack_corners

    cfg = tiny_config(use_radar=True)
    model = RCBEVDet(cfg)
    rng = np.random.default_rng(11)
    b1 = tiny_batch(rng, cfg, b=1)
    variables = model.init(jax.random.PRNGKey(0), b1, train=False)
    kb = _key_batch(b1)
    ny = nx = cfg.bev_size
    f1 = cfg.num_adj
    prev = np.random.default_rng(12).standard_normal(
        (1, f1, ny, nx, cfg.num_trans_channels)).astype(np.float32)
    # distinct per-frame s2k so a mis-paired (table, s2k) would show
    s2k = np.asarray(b1["sensor2keyegos"][:, 1:]).copy()
    s2k[0, :, :, 0, 3] += np.arange(f1)[None] * 0.25
    packed = np.asarray(_pack_corners(jnp.asarray(prev[0])))[None]

    preds_o, _ = model.apply(
        variables, kb, jnp.asarray(packed), jnp.asarray(s2k), None, True,
        method=RCBEVDet.forward_cached,
    )
    for ptr in (0, 1, f1 - 1) if f1 > 1 else (0,):
        ages = np.arange(f1)
        slots = (ptr - 1 - ages) % f1
        rot_packed = np.zeros_like(packed)
        rot_s2k = np.zeros_like(s2k)
        rot_packed[0, slots] = packed[0]
        rot_s2k[0, slots] = s2k[0]
        preds_c, _ = model.apply(
            variables, kb, jnp.asarray(rot_packed), jnp.asarray(rot_s2k),
            None, True, jnp.int32(ptr),
            method=RCBEVDet.forward_cached,
        )
        for k in preds_o:
            np.testing.assert_allclose(
                np.asarray(preds_c[k]), np.asarray(preds_o[k]),
                rtol=1e-5, atol=1e-5, err_msg=f"ptr={ptr} {k}",
            )
