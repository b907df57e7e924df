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
