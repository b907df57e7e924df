"""BEVStereo4D: temporal-stereo cost volume path."""

import jax
import jax.numpy as jnp
import numpy as np

from rcbevdet_tpu.models import RCBEVDet
from rcbevdet_tpu.models.view_transformer import (
    create_frustum,
    stereo_cost_volume,
    stereo_sample_grid,
)
from tests.test_models import tiny_config


def test_stereo_grid_identity_transform(rng):
    """With identity k2s (same pose), each frustum point projects back to
    its own pixel."""
    frustum = create_frustum((1.0, 9.0, 2.0), (64, 176), 4)  # [4, 16, 44, 3]
    b, n = 1, 1
    intr = np.eye(3, dtype=np.float32)[None, None].copy()
    intr[..., 0, 0] = intr[..., 1, 1] = 100.0
    intr[..., 0, 2], intr[..., 1, 2] = 88.0, 32.0
    grid = stereo_sample_grid(
        frustum, jnp.eye(4)[None, None], jnp.asarray(intr),
        jnp.eye(3)[None, None], jnp.zeros((1, 1, 3)), 64, 176,
    )
    # normalized coords must equal frustum pixel coords normalized
    gx = np.asarray(grid[0, 0, 0, :, :, 0])
    expected = np.asarray(frustum[0, :, :, 0]) / (176 - 1) * 2 - 1
    np.testing.assert_allclose(gx, expected, atol=1e-5)


def test_cost_volume_prefers_true_depth(rng):
    """Identical prev/curr features with identity warp -> zero cost
    everywhere -> uniform softmax."""
    bn, h4, w4, c = 2, 8, 8, 4
    d = 5
    feat = jnp.asarray(rng.standard_normal((bn, h4, w4, c)), jnp.float32)
    ys, xs = jnp.meshgrid(jnp.arange(h4), jnp.arange(w4), indexing="ij")
    gx = xs / (w4 - 1) * 2 - 1
    gy = ys / (h4 - 1) * 2 - 1
    grid = jnp.broadcast_to(
        jnp.stack([gx, gy], -1)[None, None], (bn, d, h4, w4, 2)
    )
    cv = stereo_cost_volume(feat, feat, grid)
    np.testing.assert_allclose(np.asarray(cv), 1.0 / d, atol=1e-5)


def test_stereo_model_forward(rng):
    import dataclasses

    cfg = dataclasses.replace(tiny_config(use_radar=False, freeze_img=False),
                              stereo=True)
    model = RCBEVDet(cfg)
    b, n = 1, 2
    f_total = cfg.num_frames + 1  # extra stereo ref frame
    h, w = cfg.input_size
    eye4 = np.broadcast_to(np.eye(4, dtype=np.float32), (b, f_total, n, 4, 4))
    intr = np.broadcast_to(np.eye(3, dtype=np.float32), (b, f_total, n, 3, 3)).copy()
    intr[..., 0, 0] = intr[..., 1, 1] = 100.0
    intr[..., 0, 2], intr[..., 1, 2] = w / 2, h / 2
    batch = {
        "imgs": jnp.asarray(
            rng.standard_normal((b, f_total, n, h, w, 3)), jnp.float32
        ),
        "sensor2keyegos": jnp.asarray(eye4),
        "intrins": jnp.asarray(intr),
        "post_rots": jnp.asarray(
            np.broadcast_to(np.eye(3, dtype=np.float32), (b, f_total, n, 3, 3))
        ),
        "post_trans": jnp.zeros((b, f_total, n, 3)),
        "bda": jnp.asarray(np.broadcast_to(np.eye(3, dtype=np.float32), (b, 3, 3))),
        "k2s_sensor": jnp.asarray(
            np.broadcast_to(np.eye(4, dtype=np.float32), (b, f_total - 1, n, 4, 4))
        ),
    }
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    preds, depth = model.apply(variables, batch, train=False)
    assert preds["heatmap"].shape == (1, 16, 16, 10)
    assert depth.shape == (1, 2, 4, 11, 16)
    assert np.isfinite(np.asarray(preds["heatmap"])).all()
    # stereo-specific parameters exist
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    names = ["/".join(str(p) for p in path) for path, _ in flat]
    assert any("cv_conv0" in s for s in names)


def test_stereo_dataset_k2s():
    from rcbevdet_tpu.data.synthetic import synthetic_sample

    sample, ds = synthetic_sample(num_adj=1, stereo=True)
    # key + 1 adj + 1 extra ref
    assert sample["imgs"].shape[0] == 3
    assert sample["k2s_sensor"].shape == (2, 6, 4, 4)
    assert np.isfinite(sample["k2s_sensor"]).all()
