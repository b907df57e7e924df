"""HoP auxiliary training: reconstruction decoder + aux head + losses."""

import jax
import jax.numpy as jnp
import numpy as np

from rcbevdet_tpu.models.hop import HoPTemporalPredictor
from rcbevdet_tpu.models.centerpoint_head import centerpoint_loss


def test_hop_predictor_shapes(rng):
    model = HoPTemporalPredictor(
        in_channels=8, embed_dims=16, out_channels=32, reduction=4,
        num_heads_short=2, num_heads_long=2,
    )
    frames = jnp.asarray(rng.standard_normal((2, 3, 8, 8, 8)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), frames)
    out = model.apply(variables, frames)
    assert out.shape == (2, 8, 8, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_hop_gradients_flow(rng):
    model = HoPTemporalPredictor(
        in_channels=8, embed_dims=16, out_channels=32, reduction=4,
        num_heads_short=2, num_heads_long=2,
    )
    frames = jnp.asarray(rng.standard_normal((1, 3, 8, 8, 8)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), frames)

    def loss(params, frames):
        out = model.apply({"params": params}, frames)
        return jnp.sum(out**2)

    g_params, g_frames = jax.grad(loss, argnums=(0, 1))(
        variables["params"], frames
    )
    total = sum(
        float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(g_params)
    )
    assert total > 0
    assert float(jnp.abs(g_frames).sum()) > 0


def test_hop_dataset_targets():
    from rcbevdet_tpu.data.synthetic import synthetic_sample

    sample, _ = synthetic_sample(num_adj=2, with_hop_targets=True)
    assert sample["aux_heatmap_t"].shape == (10, 128, 128)
    assert sample["aux_inds_t"].shape == (500,)
    # aux losses compute on the rendered targets
    h, w = 128, 128
    preds = {
        "heatmap": jnp.zeros((1, h, w, 10)),
        "reg": jnp.zeros((1, h, w, 2)),
        "height": jnp.zeros((1, h, w, 1)),
        "dim": jnp.zeros((1, h, w, 3)),
        "rot": jnp.zeros((1, h, w, 2)),
        "vel": jnp.zeros((1, h, w, 2)),
    }
    losses = centerpoint_loss(
        preds,
        jnp.asarray(sample["aux_heatmap_t"])[None],
        jnp.asarray(sample["aux_anno_box_t"])[None],
        jnp.asarray(sample["aux_inds_t"])[None],
        jnp.asarray(sample["aux_mask_t"])[None],
        cls_weight=0.5, bbox_weight=0.125,
    )
    for v in losses.values():
        assert np.isfinite(float(v))
