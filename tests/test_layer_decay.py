"""ViT layer-wise LR decay (LearningRateDecayOptimizerConstructor /
LrDecayControlHook counterpart)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from rcbevdet_tpu.training.train_step import (
    layer_decay_factors,
    make_optimizer,
    scale_updates_by,
)


def _fake_params():
    leaf = lambda: jnp.ones((2,))
    return {
        "camera": {
            "img_backbone": {
                "patch_embed": {"kernel": leaf()},
                "net": {
                    "block0": {"q_proj": {"kernel": leaf()}},
                    "block1": {"q_proj": {"kernel": leaf()}},
                    "block2": {"q_proj": {"kernel": leaf()}},
                },
            },
            "img_neck": {"lateral_0": {"kernel": leaf()}},
        },
        "pts_bbox_head": {"shared_conv": {"kernel": leaf()}},
    }


def test_layer_decay_factors():
    params = _fake_params()
    f = layer_decay_factors(params, decay=0.5)
    # 3 blocks -> n = 3; block i gets 0.5^(3 - i)
    assert f["camera"]["img_backbone"]["net"]["block0"]["q_proj"]["kernel"] \
        == pytest.approx(0.5**3)
    assert f["camera"]["img_backbone"]["net"]["block2"]["q_proj"]["kernel"] \
        == pytest.approx(0.5**1)
    # embeddings below every block
    assert f["camera"]["img_backbone"]["patch_embed"]["kernel"] \
        == pytest.approx(0.5**4)
    # outside the backbone: full LR
    assert f["camera"]["img_neck"]["lateral_0"]["kernel"] == 1.0
    assert f["pts_bbox_head"]["shared_conv"]["kernel"] == 1.0


def test_scale_updates_by():
    factors = {"a": 0.5, "b": 1.0}
    tx = scale_updates_by(factors)
    updates = {"a": jnp.ones((2,)), "b": jnp.ones((2,))}
    state = tx.init(updates)
    out, _ = tx.update(updates, state)
    np.testing.assert_allclose(np.asarray(out["a"]), 0.5)
    np.testing.assert_allclose(np.asarray(out["b"]), 1.0)


def test_optimizer_with_layer_decay_moves_blocks_differently():
    params = _fake_params()
    tx = make_optimizer(
        base_lr=1e-2, total_steps=10, freeze_img=False, params=params,
        layer_decay=0.5,
    )
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    u0 = float(jnp.abs(
        updates["camera"]["img_backbone"]["net"]["block0"]["q_proj"]["kernel"]
    ).mean())
    u2 = float(jnp.abs(
        updates["camera"]["img_backbone"]["net"]["block2"]["q_proj"]["kernel"]
    ).mean())
    uh = float(jnp.abs(
        updates["pts_bbox_head"]["shared_conv"]["kernel"]
    ).mean())
    assert u0 < u2 < uh
    assert u0 == pytest.approx(uh * 0.5**3, rel=1e-3)
