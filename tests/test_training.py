"""Schedules, EMA, optimizer masking."""

import jax
import jax.numpy as jnp
import numpy as np

from rcbevdet_tpu.training.ema import ema_decay_schedule, update_ema
from rcbevdet_tpu.training.schedules import cyclic_lr, cyclic_momentum
from rcbevdet_tpu.training.train_step import frozen_mask, make_optimizer


def test_cyclic_lr_shape():
    total = 1000
    lr = cyclic_lr(1e-4, total)
    assert abs(float(lr(0)) - 1e-4) < 1e-9
    # peak at 40% of steps: base * 10
    np.testing.assert_allclose(float(lr(400)), 1e-3, rtol=1e-3)
    # end anneals toward base * 1e-4
    assert float(lr(total - 1)) < 1e-6
    # monotone up then down
    assert float(lr(200)) > float(lr(0))
    assert float(lr(800)) < float(lr(400))


def test_cyclic_momentum_mirror():
    total = 1000
    m = cyclic_momentum(0.9, total)
    np.testing.assert_allclose(float(m(0)), 0.9, rtol=1e-6)
    np.testing.assert_allclose(float(m(400)), 0.9 * 0.8947368421052632, rtol=1e-4)
    np.testing.assert_allclose(float(m(total - 1)), 0.9, rtol=1e-3)


def test_ema_ramp():
    d0 = float(ema_decay_schedule(jnp.asarray(0.0)))
    d_inf = float(ema_decay_schedule(jnp.asarray(1e9)))
    assert d0 == 0.0
    np.testing.assert_allclose(d_inf, 0.999, rtol=1e-6)
    ema = {"w": jnp.ones(3)}
    params = {"w": jnp.zeros(3)}
    out = update_ema(ema, params, jnp.asarray(2000 * 100))
    np.testing.assert_allclose(np.asarray(out["w"]), 0.999, rtol=1e-5)


def test_frozen_mask_and_optimizer():
    params = {
        "camera": {"w": jnp.ones((2, 2))},
        "img_bev_encoder_neck": {"w": jnp.ones(2)},
        "camf": {"w": jnp.ones(2)},
    }
    mask = frozen_mask(params)
    assert mask["camera"]["w"] is False
    assert mask["img_bev_encoder_neck"]["w"] is False
    assert mask["camf"]["w"] is True

    tx = make_optimizer(total_steps=10, freeze_img=True, params=params)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["camera"]["w"]).sum()) == 0.0
    assert float(jnp.abs(updates["camf"]["w"]).sum()) > 0.0


def test_multihost_helpers_single_process():
    from rcbevdet_tpu.parallel.multihost import host_local_slice

    start, size = host_local_slice(8)
    assert (start, size) == (0, 8)


def test_gradient_accumulation_matches_mean_grad():
    """MultiSteps(cumulative_iters=k) == one apply on the micro-grad mean
    (mmcv GradientCumulativeOptimizerHook's loss/k scaling)."""
    params = {"camf": {"w": jnp.ones(4)}}
    g1 = {"camf": {"w": jnp.asarray([1.0, -2.0, 0.5, 3.0])}}
    g2 = {"camf": {"w": jnp.asarray([0.0, 4.0, -1.0, 1.0])}}

    tx_k = make_optimizer(total_steps=10, freeze_img=False,
                          cumulative_iters=2)
    s = tx_k.init(params)
    p = params
    for g in (g1, g2):
        u, s = tx_k.update(g, s, p)
        p = jax.tree_util.tree_map(lambda x, d: x + d, p, u)
    # first micro-step must be an identity update
    tx_probe = make_optimizer(total_steps=10, freeze_img=False,
                              cumulative_iters=2)
    sp = tx_probe.init(params)
    u1, _ = tx_probe.update(g1, sp, params)
    assert float(jnp.abs(u1["camf"]["w"]).sum()) == 0.0

    tx_1 = make_optimizer(total_steps=10, freeze_img=False)
    s1 = tx_1.init(params)
    gm = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, g1, g2)
    u, _ = tx_1.update(gm, s1, params)
    p_ref = jax.tree_util.tree_map(lambda x, d: x + d, params, u)
    np.testing.assert_allclose(
        np.asarray(p["camf"]["w"]), np.asarray(p_ref["camf"]["w"]),
        rtol=1e-6,
    )
