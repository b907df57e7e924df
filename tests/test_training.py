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


def test_bf16_frozen_camera_loss_curve_matches_f32():
    """train_camera_dtype='bfloat16' (ROADMAP r5 lever 2): the frozen
    camera branch's bf16 forward must track the f32 loss curve closely —
    same trainable-gradient direction, per-step total loss within ~2%.
    The reference trains f32 with frozen camera semantics
    (bevdet_rc.py:551-580); the A/B here is the validation VERDICT r4
    asked for (synthetic data, shared init and batch)."""
    import dataclasses
    import sys
    import os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_models import tiny_batch, tiny_config

    from rcbevdet_tpu.models import RCBEVDet
    from rcbevdet_tpu.training.train_step import (
        create_train_state, make_optimizer, make_train_step,
    )

    cfg32 = tiny_config(use_radar=True, freeze_img=True)
    cfg16 = dataclasses.replace(cfg32, train_camera_dtype="bfloat16")
    model = RCBEVDet(cfg32)
    rng = np.random.default_rng(11)
    batch = tiny_batch(rng, cfg32)
    heat = np.zeros((1, 10, 16, 16), np.float32)
    heat[0, 3, 8, 8] = 1.0
    batch["heatmap_t"] = jnp.asarray(heat)
    batch["anno_box_t"] = jnp.zeros((1, 100, 10))
    inds = np.zeros((1, 100), np.int32)
    inds[0, 0] = 8 * 16 + 8
    batch["inds_t"] = jnp.asarray(inds)
    batch["mask_t"] = jnp.zeros((1, 100)).at[0, 0].set(1.0)
    gt_depth = np.zeros((1, 2, 64, 176), np.float32)
    gt_depth[0, :, ::7, ::11] = 5.0
    batch["gt_depth"] = jnp.asarray(gt_depth)

    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    tx = make_optimizer(total_steps=10, freeze_img=True,
                        params=variables["params"])

    def run(cfg, n=3):
        step = make_train_step(model, tx, cfg)
        state = create_train_state(model, variables, tx)
        losses, grad_norms = [], []
        for _ in range(n):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
            grad_norms.append(float(metrics["grad_norm"]))
        return losses, grad_norms

    l32, g32 = run(cfg32)
    l16, g16 = run(cfg16)
    assert all(np.isfinite(l16)) and all(np.isfinite(l32))
    # step 0 = pure forward-precision effect: tight
    assert abs(l16[0] - l32[0]) / l32[0] < 2e-2, (l16, l32)
    # random-init logit losses make the grad norm hypersensitive to the
    # forward precision (real runs start from a pretrained camera); just
    # require the same ballpark
    assert abs(g16[0] - g32[0]) / g32[0] < 0.25, (g16, g32)
    # after updates the trajectories compound the tiny forward difference;
    # they must still TRACK (same descent, same ballpark)
    assert l32[-1] < l32[0] and l16[-1] < l16[0]
    for a, b in zip(l16[1:], l32[1:]):
        assert abs(a - b) / b < 0.15, (l16, l32)
