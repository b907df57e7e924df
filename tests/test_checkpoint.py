"""Orbax checkpoint round-trip + latest-checkpoint discovery."""

import os

import jax.numpy as jnp
import numpy as np
import optax

from rcbevdet_tpu.training.checkpoint import (
    find_latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from rcbevdet_tpu.training.train_step import TrainState


def _tiny_state(value):
    params = {"w": jnp.full((3,), value)}
    tx = optax.sgd(0.1)
    return TrainState(
        params=params,
        batch_stats={"bn": {"mean": jnp.zeros(3)}},
        opt_state=tx.init(params),
        ema_params=params,
        ema_batch_stats={"bn": {"mean": jnp.zeros(3)}},
        step=jnp.asarray(5, jnp.int32),
        ema_updates=jnp.asarray(100, jnp.int32),
    )


def test_checkpoint_roundtrip(tmp_path):
    state = _tiny_state(2.0)
    path = os.path.join(tmp_path, "epoch_3")
    save_checkpoint(path, state)
    restored = restore_checkpoint(path, _tiny_state(0.0))
    np.testing.assert_allclose(np.asarray(restored.params["w"]), 2.0)
    assert int(restored.step) == 5
    assert int(restored.ema_updates) == 100


def test_find_latest(tmp_path):
    assert find_latest_checkpoint(str(tmp_path)) is None
    for e in (1, 3, 2):
        os.makedirs(tmp_path / f"epoch_{e}")
    os.makedirs(tmp_path / "not_a_ckpt")
    latest = find_latest_checkpoint(str(tmp_path))
    assert latest.endswith("epoch_3")
