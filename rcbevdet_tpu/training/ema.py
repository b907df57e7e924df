"""Exponential moving average of parameters.

Mirrors the reference ``MEGVIIEMAHook`` (core/hook/ema.py:44,63): effective
decay = 0.999 * (1 - exp(-updates / 2000)), updated after every train iter;
the RC config warm-starts the ramp with init_updates=10560
(rcbevdet-...py:350-355).  EMA weights are the ones evaluated/released.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_decay_schedule(updates, base_decay=0.999, ramp=2000.0):
    return base_decay * (1.0 - jnp.exp(-updates / ramp))


def update_ema(ema_params, params, updates, base_decay=0.999, ramp=2000.0):
    """ema = d * ema + (1 - d) * params with the ramped decay.

    ``updates`` is the POST-increment counter: the reference increments
    self.updates before computing the decay (core/hook/ema.py:56-63), so the
    caller passes ``state.ema_updates + 1``.
    """
    d = ema_decay_schedule(updates.astype(jnp.float32), base_decay, ramp)
    return jax.tree_util.tree_map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), ema_params, params
    )
