"""Cyclic LR / momentum schedules (optax-style pure functions).

The reference trains with mmcv's CyclicLrUpdater + CyclicMomentumUpdater
(config rcbevdet-...py:336-345): one cycle, cosine annealing, 40% ramp from
base to base*10 then 60% anneal to base*1e-4; momentum mirrors with ratios
(0.8947, 1).
"""

from __future__ import annotations

import jax.numpy as jnp


def _cos_anneal(start, end, t):
    return end + 0.5 * (start - end) * (1.0 + jnp.cos(jnp.pi * t))


def cyclic_schedule(base, total_steps, target_ratio=(10.0, 1e-4), step_ratio_up=0.4):
    """One-cycle cosine schedule: base -> base*r0 -> base*r1."""
    up_steps = int(total_steps * step_ratio_up)
    down_steps = max(total_steps - up_steps, 1)
    r0, r1 = target_ratio

    def schedule(step):
        step = jnp.minimum(step, total_steps - 1)
        in_up = step < up_steps
        t_up = step / jnp.maximum(up_steps, 1)
        t_down = (step - up_steps) / down_steps
        up = _cos_anneal(base, base * r0, t_up)
        down = _cos_anneal(base * r0, base * r1, t_down)
        return jnp.where(in_up, up, down)

    return schedule


def cyclic_lr(base_lr=1e-4, total_steps=1, **kw):
    return cyclic_schedule(base_lr, total_steps, target_ratio=(10.0, 1e-4), **kw)


def cyclic_momentum(base_m=0.9, total_steps=1, **kw):
    return cyclic_schedule(
        base_m, total_steps, target_ratio=(0.8947368421052632, 1.0), **kw
    )
