"""Checkpointing via orbax.

The counterpart of mmcv's CheckpointHook + resume machinery (reference
apis/train.py:315-320, core/hook/ema.py:103-116): checkpoints carry params +
optimizer state + EMA params + step counters in one TrainState pytree; EMA
params are the evaluated/released weights, exactly like the reference's
``epoch_N_ema.pth``.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save_checkpoint(path: str, state) -> None:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, target):
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=target)


def find_latest_checkpoint(work_dir: str) -> Optional[str]:
    """Latest ``epoch_N`` dir in a work dir (reference
    mmdet3d/utils/misc.py:find_latest_checkpoint)."""
    if not os.path.isdir(work_dir):
        return None
    best, best_n = None, -1
    for name in os.listdir(work_dir):
        if name.startswith("epoch_"):
            try:
                n = int(name.split("_")[1])
            except (IndexError, ValueError):
                continue
            if n > best_n:
                best, best_n = os.path.join(work_dir, name), n
    return best
