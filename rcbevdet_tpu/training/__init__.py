from .schedules import cyclic_schedule, cyclic_lr, cyclic_momentum
from .ema import ema_decay_schedule, update_ema
from .train_step import TrainState, create_train_state, make_train_step, make_optimizer

__all__ = [
    "cyclic_schedule",
    "cyclic_lr",
    "cyclic_momentum",
    "ema_decay_schedule",
    "update_ema",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_optimizer",
]
