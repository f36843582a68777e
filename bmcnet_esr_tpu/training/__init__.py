"""Training engine: optimizers, BPTT train step, iteration-based trainer."""

from bmcnet_esr_tpu.training.optim import (
    build_optimizer,
    exponential_decay_with_floor,
    OPTIMIZER_REGISTRY,
    SCHEDULE_REGISTRY,
)
from bmcnet_esr_tpu.training.train_step import (
    TrainState,
    make_train_step,
    make_eval_step,
    sequence_loss,
)
from bmcnet_esr_tpu.training.trainer import Trainer

__all__ = [
    "build_optimizer",
    "exponential_decay_with_floor",
    "OPTIMIZER_REGISTRY",
    "SCHEDULE_REGISTRY",
    "TrainState",
    "make_train_step",
    "make_eval_step",
    "sequence_loss",
    "Trainer",
]
