from surface_vision_transformers_tpu.train.losses import (
    get_loss_fn,
    weighted_l1,
    weighted_mse,
)
from surface_vision_transformers_tpu.train.optim import (
    build_optimizer,
    build_schedule,
)
from surface_vision_transformers_tpu.train.trainer import (
    EpochMetrics,
    Trainer,
    TrainState,
)
from surface_vision_transformers_tpu.train import runner

__all__ = [
    "EpochMetrics",
    "Trainer",
    "TrainState",
    "build_optimizer",
    "build_schedule",
    "get_loss_fn",
    "runner",
    "weighted_l1",
    "weighted_mse",
]
