from .ema import ExponentialMovingAverage
from .optim import build_optimizer, cosine_warmup_schedule
from .trainer import Trainer, TrainState

__all__ = [
    "ExponentialMovingAverage",
    "build_optimizer",
    "cosine_warmup_schedule",
    "Trainer",
    "TrainState",
]
