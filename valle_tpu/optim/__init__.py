from valle_tpu.optim.scaled_adam import (
    scaled_adam,
    ScaledAdamState,
    valle_batched_axis,
)
from valle_tpu.optim.eve import eve, EveState
from valle_tpu.optim.schedulers import eden_lr, noam_lr, cosine_lr, get_lr_fn

__all__ = [
    "scaled_adam",
    "ScaledAdamState",
    "valle_batched_axis",
    "eve",
    "EveState",
    "eden_lr",
    "noam_lr",
    "cosine_lr",
    "get_lr_fn",
]
