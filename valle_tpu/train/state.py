"""Training state: params, optimizer state, averaged model, counters."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray  # global batch index (batch_idx_train)
    params: Any
    opt_state: Any
    model_avg: Optional[Any] = None  # running average (ref trainer.py:703-714)
    batch_stats: Optional[Any] = None  # only when add_prenet BatchNorm is on


def stage_prefix(train_stage: int) -> str | None:
    """Parameter-name prefix trained at this stage (ref valle.py:294-320)."""
    return {0: None, 1: "ar_", 2: "nar_"}[train_stage]


def partition_params(params: dict, train_stage: int):
    """Split the top-level param tree into (trainable, frozen) by stage."""
    prefix = stage_prefix(train_stage)
    if prefix is None:
        return params, type(params)()
    train = {k: v for k, v in params.items() if k.startswith(prefix)}
    frozen = {k: v for k, v in params.items() if not k.startswith(prefix)}
    return train, frozen


def merge_params(train: dict, frozen: dict) -> dict:
    out = dict(frozen)
    out.update(train)
    return out


def update_model_avg(model_avg, params, step: jnp.ndarray, average_period: int):
    """Running model average, icefall-style (ref trainer.py:703-714 uses
    icefall.checkpoint.update_averaged_model):
        avg <- avg * (1 - w) + params * w,  w = average_period / batch_idx.
    """
    w = jnp.minimum(
        jnp.asarray(average_period, jnp.float32)
        / jnp.maximum(step.astype(jnp.float32), 1.0),
        1.0,
    )
    return jax.tree.map(
        lambda a, p: a * (1.0 - w) + p.astype(a.dtype) * w, model_avg, params
    )
