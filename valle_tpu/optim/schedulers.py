"""Learning-rate schedules: Eden, Noam, Cosine.

Parity: Eden (ref /root/reference/valle/modules/optim.py:759-806) —
  lr = base_lr * ((batch^2+B^2)/B^2)^-0.25 * ((epoch^2+E^2)/E^2)^-0.25 * warmup
with warmup rising linearly 0.5 -> 1 over ``warmup_batches``.
Noam (ref valle/modules/scheduler.py:23-55).  ``get_scheduler`` mirrors
ref scheduler.py:58-78 defaults (Eden(5000, 4)).
"""

from __future__ import annotations

import jax.numpy as jnp


def eden_lr(
    base_lr,
    batch,
    epoch,
    lr_batches: float = 5000.0,
    lr_epochs: float = 4.0,
    warmup_batches: float = 500.0,
):
    batch = jnp.asarray(batch, jnp.float32)
    epoch = jnp.asarray(epoch, jnp.float32)
    factor = ((batch**2 + lr_batches**2) / lr_batches**2) ** -0.25 * (
        (epoch**2 + lr_epochs**2) / lr_epochs**2
    ) ** -0.25
    warmup = jnp.where(
        batch >= warmup_batches, 1.0, 0.5 + 0.5 * (batch / warmup_batches)
    )
    return base_lr * factor * warmup


def noam_lr(base_lr, step, dim_embed: int, warmup_steps: float):
    step = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
    return (
        base_lr
        * dim_embed**-0.5
        * jnp.minimum(step**-0.5, step * warmup_steps**-1.5)
    )


def cosine_lr(base_lr, step, total_steps, eta_min: float = 0.0):
    step = jnp.asarray(step, jnp.float32)
    t = jnp.clip(step / total_steps, 0.0, 1.0)
    return eta_min + (base_lr - eta_min) * 0.5 * (1 + jnp.cos(jnp.pi * t))


def get_lr_fn(scheduler_name: str, base_lr: float, *, decoder_dim: int = 1024,
              warmup_steps: float = 200.0, total_steps: float = 1e6):
    """Returns lr(batch, epoch) mirroring ref scheduler.py:58-78."""
    name = scheduler_name.lower()
    if name == "eden":
        return lambda batch, epoch: eden_lr(
            base_lr, batch, epoch, 5000.0, 4.0, warmup_steps
        )
    if name == "noam":
        return lambda batch, epoch: noam_lr(base_lr, batch, decoder_dim, warmup_steps)
    if name == "cosine":
        return lambda batch, epoch: cosine_lr(base_lr, batch, total_steps)
    raise NotImplementedError(scheduler_name)
