"""Eve: AdamW with target-rms-gated weight decay.

Parity: ref /root/reference/valle/modules/optim.py:836-985 — the weight decay
multiplier ``(1 - weight_decay)`` is applied only while the parameter's norm
exceeds ``target_rms * sqrt(numel)``, and only for non-scalar parameters.

Like ScaledAdam (scaled_adam.py), the reference holds each layer's tensors
separately while our ``nn.scan`` stacks them along dim 0 — so the decay gate
must be evaluated PER SLICE of a stacked leaf, not once for the whole stack
(``batched_axis_fn``, same predicate contract as scaled_adam; a 1-D batched
leaf is a batch of scalars and is never decayed, ref :938).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class EveState(NamedTuple):
    step: jnp.ndarray
    exp_avg: Any
    exp_avg_sq: Any


def eve(
    learning_rate: float | optax.Schedule = 1e-3,
    betas=(0.9, 0.98),
    eps: float = 1e-8,
    weight_decay: float = 1e-3,
    target_rms: float = 0.1,
    batched_axis_fn: Optional[Callable[[tuple], bool]] = None,
) -> optax.GradientTransformationExtraArgs:
    from valle_tpu.optim.scaled_adam import _path_strs

    beta1, beta2 = betas

    def init_fn(params):
        z = lambda p: jnp.zeros_like(p, jnp.float32)
        return EveState(
            step=jnp.zeros((), jnp.int32),
            exp_avg=jax.tree.map(z, params),
            exp_avg_sq=jax.tree.map(z, params),
        )

    def update_fn(grads, state, params=None, *, lr=None, **extra):
        del extra
        assert params is not None
        step = state.step + 1  # reference increments before use
        if lr is None:
            lr = learning_rate(state.step) if callable(learning_rate) else learning_rate
        lr = jnp.asarray(lr, jnp.float32)
        bc1 = 1 - beta1 ** step.astype(jnp.float32)
        bc2 = 1 - beta2 ** step.astype(jnp.float32)

        def one(path, p, g, m, v):
            batched = (
                batched_axis_fn is not None
                and batched_axis_fn(_path_strs(path))
            )
            p32 = p.astype(jnp.float32)
            g32 = g.astype(jnp.float32)
            m = beta1 * m + (1 - beta1) * g32
            v = beta2 * v + (1 - beta2) * g32 * g32
            denom = jnp.sqrt(v) * (bc2**-0.5) + eps
            step_size = lr / bc1
            scalar = p.size == 1 or (batched and p.ndim == 1)
            if scalar:
                new_p = p32
            elif batched:
                # per-slice gate: each dim-0 slice is a separate tensor in
                # the reference (its own norm and numel)
                red = tuple(range(1, p.ndim))
                numel = p[0].size
                norms = jnp.sqrt(jnp.sum(p32**2, axis=red, keepdims=True))
                above = norms > (target_rms * (numel**0.5))
                new_p = p32 * (1 - weight_decay * above.astype(jnp.float32))
            else:
                above = jnp.linalg.norm(p32) > (target_rms * (p.size**0.5))
                new_p = p32 * (1 - weight_decay * above.astype(jnp.float32))
            new_p = new_p - step_size * m / denom
            return (new_p - p32).astype(p.dtype), m, v

        out = jax.tree_util.tree_map_with_path(
            one, params, grads, state.exp_avg, state.exp_avg_sq
        )
        treedef = jax.tree.structure(params)
        leaves = treedef.flatten_up_to(out)
        updates = treedef.unflatten([l[0] for l in leaves])
        new_state = EveState(
            step=step,
            exp_avg=treedef.unflatten([l[1] for l in leaves]),
            exp_avg_sq=treedef.unflatten([l[2] for l in leaves]),
        )
        return updates, new_state

    return optax.GradientTransformationExtraArgs(init_fn, update_fn)
