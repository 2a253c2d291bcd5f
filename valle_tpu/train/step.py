"""The jitted training step: loss, grads, ScaledAdam update, metrics.

Parity with ref /root/reference/valle/bin/trainer.py:588-760:
  - reduction="sum" loss, no normalization before the optimizer
    (ref trainer.py:672-674)
  - gradients summed over ``accumulate_grad_steps`` micro-batches before one
    optimizer step (ref trainer.py:675-696); expressed as a ``lax.scan`` over
    a leading micro-batch axis so it is one compiled program
  - stage-filtered parameters: only ``ar_*`` / ``nar_*`` subtrees get
    gradients and optimizer state at stages 1/2 (ref valle.py:294-320)
  - global grad-norm clip 1.0 for plain Adam/AdamW only
    (ref trainer.py:687-692)

TPU-first: the step is one ``jax.jit`` program over the device mesh — batch
arrays sharded over the ``data`` axis, params replicated; GSPMD inserts the
gradient all-reduce over ICI (the NCCL-DDP equivalent).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from valle_tpu.train.state import (
    TrainState,
    merge_params,
    partition_params,
    update_model_avg,
)


def make_train_step(
    model,
    tx: optax.GradientTransformationExtraArgs,
    lr_fn: Callable,  # (batch_idx, epoch) -> lr
    *,
    train_stage: int = 0,
    clip_grad_norm: Optional[float] = None,  # 1.0 for Adam/AdamW (ref :687-692)
    average_period: int = 0,  # 0 disables model averaging
    deterministic: bool = False,  # True disables all dropout (tests/debug)
):
    """Returns ``step(state, batch, rng, epoch) -> (state, metrics)``.

    ``batch`` is a dict with a leading micro-batch axis A (A=1 for no
    accumulation): text_tokens (A,B,S), text_tokens_lens (A,B),
    audio_features (A,B,T,Q), audio_features_lens (A,B), and optionally
    prompt_codes (A,B,P,Q) for prefix mode 4.
    """

    def loss_fn(train_params, frozen_params, micro, rngs):
        params = merge_params(train_params, frozen_params)
        kw = {}
        if "prompt_codes" in micro:
            kw["y_prompts_codes"] = micro["prompt_codes"]
        if "example_mask" in micro:
            kw["example_mask"] = micro["example_mask"]
        out = model.apply(
            {"params": params},
            micro["text_tokens"],
            micro["text_tokens_lens"],
            micro["audio_features"],
            micro["audio_features_lens"],
            train_stage=train_stage,
            deterministic=deterministic,
            rngs=rngs,
            **kw,
        )
        return out["loss"], out

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch: dict, rng: jax.Array, epoch: jnp.ndarray):
        train_params, frozen_params = partition_params(state.params, train_stage)

        def micro_step(carry, inp):
            grads_acc, metrics_acc = carry
            micro, key = inp
            k1, k2 = jax.random.split(key)
            (loss, out), grads = grad_fn(
                train_params, frozen_params, micro, {"dropout": k1, "stage": k2}
            )
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            metrics_acc = {
                k: metrics_acc.get(k, 0.0) + out[k] for k in out
            }
            return (grads_acc, metrics_acc), None

        accum = batch["text_tokens"].shape[0]
        keys = jax.random.split(jax.random.fold_in(rng, state.step), accum)
        zeros = jax.tree.map(
            lambda p: jnp.zeros(p.shape, jnp.float32), train_params
        )
        # metric keys depend on the model and train_stage
        metric_names = model.metric_names(train_stage)
        metrics0 = {k: jnp.zeros((), jnp.float32) for k in metric_names}
        (grads, metrics), _ = jax.lax.scan(
            micro_step, (zeros, metrics0), (batch, keys)
        )

        if clip_grad_norm is not None:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, clip_grad_norm / (gnorm + 1e-12))
            grads = jax.tree.map(lambda g: g * scale, grads)

        lr = lr_fn(state.step, epoch)
        updates, new_opt_state = tx.update(
            grads, state.opt_state, train_params, lr=lr
        )
        new_train = jax.tree.map(jnp.add, train_params, updates)
        new_params = merge_params(new_train, frozen_params)

        new_avg = state.model_avg
        if average_period and state.model_avg is not None:
            new_avg = update_model_avg(
                state.model_avg, new_params, state.step + 1, average_period
            )

        metrics["lr"] = jnp.asarray(lr, jnp.float32)
        return (
            state.replace(
                step=state.step + 1,
                params=new_params,
                opt_state=new_opt_state,
                model_avg=new_avg,
            ),
            metrics,
        )

    return step


def make_eval_step(model, *, train_stage: int = 0):
    """Validation loss/metrics (ref trainer.py:550-585), deterministic
    except the NAR stage draw which uses the provided rng."""

    @jax.jit
    def eval_step(params, batch, rng):
        kw = {}
        if "prompt_codes" in batch:
            kw["y_prompts_codes"] = batch["prompt_codes"]
        if "example_mask" in batch:
            kw["example_mask"] = batch["example_mask"]
        out = model.apply(
            {"params": params},
            batch["text_tokens"],
            batch["text_tokens_lens"],
            batch["audio_features"],
            batch["audio_features_lens"],
            train_stage=train_stage,
            deterministic=True,
            rngs={"stage": rng},
            **kw,
        )
        return out

    return eval_step


def init_train_state(
    model,
    tx,
    rng: jax.Array,
    example_batch: dict,
    *,
    train_stage: int = 0,
    with_model_avg: bool = False,
) -> TrainState:
    """Initialize params + optimizer state (optimizer sees only the
    stage-trainable subtree, like the reference building ScaledAdam over
    stage_parameters, ref trainer.py:938-975)."""
    kw = {}
    if "prompt_codes" in example_batch:
        kw["y_prompts_codes"] = example_batch["prompt_codes"]
    variables = model.init(
        {"params": rng, "dropout": rng, "stage": rng},
        example_batch["text_tokens"],
        example_batch["text_tokens_lens"],
        example_batch["audio_features"],
        example_batch["audio_features_lens"],
        train_stage=0,
        deterministic=True,
        nar_stage=jnp.asarray(1) if model.cfg.num_quantizers > 1 else None,
        **kw,
    )
    params = variables["params"]
    train_params, _ = partition_params(params, train_stage)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(train_params),
        # copy=True: astype is a no-op view for f32 params, and aliasing
        # params in model_avg would double-donate buffers in the train step
        model_avg=jax.tree.map(
            lambda p: jnp.array(p, dtype=jnp.float32, copy=True), params
        )
        if with_model_avg
        else None,
    )
