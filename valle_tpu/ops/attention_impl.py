"""Attention contraction implementations: XLA einsum and Pallas flash.

The XLA path is the always-correct fallback; `impl="flash"` dispatches to the
Pallas blockwise kernel in ops/flash_attention.py when shapes are eligible
(no dropout, bias expressible as mask).  Head layout everywhere is
(B, T, H, Dh).
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from valle_tpu.ops.masks import AttnMaskSpec


def _xla_attention(q, k, v, bias, dropout_rate, dropout_rng, deterministic):
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32)).astype(q.dtype)
    # (B, H, Tq, Tk)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    if not deterministic and dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep.astype(probs.dtype) / (1.0 - dropout_rate)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    bias: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    dropout_rng=None,
    deterministic: bool = True,
    impl: str = "xla",
) -> jnp.ndarray:
    """(B,Tq,H,Dh),(B,Tk,H,Dh),(B,Tk,H,Dh) -> (B,Tq,H,Dh).

    ``bias`` may be a dense additive array broadcastable to (B, H, Tq, Tk)
    OR an :class:`AttnMaskSpec` (key-validity row + static prefix split).

    impl:
      - "xla": einsum + f32 softmax (XLA's fusion; the measured best generic
        path at VALL-E shapes, docs/perf_notes.md).
      - "fused": the custom Pallas prefix-LM kernel with in-register dropout
        (ops/fused_attention.py) — requires an AttnMaskSpec and Tq > 1;
        anything else (decode steps, dense-bias callers, dropout off-TPU
        where the interpreter PRNG is a stub) falls back to "xla".
      - "flash" | "flash_kp": the library Pallas kernel; "flash_kp" routes
        only key-padding-only masks (O(B*T) SegmentIds encoding), keeping
        per-query structured biases (prefix-LM prefill) on XLA — the
        materialized (B,H,Tq,Tk) f32 ``ab`` bias costs more than the kernel
        saves.  Kept as measured negative results / comparison points.
    """
    if isinstance(bias, AttnMaskSpec):
        if impl == "fused" and q.shape[1] > 1:
            dropping = not deterministic and dropout_rate > 0.0
            on_tpu = jax.default_backend() == "tpu"
            if not dropping or on_tpu:
                from valle_tpu.ops.fused_attention import fused_prefix_attention

                return fused_prefix_attention(
                    q,
                    k,
                    v,
                    bias.kv_bias,
                    prefix_s=bias.prefix_s,
                    dropout_rate=dropout_rate if dropping else 0.0,
                    dropout_rng=dropout_rng if dropping else None,
                )
        bias = bias.dense(q.shape[1])
    # The flash kernel is differentiable (library custom-VJP) but has no
    # attention-prob dropout; fall back to XLA when dropout is active.
    if (
        impl in ("flash", "flash_kp")
        and q.shape[1] > 1
        and (deterministic or dropout_rate == 0.0)
    ):
        key_pad_only = bias is None or (
            bias.ndim == 4 and bias.shape[1] == 1 and bias.shape[2] == 1
        )
        if impl == "flash" or key_pad_only:
            from valle_tpu.ops.flash_attention import flash_attention_biased

            out = flash_attention_biased(q, k, v, bias)
            if out is not None:
                return out
    return _xla_attention(q, k, v, bias, dropout_rate, dropout_rng, deterministic)
