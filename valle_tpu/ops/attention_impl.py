"""Attention contraction implementations: XLA einsum and Pallas flash.

The XLA path is the always-correct fallback; `impl="flash"` dispatches to the
Pallas blockwise kernel in ops/flash_attention.py when shapes are eligible
(no dropout, bias expressible as mask).  Head layout everywhere is
(B, T, H, Dh).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


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
    """(B,Tq,H,Dh),(B,Tk,H,Dh),(B,Tk,H,Dh) -> (B,Tq,H,Dh)."""
    # The flash kernel is differentiable (library custom-VJP) but has no
    # attention-prob dropout; fall back to XLA when dropout is active.
    if (
        impl == "flash"
        and q.shape[1] > 1
        and (deterministic or dropout_rate == 0.0)
    ):
        from valle_tpu.ops.flash_attention import flash_attention_biased

        out = flash_attention_biased(q, k, v, bias)
        if out is not None:
            return out
    return _xla_attention(q, k, v, bias, dropout_rate, dropout_rng, deterministic)
