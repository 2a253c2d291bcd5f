"""Top-k / top-p filtering and categorical sampling.

Parity: ref models/valle.py:1242-1302 (``top_k_top_p_filtering`` /
``topk_sampling``).  Written as pure jittable functions over batched logits so
the whole sampling step lives inside the decode ``lax.scan``/``while_loop``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

FILTER_VALUE = -1e9  # finite stand-in for -inf (keeps softmax NaN-free)


def top_k_top_p_filtering(
    logits: jnp.ndarray,
    top_k: int = 0,
    top_p: float = 1.0,
    filter_value: float = FILTER_VALUE,
    min_tokens_to_keep: int = 1,
) -> jnp.ndarray:
    """Filter (..., V) logits; top_k/top_p are static Python values."""
    v = logits.shape[-1]
    if top_k > 0:
        k = min(max(top_k, min_tokens_to_keep), v)
        kth = jax.lax.top_k(logits, k)[0][..., -1:]
        logits = jnp.where(logits < kth, filter_value, logits)
    if top_p < 1.0:
        sort_idx = jnp.argsort(-logits, axis=-1)
        sorted_logits = jnp.take_along_axis(logits, sort_idx, axis=-1)
        cum_probs = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        remove = cum_probs > top_p
        if min_tokens_to_keep > 1:
            remove = remove.at[..., :min_tokens_to_keep].set(False)
        # shift right: always keep the first token above the threshold
        remove = jnp.concatenate(
            [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1
        )
        remove_orig = jnp.zeros_like(remove)
        remove_orig = jnp.put_along_axis(
            remove_orig, sort_idx, remove, axis=-1, inplace=False
        )
        logits = jnp.where(remove_orig, filter_value, logits)
    return logits


def topk_sampling(
    rng: jax.Array,
    logits: jnp.ndarray,
    top_k: int = 10,
    top_p: float = 1.0,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Sample one token per row of (..., V) logits. Returns (...,) int32."""
    if temperature != 1.0:
        logits = logits / temperature
    logits = top_k_top_p_filtering(logits, top_k=top_k, top_p=top_p)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)
