"""Mask construction for padded, bucketed, statically-shaped batches.

The reference relies on icefall's ``make_pad_mask`` plus ad-hoc boolean mask
concatenation (ref models/valle.py:835-861).  On TPU every mask here is a pure
function of integer length vectors and static shapes, so everything fuses into
the attention kernel under XLA and never causes a recompile across buckets of
the same padded shape.

Convention (same as the reference): ``True`` means MASKED (disallowed).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


def make_pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) int lengths -> (B, max_len) bool, True at padding positions.

    Parity: icefall make_pad_mask as used at ref models/valle.py:804-806.
    """
    pos = jnp.arange(max_len, dtype=lengths.dtype)[None, :]
    return pos >= lengths[:, None]


def causal_mask(t: int, dtype=jnp.bool_) -> jnp.ndarray:
    """(t, t) bool, True strictly above the diagonal (future positions)."""
    row = jnp.arange(t)[:, None]
    col = jnp.arange(t)[None, :]
    return (col > row).astype(dtype)


def prefix_lm_attn_mask(s: int, t: int) -> jnp.ndarray:
    """Structural mask for the [text ; audio] prefix-LM decoder.

    Text rows attend only to text columns; audio rows attend to all text
    columns plus causally to audio columns.  Shape (s+t, s+t) bool,
    True = masked.  Parity: ref models/valle.py:835-848.
    """
    n = s + t
    row = jnp.arange(n)[:, None]
    col = jnp.arange(n)[None, :]
    text_row = row < s
    text_col = col < s
    # text rows: mask audio cols. audio rows: mask future audio cols.
    masked_text_rows = jnp.logical_and(text_row, jnp.logical_not(text_col))
    masked_audio_rows = jnp.logical_and(
        jnp.logical_not(text_row), jnp.logical_and(jnp.logical_not(text_col), col > row)
    )
    return jnp.logical_or(masked_text_rows, masked_audio_rows)


def merge_padding(attn_mask: jnp.ndarray, key_padding: jnp.ndarray) -> jnp.ndarray:
    """OR a (T, T) structural mask with a (B, T) key-padding mask -> (B, 1, T, T).

    The head axis is kept size-1 and broadcast inside attention.
    Parity: ref models/valle.py:850-857.
    """
    return jnp.logical_or(attn_mask[None, None, :, :], key_padding[:, None, None, :])


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class AttnMaskSpec:
    """Structured attention mask: a per-sequence key-validity bias row plus a
    STATIC prefix-LM split point, instead of a materialized (B, H, Tq, Tk)
    bias.  The fused Pallas kernel (ops/fused_attention.py) consumes the two
    parts directly (the structural mask is regenerated from iotas in-kernel);
    every other attention impl densifies via :meth:`dense` — which is exactly
    the bias the model built eagerly before round 3, so XLA paths are
    unchanged.

    kv_bias: (B, Tk) f32, 0 = visible column, -1e9 = masked column.
    prefix_s: None = key-padding-only (NAR / cross-attention); an int s >= 0
      = [text ; audio] prefix-LM structural mask on top (s=0 is pure causal,
      the VALL-F audio decoder; ref models/valle.py:835-861).
    """

    kv_bias: jnp.ndarray
    prefix_s: Optional[int] = None

    def dense(self, tq: int) -> jnp.ndarray:
        """Materialize the (B, 1, Tq, Tk) additive bias."""
        bias = jnp.broadcast_to(
            self.kv_bias[:, None, None, :],
            (self.kv_bias.shape[0], 1, tq, self.kv_bias.shape[1]),
        )
        if self.prefix_s is not None:
            struct = prefix_lm_attn_mask(
                self.prefix_s, self.kv_bias.shape[1] - self.prefix_s
            )[:tq]
            bias = bias + mask_to_bias(struct, bias.dtype)[None, None, :, :]
        return bias

    def tree_flatten(self):
        return (self.kv_bias,), (self.prefix_s,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])


def mask_to_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """bool mask (True=masked) -> additive bias with a large negative value.

    Uses a finite large negative instead of -inf so fully-masked rows produce
    a uniform distribution instead of NaN (the reference produces NaN there;
    those rows are never read).
    """
    return jnp.where(mask, jnp.asarray(-1e9, dtype=dtype), jnp.asarray(0.0, dtype=dtype))
