"""Token and sinusoidal positional embeddings.

Parity targets: reference valle/modules/embedding.py:21-97 — ``TokenEmbedding``
(embedding + dropout, exposed weight for tying) and ``SinePositionalEmbedding``
(fixed sin/cos table with an optional learnable scalar ``alpha`` multiplier).

TPU-first notes: the PE table is a static constant folded by XLA (no lazy
extension — shapes are static under jit), and embedding lookups are plain
gathers that XLA maps to efficient dynamic-slice loops; the multi-codebook
summed gather has a dedicated fused path in ops/embedding_gather.py.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def sinusoidal_table(length: int, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """Standard interleaved sin/cos table, shape (length, dim).

    Matches ref modules/embedding.py:75-91 (sin at even, cos at odd indices).
    """
    position = jnp.arange(length, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, dim, 2, dtype=jnp.float32) * -(math.log(10000.0) / dim)
    )
    angles = position * div_term  # (length, dim//2)
    pe = jnp.stack([jnp.sin(angles), jnp.cos(angles)], axis=-1).reshape(length, dim)
    return pe.astype(dtype)


class TokenEmbedding(nn.Module):
    """Embedding table with dropout; weight exposed for output-layer tying."""

    dim_model: int
    vocab_size: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        emb = nn.Embed(
            num_embeddings=self.vocab_size,
            features=self.dim_model,
            name="word_embeddings",
            embedding_init=nn.initializers.normal(stddev=1.0),
        )
        out = emb(x)
        if self.dropout > 0.0:
            out = nn.Dropout(rate=self.dropout)(out, deterministic=deterministic)
        return out


class SinePositionalEmbedding(nn.Module):
    """x * x_scale + alpha * PE[:T], then dropout.

    ``alpha`` is a learnable scalar when ``alpha=True`` (used by the AR
    decoder, ref models/valle.py:128-139), else fixed 1.0.
    ``scale`` multiplies x by sqrt(dim) when True (unused by VALL-E).
    """

    dim_model: int
    dropout: float = 0.0
    scale: bool = False
    alpha: bool = False
    max_len: int = 4096

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        *,
        deterministic: bool = True,
        offset: int | jnp.ndarray = 0,
        positions: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Args:
        x: (B, T, D) embeddings.
        offset: scalar position offset (decode-time continuation).
        positions: optional explicit (B, T) int positions overriding arange.
        """
        x_scale = math.sqrt(self.dim_model) if self.scale else 1.0
        # alpha is a genuine parameter even when frozen (reference keeps the
        # tensor with requires_grad=False); we make it a param only if
        # learnable so optimizer state stays minimal.
        if self.alpha:
            alpha = self.param("alpha", nn.initializers.ones, (1,))
        else:
            alpha = jnp.ones((1,), dtype=x.dtype)

        table = sinusoidal_table(self.max_len, self.dim_model, dtype=jnp.float32)
        t = x.shape[1]
        if positions is not None:
            pe = jnp.take(table, positions, axis=0)  # (B, T, D)
        else:
            start = jnp.asarray(offset, dtype=jnp.int32)
            pe = jax.lax.dynamic_slice_in_dim(table, start, t, axis=0)[None]
        out = x * x_scale + alpha.astype(x.dtype) * pe.astype(x.dtype)
        if self.dropout > 0.0:
            out = nn.Dropout(rate=self.dropout)(out, deterministic=deterministic)
        return out
