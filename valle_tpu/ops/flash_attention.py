"""Flash attention on TPU via the Pallas kernels shipped with JAX.

Replaces the reference's reliance on torch's fused C++/CUDA attention
(ref valle/modules/activation.py:266-361).  We route through
``jax.experimental.pallas.ops.tpu.flash_attention`` — the blockwise Mosaic
kernel with a differentiable custom VJP — handling:

  - layout conversion (our (B, T, H, Dh) <-> kernel (B, H, T, Dh))
  - sequence padding to the kernel's block granularity, with the padded
    key columns masked through the additive bias
  - the prefix-LM / padding masks expressed as an additive ``ab`` bias

Eligibility: no attention-prob dropout (the kernel has none — callers fall
back to the XLA path when training with dropout > 0) and Tq > 1 (decode
steps use the cache path instead).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_BLOCK = 128  # pad granularity; the kernel's own blocks are multiples of this


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def flash_attention_biased(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],
) -> Optional[jnp.ndarray]:
    """(B,Tq,H,Dh) x (B,Tk,H,Dh) -> (B,Tq,H,Dh); None if ineligible."""
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention,
        )
    except ImportError:  # pragma: no cover
        return None

    b, tq, h, dh = q.shape
    tk = k.shape[1]
    if tq < 2:
        return None
    if bias is not None and bias.ndim != 4:
        return None

    tq_p = _round_up(tq, _BLOCK)
    tk_p = _round_up(tk, _BLOCK)

    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    if tq_p != tq:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, tq_p - tq), (0, 0)))
    if tk_p != tk:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, tk_p - tk), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, tk_p - tk), (0, 0)))

    if bias is None:
        ab = jnp.zeros((b, 1, tq_p, tk_p), jnp.float32)
    else:
        ab = jnp.pad(
            bias.astype(jnp.float32),
            (
                (0, 0),
                (0, 0),
                (0, tq_p - bias.shape[2]),
                (0, tk_p - bias.shape[3]),
            ),
        )
    # mask out padded key columns for every query
    if tk_p != tk:
        col = jnp.arange(tk_p) >= tk
        ab = jnp.minimum(ab, jnp.where(col, -1e9, 0.0)[None, None, None, :])
    ab = jnp.broadcast_to(ab, (b, ab.shape[1], tq_p, tk_p))
    if ab.shape[1] == 1 and h > 1:
        ab = jnp.broadcast_to(ab, (b, h, tq_p, tk_p))

    sm_scale = 1.0 / (dh**0.5)
    out = flash_attention(qt, kt, vt, ab=ab, causal=False, sm_scale=sm_scale)
    out = jnp.transpose(out, (0, 2, 1, 3))
    if tq_p != tq:
        out = out[:, :tq]
    return out.astype(q.dtype)
