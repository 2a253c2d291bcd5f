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


def _pick_block(t_padded: int, cap: int = 1024) -> int:
    """Largest 128-multiple divisor of t_padded, capped at ``cap``.

    The library kernel's default (128) block runs ~4.5x slower than one big
    block at our sequence lengths (measured on v5e at B=128, T=896: 56.7 ms
    vs 12.5 ms) — small blocks re-load the (1, Dh)-thin query tile per key
    block and leave the MXU idle.  Scores for a 1024-block are 4 MB of VMEM.
    """
    for d in range(min(t_padded, cap), 0, -_BLOCK):
        if t_padded % d == 0 and d % _BLOCK == 0:
            return d
    return _BLOCK


def flash_attention_biased(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],
) -> Optional[jnp.ndarray]:
    """(B,Tq,H,Dh) x (B,Tk,H,Dh) -> (B,Tq,H,Dh); None if ineligible.

    Two mask encodings, picked by bias structure:
      - key-padding-only masks (bias (B,1,1,Tk) or None) ride as
        ``SegmentIds`` — O(B*T) int32 instead of a materialized
        (B,H,Tq,Tk) f32 bias.  This is the NAR-refinement / cross-attention
        hot path: at (B=128, T~800) the dense bias alone is ~6 GB of HBM
        traffic per layer, more than the attention math it masks.
      - per-query structured masks (prefix-LM prefill) fall back to the
        dense ``ab`` bias.
    """
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            SegmentIds,
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

    sm_scale = 1.0 / (dh**0.5)
    bq, bk = _pick_block(tq_p), _pick_block(tk_p)
    # The 1024-sized blocks were tuned on the FORWARD pass only; the backward
    # kernels (dkv/dq) keep extra f32 score/ds tiles live, so cap their blocks
    # at 512 (largest DIVISOR of the padded length <= 512 — the kernel
    # requires exact divisibility) until the backward is measured.
    bq_b, bk_b = _pick_block(tq_p, 512), _pick_block(tk_p, 512)
    block_sizes = BlockSizes(
        block_q=bq,
        block_k_major=bk,
        block_k=bk,
        block_b=1,
        block_q_major_dkv=bq_b,
        block_k_major_dkv=bk_b,
        block_k_dkv=bk_b,
        block_q_dkv=bq_b,
        block_k_major_dq=bk_b,
        block_k_dq=bk_b,
        block_q_dq=bq_b,
    )

    # CONTRACT: a (B, 1, 1, Tk) bias is treated as a hard key-padding MASK —
    # entries must be exactly 0 (visible) or <= -1e8 (masked).  A soft
    # additive bias of that shape (finite nonzero entries) would be silently
    # binarized, so such callers must fall back to the dense ``ab`` path.
    # All in-repo callers build (B, 1, 1, Tk) biases via
    # ``mask_ops.mask_to_bias`` ({0, -1e9} by construction), satisfying the
    # contract; the value is traced, so it cannot be checked here.
    key_pad_only = bias is None or (bias.shape[1] == 1 and bias.shape[2] == 1)
    if key_pad_only:
        # All (real) queries see the same key-validity row: encode it as
        # segment ids.  Padded key columns get segment 0; valid keys and all
        # query rows get segment 1 (padded/garbage query rows produce finite
        # outputs that callers slice off or mask downstream).
        if bias is None:
            kv_valid = jnp.ones((b, tk), bool)
        else:
            kv_valid = bias[:, 0, 0, :] > -1e8
        if tk_p != tk:
            kv_valid = jnp.pad(kv_valid, ((0, 0), (0, tk_p - tk)))
        q_seg = jnp.ones((b, tq_p), jnp.int32)
        kv_seg = kv_valid.astype(jnp.int32)
        out = flash_attention(
            qt,
            kt,
            vt,
            segment_ids=SegmentIds(q=q_seg, kv=kv_seg),
            causal=False,
            sm_scale=sm_scale,
            block_sizes=block_sizes,
        )
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
        out = flash_attention(
            qt, kt, vt, ab=ab, causal=False, sm_scale=sm_scale,
            block_sizes=block_sizes,
        )

    out = jnp.transpose(out, (0, 2, 1, 3))
    if tq_p != tq:
        out = out[:, :tq]
    return out.astype(q.dtype)
