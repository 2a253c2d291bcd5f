"""Ragged decode attention: per-slot length-clipped KV-cache reads.

**Status: exact-parity machinery; a MEASURED NEGATIVE RESULT for speed on
v5e — keep ``ragged_decode=False`` (the default) for serving.**  See
docs/perf_notes.md "Round 5: ragged decode kernel" for the full
measurement chain; summary of why the premise fails on this toolchain:

  1. The hoped-for lever was skipping dead columns: finished slots and
     short per-slot live regions on mixed-length traffic (~0.65x the reads
     on the gen_mix distribution, projected 15-18% end-to-end in round 4).
  2. The Pallas *pipelined* form (this file) cannot skip the HBM fetches:
     clamping dead blocks' index maps to a repeated index does NOT elide
     the copy in this jax/Mosaic version — a trivial-body kernel with the
     same specs costs the full-width read (measured 0.43-0.49 ms vs dense
     0.438 ms per layer at L12/B128/C896 int8).  On top of that, the
     per-slot single-query contraction is a matvec: the MXU runs its
     (BC, H*Dh) x (H*Dh, H) block-diagonal dots at ~8% utilization
     (N=16 of 128 output lanes), measured 2.4x dense overall.
  3. The manual-DMA form (double-buffered ``make_async_copy`` with a
     per-slot dynamic trip count, probed separately) DOES scale reads with
     lengths — but its streaming ceiling measured 437-478 GB/s across
     block sizes 224-896 and buffer depths 2-4, i.e. the SAME rate XLA's
     dense fused read achieves (505 GB/s equiv).  With compute on top it
     breaks even only below ~0.8 average live fraction and loses at full
     length; on gen_mix the projected end-to-end delta is within run
     noise, so the dense path stays the serving default.

The kernel remains in-tree as the exact-parity slot the design would plug
into if a future toolchain gains revisited-block elision or faster
explicit DMA streaming: it computes, per batch slot ``b``, attention over
KV columns ``[0, lengths[b])`` only (a finished slot with length 0
computes nothing and yields zeros), with online softmax across column
blocks and both int8 (per-token-head scales) and float cache variants.
Replaces the reference's per-token full recompute
(ref /root/reference/valle/models/valle.py:1012-1057) semantically; the
dense XLA decode formulation (``nn/attention.py``) is the measured winner.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9  # matches ops.masks.mask_to_bias


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _kernel(
    lens_ref,
    q_ref,
    k_ref,
    v_ref,
    ks_ref,
    vs_ref,
    bias_ref,
    o_ref,
    qmat_ref,
    acc_ref,
    m_ref,
    l_ref,
    *,
    bc: int,
    nheads: int,
    dh: int,
    quantized: bool,
):
    b = pl.program_id(0)
    c = pl.program_id(1)
    ncb = pl.num_programs(1)
    hd = nheads * dh
    length = lens_ref[b]

    @pl.when(c == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG * 2.0)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        # block-diagonal query matrix (H*Dh, H)
        qv = q_ref[0].reshape(1, hd).astype(jnp.float32)
        qcol = jnp.transpose(qv, (1, 0))  # (HD, 1), once per slot
        row_h = jax.lax.broadcasted_iota(jnp.int32, (hd, nheads), 0) // dh
        col_h = jax.lax.broadcasted_iota(jnp.int32, (hd, nheads), 1)
        qmat_ref[:] = jnp.where(row_h == col_h, qcol, 0.0)

    @pl.when(c * bc < length)
    def _block():
        # bf16 MXU inputs (f32 dots run as multi-pass emulation); f32 accum
        k_blk = k_ref[0].reshape(bc, hd).astype(jnp.bfloat16)
        scale = 1.0 / (dh ** 0.5)
        scores = jax.lax.dot_general(
            k_blk,
            qmat_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (BC, H)
        if quantized:
            scores = scores * ks_ref[0]  # (BC, H) per-(token, head) K scale
        # additive bias (prefix-padding holes) + hard length clip; the bias
        # arrives as (B, C, 1) so its block is (bc, 1) sublane-major — no
        # in-kernel relayout
        col = c * bc + jax.lax.broadcasted_iota(jnp.int32, (bc, 1), 0)
        scores = scores + bias_ref[0]  # (bc, 1)
        scores = jnp.where(col < length, scores, _NEG * 2.0)

        m_prev = m_ref[:]  # (1, H)
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=0, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)  # (1, H)
        p = jnp.exp(scores - m_new)  # (BC, H)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=0, keepdims=True)
        if quantized:
            p = p * vs_ref[0]  # V scale folds into the probs
        v_blk = v_ref[0].reshape(bc, hd).astype(jnp.bfloat16)
        # acc (HD, H): rows = flattened head*dh output dims, cols = head
        pv = jax.lax.dot_general(
            v_blk,
            p.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (HD, H)
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = m_new

    @pl.when(c == ncb - 1)
    def _finalize():
        l = l_ref[:]  # (1, H)
        denom = jnp.where(l > 0.0, l, 1.0)
        acc = acc_ref[:] / denom  # (HD, H)
        # extract the head-diagonal: out_T (Dh, H) via a selection matmul
        row_h = jax.lax.broadcasted_iota(jnp.int32, (hd, nheads), 0) // dh
        col_h = jax.lax.broadcasted_iota(jnp.int32, (hd, nheads), 1)
        masked = jnp.where(row_h == col_h, acc, 0.0)
        sel_d = jax.lax.broadcasted_iota(jnp.int32, (dh, hd), 0)
        sel_i = jax.lax.broadcasted_iota(jnp.int32, (dh, hd), 1) % dh
        sel = (sel_d == sel_i).astype(jnp.float32)  # (Dh, HD)
        out_t = jax.lax.dot_general(
            sel,
            masked,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Dh, H)
        out = jnp.transpose(out_t, (1, 0))  # (H, Dh), 16x64 once per slot
        o_ref[0] = jnp.where(l.reshape(nheads, 1) > 0.0, out, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("block_c", "interpret"),
)
def ragged_decode_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    lengths: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    k_scale: Optional[jnp.ndarray] = None,
    v_scale: Optional[jnp.ndarray] = None,
    *,
    block_c: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-query attention over a per-slot length-clipped KV-cache.

    Args:
      q: (B, H, Dh) or (B, 1, H, Dh) queries.
      k, v: (B, C, H, Dh) cache — int8 (with scales) or float.
      lengths: (B,) int32; slot b attends over columns [0, lengths[b]).
        A slot with length 0 produces zeros (finished slots read nothing).
      bias: optional (B, C) additive f32 bias (prefix-padding holes); only
        columns < lengths[b] contribute either way.
      k_scale, v_scale: (B, C, H) f32 per-(token, head) scales, required
        iff k/v are int8 (``nn.attention.quantize_kv`` layout).

    Returns (B, 1, H, Dh) f32 attention outputs (Tq = 1).
    """
    squeeze = q.ndim == 4
    if squeeze:
        assert q.shape[1] == 1, "decode kernel: Tq must be 1"
        q = q[:, 0]
    b, h, dh = q.shape
    _, cap, hk, dhk = k.shape
    assert (hk, dhk) == (h, dh), (k.shape, q.shape)
    quantized = k.dtype == jnp.int8
    if quantized:
        assert k_scale is not None and v_scale is not None
    else:
        assert k_scale is None and v_scale is None
        # unused dummy operands keep one kernel signature
        k_scale = jnp.zeros((b, 1, h), jnp.float32)
        v_scale = jnp.zeros((b, 1, h), jnp.float32)
    if bias is None:
        bias = jnp.zeros((b, cap), jnp.float32)
    bias = bias.astype(jnp.float32)

    bc = min(block_c, cap)
    ncb = _cdiv(cap, bc)
    lengths = jnp.minimum(lengths.astype(jnp.int32), cap)

    def live_last(lens, i):
        # index of the last LIVE block: ceil(len / bc) - 1, floored at 0
        return jnp.maximum(jax.lax.div(lens[i] + bc - 1, bc), 1) - 1

    def clamp_map3(i, c, lens):
        return (i, jnp.minimum(c, live_last(lens, i)), 0)

    scale_spec = pl.BlockSpec(
        (1, bc, h) if quantized else (1, 1, h),
        clamp_map3 if quantized else (lambda i, c, lens: (i, 0, 0)),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, ncb),
        in_specs=[
            pl.BlockSpec((1, 1, h * dh), lambda i, c, lens: (i, 0, 0)),
            pl.BlockSpec((1, bc, h * dh), clamp_map3),
            pl.BlockSpec((1, bc, h * dh), clamp_map3),
            scale_spec,
            scale_spec,
            pl.BlockSpec((1, bc, 1), clamp_map3),
        ],
        out_specs=pl.BlockSpec((1, h, dh), lambda i, c, lens: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h * dh, h), jnp.float32),  # qmat
            pltpu.VMEM((h * dh, h), jnp.float32),  # acc
            pltpu.VMEM((1, h), jnp.float32),  # m
            pltpu.VMEM((1, h), jnp.float32),  # l
        ],
    )
    kernel = functools.partial(
        _kernel, bc=bc, nheads=h, dh=dh, quantized=quantized
    )
    cap_pad = ncb * bc
    if cap_pad != cap:
        pad = ((0, 0), (0, cap_pad - cap), (0, 0), (0, 0))
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        bias = jnp.pad(bias, ((0, 0), (0, cap_pad - cap)))
        if quantized:
            k_scale = jnp.pad(k_scale, pad[:3])
            v_scale = jnp.pad(v_scale, pad[:3])
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, dh), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        lengths,
        q.reshape(b, 1, h * dh),
        k.reshape(b, cap_pad, h * dh),
        v.reshape(b, cap_pad, h * dh),
        k_scale,
        v_scale,
        bias.reshape(b, cap_pad, 1),  # block (bc, 1): sublane-major columns
    )
    return out[:, None] if squeeze else out


def ragged_decode_attention_reference(
    q, k, v, lengths, bias=None, k_scale=None, v_scale=None
):
    """Dense reference (jnp) for parity tests: identical math to the dense
    decode paths in ``nn/attention.py``, plus the hard length clip."""
    if q.ndim == 4:
        q = q[:, 0]
    b, h, dh = q.shape
    cap = k.shape[1]
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    logits = jnp.einsum("bhd,bchd->bhc", qf, kf) / (dh ** 0.5)
    if k_scale is not None:
        logits = logits * jnp.transpose(k_scale, (0, 2, 1))
    if bias is not None:
        logits = logits + bias[:, None, :]
    live = jnp.arange(cap)[None, None, :] < lengths[:, None, None]
    logits = jnp.where(live, logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = jnp.where(live, probs, 0.0)  # length 0 -> all-zero row
    if v_scale is not None:
        probs = probs * jnp.transpose(v_scale, (0, 2, 1))
    out = jnp.einsum("bhc,bchd->bhd", probs, vf)
    return out[:, None]
