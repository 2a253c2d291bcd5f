"""Pallas blockwise flash-attention for TPU (training path).

Replaces the reference's reliance on torch's fused C++/CUDA attention
(ref valle/modules/activation.py:266-361).  The kernel is written for the
prefix-LM masks VALL-E uses: an arbitrary additive bias of shape
(B, 1, T, T) (structural mask merged with key-padding) is streamed blockwise
alongside Q/K/V, with running-softmax accumulation in fp32.

``flash_attention_biased`` returns None when shapes are ineligible so callers
can fall back to the XLA path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_INTERPRET = False  # flipped by tests on CPU


def _available() -> bool:
    try:
        import jax.experimental.pallas  # noqa: F401

        return True
    except Exception:  # pragma: no cover
        return False


def flash_attention_biased(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    *,
    block_q: int = 256,
    block_k: int = 256,
) -> Optional[jnp.ndarray]:
    """(B,Tq,H,Dh) attention with additive bias; None if not eligible."""
    b, tq, h, dh = q.shape
    tk = k.shape[1]
    if not _available():
        return None
    if dh % 128 != 0 and dh != 64:
        return None
    if tq < block_q or tk < block_k or tq % block_q or tk % block_k:
        return None
    if bias is not None and bias.shape not in (
        (b, 1, tq, tk),
        (1, 1, tq, tk),
        (b, h, tq, tk),
    ):
        return None
    return _flash(q, k, v, bias, block_q, block_k)


@functools.partial(jax.jit, static_argnums=(4, 5))
def _flash(q, k, v, bias, block_q, block_k):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, tq, h, dh = q.shape
    tk = k.shape[1]
    bias_bcast_b = bias is not None and bias.shape[0] == 1
    bias_bcast_h = bias is not None and bias.shape[1] == 1

    def kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, m_ref, l_ref, acc_ref):
        kb = pl.program_id(3)

        @pl.when(kb == 0)
        def _init():
            m_ref[:] = jnp.full_like(m_ref, -1e30)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        qv = q_ref[0].astype(jnp.float32)  # (block_q, dh)
        kv = k_ref[0].astype(jnp.float32)  # (block_k, dh)
        vv = v_ref[0].astype(jnp.float32)
        scale = 1.0 / (dh**0.5)
        s = jnp.dot(qv * scale, kv.T, preferred_element_type=jnp.float32)
        if bias_ref is not None:
            s = s + bias_ref[0].astype(jnp.float32)

        m_prev = m_ref[:]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_cur)
        alpha = jnp.exp(m_prev - m_cur)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
            p, vv, preferred_element_type=jnp.float32
        )
        m_ref[:] = m_cur

        @pl.when(kb == pl.num_programs(3) - 1)
        def _finish():
            o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)

    grid = (b, h, tq // block_q, tk // block_k)

    in_specs = [
        # layout (B, H, Tq, Dh) etc. — transpose outside
        pl.BlockSpec((1, 1, block_q, dh), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        pl.BlockSpec((1, 1, block_k, dh), lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
        pl.BlockSpec((1, 1, block_k, dh), lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
    ]
    args = [
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
    ]
    if bias is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, 1, block_q, block_k),
                lambda bi, hi, qi, ki: (
                    0 if bias_bcast_b else bi,
                    0 if bias_bcast_h else hi,
                    qi,
                    ki,
                ),
            )
        )
        args.append(bias)
    else:
        in_specs.append(None)

    kernel_fn = kernel if bias is not None else (
        lambda qr, kr, vr, orf, mr, lr, ar: kernel(qr, kr, vr, None, orf, mr, lr, ar)
    )
    pall_in_specs = [s for s in in_specs if s is not None]

    from jax.experimental.pallas import tpu as pltpu  # noqa: F811

    out = pl.pallas_call(
        kernel_fn,
        grid=grid,
        in_specs=pall_in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, block_q, dh), lambda bi, hi, qi, ki: (bi, hi, qi, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, tq, dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, dh), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(*args)
    return out.transpose(0, 2, 1, 3)
