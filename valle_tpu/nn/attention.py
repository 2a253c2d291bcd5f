"""Multi-head attention with packed QKV and explicit KV-cache support.

Behavioral parity with the reference's ``MultiheadAttention`` fork
(ref valle/modules/activation.py:12-431): packed in-projection (q;k;v) with
bias, output projection with bias, dropout on attention probabilities.  The
reference has **no KV-cache** and recomputes full attention each decode step
(ref models/valle.py:1012-1057); here decoding writes into a preallocated
cache and attends with a masked single-query kernel — the TPU-native design.

The actual attention contraction is routed through
``valle_tpu.ops.attention_impl`` so the XLA einsum path and the Pallas
flash-attention path are interchangeable.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from valle_tpu.nn.qdense import Dense as QDense
from valle_tpu.ops.attention_impl import dot_product_attention


def quantize_kv(x: jnp.ndarray):
    """(..., Dh) -> (int8 values, f32 scale over the trailing Dh axis).

    Symmetric per-(token, head) quantization for the decode KV-cache; the
    scale factors out of the attention contractions so dequantization never
    materializes a bf16 copy of the cache (see the decode branch below).
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = amax / 127.0
    q = jnp.round(x.astype(jnp.float32) / jnp.maximum(scale, 1e-8)[..., None])
    return jnp.clip(q, -127, 127).astype(jnp.int8), scale


def _ragged_decode(q, k, v, kv_lengths, attn_bias, ks=None, vs=None):
    """Route a Tq=1 decode read through the ragged Pallas kernel; slot b
    reads KV columns [0, kv_lengths[b]) only (ops/ragged_decode.py)."""
    from valle_tpu.ops.ragged_decode import ragged_decode_attention

    bias_row = None
    if attn_bias is not None:
        # decode biases are per-column: (B, 1, 1, C) -> (B, C)
        bias_row = jnp.broadcast_to(
            attn_bias, attn_bias.shape[:1] + (1, 1) + attn_bias.shape[-1:]
        )[:, 0, 0, :]
    return ragged_decode_attention(
        q, k, v, kv_lengths, bias_row, ks, vs,
        interpret=jax.default_backend() != "tpu",
    )


def _decode_attention_quantized(q, k8, v8, ks, vs, attn_bias):
    """Single-query attention over an int8 cache.

    q: (B, 1, H, Dh) bf16/f32; k8/v8: (B, C, H, Dh) int8;
    ks/vs: (B, C, H) f32; attn_bias additive, broadcastable to (B, H, 1, C).
    """
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32)).astype(q.dtype)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k8.astype(q.dtype))
    logits = logits.astype(jnp.float32) * jnp.transpose(ks, (0, 2, 1))[:, :, None, :]
    if attn_bias is not None:
        logits = logits + attn_bias.astype(logits.dtype)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = probs * jnp.transpose(vs, (0, 2, 1))[:, :, None, :]
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v8.astype(q.dtype))


class MultiheadAttention(nn.Module):
    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    bias: bool = True
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"  # "xla" | "flash"
    out_kernel_init: Optional[object] = None  # ScaledLinear-style init
    act_quant: bool = False  # W8A8 matmuls when kernels are int8-quantized

    @nn.compact
    def __call__(
        self,
        x_q: jnp.ndarray,
        x_kv: Optional[jnp.ndarray] = None,
        *,
        attn_bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        kv_cache: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        cache_index: Optional[jnp.ndarray] = None,
        kv_lengths: Optional[jnp.ndarray] = None,
        return_kv: bool = False,
    ):
        """Args:
          x_q: (B, Tq, D) queries (pre-projection).
          x_kv: (B, Tk, D) keys/values source; defaults to ``x_q`` (self-attn).
          attn_bias: additive bias broadcastable to (B, H, Tq, Tk).
          kv_cache: optional (k, v) of shape (B, Tmax, H, Dh); when given with
            ``cache_index``, the freshly projected K/V (length Tq) are written
            at that offset and attention runs over the full cache.
          kv_lengths: optional (B,) per-slot live cache lengths — routes the
            decode read (Tq=1, stacked cache) through the ragged Pallas
            kernel (ops/ragged_decode.py) so slot b reads only columns
            [0, kv_lengths[b]); a 0 length (finished slot) reads nothing and
            yields zeros.  None keeps the dense XLA read.
          return_kv: also return the projected (k, v) for cache prefill.

        Returns (out, new_cache_or_None, kv_or_None).
        """
        d, h = self.embed_dim, self.num_heads
        dh = d // h
        self_attention = x_kv is None
        if self_attention:
            x_kv = x_q

        if self_attention:
            qkv = QDense(
                3 * d, use_bias=self.bias, dtype=self.dtype,
                act_quant=self.act_quant, name="in_proj",
            )(x_q)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            # Cross-attention keeps the same packed parameter layout as the
            # reference (a single in_proj_weight) by slicing one Dense.
            q = QDense(
                d, use_bias=self.bias, dtype=self.dtype,
                act_quant=self.act_quant, name="q_proj",
            )(x_q)
            kv = QDense(
                2 * d, use_bias=self.bias, dtype=self.dtype,
                act_quant=self.act_quant, name="kv_proj",
            )(x_kv)
            k, v = jnp.split(kv, 2, axis=-1)

        b, tq = q.shape[0], q.shape[1]
        tk = k.shape[1]
        q = q.reshape(b, tq, h, dh)
        k = k.reshape(b, tk, h, dh)
        v = v.reshape(b, tk, h, dh)

        new_cache = None
        if kv_cache is not None and len(kv_cache) == 5:
            # Quantized stacked-cache decode: (kc, vc, ks, vs, layer_idx)
            # with kc/vc int8 (L, B, C, H, Dh) and per-(token, head) scales
            # ks/vs (L, B, C, H) f32.  Decode is KV-read-bound, so storing
            # the cache in int8 halves the dominant HBM stream; the scales
            # factor out of both contractions exactly:
            #   (q . s*k8)      = s * (q . k8)        -> scale the LOGITS
            #   sum_c p_c s_c v8_c = (p*s) . v8        -> scale the PROBS
            kc, vc, ks, vs, li = kv_cache
            idx = jnp.asarray(0 if cache_index is None else cache_index, jnp.int32)
            li = jnp.asarray(li, jnp.int32)
            k8, k_sc = quantize_kv(k)
            v8, v_sc = quantize_kv(v)
            if idx.ndim == 1:
                # per-slot decode columns (continuous batching): each slot
                # writes at its OWN column, so a refilled slot's cache region
                # starts at the prefix instead of the global step — the
                # decode read stays bounded by the slot's own length
                bi = jnp.arange(b)
                kc = kc.at[li, bi, idx].set(k8[:, 0])
                vc = vc.at[li, bi, idx].set(v8[:, 0])
                ks = ks.at[li, bi, idx].set(k_sc[:, 0])
                vs = vs.at[li, bi, idx].set(v_sc[:, 0])
            else:
                kc = jax.lax.dynamic_update_slice(kc, k8[None], (li, 0, idx, 0, 0))
                vc = jax.lax.dynamic_update_slice(vc, v8[None], (li, 0, idx, 0, 0))
                ks = jax.lax.dynamic_update_slice(ks, k_sc[None], (li, 0, idx, 0))
                vs = jax.lax.dynamic_update_slice(vs, v_sc[None], (li, 0, idx, 0))
            new_cache = (kc, vc, ks, vs)
            take = lambda c: jax.lax.dynamic_index_in_dim(c, li, 0, keepdims=False)
            if kv_lengths is not None:
                out = _ragged_decode(
                    q, take(kc), take(vc), kv_lengths, attn_bias,
                    take(ks), take(vs),
                ).astype(q.dtype)
            else:
                out = _decode_attention_quantized(
                    q, take(kc), take(vc), take(ks), take(vs), attn_bias
                )
            out = out.reshape(b, tq, d)
            okw = (
                {}
                if self.out_kernel_init is None
                else {"kernel_init": self.out_kernel_init}
            )
            out = QDense(
                d, use_bias=self.bias, dtype=self.dtype,
                act_quant=self.act_quant, name="out_proj", **okw,
            )(out)
            return out, new_cache, None
        if kv_cache is not None and len(kv_cache) == 3:
            # Stacked-cache decode: (kc, vc, layer_idx) with kc/vc of shape
            # (L, B, C, H, Dh).  Only the current token's K/V is written (a
            # tiny dynamic_update_slice), so the cache buffers update
            # in place inside scan/while carries instead of being copied
            # wholesale every step.
            kc, vc, li = kv_cache
            idx = jnp.asarray(0 if cache_index is None else cache_index, jnp.int32)
            li = jnp.asarray(li, jnp.int32)
            if idx.ndim == 1:  # per-slot decode columns (see int8 branch)
                bi = jnp.arange(b)
                kc = kc.at[li, bi, idx].set(k.astype(kc.dtype)[:, 0])
                vc = vc.at[li, bi, idx].set(v.astype(vc.dtype)[:, 0])
            else:
                kc = jax.lax.dynamic_update_slice(
                    kc, k.astype(kc.dtype)[None], (li, 0, idx, 0, 0)
                )
                vc = jax.lax.dynamic_update_slice(
                    vc, v.astype(vc.dtype)[None], (li, 0, idx, 0, 0)
                )
            new_cache = (kc, vc)
            k_att = jax.lax.dynamic_index_in_dim(kc, li, 0, keepdims=False)
            v_att = jax.lax.dynamic_index_in_dim(vc, li, 0, keepdims=False)
            if kv_lengths is not None:
                out = _ragged_decode(
                    q, k_att, v_att, kv_lengths, attn_bias
                ).astype(q.dtype)
                out = out.reshape(b, tq, d)
                okw = (
                    {}
                    if self.out_kernel_init is None
                    else {"kernel_init": self.out_kernel_init}
                )
                out = QDense(
                    d, use_bias=self.bias, dtype=self.dtype,
                    act_quant=self.act_quant, name="out_proj", **okw,
                )(out)
                return out, new_cache, None
        elif kv_cache is not None:
            ck, cv = kv_cache
            idx = jnp.asarray(0 if cache_index is None else cache_index, jnp.int32)
            ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, idx, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, idx, 0, 0))
            new_cache = (ck, cv)
            k_att, v_att = ck, cv
        else:
            k_att, v_att = k, v

        dropout_rng = None
        if not deterministic and self.dropout > 0.0:
            dropout_rng = self.make_rng("dropout")

        out = dot_product_attention(
            q,
            k_att,
            v_att,
            bias=attn_bias,
            dropout_rate=self.dropout,
            dropout_rng=dropout_rng,
            deterministic=deterministic,
            impl=self.attn_impl,
        )
        out = out.reshape(b, tq, d)
        okw = {} if self.out_kernel_init is None else {"kernel_init": self.out_kernel_init}
        out = QDense(
            d, use_bias=self.bias, dtype=self.dtype,
            act_quant=self.act_quant, name="out_proj", **okw,
        )(out)
        kv = (k, v) if return_kv else None
        return out, new_cache, kv
