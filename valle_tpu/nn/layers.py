"""Transformer layers: prefix-LM encoder layer (GPT-style, used by VALL-E),
decoder layer with cross-attention (used by VALL-F), adaptive layer norm for
NAR stage conditioning, and the scanned layer stack.

Parity targets:
  - TransformerEncoderLayer / TransformerDecoderLayer
    (ref valle/modules/transformer.py:178-334, 409-561): pre-/post-norm,
    ReLU feed-forward d->4d->d, dropout placement.
  - AdaptiveLayerNorm (ref modules/transformer.py:83-108):
    ``weight, bias = split(Linear(stage_emb)); weight * LN(x) + bias`` with
    the stage embedding threaded through every layer.

TPU-first notes: the stack is a single ``nn.scan`` over a layer module —
one compiled layer body, stacked parameters (L, ...), and the decode KV-cache
carried as a scanned input with a leading layer axis, so the whole decoder is
one fused XLA while-loop body during sampling.  Broadcast inputs (masks,
memory, stage embedding) ride through ``nn.broadcast`` axes.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from valle_tpu.nn.attention import MultiheadAttention
from valle_tpu.nn.qdense import Dense as QDense


class AdaptiveLayerNorm(nn.Module):
    """weight * norm(x) + bias, with (weight, bias) projected from stage_emb."""

    d_model: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, stage_emb: jnp.ndarray) -> jnp.ndarray:
        wb = nn.Dense(2 * self.d_model, dtype=self.dtype, name="project_layer")(
            stage_emb
        )
        weight, bias = jnp.split(wb, 2, axis=-1)
        normed = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="norm")(x)
        return weight * normed + bias


class ConditionedNorm(nn.Module):
    """LayerNorm / AdaptiveLayerNorm (NAR stage conditioning) / IdentityNorm /
    BalancedBasicNorm (scaling_xformers variant, ref modules/transformer.py
    :111-176)."""

    d_model: int
    adaptive: bool = False
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    norm_type: str = "layer"  # layer | identity | balanced_basic
    deterministic: bool = True

    @nn.compact
    def __call__(self, x, stage_emb=None):
        if self.norm_type == "identity":
            return x
        if self.norm_type == "balanced_basic":
            from valle_tpu.nn.scaling import activation_balancer, basic_norm

            x = activation_balancer(
                x,
                channel_dim=-1,
                min_positive=0.45,
                max_positive=0.55,
                max_abs=6.0,
                apply=not self.deterministic,
            )
            eps_log = self.param(
                "eps_log", lambda k: jnp.log(jnp.asarray(0.25, jnp.float32))
            )
            return basic_norm(x, eps_log)
        if self.adaptive:
            return AdaptiveLayerNorm(self.d_model, self.eps, self.dtype, name="ada")(
                x, stage_emb
            )
        return nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="ln")(x)


class TransformerLayer(nn.Module):
    """One decoder block.  ``cross_attention=True`` adds an encoder-memory
    attention sub-block between self-attention and the FFN (VALL-F layout,
    ref modules/transformer.py:409-561).

    ``deterministic`` / ``return_kv`` are construction-time attributes because
    the stack instantiates this module per call under ``nn.scan`` (which only
    threads positional array inputs).
    """

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1
    norm_first: bool = True
    adaptive_norm: bool = False
    cross_attention: bool = False
    activation: str = "relu"
    norm_type: str = "layer"  # "identity" engages the scaling_xformers layout
    out_init_scale: float = 1.0  # ScaledLinear(initial_scale) on output projs
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    act_quant: bool = False
    deterministic: bool = True
    return_kv: bool = False

    def _act(self, x):
        if self.activation == "relu":
            return nn.relu(x)
        if self.activation == "gelu":
            return nn.gelu(x)
        if self.activation == "balanced_double_swish":
            from valle_tpu.nn.scaling import balanced_double_swish

            return balanced_double_swish(x, apply=not self.deterministic)
        raise ValueError(self.activation)

    @nn.compact
    def __call__(
        self,
        carry,
        kv_cache,
        stage_emb,
        attn_bias,
        memory,
        memory_bias,
        cache_index,
        kv_lengths=None,
    ):
        deterministic = self.deterministic
        carry_cache = isinstance(carry, tuple)
        if carry_cache:
            # Decode mode: the whole stacked cache rides in the scan CARRY so
            # XLA updates it in place; the scanned input is this layer's index.
            # 3-tuple carry = bf16 cache; 5-tuple = int8 cache + scales.
            x, *cache = carry
            kv_cache = (*cache, kv_cache)
        else:
            x = carry
            # Under nn.scan a dummy per-layer scalar stands in for "no cache".
            if not isinstance(kv_cache, tuple):
                kv_cache = None
        def norm(name):
            # scaling_xformers: identity before attention blocks,
            # BalancedBasicNorm before the FFN (ref modules/transformer.py
            # :243-251 via IdentityNorm -> BalancedBasicNorm for norm2)
            ntype = self.norm_type
            if self.norm_type == "identity" and name == "norm2":
                ntype = "balanced_basic"
            return ConditionedNorm(
                self.d_model,
                adaptive=self.adaptive_norm,
                dtype=self.dtype,
                norm_type=ntype,
                deterministic=deterministic,
                name=name,
            )

        out_init = (
            nn.initializers.lecun_normal()
            if self.out_init_scale == 1.0
            else (
                lambda k, s, d=jnp.float32: nn.initializers.lecun_normal()(k, s, d)
                * self.out_init_scale
            )
        )
        sa = MultiheadAttention(
            self.d_model,
            self.nhead,
            dropout=self.dropout,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            act_quant=self.act_quant,
            out_kernel_init=out_init,
            name="self_attn",
        )
        drop = partial(nn.Dropout, rate=self.dropout)

        def ff_block(h):
            h = QDense(
                self.dim_feedforward, dtype=self.dtype,
                act_quant=self.act_quant, name="linear1",
            )(h)
            h = self._act(h)
            h = drop(name="ff_drop")(h, deterministic=deterministic)
            h = QDense(
                self.d_model, dtype=self.dtype, kernel_init=out_init,
                act_quant=self.act_quant, name="linear2",
            )(h)
            return drop(name="ff_out_drop")(h, deterministic=deterministic)

        def sa_block(h):
            out, new_cache, kv = sa(
                h,
                attn_bias=attn_bias,
                deterministic=deterministic,
                kv_cache=kv_cache,
                cache_index=cache_index,
                kv_lengths=kv_lengths,
                return_kv=self.return_kv,
            )
            out = drop(name="sa_drop")(out, deterministic=deterministic)
            return out, new_cache, kv

        def ca_block(h):
            ca = MultiheadAttention(
                self.d_model,
                self.nhead,
                dropout=self.dropout,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                act_quant=self.act_quant,
                name="cross_attn",
            )
            out, _, _ = ca(
                h, memory, attn_bias=memory_bias, deterministic=deterministic
            )
            return drop(name="ca_drop")(out, deterministic=deterministic)

        if self.norm_first:
            h, new_cache, kv = sa_block(norm(name="norm1")(x, stage_emb))
            x = x + h
            if self.cross_attention:
                x = x + ca_block(norm(name="norm_ca")(x, stage_emb))
            x = x + ff_block(norm(name="norm2")(x, stage_emb))
        else:
            h, new_cache, kv = sa_block(x)
            x = norm(name="norm1")(x + h, stage_emb)
            if self.cross_attention:
                x = norm(name="norm_ca")(x + ca_block(x), stage_emb)
            x = norm(name="norm2")(x + ff_block(x), stage_emb)

        # (carry, ys) structure for nn.scan.
        if carry_cache:
            return (x, *new_cache), None
        return x, (new_cache, kv)


class TransformerStack(nn.Module):
    """N scanned TransformerLayers plus the optional final (adaptive) norm.

    Parity: TransformerEncoder with return-tuple threading
    (ref modules/transformer.py:337-407) and the final norm choice at
    ref models/valle.py:141-152, 231-247.
    """

    num_layers: int
    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float = 0.1
    norm_first: bool = True
    adaptive_norm: bool = False
    cross_attention: bool = False
    final_norm: bool = True
    activation: str = "relu"
    norm_type: str = "layer"
    out_init_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    act_quant: bool = False
    # jax.checkpoint policy for each layer: "none" | "full" | "dots_nobatch"
    # (see ModelConfig.remat; bools accepted: True="full", False="none")
    remat: str = "none"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        kv_cache=None,  # pytree with leading layer axis, or None
        *,
        stage_emb=None,
        attn_bias=None,
        memory=None,
        memory_bias=None,
        cache_index=None,
        kv_lengths=None,
        deterministic: bool = True,
        return_kv: bool = False,
    ):
        layer_cls = TransformerLayer
        remat = {True: "full", False: "none"}.get(self.remat, self.remat)
        if remat != "none":
            # Recompute (part of) the layer in the backward pass instead of
            # saving its O(T^2) attention probs; prevent_cse=False is safe
            # (and faster) under scan per the jax.checkpoint docs.
            # "dots_nobatch" keeps the Dense projection outputs (dots with no
            # batch dims) saved so only the batched attention einsums are
            # recomputed — measured faster than "full" at flagship shapes.
            policy = (
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                if remat == "dots_nobatch"
                else None
            )
            layer_cls = nn.remat(layer_cls, prevent_cse=False, policy=policy)
        scan = nn.scan(
            layer_cls,
            variable_axes={"params": 0, "qscale": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(
                0,
                nn.broadcast,
                nn.broadcast,
                nn.broadcast,
                nn.broadcast,
                nn.broadcast,
                nn.broadcast,
            ),
            out_axes=0,
            length=self.num_layers,
            metadata_params={nn.meta.PARTITION_NAME: "layers"},
        )
        layer = scan(
            d_model=self.d_model,
            nhead=self.nhead,
            dim_feedforward=self.dim_feedforward,
            dropout=self.dropout,
            norm_first=self.norm_first,
            adaptive_norm=self.adaptive_norm,
            cross_attention=self.cross_attention,
            activation=self.activation,
            norm_type=self.norm_type,
            out_init_scale=self.out_init_scale,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            act_quant=self.act_quant,
            deterministic=deterministic,
            return_kv=return_kv,
            name="layers",
        )
        if kv_cache is not None and getattr(kv_cache[0], "ndim", 0) == 5:
            # Decode: stacked (L, B, C, H, Dh) cache in the carry; layers
            # consume their index as the scanned input.  2 leaves = bf16
            # cache (kc, vc); 4 leaves = int8 cache (kc, vc, ks, vs).
            (x, *new_leaves), _ = layer(
                (x, *kv_cache),
                jnp.arange(self.num_layers, dtype=jnp.int32),
                stage_emb,
                attn_bias,
                memory,
                memory_bias,
                cache_index,
                kv_lengths,
            )
            new_cache, kv = tuple(new_leaves), None
        else:
            if kv_cache is None:
                # nn.scan requires a scanned input; feed a dummy per-layer zero.
                kv_cache = jnp.zeros((self.num_layers,), dtype=jnp.int32)
            x, (new_cache, kv) = layer(
                x, kv_cache, stage_emb, attn_bias, memory, memory_bias,
                cache_index, kv_lengths,
            )
        if self.final_norm and self.norm_first:
            x = ConditionedNorm(
                self.d_model,
                adaptive=self.adaptive_norm,
                dtype=self.dtype,
                norm_type="balanced_basic"
                if self.norm_type == "identity"
                else self.norm_type,
                deterministic=deterministic,
                name="final_norm",
            )(x, stage_emb)
        return x, new_cache, kv
