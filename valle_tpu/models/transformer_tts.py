"""Encoder-decoder Transformer TTS baseline (text -> mel).

Parity: ref valle/models/transformer.py:41-394 — phoneme encoder, mel decoder
with causal self-attention + cross-attention, mel MSE loss plus stop-token BCE
with positive weight 100 (ref transformer.py:298-318), and an autoregressive
mel inference loop (ref transformer.py:356-383).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from valle_tpu.models.config import ModelConfig
from valle_tpu.nn.embedding import SinePositionalEmbedding, TokenEmbedding
from valle_tpu.nn.layers import TransformerStack
from valle_tpu.ops import masks as mask_ops


class TransformerTTS(nn.Module):
    cfg: ModelConfig

    @staticmethod
    def metric_names(train_stage: int):
        del train_stage  # the baseline has no AR/NAR stages
        return ["loss", "mel_loss", "stop_loss", "frames"]

    def setup(self):
        cfg = self.cfg
        d = cfg.decoder_dim
        dt = cfg.compute_dtype
        sx = cfg.scaling_xformers
        # scaling_xformers variant (ref transformer.py:74-131): ScaledLinear
        # projections (output scale 0.01), BalancedDoubleSwish activation,
        # IdentityNorm/BalancedBasicNorm layout.
        stack_kw = dict(
            num_layers=cfg.num_layers,
            d_model=d,
            nhead=cfg.nhead,
            dim_feedforward=d * 4,
            dropout=cfg.dropout,
            norm_first=cfg.norm_first,
            final_norm=cfg.norm_first,
            activation="balanced_double_swish" if sx else "relu",
            norm_type="identity" if sx else "layer",
            out_init_scale=0.01 if sx else 1.0,
            dtype=dt,
            attn_impl=cfg.attn_impl,
            remat=cfg.remat,
        )
        self.text_embedding = TokenEmbedding(d, cfg.num_text_tokens)
        self.text_position = SinePositionalEmbedding(
            d, dropout=0.1, scale=False, alpha=True, max_len=cfg.max_len
        )
        self.encoder = TransformerStack(**stack_kw)
        if sx:
            # single ScaledLinear mel projection (ref transformer.py:60-63)
            self.decoder_prenet_fc = nn.Dense(d, dtype=dt)
        else:
            # mel prenet: 256-dim bottleneck (ref transformer.py:188-210)
            self.decoder_prenet_fc1 = nn.Dense(256, dtype=dt)
            self.decoder_prenet_fc2 = nn.Dense(256, dtype=dt)
            self.decoder_prenet_fc3 = nn.Dense(d, dtype=dt)
            self.prenet_dropout = nn.Dropout(0.5)
        self.decoder_position = SinePositionalEmbedding(
            d, dropout=0.1, scale=False, alpha=True, max_len=cfg.max_len
        )
        self.decoder = TransformerStack(cross_attention=True, **stack_kw)
        self.predict_layer = nn.Dense(cfg.num_mel_bins, dtype=dt)
        self.stop_layer = nn.Dense(1, dtype=dt)

    def _prenet(self, mel, deterministic):
        if self.cfg.scaling_xformers:
            return self.decoder_prenet_fc(mel)
        # dropout is applied even at inference in Tacotron-style prenets; the
        # reference uses plain Dropout layers, so honor `deterministic`.
        h = nn.relu(self.decoder_prenet_fc1(mel))
        h = self.prenet_dropout(h, deterministic=deterministic)
        h = nn.relu(self.decoder_prenet_fc2(h))
        h = self.prenet_dropout(h, deterministic=deterministic)
        return self.decoder_prenet_fc3(h)

    def encode(self, x, x_mask, deterministic):
        h = self.text_embedding(x, deterministic=deterministic)
        h = self.text_position(h, deterministic=deterministic)
        bias = mask_ops.mask_to_bias(x_mask[:, None, None, :], jnp.float32)
        enc, _, _ = self.encoder(h, attn_bias=bias, deterministic=deterministic)
        return enc

    def __call__(
        self,
        x: jnp.ndarray,
        x_lens: jnp.ndarray,
        y: jnp.ndarray,
        y_lens: jnp.ndarray,
        *,
        train_stage: int = 0,
        deterministic: bool = False,
        example_mask: jnp.ndarray = None,
        **_: object,
    ) -> Dict[str, jnp.ndarray]:
        """x (B,S) int tokens; y (B,T,M) float mels.  ``example_mask`` marks
        real rows (False = shape-padding dummy, excluded from the loss)."""
        del train_stage
        cfg = self.cfg
        b, s = x.shape
        t = y.shape[1]
        x_mask = mask_ops.make_pad_mask(x_lens, s)
        y_mask = mask_ops.make_pad_mask(y_lens, t)
        if example_mask is not None:
            y_mask = jnp.logical_or(
                y_mask, jnp.logical_not(example_mask)[:, None]
            )

        enc = self.encode(x, x_mask, deterministic)

        # teacher forcing: shift mel right with a zero frame
        y_in = jnp.concatenate([jnp.zeros_like(y[:, :1]), y[:, :-1]], axis=1)
        h = self._prenet(y_in, deterministic)
        h = self.decoder_position(h, deterministic=deterministic)

        struct = mask_ops.causal_mask(t)
        bias = mask_ops.mask_to_bias(
            mask_ops.merge_padding(struct, y_mask), jnp.float32
        )
        mem_bias = mask_ops.mask_to_bias(x_mask[:, None, None, :], jnp.float32)
        dec, _, _ = self.decoder(
            h,
            attn_bias=bias,
            memory=enc,
            memory_bias=mem_bias,
            deterministic=deterministic,
        )
        mel_pred = self.predict_layer(dec)
        stop_logit = self.stop_layer(dec)[..., 0]

        valid = jnp.logical_not(y_mask).astype(jnp.float32)
        mel_loss = jnp.sum(
            ((mel_pred - y) ** 2) * valid[..., None]
        ) / jnp.maximum(jnp.sum(valid) * cfg.num_mel_bins, 1.0)
        # stop target: 1 at the last valid frame and beyond
        stop_tgt = (
            jnp.arange(t)[None, :] >= (y_lens - 1)[:, None]
        ).astype(jnp.float32)
        # BCE with positive weight 100 (ref transformer.py:314-318)
        logp = jax.nn.log_sigmoid(stop_logit)
        logq = jax.nn.log_sigmoid(-stop_logit)
        bce = -(100.0 * stop_tgt * logp + (1 - stop_tgt) * logq)
        loss_mask = jnp.arange(t)[None, :] < jnp.maximum(
            y_lens[:, None], 1
        )
        if example_mask is not None:
            loss_mask = jnp.logical_and(loss_mask, example_mask[:, None])
        stop_loss = jnp.sum(bce * loss_mask) / jnp.maximum(
            jnp.sum(loss_mask), 1.0
        )
        loss = mel_loss + stop_loss
        return {
            "loss": loss,
            "mel_loss": mel_loss,
            "stop_loss": stop_loss,
            "frames": jnp.sum(y_lens).astype(jnp.float32),
        }

    def inference(
        self,
        x: jnp.ndarray,
        x_lens: jnp.ndarray,
        *,
        max_steps: int = 1000,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """Autoregressive greedy mel decoding (ref transformer.py:320-383).

        Full-recompute loop (no KV-cache) as scan over step index; the
        baseline is a debug model so simplicity wins over speed here.
        """
        cfg = self.cfg
        b, s = x.shape
        x_mask = mask_ops.make_pad_mask(x_lens, s)
        enc = self.encode(x, x_mask, deterministic)
        mem_bias = mask_ops.mask_to_bias(x_mask[:, None, None, :], jnp.float32)

        mels = jnp.zeros((b, max_steps + 1, cfg.num_mel_bins), enc.dtype)
        struct = mask_ops.causal_mask(max_steps + 1)

        def step(carry, i):
            mels, done, length = carry
            h = self._prenet(mels, deterministic)
            h = self.decoder_position(h, deterministic=deterministic)
            step_mask = jnp.arange(max_steps + 1)[None, :] > i
            bias = mask_ops.mask_to_bias(
                jnp.logical_or(struct[None, None], step_mask[:, None, None, :]),
                jnp.float32,
            )
            dec, _, _ = self.decoder(
                h,
                attn_bias=bias,
                memory=enc,
                memory_bias=mem_bias,
                deterministic=deterministic,
            )
            frame = self.predict_layer(dec[:, i])
            stop = jax.nn.sigmoid(self.stop_layer(dec[:, i])[..., 0]) > 0.5
            mels = jax.lax.dynamic_update_slice(
                mels, frame[:, None, :], (0, i + 1, 0)
            )
            new_done = jnp.logical_or(done, stop)
            length = jnp.where(jnp.logical_and(~done, new_done), i + 1, length)
            return (mels, new_done, length), None

        (mels, done, length), _ = jax.lax.scan(
            step,
            (mels, jnp.zeros((b,), bool), jnp.full((b,), max_steps, jnp.int32)),
            jnp.arange(max_steps),
        )
        return {"mel": mels[:, 1:], "lengths": length}
