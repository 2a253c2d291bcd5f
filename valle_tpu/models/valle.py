"""VALL-E / VALL-F neural codec language models, TPU-native.

Semantics parity with the reference implementation
(/root/reference/valle/models/valle.py):

  - ``VALLE``: GPT-style decoder-only prefix-LM over the concatenated
    [text ; audio] sequence (ref valle.py:722-760).
  - ``VALLF``: text as cross-attention memory, decoder over audio only
    (ref valle.py:49-720).
  - AR stage predicts EnCodec codebook 1 plus EOS (ref valle.py:153-155);
    NAR stages 2..Q refine codebooks with stage-conditioned AdaptiveLayerNorm
    and summed lower-codebook embeddings (ref valle.py:231-259, 335-393).
  - Loss construction: ``pad_y_eos`` EOS/pad handling (ref valle.py:322-333),
    NAR masked CE with prefix-length loss rescale (ref valle.py:934-943),
    prefix modes 0/1/2/4 (ref valle.py:335-393).

TPU-first design departures (behavior-preserving):
  - All shapes static: dynamic prefix lengths, NAR stage selection and
    prompt segments are expressed with masks / dynamic indexing over stacked
    parameters instead of Python-level slicing, so one XLA program serves a
    whole bucket.
  - The NAR codebook embeddings 2..Q live in one stacked (Q-1, V, D) table so
    the per-stage summed gather is a single fused lookup
    (ref loop at valle.py:354-361).
  - Inference is a compiled ``lax.while_loop`` with a KV-cache
    (the reference re-runs full attention per token, valle.py:1012-1057).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from valle_tpu.models.config import ModelConfig
from valle_tpu.nn.embedding import SinePositionalEmbedding, TokenEmbedding
from valle_tpu.nn.layers import TransformerStack
from valle_tpu.nn.qdense import Dense as QDense
from valle_tpu.ops import masks as mask_ops
from valle_tpu.ops.sampling import topk_sampling


def _cross_entropy_sum(
    logits: jnp.ndarray, targets: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """Summed CE over valid positions; logits (..., V), targets (...,) int."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid.astype(nll.dtype))


def _top10_hits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Per-position bool: target within top-10 logits (micro accuracy)."""
    tgt_logit = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    rank = jnp.sum((logits > tgt_logit[..., None]), axis=-1)
    return rank < 10


class ConvPrenet(nn.Module):
    """Text conv prenet: 3x(conv5 + BN + ReLU + dropout 0.5) + linear.

    Parity: ref models/valle.py:96-113.
    """

    d_model: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        for i in range(3):
            x = nn.Conv(
                self.d_model, kernel_size=(5,), padding="SAME", dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=deterministic, momentum=0.9, dtype=self.dtype,
                name=f"bn{i}",
            )(x)
            x = nn.relu(x)
            x = nn.Dropout(0.5)(x, deterministic=deterministic)
        return nn.Dense(self.d_model, dtype=self.dtype, name="proj")(x)


class MLPPrenet(nn.Module):
    """Audio prenet: d->256->256->d with ReLU + dropout 0.25.

    Parity: ref models/valle.py:115-123.
    """

    d_model: int
    hidden: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x))
        x = nn.Dropout(0.25)(x, deterministic=deterministic)
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="fc2")(x))
        x = nn.Dropout(0.25)(x, deterministic=deterministic)
        return nn.Dense(self.d_model, dtype=self.dtype, name="fc3")(x)


class VALLE(nn.Module):
    """Decoder-only VALL-E (set ``variant='vallf'`` for the cross-attention
    VALL-F layout)."""

    cfg: ModelConfig
    variant: str = "valle"  # "valle" | "vallf"

    @staticmethod
    def metric_names(train_stage: int):
        """Keys of the forward() output dict at this train stage (used by the
        train step to pre-shape the metric accumulator)."""
        return {
            0: ["loss", "ar_loss", "nar_loss", "ArTop10Accuracy",
                "NarTop10Accuracy", "frames"],
            1: ["loss", "ar_loss", "ArTop10Accuracy", "frames"],
            2: ["loss", "nar_loss", "NarTop10Accuracy", "frames"],
        }[train_stage]

    def setup(self):
        cfg = self.cfg
        d = cfg.decoder_dim
        nd = cfg.nar_decoder_dim
        dt = cfg.compute_dtype
        cross = self.variant == "vallf"

        self.ar_text_embedding = TokenEmbedding(d, cfg.num_text_tokens)
        self.ar_audio_embedding = TokenEmbedding(
            d, cfg.num_audio_tokens + 1 + int(cfg.prepend_bos)
        )
        if cfg.add_prenet:
            self.ar_text_prenet = ConvPrenet(d, dtype=dt)
            self.ar_audio_prenet = MLPPrenet(d, dtype=dt)
        self.ar_text_position = SinePositionalEmbedding(
            d, dropout=0.1, scale=False, alpha=True, max_len=cfg.max_len
        )
        self.ar_audio_position = SinePositionalEmbedding(
            d, dropout=0.1, scale=False, alpha=True, max_len=cfg.max_len
        )
        self.ar_decoder = TransformerStack(
            num_layers=cfg.num_layers,
            d_model=d,
            nhead=cfg.nhead,
            dim_feedforward=d * 4,
            dropout=cfg.dropout,
            norm_first=cfg.norm_first,
            adaptive_norm=False,
            cross_attention=cross,
            final_norm=cfg.norm_first,
            dtype=dt,
            attn_impl=cfg.attn_impl,
            act_quant=cfg.act_quant,
            remat=cfg.remat,
        )
        self.ar_predict_layer = QDense(
            cfg.num_audio_tokens + 1, use_bias=False, dtype=dt,
            act_quant=cfg.act_quant,
        )

        if cfg.num_quantizers > 1:
            q = cfg.num_quantizers
            v = cfg.num_audio_tokens
            self.nar_text_embedding = TokenEmbedding(nd, cfg.num_text_tokens)
            # codebook-1 table has the extra EOS/pad row (vocab V+1)
            self.nar_audio_embedding_0 = TokenEmbedding(nd, v + 1)
            # codebooks 2..Q stacked: (Q-1, V, nd)
            self.nar_audio_embeddings_rest = self.param(
                "nar_audio_embeddings_rest",
                nn.initializers.normal(1.0),
                (q - 1, v, nd),
            )
            if cfg.add_prenet:
                self.nar_text_prenet = ConvPrenet(nd, dtype=dt)
                self.nar_audio_prenet = MLPPrenet(nd, dtype=dt)
            self.nar_text_position = SinePositionalEmbedding(
                nd, dropout=0.0, scale=False, alpha=False, max_len=cfg.max_len
            )
            self.nar_audio_position = SinePositionalEmbedding(
                nd, dropout=0.1, scale=False, alpha=False, max_len=cfg.max_len
            )
            self.nar_decoder = TransformerStack(
                num_layers=cfg.nar_num_layers,
                d_model=nd,
                nhead=cfg.nar_nhead,
                dim_feedforward=nd * 4,
                dropout=cfg.dropout,
                norm_first=cfg.norm_first,
                adaptive_norm=True,
                cross_attention=cross,
                final_norm=cfg.norm_first,
                dtype=dt,
                attn_impl=cfg.attn_impl,
                act_quant=cfg.act_quant,
                remat=cfg.remat,
            )
            # Prediction weights, Dense-kernel layout (nd, V), stacked (Q-1,..).
            if cfg.share_embedding:
                # predict[j] ties to embedding table j+2 for j<=Q-3
                # (ref valle.py:261-271); only the last keeps its own weight.
                self.nar_predict_last = self.param(
                    "nar_predict_last",
                    nn.initializers.lecun_normal(),
                    (nd, v),
                )
            else:
                self.nar_predict_layers = self.param(
                    "nar_predict_layers",
                    nn.initializers.lecun_normal(),
                    (q - 1, nd, v),
                )
            self.nar_stage_embeddings = self.param(
                "nar_stage_embeddings", nn.initializers.normal(1.0), (q - 1, nd)
            )

    # ------------------------------------------------------------------ utils

    def _nar_predict_weights(self) -> jnp.ndarray:
        """(Q-1, nd, V) effective prediction kernels (with weight tying)."""
        cfg = self.cfg
        if cfg.share_embedding:
            tied = jnp.swapaxes(self.nar_audio_embeddings_rest[1:], 1, 2)
            return jnp.concatenate([tied, self.nar_predict_last[None]], axis=0)
        return self.nar_predict_layers

    def _rest_gather(self, codes_rest: jnp.ndarray, weights: jnp.ndarray):
        """Fused multi-codebook summed gather.

        codes_rest: (B, T, Q-1) tokens of codebooks 2..Q.
        weights: (..., Q-1) multiplier broadcastable to (B, T, Q-1).
        Returns (B, T, nd).  Replaces the reference's per-codebook embedding
        loop (ref valle.py:354-361) with a single flattened lookup.
        """
        qm1, v, nd = self.nar_audio_embeddings_rest.shape
        flat = self.nar_audio_embeddings_rest.reshape(qm1 * v, nd)
        idx = codes_rest + (jnp.arange(qm1, dtype=codes_rest.dtype) * v)[None, None, :]
        gathered = jnp.take(flat, idx, axis=0)  # (B, T, Q-1, nd)
        w = jnp.broadcast_to(weights, gathered.shape[:-1])
        # multiply+sum over the codebook axis: measured 1.7x over the
        # equivalent einsum at NAR train shapes, and a custom Pallas gather
        # has no room left (bench.py gather_probe, docs/perf_notes.md)
        return jnp.sum(gathered * w[..., None].astype(gathered.dtype), axis=2)

    def _ar_text(self, text: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        x = self.ar_text_embedding(text, deterministic=deterministic)
        if self.cfg.add_prenet:
            x = self.ar_text_prenet(x, deterministic=deterministic)
        return self.ar_text_position(x, deterministic=deterministic)

    def _ar_audio(
        self, tokens: jnp.ndarray, deterministic: bool, positions=None, offset=0
    ) -> jnp.ndarray:
        e = self.ar_audio_embedding(tokens, deterministic=deterministic)
        if self.cfg.add_prenet:
            e = self.ar_audio_prenet(e, deterministic=deterministic)
        return self.ar_audio_position(
            e, deterministic=deterministic, positions=positions, offset=offset
        )

    def _nar_text(self, text: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        x = self.nar_text_embedding(text, deterministic=deterministic)
        if self.cfg.add_prenet:
            x = self.nar_text_prenet(x, deterministic=deterministic)
        return self.nar_text_position(x, deterministic=deterministic)

    def _nar_audio_pos(
        self, y_emb: jnp.ndarray, deterministic: bool, positions=None
    ) -> jnp.ndarray:
        if self.cfg.add_prenet:
            y_emb = self.nar_audio_prenet(y_emb, deterministic=deterministic)
        return self.nar_audio_position(
            y_emb, deterministic=deterministic, positions=positions
        )

    def _pad_y_eos(self, codes0: jnp.ndarray, y_mask_int: jnp.ndarray):
        """Parity: ref valle.py:322-333. Returns (ar_in, ar_tgt, t_full)."""
        cfg = self.cfg
        b = codes0.shape[0]
        zeros = jnp.zeros((b, 1), dtype=codes0.dtype)
        ones = jnp.ones((b, 1), dtype=y_mask_int.dtype)
        t_full = jnp.concatenate([codes0, zeros], axis=1) + cfg.eos_id * jnp.concatenate(
            [y_mask_int, ones], axis=1
        )
        if cfg.prepend_bos:
            bos = jnp.full((b, 1), cfg.bos_id, dtype=codes0.dtype)
            ar_in = jnp.concatenate([bos, t_full[:, :-1]], axis=1)
            ar_tgt = t_full
        else:
            ar_in = t_full[:, :-1]
            ar_tgt = t_full[:, 1:]
        return ar_in, ar_tgt, t_full

    # ---------------------------------------------------------------- forward

    def __call__(
        self,
        x: jnp.ndarray,
        x_lens: jnp.ndarray,
        y: jnp.ndarray,
        y_lens: jnp.ndarray,
        *,
        train_stage: int = 0,
        deterministic: bool = False,
        nar_stage: Optional[jnp.ndarray] = None,
        prefix_len: Optional[jnp.ndarray] = None,
        prompt_starts: Optional[jnp.ndarray] = None,
        y_prompts_codes: Optional[jnp.ndarray] = None,
        example_mask: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Training/eval forward.  Shapes: x (B,S) int, y (B,T,Q) int.

        train_stage: 0 = AR+NAR, 1 = AR only, 2 = NAR only (ref trainer).
        Randomness (NAR stage choice, prefix lengths, prompt starts) is drawn
        from the 'stage' rng stream unless given explicitly (for golden tests).
        example_mask (B,) bool marks real rows; False rows are shape-padding
        (fixed-batch buckets) and contribute zero loss/metrics — the
        reference has no equivalent because eager GPU tolerates ragged B.
        Returns dict with summed losses and metric numerators.
        """
        cfg = self.cfg
        b, s = x.shape
        t = y.shape[1]
        x_mask = mask_ops.make_pad_mask(x_lens, s)
        y_mask = mask_ops.make_pad_mask(y_lens, t)
        y_mask_int = y_mask.astype(jnp.int32)
        codes = y.astype(jnp.int32) * (1 - y_mask_int[..., None])

        ar_in, ar_tgt, t_full = self._pad_y_eos(codes[..., 0], y_mask_int)
        max_y = jnp.max(y_lens)

        out: Dict[str, jnp.ndarray] = {}
        total_loss = jnp.zeros((), jnp.float32)

        if train_stage in (0, 1):
            ar_loss, ar_metric = self._forward_ar(
                x, x_mask, ar_in, ar_tgt, y_mask, max_y, y_lens, deterministic,
                example_mask=example_mask,
            )
            total_loss = total_loss + ar_loss
            out["ar_loss"] = ar_loss
            out.update(ar_metric)

        if cfg.num_quantizers > 1 and train_stage in (0, 2):
            if nar_stage is None:
                k = self.make_rng("stage")
                nar_stage = jax.random.randint(k, (), 1, cfg.num_quantizers)
            nar_loss, nar_metric = self._forward_nar(
                x,
                x_mask,
                codes,
                t_full,
                y_mask,
                y_lens,
                nar_stage,
                prefix_len,
                prompt_starts,
                y_prompts_codes,
                deterministic,
                example_mask=example_mask,
            )
            total_loss = total_loss + nar_loss
            out["nar_loss"] = nar_loss
            out.update(nar_metric)

        if train_stage == 0:
            total_loss = total_loss / 2.0
        out["loss"] = total_loss
        out["frames"] = jnp.sum(y_lens).astype(jnp.float32)
        return out

    def _forward_ar(
        self, x, x_mask, ar_in, ar_tgt, y_mask, max_y, y_lens, deterministic,
        example_mask=None,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        cfg = self.cfg
        b, s = x.shape
        ty = ar_in.shape[1]

        x_emb = self._ar_text(x, deterministic)
        y_emb = self._ar_audio(ar_in, deterministic)

        if cfg.prepend_bos:
            ar_y_mask = jnp.concatenate(
                [jnp.zeros((b, 1), bool), y_mask], axis=1
            )
        else:
            ar_y_mask = y_mask

        # Masks ride as structured AttnMaskSpec (key-validity row + static
        # prefix split): the fused Pallas kernel regenerates the structural
        # part in-kernel; XLA impls densify to the same bias as before.
        if self.variant == "valle":
            xy = jnp.concatenate([x_emb, y_emb], axis=1)
            key_pad = jnp.concatenate([x_mask, ar_y_mask], axis=1)
            bias = mask_ops.AttnMaskSpec(
                mask_ops.mask_to_bias(key_pad, jnp.float32), prefix_s=s
            )
            dec, _, _ = self.ar_decoder(
                xy, attn_bias=bias, deterministic=deterministic
            )
            dec_y = dec[:, s:]
        else:  # vallf: causal self-attn over audio, cross-attn to text
            bias = mask_ops.AttnMaskSpec(
                mask_ops.mask_to_bias(ar_y_mask, jnp.float32), prefix_s=0
            )
            mem_bias = mask_ops.AttnMaskSpec(
                mask_ops.mask_to_bias(x_mask, jnp.float32)
            )
            dec_y, _, _ = self.ar_decoder(
                y_emb,
                attn_bias=bias,
                memory=x_emb,
                memory_bias=mem_bias,
                deterministic=deterministic,
            )

        logits = self.ar_predict_layer(dec_y)  # (B, Ty, V+1)
        # Static-shape parity: the reference materializes t_full of length
        # max(y_lens)+1 (indices 0..max_y); positions past that exist only in
        # our padded buffers and are excluded from the loss.
        #   with bos:    targets = t_full        -> valid at index i <= max_y
        #   without bos: targets = t_full[:, 1:] -> valid at index i <  max_y
        pos = jnp.arange(ty)[None, :]
        valid = pos <= max_y if cfg.prepend_bos else pos < max_y
        valid = jnp.broadcast_to(valid, ar_tgt.shape)
        if example_mask is not None:
            valid = jnp.logical_and(valid, example_mask[:, None])

        loss = _cross_entropy_sum(logits, ar_tgt, valid)
        metric_valid = jnp.logical_and(valid, ar_tgt != cfg.eos_id)
        hits = jnp.logical_and(_top10_hits(logits, ar_tgt), metric_valid)
        acc = jnp.sum(hits) / jnp.maximum(jnp.sum(metric_valid), 1)
        metrics = {
            "ArTop10Accuracy": acc.astype(jnp.float32)
            * jnp.sum(y_lens).astype(jnp.float32)
        }
        return loss, metrics

    def _forward_nar(
        self,
        x,
        x_mask,
        codes,
        t_full,
        y_mask,
        y_lens,
        nar_stage,
        prefix_len,
        prompt_starts,
        y_prompts_codes,
        deterministic,
        example_mask=None,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        cfg = self.cfg
        b, s = x.shape
        # min/count over REAL rows only — shape-padding rows (y_lens 0) must
        # not collapse the prefix-length draw or inflate the loss rescale
        if example_mask is not None:
            min_y_lens = jnp.min(jnp.where(example_mask, y_lens, jnp.iinfo(jnp.int32).max))
            n_rows = jnp.sum(example_mask.astype(jnp.float32))
        else:
            min_y_lens = jnp.min(y_lens)
            n_rows = jnp.asarray(float(b), jnp.float32)
        t = y_mask.shape[1]
        q = cfg.num_quantizers
        eos = cfg.eos_id
        mode = cfg.prefix_mode

        y_nar_in = t_full[:, :-1]  # codebook-0 tokens with EOS at padding
        x_emb = self._nar_text(x, deterministic)
        stage_emb = jax.lax.dynamic_index_in_dim(
            self.nar_stage_embeddings, nar_stage - 1, axis=0, keepdims=True
        )  # (1, nd)

        codes_rest = codes[..., 1:]  # (B, T, Q-1)
        j_idx = jnp.arange(1, q)  # codebook index of each stacked table
        stage_w = (j_idx[None, None, :] < nar_stage).astype(jnp.float32)

        targets = jnp.take_along_axis(
            codes, jnp.broadcast_to(nar_stage, (b, t))[..., None], axis=-1
        )[..., 0]
        targets = targets + eos * y_mask.astype(targets.dtype)

        rescale_prefix = jnp.zeros((), jnp.float32)  # prefix_len used in rescale

        if mode == 0:
            y_emb = self.nar_audio_embedding_0(
                y_nar_in, deterministic=deterministic
            ) + self._rest_gather(codes_rest, stage_w)
            seq_prompt_len = 0
            prompt_emb = None
            prompt_mask = None
            positions = None
            tgt_ignore_extra = jnp.zeros_like(y_mask)
        elif mode == 1:
            if prefix_len is None:
                int_low = (0.25 * min_y_lens).astype(jnp.int32)
                k = self.make_rng("stage")
                prefix_len = jax.random.randint(
                    k, (), int_low, jnp.maximum(int_low * 2, int_low + 1)
                )
                prefix_len = jnp.minimum(prefix_len, cfg.max_prefix_len)
            pos_t = jnp.arange(t)[None, :]
            in_prefix = pos_t < prefix_len  # (1, T)
            # weight = 1 if pos<prefix (all codebooks) or codebook<stage
            w = jnp.logical_or(
                in_prefix[0][None, :, None], (j_idx[None, None, :] < nar_stage)
            ).astype(jnp.float32)
            y_emb = self.nar_audio_embedding_0(
                y_nar_in, deterministic=deterministic
            ) + self._rest_gather(codes_rest, w)
            seq_prompt_len = 0
            prompt_emb = None
            prompt_mask = None
            positions = None
            tgt_ignore_extra = jnp.broadcast_to(in_prefix, (b, t))
            rescale_prefix = prefix_len.astype(jnp.float32)
        elif mode in (2, 4):
            if mode == 2:
                pcap = min(cfg.max_prefix_len, t)
                if prefix_len is None:
                    prefix_len = jnp.minimum(
                        pcap, (0.25 * min_y_lens).astype(jnp.int32)
                    )
                if prompt_starts is None:
                    k = self.make_rng("stage")
                    prompt_starts = jax.random.randint(
                        k, (b,), 0, jnp.maximum(y_lens - prefix_len + 1, 1)
                    )
                # gather the random segment per sequence
                seg_pos = prompt_starts[:, None] + jnp.arange(pcap)[None, :]
                seg_pos = jnp.clip(seg_pos, 0, t - 1)
                prompt_codes = jnp.take_along_axis(
                    codes, seg_pos[..., None], axis=1
                )  # (B, pcap, Q)
                prompt_valid = jnp.arange(pcap)[None, :] < prefix_len
                # the sampled segment of the target codebook is excluded
                pos_t = jnp.arange(t)[None, :]
                in_seg = jnp.logical_and(
                    pos_t >= prompt_starts[:, None],
                    pos_t < prompt_starts[:, None] + prefix_len,
                )
                tgt_ignore_extra = in_seg
                rescale_prefix = prefix_len.astype(jnp.float32)
            else:  # mode 4: prompts supplied, equal length across batch
                assert y_prompts_codes is not None
                pcap = y_prompts_codes.shape[1]
                prompt_codes = y_prompts_codes.astype(jnp.int32)
                prefix_len = jnp.asarray(pcap, jnp.int32)
                prompt_valid = jnp.ones((1, pcap), bool)
                tgt_ignore_extra = jnp.zeros_like(y_mask)
                rescale_prefix = jnp.zeros((), jnp.float32)  # ref resets (927-928)

            all_w = jnp.ones((1, 1, q - 1), jnp.float32)
            prompt_emb = self.nar_audio_embedding_0(
                prompt_codes[..., 0], deterministic=deterministic
            ) + self._rest_gather(prompt_codes[..., 1:], all_w)
            y_emb = self.nar_audio_embedding_0(
                y_nar_in, deterministic=deterministic
            ) + self._rest_gather(codes_rest, stage_w)
            prompt_mask = jnp.broadcast_to(
                jnp.logical_not(prompt_valid), (b, pcap)
            )
            seq_prompt_len = pcap
            # positions: prompt 0..pcap-1 (pads beyond prefix_len are masked),
            # y region continues at prefix_len (ref concat at valle.py:362,389)
            positions = jnp.concatenate(
                [
                    jnp.broadcast_to(jnp.arange(pcap)[None, :], (b, pcap)),
                    prefix_len + jnp.broadcast_to(jnp.arange(t)[None, :], (b, t)),
                ],
                axis=1,
            )
        else:
            raise ValueError(f"prefix_mode {mode}")

        if prompt_emb is not None:
            y_full = jnp.concatenate([prompt_emb, y_emb], axis=1)
            y_pad = jnp.concatenate([prompt_mask, y_mask], axis=1)
        else:
            y_full = y_emb
            y_pad = y_mask
            positions = None

        y_pos = self._nar_audio_pos(y_full, deterministic, positions=positions)

        if self.variant == "valle":
            xy = jnp.concatenate([x_emb, y_pos], axis=1)
            key_pad = jnp.concatenate([x_mask, y_pad], axis=1)
            bias = mask_ops.AttnMaskSpec(
                mask_ops.mask_to_bias(key_pad, jnp.float32)
            )
            dec, _, _ = self.nar_decoder(
                xy, stage_emb=stage_emb, attn_bias=bias, deterministic=deterministic
            )
            dec_y = dec[:, s + seq_prompt_len :]
        else:
            bias = mask_ops.AttnMaskSpec(
                mask_ops.mask_to_bias(y_pad, jnp.float32)
            )
            mem_bias = mask_ops.AttnMaskSpec(
                mask_ops.mask_to_bias(x_mask, jnp.float32)
            )
            dec, _, _ = self.nar_decoder(
                y_pos,
                stage_emb=stage_emb,
                attn_bias=bias,
                memory=x_emb,
                memory_bias=mem_bias,
                deterministic=deterministic,
            )
            dec_y = dec[:, seq_prompt_len:]

        w_pred = jax.lax.dynamic_index_in_dim(
            self._nar_predict_weights(), nar_stage - 1, axis=0, keepdims=False
        )  # (nd, V)
        logits = jnp.einsum("btd,dv->btv", dec_y, w_pred.astype(dec_y.dtype))

        ignore = jnp.logical_or(targets == eos, tgt_ignore_extra)
        valid = jnp.logical_not(ignore)
        loss = _cross_entropy_sum(logits, jnp.where(valid, targets, 0), valid)
        total_length = jnp.sum(y_lens).astype(jnp.float32)
        loss = loss * (
            total_length / (total_length - rescale_prefix * n_rows)
        )

        hits = jnp.logical_and(_top10_hits(logits, targets), valid)
        acc = jnp.sum(hits) / jnp.maximum(jnp.sum(valid), 1)
        metrics = {
            "NarTop10Accuracy": acc.astype(jnp.float32) * total_length
        }
        return loss, metrics

    def visualize_forward(self, x, x_lens, y, y_lens):
        """Deterministic hidden states for eval visualization
        (ref visualizer.py:26-106 wants encoder/decoder outputs): returns
        (text-encoder output (B,S,D), AR decoder output over the audio
        region (B,Ty,D))."""
        b, s = x.shape
        x_mask = mask_ops.make_pad_mask(x_lens, s)
        y_mask = mask_ops.make_pad_mask(y_lens, y.shape[1])
        y_mask_int = y_mask.astype(jnp.int32)
        codes = y.astype(jnp.int32) * (1 - y_mask_int[..., None])
        ar_in, _, _ = self._pad_y_eos(codes[..., 0], y_mask_int)
        x_emb = self._ar_text(x, True)
        y_emb = self._ar_audio(ar_in, True)
        ty = ar_in.shape[1]
        ar_y_mask = (
            jnp.concatenate([jnp.zeros((b, 1), bool), y_mask], axis=1)
            if self.cfg.prepend_bos
            else y_mask
        )
        if self.variant == "valle":
            struct = mask_ops.prefix_lm_attn_mask(s, ty)
            key_pad = jnp.concatenate([x_mask, ar_y_mask], axis=1)
            bias = mask_ops.mask_to_bias(
                mask_ops.merge_padding(struct, key_pad), jnp.float32
            )
            dec, _, _ = self.ar_decoder(
                jnp.concatenate([x_emb, y_emb], axis=1),
                attn_bias=bias,
                deterministic=True,
            )
            dec_y = dec[:, s:]
        else:
            struct = mask_ops.causal_mask(ty)
            bias = mask_ops.mask_to_bias(
                mask_ops.merge_padding(struct, ar_y_mask), jnp.float32
            )
            mem_bias = mask_ops.mask_to_bias(x_mask[:, None, None, :], jnp.float32)
            dec_y, _, _ = self.ar_decoder(
                y_emb, attn_bias=bias, memory=x_emb, memory_bias=mem_bias,
                deterministic=True,
            )
        return x_emb, dec_y

    # ---------------------------------------------------------------- decode
    # The methods below are the param-touching pieces of the compiled
    # sampling loop; orchestration (while_loop, stop conditions, cache
    # layout) lives in valle_tpu.sample.  The reference re-runs the full
    # decoder per token with no cache (ref valle.py:1012-1057); here prefill
    # writes a KV-cache once and each step attends over it.

    def ar_prefill(
        self,
        x: jnp.ndarray,
        audio_tokens: jnp.ndarray,
        audio_positions: jnp.ndarray,
        bias: jnp.ndarray,
        memory_bias: Optional[jnp.ndarray] = None,
    ):
        """Prefill pass; returns (last-position logits, per-layer (k, v) of
        shape (L, B, Tpre, H, Dh), memory-or-None).

        VALL-E: full forward over [text ; audio-prompt] with the prefix-LM
        mask.  VALL-F: causal self-attention over the audio prompt with
        cross-attention into the text memory (ref valle.py:608-651)."""
        x_emb = self._ar_text(x, True)
        y_emb = self._ar_audio(audio_tokens, True, positions=audio_positions)
        if self.variant == "valle":
            seq = jnp.concatenate([x_emb, y_emb], axis=1)
            dec, _, kv = self.ar_decoder(
                seq, attn_bias=bias, deterministic=True, return_kv=True
            )
            memory = None
        else:
            dec, _, kv = self.ar_decoder(
                y_emb,
                attn_bias=bias,
                memory=x_emb,
                memory_bias=memory_bias,
                deterministic=True,
                return_kv=True,
            )
            memory = x_emb
        logits = self.ar_predict_layer(dec[:, -1])
        return logits, kv, memory

    def ar_decode_step(
        self,
        tok: jnp.ndarray,
        positions: jnp.ndarray,
        kv_cache,
        cache_index,
        bias: jnp.ndarray,
        memory: Optional[jnp.ndarray] = None,
        memory_bias: Optional[jnp.ndarray] = None,
        kv_lengths: Optional[jnp.ndarray] = None,
    ):
        """One decode step: tok (B, 1) -> (logits (B, V+1), updated cache).

        ``kv_lengths`` (B,) routes the cache read through the ragged Pallas
        decode kernel (per-slot length-clipped KV reads; finished slots with
        length 0 read nothing) — see ops/ragged_decode.py."""
        emb = self._ar_audio(tok, True, positions=positions)
        dec, new_cache, _ = self.ar_decoder(
            emb,
            kv_cache,
            attn_bias=bias,
            memory=memory,
            memory_bias=memory_bias,
            cache_index=cache_index,
            kv_lengths=kv_lengths,
            deterministic=True,
        )
        return self.ar_predict_layer(dec[:, 0]), new_cache

    def nar_text_encode(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._nar_text(x, True)

    def nar_embed0(self, tokens: jnp.ndarray) -> jnp.ndarray:
        return self.nar_audio_embedding_0(tokens, deterministic=True)

    def nar_embed_rest(self, j: int, tokens: jnp.ndarray) -> jnp.ndarray:
        """Embedding through stacked table j (codebook j+2), static j."""
        return jnp.take(self.nar_audio_embeddings_rest[j], tokens, axis=0)

    def nar_forward_stage(
        self,
        i: int,
        y_emb: jnp.ndarray,
        positions: jnp.ndarray,
        x_emb: jnp.ndarray,
        bias: jnp.ndarray,
        gen_start: int,
        memory_bias: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """One NAR refinement pass for static stage index i (0..Q-2);
        returns greedy samples over the generated region."""
        stage_emb = self.nar_stage_embeddings[i][None]
        y_pos = self._nar_audio_pos(y_emb, True, positions=positions)
        if self.variant == "valle":
            xy = jnp.concatenate([x_emb, y_pos], axis=1)
            dec, _, _ = self.nar_decoder(
                xy, stage_emb=stage_emb, attn_bias=bias, deterministic=True
            )
        else:
            dec, _, _ = self.nar_decoder(
                y_pos,
                stage_emb=stage_emb,
                attn_bias=bias,
                memory=x_emb,
                memory_bias=memory_bias,
                deterministic=True,
            )
        w = self._nar_predict_weights()[i]
        logits = jnp.einsum("btd,dv->btv", dec[:, gen_start:], w.astype(dec.dtype))
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)


class VALLF(VALLE):
    variant: str = "vallf"
