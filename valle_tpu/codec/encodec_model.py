"""EnCodec 24 kHz neural codec in JAX: SEANet encoder/decoder + 2-layer LSTM
bottleneck + residual vector quantizer.

Replaces the reference's external PyTorch ``encodec`` dependency
(ref /root/reference/valle/data/tokenizer.py:211-268): wav -> 8x1024-way
codes at 75 Hz and back.  Weight-norm is folded at conversion time, the
functional equivalent of ``remove_encodec_weight_norm``
(ref tokenizer.py:181-208).

Architecture parity target is the public EnCodec model as shipped in
transformers' modeling_encodec.py (facebook/encodec_24khz config): causal
convs with reflect padding and the exact extra-padding rule, ConvTranspose
with right-trim, residual blocks with conv shortcuts, LSTM with residual add,
Euclidean-codebook RVQ.  Pure functions over a params pytree (channels-last
NWC layout) so everything jits cleanly on TPU; the sequential LSTM runs as a
``lax.scan`` over time.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class EncodecConfig:
    sampling_rate: int = 24000
    audio_channels: int = 1
    num_filters: int = 32
    hidden_size: int = 128
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_growth_rate: int = 2
    num_residual_layers: int = 1
    upsampling_ratios: Tuple[int, ...] = (8, 5, 4, 2)
    compress: int = 2
    num_lstm_layers: int = 2
    codebook_size: int = 1024
    codebook_dim: int = 128
    num_quantizers: int = 32
    use_causal_conv: bool = True
    pad_mode: str = "reflect"
    trim_right_ratio: float = 1.0

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.upsampling_ratios))

    @property
    def frame_rate(self) -> int:
        return int(math.ceil(self.sampling_rate / self.hop_length))

    def num_q_for_bandwidth(self, bandwidth: Optional[float]) -> int:
        bw_per_q = math.log2(self.codebook_size) * self.frame_rate
        if bandwidth is not None and bandwidth > 0.0:
            return int(max(1, math.floor(bandwidth * 1000 / bw_per_q)))
        return self.num_quantizers


# ----------------------------------------------------------------- primitives


def _pad1d(x: jnp.ndarray, left: int, right: int, mode: str) -> jnp.ndarray:
    """Pad time axis of (B, T, C); reflect with the small-input zero-pad fix
    (transformers modeling_encodec._pad1d)."""
    if mode != "reflect":
        return jnp.pad(x, ((0, 0), (left, right), (0, 0)))
    length = x.shape[1]
    max_pad = max(left, right)
    extra = 0
    if length <= max_pad:
        extra = max_pad - length + 1
        x = jnp.pad(x, ((0, 0), (0, extra), (0, 0)))
    x = jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="reflect")
    if extra:
        x = x[:, : x.shape[1] - extra]
    return x


def causal_conv1d(
    params: Dict,
    x: jnp.ndarray,
    *,
    stride: int = 1,
    dilation: int = 1,
    cfg: EncodecConfig,
) -> jnp.ndarray:
    """x (B, T, Cin) -> (B, T', Cout); params {w: (k, in, out), b: (out,)}."""
    w, b = params["w"], params["b"]
    k = w.shape[0]
    k_eff = (k - 1) * dilation + 1
    padding_total = k_eff - stride
    length = x.shape[1]
    n_frames = math.ceil((length - k_eff + padding_total) / stride + 1) - 1
    ideal = n_frames * stride + k_eff - padding_total
    extra = ideal - length
    if cfg.use_causal_conv:
        x = _pad1d(x, padding_total, extra, cfg.pad_mode)
    else:
        pr = padding_total // 2
        x = _pad1d(x, padding_total - pr, pr + extra, cfg.pad_mode)
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out + b[None, None, :]


def causal_conv_transpose1d(
    params: Dict, x: jnp.ndarray, *, stride: int, cfg: EncodecConfig
) -> jnp.ndarray:
    """ConvTranspose with causal right-trim; params {w: (k, out, in), b}."""
    w, b = params["w"], params["b"]
    k = w.shape[0]
    out = jax.lax.conv_transpose(
        x,
        w,
        strides=(stride,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        transpose_kernel=True,
    )
    out = out + b[None, None, :]
    padding_total = k - stride
    if cfg.use_causal_conv:
        pr = math.ceil(padding_total * cfg.trim_right_ratio)
    else:
        pr = padding_total // 2
    pl = padding_total - pr
    return out[:, pl : out.shape[1] - pr]


def lstm_stack(
    params: List[Dict], x: jnp.ndarray, *, unroll: int = 16
) -> jnp.ndarray:
    """num_lstm_layers LSTM over (B, T, C) with residual add (EncodecLSTM).

    Each layer params: {wi (4H, C), wh (4H, H), bi (4H,), bh (4H,)} in torch
    gate order (i, f, g, o).

    TPU shaping: the input projection ``x @ wi.T + bi`` has no sequential
    dependence, so it is hoisted out of the scan into one (B, T, C) x
    (C, 4H) matmul — only the (B, H) x (H, 4H) hidden matmul remains in the
    recurrence.  The scan is unrolled (default 16) to amortize per-step
    loop overhead; both together are what the decode-direction throughput
    rides on (75 sequential steps per audio-second at the bottleneck's
    frame rate, docs/perf_notes.md round-4 decode table; unroll 16 measured
    best at B=64, ~1.7x over unroll 1).
    """
    residual = x
    h = x
    for layer in params:
        wi, wh, bi, bh = layer["wi"], layer["wh"], layer["bi"], layer["bh"]
        hidden = wh.shape[1]
        b = h.shape[0]
        # (B, T, 4H) precomputed gate inputs, scanned over T
        xin = jnp.swapaxes(h @ wi.T + bi, 0, 1)
        whT = wh.T

        def step(carry, xt, whT=whT, bh=bh):
            hprev, cprev = carry
            gates = xt + hprev @ whT + bh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * cprev + jax.nn.sigmoid(i) * jnp.tanh(g)
            hnew = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (hnew, c), hnew

        init = (
            jnp.zeros((b, hidden), h.dtype),
            jnp.zeros((b, hidden), h.dtype),
        )
        _, out = jax.lax.scan(step, init, xin, unroll=unroll)
        h = jnp.swapaxes(out, 0, 1)
    return h + residual


def resnet_block(
    params: Dict, x: jnp.ndarray, *, dilations: Tuple[int, int], cfg: EncodecConfig
) -> jnp.ndarray:
    """SEANet residual block: ELU-conv(k3,dil)-ELU-conv(k1) + conv shortcut."""
    h = jax.nn.elu(x)
    h = causal_conv1d(params["block_1"], h, dilation=dilations[0], cfg=cfg)
    h = jax.nn.elu(h)
    h = causal_conv1d(params["block_3"], h, dilation=dilations[1], cfg=cfg)
    sc = causal_conv1d(params["shortcut"], x, cfg=cfg)
    return sc + h


# ------------------------------------------------------------ encoder/decoder


def encode_latents(params: Dict, wav: jnp.ndarray, cfg: EncodecConfig) -> jnp.ndarray:
    """wav (B, T, channels) -> latents (B, T', hidden_size)."""
    enc = params["encoder"]
    h = causal_conv1d(enc["layers_0"], wav, cfg=cfg)
    idx = 1
    for ratio in reversed(cfg.upsampling_ratios):
        for j in range(cfg.num_residual_layers):
            h = resnet_block(
                enc[f"layers_{idx}"],
                h,
                dilations=(cfg.dilation_growth_rate**j, 1),
                cfg=cfg,
            )
            idx += 1
        idx += 1  # ELU occupies a layer index
        h = jax.nn.elu(h)
        h = causal_conv1d(enc[f"layers_{idx}"], h, stride=ratio, cfg=cfg)
        idx += 1
    h = lstm_stack(enc[f"layers_{idx}"], h)
    idx += 2  # lstm + elu
    h = jax.nn.elu(h)
    h = causal_conv1d(enc[f"layers_{idx}"], h, cfg=cfg)
    return h


def decode_latents(params: Dict, latents: jnp.ndarray, cfg: EncodecConfig) -> jnp.ndarray:
    """latents (B, T', hidden) -> wav (B, T, channels)."""
    dec = params["decoder"]
    h = causal_conv1d(dec["layers_0"], latents, cfg=cfg)
    h = lstm_stack(dec["layers_1"], h)
    idx = 2
    for ratio in cfg.upsampling_ratios:
        idx += 1  # ELU
        h = jax.nn.elu(h)
        h = causal_conv_transpose1d(dec[f"layers_{idx}"], h, stride=ratio, cfg=cfg)
        idx += 1
        for j in range(cfg.num_residual_layers):
            h = resnet_block(
                dec[f"layers_{idx}"],
                h,
                dilations=(cfg.dilation_growth_rate**j, 1),
                cfg=cfg,
            )
            idx += 1
    h = jax.nn.elu(h)  # layer index idx is the ELU; final conv is idx + 1
    h = causal_conv1d(dec[f"layers_{idx + 1}"], h, cfg=cfg)
    return h


# ------------------------------------------------------------------ quantizer


def rvq_encode(
    codebooks: jnp.ndarray, latents: jnp.ndarray, num_q: int
) -> jnp.ndarray:
    """codebooks (NQ, V, D), latents (B, T, D) -> codes (B, T, num_q)."""

    def one_stage(residual, cb):
        # dist = -(||x||^2 - 2 x.e + ||e||^2); argmax == nearest
        dots = jnp.einsum("btd,vd->btv", residual, cb)
        d2 = jnp.sum(residual**2, -1, keepdims=True) - 2 * dots + jnp.sum(
            cb**2, -1
        )[None, None, :]
        idx = jnp.argmin(d2, axis=-1)
        quant = jnp.take(cb, idx, axis=0)
        return residual - quant, idx

    codes = []
    residual = latents
    for q in range(num_q):
        residual, idx = one_stage(residual, codebooks[q])
        codes.append(idx)
    return jnp.stack(codes, axis=-1).astype(jnp.int32)


def rvq_decode(codebooks: jnp.ndarray, codes: jnp.ndarray) -> jnp.ndarray:
    """codes (B, T, Q) -> latents (B, T, D): sum of codebook embeddings.

    One flattened (Q*V, D) gather + sum instead of Q separate table reads
    (the same trick as the model's multi-codebook ``_rest_gather``).
    """
    q = codes.shape[-1]
    v, d = codebooks.shape[1], codebooks.shape[2]
    flat = codebooks[:q].reshape(q * v, d)
    idx = codes + (jnp.arange(q, dtype=codes.dtype) * v)[None, None, :]
    return jnp.sum(jnp.take(flat, idx, axis=0), axis=2)


# ------------------------------------------------------------------ public api


class EncodecJax:
    """Functional EnCodec: construct with a params tree (see convert.py)."""

    def __init__(
        self,
        params: Dict,
        cfg: Optional[EncodecConfig] = None,
        decode_dtype: str = "float32",
    ):
        """``decode_dtype="bfloat16"`` runs the DECODE direction in bf16
        (decoder weights pre-cast once): halves the decode weight/activation
        HBM traffic for serving.  Opt-in — the waveform differs from fp32 at
        the bf16 rounding level; encode always stays fp32 so token
        sequences are unaffected."""
        self.params = params
        self.cfg = cfg or EncodecConfig()
        self.decode_dtype = jnp.dtype(decode_dtype)
        if self.decode_dtype != jnp.float32:
            dec = jax.tree.map(
                lambda a: jnp.asarray(a, self.decode_dtype), params["decoder"]
            )
            self._params_dec = {**params, "decoder": dec}
        else:
            self._params_dec = params
        self._encode = jax.jit(self._encode_impl, static_argnums=(2,))
        self._decode = jax.jit(self._decode_impl)
        self._decode_i16 = jax.jit(self._decode_i16_impl)

    @property
    def sample_rate(self) -> int:
        return self.cfg.sampling_rate

    @property
    def channels(self) -> int:
        return self.cfg.audio_channels

    def _encode_impl(self, params, wav, num_q):
        latents = encode_latents(params, wav, self.cfg)
        return rvq_encode(params["quantizer"], latents, num_q)

    def _decode_impl(self, params, codes):
        latents = rvq_decode(params["quantizer"], codes)
        latents = latents.astype(self.decode_dtype)
        return decode_latents(params, latents, self.cfg).astype(jnp.float32)

    def _decode_i16_impl(self, params, codes):
        wav = self._decode_impl(params, codes)
        return jnp.round(
            jnp.clip(wav, -1.0, 1.0) * 32767.0
        ).astype(jnp.int16)

    def encode(self, wav: jnp.ndarray, bandwidth: float = 6.0) -> jnp.ndarray:
        """wav (B, channels, T) float32 -> codes (B, T', num_q) int32.

        Matches AudioTokenizer.encode at 6 kbps = 8 codebooks
        (ref data/tokenizer.py:236-242).
        """
        num_q = self.cfg.num_q_for_bandwidth(bandwidth)
        wav = jnp.swapaxes(jnp.asarray(wav, jnp.float32), 1, 2)  # -> (B,T,C)
        return self._encode(self.params, wav, num_q)

    def decode(self, codes: jnp.ndarray, *, out_int16: bool = False) -> jnp.ndarray:
        """codes (B, T', Q) int32 -> wav (B, channels, T).

        ``out_int16=True`` scales/clips/rounds to int16 ON DEVICE — the wav
        container format — halving the device->host transfer, which matters
        for batched wav-out serving (serve.py, bench.py end_to_end)."""
        fn = self._decode_i16 if out_int16 else self._decode
        out = fn(self._params_dec, jnp.asarray(codes))
        return jnp.swapaxes(out, 1, 2)
