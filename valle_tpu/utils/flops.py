"""Analytic FLOPs / MFU accounting for the VALL-E transformer stacks.

Used by bench.py and the trainer's per-interval MFU logging (the reference
logs only cuda max-memory, ref trainer.py:815,1138; MFU against the chip's
bf16 peak is the TPU-native observability equivalent).
"""

from __future__ import annotations

import jax

# Dense bf16 MXU peak FLOPs/s per chip by device kind.
#
# MFU scale note: all MFU figures in this repo divide by this bf16 peak,
# including fp32-recipe rows.  That is the honest scale on TPU: at JAX's
# default matmul precision, f32 dot_generals execute as bf16 MXU passes with
# f32 accumulation, so the achievable matmul peak of an "fp32" training step
# is the bf16 peak — fp32 and bf16 rows in the perf tables are directly
# comparable.  bench.py tags every MFU row with "mfu_vs": "bf16-peak".
PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,  # v6e / Trillium
}


def chip_peak_flops(default: float = 197e12) -> float:
    kind = jax.devices()[0].device_kind
    for k, v in PEAK_BF16.items():
        if kind.startswith(k):
            return v
    return default


def train_step_flops(
    cfg, accum: int, batch: int, s: int, t: int, train_stage: int = 1,
    p: int = 0,
) -> float:
    """Matmul + attention FLOPs of one optimizer step (fwd + bwd ~ 3x fwd).

    Counts the MXU work only (the analytic numerator of MFU); remat
    recompute and vector-unit work are excluded, so hardware utilization is
    somewhat higher than the reported MFU.  Model-aware: the VALL-E stacks
    run over [text;audio] with a V+1 logits head; the Transformer baseline
    is an encoder(s) + cross-attention decoder(t) with a mel+stop head.
    """
    d = cfg.decoder_dim
    layers = cfg.num_layers
    per_tok = 12 * d * d  # qkv(3d^2) + out(d^2) + ffn(8d^2) per layer

    if cfg.model_name.lower() == "transformer":
        n_enc = accum * batch * s
        n_dec = accum * batch * t
        enc = 2 * n_enc * layers * per_tok + \
            accum * batch * layers * 4 * s * s * d
        # decoder adds a cross-attention block (4d^2/tok + 4*t*s*d scores)
        dec = 2 * n_dec * layers * (per_tok + 4 * d * d) + \
            accum * batch * layers * (4 * t * t * d + 4 * t * s * d)
        head = 2 * n_dec * d * (cfg.num_mel_bins + 1)
        return 3.0 * (enc + dec + head)

    if train_stage == 2:
        # NAR-only step over [text ; prompt(p) ; audio], logits over V on the
        # audio region (ref README.md:106-112 stage-2 recipe, prefix-mode 4).
        dn = cfg.nar_decoder_dim
        ln = cfg.nar_num_layers
        per_tok_n = 12 * dn * dn
        t_seq = s + p + t
        n_tok = accum * batch * t_seq
        attn = accum * batch * ln * 4 * t_seq * t_seq * dn
        logits = accum * batch * t * dn * cfg.num_audio_tokens
        return 3.0 * (2 * n_tok * ln * per_tok_n + 2 * attn + 2 * logits)

    v = cfg.num_audio_tokens + 1
    t_xy = s + t + 1  # text + audio + EOS position
    n_tok = accum * batch * t_xy
    attn = accum * batch * layers * 4 * t_xy * t_xy * d  # QK^T + AV
    logits = accum * batch * (t + 1) * d * v
    fwd = 2 * n_tok * layers * per_tok + 2 * attn + 2 * logits
    total = 3.0 * fwd
    if train_stage == 0:
        total *= 2  # the NAR decoder (same dims) runs too
    return total
