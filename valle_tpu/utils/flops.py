"""Analytic FLOPs / MFU accounting for the VALL-E transformer stacks.

Used by bench.py and the trainer's per-interval MFU logging (the reference
logs only cuda max-memory, ref trainer.py:815,1138; MFU against the chip's
bf16 peak is the TPU-native observability equivalent).
"""

from __future__ import annotations

import jax

# Dense bf16 MXU peak FLOPs/s per chip by device kind.
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
    cfg, accum: int, batch: int, s: int, t: int, train_stage: int = 1
) -> float:
    """Matmul + attention FLOPs of one optimizer step (fwd + bwd ~ 3x fwd).

    Counts the MXU work only (the analytic numerator of MFU); remat
    recompute and vector-unit work are excluded, so hardware utilization is
    somewhat higher than the reported MFU.
    """
    d, layers = cfg.decoder_dim, cfg.num_layers
    v = cfg.num_audio_tokens + 1
    t_xy = s + t + 1  # text + audio + EOS position
    n_tok = accum * batch * t_xy
    per_tok_matmul = layers * 12 * d * d  # qkv(3d^2) + out(d^2) + ffn(8d^2)
    attn = accum * batch * layers * 4 * t_xy * t_xy * d  # QK^T + AV
    logits = accum * batch * (t + 1) * d * v
    fwd = 2 * n_tok * per_tok_matmul + 2 * attn + 2 * logits
    total = 3.0 * fwd
    if train_stage == 0:
        total *= 2  # the NAR decoder (same dims) runs too
    return total
