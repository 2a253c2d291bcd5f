"""Model configuration.

Mirrors the reference CLI surface (ref valle/models/__init__.py:18-95):
--model-name, --decoder-dim, --nhead, --num-decoder-layers, --norm-first,
--add-prenet, --prefix-mode, --share-embedding, --scale-factor,
--prepend-bos, --num-quantizers, --scaling-xformers.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from valle_tpu import macros


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    model_name: str = "VALL-E"  # VALL-E | VALL-F | Transformer
    decoder_dim: int = 1024
    nhead: int = 16
    num_layers: int = 12
    norm_first: bool = True
    add_prenet: bool = False
    prefix_mode: int = 0  # 0,1,2,4 (ref models/valle.py:335-393)
    share_embedding: bool = True
    nar_scale_factor: float = 1.0
    prepend_bos: bool = False
    num_quantizers: int = 8
    scaling_xformers: bool = False

    num_text_tokens: int = macros.NUM_TEXT_TOKENS
    num_audio_tokens: int = macros.NUM_AUDIO_TOKENS
    num_mel_bins: int = macros.NUM_MEL_BINS

    dropout: float = 0.1
    max_len: int = 4096  # positional-table capacity
    max_prefix_len: int = 225  # 3 s at 75 Hz (ref models/valle.py:350)

    dtype: str = "float32"  # compute dtype: float32 | bfloat16
    attn_impl: str = "xla"  # xla | flash
    # Decode KV-cache storage: "model" stores K/V in the compute dtype;
    # "int8" stores symmetric per-(token, head)-quantized values + f32
    # scales.  Decode is KV-read-bound, so int8 nearly halves the dominant
    # HBM stream (serving optimization; training and parity paths unaffected).
    kv_cache_dtype: str = "model"  # model | int8
    # Rematerialization policy for the transformer layers' backward pass
    # (jax.checkpoint around the scanned layer body).  Without remat XLA must
    # keep all L layers' (B, H, T, T) attention probs live for the backward —
    # the flagship train step OOMs a 16 GB chip.  Policies:
    #   "none"         — no remat (max memory, min FLOPs)
    #   "full"         — save nothing, recompute the whole layer (~1/3 extra
    #                    forward FLOPs; the round-2 boolean `remat=True`)
    #   "dots_nobatch" — jax.checkpoint_policies.dots_with_no_batch_dims_
    #                    saveable: saves the outputs of the Dense matmuls
    #                    (QKV/out/FFN projections — no dot batch dims) but
    #                    recomputes the batched attention einsums, so the
    #                    O(T^2) probs still never hit HBM while the MXU-heavy
    #                    projections are not re-run (measured fastest that
    #                    fits, see docs/perf_notes.md round 3)
    # bools are accepted for round-2 compatibility (True="full", False="none").
    # No effect on inference.
    remat: str = "none"
    # W8A8 serving mode: when the bound variables carry int8-quantized
    # kernels (nn.qdense.quantize_variables), also quantize activations
    # per-row at runtime and run the Dense matmuls on the MXU's int8 path
    # (2x bf16 peak).  Ignored when variables are unquantized (training).
    act_quant: bool = False

    def __post_init__(self):
        if isinstance(self.remat, bool):
            object.__setattr__(self, "remat", "full" if self.remat else "none")
        if self.remat not in ("none", "full", "dots_nobatch"):
            raise ValueError(
                f"remat must be 'none', 'full' or 'dots_nobatch' (or a bool), "
                f"got {self.remat!r}"
            )
        if self.kv_cache_dtype not in ("model", "int8"):
            raise ValueError(
                f"kv_cache_dtype must be 'model' or 'int8', got "
                f"{self.kv_cache_dtype!r}"
            )
        if self.attn_impl not in ("xla", "fused", "flash", "flash_kp"):
            raise ValueError(
                f"attn_impl must be 'xla', 'fused', 'flash' or 'flash_kp', "
                f"got {self.attn_impl!r}"
            )
        if self.dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"dtype must be 'float32' or 'bfloat16', got {self.dtype!r}"
            )

    @property
    def nar_decoder_dim(self) -> int:
        return int(self.decoder_dim * self.nar_scale_factor)

    @property
    def nar_nhead(self) -> int:
        return int(self.nhead * self.nar_scale_factor)

    @property
    def nar_num_layers(self) -> int:
        return int(self.num_layers * self.nar_scale_factor)

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    @property
    def eos_id(self) -> int:
        return self.num_audio_tokens

    @property
    def bos_id(self) -> int:
        return self.num_audio_tokens + 1

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)
