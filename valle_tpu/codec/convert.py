"""Convert EnCodec PyTorch weights (transformers/facebook layout) to the
JAX params tree of valle_tpu.codec.encodec_model.

Accepts a ``{name: numpy array}`` state dict.  Weight-norm parametrizations
are folded into plain conv weights here — the functional equivalent of the
reference's ``remove_encodec_weight_norm`` (ref data/tokenizer.py:181-208),
which it applies for determinism before tokenizing.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from valle_tpu.codec.encodec_model import EncodecConfig


def _conv_weight(sd: Mapping[str, np.ndarray], prefix: str) -> Dict:
    """Fold weight norm if present; torch (out,in,k) -> jax (k,in,out)."""
    if f"{prefix}.weight" in sd:
        w = np.asarray(sd[f"{prefix}.weight"])
    else:
        g = np.asarray(sd[f"{prefix}.parametrizations.weight.original0"])
        v = np.asarray(sd[f"{prefix}.parametrizations.weight.original1"])
        norm = np.sqrt(np.sum(v**2, axis=(1, 2), keepdims=True))
        w = g * v / np.maximum(norm, 1e-12)
    b = np.asarray(sd[f"{prefix}.bias"])
    return {"w": w.transpose(2, 1, 0), "b": b}


def _lstm(sd: Mapping[str, np.ndarray], prefix: str, layers: int):
    out = []
    for n in range(layers):
        out.append(
            {
                "wi": np.asarray(sd[f"{prefix}.weight_ih_l{n}"]),
                "wh": np.asarray(sd[f"{prefix}.weight_hh_l{n}"]),
                "bi": np.asarray(sd[f"{prefix}.bias_ih_l{n}"]),
                "bh": np.asarray(sd[f"{prefix}.bias_hh_l{n}"]),
            }
        )
    return out


def _resblock(sd, prefix: str) -> Dict:
    return {
        "block_1": _conv_weight(sd, f"{prefix}.block.1.conv"),
        "block_3": _conv_weight(sd, f"{prefix}.block.3.conv"),
        "shortcut": _conv_weight(sd, f"{prefix}.shortcut.conv"),
    }


def convert_encodec_state_dict(
    sd: Mapping[str, np.ndarray], cfg: EncodecConfig | None = None
) -> Dict:
    cfg = cfg or EncodecConfig()
    enc: Dict = {}
    # encoder layer indices mirror transformers EncodecEncoder construction
    enc["layers_0"] = _conv_weight(sd, "encoder.layers.0.conv")
    idx = 1
    for _ratio in reversed(cfg.upsampling_ratios):
        for _j in range(cfg.num_residual_layers):
            enc[f"layers_{idx}"] = _resblock(sd, f"encoder.layers.{idx}")
            idx += 1
        idx += 1  # ELU
        enc[f"layers_{idx}"] = _conv_weight(sd, f"encoder.layers.{idx}.conv")
        idx += 1
    enc[f"layers_{idx}"] = _lstm(
        sd, f"encoder.layers.{idx}.lstm", cfg.num_lstm_layers
    )
    idx += 2
    enc[f"layers_{idx}"] = _conv_weight(sd, f"encoder.layers.{idx}.conv")

    dec: Dict = {}
    dec["layers_0"] = _conv_weight(sd, "decoder.layers.0.conv")
    dec["layers_1"] = _lstm(sd, "decoder.layers.1.lstm", cfg.num_lstm_layers)
    idx = 2
    for _ratio in cfg.upsampling_ratios:
        idx += 1  # ELU
        dec[f"layers_{idx}"] = _conv_weight(sd, f"decoder.layers.{idx}.conv")
        idx += 1
        for _j in range(cfg.num_residual_layers):
            dec[f"layers_{idx}"] = _resblock(sd, f"decoder.layers.{idx}")
            idx += 1
    dec[f"layers_{idx + 1}"] = _conv_weight(sd, f"decoder.layers.{idx + 1}.conv")

    codebooks = np.stack(
        [
            np.asarray(sd[f"quantizer.layers.{q}.codebook.embed"])
            for q in range(cfg.num_quantizers)
        ],
        axis=0,
    )
    return {"encoder": enc, "decoder": dec, "quantizer": codebooks}
