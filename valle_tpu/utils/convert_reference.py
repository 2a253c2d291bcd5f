"""Convert a reference (PyTorch) VALL-E/VALL-F state dict to flax params.

Input is a plain ``{name: numpy array}`` mapping (call ``.numpy()`` on torch
tensors first — this module never imports torch), keyed by the reference's
parameter names (ref /root/reference/valle/models/valle.py:54-279).  Output is
the params pytree of :class:`valle_tpu.models.valle.VALLE`.

Used both by golden parity tests and by the checkpoint-import CLI.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from valle_tpu.models.config import ModelConfig


def _stack(sd: Mapping[str, np.ndarray], fmt: str, n: int, transpose=False):
    arrs = []
    for i in range(n):
        a = np.asarray(sd[fmt.format(i)])
        arrs.append(a.T if transpose else a)
    return np.stack(arrs, axis=0)


def _decoder_params(
    sd: Mapping[str, np.ndarray],
    prefix: str,
    num_layers: int,
    adaptive: bool,
    cross: bool,
    norm_first: bool,
) -> Dict:
    L = num_layers

    def ln(tname: str):
        """torch norm module at {prefix}.layers.i.{tname} -> flax subtree."""
        if adaptive:
            return {
                "ada": {
                    "project_layer": {
                        "kernel": _stack(
                            sd, f"{prefix}.layers.{{0}}.{tname}.project_layer.weight", L, True
                        ),
                        "bias": _stack(
                            sd, f"{prefix}.layers.{{0}}.{tname}.project_layer.bias", L
                        ),
                    },
                    "norm": {
                        "scale": _stack(sd, f"{prefix}.layers.{{0}}.{tname}.norm.weight", L),
                        "bias": _stack(sd, f"{prefix}.layers.{{0}}.{tname}.norm.bias", L),
                    },
                }
            }
        return {
            "ln": {
                "scale": _stack(sd, f"{prefix}.layers.{{0}}.{tname}.weight", L),
                "bias": _stack(sd, f"{prefix}.layers.{{0}}.{tname}.bias", L),
            }
        }

    layers: Dict = {
        "self_attn": {
            "in_proj": {
                "kernel": _stack(sd, f"{prefix}.layers.{{0}}.self_attn.in_proj_weight", L, True),
                "bias": _stack(sd, f"{prefix}.layers.{{0}}.self_attn.in_proj_bias", L),
            },
            "out_proj": {
                "kernel": _stack(sd, f"{prefix}.layers.{{0}}.self_attn.out_proj.weight", L, True),
                "bias": _stack(sd, f"{prefix}.layers.{{0}}.self_attn.out_proj.bias", L),
            },
        },
        "linear1": {
            "kernel": _stack(sd, f"{prefix}.layers.{{0}}.linear1.weight", L, True),
            "bias": _stack(sd, f"{prefix}.layers.{{0}}.linear1.bias", L),
        },
        "linear2": {
            "kernel": _stack(sd, f"{prefix}.layers.{{0}}.linear2.weight", L, True),
            "bias": _stack(sd, f"{prefix}.layers.{{0}}.linear2.bias", L),
        },
        "norm1": ln("norm1"),
    }
    if cross:
        # torch: norm2 gates cross-attn, norm3 gates ffn; ours: norm_ca, norm2
        ipw = _stack(sd, f"{prefix}.layers.{{0}}.multihead_attn.in_proj_weight", L)
        ipb = _stack(sd, f"{prefix}.layers.{{0}}.multihead_attn.in_proj_bias", L)
        d = ipw.shape[-1]
        layers["cross_attn"] = {
            "q_proj": {
                "kernel": np.swapaxes(ipw[:, :d, :], 1, 2),
                "bias": ipb[:, :d],
            },
            "kv_proj": {
                "kernel": np.swapaxes(ipw[:, d:, :], 1, 2),
                "bias": ipb[:, d:],
            },
            "out_proj": {
                "kernel": _stack(
                    sd, f"{prefix}.layers.{{0}}.multihead_attn.out_proj.weight", L, True
                ),
                "bias": _stack(sd, f"{prefix}.layers.{{0}}.multihead_attn.out_proj.bias", L),
            },
        }
        layers["norm_ca"] = ln("norm2")
        layers["norm2"] = ln("norm3")
    else:
        layers["norm2"] = ln("norm2")

    tree: Dict = {"layers": layers}
    if norm_first:
        if adaptive:
            tree["final_norm"] = {
                "ada": {
                    "project_layer": {
                        "kernel": np.asarray(sd[f"{prefix}.norm.project_layer.weight"]).T,
                        "bias": np.asarray(sd[f"{prefix}.norm.project_layer.bias"]),
                    },
                    "norm": {
                        "scale": np.asarray(sd[f"{prefix}.norm.norm.weight"]),
                        "bias": np.asarray(sd[f"{prefix}.norm.norm.bias"]),
                    },
                }
            }
        else:
            tree["final_norm"] = {
                "ln": {
                    "scale": np.asarray(sd[f"{prefix}.norm.weight"]),
                    "bias": np.asarray(sd[f"{prefix}.norm.bias"]),
                }
            }
    return tree


def convert_state_dict(sd: Mapping[str, np.ndarray], cfg: ModelConfig, variant: str = "valle") -> Dict:
    """Reference state dict -> flax params tree for VALLE/VALLF."""
    q = cfg.num_quantizers
    cross = variant == "vallf"
    params: Dict = {
        "ar_text_embedding": {
            "word_embeddings": {
                "embedding": np.asarray(sd["ar_text_embedding.word_embeddings.weight"])
            }
        },
        "ar_audio_embedding": {
            "word_embeddings": {
                "embedding": np.asarray(sd["ar_audio_embedding.word_embeddings.weight"])
            }
        },
        "ar_text_position": {"alpha": np.asarray(sd["ar_text_position.alpha"])},
        "ar_audio_position": {"alpha": np.asarray(sd["ar_audio_position.alpha"])},
        "ar_decoder": _decoder_params(
            sd, "ar_decoder", cfg.num_layers, False, cross, cfg.norm_first
        ),
        "ar_predict_layer": {
            "kernel": np.asarray(sd["ar_predict_layer.weight"]).T
        },
    }
    if q > 1:
        params.update(
            {
                "nar_text_embedding": {
                    "word_embeddings": {
                        "embedding": np.asarray(
                            sd["nar_text_embedding.word_embeddings.weight"]
                        )
                    }
                },
                "nar_audio_embedding_0": {
                    "word_embeddings": {
                        "embedding": np.asarray(
                            sd["nar_audio_embeddings.0.word_embeddings.weight"]
                        )
                    }
                },
                # table 0 has the extra EOS row (1025) and lives separately;
                # tables 1..Q-1 (1024 rows each) stack into one array.
                "nar_audio_embeddings_rest": np.stack(
                    [
                        np.asarray(sd[f"nar_audio_embeddings.{j}.word_embeddings.weight"])
                        for j in range(1, q)
                    ],
                    axis=0,
                ),
                "nar_decoder": _decoder_params(
                    sd,
                    "nar_decoder",
                    cfg.nar_num_layers,
                    True,
                    cross,
                    cfg.norm_first,
                ),
                "nar_stage_embeddings": _stack(
                    sd, "nar_stage_embeddings.{0}.word_embeddings.weight", q - 1
                )[:, 0, :],
            }
        )
        if cfg.share_embedding:
            params["nar_predict_last"] = np.asarray(
                sd[f"nar_predict_layers.{q - 2}.weight"]
            ).T
        else:
            params["nar_predict_layers"] = _stack(
                sd, "nar_predict_layers.{0}.weight", q - 1, True
            )
    return params
