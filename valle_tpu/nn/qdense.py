"""Quantization-aware Dense layer + weight-quantization transform (serving).

Generation re-reads every decoder weight matrix from HBM once per AR decode
step and once per NAR pass; the decode loop is HBM-bound and the weight read
is the part the int8 KV-cache did not touch (docs/perf_notes.md: ~0.4 ms of
the ~4.4 ms decode step).  This module provides:

  - :class:`Dense` — drop-in for ``flax.linen.Dense`` (same param names,
    shapes, inits, dtype promotion).  When the bound variables carry a
    ``qscale`` collection entry for this module, the ``kernel`` param is an
    int8 array and the layer computes ``(x @ int8_kernel) * scale`` with the
    int8->compute-dtype convert fused into the matmul operand read by XLA —
    only int8 bytes stream from HBM.  With ``act_quant=True`` it additionally
    quantizes activations per-row at runtime and runs the contraction on the
    MXU's int8 path (2x the bf16 peak) — for the compute-bound NAR passes.
  - :func:`quantize_variables` — one-shot transform of a trained ``variables``
    pytree: selected kernels -> int8 with per-output-channel symmetric scales
    in a mirrored ``qscale`` collection.

The reference has no counterpart (fp32/bf16 weights everywhere); this is a
TPU serving optimization.  Numeric-error and greedy-parity coverage:
tests/test_quantize.py.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import traverse_util

# Module names whose `kernel` param is weight-quantized by default: the
# decoder-stack projections + FFN and the AR prediction head.  Embedding
# tables and the tiny AdaLN projections stay in the model dtype.
DEFAULT_TARGETS = (
    "in_proj",
    "q_proj",
    "kv_proj",
    "out_proj",
    "linear1",
    "linear2",
    "ar_predict_layer",
)


def _quantize_kernel(kernel: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., In, Out) -> (int8 kernel, (..., Out) f32 per-out-channel scale).

    Symmetric: column j of the dequantized kernel is ``int8_col_j * scale_j``,
    so the scale commutes with the matmul and applies to the OUTPUT — XLA
    fuses it with the bias add instead of materializing a bf16 kernel copy.
    """
    k = jnp.asarray(kernel, jnp.float32)
    amax = jnp.max(jnp.abs(k), axis=-2)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.round(k / scale[..., None, :])
    return jnp.clip(q, -127, 127).astype(jnp.int8), scale


def _w8a8_matmul(x, w8, w_scale, out_dtype):
    """Dynamic per-row activation quantization + int8 x int8 MXU matmul.

    x: (..., In) float; w8: (In, Out) int8; w_scale: (Out,) f32.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-8) / 127.0
    x8 = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x8,
        w8,
        (((x8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * xs * w_scale).astype(out_dtype)


class Dense(nn.Module):
    """``flax.linen.Dense`` drop-in that transparently consumes quantized
    kernels (see module docstring).  Identical param tree when unquantized."""

    features: int
    use_bias: bool = True
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()
    act_quant: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (jnp.shape(x)[-1], self.features),
            self.param_dtype,
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,), self.param_dtype)
            if self.use_bias
            else None
        )
        if self.has_variable("qscale", "kernel"):
            scale = self.get_variable("qscale", "kernel")  # (features,) f32
            (x,) = nn.dtypes.promote_dtype(x, dtype=self.dtype)
            if self.act_quant:
                y = _w8a8_matmul(x, kernel, scale, x.dtype)
            else:
                y = jnp.matmul(x, kernel.astype(x.dtype))
                y = y * scale.astype(x.dtype)
            if bias is not None:
                y = y + bias.astype(x.dtype)
            return y
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype
        )
        y = jnp.matmul(x, kernel)
        if bias is not None:
            y = y + bias
        return y


def quantize_variables(
    variables,
    targets: Sequence[str] = DEFAULT_TARGETS,
    scopes: Optional[Sequence[str]] = None,
):
    """Quantize selected Dense kernels of a trained model to int8.

    Args:
      variables: flax variables dict (``{"params": ...}``; other collections
        pass through).
      targets: module names whose ``kernel`` is quantized.
      scopes: if given, only paths containing one of these names are touched
        (e.g. ``("nar_decoder",)`` to quantize the NAR stack only).

    Returns a new variables dict where each selected kernel leaf is int8 and
    a mirrored ``qscale`` collection holds the per-output-channel scales.
    """
    params = traverse_util.flatten_dict(variables["params"])
    qparams, qscales = {}, {}
    for path, leaf in params.items():
        if (
            path[-1] == "kernel"
            and len(path) >= 2
            and path[-2] in targets
            and (scopes is None or any(s in path for s in scopes))
        ):
            q, scale = _quantize_kernel(leaf)
            qparams[path] = q
            qscales[path] = scale
        else:
            qparams[path] = leaf
    out = dict(variables)
    out["params"] = traverse_util.unflatten_dict(qparams)
    if qscales:
        out["qscale"] = traverse_util.unflatten_dict(qscales)
    return out
