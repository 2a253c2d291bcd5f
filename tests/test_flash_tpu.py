"""Flash-attention parity vs dense XLA attention, on real TPU hardware.

The Pallas TPU kernel (Mosaic) cannot run on the CPU backend, and the test
suite pins JAX to CPU in-process (conftest.py), so this test drives a clean
subprocess that uses the session's default TPU platform.  Skipped when no
TPU is reachable.  Covers both mask encodings of
``valle_tpu.ops.flash_attention.flash_attention_biased``:
  - (B, 1, 1, Tk) key-padding bias -> SegmentIds path
  - dense per-query prefix-LM bias -> ab path
"""

import os
import subprocess
import sys

import pytest

_SCRIPT = r"""
import numpy as np
import jax
import jax.numpy as jnp

if jax.devices()[0].platform == "cpu":
    print("NO_TPU")
    raise SystemExit(0)

from valle_tpu.ops.flash_attention import flash_attention_biased
from valle_tpu.ops import masks as mask_ops


def dense(q, k, v, bias):
    dh = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q / jnp.sqrt(dh * 1.0), k)
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v)


rng = np.random.RandomState(0)
b, t, h, dh = 2, 256, 4, 64
q = jnp.asarray(rng.randn(b, t, h, dh), jnp.float32) * 0.3
k = jnp.asarray(rng.randn(b, t, h, dh), jnp.float32) * 0.3
v = jnp.asarray(rng.randn(b, t, h, dh), jnp.float32) * 0.3

# 1) key-padding-only mask (SegmentIds path)
lens = jnp.asarray([t, t - 37], jnp.int32)
pad = mask_ops.make_pad_mask(lens, t)
bias_kp = mask_ops.mask_to_bias(pad[:, None, None, :], jnp.float32)
got = jax.jit(flash_attention_biased)(q, k, v, bias_kp)
assert got is not None, "flash returned None for key-pad mask"
want = jax.jit(dense)(q, k, v, bias_kp)
valid = ~np.asarray(pad)
g, w = np.asarray(got), np.asarray(want)
err = np.abs(g - w)[valid[:, :, None, None] * np.ones_like(g, bool)]
assert err.max() < 2e-2, err.max()

# 2) dense prefix-LM bias (ab path)
s, ty = 96, 160
struct = mask_ops.prefix_lm_attn_mask(s, ty)
key_pad = jnp.concatenate([pad[:, :s], pad[:, :ty]], axis=1)
bias_full = mask_ops.mask_to_bias(
    mask_ops.merge_padding(struct, key_pad), jnp.float32
)
got2 = jax.jit(flash_attention_biased)(q, k, v, bias_full)
assert got2 is not None, "flash returned None for dense bias"
want2 = jax.jit(dense)(q, k, v, bias_full)
err2 = np.abs(np.asarray(got2) - np.asarray(want2))
# rows whose keys are all masked are undefined; mask them out
row_ok = np.asarray((bias_full > -1e8).any(-1))  # (b, 1|h, tq)
row_ok = np.broadcast_to(row_ok[..., None], err2.transpose(0, 2, 1, 3).shape)
err2 = err2.transpose(0, 2, 1, 3)[row_ok]
assert err2.max() < 2e-2, err2.max()

print("FLASH_PARITY_OK")
"""


@pytest.mark.skipif(
    os.environ.get("VALLE_SKIP_TPU_TESTS") == "1",
    reason="TPU tests disabled",
)
def test_flash_matches_dense_on_tpu():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True, text=True, timeout=540, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    out = proc.stdout + proc.stderr
    if "NO_TPU" in proc.stdout:
        pytest.skip("no TPU available")
    assert proc.returncode == 0, out[-3000:]
    assert "FLASH_PARITY_OK" in proc.stdout, out[-3000:]
