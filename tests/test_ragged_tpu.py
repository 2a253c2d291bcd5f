"""Compiled ragged decode-attention kernel on real TPU (Mosaic, not the
interpreter): numeric parity vs the dense reference at serving-like shapes,
int8 and bf16 cache variants, lengths covering full/partial/zero.

Like test_fused_tpu.py / test_flash_tpu.py this drives a clean subprocess on
the session's default TPU platform and skips when no TPU is reachable (the
conftest pins the pytest process itself to an 8-device CPU mesh).
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

from valle_tpu.ops.ragged_decode import (
    ragged_decode_attention,
    ragged_decode_attention_reference,
)
from valle_tpu.nn.attention import quantize_kv

rng = np.random.RandomState(0)
B, C, H, Dh = 16, 929, 16, 64
q = jnp.asarray(rng.randn(B, 1, H, Dh) * 0.3, jnp.float32)
kf = jnp.asarray(rng.randn(B, C, H, Dh) * 0.3, jnp.float32)
vf = jnp.asarray(rng.randn(B, C, H, Dh) * 0.3, jnp.float32)
lengths = jnp.asarray(
    rng.randint(1, C + 1, B).astype(np.int32)
    .reshape(-1)
)
lengths = lengths.at[3].set(0).at[7].set(C).at[11].set(256)
bias = jnp.where(jnp.asarray(rng.rand(B, C) < 0.2), -1e9, 0.0).astype(
    jnp.float32
)

# float cache
out = np.asarray(ragged_decode_attention(q, kf, vf, lengths, bias))
ref = np.asarray(ragged_decode_attention_reference(q, kf, vf, lengths, bias))
err = np.abs(out - ref).max()
assert err < 2e-3, ("float", err)  # MXU f32-as-bf16-passes rounding
assert np.all(out[3] == 0.0), "zero-length slot must be zeros"

# int8 cache + per-(token, head) scales
k8, ks = quantize_kv(kf)
v8, vs = quantize_kv(vf)
out8 = np.asarray(ragged_decode_attention(q, k8, v8, lengths, bias, ks, vs))
ref8 = np.asarray(
    ragged_decode_attention_reference(q, k8, v8, lengths, bias, ks, vs)
)
err8 = np.abs(out8 - ref8).max()
assert err8 < 2e-3, ("int8", err8)

# bf16 queries (the serving dtype)
outb = np.asarray(
    ragged_decode_attention(q.astype(jnp.bfloat16), k8, v8, lengths, bias,
                            ks, vs)
)
errb = np.abs(outb - ref8).max()
assert errb < 2e-2, ("bf16-q", errb)

print("RAGGED_TPU_OK")
"""


@pytest.mark.skipif(
    os.environ.get("VALLE_SKIP_TPU_TESTS") == "1",
    reason="TPU tests disabled",
)
def test_ragged_decode_on_tpu():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True, text=True, timeout=1200, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    out = proc.stdout + proc.stderr
    if "NO_TPU" in proc.stdout:
        pytest.skip("no TPU available")
    assert proc.returncode == 0, out[-3000:]
    assert "RAGGED_TPU_OK" in proc.stdout, out[-3000:]
