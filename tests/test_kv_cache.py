"""int8 KV-cache tests: quantizer round-trip, single-query attention parity
over a quantized cache, and end-to-end greedy generate() parity between the
full-precision and int8 cache paths (ADVICE r1: these paths had no coverage).
"""

import numpy as np

import jax
import jax.numpy as jnp

from valle_tpu.models import ModelConfig, VALLE
from valle_tpu.nn.attention import _decode_attention_quantized, quantize_kv

D, NHEAD, LAYERS, Q = 64, 4, 2, 8


def test_quantize_kv_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 17, 4, 16) * 5.0, jnp.float32)
    q8, scale = quantize_kv(x)
    assert q8.dtype == jnp.int8
    deq = q8.astype(jnp.float32) * scale[..., None]
    # symmetric rounding error is at most half a quantization step
    err = np.abs(np.asarray(deq - x))
    bound = np.asarray(scale)[..., None] * 0.51 + 1e-8
    assert (err <= bound).all(), float((err - bound).max())
    # relative to the per-(token, head) amax: within 1/127 + rounding
    amax = np.abs(np.asarray(x)).max(axis=-1, keepdims=True)
    assert (err <= amax / 127.0 * 0.51 + 1e-7).all()


def test_quantized_decode_attention_matches_dense():
    rng = np.random.RandomState(1)
    b, c, h, dh = 2, 33, 4, 16
    q = jnp.asarray(rng.randn(b, 1, h, dh), jnp.float32)
    k = jnp.asarray(rng.randn(b, c, h, dh), jnp.float32)
    v = jnp.asarray(rng.randn(b, c, h, dh), jnp.float32)
    pad = jnp.asarray(rng.rand(b, c) < 0.2)
    bias = jnp.where(pad, -1e9, 0.0)[:, None, None, :]

    # dense reference
    scale = 1.0 / np.sqrt(dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k) + bias
    probs = jax.nn.softmax(logits, axis=-1)
    want = jnp.einsum("bhqk,bkhd->bqhd", probs, v)

    k8, ks = quantize_kv(k)
    v8, vs = quantize_kv(v)
    got = _decode_attention_quantized(q, k8, v8, ks, vs, bias)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=0.05, atol=0.05
    )


def _teacher_forced_logits(kv_dtype, steps=6, seed=0):
    """Prefill + ``steps`` teacher-forced decode steps through the chosen
    cache; returns the per-step logits.  Feeding FIXED tokens (instead of
    sampling) keeps the two cache paths on the same trajectory so the
    comparison measures quantization error, not compounding argmax flips."""
    from valle_tpu.ops import masks as mask_ops
    from valle_tpu.sample import _right_align

    cfg = ModelConfig(
        decoder_dim=D, nhead=NHEAD, num_layers=LAYERS, num_quantizers=Q,
        kv_cache_dtype=kv_dtype,
    )
    model = VALLE(cfg)
    rng = np.random.RandomState(seed)
    b, s, p = 2, 6, 8
    x = jnp.asarray(rng.randint(0, 512, (b, s)), jnp.int32)
    x_lens = jnp.asarray([s, s - 2], jnp.int32)
    prompt0 = jnp.asarray(rng.randint(0, 1024, (b, p)), jnp.int32)
    prompt_lens = jnp.asarray([p, p - 3], jnp.int32)
    forced = rng.randint(0, 1024, (steps, b)).astype(np.int32)
    key = jax.random.PRNGKey(seed)
    variables = model.init(
        {"params": key, "stage": key},
        x, x_lens, jnp.zeros((b, 16, Q), jnp.int32),
        jnp.asarray([16, 12], jnp.int32),
        train_stage=0, deterministic=True, nar_stage=jnp.asarray(2),
    )

    x_mask = mask_ops.make_pad_mask(x_lens, s)
    mem_bias = mask_ops.mask_to_bias(x_mask[:, None, None, :], jnp.float32)
    ar_tokens, ar_positions, ar_valid = _right_align(prompt0, prompt_lens, p)
    tpre = s + p
    struct = mask_ops.prefix_lm_attn_mask(s, p)
    key_pad_pre = jnp.concatenate([x_mask, jnp.logical_not(ar_valid)], axis=1)
    pre_bias = mask_ops.mask_to_bias(
        mask_ops.merge_padding(struct, key_pad_pre), jnp.float32
    )
    last_logits, kv, memory = model.apply(
        variables, x, ar_tokens, ar_positions, pre_bias, mem_bias,
        method="ar_prefill",
    )
    k_pre, v_pre = kv
    num_layers, _, _, h, dh = k_pre.shape
    cap = tpre + steps
    if kv_dtype == "int8":
        k8, ks0 = quantize_kv(k_pre)
        v8, vs0 = quantize_kv(v_pre)
        pad5 = ((0, 0), (0, 0), (0, steps), (0, 0), (0, 0))
        pad4 = ((0, 0), (0, 0), (0, steps), (0, 0))
        cache = (jnp.pad(k8, pad5), jnp.pad(v8, pad5),
                 jnp.pad(ks0, pad4), jnp.pad(vs0, pad4))
    else:
        pad5 = ((0, 0), (0, 0), (0, steps), (0, 0), (0, 0))
        cache = (jnp.pad(k_pre, pad5), jnp.pad(v_pre, pad5))

    pre_valid = jnp.logical_not(key_pad_pre)
    slot_idx = jnp.arange(cap)[None, :]
    logits_per_step = [np.asarray(last_logits)]
    for t in range(steps):
        tok = jnp.asarray(forced[t])
        positions = (prompt_lens + t)[:, None]
        key_valid = jnp.concatenate(
            [pre_valid, jnp.zeros((b, steps), bool)], axis=1
        )
        step_valid = jnp.logical_or(
            key_valid,
            jnp.logical_and(slot_idx >= tpre, slot_idx <= tpre + t),
        )
        bias = mask_ops.mask_to_bias(
            jnp.logical_not(step_valid)[:, None, None, :], jnp.float32
        )
        logits, cache = model.apply(
            variables, tok[:, None], positions, tuple(cache), tpre + t,
            bias, memory, mem_bias, method="ar_decode_step",
        )
        logits_per_step.append(np.asarray(logits))
    return np.stack(logits_per_step)


def test_decode_int8_cache_matches_full_precision():
    """Teacher-forced decode-step logits through the int8 cache must track
    the full-precision cache within quantization noise."""
    lf = _teacher_forced_logits("model")
    lq = _teacher_forced_logits("int8")
    assert lf.shape == lq.shape
    # prefill logits identical (cache dtype not involved yet)
    np.testing.assert_allclose(lf[0], lq[0], rtol=1e-5, atol=1e-5)
    # decode logits: small absolute drift vs the logit scale
    scale = np.abs(lf[1:]).max()
    drift = np.abs(lf[1:] - lq[1:]).max()
    assert drift <= 0.05 * scale + 0.05, (drift, scale)
    # and the greedy choice agrees on almost every step
    agree = (lf[1:].argmax(-1) == lq[1:].argmax(-1)).mean()
    assert agree >= 0.9, agree
