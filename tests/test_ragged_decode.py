"""Ragged decode-attention kernel (ops/ragged_decode.py): exact parity with
the dense formulation on the columns it reads, plus end-to-end greedy
equality of ``generate(ragged_decode=True)`` vs the dense path (any leakage
from clipped columns, a wrong live bound, or a mis-ordered online-softmax
rescale breaks token equality).

On CPU the kernel runs in interpret mode; tests/test_ragged_tpu.py drives
the compiled kernel on hardware.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from valle_tpu.models import ModelConfig, VALLE
from valle_tpu.ops.ragged_decode import (
    ragged_decode_attention,
    ragged_decode_attention_reference,
)
from valle_tpu.sample import generate


@pytest.mark.parametrize("quantized", [False, True])
@pytest.mark.parametrize(
    "cap,block_c", [(70, 32), (64, 64), (96, 128), (33, 16)]
)
def test_kernel_parity(quantized, cap, block_c):
    rng = np.random.RandomState(0)
    B, H, Dh = 5, 4, 16
    q = jnp.asarray(rng.randn(B, 1, H, Dh), jnp.float32)
    k = jnp.asarray(rng.randn(B, cap, H, Dh), jnp.float32)
    v = jnp.asarray(rng.randn(B, cap, H, Dh), jnp.float32)
    # lengths cover: full, mid-block, block boundary, zero (finished), one
    lengths = jnp.asarray(
        [cap, max(cap // 2 - 1, 1), min(block_c, cap), 0, 1], jnp.int32
    )
    bias = jnp.where(
        jnp.asarray(rng.rand(B, cap) < 0.25), -1e9, 0.0
    ).astype(jnp.float32)
    ks = vs = None
    if quantized:
        from valle_tpu.nn.attention import quantize_kv

        k, ks = quantize_kv(k)
        v, vs = quantize_kv(v)
    out = ragged_decode_attention(
        q, k, v, lengths, bias, ks, vs, block_c=block_c, interpret=True
    )
    ref = ragged_decode_attention_reference(q, k, v, lengths, bias, ks, vs)
    # the kernel's dots run in bf16 (MXU-native) by design; the dense
    # reference is f32
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-3, rtol=5e-3
    )


def test_kernel_zero_length_is_zero():
    rng = np.random.RandomState(1)
    B, C, H, Dh = 3, 40, 2, 8
    q = jnp.asarray(rng.randn(B, 1, H, Dh), jnp.float32)
    k = jnp.asarray(rng.randn(B, C, H, Dh), jnp.float32)
    v = jnp.asarray(rng.randn(B, C, H, Dh), jnp.float32)
    out = ragged_decode_attention(
        q, k, v, jnp.zeros((B,), jnp.int32), block_c=16, interpret=True
    )
    assert np.all(np.asarray(out) == 0.0)


@pytest.fixture(scope="module", params=["model", "int8"])
def tiny(request):
    cfg = ModelConfig(
        decoder_dim=64, nhead=4, num_layers=2, num_quantizers=4,
        kv_cache_dtype=request.param,
    )
    model = VALLE(cfg)
    rng = jax.random.PRNGKey(0)
    b, s, p = 6, 7, 5
    x = jax.random.randint(rng, (b, s), 1, cfg.num_text_tokens)
    x_lens = jnp.asarray(np.random.RandomState(1).randint(3, s + 1, b))
    prompts = jax.random.randint(rng, (b, p, 4), 0, cfg.num_audio_tokens)
    plens = jnp.asarray(np.random.RandomState(2).randint(2, p + 1, b))
    variables = jax.jit(lambda key: model.init(
        {"params": key, "stage": key},
        x, x_lens, prompts, jnp.full((b,), p, jnp.int32),
        train_stage=0, deterministic=True, nar_stage=jnp.asarray(1),
    ))(rng)
    return model, variables, x, x_lens, prompts, plens


def test_generate_ragged_matches_dense(tiny):
    """Greedy generate with mixed per-request stops: token-exact equality.
    Mixed stops make some slots FINISH early — exactly the state where the
    ragged path reads less than the dense path."""
    model, variables, x, x_lens, prompts, plens = tiny
    stop_lens = jnp.asarray([4, 9, 17, 6, 12, 3], jnp.int32)
    kw = dict(
        top_k=1, max_new_tokens=20, forbid_eos=True, stop_lens=stop_lens
    )
    dense = generate(
        model, variables, jax.random.PRNGKey(7), x, x_lens, prompts, plens,
        **kw,
    )
    ragged = generate(
        model, variables, jax.random.PRNGKey(7), x, x_lens, prompts, plens,
        ragged_decode=True, **kw,
    )
    np.testing.assert_array_equal(
        np.asarray(dense["lengths"]), np.asarray(ragged["lengths"])
    )
    np.testing.assert_array_equal(
        np.asarray(dense["codes"]), np.asarray(ragged["codes"])
    )


def test_continuous_ragged_matches_generate(tiny):
    """Slot-refill scheduler with ragged per-slot reads stays token-exact
    against fresh bucket generation."""
    from valle_tpu.sample.continuous import serve_continuous

    model, variables, x, x_lens, prompts, plens = tiny
    stop_lens = np.asarray([4, 9, 11, 6, 12, 3], np.int32)
    ref = generate(
        model, variables, jax.random.PRNGKey(9), x, x_lens, prompts, plens,
        top_k=1, max_new_tokens=16, forbid_eos=True,
        stop_lens=jnp.asarray(stop_lens),
    )
    out = serve_continuous(
        model, variables, jax.random.PRNGKey(9),
        {
            "x": np.asarray(x), "x_lens": np.asarray(x_lens),
            "prompts": np.asarray(prompts), "prompt_lens": np.asarray(plens),
            "stop_lens": stop_lens,
        },
        batch_size=3, cap_steps=128, chunk=6, admit_width=3,
        top_k=1, forbid_eos=True, nar_bucket=16, ragged_decode=True,
    )
    ref_codes = np.asarray(ref["codes"])
    ref_lens = np.asarray(ref["lengths"])
    for i in range(x.shape[0]):
        L = out[i]["length"]
        assert L == int(ref_lens[i]), f"request {i}"
        np.testing.assert_array_equal(
            out[i]["codes"], ref_codes[i, :L], err_msg=f"request {i}"
        )
