"""Parity tests for the custom Pallas prefix-LM attention kernel
(valle_tpu/ops/fused_attention.py).

The no-dropout paths run on the CPU test mesh through Pallas interpret mode,
so the mask-encoding logic (in-kernel prefix-LM struct + key-validity rows)
and the custom-VJP backward are pinned unconditionally.  The in-register
dropout path needs the real TPU hardware PRNG (the interpreter stubs
prng_random_bits to zeros) and is covered by the subprocess probe in
``test_fused_tpu.py``.

Reference semantics: attention-prob dropout + additive masking exactly as the
reference's MultiheadAttention fork (ref valle/modules/activation.py:199-427).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from valle_tpu.ops import masks as mask_ops
from valle_tpu.ops.attention_impl import _xla_attention, dot_product_attention
from valle_tpu.ops.fused_attention import fused_prefix_attention


def _rand(rng, *shape):
    return jnp.asarray(rng.randn(*shape), jnp.float32) * 0.3


def _setup(b=2, t=200, h=4, dh=32, s=48):
    rng = np.random.RandomState(0)
    q, k, v = (_rand(rng, b, t, h, dh) for _ in range(3))
    x_lens = jnp.asarray([40, s], jnp.int32)
    y_lens = jnp.asarray([120, t - s - 8], jnp.int32)
    key_pad = jnp.concatenate(
        [mask_ops.make_pad_mask(x_lens, s),
         mask_ops.make_pad_mask(y_lens, t - s)], axis=1,
    )
    return q, k, v, key_pad, s


def test_prefix_lm_forward_and_grads_match_xla():
    q, k, v, key_pad, s = _setup()
    kv_bias = mask_ops.mask_to_bias(key_pad, jnp.float32)
    dense_bias = mask_ops.mask_to_bias(
        mask_ops.merge_padding(mask_ops.prefix_lm_attn_mask(s, q.shape[1] - s),
                               key_pad),
        jnp.float32,
    )

    out = fused_prefix_attention(q, k, v, kv_bias, prefix_s=s)
    want = _xla_attention(q, k, v, dense_bias, 0.0, None, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)

    def loss_fused(args):
        return jnp.sum(jnp.sin(
            fused_prefix_attention(*args, kv_bias, prefix_s=s)))

    def loss_ref(args):
        return jnp.sum(jnp.sin(_xla_attention(*args, dense_bias, 0.0, None,
                                              True)))

    g1 = jax.grad(loss_fused)((q, k, v))
    g2 = jax.grad(loss_ref)((q, k, v))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_causal_mode_matches_xla():
    # prefix_s=0 degenerates to the VALL-F causal audio decoder mask
    q, k, v, key_pad, _ = _setup()
    kv_bias = mask_ops.mask_to_bias(key_pad, jnp.float32)
    dense_bias = mask_ops.mask_to_bias(
        mask_ops.merge_padding(mask_ops.causal_mask(q.shape[1]), key_pad),
        jnp.float32,
    )
    out = fused_prefix_attention(q, k, v, kv_bias, prefix_s=0)
    want = _xla_attention(q, k, v, dense_bias, 0.0, None, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)

    # gradients through the maximally-clipped windows (prefix_s=0 gives the
    # full triangular clip: window 0 sees only its own 128 columns)
    def loss_fused(args):
        return jnp.sum(jnp.sin(fused_prefix_attention(
            *args, kv_bias, prefix_s=0, block_q_fwd=128, block_q_bwd=128)))

    def loss_ref(args):
        return jnp.sum(jnp.sin(_xla_attention(*args, dense_bias, 0.0, None,
                                              True)))

    g1 = jax.grad(loss_fused)((q, k, v))
    g2 = jax.grad(loss_ref)((q, k, v))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_window_count_invariance():
    """Clipped multi-window runs must equal the single full-width window
    bit-for-bit in the masked/visible pattern and numerically in f32."""
    q, k, v, key_pad, s = _setup()
    kv_bias = mask_ops.mask_to_bias(key_pad, jnp.float32)

    def run(bq):
        def loss(args):
            return jnp.sum(jnp.cos(fused_prefix_attention(
                *args, kv_bias, prefix_s=s,
                block_q_fwd=bq, block_q_bwd=bq)))

        out = fused_prefix_attention(q, k, v, kv_bias, prefix_s=s,
                                     block_q_fwd=bq, block_q_bwd=bq)
        return out, jax.grad(loss)((q, k, v))

    out1, g1 = run(256)   # single window (padded Tq = 256)
    out2, g2 = run(128)   # two windows, the first clipped to 128 cols
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=2e-6)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_dense_mode_cross_attention_matches_xla():
    # key-padding-only mode with Tq != Tk (the NAR / cross-attention shape)
    rng = np.random.RandomState(1)
    q = _rand(rng, 2, 150, 4, 32)
    k = _rand(rng, 2, 77, 4, 32)
    v = _rand(rng, 2, 77, 4, 32)
    pad = mask_ops.make_pad_mask(jnp.asarray([60, 77], jnp.int32), 77)
    kv_bias = mask_ops.mask_to_bias(pad, jnp.float32)

    out = fused_prefix_attention(q, k, v, kv_bias)
    want = _xla_attention(q, k, v, kv_bias[:, None, None, :], 0.0, None, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)

    def loss_fused(args):
        return jnp.sum(jnp.cos(fused_prefix_attention(*args, kv_bias)))

    def loss_ref(args):
        return jnp.sum(jnp.cos(
            _xla_attention(*args, kv_bias[:, None, None, :], 0.0, None, True)))

    g1 = jax.grad(loss_fused)((q, k, v))
    g2 = jax.grad(loss_ref)((q, k, v))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_mask_spec_dense_equals_eager_masks():
    """AttnMaskSpec.dense must reproduce the exact pre-round-3 bias arrays."""
    _, _, _, key_pad, s = _setup()
    t = key_pad.shape[1]
    spec = mask_ops.AttnMaskSpec(
        mask_ops.mask_to_bias(key_pad, jnp.float32), prefix_s=s
    )
    want = mask_ops.mask_to_bias(
        mask_ops.merge_padding(mask_ops.prefix_lm_attn_mask(s, t - s), key_pad),
        jnp.float32,
    )  # (B, 1, T, T)
    got = spec.dense(t)
    # identical masked/visible pattern (additive values may stack to -2e9)
    np.testing.assert_array_equal(np.asarray(got < -1e8),
                                  np.asarray(want < -1e8))
    assert np.all(np.asarray(got)[np.asarray(got) > -1e8] == 0.0)

    spec_kp = mask_ops.AttnMaskSpec(mask_ops.mask_to_bias(key_pad, jnp.float32))
    np.testing.assert_array_equal(
        np.asarray(spec_kp.dense(5)),
        np.broadcast_to(
            np.asarray(mask_ops.mask_to_bias(key_pad, jnp.float32))[
                :, None, None, :
            ],
            (2, 1, 5, t),
        ),
    )


def test_dispatch_fused_falls_back_for_dropout_off_tpu():
    """impl='fused' + active dropout off-TPU must route to XLA (the interpret
    PRNG is a zero stub), and produce a *valid* dropped output, not zeros."""
    q, k, v, key_pad, s = _setup()
    spec = mask_ops.AttnMaskSpec(
        mask_ops.mask_to_bias(key_pad, jnp.float32), prefix_s=s
    )
    out = dot_product_attention(
        q, k, v, bias=spec, dropout_rate=0.5,
        dropout_rng=jax.random.PRNGKey(3), deterministic=False, impl="fused",
    )
    assert bool(jnp.any(out != 0.0))
    # and the deterministic fused path still runs the kernel
    out_det = dot_product_attention(q, k, v, bias=spec, deterministic=True,
                                    impl="fused")
    want = _xla_attention(q, k, v, spec.dense(q.shape[1]), 0.0, None, True)
    np.testing.assert_allclose(np.asarray(out_det), np.asarray(want),
                               atol=2e-5)


def test_interpret_dropout_raises():
    q, k, v, key_pad, s = _setup()
    kv_bias = mask_ops.mask_to_bias(key_pad, jnp.float32)
    with pytest.raises(NotImplementedError):
        fused_prefix_attention(
            q, k, v, kv_bias, prefix_s=s, dropout_rate=0.1,
            dropout_rng=jax.random.PRNGKey(0), interpret=True,
        )
