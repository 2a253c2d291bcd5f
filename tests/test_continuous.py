"""Continuous-batching scheduler correctness (sample/continuous.py).

Greedy (top_k=1) decoding is RNG-free, so every request served through the
slot-refill scheduler must produce EXACTLY the codes a fresh ``generate``
of that request produces: any leakage of a previous occupant's KV into a
refilled slot, a wrong per-slot start offset, or a mis-scattered admission
prefill breaks token equality.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from valle_tpu.models import ModelConfig, VALLE
from valle_tpu.sample import generate
from valle_tpu.sample.continuous import serve_continuous

Q = 4
S, P = 6, 5
MAX_NEW = 24


@pytest.fixture(scope="module", params=["model", "int8"])
def setup(request):
    cfg = ModelConfig(
        decoder_dim=64, nhead=4, num_layers=2,
        num_quantizers=Q, kv_cache_dtype=request.param,
    )
    model = VALLE(cfg)
    rng = jax.random.PRNGKey(0)
    r = 10
    x = jax.random.randint(rng, (r, S), 1, cfg.num_text_tokens)
    x_lens = jnp.asarray(np.random.RandomState(1).randint(3, S + 1, r))
    prompts = jax.random.randint(rng, (r, P, Q), 0, cfg.num_audio_tokens)
    plens = jnp.asarray(np.random.RandomState(2).randint(2, P + 1, r))
    init = jax.jit(lambda k: model.init(
        {"params": k, "stage": k},
        x, x_lens, prompts, jnp.full((r,), P, jnp.int32),
        train_stage=0, deterministic=True, nar_stage=jnp.asarray(1),
    ))
    variables = init(rng)
    return model, variables, x, x_lens, prompts, plens


def test_continuous_matches_generate_greedy(setup):
    model, variables, x, x_lens, prompts, plens = setup
    r = x.shape[0]
    stop_lens = np.random.RandomState(3).randint(4, MAX_NEW - 2, r)

    # reference: each request through the plain bucket path
    ref = generate(
        model, variables, jax.random.PRNGKey(9), x, x_lens, prompts, plens,
        top_k=1, max_new_tokens=MAX_NEW, forbid_eos=True,
        stop_lens=jnp.asarray(stop_lens, jnp.int32),
    )
    ref_codes = np.asarray(ref["codes"])
    ref_lens = np.asarray(ref["lengths"])

    out = serve_continuous(
        model, variables, jax.random.PRNGKey(9),
        {
            "x": np.asarray(x), "x_lens": np.asarray(x_lens),
            "prompts": np.asarray(prompts), "prompt_lens": np.asarray(plens),
            "stop_lens": stop_lens.astype(np.int32),
        },
        batch_size=4, cap_steps=256, chunk=8, admit_width=4,
        top_k=1, forbid_eos=True, nar_bucket=MAX_NEW,
    )
    assert len(out) == r
    for i in range(r):
        L = out[i]["length"]
        assert L == int(ref_lens[i]), f"request {i}: length mismatch"
        np.testing.assert_array_equal(
            out[i]["codes"], ref_codes[i, :L], err_msg=f"request {i}"
        )


def test_continuous_partial_batch(setup):
    """R < batch_size: padding rows fill the spare slots and are dropped."""
    model, variables, x, x_lens, prompts, plens = setup
    stop_lens = np.full((2,), 8, np.int32)
    ref = generate(
        model, variables, jax.random.PRNGKey(9), x[:2], x_lens[:2],
        prompts[:2], plens[:2], top_k=1, max_new_tokens=MAX_NEW,
        forbid_eos=True, stop_lens=jnp.asarray(stop_lens),
    )
    out = serve_continuous(
        model, variables, jax.random.PRNGKey(0),
        {
            "x": np.asarray(x)[:2], "x_lens": np.asarray(x_lens)[:2],
            "prompts": np.asarray(prompts)[:2],
            "prompt_lens": np.asarray(plens)[:2],
            "stop_lens": stop_lens,
        },
        batch_size=4, cap_steps=64, chunk=8, top_k=1, forbid_eos=True,
        nar_bucket=MAX_NEW,
    )
    assert len(out) == 2 and all(o is not None for o in out)
    ref_codes, ref_lens = np.asarray(ref["codes"]), np.asarray(ref["lengths"])
    for i in range(2):
        L = out[i]["length"]
        assert L == int(ref_lens[i])
        np.testing.assert_array_equal(out[i]["codes"], ref_codes[i, :L])


def test_continuous_cap_steps_restart(setup):
    """A step budget too small to admit the whole queue in one state must
    restart with a fresh state over the remaining requests rather than
    silently dropping them (and must never hit the off-by-one where a slot
    admitted at t_now with t_now + stop == cap_steps can't finish)."""
    model, variables, x, x_lens, prompts, plens = setup
    r = x.shape[0]
    stop_lens = np.random.RandomState(3).randint(4, 10, r).astype(np.int32)
    ref = generate(
        model, variables, jax.random.PRNGKey(9), x, x_lens, prompts, plens,
        top_k=1, max_new_tokens=MAX_NEW, forbid_eos=True,
        stop_lens=jnp.asarray(stop_lens),
    )
    ref_codes, ref_lens = np.asarray(ref["codes"]), np.asarray(ref["lengths"])
    out = serve_continuous(
        model, variables, jax.random.PRNGKey(9),
        {
            "x": np.asarray(x), "x_lens": np.asarray(x_lens),
            "prompts": np.asarray(prompts), "prompt_lens": np.asarray(plens),
            "stop_lens": stop_lens,
        },
        # cap barely above max_stop: admission blocks almost immediately,
        # forcing several restarts to drain the queue
        batch_size=4, cap_steps=int(stop_lens.max()) + 2, chunk=4,
        admit_width=4, top_k=1, forbid_eos=True, nar_bucket=MAX_NEW,
    )
    assert len(out) == r and all(o is not None for o in out)
    for i in range(r):
        L = out[i]["length"]
        assert L == int(ref_lens[i]), f"request {i}: length mismatch"
        np.testing.assert_array_equal(
            out[i]["codes"], ref_codes[i, :L], err_msg=f"request {i}"
        )
