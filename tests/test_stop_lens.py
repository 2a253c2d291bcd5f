"""Per-sequence stop_lens serving knob: generation caps + early exit.

stop_lens models per-request max length (and lets the realistic-length
bench emulate EOS stopping): sequence i must end with exactly
min(stop_lens[i], other stop conditions) tokens, tokens past the stop must
be zeroed, and sequences without a cap behave exactly as before.
"""

import jax
import jax.numpy as jnp
import numpy as np

from valle_tpu.models import ModelConfig, VALLE
from valle_tpu.sample import generate


def _setup(b=3, s=12, p=10, q=4):
    cfg = ModelConfig(
        decoder_dim=64, nhead=4, num_layers=2, num_quantizers=q,
        dtype="float32",
    )
    model = VALLE(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.randint(rng, (b, s), 0, cfg.num_text_tokens)
    x_lens = jnp.full((b,), s, jnp.int32)
    prompt = jax.random.randint(rng, (b, p, q), 0, cfg.num_audio_tokens)
    y = jax.random.randint(rng, (b, 16, q), 0, cfg.num_audio_tokens)
    variables = model.init(
        {"params": rng, "stage": rng},
        x, x_lens, y, jnp.full((b,), 16, jnp.int32),
        train_stage=0, deterministic=True, nar_stage=jnp.asarray(2),
    )
    return cfg, model, variables, x, x_lens, prompt


def test_stop_lens_caps_lengths():
    cfg, model, variables, x, x_lens, prompt = _setup()
    stops = jnp.asarray([5, 12, 20], jnp.int32)
    out = generate(
        model, variables, jax.random.PRNGKey(1), x, x_lens, prompt,
        top_k=10, max_new_tokens=20, forbid_eos=True, stop_lens=stops,
    )
    lengths = np.asarray(out["lengths"])
    np.testing.assert_array_equal(lengths, [5, 12, 20])
    codes = np.asarray(out["codes"])
    # tokens past each stop are zeroed in every codebook
    for i, L in enumerate(lengths):
        assert (codes[i, L:] == 0).all()


def test_stop_lens_none_matches_default():
    cfg, model, variables, x, x_lens, prompt = _setup()
    kw = dict(top_k=10, max_new_tokens=12, forbid_eos=True)
    a = generate(model, variables, jax.random.PRNGKey(2), x, x_lens, prompt,
                 **kw)
    # caps larger than max_new_tokens never fire
    b = generate(model, variables, jax.random.PRNGKey(2), x, x_lens, prompt,
                 stop_lens=jnp.full((3,), 99, jnp.int32), **kw)
    np.testing.assert_array_equal(np.asarray(a["codes"]), np.asarray(b["codes"]))
    np.testing.assert_array_equal(np.asarray(a["lengths"]),
                                  np.asarray(b["lengths"]))
