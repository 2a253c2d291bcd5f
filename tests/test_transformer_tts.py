"""Transformer TTS baseline: forward + autoregressive mel inference smoke,
default and scaling_xformers variants (ref valle/tests/scaling_test.py and
valle_test.py:225-267 smoke pattern)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from valle_tpu.models import ModelConfig, TransformerTTS


@pytest.mark.parametrize("scaling_xformers", [False, True])
def test_forward_and_inference(scaling_xformers):
    cfg = ModelConfig(
        model_name="Transformer",
        decoder_dim=64,
        nhead=4,
        num_layers=2,
        scaling_xformers=scaling_xformers,
    )
    model = TransformerTTS(cfg)
    rng = jax.random.PRNGKey(0)
    B, S, T = 2, 8, 20
    x = jax.random.randint(rng, (B, S), 0, 512)
    x_lens = jnp.array([S, S - 2])
    y = jax.random.normal(rng, (B, T, cfg.num_mel_bins))
    y_lens = jnp.array([T, T - 5])

    variables = model.init(
        {"params": rng, "dropout": rng}, x, x_lens, y, y_lens, deterministic=True
    )
    out = model.apply(variables, x, x_lens, y, y_lens, deterministic=True)
    assert np.isfinite(float(out["loss"]))
    assert float(out["stop_loss"]) > 0

    # train-mode (dropout + balancer paths active)
    out_t = model.apply(
        variables,
        x,
        x_lens,
        y,
        y_lens,
        deterministic=False,
        rngs={"dropout": rng},
    )
    assert np.isfinite(float(out_t["loss"]))

    # gradient flows through the custom-vjp scaling ops
    def loss_fn(params):
        o = model.apply(
            {"params": params}, x, x_lens, y, y_lens, deterministic=False,
            rngs={"dropout": rng},
        )
        return o["loss"]

    grads = jax.grad(loss_fn)(variables["params"])
    gnorm = sum(float(jnp.sum(g.astype(jnp.float32) ** 2)) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0

    inf = model.apply(
        variables, x, x_lens, max_steps=12, deterministic=True, method="inference"
    )
    assert inf["mel"].shape == (B, 12, cfg.num_mel_bins)
    assert inf["lengths"].shape == (B,)
