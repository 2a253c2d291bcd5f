"""BASELINE config 5 mechanism: batched zero-shot generation data-parallel
over a device mesh (the multi-host 256-prompt scenario, scaled down to the
8-CPU-device test mesh).  Sharded generate must produce exactly the tokens
the unsharded run produces — GSPMD only changes placement, not math."""

import numpy as np

import jax
import jax.numpy as jnp

from valle_tpu.models import ModelConfig, VALLE
from valle_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from valle_tpu.sample import generate

D, NHEAD, LAYERS, Q = 64, 4, 2, 8


def test_generate_sharded_over_mesh():
    cfg = ModelConfig(
        decoder_dim=D, nhead=NHEAD, num_layers=LAYERS, num_quantizers=Q
    )
    model = VALLE(cfg)
    rng = np.random.RandomState(0)
    b, s, p = 16, 6, 8  # 16 sequences over 8 devices
    x = jnp.asarray(rng.randint(0, 512, (b, s)), jnp.int32)
    x_lens = jnp.asarray(rng.randint(4, s + 1, (b,)), jnp.int32)
    prompt = jnp.asarray(rng.randint(0, 1024, (b, p, Q)), jnp.int32)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "stage": key},
        x, x_lens, jnp.zeros((b, 16, Q), jnp.int32),
        jnp.full((b,), 16, jnp.int32),
        train_stage=0, deterministic=True, nar_stage=jnp.asarray(2),
    )

    kwargs = dict(top_k=1, max_new_tokens=16, forbid_eos=True)
    base = generate(model, variables, jax.random.PRNGKey(7), x, x_lens,
                    prompt, **kwargs)

    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    with mesh:
        bs = batch_sharding(mesh)
        rep = replicated(mesh)
        sharded_vars = jax.device_put(variables, rep)
        xs = jax.device_put(x, bs)
        xl = jax.device_put(x_lens, bs)
        pr = jax.device_put(prompt, bs)
        out = generate(model, sharded_vars, jax.random.PRNGKey(7), xs, xl,
                       pr, **kwargs)
        codes = np.asarray(out["codes"])
        lens = np.asarray(out["lengths"])

    # greedy + same key: exact token parity with the unsharded run
    np.testing.assert_array_equal(lens, np.asarray(base["lengths"]))
    np.testing.assert_array_equal(codes, np.asarray(base["codes"]))


def test_quantized_generate_sharded_dp_tp():
    """int8 W8A8 serving over a dp x tp mesh: the tensor-sharded quantized
    run must match the unsharded quantized run token-for-token (placement
    only; the int8 math is identical)."""
    from valle_tpu.nn.qdense import quantize_variables
    from valle_tpu.parallel.mesh import quantized_shardings

    cfg = ModelConfig(
        decoder_dim=D, nhead=NHEAD, num_layers=LAYERS, num_quantizers=Q,
        act_quant=True,
    )
    model = VALLE(cfg)
    rng = np.random.RandomState(1)
    b, s, p = 8, 6, 8
    x = jnp.asarray(rng.randint(0, 512, (b, s)), jnp.int32)
    x_lens = jnp.asarray(rng.randint(4, s + 1, (b,)), jnp.int32)
    prompt = jnp.asarray(rng.randint(0, 1024, (b, p, Q)), jnp.int32)
    key = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": key, "stage": key},
        x, x_lens, jnp.zeros((b, 16, Q), jnp.int32),
        jnp.full((b,), 16, jnp.int32),
        train_stage=0, deterministic=True, nar_stage=jnp.asarray(2),
    )
    qvars = quantize_variables(variables)

    kwargs = dict(top_k=1, max_new_tokens=12, forbid_eos=True)
    base = generate(model, qvars, jax.random.PRNGKey(3), x, x_lens, prompt,
                    **kwargs)

    mesh = make_mesh(data=4, model=2)
    with mesh:
        bs = batch_sharding(mesh)
        sharded = jax.tree.map(
            jax.device_put, qvars, quantized_shardings(qvars, mesh)
        )
        out = generate(
            model, sharded, jax.random.PRNGKey(3),
            jax.device_put(x, bs), jax.device_put(x_lens, bs),
            jax.device_put(prompt, bs), **kwargs,
        )
        codes = np.asarray(out["codes"])
        lens = np.asarray(out["lengths"])

    np.testing.assert_array_equal(lens, np.asarray(base["lengths"]))
    np.testing.assert_array_equal(codes, np.asarray(base["codes"]))
