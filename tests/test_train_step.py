"""Train-step tests: loss goes down, stage filtering freezes the right
subtrees, grad accumulation matches a bigger batch, and the whole step runs
sharded over the 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from valle_tpu.models import ModelConfig, VALLE
from valle_tpu.optim import scaled_adam
from valle_tpu.parallel.mesh import make_mesh, shard_batch
from valle_tpu.train.step import init_train_state, make_train_step

CFG = ModelConfig(decoder_dim=64, nhead=4, num_layers=2, num_quantizers=8)


def _batch(a=1, b=4, s=8, t=24, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "text_tokens": jnp.asarray(rng.randint(0, 512, (a, b, s)), jnp.int32),
        "text_tokens_lens": jnp.asarray(rng.randint(4, s + 1, (a, b)), jnp.int32),
        "audio_features": jnp.asarray(rng.randint(0, 1024, (a, b, t, 8)), jnp.int32),
        "audio_features_lens": jnp.asarray(rng.randint(12, t + 1, (a, b)), jnp.int32),
    }


def _flat_micro(batch):
    return jax.tree.map(lambda x: x[0], batch)


def test_loss_decreases():
    model = VALLE(CFG)
    tx = scaled_adam(learning_rate=0.02, clipping_scale=None)
    batch = _batch()
    state = init_train_state(model, tx, jax.random.PRNGKey(0), _flat_micro(batch))
    step = make_train_step(model, tx, lambda s, e: 0.02, train_stage=0)
    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, rng, jnp.zeros((), jnp.int32))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses


def test_stage_filtering():
    model = VALLE(CFG)
    tx = scaled_adam(learning_rate=0.05, clipping_scale=None)
    batch = _batch()
    state = init_train_state(
        model, tx, jax.random.PRNGKey(0), _flat_micro(batch), train_stage=1
    )
    before = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
    step = make_train_step(model, tx, lambda s, e: 0.05, train_stage=1)
    state, _ = step(state, batch, jax.random.PRNGKey(1), jnp.zeros((), jnp.int32))
    after = state.params
    for k in before:
        changed = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(after[k]), jax.tree.leaves(before[k]))
        )
        if k.startswith("ar_"):
            assert changed, f"{k} should train at stage 1"
        else:
            assert not changed, f"{k} must stay frozen at stage 1"


def test_grad_accumulation_equals_big_batch():
    """With dropout off, grads accumulated over micro-batches must equal the
    big-batch grads exactly (the loss is reduction='sum', ref trainer.py:
    672-696), so the ScaledAdam updates — and therefore the post-step params
    — must match to fp32 tolerance."""
    cfg = CFG.replace(dropout=0.0)
    model = VALLE(cfg)
    tx = scaled_adam(learning_rate=0.01, clipping_scale=None)
    big = _batch(a=1, b=8, seed=2)
    # Parity caveat: the reference's AR loss targets EOS at every padded
    # position up to the batch max(y_lens) (ref valle.py:322-333,877), so
    # the loss is row-coupled through that max.  Accumulation matches the
    # big batch exactly only when the micro-batches share the same
    # max(y_lens) — pin the audio lens so they do.
    t = big["audio_features"].shape[2]
    big["audio_features_lens"] = jnp.full_like(big["audio_features_lens"], t)
    # same data split into two micro-batches
    small = jax.tree.map(lambda x: x.reshape((2, 4) + x.shape[2:]), big)
    s_big = init_train_state(
        model, tx, jax.random.PRNGKey(0), _flat_micro(big), train_stage=1
    )
    # init_train_state again (same key) because step() donates its input state
    s_small = init_train_state(
        model, tx, jax.random.PRNGKey(0), _flat_micro(big), train_stage=1
    )

    # stage 1 (AR-only) has no per-micro NAR stage draw; deterministic=True
    # disables the hardcoded PE dropout so the two runs see identical math.
    step_big = make_train_step(
        model, tx, lambda s, e: 0.01, train_stage=1, deterministic=True
    )
    step_small = make_train_step(
        model, tx, lambda s, e: 0.01, train_stage=1, deterministic=True
    )
    s_big2, m_big = step_big(s_big, big, jax.random.PRNGKey(9), jnp.zeros((), jnp.int32))
    s_small2, m_small = step_small(
        s_small, small, jax.random.PRNGKey(9), jnp.zeros((), jnp.int32)
    )
    np.testing.assert_allclose(
        float(m_big["loss"]), float(m_small["loss"]), rtol=1e-6
    )
    big_leaves, treedef = jax.tree_util.tree_flatten(s_big2.params)
    small_leaves, treedef2 = jax.tree_util.tree_flatten(s_small2.params)
    assert treedef == treedef2
    for bl, sl in zip(big_leaves, small_leaves):
        np.testing.assert_allclose(
            np.asarray(bl, np.float32), np.asarray(sl, np.float32),
            rtol=2e-5, atol=1e-7,
        )


def test_remat_grads_match():
    """remat=True must be a pure memory/time trade: identical grads (to
    recompute reordering noise) as the non-remat path."""
    rng = np.random.RandomState(0)
    b, s, t = 2, 8, 24
    x = jnp.asarray(rng.randint(0, 512, (b, s)), jnp.int32)
    xl = jnp.asarray([8, 6], jnp.int32)
    y = jnp.asarray(rng.randint(0, 1024, (b, t, 8)), jnp.int32)
    yl = jnp.asarray([24, 20], jnp.int32)
    key = jax.random.PRNGKey(0)

    grads = {}
    for remat in (False, True):
        cfg = CFG.replace(dropout=0.0, remat=remat)
        model = VALLE(cfg)
        variables = model.init(
            {"params": key, "stage": key}, x, xl, y, yl, train_stage=0,
            deterministic=True, nar_stage=jnp.asarray(2),
        )

        def loss(params):
            out = model.apply(
                {"params": params}, x, xl, y, yl, train_stage=0,
                deterministic=True, nar_stage=jnp.asarray(2),
            )
            return out["loss"]

        grads[remat] = jax.grad(loss)(variables["params"])

    for a, b_ in zip(jax.tree_util.tree_leaves(grads[False]),
                     jax.tree_util.tree_leaves(grads[True])):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=5e-5
        )


def test_sharded_step_on_mesh():
    mesh = make_mesh()  # 8 CPU devices, data axis
    assert mesh.shape["data"] == 8
    model = VALLE(CFG)
    tx = scaled_adam(learning_rate=0.02, clipping_scale=2.0)
    batch = _batch(a=2, b=8)
    state = init_train_state(model, tx, jax.random.PRNGKey(0), _flat_micro(batch))
    step = make_train_step(model, tx, lambda s, e: 0.02, train_stage=0)
    with mesh:
        sharded = shard_batch(batch, mesh, axis=1)
        state, metrics = step(
            state, sharded, jax.random.PRNGKey(1), jnp.zeros((), jnp.int32)
        )
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_example_mask_dummy_rows_no_loss_change():
    """Appending masked zero-length dummy rows (fixed-batch shape padding)
    must leave loss and metrics identical for every train stage and prefix
    mode that draws batch-level randomness from min(y_lens)."""
    for prefix_mode in (0, 1, 2):
        cfg = ModelConfig(
            decoder_dim=64, nhead=4, num_layers=2, num_quantizers=8,
            prefix_mode=prefix_mode, dropout=0.0,
        )
        model = VALLE(cfg)
        rng = np.random.RandomState(3)
        b, s, t = 3, 8, 24
        x = rng.randint(1, 512, (b, s)).astype(np.int32)
        x_lens = np.array([8, 6, 7], np.int32)
        y = rng.randint(0, 1024, (b, t, 8)).astype(np.int32)
        y_lens = np.array([24, 16, 20], np.int32)

        pad = 2
        xp = np.concatenate([x, np.repeat(x[:1], pad, axis=0)])
        xp_lens = np.concatenate([x_lens, np.full((pad,), 2, np.int32)])
        yp = np.concatenate([y, np.zeros((pad, t, 8), np.int32)])
        yp_lens = np.concatenate([y_lens, np.zeros((pad,), np.int32)])
        mask = np.array([True] * b + [False] * pad)

        key = jax.random.PRNGKey(0)
        variables = model.init(
            {"params": key, "stage": key}, jnp.asarray(x), jnp.asarray(x_lens),
            jnp.asarray(y), jnp.asarray(y_lens), train_stage=0,
            deterministic=True, nar_stage=jnp.asarray(2),
        )
        kw = dict(train_stage=0, deterministic=True, nar_stage=jnp.asarray(2),
                  prefix_len=jnp.asarray(4) if prefix_mode in (1, 2) else None,
                  prompt_starts=jnp.asarray([0, 1, 2, 0, 0][: b + pad], jnp.int32)
                  if prefix_mode == 2 else None)
        kw_real = dict(kw)
        if prefix_mode == 2:
            kw_real["prompt_starts"] = kw["prompt_starts"][:b]
        out_real = model.apply(
            variables, jnp.asarray(x), jnp.asarray(x_lens), jnp.asarray(y),
            jnp.asarray(y_lens), example_mask=jnp.ones((b,), bool), **kw_real,
        )
        out_pad = model.apply(
            variables, jnp.asarray(xp), jnp.asarray(xp_lens), jnp.asarray(yp),
            jnp.asarray(yp_lens), example_mask=jnp.asarray(mask), **kw,
        )
        for k in ("loss", "ar_loss", "nar_loss", "frames"):
            np.testing.assert_allclose(
                float(out_real[k]), float(out_pad[k]), rtol=2e-5,
                err_msg=f"prefix_mode={prefix_mode} key={k}",
            )
        assert np.isfinite(float(out_pad["loss"]))
