"""Optimizer parity: our optax ScaledAdam/Eve vs the reference icefall ones.

Runs both on identical parameters with identical gradient sequences and
compares parameter trajectories step by step.
"""

import numpy as np
import pytest
import torch

import tests.ref_utils  # noqa: F401  (registers shims)

import jax
import jax.numpy as jnp

from valle_tpu.optim import eden_lr, eve, scaled_adam


def _ref_scaled_adam(params, lr, clipping_scale):
    from valle.modules.optim import ScaledAdam

    names = [[n for n, _ in params]]
    return ScaledAdam(
        [p for _, p in params],
        lr=lr,
        clipping_scale=clipping_scale,
        betas=(0.9, 0.95),
        parameters_names=names,
        show_dominant_parameters=True,
    )


@pytest.mark.parametrize("clipping_scale", [None, 2.0])
def test_scaled_adam_parity(clipping_scale):
    torch.manual_seed(0)
    rng = np.random.RandomState(0)
    shapes = {"w": (16, 8), "b": (8,), "alpha": (1,)}
    init = {k: rng.randn(*s).astype(np.float32) for k, s in shapes.items()}
    grads_seq = [
        {k: rng.randn(*s).astype(np.float32) * 0.1 for k, s in shapes.items()}
        for _ in range(12)
    ]
    lr = 0.03

    # reference
    tparams = {k: torch.nn.Parameter(torch.tensor(v)) for k, v in init.items()}
    opt = _ref_scaled_adam(list(tparams.items()), lr, clipping_scale)
    for g in grads_seq:
        for k, p in tparams.items():
            p.grad = torch.tensor(g[k])
        opt.step()
        opt.zero_grad()

    # ours
    jparams = {k: jnp.asarray(v) for k, v in init.items()}
    tx = scaled_adam(
        learning_rate=lr, clipping_scale=clipping_scale, betas=(0.9, 0.95),
        show_dominant_parameters=True,
    )
    state = tx.init(jparams)

    @jax.jit
    def step(params, state, grads):
        updates, state = tx.update(grads, state, params)
        return jax.tree.map(lambda p, u: p + u, params, updates), state

    for g in grads_seq:
        jparams, state = step(jparams, state, {k: jnp.asarray(v) for k, v in g.items()})

    for k in shapes:
        np.testing.assert_allclose(
            np.asarray(jparams[k]),
            tparams[k].detach().numpy(),
            rtol=2e-5,
            atol=2e-6,
            err_msg=f"param {k} diverged (clipping={clipping_scale})",
        )


def test_eve_parity():
    from valle.modules.optim import Eve

    rng = np.random.RandomState(1)
    shapes = {"w": (12, 6), "s": (1,)}
    init = {k: rng.randn(*s).astype(np.float32) for k, s in shapes.items()}
    grads_seq = [
        {k: rng.randn(*s).astype(np.float32) * 0.1 for k, s in shapes.items()}
        for _ in range(8)
    ]
    tparams = {k: torch.nn.Parameter(torch.tensor(v)) for k, v in init.items()}
    opt = Eve(list(tparams.values()), lr=1e-3)
    for g in grads_seq:
        for k, p in tparams.items():
            p.grad = torch.tensor(g[k])
        opt.step()
        opt.zero_grad()

    jparams = {k: jnp.asarray(v) for k, v in init.items()}
    tx = eve(learning_rate=1e-3)
    state = tx.init(jparams)
    for g in grads_seq:
        updates, state = tx.update(
            {k: jnp.asarray(v) for k, v in g.items()}, state, jparams
        )
        jparams = jax.tree.map(lambda p, u: p + u, jparams, updates)

    for k in shapes:
        np.testing.assert_allclose(
            np.asarray(jparams[k]), tparams[k].detach().numpy(), rtol=2e-5, atol=2e-6
        )


def test_eden_schedule_parity():
    import tests.ref_utils  # noqa: F401
    from valle.modules.optim import Eden, ScaledAdam

    p = torch.nn.Parameter(torch.zeros(4, 4))
    opt = ScaledAdam([p], lr=0.05, parameters_names=[["p"]])
    sch = Eden(opt, lr_batches=5000, lr_epochs=4, warmup_batches=500)
    for epoch in range(3):
        sch.step_epoch(epoch)
        for b in range(5):
            sch.step_batch()
            ref_lr = sch.get_last_lr()[0]
            ours = float(eden_lr(0.05, sch.batch, epoch, 5000, 4, 500))
            assert ours == pytest.approx(ref_lr, rel=1e-6), (epoch, sch.batch)


def test_dominant_parameter_diagnostic(caplog):
    """The _show_gradient_dominating_parameter port (ref optim.py:414-483):
    when the clip factor drops below 0.1, the transformation logs the
    parameter contributing the largest share of tot_sumsq."""
    import logging

    rng = np.random.RandomState(0)
    params = {
        "big": jnp.asarray(rng.randn(16, 8).astype(np.float32)),
        "small": jnp.asarray(rng.randn(8).astype(np.float32)),
    }
    tx = scaled_adam(
        learning_rate=0.03, clipping_scale=2.0,
        clipping_update_period=4, show_dominant_parameters=True,
    )
    state = tx.init(params)

    def step(params, state, scale):
        grads = jax.tree.map(lambda p: jnp.ones_like(p) * scale, params)
        updates, state = tx.update(grads, state, params)
        return jax.tree.map(lambda p, u: p + u, params, updates), state

    with caplog.at_level(logging.INFO):
        for _ in range(8):  # establish the norm history / threshold
            params, state = step(params, state, 0.01)
        assert not any("Dominating" in r.message for r in caplog.records)
        params, state = step(params, state, 1e4)  # clip << 0.1 now
        jax.effects_barrier()
    msgs = [r.message for r in caplog.records if "Dominating" in r.message]
    assert msgs, "severe clipping must log the dominant parameter"
    assert "big" in msgs[0], msgs[0]


@pytest.mark.parametrize("opt_name", ["scaled_adam", "eve"])
def test_batched_axis_matches_separate_tensors(opt_name):
    """A stacked (L, ...) leaf under batched_axis_fn must follow the exact
    trajectory of L SEPARATE tensors (the reference's layout): per-slice
    rms / size stats (ScaledAdam) and per-slice decay gates (Eve).  The
    slices are scaled very differently so a shared statistic would diverge
    immediately."""
    from valle_tpu.optim import eve as eve_fn

    rng = np.random.RandomState(3)
    L, n, m = 3, 6, 4
    # slice scales far apart: one tiny (below Eve target_rms / ScaledAdam
    # min-rms region), one moderate, one large
    base = rng.randn(L, n, m).astype(np.float32)
    base *= np.array([0.01, 0.3, 3.0], np.float32)[:, None, None]
    grads_seq = [
        (rng.randn(L, n, m).astype(np.float32) * 0.1) for _ in range(9)
    ]

    def make(kind):
        if opt_name == "scaled_adam":
            return scaled_adam(
                learning_rate=0.03, clipping_scale=None,
                batched_axis_fn=(lambda path: True) if kind == "batched"
                else None,
            )
        return eve_fn(
            learning_rate=1e-2, weight_decay=0.1,
            batched_axis_fn=(lambda path: True) if kind == "batched"
            else None,
        )

    # batched: one stacked leaf
    txb = make("batched")
    pb = {"stack": jnp.asarray(base)}
    sb = txb.init(pb)
    for g in grads_seq:
        up, sb = txb.update({"stack": jnp.asarray(g)}, sb, pb)
        pb = jax.tree.map(lambda p, u: p + u, pb, up)

    # separate: L independent leaves through the SAME transformation
    txs = make("plain")
    ps = {f"t{i}": jnp.asarray(base[i]) for i in range(L)}
    ss = txs.init(ps)
    for g in grads_seq:
        up, ss = txs.update(
            {f"t{i}": jnp.asarray(g[i]) for i in range(L)}, ss, ps
        )
        ps = jax.tree.map(lambda p, u: p + u, ps, up)

    for i in range(L):
        np.testing.assert_allclose(
            np.asarray(pb["stack"][i]), np.asarray(ps[f"t{i}"]),
            rtol=1e-5, atol=1e-6, err_msg=f"slice {i}",
        )
