"""Scaling-toolkit parity vs the reference custom autograd functions:
forward values and backward gradient rewrites must match."""

import numpy as np
import pytest
import torch

import tests.ref_utils  # noqa: F401  (registers shims)

import jax
import jax.numpy as jnp

from valle_tpu.nn import scaling as S


def _grads(torch_fn, jax_fn, x_np, g_np):
    xt = torch.tensor(x_np, requires_grad=True)
    yt = torch_fn(xt)
    yt.backward(torch.tensor(g_np))
    ref_y, ref_g = yt.detach().numpy(), xt.grad.numpy()

    y, vjp = jax.vjp(jax_fn, jnp.asarray(x_np))
    (gx,) = vjp(jnp.asarray(g_np))
    return ref_y, ref_g, np.asarray(y), np.asarray(gx)


def test_double_swish():
    from valle.modules.scaling import DoubleSwishFunction

    rng = np.random.RandomState(0)
    x = rng.randn(64, 32).astype(np.float32)
    g = rng.randn(64, 32).astype(np.float32)
    ref_y, ref_g, y, gx = _grads(
        lambda t: DoubleSwishFunction.apply(t), S.double_swish, x, g
    )
    np.testing.assert_allclose(y, ref_y, rtol=1e-5, atol=1e-6)
    # reference uses a stochastic uint8 cache for the derivative: compare to
    # the exact derivative with the quantization tolerance (1/255 * range)
    np.testing.assert_allclose(gx, ref_g, atol=np.abs(g).max() * 1.3 / 255 * 2)


def test_activation_balancer():
    from valle.modules.scaling import (
        ActivationBalancerFunction,
        _compute_scale_factor,
        _compute_sign_factor,
    )

    rng = np.random.RandomState(1)
    x = (rng.randn(50, 16) * 2 + 0.5).astype(np.float32)
    g = rng.randn(50, 16).astype(np.float32)
    kw = dict(min_positive=0.05, max_positive=0.95, min_abs=0.2, max_abs=1.0)

    xt = torch.tensor(x, requires_grad=True)
    sf = _compute_scale_factor(
        xt.detach(), 1, kw["min_abs"], kw["max_abs"], gain_factor=0.02, max_factor=0.04
    )
    sgf = _compute_sign_factor(
        xt.detach(), 1, kw["min_positive"], kw["max_positive"],
        gain_factor=0.01, max_factor=0.04,
    )
    yt = ActivationBalancerFunction.apply(xt, sf, sgf, 1)
    yt.backward(torch.tensor(g))

    y, vjp = jax.vjp(
        lambda t: S.activation_balancer(
            t,
            channel_dim=1,
            max_factor=0.04,
            sign_gain_factor=0.01,
            scale_gain_factor=0.02,
            prob=1.0,
            **kw,
        ),
        jnp.asarray(x),
    )
    (gx,) = vjp(jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(y), x)
    np.testing.assert_allclose(np.asarray(gx), xt.grad.numpy(), rtol=1e-5, atol=1e-6)


def test_whiten():
    from valle.modules.scaling import WhiteningPenaltyFunction, _whitening_metric

    rng = np.random.RandomState(2)
    # anisotropic data so the metric exceeds the limit
    base = rng.randn(100, 1) @ rng.randn(1, 24) + 0.1 * rng.randn(100, 24)
    x = base.astype(np.float32)
    g = rng.randn(100, 24).astype(np.float32)

    m_ref = float(_whitening_metric(torch.tensor(x), 2))
    m = float(S.whitening_metric(jnp.asarray(x), 2))
    assert m == pytest.approx(m_ref, rel=1e-4)

    xt = torch.tensor(x, requires_grad=True)
    yt = WhiteningPenaltyFunction.apply(xt, 2, 1.1, 0.01)
    yt.backward(torch.tensor(g))

    y, vjp = jax.vjp(lambda t: S.whiten(t, 2, 1.1, 0.01), jnp.asarray(x))
    (gx,) = vjp(jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(gx), xt.grad.numpy(), rtol=1e-4, atol=1e-6)


def test_basic_norm():
    from valle.modules.scaling import BasicNorm as RefBasicNorm

    rng = np.random.RandomState(3)
    x = rng.randn(10, 32).astype(np.float32)
    ref = RefBasicNorm(32, eps=0.25, learn_eps=True)
    ref.eval()
    with torch.no_grad():
        ref_y = ref(torch.tensor(x)).numpy()
    y = S.basic_norm(jnp.asarray(x), jnp.log(jnp.asarray(0.25)))
    np.testing.assert_allclose(np.asarray(y), ref_y, rtol=1e-5, atol=1e-6)


def test_softmax_grad():
    from valle.modules.scaling import softmax as ref_softmax

    rng = np.random.RandomState(4)
    x = rng.randn(6, 11).astype(np.float32)
    g = rng.randn(6, 11).astype(np.float32)
    ref_y, ref_g, y, gx = _grads(
        lambda t: ref_softmax(t, -1), lambda t: S.softmax(t, -1), x, g
    )
    np.testing.assert_allclose(y, ref_y, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(gx, ref_g, rtol=1e-4, atol=1e-6)


def test_penalize_abs_values_gt():
    from valle.modules.scaling import penalize_abs_values_gt as ref_pen

    rng = np.random.RandomState(5)
    x = (rng.randn(20, 8) * 3).astype(np.float32)
    g = rng.randn(20, 8).astype(np.float32)
    ref_y, ref_g, y, gx = _grads(
        lambda t: ref_pen(t, 2.0, 0.5),
        lambda t: S.penalize_abs_values_gt(t, 2.0, 0.5),
        x,
        g,
    )
    np.testing.assert_allclose(y, ref_y)
    np.testing.assert_allclose(gx, ref_g, rtol=1e-5, atol=1e-6)


def test_random_clamp_parity():
    """Same clamp mask -> identical forward and backward as the reference
    RandomClampFunction (the mask draw is rng-backend-specific, so we drive
    both with prob=1.0 where the mask is deterministic; reflect exercised)."""
    from valle.modules.scaling import random_clamp as ref_random_clamp

    rng = np.random.RandomState(3)
    x = (rng.randn(40, 8) * 2).astype(np.float32)
    g = rng.randn(40, 8).astype(np.float32)
    for reflect in (0.0, 0.1):
        ref_y, ref_g, y, gx = _grads(
            lambda t: ref_random_clamp(t, min=-1.0, max=1.0, prob=1.0,
                                       reflect=reflect),
            lambda a: S.random_clamp(a, jax.random.PRNGKey(0), min=-1.0,
                                     max=1.0, prob=1.0, reflect=reflect),
            x, g,
        )
        np.testing.assert_allclose(y, ref_y, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(gx, ref_g, rtol=1e-6, atol=1e-6)
    # prob<1: forward values are each either x or clamp(x); expectation check
    y = np.asarray(S.random_clamp(jnp.asarray(x), jax.random.PRNGKey(1),
                                  min=-1.0, max=1.0, prob=0.5))
    clamped = np.clip(x, -1.0, 1.0)
    assert np.all((y == x) | (y == clamped))
    frac = (y != x)[np.abs(x) > 1.0].mean()
    assert 0.3 < frac < 0.7, frac


def test_random_grad_parity():
    """random_cast_to_half: expectation preserved for tiny values, identity
    elsewhere (ref scaling.py:222-235); random_grad passes fp32 grads
    through untouched (ref :261-280)."""
    from valle.modules.scaling import random_cast_to_half as ref_cast

    rng = np.random.RandomState(4)
    x = (rng.randn(20000) * 1e-5).astype(np.float32)
    got = np.asarray(
        S.random_cast_to_half(jnp.asarray(x), jax.random.PRNGKey(0))
    ).astype(np.float64)
    ref = ref_cast(torch.tensor(x)).numpy().astype(np.float64)
    # same support: zeros or +-min_abs where tiny, x where large
    min_abs = 5.0e-6
    tiny = np.abs(x) < min_abs
    vals = np.unique(np.abs(got[tiny]))
    # fp16 rounds min_abs itself by ~0.1%; support is {0, ~min_abs}
    assert np.all((vals == 0.0) | (np.abs(vals / min_abs - 1.0) < 0.01)), vals
    # expectation preserved to sampling noise on the tiny values
    np.testing.assert_allclose(got[tiny].mean(), x[tiny].mean(),
                               atol=3 * min_abs / np.sqrt(tiny.sum()))
    np.testing.assert_allclose(got[~tiny], ref[~tiny], rtol=1e-3)

    # fp32 grads flow through random_grad untouched
    y, vjp = jax.vjp(
        lambda a: S.random_grad(a, jax.random.PRNGKey(0)), jnp.asarray(x)
    )
    (gx,) = vjp(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(y), x)
    np.testing.assert_array_equal(np.asarray(gx), x)


def test_sr_linear_parity():
    from valle.modules.scaling import SRLinear as RefSRLinear

    torch.manual_seed(0)
    ref = RefSRLinear(8, 4)
    rng = np.random.RandomState(5)
    x = rng.randn(6, 8).astype(np.float32)

    ours = S.SRLinear(8, 4)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = {
        "params": {
            "weight": jnp.asarray(ref.weight.detach().numpy()),
            "bias": jnp.asarray(ref.bias.detach().numpy()),
            "sigma": jnp.asarray(ref.sigma.detach().numpy()),
        },
        "spectral": {"u": jnp.asarray(ref.u.numpy().copy())},
    }
    got, upd = ours.apply(variables, jnp.asarray(x), mutable=["spectral"])
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
    # the power-iteration buffer advanced identically
    np.testing.assert_allclose(
        np.asarray(upd["spectral"]["u"]), ref.u.numpy(), rtol=1e-4, atol=1e-5
    )


def test_sr_conv1d_parity():
    from valle.modules.scaling import SRConv1d as RefSRConv1d

    torch.manual_seed(1)
    ref = RefSRConv1d(4, 6, kernel_size=3)
    rng = np.random.RandomState(6)
    x = rng.randn(2, 4, 16).astype(np.float32)

    ours = S.SRConv1d(4, 6, 3)
    variables = {
        "params": {
            "weight": jnp.asarray(ref.weight.detach().numpy()),
            "bias": jnp.asarray(ref.bias.detach().numpy()),
            "sigma": jnp.asarray(ref.sigma.detach().numpy()),
        },
        "spectral": {"u": jnp.asarray(ref.u.numpy().copy())},
    }
    got, _ = ours.apply(variables, jnp.asarray(x), mutable=["spectral"])
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
