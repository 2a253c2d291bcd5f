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
