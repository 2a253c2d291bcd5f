"""icefall/Zipformer training-stability toolkit as jax.custom_vjp ops.

Parity targets (ref /root/reference/valle/modules/scaling.py):
  - ActivationBalancer (:639-761 + :35-138): identity forward; backward
    nudges gradients to balance per-channel sign proportions and magnitudes.
  - DoubleSwish (:1156-1225): x * sigmoid(x-1) with the analytic derivative
    (the reference's uint8 derivative cache is a CUDA memory trick — on TPU
    we keep the exact fp32 derivative, same expectation).
  - Whiten (:803-962): identity forward; backward adds the gradient of
    relu(whitening_metric - limit), rescaled to grad_scale * |g|.
  - MaxEig (:1002-1153): power-iteration top-eigendirection limiter.
  - BasicNorm (:360-426): rms-style norm with learnable log-eps.
  - softmax (:286-316): fp32 backward.
  - penalize_abs_values_gt (:764-789), with_loss (:966-985).
  - ScaledLinear/ScaledConv init scaling (:427-550) -> init helpers.

Randomized application (the reference gates on random.random() < prob and
batch counts) is expressed with explicit ``apply`` flags / rng keys so the
ops stay pure under jit.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


# ----------------------------------------------------------- ActivationBalancer


def _compute_scale_factor(x, channel_dim, min_abs, max_abs, gain_factor, max_factor):
    dims = tuple(d for d in range(x.ndim) if d != channel_dim)
    x_abs_mean = jnp.mean(jnp.abs(x), axis=dims).astype(jnp.float32)
    if min_abs == 0.0:
        below = 0.0
    else:
        below = jnp.clip(
            (min_abs - x_abs_mean) * (gain_factor / min_abs), 0, max_factor
        )
    above = jnp.clip(
        (x_abs_mean - max_abs) * (gain_factor / max_abs), 0, max_factor
    )
    return below - above


def _compute_sign_factor(
    x, channel_dim, min_positive, max_positive, gain_factor, max_factor
):
    dims = tuple(d for d in range(x.ndim) if d != channel_dim)
    proportion_positive = jnp.mean((x > 0).astype(jnp.float32), axis=dims)
    factor1 = (
        jnp.clip(
            (min_positive - proportion_positive) * (gain_factor / min_positive),
            0,
            max_factor,
        )
        if min_positive != 0.0
        else 0.0
    )
    factor2 = (
        jnp.clip(
            (proportion_positive - max_positive) * (gain_factor / (1.0 - max_positive)),
            0,
            max_factor,
        )
        if max_positive != 1.0
        else 0.0
    )
    return factor1 - factor2


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _balancer_core(x, scale_factor, sign_factor, channel_dim):
    return x


def _balancer_fwd(x, scale_factor, sign_factor, channel_dim):
    return x, (x > 0, scale_factor, sign_factor)


def _balancer_bwd(channel_dim, res, g):
    xgt0, scale_factor, sign_factor = res
    shape = [1] * g.ndim
    shape[channel_dim] = g.shape[channel_dim]
    scale_factor = scale_factor.reshape(shape)
    factor = scale_factor * (xgt0.astype(g.dtype) - 0.5)
    if sign_factor is not None:
        factor = sign_factor.reshape(shape) + factor
    neg_delta = jnp.abs(g) * factor.astype(g.dtype)
    return (g - neg_delta, None, None)


_balancer_core.defvjp(_balancer_fwd, _balancer_bwd)


def activation_balancer(
    x: jnp.ndarray,
    *,
    channel_dim: int = -1,
    min_positive: float = 0.05,
    max_positive: float = 0.95,
    max_factor: float = 0.04,
    sign_gain_factor: float = 0.01,
    scale_gain_factor: float = 0.02,
    min_abs: float = 0.2,
    max_abs: float = 100.0,
    prob: float = 1.0,
    apply: bool = True,
) -> jnp.ndarray:
    """Identity with gradient balancing (ref scaling.py:639-761).

    ``prob`` scales the gain factors the way the reference divides them by
    the application probability when it fires (:742-749); set apply=False
    (or in eval) for a pure no-op.
    """
    if not apply:
        return x
    if channel_dim < 0:
        channel_dim += x.ndim
    xd = jax.lax.stop_gradient(x)
    sign_factor = None
    if min_positive != 0.0 or max_positive != 1.0:
        sign_factor = _compute_sign_factor(
            xd, channel_dim, min_positive, max_positive,
            gain_factor=sign_gain_factor / prob, max_factor=max_factor,
        )
    scale_factor = _compute_scale_factor(
        xd, channel_dim, min_abs, max_abs,
        gain_factor=scale_gain_factor / prob, max_factor=max_factor,
    )
    return _balancer_core(x, scale_factor, sign_factor, channel_dim)


# ------------------------------------------------------------------ DoubleSwish


@jax.custom_vjp
def double_swish(x):
    return x * jax.nn.sigmoid(x - 1.0)


def _dswish_fwd(x):
    s = jax.nn.sigmoid(x.astype(jnp.float32) - 1.0)
    y = x.astype(jnp.float32) * s
    deriv = y * (1 - s) + s
    return y.astype(x.dtype), deriv.astype(x.dtype)


def _dswish_bwd(deriv, g):
    return (g * deriv,)


double_swish.defvjp(_dswish_fwd, _dswish_bwd)


def balanced_double_swish(
    x, *, channel_dim=-1, max_abs=10.0, prob: float = 0.25, apply: bool = True
):
    """ActivationBalancer -> DoubleSwish (ref scaling.py:1225-1236)."""
    x = activation_balancer(
        x, channel_dim=channel_dim, max_abs=max_abs, prob=prob, apply=apply
    )
    return double_swish(x)


# ---------------------------------------------------------------------- Whiten


def whitening_metric(x: jnp.ndarray, num_groups: int) -> jnp.ndarray:
    """1.0 when covariance eigenvalues are equal (ref scaling.py:803-839)."""
    x = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    num_frames, num_channels = x.shape
    cpg = num_channels // num_groups
    x = x.reshape(num_frames, num_groups, cpg).transpose(1, 0, 2)
    x = x - jnp.mean(x, axis=1, keepdims=True)
    covar = jnp.einsum("gtc,gtd->gcd", x, x)
    covar_mean_diag = jnp.trace(covar, axis1=1, axis2=2).sum() / (
        num_groups * cpg
    )
    covarsq_mean_diag = jnp.sum(covar**2) / (num_groups * cpg)
    return covarsq_mean_diag / (covar_mean_diag**2 + 1e-20)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def whiten(x, num_groups, whitening_limit, grad_scale):
    """Identity forward; backward adds a whitening penalty gradient
    (ref scaling.py:841-962)."""
    return x


def _whiten_fwd(x, num_groups, whitening_limit, grad_scale):
    return x, jax.lax.stop_gradient(x)


def _whiten_bwd(num_groups, whitening_limit, grad_scale, xd, g):
    def penalty(x32):
        m = whitening_metric(x32, num_groups)
        return jax.nn.relu(m - whitening_limit)

    pgrad = jax.grad(penalty)(xd.astype(jnp.float32))
    scale = grad_scale * (
        jnp.linalg.norm(g.astype(jnp.float32).reshape(-1))
        / (jnp.linalg.norm(pgrad.reshape(-1)) + 1e-20)
    )
    return (g + (pgrad * scale).astype(g.dtype),)


whiten.defvjp(_whiten_fwd, _whiten_bwd)


# ---------------------------------------------------------------------- MaxEig


def max_eig_direction_update(
    x: jnp.ndarray, direction: jnp.ndarray, channel_dim: int = -1
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One power-iteration step (ref scaling.py:1096-1124).

    Returns (coeffs, new_direction, variance_proportion)."""
    nc = x.shape[channel_dim]
    x = jnp.moveaxis(x, channel_dim, -1).reshape(-1, nc).astype(jnp.float32)
    x = x - x.mean(axis=0)
    direction = direction / (jnp.linalg.norm(direction) + 1e-20)
    coeffs = (x @ direction)[:, None]
    new_direction = (x * coeffs).sum(axis=0) / (
        jnp.sum(coeffs**2) + 1e-20
    )
    x_var = jnp.mean(x**2)
    x_residual = x - coeffs * new_direction[None, :]
    variance_proportion = (x_var - jnp.mean(x_residual**2)) / (x_var + 1e-20)
    return coeffs, new_direction, variance_proportion


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def max_eig_limit(x, coeffs, direction, channel_dim, grad_scale):
    return x


def _max_eig_fwd(x, coeffs, direction, channel_dim, grad_scale):
    return x, (
        jax.lax.stop_gradient(x),
        jax.lax.stop_gradient(coeffs),
        jax.lax.stop_gradient(direction),
    )


def _max_eig_bwd(channel_dim, grad_scale, res, g):
    xd, coeffs, direction = res

    def variance_proportion(x):
        nc = x.shape[channel_dim]
        xf = jnp.moveaxis(x, channel_dim, -1).reshape(-1, nc)
        xf = xf - xf.mean(axis=0)
        x_var = jnp.mean(xf**2)
        x_residual = xf - coeffs * direction[None, :]
        return (x_var - jnp.mean(x_residual**2)) / (x_var + 1e-20)

    pgrad = jax.grad(variance_proportion)(xd.astype(jnp.float32))
    extra = pgrad * grad_scale * (
        jnp.linalg.norm(g.astype(jnp.float32).reshape(-1))
        / (jnp.linalg.norm(pgrad.reshape(-1)) + 1e-20)
    )
    return (g + extra.astype(g.dtype), None, None)


max_eig_limit.defvjp(_max_eig_fwd, _max_eig_bwd)


# ------------------------------------------------------------------- BasicNorm


def basic_norm(
    x: jnp.ndarray, eps_log: jnp.ndarray, channel_dim: int = -1
) -> jnp.ndarray:
    """x * (mean(x^2) + exp(eps_log))^-0.5 (ref scaling.py:360-426)."""
    scales = (
        jnp.mean(x**2, axis=channel_dim, keepdims=True) + jnp.exp(eps_log)
    ) ** -0.5
    return x * scales


# --------------------------------------------------------------------- softmax


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def softmax(x, dim: int = -1):
    return jax.nn.softmax(x, axis=dim)


def _softmax_fwd(x, dim):
    ans = jax.nn.softmax(x.astype(jnp.float32), axis=dim)
    return ans.astype(x.dtype), ans


def _softmax_bwd(dim, ans, g):
    g = g.astype(jnp.float32)
    xg = g * ans
    xg = xg - ans * xg.sum(axis=dim, keepdims=True)
    return (xg,)


softmax.defvjp(_softmax_fwd, _softmax_bwd)


# ---------------------------------------------------------------- misc helpers


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def penalize_abs_values_gt(x, limit: float, penalty: float):
    """Identity; backward adds grad of penalty * sum(relu(|x| - limit))
    (ref scaling.py:764-789)."""
    return x


def _pen_fwd(x, limit, penalty):
    return x, jax.lax.stop_gradient(x)


def _pen_bwd(limit, penalty, xd, g):
    extra = jnp.sign(xd) * (jnp.abs(xd) > limit).astype(g.dtype) * penalty
    return (g + extra,)


penalize_abs_values_gt.defvjp(_pen_fwd, _pen_bwd)


def scaled_init(init_fn, scale: float):
    """initializer wrapper for ScaledLinear/ScaledConv semantics
    (ref scaling.py:427-478: params initialized then multiplied by scale)."""

    def f(key, shape, dtype=jnp.float32):
        return init_fn(key, shape, dtype) * scale

    return f


# ------------------------------------------------------------- random_clamp


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _random_clamp_core(x, mask, min_v, max_v, reflect):
    clamped = jnp.clip(x, min_v, max_v)
    ans = jnp.where(mask, clamped, x)
    if reflect != 0.0:
        ans = ans * (1.0 + reflect) - x * reflect
    return ans


def _rclamp_fwd(x, mask, min_v, max_v, reflect):
    clamped = jnp.clip(x, min_v, max_v)
    ans = jnp.where(mask, clamped, x)
    is_same = ans == x
    if reflect != 0.0:
        ans = ans * (1.0 + reflect) - x * reflect
    return ans, is_same


def _rclamp_bwd(min_v, max_v, reflect, is_same, g):
    x_grad = g * is_same.astype(g.dtype)
    if reflect != 0.0:
        x_grad = x_grad * (1.0 + reflect) - g * reflect
    return (x_grad, None)


_random_clamp_core.defvjp(_rclamp_fwd, _rclamp_bwd)


def random_clamp(x, key, min=None, max=None, prob=0.5, reflect=0.0):
    """Randomized clamping with straight-through-blocked gradients
    (ref scaling.py:130-220 RandomClampFunction/random_clamp): each element
    is clamped to [min, max] with probability ``prob``; the backward passes
    gradient only where the output equals the input, with the optional
    ``reflect`` extrapolation applied to both directions."""
    min_v = -jnp.inf if min is None else min
    max_v = jnp.inf if max is None else max
    mask = jax.random.uniform(key, x.shape) < prob
    return _random_clamp_core(x, mask, min_v, max_v, reflect)


# -------------------------------------------------------------- RandomGrad


def random_cast_to_half(x, key, min_abs: float = 5.0e-06):
    """Expectation-preserving cast to float16 (ref scaling.py:222-235):
    elements with |x| < min_abs become +-min_abs with probability
    |x| / min_abs, else 0 — preserving E[x] where fp16 would round to 0."""
    x_abs = jnp.abs(x)
    is_too_small = x_abs < min_abs
    rand = jax.random.uniform(key, x.shape)
    random_val = min_abs * jnp.sign(x) * (rand * min_abs < x_abs)
    return jnp.where(is_too_small, random_val, x).astype(jnp.float16)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def random_grad(x, key, min_abs: float = 5.0e-06):
    """Identity forward; backward sparsifies tiny fp16 grads with the
    expectation-preserving randomized cast (ref scaling.py:237-280
    RandomGradFunction/RandomGrad).  Mostly moot on TPU (bf16 has fp32's
    exponent range) but kept for API/behavior parity when running fp16."""
    return x


def _rgrad_fwd(x, key, min_abs):
    return x, key


def _rgrad_bwd(min_abs, key, g):
    if g.dtype == jnp.float16:
        g = random_cast_to_half(g.astype(jnp.float32), key, min_abs=min_abs)
    return (g, None)


random_grad.defvjp(_rgrad_fwd, _rgrad_bwd)


# ------------------------------------------- SRLinear / SRConv1d (arXiv 2303.06296)


class SRLinear:
    """Spectral-reparamed linear (ref scaling.py:551-586, "Stabilizing
    Transformer Training by Preventing Attention Entropy Collapse"):
    ``W_eff = (sigma_learned / sigma_spectral(W)) * W`` with the spectral norm
    estimated by one power-iteration step per call.

    Implemented as a flax module defined lazily (flax import kept local so
    the function-only toolkit above stays importable without flax)."""

    def __new__(cls, *args, **kwargs):
        return _make_sr_modules()[0](*args, **kwargs)


class SRConv1d:
    """Spectral-reparamed 1-D conv (ref scaling.py:587-619); input (B, C, T)
    torch layout for conversion parity."""

    def __new__(cls, *args, **kwargs):
        return _make_sr_modules()[1](*args, **kwargs)


_SR_CACHE = None


def _make_sr_modules():
    global _SR_CACHE
    if _SR_CACHE is not None:
        return _SR_CACHE
    from flax import linen as nn

    def _power_iteration(weight, u):
        # one step; u/v are detached exactly like the reference's no_grad
        # block (ref :567-575) — gradients reach sigma only through the
        # final einsum's weight argument
        u = jax.lax.stop_gradient(u)
        v = weight @ u
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
        u_new = weight.T @ v
        u_new = u_new / jnp.maximum(jnp.linalg.norm(u_new), 1e-12)
        v = jax.lax.stop_gradient(v)
        u_new = jax.lax.stop_gradient(u_new)
        sigma = jnp.einsum("c,cd,d->", v, weight, u_new)
        return sigma, u_new

    class _SRLinear(nn.Module):
        in_features: int
        out_features: int
        use_bias: bool = True

        @nn.compact
        def __call__(self, x, train: bool = False):
            # torch layout (out, in) so reference state dicts convert 1:1
            weight = self.param(
                "weight",
                lambda k, s: nn.initializers.kaiming_uniform()(
                    k, (s[1], s[0])
                ).T,
                (self.out_features, self.in_features),
            )
            sigma_p = self.param("sigma", nn.initializers.ones, (1,))
            u = self.variable(
                "spectral",
                "u",
                lambda: _normed_randn(
                    jax.random.PRNGKey(0), (self.in_features,)
                ),
            )
            sigma, u_new = _power_iteration(weight, u.value)
            if not self.is_initializing() and self.is_mutable_collection(
                "spectral"
            ):
                u.value = u_new
            w_eff = (sigma_p / sigma) * weight
            y = x @ w_eff.T
            if self.use_bias:
                y = y + self.param(
                    "bias", nn.initializers.zeros, (self.out_features,)
                )
            return y

    class _SRConv1d(nn.Module):
        in_features: int
        out_features: int
        kernel_size: int
        stride: int = 1
        padding: str = "SAME"
        use_bias: bool = True

        @nn.compact
        def __call__(self, x, train: bool = False):
            k = self.kernel_size
            flat_in = self.in_features * k
            weight = self.param(
                "weight",
                lambda key, s: nn.initializers.kaiming_uniform()(
                    key, (s[1], s[0])
                ).T,
                (self.out_features, flat_in),
            )
            sigma_p = self.param("sigma", nn.initializers.ones, (1,))
            u = self.variable(
                "spectral",
                "u",
                lambda: _normed_randn(jax.random.PRNGKey(0), (flat_in,)),
            )
            sigma, u_new = _power_iteration(weight, u.value)
            if not self.is_initializing() and self.is_mutable_collection(
                "spectral"
            ):
                u.value = u_new
            w_eff = (sigma_p / sigma) * weight
            w_conv = w_eff.reshape(self.out_features, self.in_features, k)
            y = jax.lax.conv_general_dilated(
                x,  # (B, C, T) torch layout
                w_conv,  # (O, I, K)
                window_strides=(self.stride,),
                padding=self.padding,
                dimension_numbers=("NCH", "OIH", "NCH"),
            )
            if self.use_bias:
                y = y + self.param(
                    "bias", nn.initializers.zeros, (self.out_features,)
                )[None, :, None]
            return y

    _SR_CACHE = (_SRLinear, _SRConv1d)
    return _SR_CACHE


def _normed_randn(key, shape):
    v = jax.random.normal(key, shape)
    return v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
