"""Numerical primitives shared by the pricers.

All functions are jit-safe, dtype-polymorphic, and AD-safe: branches are
``jnp.where`` with *safe* operands on both sides so gradients never see
NaN/inf from the untaken branch (the classic where-grad trap).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import ndtr as _ndtr
from jax.scipy.special import ndtri as _ndtri

from ..utils.config import EPS_TIME, EPS_VOL

SQRT_2PI = 2.5066282746310002


def norm_cdf(x):
    return _ndtr(x)


def norm_pdf(x):
    return jnp.exp(-0.5 * x * x) / jnp.asarray(SQRT_2PI, dtype=jnp.result_type(x))


def norm_ppf(p):
    return _ndtri(p)


def safe_div(num, den, fill=0.0):
    """num/den with den==0 mapped to ``fill`` and no NaN in gradients."""
    safe_den = jnp.where(den == 0, 1.0, den)
    return jnp.where(den == 0, fill, num / safe_den)


def safe_sqrt(x):
    """sqrt clamped at 0; gradient at 0 is finite (0) instead of inf."""
    return jnp.sqrt(jnp.maximum(x, 0.0) + 0.0)


def d1_d2(spot, strike, maturity, rate, vol, dividend=0.0):
    """Black–Scholes d1/d2 with degenerate T/vol handled smoothly.

    Reference capability: ``src/utils/utils.py:81`` (calculate_d1_d2). For
    T<=0 or vol<=0 the result is ±inf-free: we clamp the denominator and the
    caller is expected to mask the degenerate region (see black_scholes).
    """
    t = jnp.maximum(maturity, EPS_TIME)
    v = jnp.maximum(vol, EPS_VOL)
    sig_sqrt_t = v * jnp.sqrt(t)
    d1 = (jnp.log(spot / strike) + (rate - dividend + 0.5 * v * v) * t) / sig_sqrt_t
    d2 = d1 - sig_sqrt_t
    return d1, d2


def smooth_max(x, width):
    """Softplus-smoothed max(x, 0): width→0 recovers the kink.

    Used for second-order AD greeks of kinked payoffs where the exact payoff
    has a.e.-zero second derivative.
    """
    w = jnp.maximum(width, 1e-12)
    return w * jnp.logaddexp(x / w, 0.0)


def smooth_indicator(x, width):
    """Sigmoid-smoothed 1{x>0}."""
    w = jnp.maximum(width, 1e-12)
    return jnp.reciprocal(1.0 + jnp.exp(-x / w))
