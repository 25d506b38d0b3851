"""Implied volatility: vectorized safeguarded Newton, fully jit/vmap-able.

Reference capabilities covered (SURVEY.md §2.2):
  - ``src/pricing_models/iv_solver.py:65-160`` — Newton–Raphson with
    analytic vega + Brent fallback, arbitrage lower-bound validation.
  - ``iv_solver.py:162-227`` — vectorized variant returning NaN on failure.
  - ``iv_solver.py:228-298`` — IV surface construction from a price grid.

TPU-first design: instead of SciPy's scalar ``brentq`` (unjittable, per-
option Python dispatch), ONE fixed-iteration safeguarded Newton runs for
the entire chain at once: every iterate keeps a live bisection bracket
[lo, hi]; a Newton step that leaves the bracket, or has tiny vega, falls
back to bisection *elementwise* — so the solver is a single fused XLA loop
with no data-dependent control flow, converging quadratically where Newton
is safe and linearly (but guaranteed) everywhere else.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..types import ContractBatch
from ..utils.config import EPS_TIME
from ..utils.exceptions import ArbitrageViolationError, ValidationError
from .black_scholes import bs_price, bs_vega

SIGMA_LO = 1e-4
SIGMA_HI = 10.0


def _no_arb_bounds(spot, strike, maturity, rate, cp, dividend):
    """European no-arbitrage price bounds (reference: iv_solver.py:107-115)."""
    df_r = jnp.exp(-rate * maturity)
    df_q = jnp.exp(-dividend * maturity)
    lower = jnp.maximum(cp * (spot * df_q - strike * df_r), 0.0)
    upper = jnp.where(cp > 0, spot * df_q, strike * df_r)
    return lower, upper


@functools.partial(jax.jit, static_argnames=("n_iter",))
def implied_vol(price, spot, strike, maturity, rate, cp=1.0, dividend=0.0,
                n_iter: int = 64):
    """Implied vol for arrays of prices/contracts; NaN where no solution.

    Safeguarded Newton: carry (sigma, lo, hi); candidate Newton step is
    accepted only if it stays inside the live bracket and vega is healthy,
    otherwise the bracket midpoint is used; the bracket halves every
    iteration regardless, so n_iter=64 guarantees ~1e-11 bracket width.
    """
    price, spot, strike, maturity, rate, cp, dividend = jnp.broadcast_arrays(
        *map(jnp.asarray, (price, spot, strike, maturity, rate, cp, dividend))
    )
    dtype = jnp.result_type(price, spot, jnp.float32)
    lower, upper = _no_arb_bounds(spot, strike, maturity, rate, cp, dividend)
    valid = (price > lower + 1e-12) & (price < upper - 1e-12) & (maturity > EPS_TIME)

    def f(sig):
        return bs_price(spot, strike, maturity, rate, sig, cp, dividend) - price

    lo = jnp.full_like(price, SIGMA_LO, dtype=dtype)
    hi = jnp.full_like(price, SIGMA_HI, dtype=dtype)
    sig0 = jnp.sqrt(
        2.0 * jnp.abs(jnp.log(spot / strike) + (rate - dividend) * maturity)
        / jnp.maximum(maturity, EPS_TIME)
    )  # Brenner–Subrahmanyam-style start
    sig = jnp.clip(jnp.where(jnp.isfinite(sig0) & (sig0 > 0.05), sig0, 0.2), SIGMA_LO, SIGMA_HI)

    def body(i, carry):
        sig, lo, hi = carry
        fx = f(sig)
        vega = bs_vega(spot, strike, maturity, rate, sig, dividend)
        # tighten the bracket (price is increasing in sigma)
        lo = jnp.where(fx < 0, sig, lo)
        hi = jnp.where(fx > 0, sig, hi)
        newton = sig - fx / jnp.maximum(vega, 1e-12)
        use_newton = (vega > 1e-10) & (newton > lo) & (newton < hi)
        nxt = jnp.where(use_newton, newton, 0.5 * (lo + hi))
        return nxt, lo, hi

    sig, lo, hi = lax.fori_loop(0, n_iter, body, (sig, lo, hi))
    nan = jnp.asarray(jnp.nan, dtype)
    return jnp.where(valid, sig, nan)


def implied_volatility(price, S, K, T, r, option_type="call", q=0.0,
                       validate: bool = True):
    """Scalar-convenience wrapper matching the reference signature
    (``iv_solver.py:65``); raises on arbitrage-violating inputs when
    ``validate`` (reference raises there too)."""
    cp = 1.0 if str(option_type).lower() in ("call", "c", "1") else -1.0
    if validate:
        import numpy as np

        # host-side numpy: float64 regardless of the jax x64 flag
        S_, K_, T_, r_, q_ = (np.asarray(v, np.float64) for v in (S, K, T, r, q))
        df_r, df_q = np.exp(-r_ * T_), np.exp(-q_ * T_)
        lower = np.maximum(cp * (S_ * df_q - K_ * df_r), 0.0)
        upper = np.where(cp > 0, S_ * df_q, K_ * df_r)
        if np.any(np.asarray(price) <= np.asarray(lower)):
            raise ArbitrageViolationError(
                f"price {price} at/below no-arbitrage lower bound {lower}"
            )
        if np.any(np.asarray(price) >= np.asarray(upper)):
            raise ArbitrageViolationError(
                f"price {price} at/above no-arbitrage upper bound {upper}"
            )
        if np.any(np.asarray(T) <= 0):
            raise ValidationError("maturity must be positive for IV inversion")
    return implied_vol(price, S, K, T, r, cp, q)


implied_volatility_vectorized = implied_vol  # reference: iv_solver.py:162


@functools.partial(jax.jit, static_argnames=())
def iv_surface_from_prices(prices, spot, strikes, maturities, rate, cp=1.0, dividend=0.0):
    """(n_maturities, n_strikes) price grid → IV grid, one fused launch
    (reference: ``iv_solver.py:228``)."""
    K = jnp.asarray(strikes)[None, :]
    T = jnp.asarray(maturities)[:, None]
    return implied_vol(jnp.asarray(prices), spot, K, T, rate, cp, dividend)


def iv_batch(batch: ContractBatch, prices) -> jnp.ndarray:
    """ContractBatch protocol entry: invert the batch's prices to vols."""
    b = batch.broadcast()
    return implied_vol(prices, b.spot, b.strike, b.maturity, b.rate, b.cp, b.dividend)
