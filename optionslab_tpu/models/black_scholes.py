"""Black–Scholes–Merton closed form: prices and full Greeks, AD-first.

Reference capabilities covered:
  - ``src/pricing_models/black_scholes.py:9-52`` — European call/put with
    dividend yield, T<=0 intrinsic short-circuit, input validation.
  - ``src/pricing_models/iv_solver.py:27-63`` — BS price + vega helpers.
  - analytic Greeks scattered through ``src/greeks`` — here EVERY Greek
    (delta, gamma, vega, theta, rho, dual-delta, vanna, charm, vomma, speed)
    comes in two flavors: closed form, and machine-checked ``jax.grad`` of
    the price function (tests assert they agree to near machine precision).

TPU-first design: one scalar-semantics function of arrays, fully
broadcastable — a million-contract book prices in a single fused XLA launch;
``cp ∈ {+1,-1}`` makes call/put a data axis (no Python branching), and the
degenerate regions (T<=0, sigma<=0) are handled with AD-safe ``where`` masks
so the same code path is differentiable everywhere.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from ..ops.math import d1_d2, norm_cdf, norm_pdf
from ..types import ContractBatch
from ..utils.config import EPS_TIME, EPS_VOL


@jax.jit
def bs_price(spot, strike, maturity, rate, vol, cp=1.0, dividend=0.0):
    """European option price. ``cp``: +1 call, -1 put. Broadcasts all args.

    jit-wrapped so a facade call is ONE dispatch (scalars trace as 0-d
    arrays; only new shapes/dtypes recompile).

    Degenerate cases: T<=0 → intrinsic; vol<=0 → discounted intrinsic on the
    forward (the deterministic limit), both selected with AD-safe masks.
    """
    spot, strike, maturity, rate, vol, cp, dividend = jnp.broadcast_arrays(
        *map(jnp.asarray, (spot, strike, maturity, rate, vol, cp, dividend))
    )
    d1, d2 = d1_d2(spot, strike, maturity, rate, vol, dividend)
    df_r = jnp.exp(-rate * maturity)
    df_q = jnp.exp(-dividend * maturity)
    live = cp * (spot * df_q * norm_cdf(cp * d1) - strike * df_r * norm_cdf(cp * d2))

    expired = jnp.maximum(cp * (spot - strike), 0.0)
    deterministic = jnp.maximum(cp * (spot * df_q - strike * df_r), 0.0)

    out = jnp.where(vol <= EPS_VOL, deterministic, live)
    return jnp.where(maturity <= EPS_TIME, expired, out)


@jax.jit
def bs_vega(spot, strike, maturity, rate, vol, dividend=0.0):
    """∂price/∂vol (same for calls and puts)."""
    d1, _ = d1_d2(spot, strike, maturity, rate, vol, dividend)
    t = jnp.maximum(maturity, EPS_TIME)
    vega = spot * jnp.exp(-dividend * t) * norm_pdf(d1) * jnp.sqrt(t)
    return jnp.where((maturity <= EPS_TIME) | (vol <= EPS_VOL), 0.0, vega)


@jax.jit
def bs_greeks(spot, strike, maturity, rate, vol, cp=1.0, dividend=0.0):
    """Closed-form Greeks dict: delta, gamma, vega, theta, rho, plus
    second-order vanna / charm / vomma / speed and dual_delta.

    Conventions match the reference (``src/greeks/greeks.py``): theta is
    ∂price/∂t (calendar time, = -∂price/∂T), rho is ∂price/∂r, vega per unit
    vol (not per 1%).
    """
    spot, strike, maturity, rate, vol, cp, dividend = jnp.broadcast_arrays(
        *map(jnp.asarray, (spot, strike, maturity, rate, vol, cp, dividend))
    )
    t = jnp.maximum(maturity, EPS_TIME)
    v = jnp.maximum(vol, EPS_VOL)
    sqrt_t = jnp.sqrt(t)
    d1, d2 = d1_d2(spot, strike, maturity, rate, vol, dividend)
    df_r = jnp.exp(-rate * t)
    df_q = jnp.exp(-dividend * t)
    pdf1 = norm_pdf(d1)
    cdf_cp_d1 = norm_cdf(cp * d1)
    cdf_cp_d2 = norm_cdf(cp * d2)

    delta = cp * df_q * cdf_cp_d1
    gamma = df_q * pdf1 / (spot * v * sqrt_t)
    vega = spot * df_q * pdf1 * sqrt_t
    theta = (
        -spot * df_q * pdf1 * v / (2.0 * sqrt_t)
        - cp * rate * strike * df_r * cdf_cp_d2
        + cp * dividend * spot * df_q * cdf_cp_d1
    )
    rho = cp * strike * t * df_r * cdf_cp_d2
    dual_delta = -cp * df_r * cdf_cp_d2
    vanna = -df_q * pdf1 * d2 / v
    charm = cp * dividend * df_q * cdf_cp_d1 - df_q * pdf1 * (
        2.0 * (rate - dividend) * t - d2 * v * sqrt_t
    ) / (2.0 * t * v * sqrt_t)
    vomma = vega * d1 * d2 / v
    speed = -gamma / spot * (d1 / (v * sqrt_t) + 1.0)

    degenerate = (maturity <= EPS_TIME) | (vol <= EPS_VOL)
    itm = (cp * (spot - strike)) > 0
    z = jnp.zeros_like(spot)
    out = {
        "price": bs_price(spot, strike, maturity, rate, vol, cp, dividend),
        "delta": jnp.where(degenerate, jnp.where(itm, cp, z), delta),
        "gamma": jnp.where(degenerate, z, gamma),
        "vega": jnp.where(degenerate, z, vega),
        "theta": jnp.where(degenerate, z, theta),
        "rho": jnp.where(degenerate, z, rho),
        "dual_delta": jnp.where(degenerate, z, dual_delta),
        "vanna": jnp.where(degenerate, z, vanna),
        "charm": jnp.where(degenerate, z, charm),
        "vomma": jnp.where(degenerate, z, vomma),
        "speed": jnp.where(degenerate, z, speed),
    }
    return out


def bs_greeks_ad(spot, strike, maturity, rate, vol, cp=1.0, dividend=0.0):
    """Greeks via ``jax.grad`` of :func:`bs_price` — the AD oracle.

    Used by tests to machine-check the closed forms; also demonstrates the
    AD-first pattern every other pricer in this framework follows.
    """

    def price1(S, K, T, r, sig, q):
        return bs_price(S, K, T, r, sig, cp, q)

    g = jax.grad(lambda args: jnp.sum(price1(*args)))
    spot, strike, maturity, rate, vol, dividend = jnp.broadcast_arrays(
        *map(jnp.asarray, (spot, strike, maturity, rate, vol, dividend))
    )
    dS, dK, dT, dr, dsig, dq = g((spot, strike, maturity, rate, vol, dividend))
    gamma = jax.grad(
        lambda S: jnp.sum(
            jax.grad(lambda s: jnp.sum(price1(s, strike, maturity, rate, vol, dividend)))(S)
        )
    )(spot)
    return {
        "delta": dS,
        "gamma": gamma,
        "vega": dsig,
        "theta": -dT,  # calendar-time convention
        "rho": dr,
        "dual_delta": dK,
    }


# -- batch protocol ----------------------------------------------------------
def price(batch: ContractBatch) -> jnp.ndarray:
    """Pricing-protocol entry: ContractBatch → prices (one fused launch)."""
    return bs_price(
        batch.spot, batch.strike, batch.maturity, batch.rate, batch.vol, batch.cp, batch.dividend
    )


def greeks(batch: ContractBatch) -> dict:
    return bs_greeks(
        batch.spot, batch.strike, batch.maturity, batch.rate, batch.vol, batch.cp, batch.dividend
    )


class BlackScholesPricer:
    """Object-style adapter satisfying the unified pricing protocol
    (reference: ``unified_greeks.py:45`` PricerProtocol)."""

    def price(self, S, K, T, r, sigma, option_type="call", q=0.0):
        cp = 1.0 if str(option_type).lower() in ("call", "c", "1") else -1.0
        return bs_price(S, K, T, r, sigma, cp, q)
