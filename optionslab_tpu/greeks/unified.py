"""Unified Greeks engine: one protocol, AD-first, FD as cross-check oracle.

Reference capabilities covered (SURVEY.md §2.3, ``src/greeks/
unified_greeks.py``):
  - ``PricerProtocol`` (``:45``): anything with
    ``price(S, K, T, r, sigma, option_type, q)``;
  - adapters for Heston (σ→v0=σ², ``:74``), SABR (``:107``), FDM (``:132``),
    jump diffusion (``:155``), exotics (``:177``);
  - ``compute_greeks_unified`` (``:235``): Δ, Γ, vega, θ, ρ (+ vanna,
    charm, vomma) with a price cache;
  - convenience wrappers ``greeks_heston/sabr/fdm`` (``:375-427``).
  - ``src/greeks/greeks.py:35`` tree Greeks → ``models.binomial`` already
    provides the lattice-analytic path.

TPU-first design (SURVEY.md §7 invariant #2): the engine takes a FUNCTION
``price_fn(S, K, T, r, sigma, q) -> price`` and differentiates it —
``jax.grad`` for first order, forward-over-reverse for the second-order
cross Greeks — all orders from ONE taped evaluation instead of the
reference's 13–15 cached FD re-pricings. A CRN finite-difference engine is
retained as the validation oracle (tests compare the two).
"""

from __future__ import annotations

from typing import Callable, Protocol, runtime_checkable

import jax
import jax.numpy as jnp

from ..types import ContractBatch
from ..utils.validation import check_option_type


@runtime_checkable
class PricerProtocol(Protocol):
    def price(self, S, K, T, r, sigma, option_type="call", q=0.0): ...


def greeks_from_fn(price_fn: Callable, spot, strike, maturity, rate, vol, dividend=0.0,
                   second_order: bool = True) -> dict:
    """All Greeks of ``price_fn(S, K, T, r, sigma, q) -> price`` by AD.

    Inputs broadcast; outputs have the broadcast shape. One reverse sweep
    gives every first-order Greek; second order uses forward-over-reverse
    (jacfwd of grad) on (S, sigma) which yields gamma/vanna/vomma in one
    extra pass.
    """
    spot, strike, maturity, rate, vol, dividend = jnp.broadcast_arrays(
        *map(jnp.asarray, (spot, strike, maturity, rate, vol, dividend))
    )

    def scalar_price(s, k, t, r, sig, q):
        return jnp.sum(price_fn(s, k, t, r, sig, q))

    args = (spot, strike, maturity, rate, vol, dividend)
    price = price_fn(*args)
    dS, dK, dT, dr, dsig, dq = jax.grad(scalar_price, argnums=(0, 1, 2, 3, 4, 5))(*args)
    out = {
        "price": price,
        "delta": dS,
        "dual_delta": dK,
        "theta": -dT,  # calendar-time convention (matches reference)
        "rho": dr,
        "vega": dsig,
        "dividend_rho": dq,
    }
    if second_order:
        def d_s(s, sig):
            return jax.grad(
                lambda ss, gg: jnp.sum(price_fn(ss, strike, maturity, rate, gg, dividend)),
                argnums=0,
            )(s, sig)

        def d_sig(s, sig):
            return jax.grad(
                lambda ss, gg: jnp.sum(price_fn(ss, strike, maturity, rate, gg, dividend)),
                argnums=1,
            )(s, sig)

        # jacfwd over elementwise grads; diagonal extract for batched inputs
        gamma_full = jax.jacfwd(d_s, argnums=0)(spot, vol)
        vanna_full = jax.jacfwd(d_s, argnums=1)(spot, vol)
        vomma_full = jax.jacfwd(d_sig, argnums=1)(spot, vol)
        charm_full = jax.jacfwd(
            lambda t: jax.grad(
                lambda s: jnp.sum(price_fn(s, strike, t, rate, vol, dividend))
            )(spot)
        )(maturity)

        def diag(x):
            if spot.shape == ():
                return x
            d = jnp.diagonal(x.reshape(spot.size, spot.size))
            return d.reshape(spot.shape)

        out["gamma"] = diag(gamma_full)
        out["vanna"] = diag(vanna_full)
        out["vomma"] = diag(vomma_full)
        out["charm"] = -diag(charm_full)  # d delta / d calendar time
    return out


def greeks_batch(price_fn: Callable, batch: ContractBatch, second_order: bool = True) -> dict:
    """Protocol entry for ContractBatch pricers: ``price_fn(batch) -> price``."""
    b = batch.broadcast()

    def fn(s, k, t, r, sig, q):
        return price_fn(ContractBatch(s, k, t, r, sig, q, b.cp))

    return greeks_from_fn(fn, b.spot, b.strike, b.maturity, b.rate, b.vol, b.dividend,
                          second_order=second_order)


# ---------------------------------------------------------------------------
# Finite-difference oracle (kept for validation, not production)
# ---------------------------------------------------------------------------
def greeks_fd(price_fn: Callable, spot, strike, maturity, rate, vol, dividend=0.0) -> dict:
    """Central-difference Greeks with the reference's adaptive steps
    (``unified_greeks.py:274-277``): h_S = 1%·S, h_σ = 0.01, h_r = 1e-4,
    h_T = 1/365. Used by tests to cross-check the AD engine."""
    spot, strike, maturity, rate, vol, dividend = jnp.broadcast_arrays(
        *map(jnp.asarray, (spot, strike, maturity, rate, vol, dividend))
    )
    h_s = 0.01 * spot
    h_sig = 0.01
    h_r = 1e-4
    h_t = 1.0 / 365.0

    def p(s=None, k=None, t=None, r=None, sig=None, q=None):
        return price_fn(
            spot if s is None else s, strike if k is None else k,
            maturity if t is None else t, rate if r is None else r,
            vol if sig is None else sig, dividend if q is None else q,
        )

    base = p()
    up, dn = p(s=spot + h_s), p(s=spot - h_s)
    delta = (up - dn) / (2 * h_s)
    gamma = (up - 2 * base + dn) / (h_s * h_s)
    vega = (p(sig=vol + h_sig) - p(sig=vol - h_sig)) / (2 * h_sig)
    rho = (p(r=rate + h_r) - p(r=rate - h_r)) / (2 * h_r)
    theta = -(p(t=maturity + h_t) - p(t=maturity - h_t)) / (2 * h_t)
    vanna = (
        p(s=spot + h_s, sig=vol + h_sig) - p(s=spot + h_s, sig=vol - h_sig)
        - p(s=spot - h_s, sig=vol + h_sig) + p(s=spot - h_s, sig=vol - h_sig)
    ) / (4 * h_s * h_sig)
    vomma = (p(sig=vol + h_sig) - 2 * base + p(sig=vol - h_sig)) / (h_sig * h_sig)
    return {"price": base, "delta": delta, "gamma": gamma, "vega": vega,
            "rho": rho, "theta": theta, "vanna": vanna, "vomma": vomma}


# ---------------------------------------------------------------------------
# Adapters: functional price_fn per model family
# ---------------------------------------------------------------------------
def bs_price_fn(cp=1.0) -> Callable:
    from ..models.black_scholes import bs_price

    return lambda s, k, t, r, sig, q: bs_price(s, k, t, r, sig, cp, q)


def heston_price_fn(params, cp=1.0) -> Callable:
    """σ is mapped to v0 = σ² like the reference's HestonAdapter
    (``unified_greeks.py:85``), so vega is a total-vol sensitivity."""
    import dataclasses

    from ..models.heston import heston_price

    def fn(s, k, t, r, sig, q):
        p = dataclasses.replace(params, v0=jnp.asarray(sig, jnp.result_type(sig)) ** 2)
        return heston_price(ContractBatch(s, k, t, r, sig, q, jnp.asarray(cp)), p)

    return fn


def sabr_price_fn(params, cp=1.0) -> Callable:
    from ..models.sabr import sabr_price

    def fn(s, k, t, r, sig, q):
        fwd = s * jnp.exp((r - q) * t)
        del sig
        return sabr_price(fwd, k, t, r, params, cp)

    return fn


def fdm_price_fn(cp=1.0, n_space: int = 201, n_time: int = 100, american: bool = False) -> Callable:
    from ..models.fdm import fdm_price

    def fn(s, k, t, r, sig, q):
        return fdm_price(ContractBatch(s, k, t, r, sig, q, jnp.broadcast_to(jnp.asarray(cp), jnp.shape(s))),
                         n_space=n_space, n_time=n_time, american=american)

    return fn


def merton_price_fn(lam, mu_j, sigma_j, cp=1.0) -> Callable:
    from ..models.jump_diffusion import merton_price

    def fn(s, k, t, r, sig, q):
        return merton_price(ContractBatch(s, k, t, r, sig, q, jnp.asarray(cp)), lam, mu_j, sigma_j)

    return fn


def bates_price_fn(params, cp=1.0) -> Callable:
    """σ maps to v0 = σ² (same convention as the Heston adapter)."""
    import dataclasses

    from ..models.bates import bates_price

    def fn(s, k, t, r, sig, q):
        p = dataclasses.replace(params, v0=jnp.asarray(sig, jnp.result_type(sig)) ** 2)
        return bates_price(ContractBatch(s, k, t, r, sig, q, jnp.asarray(cp)), p)

    return fn


# ---------------------------------------------------------------------------
# Reference-signature entry point: works with object pricers too
# ---------------------------------------------------------------------------
def compute_greeks_unified(pricer, S, K, T, r, sigma, option_type="call", q=0.0,
                           second_order: bool = False) -> dict:
    """Greeks for any pricer.

    * If ``pricer`` is callable with the functional signature, or exposes a
      differentiable ``.price``, the AD engine runs (fast path).
    * Otherwise falls back to the FD oracle on the object's ``price``
      (matches the reference engine's behavior for black-box pricers).
    """
    cp = float(check_option_type(option_type))

    if callable(pricer) and not hasattr(pricer, "price"):
        fn = pricer
    else:
        def fn(s, k, t, r_, sig, q_):
            return pricer.price(s, k, t, r_, sig, "call" if cp > 0 else "put", q_)

    try:
        return greeks_from_fn(fn, S, K, T, r, sigma, q, second_order=second_order)
    except (TypeError, jax.errors.TracerArrayConversionError):
        return greeks_fd(fn, S, K, T, r, sigma, q)


def greeks_heston(params, S, K, T, r, sigma, option_type="call", q=0.0) -> dict:
    cp = float(check_option_type(option_type))
    return greeks_from_fn(heston_price_fn(params, cp), S, K, T, r, sigma, q,
                          second_order=False)


def greeks_sabr(params, S, K, T, r, option_type="call", q=0.0) -> dict:
    cp = float(check_option_type(option_type))
    return greeks_from_fn(sabr_price_fn(params, cp), S, K, T, r, 0.0, q,
                          second_order=False)


def greeks_fdm(S, K, T, r, sigma, option_type="call", q=0.0, american=False) -> dict:
    cp = float(check_option_type(option_type))
    return greeks_from_fn(fdm_price_fn(cp, american=american), S, K, T, r, sigma, q,
                          second_order=False)
