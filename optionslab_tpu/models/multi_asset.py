"""Multi-asset exotics: correlated baskets, rainbows, spreads.

BEYOND the reference (Diegotistical/OptionsLab is single-asset throughout
``src/pricing_models``): a correlated-GBM engine in the same TPU-first
style as ``models/exotics.py`` — the asset axis is a small leading dim on
the scan carry, correlation enters through one Cholesky matmul per step,
and HBM holds O(assets × paths), never the path history.

Closed-form oracles used by the tests:
  * Margrabe (1978) exchange option — EXACT for spread strikes K=0;
  * geometric basket: a product of lognormals is lognormal, so the
    geometric-average basket option has a Black formula (exact);
  * Kirk's approximation for K≠0 spreads (documented approximate).

All pricers are differentiable end-to-end (pathwise AD Greeks via
``jax.grad``) and vectorize over books with ``vmap``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.math import norm_cdf
from ..utils.exceptions import ValidationError


def _chol(corr, n_assets: int):
    c = jnp.asarray(corr, jnp.float32)
    if c.shape != (n_assets, n_assets):
        raise ValidationError(f"corr must be ({n_assets},{n_assets}), got {c.shape}")
    # jitter for numerical PSD in f32 (handles singular corr like rho=1);
    # validation of |rho|<=1 is the caller's job
    return jnp.linalg.cholesky(c + 1e-6 * jnp.eye(n_assets, dtype=c.dtype))


def multi_asset_terminal(spots, vols, corr, rate, dividends, maturity, key,
                         n_paths: int, n_steps: int = 1,
                         antithetic: bool = True):
    """Terminal spots (n_assets, n_paths) under correlated GBM.

    Terminal-only payoffs need just the SUM of per-step shocks, so any
    n_steps collapses to one normal draw per asset (exact, like the
    single-asset engine) — n_steps is accepted for API symmetry.
    """
    spots = jnp.asarray(spots, jnp.float32)
    vols = jnp.asarray(vols, jnp.float32)
    dividends = jnp.broadcast_to(jnp.asarray(dividends, jnp.float32), spots.shape)
    d = spots.shape[0]
    chol = _chol(corr, d)
    half = n_paths // 2 if antithetic else n_paths
    z = jax.random.normal(key, (d, half), dtype=jnp.float32)
    if antithetic:
        z = jnp.concatenate([z, -z], axis=1)
    zc = jnp.matmul(chol, z, precision=jax.lax.Precision.HIGHEST)  # bf16-default-safe
    t = jnp.asarray(maturity, jnp.float32)
    drift = (rate - dividends - 0.5 * vols**2) * t
    return spots[:, None] * jnp.exp(drift[:, None] + (vols * jnp.sqrt(t))[:, None] * zc)


def _disc_mean_stderr(pay, rate, maturity):
    df = jnp.exp(-rate * maturity)
    n = pay.shape[-1]
    return df * pay.mean(), df * pay.std(ddof=1) / jnp.sqrt(n * 1.0)


@functools.partial(jax.jit, static_argnames=("n_paths", "kind", "return_stderr"))
def basket_price(spots, weights, strike, maturity, rate, vols, corr, key,
                 cp: float = 1.0, dividends=0.0, n_paths: int = 200_000,
                 kind: str = "arithmetic", return_stderr: bool = False):
    """Weighted-basket option on the terminal basket level.

    ``kind="arithmetic"``: B = Σ w_i S_i(T) (no closed form — MC).
    ``kind="geometric"``:  B = Π S_i(T)^{w_i} (lognormal — the exact
    closed form is :func:`geometric_basket_closed_form`, kept as oracle).
    """
    terminal = multi_asset_terminal(spots, vols, corr, rate, dividends,
                                    maturity, key, n_paths)
    w = jnp.asarray(weights, jnp.float32)[:, None]
    if kind == "arithmetic":
        basket = (w * terminal).sum(axis=0)
    elif kind == "geometric":
        basket = jnp.exp((w * jnp.log(terminal)).sum(axis=0))
    else:
        raise ValidationError(f"kind must be arithmetic|geometric, got {kind!r}")
    pay = jnp.maximum(cp * (basket - strike), 0.0)
    price, se = _disc_mean_stderr(pay, rate, maturity)
    return (price, se) if return_stderr else price


@functools.partial(jax.jit, static_argnames=("n_paths", "flavor", "return_stderr"))
def rainbow_price(spots, strike, maturity, rate, vols, corr, key,
                  cp: float = 1.0, dividends=0.0, n_paths: int = 200_000,
                  flavor: str = "best_of", return_stderr: bool = False):
    """Rainbow option: call/put on the best/worst terminal asset.

    ``flavor``: "best_of" → max_i S_i(T); "worst_of" → min_i S_i(T).
    """
    terminal = multi_asset_terminal(spots, vols, corr, rate, dividends,
                                    maturity, key, n_paths)
    if flavor == "best_of":
        level = terminal.max(axis=0)
    elif flavor == "worst_of":
        level = terminal.min(axis=0)
    else:
        raise ValidationError(f"flavor must be best_of|worst_of, got {flavor!r}")
    pay = jnp.maximum(cp * (level - strike), 0.0)
    price, se = _disc_mean_stderr(pay, rate, maturity)
    return (price, se) if return_stderr else price


@functools.partial(jax.jit, static_argnames=("n_paths", "return_stderr"))
def spread_price(spot1, spot2, strike, maturity, rate, vol1, vol2, rho, key,
                 cp: float = 1.0, div1: float = 0.0, div2: float = 0.0,
                 n_paths: int = 200_000, return_stderr: bool = False):
    """Spread option on S1(T) − S2(T) − K (Margrabe-exact at K=0)."""
    corr = jnp.asarray([[1.0, rho], [rho, 1.0]], jnp.float32)
    terminal = multi_asset_terminal(jnp.asarray([spot1, spot2], jnp.float32),
                                    jnp.asarray([vol1, vol2], jnp.float32),
                                    corr, rate, jnp.asarray([div1, div2]),
                                    maturity, key, n_paths)
    pay = jnp.maximum(cp * (terminal[0] - terminal[1] - strike), 0.0)
    price, se = _disc_mean_stderr(pay, rate, maturity)
    return (price, se) if return_stderr else price


# ---------------------------------------------------------------------------
# Closed forms (oracles + fast paths)
# ---------------------------------------------------------------------------
def margrabe_price(spot1, spot2, maturity, vol1, vol2, rho,
                   div1: float = 0.0, div2: float = 0.0):
    """Margrabe (1978) exchange option E[(S1(T) − S2(T))⁺] discounted —
    EXACT for any correlation (rate drops out)."""
    sig = jnp.sqrt(jnp.maximum(vol1**2 - 2.0 * rho * vol1 * vol2 + vol2**2,
                               1e-12))
    st = sig * jnp.sqrt(maturity)
    f1 = spot1 * jnp.exp(-div1 * maturity)
    f2 = spot2 * jnp.exp(-div2 * maturity)
    d1 = (jnp.log(f1 / f2) + 0.5 * st * st) / st
    return f1 * norm_cdf(d1) - f2 * norm_cdf(d1 - st)


def geometric_basket_closed_form(spots, weights, strike, maturity, rate,
                                 vols, corr, cp: float = 1.0, dividends=0.0):
    """Black formula on the lognormal geometric basket (exact oracle).

    ln B(T) ~ Normal with
      μ_B = Σ w_i (ln S_i + (r − q_i − σ_i²/2)T),  σ_B² = wᵀ Σ w · T.
    """
    w = jnp.asarray(weights, jnp.float32)
    spots = jnp.asarray(spots, jnp.float32)
    vols = jnp.asarray(vols, jnp.float32)
    dividends = jnp.broadcast_to(jnp.asarray(dividends, jnp.float32), spots.shape)
    cov = jnp.asarray(corr, jnp.float32) * vols[:, None] * vols[None, :]
    hi = jax.lax.Precision.HIGHEST
    var_b = jnp.dot(w, jnp.matmul(cov, w, precision=hi), precision=hi) * maturity
    sd = jnp.sqrt(jnp.maximum(var_b, 1e-12))
    mu = jnp.sum(w * (jnp.log(spots) + (rate - dividends - 0.5 * vols**2) * maturity))
    fwd = jnp.exp(mu + 0.5 * var_b)
    d1 = (mu + var_b - jnp.log(strike)) / sd
    d2 = d1 - sd
    df = jnp.exp(-rate * maturity)
    return df * cp * (fwd * norm_cdf(cp * d1) - strike * norm_cdf(cp * d2))


def kirk_spread_approx(spot1, spot2, strike, maturity, rate, vol1, vol2, rho,
                       div1: float = 0.0, div2: float = 0.0):
    """Kirk (1995) approximation for K≠0 spread calls (documented
    approximate; exact at K=0 where it reduces to Margrabe)."""
    f1 = spot1 * jnp.exp((rate - div1) * maturity)
    f2 = spot2 * jnp.exp((rate - div2) * maturity)
    fk = f2 / (f2 + strike)
    sig = jnp.sqrt(jnp.maximum(
        vol1**2 - 2.0 * rho * vol1 * vol2 * fk + (vol2 * fk) ** 2, 1e-12))
    st = sig * jnp.sqrt(maturity)
    d1 = (jnp.log(f1 / (f2 + strike)) + 0.5 * st * st) / st
    df = jnp.exp(-rate * maturity)
    return df * (f1 * norm_cdf(d1) - (f2 + strike) * norm_cdf(d1 - st))


# ---------------------------------------------------------------------------
# Path-dependent: basket Asian (running average of the basket level)
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("n_paths", "n_steps", "return_stderr"))
def basket_asian_price(spots, weights, strike, maturity, rate, vols, corr,
                       key, cp: float = 1.0, dividends=0.0,
                       n_paths: int = 100_000, n_steps: int = 64,
                       return_stderr: bool = False):
    """Arithmetic Asian on the arithmetic basket — scan carries
    (log-spots (d, paths), running basket sum); O(d × paths) memory."""
    spots = jnp.asarray(spots, jnp.float32)
    vols = jnp.asarray(vols, jnp.float32)
    dividends = jnp.broadcast_to(jnp.asarray(dividends, jnp.float32), spots.shape)
    w = jnp.asarray(weights, jnp.float32)[:, None]
    d = spots.shape[0]
    chol = _chol(corr, d)
    half = n_paths // 2
    dt = maturity / n_steps
    drift = ((rate - dividends - 0.5 * vols**2) * dt)[:, None]
    sig_dt = (vols * jnp.sqrt(dt))[:, None]

    def step(carry, i):
        log_s, acc = carry
        z = jax.random.normal(jax.random.fold_in(key, i), (d, half),
                              dtype=jnp.float32)
        z = jnp.concatenate([z, -z], axis=1)
        log_s = log_s + drift + sig_dt * jnp.matmul(
            chol, z, precision=jax.lax.Precision.HIGHEST)
        basket = (w * spots[:, None] * jnp.exp(log_s)).sum(axis=0)
        return (log_s, acc + basket), None

    log_s0 = jnp.zeros((d, n_paths), jnp.float32)
    (log_s, acc), _ = lax.scan(step, (log_s0, jnp.zeros(n_paths, jnp.float32)),
                               jnp.arange(n_steps))
    pay = jnp.maximum(cp * (acc / n_steps - strike), 0.0)
    price, se = _disc_mean_stderr(pay, rate, maturity)
    return (price, se) if return_stderr else price


def multi_asset_greeks(price_fn, spots, vols, **kwargs):
    """Per-asset delta and vega vectors of any multi-asset pricer by AD.

    ``price_fn(spots, vols) -> price`` built on the differentiable engine.
    """
    spots = jnp.asarray(spots, jnp.float32)
    vols = jnp.asarray(vols, jnp.float32)
    price, grads = jax.value_and_grad(price_fn, argnums=(0, 1))(spots, vols,
                                                                **kwargs)
    return {"price": price, "delta": grads[0], "vega": grads[1]}
