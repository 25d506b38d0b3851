"""Value-at-Risk analysis — device-side quantiles over simulated P&L.

Reference capabilities covered (SURVEY.md §2.5, ``src/risk_analysis/var.py``):
  - conventions: P&L positive = profit; VaR/ES returned as POSITIVE losses
  - historical VaR/ES (empirical quantile + tail mean, ``:102-117``)
  - parametric normal & lognormal (closed-form tail expectation,
    ``:184-208``)
  - Monte Carlo VaR on GBM terminal (``:220-261``)
  - delta-normal multi-asset portfolio VaR wᵀΣw (``:266-314``)
  - option-aware VaR with pricer injection (``:319-386``)
  - additive stress shifts + batch stress table (``:391-435``)

TPU-first design: everything is a fused jnp expression (sort/quantile/tail
means run on-device); the option-VaR path takes a vectorized pricer
``fn(spots) -> prices`` so the whole revaluation is ONE launch (the
reference loops per-scenario when the pricer is scalar, ``var.py:360-377``).
No RLock: stateless functions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.math import norm_pdf, norm_ppf
from ..utils.exceptions import ValidationError


def _check_confidence(confidence: float):
    if not 0.5 < confidence < 1.0:
        raise ValidationError(f"confidence must be in (0.5, 1), got {confidence}")


# ---------------------------------------------------------------------------
# Historical
# ---------------------------------------------------------------------------
def historical_var(pnl, confidence: float = 0.95):
    """Positive loss at the (1-confidence) quantile of the P&L sample."""
    _check_confidence(confidence)
    pnl = jnp.asarray(pnl)
    return -jnp.quantile(pnl, 1.0 - confidence)


def historical_es(pnl, confidence: float = 0.95):
    """Mean loss beyond VaR (positive)."""
    _check_confidence(confidence)
    pnl = jnp.asarray(pnl)
    q = jnp.quantile(pnl, 1.0 - confidence)
    tail = jnp.where(pnl <= q, pnl, jnp.nan)
    return -jnp.nanmean(tail)


# ---------------------------------------------------------------------------
# Parametric
# ---------------------------------------------------------------------------
def parametric_var(mu, sigma, confidence: float = 0.95, horizon: float = 1.0):
    """Normal P&L: VaR = -(μ·h - z·σ·√h)."""
    _check_confidence(confidence)
    z = norm_ppf(jnp.asarray(confidence))
    return -(jnp.asarray(mu) * horizon - z * jnp.asarray(sigma) * jnp.sqrt(horizon))


def parametric_es(mu, sigma, confidence: float = 0.95, horizon: float = 1.0):
    """Normal ES = -(μ·h) + σ√h·φ(z)/(1-c)."""
    _check_confidence(confidence)
    c = jnp.asarray(confidence)
    z = norm_ppf(c)
    return -(jnp.asarray(mu) * horizon) + jnp.asarray(sigma) * jnp.sqrt(horizon) * norm_pdf(z) / (1.0 - c)


def lognormal_var(value, mu, sigma, confidence: float = 0.95, horizon: float = 1.0):
    """Loss quantile of V·(exp(X)-1), X ~ N((μ-σ²/2)h, σ²h) — the closed
    lognormal form the reference derives at ``var.py:184-208``."""
    _check_confidence(confidence)
    z = norm_ppf(1.0 - jnp.asarray(confidence))
    drift = (jnp.asarray(mu) - 0.5 * jnp.asarray(sigma) ** 2) * horizon
    ret_q = jnp.exp(drift + jnp.asarray(sigma) * jnp.sqrt(horizon) * z) - 1.0
    return -jnp.asarray(value) * ret_q


# ---------------------------------------------------------------------------
# Monte Carlo
# ---------------------------------------------------------------------------
def monte_carlo_var(value, mu, sigma, key, confidence: float = 0.95,
                    horizon: float = 1.0, n_paths: int = 100_000,
                    return_es: bool = False):
    """GBM revaluation VaR (reference: ``var.py:220-261``)."""
    _check_confidence(confidence)
    z = jax.random.normal(key, (n_paths,))
    growth = jnp.exp((mu - 0.5 * sigma**2) * horizon + sigma * jnp.sqrt(horizon) * z)
    pnl = jnp.asarray(value) * (growth - 1.0)
    var = historical_var(pnl, confidence)
    if return_es:
        return var, historical_es(pnl, confidence)
    return var


# ---------------------------------------------------------------------------
# Delta-normal portfolio
# ---------------------------------------------------------------------------
def delta_normal_var(positions, cov, confidence: float = 0.95, horizon: float = 1.0):
    """Multi-asset delta-normal VaR = z·√(wᵀΣw)·√h (reference: ``var.py:266``).

    ``positions``: currency exposures per asset; ``cov``: per-period return
    covariance."""
    _check_confidence(confidence)
    w = jnp.asarray(positions)
    cov = jnp.asarray(cov)
    if cov.shape != (w.size, w.size):
        raise ValidationError(f"cov shape {cov.shape} incompatible with {w.size} positions")
    hi = jax.lax.Precision.HIGHEST  # TPU default matmul is bf16
    port_sigma = jnp.sqrt(jnp.maximum(
        jnp.dot(w, jnp.matmul(cov, w, precision=hi), precision=hi), 0.0))
    z = norm_ppf(jnp.asarray(confidence))
    return z * port_sigma * jnp.sqrt(horizon)


# ---------------------------------------------------------------------------
# Option-aware VaR (full revaluation through an injected pricer)
# ---------------------------------------------------------------------------
def option_var(pricer_fn, spot, mu, sigma, key, confidence: float = 0.95,
               horizon: float = 1.0 / 252.0, n_paths: int = 50_000,
               return_es: bool = False):
    """Full-revaluation option VaR: simulate spots over the horizon, reprice
    the book with ``pricer_fn(spots) -> portfolio values`` in one launch.

    The reference falls back to a per-scenario Python loop for scalar
    pricers (``var.py:360-377``); here vectorization is the contract.
    """
    _check_confidence(confidence)
    z = jax.random.normal(key, (n_paths,))
    spots = spot * jnp.exp((mu - 0.5 * sigma**2) * horizon + sigma * jnp.sqrt(horizon) * z)
    v0 = pricer_fn(jnp.asarray([spot]))[0]
    v1 = pricer_fn(spots)
    pnl = v1 - v0
    var = historical_var(pnl, confidence)
    if return_es:
        return var, historical_es(pnl, confidence)
    return var


# ---------------------------------------------------------------------------
# Stress shifts
# ---------------------------------------------------------------------------
def stressed_var(base_var, shift_pct):
    """Additive stress on a computed VaR (reference: ``var.py:391``)."""
    return jnp.asarray(base_var) * (1.0 + jnp.asarray(shift_pct))


class VaRAnalyzer:
    """Object adapter mirroring the reference's ``VaRAnalyzer`` (``var.py:78``)."""

    def __init__(self, confidence: float = 0.95, horizon: float = 1.0, seed: int = 0):
        _check_confidence(confidence)
        self.confidence = confidence
        self.horizon = horizon
        self._key = jax.random.PRNGKey(seed)

    def historical(self, pnl):
        return float(historical_var(pnl, self.confidence))

    def historical_expected_shortfall(self, pnl):
        return float(historical_es(pnl, self.confidence))

    def parametric(self, mu, sigma):
        return float(parametric_var(mu, sigma, self.confidence, self.horizon))

    def parametric_lognormal(self, value, mu, sigma):
        return float(lognormal_var(value, mu, sigma, self.confidence, self.horizon))

    def monte_carlo(self, value, mu, sigma, n_paths: int = 100_000):
        return float(monte_carlo_var(value, mu, sigma, self._key, self.confidence,
                                     self.horizon, n_paths))

    def delta_normal(self, positions, cov):
        return float(delta_normal_var(positions, cov, self.confidence, self.horizon))

    def option_portfolio(self, pricer_fn, spot, mu, sigma, n_paths: int = 50_000):
        return float(option_var(pricer_fn, spot, mu, sigma, self._key, self.confidence,
                                min(self.horizon, 1.0) / 252.0 if self.horizon >= 1.0 else self.horizon,
                                n_paths))

    def stress_table(self, base_var, shifts):
        return {float(s): float(stressed_var(base_var, s)) for s in np.asarray(shifts)}


# ---------------------------------------------------------------------------
# Component (Euler) allocation
# ---------------------------------------------------------------------------
def component_var(pnl_components, confidence: float = 0.95,
                  window: int = 0):
    """Euler allocation of historical VaR to P&L components.

    ``pnl_components``: (n_obs, n_components) — each column one desk /
    position / factor; the portfolio P&L is the row sum.  Component VaR
    of column i is −E[X_i | X_p in the VaR window]: the conditional tail
    contribution, which SUMS TO THE TOTAL VaR estimate by construction
    (Euler / positive homogeneity).  ``window``: number of tail
    observations to average (0 = the single quantile observation; small
    windows trade bias for variance like a Harrell–Davis estimator).

    Beyond-reference: the reference computes portfolio VaR only; desks
    need the decomposition to know WHO consumes the limit.
    Returns dict(total_var, components (n,), pct (n,)).
    """
    _check_confidence(confidence)
    x = jnp.asarray(pnl_components)
    if x.ndim != 2:
        raise ValidationError("pnl_components must be (n_obs, n_components)")
    port = x.sum(axis=1)
    n = port.shape[0]
    k = max(int(np.floor((1.0 - confidence) * n)), 0)
    order = jnp.argsort(port)
    if window <= 0:
        sel = order[k:k + 1]
    else:
        lo = max(k - window // 2, 0)
        sel = jax.lax.dynamic_slice(order, (lo,), (min(window, n),))
    comp = -jnp.mean(x[sel, :], axis=0)
    total = comp.sum()
    return {"total_var": total, "components": comp,
            "pct": comp / jnp.where(total == 0.0, 1.0, total)}


def component_es(pnl_components, confidence: float = 0.95):
    """Euler allocation of historical EXPECTED SHORTFALL: component i
    gets −E[X_i | X_p ≤ VaR_p].  ES is coherent, so the allocation is
    the exact Aumann–Shapley/Euler one and sums to the total ES."""
    _check_confidence(confidence)
    x = jnp.asarray(pnl_components)
    if x.ndim != 2:
        raise ValidationError("pnl_components must be (n_obs, n_components)")
    port = x.sum(axis=1)
    q = jnp.quantile(port, 1.0 - confidence)
    w = (port <= q).astype(x.dtype)
    denom = jnp.maximum(w.sum(), 1.0)
    comp = -(x * w[:, None]).sum(axis=0) / denom
    total = comp.sum()
    return {"total_es": total, "components": comp,
            "pct": comp / jnp.where(total == 0.0, 1.0, total)}
