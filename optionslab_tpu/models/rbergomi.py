"""Rough Bergomi (rBergomi) model — exact Volterra-Gaussian simulation.

Beyond the reference (no rough-volatility support).  Bayer–Friz–Gatheral
(2016) dynamics:

    v_t = xi0 * exp(eta * V~_t - eta^2/2 * t^{2H}),
    V~_t = sqrt(2H) * int_0^t (t-s)^{H-1/2} dW_s     (Var V~_t = t^{2H})
    dS/S = (r-q) dt + sqrt(v_t) (rho dW + sqrt(1-rho^2) dW_perp)

TPU-first design: instead of the hybrid scheme's FFT convolution, the
(V~ at grid, W at grid) joint Gaussian is simulated EXACTLY — its 2n x 2n
covariance has closed-form/1-D-quadrature entries, is Cholesky-factorized
once at trace time (host, cached per (n_steps, H, T)), and each batch of
paths is one (paths x 2n) @ (2n x 2n) matmul: the hot op lands on the MXU
at full tilt and the only discretization error left is the left-point
spot integral (the variance path itself is exact in distribution).

Oracles: eta -> 0 is Black–Scholes with sigma^2 = xi0; E[v_t] = xi0
exactly (lognormal martingale check); the ATM skew follows the rough
power law psi(tau) ~ tau^{H - 1/2}.
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.exceptions import ValidationError

__all__ = ["RBergomiParams", "rbergomi_price", "rbergomi_smile_iv",
           "rbergomi_variance_grid"]


@dataclasses.dataclass(frozen=True)
class RBergomiParams:
    """hurst in (0, 1/2]: roughness; eta: vol-of-vol; rho: spot/vol
    correlation; xi0: (flat) forward variance level."""

    hurst: float = 0.1
    eta: float = 1.9
    rho: float = -0.9
    xi0: float = 0.04

    def validate(self):
        if not 0.0 < self.hurst <= 0.5:
            raise ValidationError(f"hurst must be in (0, 0.5]: {self.hurst}")
        if not -1.0 < self.rho < 1.0:
            raise ValidationError(f"rho must be in (-1, 1): {self.rho}")
        if self.eta < 0 or self.xi0 <= 0:
            raise ValidationError(
                f"need eta >= 0, xi0 > 0: {self.eta}, {self.xi0}")


@functools.lru_cache(maxsize=16)
def _volterra_chol(n_steps: int, hurst: float, maturity: float):
    """Cholesky factor of Cov([V~_{t_1..n}, W_{t_1..n}]) (host, cached).

    C_VV[i,i] = t_i^{2H} exactly; off-diagonals by Gauss–Legendre after
    the u = w^{1/(H+1/2)} substitution that removes the (t_i - s)^{H-1/2}
    endpoint singularity.  C_VW is closed-form; C_WW = min(t_i, t_j).
    """
    h = float(hurst)
    n = int(n_steps)
    t = np.linspace(maturity / n, maturity, n)
    p = 1.0 / (h + 0.5)

    x64, w64 = np.polynomial.legendre.leggauss(64)

    c_vv = np.empty((n, n))
    for i in range(n):
        ti = t[i]
        c_vv[i, i] = ti ** (2 * h)
        if i + 1 < n:
            tj = t[i + 1:]
            # 2H * int_0^{ti} u^{H-1/2} (tj - ti + u)^{H-1/2} du,
            # u = w^p: integrand -> p * (tj - ti + w^p)^{H-1/2} on
            # [0, ti^{1/p}]
            b = ti ** (1.0 / p)
            w_nodes = 0.5 * b * (x64 + 1.0)
            w_w = 0.5 * b * w64
            u = w_nodes ** p  # (64,)
            f = (tj[:, None] - ti + u[None, :]) ** (h - 0.5)  # (n-i-1, 64)
            val = 2 * h * p * (f * w_w[None, :]).sum(axis=1)
            c_vv[i, i + 1:] = val
            c_vv[i + 1:, i] = val

    sq2h = np.sqrt(2 * h)
    ti_ = t[:, None]
    tj_ = t[None, :]
    mn = np.minimum(ti_, tj_)
    c_vw = sq2h / (h + 0.5) * (ti_ ** (h + 0.5) - (ti_ - mn) ** (h + 0.5))
    c_ww = mn

    cov = np.block([[c_vv, c_vw], [c_vw.T, c_ww]])
    # tiny jitter for numerical PSD
    cov += 1e-12 * np.eye(2 * n)
    return np.linalg.cholesky(cov).astype(np.float32)


def rbergomi_variance_grid(params: RBergomiParams, v_tilde, t_grid):
    """v_t on the grid from the exact Volterra draw."""
    return params.xi0 * jnp.exp(params.eta * v_tilde
                                - 0.5 * params.eta**2 * t_grid ** (2 * params.hurst))


@functools.partial(jax.jit,
                   static_argnames=("params", "maturity", "n_paths",
                                    "n_steps", "return_iv"))
def _rbergomi_core(spot, strikes, maturity, rate, dividend, cp,
                   params: RBergomiParams, key, n_paths: int, n_steps: int,
                   return_iv: bool = False):
    n = n_steps
    lmat = jnp.asarray(_volterra_chol(n, params.hurst, float(maturity)))
    t_grid = jnp.linspace(maturity / n, maturity, n).astype(jnp.float32)
    dt = jnp.float32(maturity / n)
    half = n_paths // 2

    k1, k2 = jax.random.split(key)
    z = jax.random.normal(k1, (half, 2 * n), jnp.float32)
    z = jnp.concatenate([z, -z], axis=0)  # antithetic
    # the MXU matmul: exact joint (V~, W) draw
    vw = jax.lax.dot_general(z, lmat, (((1,), (1,)), ((), ())),
                             precision=jax.lax.Precision.HIGHEST)
    v_tilde = vw[:, :n]
    w_lvl = vw[:, n:]
    dw = jnp.diff(w_lvl, axis=1, prepend=jnp.zeros((n_paths, 1), jnp.float32))

    v = rbergomi_variance_grid(params, v_tilde, t_grid[None, :])
    # left-point variance: v at t_0 = xi0, then the grid values shifted
    v_left = jnp.concatenate(
        [jnp.full((n_paths, 1), params.xi0, jnp.float32), v[:, :-1]], axis=1)
    sq_v = jnp.sqrt(v_left)

    zp = jax.random.normal(k2, (half, n), jnp.float32)
    zp = jnp.concatenate([zp, -zp], axis=0)
    srho = np.sqrt(max(1.0 - params.rho**2, 0.0))
    dz = params.rho * dw + srho * jnp.sqrt(dt) * zp

    log_s = jnp.sum(sq_v * dz - 0.5 * v_left * dt, axis=1)
    st = spot * jnp.exp((rate - dividend) * maturity + log_s)

    disc = jnp.exp(-rate * maturity)
    pay = jnp.maximum(cp[:, None] * (st[None, :] - strikes[:, None]), 0.0)
    prices = disc * pay.mean(axis=1)
    stderr = disc * pay.std(axis=1) / jnp.sqrt(jnp.float32(n_paths))
    return prices, stderr


def rbergomi_price(spot, strikes, maturity, rate, params: RBergomiParams,
                   key, dividend=0.0, option_type="call",
                   n_paths: int = 100_000, n_steps: int = 256):
    """European prices under rBergomi (exact variance path law).

    Returns (prices, stderr) over the strike array — all strikes share one
    path set (common random numbers)."""
    params.validate()
    if n_paths % 2:
        raise ValidationError("n_paths must be even (antithetic)")
    strikes = jnp.atleast_1d(jnp.asarray(strikes, jnp.float32))
    cp_scalar = 1.0 if str(option_type).lower() in ("call", "c", "1") else -1.0
    cp = jnp.full(strikes.shape, cp_scalar, jnp.float32)
    return _rbergomi_core(jnp.float32(spot), strikes, float(maturity),
                          jnp.float32(rate), jnp.float32(dividend), cp,
                          params, key, n_paths, n_steps)


def rbergomi_smile_iv(k_log_moneyness, maturity, params: RBergomiParams, key,
                      spot=100.0, rate=0.0, n_paths: int = 200_000,
                      n_steps: int = 256):
    """Implied-vol smile at forward log-moneyness points (rate folded into
    the strikes so the forward is spot*e^{rT})."""
    from .iv import implied_vol

    k = np.atleast_1d(np.asarray(k_log_moneyness, np.float64))
    fwd = spot * np.exp(rate * maturity)
    strikes = fwd * np.exp(k)
    cp = np.where(k <= 0, -1.0, 1.0)  # OTM side for a stable inversion
    prices = np.empty_like(k)
    for sign in (-1.0, 1.0):
        m = cp == sign
        if m.any():
            p, _ = rbergomi_price(spot, strikes[m], maturity, rate, params,
                                  key, option_type="call" if sign > 0 else "put",
                                  n_paths=n_paths, n_steps=n_steps)
            prices[m] = np.asarray(p)
    return np.asarray(implied_vol(
        jnp.asarray(prices, jnp.float32), jnp.float32(spot),
        jnp.asarray(strikes, jnp.float32), jnp.float32(maturity),
        jnp.float32(rate), jnp.asarray(cp, jnp.float32)))
