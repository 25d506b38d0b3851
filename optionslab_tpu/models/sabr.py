"""SABR model: Hagan 2002 lognormal implied vol, Black-76 pricing, calibration.

Reference capabilities covered (SURVEY.md §2.2):
  - ``src/pricing_models/sabr.py:40-160`` — Hagan implied vol with the ATM
    branch (Obloj correction), smile generation, Black-76 pricing through
    the SABR vol.
  - ``sabr.py:207-263`` — L-BFGS-B calibration with β held fixed.

TPU-first design: the ATM/non-ATM branch is an AD-safe ``where`` over a
series-expanded z/x(z) ratio (no ``if``), so one expression serves a whole
smile grid and gradients flow for calibration, which runs as jitted Adam
on transformed (α>0, ν>0, ρ∈(-1,1)) parameters.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.math import norm_cdf
from ..utils.config import EPS_TIME
from ..utils.exceptions import CalibrationError, ValidationError


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SABRParams:
    alpha: jnp.ndarray  # ATM vol level
    beta: jnp.ndarray  # CEV exponent (usually fixed)
    rho: jnp.ndarray  # spot/vol correlation
    nu: jnp.ndarray  # vol of vol

    @classmethod
    def make(cls, alpha=0.2, beta=0.5, rho=-0.3, nu=0.4, dtype=jnp.float32):
        return cls(*(jnp.asarray(x, dtype) for x in (alpha, beta, rho, nu)))

    def validate(self):
        a, b, r, n = (float(np.asarray(getattr(self, f)).ravel()[0])
                      for f in ("alpha", "beta", "rho", "nu"))
        if a <= 0 or n < 0:
            raise ValidationError(f"alpha must be > 0 and nu >= 0: alpha={a}, nu={n}")
        if not 0.0 <= b <= 1.0:
            raise ValidationError(f"beta must be in [0,1]: {b}")
        if not -1.0 < r < 1.0:
            raise ValidationError(f"rho must be in (-1,1): {r}")


def sabr_implied_vol(forward, strike, maturity, params: SABRParams):
    """Hagan et al. (2002) lognormal implied vol, branch-free.

    The z/x(z) ratio uses its Taylor expansion 1 - ρz/2 + (3ρ²-2)z²/12 for
    |z| below a threshold (covers the ATM limit smoothly, same role as the
    reference's explicit ATM branch at ``sabr.py:68``).
    """
    f, k = jnp.broadcast_arrays(jnp.asarray(forward), jnp.asarray(strike))
    t = jnp.maximum(jnp.asarray(maturity), EPS_TIME)
    a, b, rho, nu = params.alpha, params.beta, params.rho, params.nu

    logfk = jnp.log(f / k)
    fk_mid = (f * k) ** ((1.0 - b) / 2.0)
    one_m_b = 1.0 - b

    z = (nu / jnp.maximum(a, 1e-12)) * fk_mid * logfk
    sqrt_term = jnp.sqrt(jnp.maximum(1.0 - 2.0 * rho * z + z * z, 1e-12))
    x_of_z = jnp.log(jnp.maximum((sqrt_term + z - rho) / (1.0 - rho), 1e-12))
    # series for z/x(z) near z=0 (AD-safe at ATM)
    small = jnp.abs(z) < 1e-4
    z_safe = jnp.where(small, 1.0, z)
    ratio_exact = z_safe / jnp.where(small, 1.0, x_of_z)
    ratio_series = 1.0 - 0.5 * rho * z + (3.0 * rho * rho - 2.0) / 12.0 * z * z
    ratio = jnp.where(small, ratio_series, ratio_exact)

    denom = fk_mid * (
        1.0 + one_m_b**2 / 24.0 * logfk**2 + one_m_b**4 / 1920.0 * logfk**4
    )
    correction = 1.0 + t * (
        one_m_b**2 / 24.0 * a * a / fk_mid**2
        + 0.25 * rho * b * nu * a / fk_mid
        + (2.0 - 3.0 * rho * rho) / 24.0 * nu * nu
    )
    return (a / denom) * ratio * correction


def sabr_atm_vol(forward, maturity, params: SABRParams):
    """ATM implied vol (reference: ``sabr.py:68``)."""
    return sabr_implied_vol(forward, forward, maturity, params)


def sabr_smile(forward, strikes, maturity, params: SABRParams):
    """Vol smile over a strike grid (reference: ``sabr.py:129``)."""
    return sabr_implied_vol(forward, jnp.asarray(strikes), maturity, params)


def black76_price(forward, strike, maturity, rate, vol, cp=1.0):
    """Black-76 on forwards (reference prices SABR through it, sabr.py:160)."""
    t = jnp.maximum(jnp.asarray(maturity), EPS_TIME)
    v = jnp.maximum(jnp.asarray(vol), 1e-12)
    sig_sqrt_t = v * jnp.sqrt(t)
    d1 = (jnp.log(forward / strike) + 0.5 * v * v * t) / sig_sqrt_t
    d2 = d1 - sig_sqrt_t
    df = jnp.exp(-rate * t)
    live = df * cp * (forward * norm_cdf(cp * d1) - strike * norm_cdf(cp * d2))
    intrinsic = df * jnp.maximum(cp * (forward - strike), 0.0)
    return jnp.where(jnp.asarray(maturity) <= EPS_TIME, intrinsic, live)


def sabr_price(forward, strike, maturity, rate, params: SABRParams, cp=1.0):
    vol = sabr_implied_vol(forward, strike, maturity, params)
    return black76_price(forward, strike, maturity, rate, vol, cp)


def _sabr_unpack(x, beta):
    return SABRParams(alpha=jax.nn.softplus(x[0]), beta=beta,
                      rho=jnp.tanh(x[1]), nu=jax.nn.softplus(x[2]))


def _sabr_loss(x, forward, ks, maturity, vols, beta):
    model = sabr_implied_vol(forward, ks, maturity, _sabr_unpack(x, beta))
    return jnp.mean((model - vols) ** 2)


def calibrate_sabr(forward, strikes, maturity, market_vols,
                   beta: float = 0.5, init: SABRParams | None = None,
                   n_steps: int = 400, learning_rate: float = 0.05,
                   ) -> tuple[SABRParams, float]:
    """Fit (α, ρ, ν) to a smile with β fixed (reference: ``sabr.py:207``).

    The entire Adam loop is one scanned on-device program with a stable
    jit cache (scan_adam_cached); loss = MSE of implied vols.
    """
    from ..ops.optim import scan_adam_cached

    vols = jnp.asarray(market_vols, jnp.float32)
    ks = jnp.asarray(strikes, jnp.float32)
    init = init or SABRParams.make(alpha=float(np.mean(np.asarray(market_vols))), beta=beta)

    inv_sp = lambda x: jnp.log(jnp.expm1(jnp.maximum(jnp.asarray(x, jnp.float32), 1e-6)))
    x0 = jnp.stack([inv_sp(init.alpha), jnp.arctanh(jnp.clip(init.rho, -0.99, 0.99)),
                    inv_sp(jnp.maximum(init.nu, 1e-3))])

    best_x, best_loss, _ = scan_adam_cached(
        _sabr_loss, x0,
        (jnp.float32(forward), ks, jnp.float32(maturity), vols,
         jnp.float32(beta)), n_steps, learning_rate)
    if not np.isfinite(float(best_loss)):
        raise CalibrationError("SABR calibration diverged (non-finite loss)")
    params = _sabr_unpack(best_x, jnp.float32(beta))
    params.validate()
    return params, float(best_loss)


class SABRModel:
    """Object adapter (reference: ``sabr.py:40``)."""

    def __init__(self, alpha=0.2, beta=0.5, rho=-0.3, nu=0.4):
        self.params = SABRParams.make(alpha, beta, rho, nu)
        self.params.validate()

    def implied_vol(self, F, K, T):
        return sabr_implied_vol(F, K, T, self.params)

    def atm_vol(self, F, T):
        return sabr_atm_vol(F, T, self.params)

    def smile(self, F, strikes, T):
        return sabr_smile(F, strikes, T, self.params)

    def price(self, S, K, T, r, sigma=None, option_type="call", q=0.0):
        """Unified-protocol price: sigma is ignored (the model supplies its
        own vol), mirroring the reference's SABRAdapter (unified_greeks.py:107)."""
        cp = 1.0 if str(option_type).lower() in ("call", "c", "1") else -1.0
        forward = jnp.asarray(S) * jnp.exp((jnp.asarray(r) - jnp.asarray(q)) * jnp.asarray(T))
        return sabr_price(forward, K, T, r, self.params, cp)
