"""Synthetic option-chain and smile generation — the offline data source.

Reference capabilities covered (SURVEY.md §2.8 / §2.9):
  - ``data_loader.py:366-431`` — synthetic chain generator with skew,
    smile curvature, term structure, and noise;
  - ``vol_surface_benchmark.py:632,676`` — synthetic smile/surface
    generators used as test fixtures.

Ground truth is an SVI-style parametric surface (guaranteed arbitrage-free
for sane parameters), so tests can measure model error against a known
truth.
"""

from __future__ import annotations

import numpy as np

from ..models.black_scholes import bs_price


def synthetic_iv(log_moneyness, maturity, base_vol=0.2, skew=-0.1, smile=0.15,
                 term_slope=0.03):
    """Parametric IV: σ(k, T) = base + skew·k + smile·k² + term·√T, floored."""
    k = np.asarray(log_moneyness, np.float64)
    t = np.asarray(maturity, np.float64)
    iv = base_vol + skew * k + smile * k * k + term_slope * np.sqrt(t)
    return np.maximum(iv, 0.03)


def generate_synthetic_smile(n_strikes: int = 21, maturity: float = 0.5,
                             spot: float = 100.0, base_vol: float = 0.2,
                             skew: float = -0.1, smile: float = 0.15,
                             noise: float = 0.0, seed: int = 0):
    """(log_strikes, vols) for one maturity slice."""
    rng = np.random.default_rng(seed)
    k = np.linspace(-0.4, 0.4, n_strikes)
    iv = synthetic_iv(k, maturity, base_vol, skew, smile)
    if noise > 0:
        iv = iv + rng.normal(0.0, noise, iv.shape)
    del spot
    return k, np.maximum(iv, 0.02)


def generate_synthetic_surface(n_strikes: int = 21, n_maturities: int = 6,
                               spot: float = 100.0, noise: float = 0.0, seed: int = 0):
    """(log_strikes, maturities, iv_grid (n_T, n_K))."""
    rng = np.random.default_rng(seed)
    k = np.linspace(-0.4, 0.4, n_strikes)
    t = np.linspace(0.1, 2.0, n_maturities)
    iv = synthetic_iv(k[None, :], t[:, None])
    if noise > 0:
        iv = iv + rng.normal(0.0, noise, iv.shape)
    del spot
    return k, t, np.maximum(iv, 0.02)


def generate_synthetic_chain(n_rows: int = 500, spot: float = 100.0,
                             rate: float = 0.03, noise: float = 0.004,
                             seed: int = 0,
                             moneyness_range: tuple = (-0.35, 0.35),
                             ttm_range: tuple = (0.05, 2.0)):
    """DataFrame with the 5 base columns + implied_volatility + option price
    (the shape ``OptionChainLoader.from_synthetic`` produces,
    ``data_loader.py:366``)."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    strikes = spot * np.exp(rng.uniform(*moneyness_range, n_rows))
    ttm = rng.uniform(*ttm_range, n_rows)
    k = np.log(spot / strikes)
    iv = synthetic_iv(-k, ttm) + rng.normal(0.0, noise, n_rows)
    iv = np.maximum(iv, 0.03)
    cp = rng.choice([1.0, -1.0], n_rows)
    price = np.asarray(bs_price(spot, strikes, ttm, rate, iv, cp, 0.0))
    hist_vol = 0.2 + 0.02 * rng.standard_normal(n_rows)
    df = pd.DataFrame({
        "underlying_price": spot,
        "strike_price": strikes,
        "time_to_maturity": ttm,
        "risk_free_rate": rate,
        "historical_volatility": np.abs(hist_vol),
        "implied_volatility": iv,
        "option_type": np.where(cp > 0, "call", "put"),
        "option_price": price,
    })
    return df
