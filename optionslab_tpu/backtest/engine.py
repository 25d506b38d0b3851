"""Delta-hedge backtesting engine.

Reference capabilities covered (SURVEY.md §2.6, ``src/backtesting/
backtest_engine.py``):
  - sell an option, delta-hedge with stock at daily/weekly rebalance,
    track daily and cumulative P&L, settle at expiry (``:135-265``)
  - Sharpe ratio, max drawdown, win rate
  - realized-vs-implied vol comparison (20d rolling, ``:267-293``)
  - yfinance history input (gated; any price series works offline)

TPU-first design: the whole hedge simulation is a ``lax.scan`` over the
price series — P&L accounting, rebalance masks, and BS delta evaluation
run fused on-device; the engine is jit-compiled once per series length and
can be vmapped over strategy parameter grids (e.g. hedge frequency × vol
assumptions) for parameter sweeps the reference would loop.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..models.black_scholes import bs_greeks, bs_price
from ..utils.config import YFINANCE_AVAILABLE
from ..utils.exceptions import DataError, DependencyError, ValidationError


@dataclasses.dataclass
class BacktestResult:
    daily_pnl: np.ndarray
    cumulative_pnl: np.ndarray
    total_pnl: float
    sharpe: float
    max_drawdown: float
    win_rate: float
    option_premium: float
    final_settlement: float
    n_rebalances: int

    def summary(self) -> dict:
        return {
            "total_pnl": self.total_pnl,
            "sharpe": self.sharpe,
            "max_drawdown": self.max_drawdown,
            "win_rate": self.win_rate,
            "option_premium": self.option_premium,
            "final_settlement": self.final_settlement,
            "n_rebalances": self.n_rebalances,
        }


@functools.partial(jax.jit, static_argnames=("rebalance_every",))
def _delta_hedge_scan(prices, strike, rate, sigma, maturity, cp,
                      rebalance_every: int = 1, tx_cost: float = 0.0):
    """Short option + delta hedge, scanned over the price path.

    prices: (n_days,) underlying closes. Day 0: sell option at BS value,
    buy delta shares. Each rebalance day: adjust the hedge. Final day:
    settle intrinsic. Returns (daily_pnl, hedge_positions)."""
    n = prices.shape[0]
    dt = maturity / (n - 1)
    days = jnp.arange(n)
    ttm = jnp.maximum(maturity - days * dt, 1e-6)

    def delta_at(i):
        g = bs_greeks(prices[i], strike, ttm[i], rate, sigma, cp, 0.0)
        return g["delta"]

    prem = bs_price(prices[0], strike, maturity, rate, sigma, cp, 0.0)
    delta0 = delta_at(0)

    def step(carry, i):
        hedge, cash, prev_value = carry
        is_rebal = (i % rebalance_every == 0)
        new_delta = delta_at(i)
        traded = jnp.where(is_rebal, new_delta - hedge, 0.0)
        cash = cash - traded * prices[i] - jnp.abs(traded) * prices[i] * tx_cost
        hedge = jnp.where(is_rebal, new_delta, hedge)
        cash = cash * jnp.exp(rate * dt)
        opt_value = bs_price(prices[i], strike, ttm[i], rate, sigma, cp, 0.0)
        port_value = hedge * prices[i] + cash - opt_value
        pnl = port_value - prev_value
        return (hedge, cash, port_value), pnl

    cash0 = prem - delta0 * prices[0] - jnp.abs(delta0) * prices[0] * tx_cost
    v0 = delta0 * prices[0] + cash0 - prem
    (hedge, cash, _), daily = lax.scan(step, (delta0, cash0, v0), jnp.arange(1, n))
    # settle: option pays intrinsic, hedge unwinds
    settle = jnp.maximum(cp * (prices[-1] - strike), 0.0)
    return daily, prem, settle, hedge, cash


class BacktestEngine:
    """Delta-hedge backtests on historical (or synthetic) price series."""

    def __init__(self, rate: float = 0.03, tx_cost: float = 0.0):
        self.rate = rate
        self.tx_cost = tx_cost

    # -- data ---------------------------------------------------------------
    @staticmethod
    def fetch_history(ticker: str, period: str = "1y"):
        """yfinance close series (network-gated; offline users pass arrays
        directly to run_delta_hedge)."""
        if not YFINANCE_AVAILABLE:
            raise DependencyError(
                "yfinance is not installed; pass a price array instead")
        import yfinance as yf  # pragma: no cover

        return yf.Ticker(ticker).history(period=period)["Close"].to_numpy()

    # -- core ---------------------------------------------------------------
    def run_delta_hedge(self, prices, strike=None, maturity=None, sigma=None,
                        option_type: str = "call", rebalance_every: int = 1) -> BacktestResult:
        prices = np.asarray(prices, np.float32)
        if prices.ndim != 1 or prices.size < 10:
            raise DataError("need a 1-D price series with >= 10 observations")
        if np.any(~np.isfinite(prices)) or np.any(prices <= 0):
            raise DataError("prices must be positive and finite")
        strike = float(strike if strike is not None else prices[0])
        maturity = float(maturity if maturity is not None else (prices.size - 1) / 252.0)
        if sigma is None:
            sigma = float(realized_vol(prices).mean())
        cp = 1.0 if option_type == "call" else -1.0
        if maturity <= 0:
            raise ValidationError("maturity must be positive")

        daily, prem, settle, _, _ = _delta_hedge_scan(
            jnp.asarray(prices), jnp.float32(strike), jnp.float32(self.rate),
            jnp.float32(sigma), jnp.float32(maturity), jnp.float32(cp),
            rebalance_every=rebalance_every, tx_cost=self.tx_cost,
        )
        daily = np.asarray(daily, np.float64)
        cum = np.cumsum(daily)
        std = daily.std(ddof=1)
        sharpe = float(daily.mean() / std * np.sqrt(252.0)) if std > 0 else 0.0
        peak = np.maximum.accumulate(cum)
        max_dd = float((peak - cum).max()) if cum.size else 0.0
        return BacktestResult(
            daily_pnl=daily,
            cumulative_pnl=cum,
            total_pnl=float(cum[-1]),
            sharpe=sharpe,
            max_drawdown=max_dd,
            win_rate=float((daily > 0).mean()),
            option_premium=float(prem),
            final_settlement=float(settle),
            n_rebalances=int(np.ceil((prices.size - 1) / rebalance_every)),
        )

    def run_delta_hedge_sweep(self, prices, strikes, sigmas, maturity, option_type="call"):
        """Parameter sweep as one vmapped launch: (n_strikes, n_sigmas)
        total P&L grid — the TPU answer to rerunning the backtest per
        config."""
        prices = jnp.asarray(np.asarray(prices, np.float32))
        cp = 1.0 if option_type == "call" else -1.0

        def total(strike, sigma):
            daily, *_ = _delta_hedge_scan(prices, strike, jnp.float32(self.rate),
                                          sigma, jnp.float32(maturity), jnp.float32(cp))
            return daily.sum()

        fn = jax.vmap(jax.vmap(total, in_axes=(None, 0)), in_axes=(0, None))
        return np.asarray(fn(jnp.asarray(strikes, jnp.float32),
                             jnp.asarray(sigmas, jnp.float32)))


def realized_vol(prices, window: int = 20) -> np.ndarray:
    """Annualized rolling realized vol (reference: ``:267-293``)."""
    prices = np.asarray(prices, np.float64)
    rets = np.diff(np.log(prices))
    out = np.full(rets.size, np.nan)
    for i in range(window - 1, rets.size):
        out[i] = rets[i - window + 1: i + 1].std(ddof=1) * np.sqrt(252.0)
    # fill leading window with first valid estimate
    first = out[window - 1] if rets.size >= window else rets.std(ddof=1) * np.sqrt(252.0)
    out[: window - 1] = first
    return out


def realized_vs_implied(prices, implied_vol: float, window: int = 20):
    """DataFrame comparing rolling realized vol to a quoted implied vol."""
    import pandas as pd

    rv = realized_vol(prices, window)
    return pd.DataFrame({
        "realized_vol": rv,
        "implied_vol": implied_vol,
        "spread": implied_vol - rv,
    })


def run_delta_hedge_backtest(prices, strike=None, maturity=None, sigma=None,
                             option_type="call", rate=0.03, rebalance_every=1,
                             tx_cost=0.0) -> BacktestResult:
    """Module-level convenience (reference: ``backtest_engine.py:296``)."""
    return BacktestEngine(rate=rate, tx_cost=tx_cost).run_delta_hedge(
        prices, strike, maturity, sigma, option_type, rebalance_every)
