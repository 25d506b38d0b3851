"""Risk workflow: portfolio Greeks, VaR/ES, stress testing, delta-hedge
backtest.

Run: python examples/risk_workflow.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo checkout; `pip install -e .` makes this a no-op

import numpy as np

from optionslab_tpu.backtest import BacktestEngine
from optionslab_tpu.models import bs_price
from optionslab_tpu.risk import (
    ExpectedShortfall,
    OptionsPortfolio,
    Position,
    StressScenario,
    StressTester,
    VaRAnalyzer,
)


def main():
    # --- portfolio Greeks, one fused launch ---
    book = OptionsPortfolio()
    book.add_position(Position(10, 100.0, 100.0, 1.0, 0.05, 0.2, "call", underlying="AAA"))
    book.add_position(Position(-5, 100.0, 110.0, 0.5, 0.05, 0.25, "call", underlying="AAA"))
    book.add_position(Position(20, 50.0, 50.0, 2.0, 0.03, 0.3, "put", underlying="BBB"))
    print("aggregate:", {k: round(v, 3) for k, v in book.aggregate_greeks().items()
                         if k in ("delta", "gamma", "vega", "theta")})
    print("hedge ratio:", round(book.delta_hedge_ratio(), 3))
    grid = book.scenario_pnl(np.linspace(-0.2, 0.2, 5), np.linspace(-0.3, 0.3, 3))
    print("spot x vol P&L grid:\n", np.round(grid, 2))

    # --- VaR / ES ---
    var = VaRAnalyzer(confidence=0.99)
    print("99% 1y VaR of $1M equity:", round(var.parametric_lognormal(1e6, 0.05, 0.2)))
    print("99% ES:", round(ExpectedShortfall.monte_carlo(1e6, 0.05, 0.2, 0.99)))

    # --- stress testing ---
    import pandas as pd

    market = pd.DataFrame({
        "underlying_price": [100.0, 95.0], "strike_price": [100.0, 100.0],
        "time_to_maturity": [0.5, 1.0], "risk_free_rate": [0.03, 0.03],
        "historical_volatility": [0.2, 0.25],
    })

    def price_fn(df):
        return np.asarray(bs_price(
            df["underlying_price"].to_numpy(), df["strike_price"].to_numpy(),
            df["time_to_maturity"].to_numpy(), df["risk_free_rate"].to_numpy(),
            df["historical_volatility"].to_numpy(), 1.0, 0.0))

    report = StressTester(price_fn).run_scenarios(market, [
        StressScenario("crash -20%", "underlying_price", -0.2),
        StressScenario("vol +50%", "historical_volatility", 0.5),
    ])
    print(report.to_string(index=False))

    # --- delta-hedge backtest on a synthetic path ---
    rng = np.random.default_rng(0)
    prices = 100 * np.exp(np.cumsum(0.2 * np.sqrt(1 / 252) * rng.standard_normal(252)))
    prices = np.concatenate([[100.0], prices])
    res = BacktestEngine(rate=0.03).run_delta_hedge(prices, strike=100.0,
                                                    maturity=1.0, sigma=0.2)
    print("backtest:", res.summary())


if __name__ == "__main__":
    main()
