"""Expected shortfall (CVaR) — standalone static API.

Reference capability (SURVEY.md §2.5, ``src/risk_analysis/
expected_shortfall.py:14-91``): historical, Gaussian parametric
(-μ + σ·φ(z)/(1-α)), and Monte Carlo ES.
"""

from __future__ import annotations

import jax

from .var import historical_es, monte_carlo_var, parametric_es


class ExpectedShortfall:
    @staticmethod
    def historical(pnl, confidence: float = 0.95) -> float:
        return float(historical_es(pnl, confidence))

    @staticmethod
    def parametric(mu, sigma, confidence: float = 0.95, horizon: float = 1.0) -> float:
        return float(parametric_es(mu, sigma, confidence, horizon))

    @staticmethod
    def monte_carlo(value, mu, sigma, confidence: float = 0.95, horizon: float = 1.0,
                    n_paths: int = 100_000, seed: int = 0) -> float:
        _, es = monte_carlo_var(value, mu, sigma, jax.random.PRNGKey(seed), confidence,
                                horizon, n_paths, return_es=True)
        return float(es)
