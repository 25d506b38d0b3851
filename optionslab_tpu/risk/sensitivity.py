"""Model-agnostic sensitivity analysis on DataFrame-priced portfolios.

Reference capabilities covered (SURVEY.md §2.5, ``src/risk_analysis/
sensitivity_analysis.py:25-139``): FD delta/gamma/vega with relative or
absolute bumps through a black-box ``price_fn(df)``.

The AD engine (``optionslab_tpu.greeks``) supersedes this for
differentiable pricers; this module is the black-box fallback that matches
the reference's behavior for arbitrary pricing callables.
"""

from __future__ import annotations

from typing import Callable

import numpy as np


def _bump(df, column: str, h: float, relative: bool):
    up = df.copy()
    dn = df.copy()
    if relative:
        up[column] = up[column] * (1.0 + h)
        dn[column] = dn[column] * (1.0 - h)
        step = df[column].to_numpy() * h
    else:
        up[column] = up[column] + h
        dn[column] = dn[column] - h
        step = np.full(len(df), h)
    return up, dn, step


class SensitivityAnalysis:
    def __init__(self, price_fn: Callable, spot_col: str = "underlying_price",
                 vol_col: str = "historical_volatility"):
        self.price_fn = price_fn
        self.spot_col = spot_col
        self.vol_col = vol_col

    def compute_delta(self, df, h: float = 0.01, relative: bool = True):
        up, dn, step = _bump(df, self.spot_col, h, relative)
        return (np.asarray(self.price_fn(up)) - np.asarray(self.price_fn(dn))) / (2.0 * step)

    def compute_gamma(self, df, h: float = 0.01, relative: bool = True):
        up, dn, step = _bump(df, self.spot_col, h, relative)
        base = np.asarray(self.price_fn(df))
        return (np.asarray(self.price_fn(up)) - 2.0 * base + np.asarray(self.price_fn(dn))) / (step**2)

    def compute_vega(self, df, h: float = 0.01, relative: bool = False):
        up, dn, step = _bump(df, self.vol_col, h, relative)
        return (np.asarray(self.price_fn(up)) - np.asarray(self.price_fn(dn))) / (2.0 * step)

    def compute_all(self, df, h: float = 0.01):
        return {
            "delta": self.compute_delta(df, h),
            "gamma": self.compute_gamma(df, h),
            "vega": self.compute_vega(df, h),
        }
