"""Feature engineering for vol-surface models.

Reference capability (SURVEY.md §2.4, ``src/volatility_surface/utils/
feature_engineering.py:35-137``): 7 features from 5 base columns —
moneyness S/K, log-moneyness, TTM, TTM², risk-free rate, historical vol,
and a rolling vol-skew (20-row deviation of hist vol from its rolling mean).

One implementation (the reference keeps dual pandas/torch paths); the
output is a plain DataFrame ready for ``VolatilityModelBase``.
"""

from __future__ import annotations

import numpy as np

from ..utils.exceptions import DataError
from .base import BASE_COLUMNS, FEATURE_COLUMNS

SKEW_WINDOW = 20


def engineer_features(df, inplace: bool = False):
    """Base columns → the 7 model features. Requires BASE_COLUMNS."""
    missing = [c for c in BASE_COLUMNS if c not in df.columns]
    if missing:
        raise DataError(f"engineer_features: missing base columns {missing}")
    out = df if inplace else df.copy()
    s = out["underlying_price"].to_numpy(dtype=np.float64)
    k = out["strike_price"].to_numpy(dtype=np.float64)
    if np.any(k <= 0) or np.any(s <= 0):
        raise DataError("prices/strikes must be positive")
    out["moneyness"] = s / k
    out["log_moneyness"] = np.log(s / k)
    out["ttm_squared"] = out["time_to_maturity"] ** 2
    hv = out["historical_volatility"]
    rolling = hv.rolling(SKEW_WINDOW, min_periods=1).mean()
    out["volatility_skew"] = (hv - rolling).fillna(0.0)
    return out


__all__ = ["engineer_features", "FEATURE_COLUMNS", "BASE_COLUMNS", "SKEW_WINDOW"]
