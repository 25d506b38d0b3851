"""Options portfolio: positions, aggregate Greeks, scenario P&L grids.

Reference capabilities covered (SURVEY.md §2.5, ``src/risk_analysis/
portfolio.py``):
  - ``Position`` (pricer + quantity + contract params, ``:44``)
  - aggregate Greeks, NaN-tolerant (``:107-122``)
  - per-underlying attribution (``:124``), position report (``:153``)
  - spot × vol scenario P&L grid (``:181-228``)
  - delta-hedge ratio (``:230``), vega maturity buckets (``:253-284``)

TPU-first: the book aggregates through the batched AD Greeks engine — one
fused launch for all positions' full Greek ladders (the reference
duck-types per-position ``delta()`` calls); the scenario grid is a single
vmapped revaluation over the (spot, vol) mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..greeks.unified import greeks_from_fn
from ..models.black_scholes import bs_price
from ..utils.exceptions import ValidationError
from ..utils.validation import check_option_type


@dataclasses.dataclass
class Position:
    quantity: float
    spot: float
    strike: float
    maturity: float
    rate: float
    vol: float
    option_type: str = "call"
    dividend: float = 0.0
    underlying: str = "UND"
    price_fn: Optional[object] = None  # functional pricer; default BS

    def cp(self) -> float:
        return float(check_option_type(self.option_type))


class OptionsPortfolio:
    def __init__(self):
        self.positions: list[Position] = []

    def add_position(self, position: Position):
        if position.maturity < 0 or position.vol < 0:
            raise ValidationError("position maturity/vol must be non-negative")
        self.positions.append(position)

    def __len__(self):
        return len(self.positions)

    # -- batched greeks -----------------------------------------------------
    def _arrays(self):
        p = self.positions
        return (
            jnp.asarray([x.spot for x in p]),
            jnp.asarray([x.strike for x in p]),
            jnp.asarray([x.maturity for x in p]),
            jnp.asarray([x.rate for x in p]),
            jnp.asarray([x.vol for x in p]),
            jnp.asarray([x.dividend for x in p]),
            jnp.asarray([x.cp() for x in p]),
            jnp.asarray([x.quantity for x in p]),
        )

    def position_greeks(self) -> dict:
        """Per-position Greek ladders, one fused launch (BS pricers batch
        together; custom price_fn positions are evaluated individually)."""
        if not self.positions:
            raise ValidationError("portfolio is empty")
        s, k, t, r, sig, q, cp, qty = self._arrays()

        def fn(s_, k_, t_, r_, sig_, q_):
            return bs_price(s_, k_, t_, r_, sig_, cp, q_)

        g = greeks_from_fn(fn, s, k, t, r, sig, q, second_order=True)
        # custom pricers: override rows individually
        for i, pos in enumerate(self.positions):
            if pos.price_fn is not None:
                gi = greeks_from_fn(pos.price_fn, pos.spot, pos.strike, pos.maturity,
                                    pos.rate, pos.vol, pos.dividend, second_order=True)
                for key in g:
                    g[key] = g[key].at[i].set(jnp.asarray(gi[key]))
        return g

    def aggregate_greeks(self) -> dict:
        """Quantity-weighted portfolio totals; NaN-tolerant like the
        reference (``portfolio.py:107-122``)."""
        g = self.position_greeks()
        qty = self._arrays()[-1]
        out = {}
        for key, v in g.items():
            weighted = qty * v
            out[key] = float(jnp.nansum(weighted))
        return out

    def greeks_by_underlying(self) -> dict:
        """Per-underlying attribution (``portfolio.py:124``)."""
        g = self.position_greeks()
        qty = np.asarray(self._arrays()[-1])
        unds = [p.underlying for p in self.positions]
        out: dict = {}
        for key, v in g.items():
            arr = np.asarray(v) * qty
            per = {}
            for u, val in zip(unds, arr):
                per[u] = per.get(u, 0.0) + (0.0 if np.isnan(val) else float(val))
            out[key] = per
        return out

    def position_report(self):
        """DataFrame report (``portfolio.py:153``)."""
        import pandas as pd

        g = self.position_greeks()
        rows = []
        for i, p in enumerate(self.positions):
            rows.append({
                "underlying": p.underlying,
                "type": p.option_type,
                "quantity": p.quantity,
                "strike": p.strike,
                "maturity": p.maturity,
                "price": float(g["price"][i]),
                "delta": float(g["delta"][i]) * p.quantity,
                "gamma": float(g["gamma"][i]) * p.quantity,
                "vega": float(g["vega"][i]) * p.quantity,
                "theta": float(g["theta"][i]) * p.quantity,
                "value": float(g["price"][i]) * p.quantity,
            })
        return pd.DataFrame(rows)

    # -- scenarios ----------------------------------------------------------
    def scenario_pnl(self, spot_shifts, vol_shifts) -> np.ndarray:
        """(n_spot, n_vol) P&L grid — ONE vectorized revaluation
        (``portfolio.py:181-228``). Shifts are relative (e.g. ±0.1)."""
        s, k, t, r, sig, q, cp, qty = self._arrays()
        ds = jnp.asarray(spot_shifts)[:, None, None]  # (ns,1,1)
        dv = jnp.asarray(vol_shifts)[None, :, None]  # (1,nv,1)
        base = jnp.sum(qty * bs_price(s, k, t, r, sig, cp, q))
        vals = bs_price(s[None, None, :] * (1.0 + ds), k, t, r,
                        sig[None, None, :] * (1.0 + dv), cp, q)
        pnl = jnp.sum(qty * vals, axis=-1) - base
        return np.asarray(pnl)

    def delta_hedge_ratio(self) -> float:
        """Shares of underlying to neutralize book delta (``portfolio.py:230``)."""
        return -self.aggregate_greeks()["delta"]

    def vega_buckets(self, edges=(0.25, 0.5, 1.0, 2.0)) -> dict:
        """Vega aggregated into maturity buckets (``portfolio.py:253-284``)."""
        g = self.position_greeks()
        qty = np.asarray(self._arrays()[-1])
        mats = np.asarray([p.maturity for p in self.positions])
        vega = np.asarray(g["vega"]) * qty
        edges = [0.0, *edges, np.inf]
        out = {}
        for lo, hi in zip(edges[:-1], edges[1:]):
            mask = (mats >= lo) & (mats < hi)
            label = f"[{lo:.2f}, {hi if np.isfinite(hi) else 'inf'})"
            out[label] = float(vega[mask].sum()) if mask.any() else 0.0
        return out
