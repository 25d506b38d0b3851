"""Counterparty exposure profiles and CVA/DVA (XVA) on simulated paths.

Beyond-reference capability: the reference's risk layer stops at
portfolio VaR/ES/stress (``src/risk_analysis/``); production option desks
also need EE/EPE/PFE exposure profiles and credit valuation adjustments.

TPU-first design: the whole profile is ONE jitted program — exact GBM
risk-factor transitions on the date grid (cumulative-sum Brownian path,
no scan: S_t is an exact functional of the normals), closed-form
revaluation of every position at every (path, date) by broadcasting
``bs_price`` over a (paths, dates) grid, and device-side quantiles for
PFE.  No per-date Python loops over scenarios (the classic CPU XVA
engine shape); the only Python loop is over the handful of netting-set
instruments, each adding one fused (paths, dates) valuation.

Conventions:
  - EE(t)   = E[(V_t - C_t)^+]                  (undiscounted)
  - EE*(t)  = E[df(0,t) (V_t - C_t)^+]          (discounted)
  - EPE     = time-average of EE(t) on the grid
  - PFE_q(t)= q-quantile of (V_t - C_t)^+
  - ENE(t)  = E[(-(V_t - C_t))^+]               (our exposure to them)
  - CVA     = (1-R) sum_j 1/2 (EE*_{j-1} + EE*_j) (SP(t_{j-1}) - SP(t_j))
    with survival SP(t) = exp(-lambda t) (flat hazard), trapezoid in EE*.
  - Collateral: received C_t = (V_{t-MPoR} - threshold)^+ — a margin
    period of risk lags the mark the collateral tracks.

Exact oracles used by the tests: a LONG option book's EE*(t) equals its
time-0 value for every t (optional-stopping / martingale pricing); the
forward's PFE is the lognormal quantile mapped through its monotone
value function; flat-hazard CVA of a long option is (1-R) V_0
(1 - e^{-lambda T}).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..models.black_scholes import bs_price
from ..utils.exceptions import ValidationError
from .portfolio import OptionsPortfolio, Position

__all__ = ["ExposureResult", "exposure_profile", "cva_dva",
           "cva_allocation", "cva_greeks", "xva_report"]


@dataclasses.dataclass
class ExposureResult:
    dates: np.ndarray          # (m,) years, t=0 excluded
    ee: np.ndarray             # (m,) expected exposure
    ee_discounted: np.ndarray  # (m,)
    ene: np.ndarray            # (m,) expected negative exposure
    ene_discounted: np.ndarray
    pfe: np.ndarray            # (m,) q-quantile exposure
    quantile: float
    epe: float                 # time-averaged EE
    max_pfe: float
    rate: float
    n_paths: int

    @property
    def effective_ee(self) -> np.ndarray:
        """Basel effective EE: the running maximum of EE(t) (rolloff of
        short-dated deals may not shrink regulatory exposure)."""
        return np.maximum.accumulate(self.ee)

    @property
    def eepe(self) -> float:
        """Effective EPE: time-average of effective EE over the first
        year of the profile (or the whole profile if shorter)."""
        m = self.dates <= 1.0 + 1e-9
        eff = self.effective_ee
        return float(np.mean(eff[m] if m.any() else eff))

    def to_dict(self) -> dict:
        return {
            "dates": [float(t) for t in self.dates],
            "ee": [float(x) for x in self.ee],
            "ee_discounted": [float(x) for x in self.ee_discounted],
            "ene": [float(x) for x in self.ene],
            "pfe": [float(x) for x in self.pfe],
            "quantile": self.quantile,
            "epe": self.epe,
            "effective_ee": [float(x) for x in self.effective_ee],
            "eepe": self.eepe,
            "max_pfe": self.max_pfe,
            "n_paths": self.n_paths,
        }


def _positions(book) -> list[Position]:
    if isinstance(book, OptionsPortfolio):
        return book.positions
    return list(book)


def _value_grid(s_grid, t_grid, pos: Position, rate, dividend,
                vol_shift=0.0):
    """Mark-to-market of one position on the (paths, dates) grid.
    ``vol_shift`` lets AD/bumps move the MARKING vol together with the
    dynamics vol (CVA vega is a parallel shift of both)."""
    tau = jnp.maximum(pos.maturity - t_grid, 1e-8)
    # a deal stays in the netting set THROUGH its payoff date (the payoff
    # is exposure until it settles); it drops only after maturity
    alive = (pos.maturity - t_grid) > -1e-9
    if pos.option_type == "forward":
        v = (s_grid * jnp.exp(-dividend * tau)
             - pos.strike * jnp.exp(-rate * tau))
    else:
        cp = 1.0 if pos.option_type == "call" else -1.0
        v = bs_price(s_grid, pos.strike, tau, rate, pos.vol + vol_shift,
                     cp, dividend)
    return pos.quantity * jnp.where(alive, v, 0.0)


def _book_setup(pos, spot, rate, vol, corr, horizon):
    """Shared netting-set setup: one risk factor per distinct underlying
    (first-appearance order), spot/vol per factor, correlation Cholesky."""
    p0 = pos[0]
    rate = float(p0.rate if rate is None else rate)
    horizon = float(horizon if horizon is not None
                    else max(p.maturity for p in pos))
    if horizon <= 0:
        raise ValidationError("horizon must be positive")
    unds: list[str] = []
    for p in pos:
        if p.underlying not in unds:
            unds.append(p.underlying)
    m = len(unds)
    u_idx = {u: i for i, u in enumerate(unds)}
    first = {p.underlying: p for p in reversed(pos)}
    spots = np.array([float(spot if spot is not None and m == 1
                            else first[u].spot) for u in unds], np.float32)
    vols = np.array([float(vol if vol is not None and m == 1
                           else first[u].vol) for u in unds], np.float32)
    if corr is None:
        chol = np.eye(m, dtype=np.float32)
    else:
        c = np.asarray(corr, np.float64)
        if c.shape != (m, m):
            raise ValidationError(f"corr must be ({m}, {m}) for underlyings "
                                  f"{unds}, got {c.shape}")
        try:
            chol = np.linalg.cholesky(c).astype(np.float32)
        except np.linalg.LinAlgError as e:
            raise ValidationError("corr must be positive definite") from e
    return rate, horizon, u_idx, spots, vols, chol


def _sim_spots(key, n_paths, dates, spots, vols, chol, rate, dividend):
    """(paths, dates, factors) exact GBM levels on the date grid."""
    m = len(spots)
    n_dates = dates.shape[0]
    z = jax.random.normal(key, (n_paths, n_dates, m), jnp.float32)
    z = jnp.einsum("pdm,km->pdk", z, jnp.asarray(chol))
    dt = jnp.diff(jnp.concatenate([jnp.zeros(1, jnp.float32), dates]))
    w = jnp.cumsum(z * jnp.sqrt(dt)[None, :, None], axis=1)
    vg = jnp.asarray(vols)[None, None, :]
    return (jnp.asarray(spots)[None, None, :]
            * jnp.exp((rate - dividend - 0.5 * vg * vg)
                      * dates[None, :, None] + vg * w))


def exposure_profile(book, *, horizon: float | None = None,
                     n_dates: int = 24, n_paths: int = 65536, seed: int = 0,
                     quantile: float = 0.95, netting: bool = True,
                     collateral_threshold: float | None = None,
                     mpor: float = 0.0, spot: float | None = None,
                     rate: float | None = None, vol: float | None = None,
                     dividend: float = 0.0,
                     corr=None) -> ExposureResult:
    """EE/EPE/PFE/ENE profile of a netting set on simulated GBM paths.

    ``book``: an :class:`~.portfolio.OptionsPortfolio` or list of
    :class:`~.portfolio.Position` (``option_type`` may also be
    ``"forward"``).  Risk-factor dynamics: risk-neutral GBM with
    ``vol`` (default: each position's own vol) — the measure under
    which EE* is the price of the exposure option, which is what CVA
    discounting needs.

    Multi-underlying netting sets: positions with distinct
    ``Position.underlying`` labels get their OWN correlated GBM factor
    (spot/vol from that underlying's first position; override the
    correlation with ``corr``, an (m, m) matrix in the order underlyings
    first appear — default identity).  Cross-underlying netting is where
    real CVA relief lives.

    ``collateral_threshold``: received-collateral threshold H; the
    counterparty posts (V - H)^+ observed ``mpor`` YEARS earlier (margin
    period of risk).  ``netting=False`` computes gross exposure
    sum_i (V_i)^+ instead of (sum_i V_i)^+.
    """
    pos = _positions(book)
    if not pos:
        raise ValidationError("exposure_profile needs a non-empty book")
    if not 0.0 < quantile < 1.0:
        raise ValidationError(f"quantile must be in (0,1): {quantile}")
    rate, horizon, u_idx, spots, vols, chol = _book_setup(
        pos, spot, rate, vol, corr, horizon)

    dates = jnp.linspace(horizon / n_dates, horizon, n_dates,
                         dtype=jnp.float32)
    lag = int(np.ceil(mpor / (horizon / n_dates) - 1e-9)) if mpor > 0 else 0

    @jax.jit
    def run(key):
        s_all = _sim_spots(key, n_paths, dates, spots, vols, chol, rate,
                           dividend)
        t_grid = dates[None, :]
        if netting:
            v = jnp.zeros((n_paths, n_dates), jnp.float32)
            for p in pos:
                v = v + _value_grid(s_all[:, :, u_idx[p.underlying]],
                                    t_grid, p, rate, dividend)
            vs = [v]
        else:
            vs = [_value_grid(s_all[:, :, u_idx[p.underlying]], t_grid, p,
                              rate, dividend) for p in pos]

        def exposed(v):
            if collateral_threshold is not None:
                v_lag = (v if lag == 0 else
                         jnp.concatenate([jnp.zeros((n_paths, lag), v.dtype),
                                          v[:, :-lag]], axis=1))
                coll = jnp.maximum(v_lag - collateral_threshold, 0.0)
                return v - coll
            return v

        e_pos = sum(jnp.maximum(exposed(v), 0.0) for v in vs)
        e_neg = sum(jnp.maximum(-exposed(v), 0.0) for v in vs)
        df = jnp.exp(-rate * dates)[None, :]
        return (jnp.mean(e_pos, axis=0), jnp.mean(df * e_pos, axis=0),
                jnp.mean(e_neg, axis=0), jnp.mean(df * e_neg, axis=0),
                jnp.quantile(e_pos, quantile, axis=0))

    ee, ee_d, ene, ene_d, pfe = (np.asarray(x) for x in
                                 run(jax.random.PRNGKey(seed)))
    return ExposureResult(
        dates=np.asarray(dates), ee=ee, ee_discounted=ee_d, ene=ene,
        ene_discounted=ene_d, pfe=pfe, quantile=quantile,
        epe=float(np.mean(ee)), max_pfe=float(pfe.max()), rate=rate,
        n_paths=n_paths)


def cva_dva(exposure: ExposureResult, hazard_rate: float,
            recovery: float = 0.4, own_hazard_rate: float | None = None,
            own_recovery: float = 0.4,
            funding_spread: float | None = None) -> dict:
    """CVA (and DVA when ``own_hazard_rate`` is given; and FVA when
    ``funding_spread`` is given) from a profile.

    Flat-hazard survival SP(t) = exp(-lambda t); trapezoid in discounted
    EE between date-grid points (t=0 contributes EE*(0)=exposure today,
    taken as the first grid value for a conservative short-end).

    FVA (symmetric, uncollateralized): the desk funds the uncollateral-
    ized mark at a flat spread s over OIS —
    FCA = s * int_0^T EE*(t) dt (cost of funding what they owe us),
    FBA = s * int_0^T ENE*(t) dt (benefit of holding what we owe them),
    FVA = FCA − FBA, trapezoid on the same grid. Survival adjustment is
    deliberately omitted (the common desk convention for a flat-spread
    quote; fold it in by passing a pre-multiplied effective spread).
    """
    if hazard_rate < 0 or recovery < 0 or recovery > 1:
        raise ValidationError("need hazard_rate >= 0 and recovery in [0,1]")
    t = np.concatenate([[0.0], exposure.dates])

    def leg(profile, lam, rec):
        sp = np.exp(-lam * t)
        dpd = sp[:-1] - sp[1:]
        prof = np.concatenate([[profile[0]], profile])
        mid = 0.5 * (prof[:-1] + prof[1:])
        return float((1.0 - rec) * np.sum(mid * dpd))

    out = {"cva": leg(exposure.ee_discounted, hazard_rate, recovery),
           "hazard_rate": hazard_rate, "recovery": recovery}
    if own_hazard_rate is not None:
        out["dva"] = leg(exposure.ene_discounted, own_hazard_rate,
                         own_recovery)
        out["bcva"] = out["cva"] - out["dva"]
    if funding_spread is not None:
        if funding_spread < 0:
            raise ValidationError("funding_spread must be >= 0")

        def time_integral(profile):
            prof = np.concatenate([[profile[0]], profile])
            mid = 0.5 * (prof[:-1] + prof[1:])
            return float(np.sum(mid * np.diff(t)))

        fca = funding_spread * time_integral(exposure.ee_discounted)
        fba = funding_spread * time_integral(exposure.ene_discounted)
        out.update(fca=fca, fba=fba, fva=fca - fba,
                   funding_spread=funding_spread)
    return out


def cva_allocation(book, hazard_rate: float, recovery: float = 0.4, *,
                   method: str = "euler", horizon: float | None = None,
                   n_dates: int = 24, n_paths: int = 65536, seed: int = 0,
                   spot: float | None = None, rate: float | None = None,
                   vol: float | None = None, dividend: float = 0.0,
                   corr=None) -> dict:
    """Per-trade CVA attribution for an (uncollateralized) netting set.

    ``method="euler"``: marginal allocation CVA_i built from the
    per-trade exposure contributions E[df 1{V>0} V_i].  Because
    (sum_i V_i)^+ = sum_i 1{V>0} V_i pathwise, Euler allocations sum to
    the total CVA EXACTLY (positive homogeneity) — asserted by the
    tests.  A negative allocation identifies a trade that HEDGES the
    netting set (it earns CVA relief at the margin).

    ``method="incremental"``: CVA(book) - CVA(book without trade i) on
    common random numbers (same key), the "what if we tear it up" view.
    Incremental allocations do NOT generally sum to the total.

    Returns {"total_cva", "allocations": [per trade], "method"}.
    """
    pos = _positions(book)
    if not pos:
        raise ValidationError("cva_allocation needs a non-empty book")
    if method not in ("euler", "incremental"):
        raise ValidationError(f"method must be euler|incremental: {method!r}")
    rate_, horizon_, u_idx, spots, vols, chol = _book_setup(
        pos, spot, rate, vol, corr, horizon)
    dates = jnp.linspace(horizon_ / n_dates, horizon_, n_dates,
                         dtype=jnp.float32)

    @jax.jit
    def contribs(key):
        s_all = _sim_spots(key, n_paths, dates, spots, vols, chol, rate_,
                           dividend)
        t_grid = dates[None, :]
        v_each = [_value_grid(s_all[:, :, u_idx[p.underlying]], t_grid, p,
                              rate_, dividend) for p in pos]
        v = sum(v_each)
        ind = (v > 0.0).astype(jnp.float32)
        df = jnp.exp(-rate_ * dates)[None, :]
        return [jnp.mean(df * ind * vi, axis=0) for vi in v_each]

    t = np.concatenate([[0.0], np.asarray(dates)])
    sp = np.exp(-hazard_rate * t)
    dpd = sp[:-1] - sp[1:]

    def leg(profile):
        prof = np.concatenate([[profile[0]], profile])
        return float((1.0 - recovery)
                     * np.sum(0.5 * (prof[:-1] + prof[1:]) * dpd))

    key = jax.random.PRNGKey(seed)
    per_trade = [np.asarray(c) for c in contribs(key)]
    total = leg(np.sum(per_trade, axis=0))
    if method == "euler":
        alloc = [leg(c) for c in per_trade]
    else:
        kw = dict(horizon=horizon_, n_dates=n_dates, n_paths=n_paths,
                  seed=seed, rate=rate_, dividend=dividend)
        alloc = []
        for i in range(len(pos)):
            rest = pos[:i] + pos[i + 1:]
            if rest:
                # note: corr ordering only survives if removing trade i
                # keeps the same underlying set; restrict to that case
                sub_unds = {p.underlying for p in rest}
                if corr is not None and len(sub_unds) != len(spots):
                    raise ValidationError(
                        "incremental allocation with corr requires every "
                        "underlying to appear in >= 2 trades")
                prof = exposure_profile(rest, corr=corr, **kw)
                cva_rest = cva_dva(prof, hazard_rate, recovery)["cva"]
            else:
                cva_rest = 0.0
            alloc.append(total - cva_rest)
    return {"total_cva": total, "allocations": alloc, "method": method,
            "trades": [f"{p.quantity:+g} {p.option_type} K={p.strike:g} "
                       f"T={p.maturity:g} ({p.underlying})" for p in pos]}


def cva_greeks(book, hazard_rate: float, recovery: float = 0.4, *,
               horizon: float | None = None, n_dates: int = 24,
               n_paths: int = 65536, seed: int = 0,
               spot: float | None = None, rate: float | None = None,
               vol: float | None = None, dividend: float = 0.0,
               corr=None) -> dict:
    """CVA sensitivities by AD through the WHOLE exposure simulation.

    The profile pipeline is pure JAX (exact GBM factors -> closed-form
    revaluation -> trapezoid credit leg), so one reverse sweep returns
    dCVA/dS0 per underlying (CVA delta), dCVA/dsigma per underlying
    (CVA vega), dCVA/dr, and dCVA/dlambda (CS01-style, per unit hazard)
    — common random numbers by construction.  The classic CPU XVA stack
    gets these by re-running the full simulation per bump.

    Exact oracle (tests): for a LONG option netting set EE*(t) = V0, so
    CVA = (1-R) V0 (1 - e^{-lambda T}) and every sensitivity is the BS
    Greek scaled by (1-R)(1 - e^{-lambda T}); dCVA/dlambda =
    (1-R) V0 T e^{-lambda T}.
    """
    pos = _positions(book)
    if not pos:
        raise ValidationError("cva_greeks needs a non-empty book")
    rate_, horizon_, u_idx, spots, vols, chol = _book_setup(
        pos, spot, rate, vol, corr, horizon)
    dates = jnp.linspace(horizon_ / n_dates, horizon_, n_dates,
                         dtype=jnp.float32)
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def cva_of(spots_v, vols_v, rate_v, lam):
        m = len(spots)
        z = jax.random.normal(key, (n_paths, n_dates, m), jnp.float32)
        z = jnp.einsum("pdm,km->pdk", z, jnp.asarray(chol))
        dt_g = jnp.diff(jnp.concatenate([jnp.zeros(1, jnp.float32), dates]))
        w = jnp.cumsum(z * jnp.sqrt(dt_g)[None, :, None], axis=1)
        vg = vols_v[None, None, :]
        s_all = (spots_v[None, None, :]
                 * jnp.exp((rate_v - dividend - 0.5 * vg * vg)
                           * dates[None, :, None] + vg * w))
        t_grid = dates[None, :]
        v = jnp.zeros((n_paths, n_dates), jnp.float32)
        base_vols = jnp.asarray(vols)
        for p in pos:
            i = u_idx[p.underlying]
            v = v + _value_grid(s_all[:, :, i], t_grid, p, rate_v, dividend,
                                vol_shift=vols_v[i] - base_vols[i])
        df = jnp.exp(-rate_v * dates)[None, :]
        ee_star = jnp.mean(df * jnp.maximum(v, 0.0), axis=0)
        t_full = jnp.concatenate([jnp.zeros(1, jnp.float32), dates])
        sp = jnp.exp(-lam * t_full)
        dpd = sp[:-1] - sp[1:]
        prof = jnp.concatenate([ee_star[:1], ee_star])
        return (1.0 - recovery) * jnp.sum(
            0.5 * (prof[:-1] + prof[1:]) * dpd)

    args = (jnp.asarray(spots), jnp.asarray(vols), jnp.float32(rate_),
            jnp.float32(hazard_rate))
    cva_val, grads = jax.value_and_grad(cva_of, argnums=(0, 1, 2, 3))(*args)
    unds = list(u_idx)
    return {
        "cva": float(cva_val),
        "cva_delta": {u: float(grads[0][i]) for i, u in enumerate(unds)},
        "cva_vega": {u: float(grads[1][i]) for i, u in enumerate(unds)},
        "cva_rho": float(grads[2]),
        "cva_hazard_sens": float(grads[3]),
    }


def cva_wwr(book, hazard_rate: float, recovery: float = 0.4, *,
            wwr_beta: float = 0.0, horizon: float | None = None,
            n_dates: int = 24, n_paths: int = 65536, seed: int = 0,
            spot: float | None = None, rate: float | None = None,
            vol: float | None = None, dividend: float = 0.0,
            corr=None) -> dict:
    """CVA with WRONG-WAY RISK: the default intensity rides the equity
    factor, lambda_t = lambda0 · (S_t/S_0)^{-beta} (equity sells off ->
    credit deteriorates; Hull-White style intensity mapping).  Survival
    becomes PATH-DEPENDENT, SP_t = exp(-sum lambda_s dt), and

        CVA = (1-R) · E[ sum_j df_j E_j (SP_{j-1} - SP_j) ]

    couples exposure and default pathwise — the cross-term a profile-
    based CVA cannot see.  beta > 0 is wrong-way for long-call netting
    sets (exposure high exactly when default is likely... no: exposure
    high when S is HIGH while default likely when S is LOW — that is
    RIGHT-way for calls; puts/short-forwards get the wrong-way sign).

    ``beta=0`` reduces EXACTLY to the profile CVA on the same paths
    (asserted by the tests).  The first underlying's factor drives the
    intensity.  Returns {"cva", "cva_beta0", "wwr_ratio"}.
    """
    pos = _positions(book)
    if not pos:
        raise ValidationError("cva_wwr needs a non-empty book")
    rate_, horizon_, u_idx, spots, vols, chol = _book_setup(
        pos, spot, rate, vol, corr, horizon)
    dates = jnp.linspace(horizon_ / n_dates, horizon_, n_dates,
                         dtype=jnp.float32)
    dt = horizon_ / n_dates

    @jax.jit
    def run(key, beta):
        s_all = _sim_spots(key, n_paths, dates, spots, vols, chol, rate_,
                           dividend)
        t_grid = dates[None, :]
        v = jnp.zeros((n_paths, n_dates), jnp.float32)
        for p in pos:
            v = v + _value_grid(s_all[:, :, u_idx[p.underlying]], t_grid,
                                p, rate_, dividend)
        e = jnp.maximum(v, 0.0)
        lam = hazard_rate * (s_all[:, :, 0] / spots[0]) ** (-beta)
        cum = jnp.cumsum(lam * dt, axis=1)
        sp = jnp.exp(-cum)                        # SP at the date grid
        sp_prev = jnp.concatenate(
            [jnp.ones((n_paths, 1), jnp.float32), sp[:, :-1]], axis=1)
        df = jnp.exp(-rate_ * dates)[None, :]
        return (1.0 - recovery) * jnp.mean(
            jnp.sum(df * e * (sp_prev - sp), axis=1))

    key = jax.random.PRNGKey(seed)
    cva_b = float(run(key, jnp.float32(wwr_beta)))
    cva_0 = float(run(key, jnp.float32(0.0)))
    return {"cva": cva_b, "cva_beta0": cva_0,
            "wwr_ratio": cva_b / max(cva_0, 1e-12),
            "wwr_beta": wwr_beta}


def xva_report(book, *, hazard_rate: float = 0.02, recovery: float = 0.4,
               own_hazard_rate: float | None = None,
               funding_spread: float | None = None,
               **exposure_kwargs) -> dict:
    """One-call exposure profile + CVA/DVA (+ FVA) summary for a
    netting set."""
    prof = exposure_profile(book, **exposure_kwargs)
    adj = cva_dva(prof, hazard_rate, recovery, own_hazard_rate,
                  funding_spread=funding_spread)
    return {**prof.to_dict(), **adj}
