"""Counterparty exposure under HESTON stochastic volatility.

Extends :mod:`.exposure` (GBM factors, closed-form revaluation) to
stochastic-vol dynamics — the case where flat-vol exposure materially
understates PFE: high-variance states inflate BOTH the spot dispersion
and every option's mark.

TPU-first design, no nested simulation: the joint (S_t, v_t) state is
simulated by Andersen-QE date transitions (the near-unbiased scheme,
shared with :mod:`..models.heston_american`), and revaluation uses the
HOMOGENEITY of the Heston vanilla price — C(S, K, v, tau) =
K · c(log(S/K), v, tau) — so one Lewis-CF sweep per variance node
precomputes a (position, date, v, x) normalized-price table and every
(path, date) mark is a bilinear read.  Total CF work is
O(n_v · n_pos · n_dates · n_x), independent of the path count; the
classic XVA stack nests a pricer call per (path, date).

Exact oracles (tests): a LONG option's discounted EE equals its time-0
Lewis price at EVERY date (martingale pricing survives stochastic vol —
the mark IS the conditional expectation); the sigma_v -> 0, v0 = theta
limit reproduces the GBM engine; CVA of a long option =
(1-R) V0 (1 - e^{-lambda T}).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.heston import HestonParams, heston_price
from ..types import ContractBatch
from ..utils.exceptions import ValidationError
from .exposure import ExposureResult, _positions

__all__ = ["heston_exposure_profile"]


def _bilinear(table, x, v, x0, dx, v0_, dv):
    """Uniform-grid bilinear read of ``table`` (n_v, n_x) at (x, v),
    clamped to the edges."""
    n_v, n_x = table.shape
    fx = jnp.clip((x - x0) / dx, 0.0, n_x - 1.001)
    fv = jnp.clip((v - v0_) / dv, 0.0, n_v - 1.001)
    ix = fx.astype(jnp.int32)
    iv = fv.astype(jnp.int32)
    wx = fx - ix
    wv = fv - iv
    t00 = table[iv, ix]
    t01 = table[iv, ix + 1]
    t10 = table[iv + 1, ix]
    t11 = table[iv + 1, ix + 1]
    return ((1 - wv) * ((1 - wx) * t00 + wx * t01)
            + wv * ((1 - wx) * t10 + wx * t11))


def heston_exposure_profile(book, params: HestonParams, *,
                            horizon: float | None = None, n_dates: int = 16,
                            n_sub: int = 4, n_paths: int = 32_768,
                            seed: int = 0, quantile: float = 0.95,
                            netting: bool = True, spot: float | None = None,
                            rate: float | None = None,
                            n_x: int = 81, n_v: int = 24,
                            x_half_width: float = 2.0) -> ExposureResult:
    """EE/EPE/PFE/ENE profile of a single-underlying netting set under
    Heston dynamics, with smile-consistent CF revaluation.

    ``book``: list of :class:`~.portfolio.Position` /
    ``OptionsPortfolio`` on ONE underlying (calls/puts/forwards; each
    position's ``vol`` field is ignored — the model prices the mark).
    """
    pos = _positions(book)
    if not pos:
        raise ValidationError("heston_exposure_profile needs a non-empty book")
    if len({p.underlying for p in pos}) > 1:
        raise ValidationError("Heston exposure supports one underlying "
                              "(one (S, v) state); split the netting set")
    if not 0.0 < quantile < 1.0:
        raise ValidationError(f"quantile must be in (0,1): {quantile}")
    params.validate()
    p0 = pos[0]
    spot = float(p0.spot if spot is None else spot)
    rate = float(p0.rate if rate is None else rate)
    horizon = float(horizon if horizon is not None
                    else max(p.maturity for p in pos))
    if horizon <= 0:
        raise ValidationError("horizon must be positive")

    from ..models.heston_american import _simulate_dates

    s_paths, v_paths = _simulate_dates(
        jax.random.PRNGKey(seed), spot, params, rate, horizon, n_dates,
        n_sub, n_paths)
    s_paths = s_paths[1:]   # (n_dates, n_paths); profile excludes t=0
    v_paths = v_paths[1:]
    dates = np.linspace(horizon / n_dates, horizon, n_dates)
    dt = horizon / n_dates

    # --- normalized-price tables: c(x, v; tau) per (position, date) ----
    x0, dx = -x_half_width, 2.0 * x_half_width / (n_x - 1)
    x_grid = np.linspace(-x_half_width, x_half_width, n_x)
    v_cap = 6.0 * max(float(np.asarray(params.theta)),
                      float(np.asarray(params.v0)))
    # the table is indexed by u = sqrt(v): vanilla prices are near-LINEAR
    # in vol, so interpolation error drops by an order of magnitude vs a
    # uniform-v grid at the same node count
    u_cap = np.sqrt(v_cap)
    v_lo, dv = 0.0, u_cap / (n_v - 1)   # grid coords in u-space
    u_grid = np.linspace(0.0, u_cap, n_v)
    v_grid = u_grid ** 2

    # option positions get a CF table; forwards are closed-form
    opts = [p for p in pos if p.option_type != "forward"]
    tables = None
    if opts:
        taus, cps = [], []
        for p in opts:
            for t in dates:
                taus.append(max(p.maturity - t, 1e-6))
                cps.append(1.0 if p.option_type == "call" else -1.0)
        taus = np.asarray(taus)          # (n_opt*n_dates,)
        cps = np.asarray(cps)
        batch = ContractBatch.make(
            spot=np.exp(np.tile(x_grid, len(taus))),
            strike=1.0,
            maturity=np.repeat(taus, n_x),
            rate=rate, vol=0.2,
            option_type=np.repeat(cps, n_x))
        rows = []
        # the Heston CF has an f32 cancellation at small sigma_v (terms
        # carry 1/sigma^2); the table is a host-side precompute, so build
        # it at the widest enabled precision (f64 under x64)
        tdt = jnp.result_type(float)
        for v0_node in v_grid:  # n_v Lewis sweeps, each one fused launch
            pv = HestonParams.make(
                v0=max(float(v0_node), 1e-6),
                kappa=float(np.asarray(params.kappa)),
                theta=float(np.asarray(params.theta)),
                sigma=float(np.asarray(params.sigma)),
                rho=float(np.asarray(params.rho)), dtype=tdt)
            rows.append(np.asarray(heston_price(batch, pv)))
        # (n_v, n_opt, n_dates, n_x)
        tables = np.stack(rows).reshape(n_v, len(opts), n_dates, n_x)
        # tau ~ 0 slices: the CF quadrature degrades — overwrite with
        # intrinsic (the correct expiry-date mark)
        intr = np.maximum(cps[:, None] * (np.exp(x_grid)[None, :] - 1.0),
                          0.0).reshape(len(opts), n_dates, n_x)
        tiny = (taus < 2e-6).reshape(len(opts), n_dates)
        tables = np.where(tiny[None, :, :, None], intr[None], tables)
        tables = jnp.asarray(tables, jnp.float32)

    dates_j = jnp.asarray(dates, jnp.float32)

    def _mark_one(p, oi, s_all, v_all):
        """(paths, dates) mark of one position (oi: its table index);
        the variance axis is read in u = sqrt(v) coordinates."""
        alive = (p.maturity - dates_j[None, :]) > -1e-9
        if p.option_type == "forward":
            tau = jnp.maximum(p.maturity - dates_j, 1e-8)[None, :]
            val = s_all - p.strike * jnp.exp(-rate * tau)
        else:
            xq = jnp.log(jnp.maximum(s_all, 1e-12) / p.strike)
            uq = jnp.sqrt(jnp.maximum(v_all, 0.0))
            val = jnp.stack([
                _bilinear(tables[:, oi, j], xq[:, j], uq[:, j],
                          x0, dx, v_lo, dv)
                for j in range(n_dates)], axis=1) * p.strike
        return p.quantity * jnp.where(alive, val, 0.0)

    @jax.jit
    def all_marks(s_all, v_all):
        out, oi = [], 0
        for p in pos:
            out.append(_mark_one(p, oi, s_all, v_all))
            if p.option_type != "forward":
                oi += 1
        return out

    s_t = jnp.transpose(s_paths)  # (n_paths, n_dates)
    v_t = jnp.transpose(v_paths)
    per = all_marks(s_t, v_t)
    vals = [sum(per)] if netting else per

    df = jnp.exp(-rate * dates_j)[None, :]
    e_pos = sum(jnp.maximum(v, 0.0) for v in vals)
    e_neg = sum(jnp.maximum(-v, 0.0) for v in vals)
    ee = np.asarray(jnp.mean(e_pos, axis=0))
    ee_d = np.asarray(jnp.mean(df * e_pos, axis=0))
    ene = np.asarray(jnp.mean(e_neg, axis=0))
    ene_d = np.asarray(jnp.mean(df * e_neg, axis=0))
    pfe = np.asarray(jnp.quantile(e_pos, quantile, axis=0))
    return ExposureResult(
        dates=dates, ee=ee, ee_discounted=ee_d, ene=ene,
        ene_discounted=ene_d, pfe=pfe, quantile=quantile,
        epe=float(np.mean(ee)), max_pfe=float(pfe.max()), rate=rate,
        n_paths=n_paths)
