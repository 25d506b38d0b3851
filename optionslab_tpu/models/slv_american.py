"""Certified [lower, upper] bracket for American puts under STOCHASTIC
LOCAL VOL — completing the certification family (GBM ~2e-5, local vol
~1e-3, Heston ~1e-3, Bates, multi-asset) with the model exotics desks
actually book on.

Architecture = the Heston ``method="lsm"`` bracket
(``models/heston_american.py``) on the SLV transition law:

- the particle-calibrated leverage rows (``models/slv.
  slv_calibrate_leverage``) are computed ONCE with one row per MC
  substep and then FROZEN — every pipeline (LSM policy fit, lower
  bound, dual upper bound, inner conditional-mean sims) samples the
  identical Euler + leverage-interpolation law, which is what makes
  the Andersen–Broadie/Glasserman duality argument valid. The bracket
  therefore certifies the Bermudan value of the frozen-leverage
  Euler-SLV model on the date grid (leverage-recalibration model risk
  is a different axis, marked by the ``mixing`` spread instead);
- LSM regressions ride the SAME (S, v) feature bases as the Heston
  bracket (the state space is identical; only the law differs) via the
  shared ``_fit_lsm_from_paths`` / ``_exercise_now`` /
  ``_surface_value`` helpers;
- continuous-exercise pad: the model-independent interest-on-strike
  bound Am <= Berm_n + K·(1 − e^{−rT/n}).

The reference has no SLV and no American machinery beyond a flat-vol
binomial (``src/pricing_models/binomial_tree.py``); this module is
beyond-reference capability held to the repo's certification standard.

Oracles (tests/test_slv_american.py): mixing → 0 on a FLAT surface with
v0 = theta collapses the law to EXACT constant-vol log-Euler (leverage
is exactly 1), so the bracket must agree with the independent GBM
grid-dual certificate (``models/american.american_price_interval``) —
a true cross-machinery check; on the smile at mixing 1 the bracket must
contain its own out-of-sample policy value and sit above the European
SLV price.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.exceptions import ValidationError
from .heston import HestonParams
from .heston_american import (_exercise_now, _fit_lsm_from_paths,
                              _surface_value)
from .local_vol import DupireLocalVol, LocalVolSurface
from .slv import slv_calibrate_leverage

__all__ = ["slv_american_bracket", "fit_slv_lsm"]


def _dyn(params, mixing, rate, dividend, maturity, n_dates, n_sub):
    f32 = jnp.float32
    a = lambda x: jnp.asarray(x, f32)  # noqa: E731 — traced-safe cast
    dt = a(maturity) / (n_dates * n_sub)
    rho = a(params.rho)
    return (a(params.kappa), a(params.theta), a(mixing) * a(params.sigma),
            rho, jnp.sqrt(jnp.maximum(1.0 - rho * rho, 0.0)),
            (a(rate) - a(dividend)) * dt, dt, jnp.sqrt(dt))


def _slv_apply(x, v, zv, zo, dyn, x_row, l_row):
    """One full-truncation Euler substep of (x = log(S/S0), v) under the
    frozen leverage row — THE single transition-law implementation every
    pipeline (fit / lower / dual inner) routes through."""
    kap, th, sig, rho, srho, mu_dt, dt, sqdt = dyn
    vp = jnp.maximum(v, 0.0)
    sq = jnp.sqrt(vp)
    lev = jnp.interp(x, x_row, l_row)
    sigx = lev * sq
    zx = rho * zv + srho * zo
    x_new = x + mu_dt - 0.5 * sigx * sigx * dt + sigx * sqdt * zx
    v_new = v + kap * (th - vp) * dt + sig * sq * sqdt * zv
    return x_new, v_new


def _date_step(x, v, key, dyn, x_rows, l_rows, d, n_sub: int):
    """One exercise-date transition = n_sub substeps, antithetic within
    the path axis is the CALLER's concern (plain draws here)."""
    def body(carry, j):
        xx, vv = carry
        i = (d - 1) * n_sub + j
        z = jax.random.normal(jax.random.fold_in(key, j),
                              (2,) + xx.shape, jnp.float32)
        xx, vv = _slv_apply(xx, vv, z[0], z[1], dyn, x_rows[i], l_rows[i])
        return (xx, vv), None

    (x, v), _ = lax.scan(body, (x, v), jnp.arange(n_sub))
    return x, v


@functools.partial(jax.jit, static_argnames=("n_dates", "n_sub", "n_paths"))
def _simulate_dates(key, spot, params, mixing, rate, dividend, maturity,
                    x_rows, l_rows, n_dates, n_sub, n_paths):
    """Antithetic (S, v) at every exercise date: (n_dates+1, n_paths)."""
    f32 = jnp.float32
    dyn = _dyn(params, mixing, rate, dividend, maturity, n_dates, n_sub)
    half = n_paths // 2

    def body(carry, d):
        x, v = carry
        kk = jax.random.fold_in(key, d)

        def sub(c2, j):
            (xa, va), (xb, vb) = c2
            i = (d - 1) * n_sub + j
            z = jax.random.normal(jax.random.fold_in(kk, j), (2, half), f32)
            xa, va = _slv_apply(xa, va, z[0], z[1], dyn,
                                x_rows[i], l_rows[i])
            xb, vb = _slv_apply(xb, vb, -z[0], -z[1], dyn,
                                x_rows[i], l_rows[i])
            return ((xa, va), (xb, vb)), None

        n = x.shape[0] // 2
        ((xa, va), (xb, vb)), _ = lax.scan(
            sub, ((x[:n], v[:n]), (x[n:], v[n:])), jnp.arange(n_sub))
        x = jnp.concatenate([xa, xb])
        v = jnp.concatenate([va, vb])
        return (x, v), (x, v)

    x0 = jnp.zeros((half * 2,), f32)
    v0 = jnp.full((half * 2,), f32(params.v0))
    (_, _), (xs, vs) = lax.scan(body, (x0, v0), jnp.arange(1, n_dates + 1))
    xs = jnp.concatenate([x0[None], xs], axis=0)
    vs = jnp.concatenate([v0[None], vs], axis=0)
    return spot * jnp.exp(xs), vs


def fit_slv_lsm(spot, strike, maturity, rate, params: HestonParams, key,
                x_rows, l_rows, cp: float = -1.0, mixing: float = 1.0,
                dividend: float = 0.0, n_dates: int = 25, n_sub: int = 4,
                n_paths: int = 100_000):
    """LSM policy + value-surface regressions on SLV paths (the shared
    transition-agnostic backward induction of ``heston_american``).
    Returns (policy_coefs, surface_coefs)."""
    if cp > 0:
        raise ValidationError("bracket supports puts (cp=-1) only")
    s_paths, v_paths = _simulate_dates(
        key, float(spot), jax.tree.map(jnp.float32, params), mixing,
        float(rate), float(dividend), float(maturity), x_rows, l_rows,
        n_dates, n_sub, n_paths)
    return _fit_lsm_from_paths(s_paths, v_paths, strike, maturity, rate,
                               cp, n_dates)


@functools.partial(jax.jit, static_argnames=("n_dates", "n_sub", "n_paths"))
def _lower_pipeline(coefs, key, spot, strike, maturity, rate, dividend,
                    params, mixing, x_rows, l_rows, cp, n_dates, n_sub,
                    n_paths):
    s_paths, v_paths = _simulate_dates(key, spot, params, mixing, rate,
                                       dividend, maturity, x_rows, l_rows,
                                       n_dates, n_sub, n_paths)
    dt = maturity / n_dates

    def body(carry, d):
        alive, cash = carry
        ex, take = _exercise_now(coefs, d, s_paths[d], v_paths[d], strike,
                                 cp, n_dates, "poly")
        pay_now = alive & take
        cash = jnp.where(pay_now, jnp.exp(-rate * dt * d) * ex, cash)
        return (alive & ~take, cash), None

    alive0 = jnp.ones(s_paths.shape[1], bool)
    (_, cash), _ = lax.scan(body, (alive0, jnp.zeros(s_paths.shape[1])),
                            jnp.arange(1, n_dates + 1))
    return cash.mean(), cash.std(ddof=1) / jnp.sqrt(1.0 * cash.shape[0])


@functools.partial(jax.jit, static_argnames=("n_dates", "n_sub", "n_outer",
                                             "n_inner", "kind",
                                             "with_lower"))
def _upper_pipeline(coefs, key, spot, strike, maturity, rate, dividend,
                    params, mixing, x_rows, l_rows, cp, n_dates, n_sub,
                    n_outer, n_inner, kind="poly", with_lower=False):
    """Value-surface dual upper bound (Glasserman ch. 8 construction —
    see ``heston_american._upper_pipeline`` for the full argument; the
    inner conditional means use one-date antithetic SLV transitions of
    the SAME frozen-leverage law). ``kind="grid"`` reads the SLV
    Bermudan-ADI continuation slices instead of regression surfaces;
    ``with_lower=True`` additionally returns the MARTINGALE-CONTROLLED
    lower bound on the same outer paths (Rasmussen construction — see
    heston_american), collapsing both stderrs to dual-gap scale."""
    f32 = jnp.float32
    dt = maturity / n_dates
    dyn = _dyn(params, mixing, rate, dividend, maturity, n_dates, n_sub)
    k_outer, k_dual = jax.random.split(jax.random.fold_in(key, 7))
    s_out, v_out = _simulate_dates(k_outer, spot, params, mixing, rate,
                                   dividend, maturity, x_rows, l_rows,
                                   n_dates, n_sub, n_outer)
    half = n_inner // 2

    def _date_step_anti(x, v, k, key_tr):
        def sub(carry, j):
            (xa, va), (xb, vb) = carry
            i = (k - 1) * n_sub + j
            z = jax.random.normal(jax.random.fold_in(key_tr, j),
                                  (2, x.shape[0], half), f32)
            xa, va = _slv_apply(xa, va, z[0], z[1], dyn,
                                x_rows[i], l_rows[i])
            xb, vb = _slv_apply(xb, vb, -z[0], -z[1], dyn,
                                x_rows[i], l_rows[i])
            return ((xa, va), (xb, vb)), None

        ((xa, va), (xb, vb)), _ = lax.scan(sub, ((x, v), (x, v)),
                                           jnp.arange(n_sub))
        return (jnp.concatenate([xa, xb], axis=1),
                jnp.concatenate([va, vb], axis=1))

    def dual_body(carry, k):
        m_prev, best, alive, low = carry
        dfk = jnp.exp(-rate * dt * k)
        vk = dfk * _surface_value(coefs, k, s_out[k], v_out[k], strike, cp,
                                  n_dates, kind)
        x_prev = jnp.broadcast_to(jnp.log(s_out[k - 1] / spot)[:, None],
                                  (n_outer, half))
        v_prev = jnp.broadcast_to(v_out[k - 1][:, None], (n_outer, half))
        x_tr, v_tr = _date_step_anti(x_prev, v_prev, k,
                                     jax.random.fold_in(k_dual, k))
        v_in = _surface_value(coefs, k, spot * jnp.exp(x_tr), v_tr, strike,
                              cp, n_dates, kind)
        t2 = dfk * v_in.mean(axis=1)
        m_k = m_prev + vk - t2
        ex_k = jnp.maximum(cp * (s_out[k] - strike), 0.0)
        cand = dfk * ex_k - m_k
        best = jnp.maximum(best, cand)
        if with_lower:
            # stopping time depends only on the OUTER state: cand at the
            # stop is the martingale-controlled policy estimator
            _, take = _exercise_now(coefs, k, s_out[k], v_out[k], strike,
                                    cp, n_dates, kind)
            pay_now = alive & take
            low = jnp.where(pay_now, cand, low)
            alive = alive & ~take
        return (m_k, best, alive, low), None

    ex0 = jnp.full((n_outer,),
                   jnp.maximum(cp * (spot - strike), 0.0).astype(f32))
    zeros = jnp.zeros((n_outer,), f32)
    (m_n, best, alive, low), _ = lax.scan(
        dual_body, (zeros, ex0, jnp.ones((n_outer,), bool), zeros),
        jnp.arange(1, n_dates + 1))
    up = (best.mean(), best.std(ddof=1) / jnp.sqrt(1.0 * n_outer))
    if not with_lower:
        return up
    low = jnp.where(alive, -m_n, low)
    return up + (low.mean(), low.std(ddof=1) / jnp.sqrt(1.0 * n_outer))


def slv_american_bracket(dupire, params: HestonParams, strike, maturity,
                         cp: float = -1.0, mixing: float = 1.0,
                         n_dates: int = 25, n_sub: int = 4,
                         n_fit: int = 100_000, n_lower: int = 200_000,
                         n_outer: int = 512, n_inner: int = 2048,
                         n_cal_paths: int = 131_072, n_bins: int = 31,
                         seed: int = 0, method: str = "adi",
                         n_x: int = 161, n_v: int = 81,
                         steps_per_date: int = 8) -> dict:
    """Certified Bermudan bracket under stochastic local vol, plus the
    rigorous continuous-exercise pad.

    ``dupire`` is a calibrated :class:`~.local_vol.DupireLocalVol` (or a
    bare :class:`~.local_vol.LocalVolSurface`); ``params`` the Heston
    dynamics; ``mixing`` the vol-of-vol knob. Returns {lower, lower_se,
    upper, upper_se, width, pad, continuous_upper, n_dates, mixing}: the
    frozen-leverage Euler-Bermudan value on the date grid lies in
    [lower, upper] up to the quoted stderrs; continuous_upper adds
    K·(1 − e^{−rT/n}).

    ``method``:

    - ``"adi"`` (default): the SLV Bermudan-ADI continuation slices
      (:func:`~.heston_fdm._slv_adi_bermudan` — the leverage enters the
      x-diffusion per time step from the SAME frozen rows the MC
      replays) drive policy + dual + a martingale control variate for
      the lower bound, the construction that took the Heston bracket
      from ~0.05 to ~1e-3. ``n_fit``/``n_lower`` are unused.
    - ``"lsm"``: regression surfaces (the round-3 pipeline; width a few
      cents).
    """
    if cp > 0:
        raise ValidationError("bracket supports puts (cp=-1) only — an "
                              "American call pays no early-exercise "
                              "premium without dividends")
    if isinstance(dupire, DupireLocalVol):
        sf = dupire.surface
    elif isinstance(dupire, LocalVolSurface):
        sf = dupire
    else:
        sf = dupire.surface
    # one leverage row per MC substep: every pipeline replays the
    # identical frozen-leverage law (duality prerequisite)
    x_rows, l_rows = slv_calibrate_leverage(
        sf.spot, float(maturity), sf.rate, params, jax.random.PRNGKey(seed),
        sf.k_grid, sf.t_grid, sf.grid, dividend=sf.dividend, mixing=mixing,
        n_paths=n_cal_paths, n_steps=n_dates * n_sub, n_bins=n_bins)
    if method not in ("lsm", "adi"):
        raise ValidationError(f"method must be 'lsm' or 'adi', got {method!r}")
    key = jax.random.PRNGKey(seed + 1)
    kf, kl, ku = jax.random.split(key, 3)
    par32 = jax.tree.map(jnp.float32, params)
    extra = {}
    if method == "adi":
        from .heston_fdm import _slv_adi_bermudan

        price0, cont_all, x_lo, dx, dxi, c_v = _slv_adi_bermudan(
            float(sf.spot), float(strike), float(maturity), float(sf.rate),
            float(sf.dividend), float(cp), par32, float(mixing), x_rows,
            l_rows, n_x, n_v, n_dates, steps_per_date)
        surf = (cont_all, x_lo, dx, dxi, c_v)
        extra["adi_bermudan"] = float(price0)
        up, up_se, lo, lo_se = (float(a) for a in _upper_pipeline(
            surf, ku, float(sf.spot), float(strike), float(maturity),
            float(sf.rate), float(sf.dividend), par32, float(mixing),
            x_rows, l_rows, float(cp), n_dates, n_sub, n_outer, n_inner,
            kind="grid", with_lower=True))
    else:
        pol, sur = fit_slv_lsm(sf.spot, strike, maturity, sf.rate, params,
                               kf, x_rows, l_rows, cp=cp, mixing=mixing,
                               dividend=sf.dividend, n_dates=n_dates,
                               n_sub=n_sub, n_paths=n_fit)
        lo, lo_se = (float(a) for a in _lower_pipeline(
            pol, kl, float(sf.spot), float(strike), float(maturity),
            float(sf.rate), float(sf.dividend), par32, float(mixing),
            x_rows, l_rows, float(cp), n_dates, n_sub, n_lower))
        up, up_se = (float(a) for a in _upper_pipeline(
            sur, ku, float(sf.spot), float(strike), float(maturity),
            float(sf.rate), float(sf.dividend), par32, float(mixing),
            x_rows, l_rows, float(cp), n_dates, n_sub, n_outer, n_inner))
    pad = max(float(strike) * (1.0 - math.exp(
        -float(sf.rate) * float(maturity) / n_dates)), 0.0)
    return {"lower": lo, "lower_se": lo_se, "upper": up, "upper_se": up_se,
            "width": up - lo, "pad": pad, "continuous_upper": up + pad,
            "n_dates": n_dates, "mixing": float(mixing), "method": method,
            **extra}
