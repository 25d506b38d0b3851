"""Certified [lower, upper] bracket for American options under Dupire
local volatility.

Completes the certification family — GBM (``models/american.py``, width
~2e-5), Heston (``models/heston_american.py``, width ~1e-3) — with the
smile-consistent model every desk actually hedges on. The reference has
no American machinery under local vol at all (its ``local_vol.py``
prices European vanillas by explicit FDM, ``src/pricing_models/
local_vol.py:181-262``).

Same architecture as the Heston ``method="adi"`` bracket:

- a BERMUDAN theta-scheme solve through the calibrated σ(S, t) surface,
  obstacle projection ONLY at the ``n_dates`` exercise grid, recording
  the 1-D continuation slice at each date;
- those near-exact slices drive (a) the exercise policy, (b) the dual
  martingale surface (Glasserman value-function duality), and (c) the
  martingale CONTROL VARIATE for the lower bound — df·ex_τ − M̂_τ is
  unbiased by optional stopping because the inner one-date estimates
  are conditionally unbiased, making M̂ a true martingale of the joint
  filtration;
- MC dynamics: log-Euler with ``n_sub`` substeps per date under the
  SAME σ(S, t) lookup as the PDE — both bounds sample one discretized
  measure, so the bracket certifies the Euler-Bermudan value on that
  grid (substeps push the scheme bias well below the quoted stderrs);
- continuous-exercise pad: the model-independent interest-on-strike
  bound Am ≤ Berm_n + K·(1 − e^{−rT/n}).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.config import EPS_TIME
from ..utils.exceptions import ValidationError
from .local_vol import DupireLocalVol, _bilinear

__all__ = ["local_vol_american_bracket", "lv_bermudan_slices"]


def _sigma_at(k_grid, t_grid, vol_grid, spot, rate, dividend, s, t):
    """σ_loc lookup in forward log-moneyness — the single definition
    shared by the PDE and the MC (they MUST sample one surface)."""
    fwd = spot * jnp.exp((rate - dividend) * t)
    kq = jnp.log(jnp.maximum(s, 1e-12) / fwd)
    return _bilinear(k_grid, t_grid, vol_grid, kq, t)


@functools.partial(jax.jit, static_argnames=("n_dates", "steps_per_date",
                                             "n_space"))
def lv_bermudan_slices(k_grid, t_grid, vol_grid, spot, rate, dividend,
                       strike, maturity, cp, n_dates: int,
                       steps_per_date: int = 8, n_space: int = 401):
    """Bermudan theta-scheme solve through σ(S, t), projecting only at
    the ``n_dates`` exercise dates. Returns ``(price0, cont_all, x)``:
    ``cont_all`` is (n_dates+1, n_space) continuation values in FORWARD
    date index (entry 0 unused, entry n_dates zero), ``x`` the log-spot
    nodes (uniform; spot sits mid-grid)."""
    from ..ops.tridiag import tridiag_solve

    f32 = jnp.float32
    strike = jnp.asarray(strike, f32)
    t_total = jnp.maximum(jnp.asarray(maturity, f32), EPS_TIME)
    cp = jnp.asarray(cp, f32)
    spd = steps_per_date
    n_time = n_dates * spd

    sig_of = functools.partial(_sigma_at, k_grid, t_grid, vol_grid, spot,
                               rate, dividend)
    atm_vol = sig_of(jnp.asarray(spot, f32), 0.5 * t_total)
    half = 6.0 * jnp.maximum(atm_vol, 0.1) * jnp.sqrt(t_total)
    x = lax.stop_gradient(jnp.log(spot)
                          + jnp.linspace(-1.0, 1.0, n_space,
                                         dtype=f32) * half)
    dx = x[1] - x[0]
    s_nodes = jnp.exp(x)
    dt = t_total / n_time
    intrinsic = jnp.maximum(cp * (s_nodes - strike), 0.0)

    def step(v, i):
        tau = t_total - (i + 0.5) * dt
        sig = sig_of(s_nodes, jnp.maximum(tau, 1e-4))
        sig2 = sig * sig
        mu = rate - dividend - 0.5 * sig2
        a = 0.5 * sig2 / dx**2 - 0.5 * mu / dx
        b = -sig2 / dx**2 - rate
        c = 0.5 * sig2 / dx**2 + 0.5 * mu / dx
        lo = (-dt * a).at[0].set(0.0).at[-1].set(0.0)
        di = (1.0 - dt * b).at[0].set(1.0).at[-1].set(1.0)
        up = (-dt * c).at[0].set(0.0).at[-1].set(0.0)
        tau_exp = (i + 1.0) * dt
        # deep boundaries: European put floor / forward call (AMERICAN
        # deep-ITM put boundary floors at intrinsic)
        vlo = jnp.where(cp > 0, 0.0,
                        jnp.maximum(strike * jnp.exp(-rate * tau_exp)
                                    - s_nodes[0], intrinsic[0]))
        vhi = jnp.where(cp > 0, s_nodes[-1] * jnp.exp(-dividend * tau_exp)
                        - strike * jnp.exp(-rate * tau_exp), 0.0)
        rhs = v.at[0].set(jnp.maximum(vlo, 0.0)).at[-1].set(
            jnp.maximum(vhi, 0.0))
        return tridiag_solve(lo, di, up, rhs)

    def run_block(v, b):
        def inner(v2, j):
            return step(v2, b * spd + j), None

        v, _ = lax.scan(inner, v, jnp.arange(spd, dtype=f32))
        return v

    def block(v, b):
        v = run_block(v, b)
        cont = v
        return jnp.maximum(v, intrinsic), cont

    v, conts = lax.scan(block, intrinsic,
                        jnp.arange(n_dates - 1, dtype=f32))
    v = run_block(v, jnp.asarray(n_dates - 1, f32))
    zero = jnp.zeros((1, n_space), f32)
    cont_all = jnp.concatenate([zero, conts[::-1], zero], axis=0)
    return v[n_space // 2], cont_all, x


def _interp1(sl, x0, dx, n_x, s):
    """Linear read of a 1-D slice at log-spot; clamps at the edges."""
    f = jnp.clip((jnp.log(jnp.maximum(s, 1e-12)) - x0) / dx,
                 0.0, n_x - 1.001)
    i = jnp.floor(f).astype(jnp.int32)
    t = f - i
    return (1.0 - t) * sl[i] + t * sl[i + 1]


def _cont_at(surf, d, s, strike):
    cont_all, x0, dx = surf
    n_x = cont_all.shape[1]
    return jnp.clip(_interp1(cont_all[d], x0, dx, n_x, s), 0.0, strike)


@functools.partial(jax.jit, static_argnames=("n_dates", "n_sub", "n_paths"))
def _lv_simulate_dates(key, k_grid, t_grid, vol_grid, spot, rate, dividend,
                       maturity, n_dates, n_sub, n_paths):
    """Antithetic log-Euler paths at every exercise date: (n_dates+1, n)."""
    f32 = jnp.float32
    dt = maturity / (n_dates * n_sub)
    sqdt = jnp.sqrt(dt)
    sig_of = functools.partial(_sigma_at, k_grid, t_grid, vol_grid, spot,
                               rate, dividend)
    half = n_paths // 2

    def substep(ls, i, kk):
        t_now = i * dt
        sig = sig_of(spot * jnp.exp(ls), t_now)
        z = jax.random.normal(jax.random.fold_in(kk, i), (half,), f32)
        z = jnp.concatenate([z, -z])
        return ls + (rate - dividend - 0.5 * sig * sig) * dt + sig * sqdt * z

    def body(ls, d):
        def inner(ls2, j):
            return substep(ls2, (d - 1) * n_sub + j,
                           jax.random.fold_in(key, d)), None

        ls, _ = lax.scan(inner, ls, jnp.arange(n_sub))
        return ls, ls

    ls0 = jnp.zeros((n_paths,), f32)
    _, lss = lax.scan(body, ls0, jnp.arange(1, n_dates + 1))
    lss = jnp.concatenate([ls0[None], lss], axis=0)
    return spot * jnp.exp(lss)


@functools.partial(jax.jit, static_argnames=("n_dates", "n_sub", "n_outer",
                                             "n_inner"))
def _lv_dual_pipeline(surf, key, k_grid, t_grid, vol_grid, spot, strike,
                      maturity, rate, dividend, cp, n_dates, n_sub,
                      n_outer, n_inner):
    """Joint dual-upper + martingale-controlled-lower pipeline (the 1-D
    local-vol analog of ``heston_american._upper_pipeline(with_lower=
    True)`` — see that docstring for the validity argument)."""
    f32 = jnp.float32
    spot, strike, maturity, rate, dividend, cp = (
        jnp.asarray(a, f32) for a in (spot, strike, maturity, rate,
                                      dividend, cp))
    dt = maturity / n_dates
    dts = maturity / (n_dates * n_sub)
    sqdts = jnp.sqrt(dts)
    sig_of = functools.partial(_sigma_at, k_grid, t_grid, vol_grid, spot,
                               rate, dividend)
    k_outer, k_dual = jax.random.split(jax.random.fold_in(key, 11))
    s_out = _lv_simulate_dates(k_outer, k_grid, t_grid, vol_grid, spot,
                               rate, dividend, maturity, n_dates, n_sub,
                               n_outer)
    half = n_inner // 2

    def surface_value(d, s):
        ex = jnp.maximum(cp * (s - strike), 0.0)
        return jnp.maximum(ex, _cont_at(surf, d, s, strike))

    def date_step_anti(ls, k, key_tr):
        """One-date transition of (n_outer, half) log-spots, antithetic
        pair per draw → (n_outer, 2·half)."""
        def sub(carry, j):
            la, lb = carry
            i = (k - 1) * n_sub + j
            t_now = i * dts
            z = jax.random.normal(jax.random.fold_in(key_tr, j),
                                  (ls.shape[0], half), f32)
            sa = sig_of(spot * jnp.exp(la), t_now)
            sb = sig_of(spot * jnp.exp(lb), t_now)
            la = la + (rate - dividend - 0.5 * sa * sa) * dts + sa * sqdts * z
            lb = lb + (rate - dividend - 0.5 * sb * sb) * dts - sb * sqdts * z
            return (la, lb), None

        (la, lb), _ = lax.scan(sub, (ls, ls), jnp.arange(n_sub))
        return jnp.concatenate([la, lb], axis=1)

    def dual_body(carry, k):
        m_prev, best, alive, low = carry
        dfk = jnp.exp(-rate * dt * k)
        vk = dfk * surface_value(k, s_out[k])
        l_prev = jnp.broadcast_to(jnp.log(s_out[k - 1] / spot)[:, None],
                                  (n_outer, half))
        l_tr = date_step_anti(l_prev, k, jax.random.fold_in(k_dual, k))
        t2 = dfk * surface_value(k, spot * jnp.exp(l_tr)).mean(axis=1)
        m_k = m_prev + vk - t2
        ex_k = jnp.maximum(cp * (s_out[k] - strike), 0.0)
        cand = dfk * ex_k - m_k
        best = jnp.maximum(best, cand)
        cont = _cont_at(surf, k, s_out[k], strike)
        take = (ex_k > 0.0) & ((k >= n_dates) | (ex_k > cont))
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
    low = jnp.where(alive, -m_n, low)
    rt = jnp.sqrt(1.0 * n_outer)
    return (best.mean(), best.std(ddof=1) / rt,
            low.mean(), low.std(ddof=1) / rt)


def local_vol_american_bracket(dupire: DupireLocalVol, strike, maturity,
                               cp: float = -1.0, n_dates: int = 25,
                               n_sub: int = 8, n_outer: int = 4096,
                               n_inner: int = 1024, n_space: int = 401,
                               steps_per_date: int = 8,
                               seed: int = 0) -> dict:
    """Certified Bermudan bracket under the calibrated Dupire surface,
    plus the rigorous continuous-exercise pad.

    Returns {lower, lower_se, upper, upper_se, width, pad,
    continuous_upper, lv_bermudan, n_dates}: the Euler-Bermudan value on
    the date grid lies in [lower, upper] up to the quoted stderrs;
    ``lv_bermudan`` is the PDE's own answer for the same date grid
    (diagnostic — the certificate is independent of it);
    ``continuous_upper`` = upper + K·(1 − e^{−rT/n}).
    """
    if cp > 0:
        raise ValidationError("bracket supports puts (cp=-1) only — an "
                              "American call pays no early-exercise "
                              "premium without dividends")
    sf = dupire.surface
    price0, cont_all, x = lv_bermudan_slices(
        sf.k_grid, sf.t_grid, sf.grid, dupire.spot, dupire.rate,
        dupire.dividend, float(strike), float(maturity), float(cp),
        n_dates, steps_per_date, n_space)
    surf = (cont_all, x[0], x[1] - x[0])
    up, up_se, lo, lo_se = (float(a) for a in _lv_dual_pipeline(
        surf, jax.random.PRNGKey(seed), sf.k_grid, sf.t_grid, sf.grid,
        dupire.spot, float(strike), float(maturity), dupire.rate,
        dupire.dividend, float(cp), n_dates, n_sub, n_outer, n_inner))
    pad = max(float(strike) * (1.0 - math.exp(
        -dupire.rate * float(maturity) / n_dates)), 0.0)
    return {"lower": lo, "lower_se": lo_se, "upper": up, "upper_se": up_se,
            "width": up - lo, "pad": pad, "continuous_upper": up + pad,
            "lv_bermudan": float(price0), "n_dates": n_dates}
