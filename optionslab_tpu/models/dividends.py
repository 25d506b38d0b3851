"""Discrete cash dividends: PDE jump conditions + exact between-date MC.

Beyond-reference capability (the reference supports only a continuous
dividend YIELD): real single-stock desks face CASH dividends at known
dates, where the spot drops by the dividend amount and an American call
may be exercised just before the ex-date.

Model: GBM between ex-dates; at each ex-date t_d the spot drops
S -> max(S - D, 0) (absorbed near zero).  Two engines, one oracle family:

  - ``fdm_price_discrete_dividends``: theta-scheme on the log-spot grid
    (same machinery as :mod:`.fdm`) with the JUMP CONDITION
    V(S, t_d^-) = V(S - D, t_d^+) applied by monotone interpolation at
    the scan step whose time level crosses t_d.  European AND American.
  - ``mc_price_discrete_dividends``: EXACT simulation — one lognormal
    growth factor per inter-dividend interval (m+1 normals per path, no
    time-stepping error), European.

Exact oracles (tests): put-call parity with dividends,
C - P = S0 - sum_i D_i e^{-r t_i} - K e^{-rT}, holds for BOTH engines;
zero dividends reduce to the vanilla engines; the escrowed-spot BS price
brackets; American call > European call when a large dividend makes
early exercise optimal (and equal without dividends).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.tridiag import tridiag_solve
from ..utils.config import EPS_TIME
from ..utils.exceptions import ValidationError
from .fdm import _grid, _howard_lcp_solve, _read_price

__all__ = ["fdm_price_discrete_dividends", "mc_price_discrete_dividends",
           "dividend_parity_gap"]


def _check_divs(dividends, maturity):
    if not dividends:
        return np.zeros(0), np.zeros(0)
    t = np.asarray([d[0] for d in dividends], np.float64)
    a = np.asarray([d[1] for d in dividends], np.float64)
    if np.any(a < 0):
        raise ValidationError("dividend amounts must be non-negative")
    if np.any(t <= 0) or np.any(t >= maturity):
        raise ValidationError("dividend dates must lie strictly inside "
                              "(0, maturity)")
    order = np.argsort(t)
    return t[order], a[order]


@functools.partial(jax.jit, static_argnames=("n_space", "n_time", "american",
                                             "div_steps", "cp"))
def _fdm_div_single(spot, strike, maturity, rate, vol, div_amounts,
                    *, cp: float, n_space: int, n_time: int,
                    american: bool, div_steps: tuple):
    """Backward theta=1/2 scheme with dividend shifts at fixed scan steps.

    ``div_steps``: static tuple of scan-step indices (after which the new
    time level has crossed that dividend's date, backward from T);
    ``div_amounts``: matching traced amounts.
    """
    t = jnp.maximum(maturity, EPS_TIME)
    # widen the grid DOWN: the pre-dividend region needs S - sum(D)
    x, dx = _grid(spot, vol, maturity, n_space, 7.0, strike)
    s_nodes = jnp.exp(x)
    dt = t / n_time
    sig2 = vol * vol
    mu = rate - 0.5 * sig2
    theta_s = 0.5

    a = 0.5 * sig2 / dx**2 - 0.5 * mu / dx
    b = -sig2 / dx**2 - rate
    c = 0.5 * sig2 / dx**2 + 0.5 * mu / dx

    intrinsic = jnp.maximum(cp * (s_nodes - strike), 0.0)
    v0 = intrinsic

    lo = jnp.full(n_space, -theta_s * dt * a)
    di = 1.0 - theta_s * dt * b * jnp.ones(n_space)
    up = jnp.full(n_space, -theta_s * dt * c)
    lo = lo.at[0].set(0.0).at[-1].set(0.0)
    di = di.at[0].set(1.0).at[-1].set(1.0)
    up = up.at[0].set(0.0).at[-1].set(0.0)

    # per-step dividend amount (0 except at the crossing steps)
    div_at = jnp.zeros(n_time, jnp.float32)
    for i, k in enumerate(div_steps):
        div_at = div_at.at[k].add(div_amounts[i])
    # remaining PV of dividends as seen from time level tau (for bounds)
    # high-S bound: S - K df - PV(remaining divs); low-S put bound: K df - S
    div_t = (jnp.stack([t - (dt * (k + 1.0)) for k in div_steps])
             if len(div_steps) else jnp.zeros(0, jnp.float32))  # fwd times

    def step(v, k):
        tau = (k + 1.0) * dt
        v_im1 = jnp.roll(v, 1)
        v_ip1 = jnp.roll(v, -1)
        rhs = v + (1.0 - theta_s) * dt * (a * v_im1 + b * v + c * v_ip1)
        # boundary values: discount remaining dividends out of the forward
        t_now = t - tau
        if len(div_steps):
            rem = jnp.sum(jnp.where(div_t > t_now,
                                    div_amounts * jnp.exp(-rate * (div_t - t_now)),
                                    0.0))
        else:
            rem = 0.0
        low = jnp.where(cp > 0, 0.0,
                        strike * jnp.exp(-rate * tau) - (s_nodes[0] - rem))
        high = jnp.where(cp > 0,
                         s_nodes[-1] - rem - strike * jnp.exp(-rate * tau),
                         0.0)
        if american:
            low = jnp.maximum(low, intrinsic[0])
            high = jnp.maximum(high, intrinsic[-1])
        rhs = rhs.at[0].set(jnp.maximum(low, 0.0)).at[-1].set(jnp.maximum(high, 0.0))
        if american:
            v_new = _howard_lcp_solve(lo, di, up, rhs, intrinsic)
        else:
            v_new = tridiag_solve(lo, di, up, rhs)

        # dividend jump condition: V(S, t_d^-) = V(max(S - D, eps), t_d^+)
        d = div_at[k]
        s_shift = jnp.maximum(s_nodes - d, s_nodes[0])
        v_shift = jnp.interp(s_shift, s_nodes, v_new)
        v_new = jnp.where(d > 0.0, v_shift, v_new)
        if american:  # exercise allowed the instant BEFORE the drop
            v_new = jnp.where(d > 0.0, jnp.maximum(v_new, intrinsic), v_new)
        return v_new, None

    v, _ = lax.scan(step, v0, jnp.arange(n_time))
    return _read_price(v, x, spot)


def fdm_price_discrete_dividends(spot, strike, maturity, rate, vol,
                                 dividends, cp: float = 1.0,
                                 american: bool = False,
                                 n_space: int = 401,
                                 n_time: int = 400) -> float:
    """PDE price with discrete cash dividends [(t_i, D_i), ...].

    European or American; the American call correctly captures exercise
    immediately before each ex-date (the only time early exercise of a
    call on a non-yield asset is optimal — Merton).
    """
    td, da = _check_divs(dividends, float(maturity))
    if n_space % 2 == 0:
        raise ValidationError("n_space must be odd")
    dt = float(maturity) / n_time
    # scan step whose NEW time level sits just past the ex-date (backward):
    # tau crosses T - t_d at k = round((T - t_d)/dt) - 1
    steps = tuple(int(np.clip(np.round((float(maturity) - tdi) / dt) - 1,
                              0, n_time - 1)) for tdi in td)
    if len(set(steps)) != len(steps):
        raise ValidationError("dividend dates too close for the time grid; "
                              "raise n_time")
    return float(_fdm_div_single(
        jnp.float32(spot), jnp.float32(strike), jnp.float32(maturity),
        jnp.float32(rate), jnp.float32(vol), jnp.asarray(da, jnp.float32),
        cp=float(cp), n_space=n_space, n_time=n_time, american=american,
        div_steps=steps))


@functools.partial(jax.jit, static_argnames=("n_paths", "cp"))
def _mc_div_core(spot, strike, maturity, rate, vol, div_t, div_a, key,
                 *, cp: float, n_paths: int):
    m = div_t.shape[0]
    bounds = jnp.concatenate([jnp.zeros(1, jnp.float32), div_t,
                              jnp.reshape(maturity, (1,))])
    dts = jnp.diff(bounds)  # (m+1,)
    half = n_paths // 2
    z = jax.random.normal(key, (half, m + 1), jnp.float32)
    z = jnp.concatenate([z, -z], axis=0)
    growth = jnp.exp((rate - 0.5 * vol * vol) * dts[None, :]
                     + vol * jnp.sqrt(dts)[None, :] * z)

    def body(s, i):
        s = s * growth[:, i]
        s = jnp.where(i < m, jnp.maximum(s - div_a[jnp.minimum(i, m - 1)]
                                         if m else s, 0.0), s)
        return s, None

    s = jnp.full((n_paths,), spot, jnp.float32)
    s, _ = lax.scan(body, s, jnp.arange(m + 1))
    # simulate in f32, REDUCE in f64: the parity identity C - P =
    # S0 - PV(divs) - K df then holds to ~1e-4 instead of f32-mean noise
    pay = jnp.maximum(cp * (s - strike), 0.0)
    # reduce at the widest enabled precision (f64 under x64, else f32)
    pay = pay.astype(jnp.result_type(float))
    disc = jnp.exp(-rate.astype(pay.dtype) * maturity)
    return disc * jnp.mean(pay), disc * jnp.std(pay) / jnp.sqrt(1.0 * n_paths)


def mc_price_discrete_dividends(spot, strike, maturity, rate, vol, dividends,
                                cp: float = 1.0, n_paths: int = 262_144,
                                seed: int = 0):
    """EXACT Monte Carlo with cash dividends: one lognormal growth factor
    per inter-dividend interval (no time-discretization error), absorbing
    at zero after each drop.  Returns (price, stderr).  European."""
    td, da = _check_divs(dividends, float(maturity))
    if n_paths % 2:
        raise ValidationError("n_paths must be even (antithetic)")
    return tuple(float(x) for x in _mc_div_core(
        jnp.float32(spot), jnp.float32(strike), jnp.float32(maturity),
        jnp.float32(rate), jnp.float32(vol), jnp.asarray(td, jnp.float32),
        jnp.asarray(da, jnp.float32), jax.random.PRNGKey(seed),
        cp=float(cp), n_paths=n_paths))


def dividend_parity_gap(call, put, spot, strike, maturity, rate, dividends):
    """|C - P - (S0 - PV(divs) - K e^{-rT})| — the exact European identity
    (holds for ANY model with deterministic cash dividends, absorption
    aside).  The tests drive both engines through this."""
    pv = sum(d * np.exp(-rate * t) for t, d in dividends)
    return abs(call - put - (spot - pv - strike * np.exp(-rate * maturity)))
