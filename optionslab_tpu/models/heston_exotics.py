"""Exotic payoffs under Heston stochastic volatility — XLA scan engine.

The reference prices exotics only under GBM (``src/pricing_models/
exotic_options.py``: Asian :83, barrier :174, lookback :347, autocallable
:404-491, cliquet :494-554) and Heston only for vanillas
(``src/pricing_models/heston.py:184``). This module crosses the two: every
path-dependent payoff family priced under the Heston dynamics — the smile-
consistent prices a desk actually quotes for barriers and autocallables.

Design mirrors ``models/exotics.py``: the steps axis is a ``lax.scan``
carrying (log-spot, variance, running statistics) — HBM holds O(paths)
state, never (paths × steps). Variance transitions: full-truncation Euler
or Andersen (2008) quadratic-exponential (``scheme="qe"``, near-unbiased
at coarse step counts), both branch-free.

This is the reference implementation and the AD path; the speed-of-light
version is the fused Pallas kernel (``ops/heston_pallas.
pallas_heston_exotic_price``) — tests cross-check the two statistically
and against the GBM engines in the sigma_v → 0, v0 = theta limit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.config import EPS_TIME
from ..utils.exceptions import ValidationError
from .heston import HestonParams

HESTON_EXOTIC_KINDS = (
    "asian_arith", "asian_geo", "lookback_float", "lookback_fixed",
    "barrier_up-and-out", "barrier_up-and-in", "barrier_down-and-out",
    "barrier_down-and-in",
    "one_touch_up", "one_touch_down", "no_touch_up", "no_touch_down",
    # double kinds take barrier=(lower, upper)
    "barrier_double-out", "barrier_double-in",
    "one_touch_double", "no_touch_double",
    # pay-at-hit one-touches: unit cash discounted AT the first hit
    # (single kinds: scalar barrier; double: barrier=(lower, upper))
    "one_touch_up_hit", "one_touch_down_hit", "one_touch_double_hit",
)


def _heston_scan(key, spot, maturity, rate, dividend, params, n_paths,
                 n_steps, init, update, scheme, antithetic, jumps=None):
    """Scan (x, v, stats) through ``n_steps``; returns (S_T, stats).

    ``init(s0_vec) -> stats``; ``update(stats, s, i) -> stats`` where ``s``
    is the spot vector AFTER step ``i`` (so averages include steps 1..n,
    matching ``models/exotics.py`` and the kernels).

    ``jumps=(lam, mu_j, sigma_j)`` adds Bates compound-Poisson log-jumps
    (exact in distribution per step: N ~ Poisson(lam·dt), jump sum
    N·mu_j + sigma_j·√N·Z — same construction as ``bates.bates_mc_price``)
    with the −lam·kbar·dt martingale compensator; composes with either
    variance scheme (jumps are independent of the vol dynamics).
    """
    if scheme not in ("euler", "qe"):
        raise ValidationError(f"scheme must be euler|qe, got {scheme!r}")
    spot = jnp.float32(spot)
    half = n_paths // 2 if antithetic else n_paths
    n_eff = half * 2 if antithetic else n_paths
    t = jnp.maximum(jnp.float32(maturity), EPS_TIME)
    dt = t / n_steps
    sqrt_dt = jnp.sqrt(dt)
    kap = jnp.float32(params.kappa)
    th = jnp.float32(params.theta)
    sig = jnp.float32(params.sigma)
    rho = jnp.float32(params.rho)
    srho = jnp.sqrt(jnp.maximum(1.0 - rho * rho, 0.0))
    mu_dt = (jnp.float32(rate) - jnp.float32(dividend)) * dt
    if jumps is not None:
        lam, mu_j, sigma_j = (jnp.float32(x) for x in jumps)
        kbar = jnp.exp(mu_j + 0.5 * sigma_j**2) - 1.0
        mu_dt = mu_dt - lam * kbar * dt  # jump-martingale compensator

    if scheme == "qe":
        emkd = jnp.exp(-kap * dt)
        c1 = th * (1.0 - emkd)
        s2_v = sig**2 * emkd * (1.0 - emkd) / kap
        s2_0 = th * sig**2 * (1.0 - emkd) ** 2 / (2.0 * kap)
        g1 = g2 = 0.5
        k0 = -rho * kap * th * dt / sig
        k1 = g1 * dt * (kap * rho / sig - 0.5) - rho / sig
        k2 = g2 * dt * (kap * rho / sig - 0.5) + rho / sig
        k3 = g1 * dt * (1.0 - rho**2)
        k4 = g2 * dt * (1.0 - rho**2)

    def step(carry, i):
        x, v, stats = carry
        kk = jax.random.fold_in(key, i)
        z = jax.random.normal(kk, (3 if jumps is not None else 2, half),
                              dtype=jnp.float32)
        zv = jnp.concatenate([z[0], -z[0]]) if antithetic else z[0]
        zo = jnp.concatenate([z[1], -z[1]]) if antithetic else z[1]
        if jumps is not None:
            zj = jnp.concatenate([z[2], -z[2]]) if antithetic else z[2]
            # Poisson counts are NOT antithetic-mirrored (no sign symmetry)
            n_jump = jax.random.poisson(
                jax.random.fold_in(kk, 7), lam * dt, (n_eff,)
            ).astype(jnp.float32)
            jump = n_jump * mu_j + sigma_j * jnp.sqrt(n_jump) * zj
        else:
            jump = 0.0
        if scheme == "qe":
            uh = jax.random.uniform(jax.random.fold_in(kk, 1), (half,),
                                    jnp.float32, 1e-7, 1.0 - 1e-7)
            u = jnp.concatenate([uh, 1.0 - uh]) if antithetic else uh
            m = c1 + emkd * v
            s2 = s2_v * v + s2_0
            psi = s2 / jnp.maximum(m * m, 1e-30)
            inv_psi = 2.0 / jnp.maximum(psi, 1e-10)
            b2 = jnp.maximum(inv_psi - 1.0 + jnp.sqrt(
                jnp.maximum(inv_psi * (inv_psi - 1.0), 0.0)), 0.0)
            a = m / (1.0 + b2)
            v_quad = a * (jnp.sqrt(b2) + zv) ** 2
            p = jnp.clip((psi - 1.0) / (psi + 1.0), 0.0, 1.0 - 1e-7)
            beta = (1.0 - p) / jnp.maximum(m, 1e-30)
            v_exp = jnp.where(u <= p, 0.0,
                              jnp.log((1.0 - p) / jnp.maximum(1.0 - u, 1e-30))
                              / jnp.maximum(beta, 1e-30))
            v_new = jnp.where(psi <= 1.5, v_quad, v_exp)
            # QE folds correlation into the k-weights: the spot shock is
            # the INDEPENDENT normal zo (Andersen 2008, eq. 33)
            x = x + mu_dt + k0 + k1 * v + k2 * v_new \
                + jnp.sqrt(jnp.maximum(k3 * v + k4 * v_new, 0.0)) * zo \
                + jump
            v = v_new
        else:
            zx = rho * zv + srho * zo
            vp = jnp.maximum(v, 0.0)
            sq = jnp.sqrt(vp)
            x = x + mu_dt - 0.5 * vp * dt + sq * sqrt_dt * zx + jump
            v = v + kap * (th - vp) * dt + sig * sq * sqrt_dt * zv
        stats = update(stats, spot * jnp.exp(x), i)
        return (x, v, stats), None

    x0 = jnp.zeros((n_eff,), jnp.float32)
    v0 = jnp.full((n_eff,), jnp.float32(params.v0))
    stats0 = init(jnp.full((n_eff,), spot))
    (x, _, stats), _ = lax.scan(step, (x0, v0, stats0), jnp.arange(n_steps))
    return spot * jnp.exp(x), stats


def _jumps_of(params):
    """(lam, mu_j, sigma_j) when ``params`` is a BatesParams, else None —
    every engine here accepts either HestonParams or BatesParams (the
    jump component is independent of the variance dynamics)."""
    return ((params.lam, params.mu_j, params.sigma_j)
            if hasattr(params, "lam") else None)


def _discounted_mean_stderr(pay, rate, maturity):
    df = jnp.exp(-jnp.float32(rate) * jnp.float32(maturity))
    n = pay.shape[0]
    price = df * pay.mean()
    stderr = df * pay.std(ddof=1) / jnp.sqrt(n * 1.0)
    return price, stderr


@functools.partial(jax.jit, static_argnames=("kind", "n_paths", "n_steps",
                                             "scheme", "antithetic",
                                             "return_stderr"))
def heston_exotic_price(kind: str, spot, strike, maturity, rate,
                        params: HestonParams, key, cp: float = 1.0,
                        dividend: float = 0.0, barrier: float = 0.0,
                        n_paths: int = 100_000, n_steps: int = 64,
                        scheme: str = "euler", antithetic: bool = True,
                        return_stderr: bool = False):
    """Price an exotic under Heston (or Bates, if ``params`` is a
    ``BatesParams`` — stochastic vol PLUS compound-Poisson jumps, the
    dynamics that actually reprices short-dated barriers/touches)
    via the scan engine.

    ``kind`` ∈ HESTON_EXOTIC_KINDS; conventions match the GBM engines
    exactly (Asian averages over steps 1..n; lookback extrema include S0;
    barriers/touches monitored discretely at every step; one-touch pays
    unit cash AT EXPIRY on the hit event).
    Returns price (or (price, stderr) with ``return_stderr=True``).
    """
    if kind not in HESTON_EXOTIC_KINDS:
        raise ValidationError(
            f"unknown heston exotic kind {kind!r}; choose {HESTON_EXOTIC_KINDS}")
    init, update = exotic_stat_fns(kind, cp, barrier,
                                   rdt=rate * maturity / n_steps)
    s_t, stat = _heston_scan(key, spot, maturity, rate, dividend, params,
                             n_paths, n_steps, init, update, scheme,
                             antithetic, jumps=_jumps_of(params))
    pay = exotic_payoff(kind, cp, strike, n_steps, s_t, stat)
    # pay-at-hit kinds carry the discount in the stat: no terminal df
    price, stderr = _discounted_mean_stderr(
        pay, 0.0 if kind.endswith("_hit") else rate, maturity)
    return (price, stderr) if return_stderr else price


def exotic_stat_fns(kind: str, cp, barrier, rdt=0.0):
    """(init, update) running-statistic pair for ``kind``.

    Shared by the Heston scan engine here and the SLV engine
    (``models/slv.py``) — the statistics are dynamics-independent:
    ``init(s0_vec) -> stat``; ``update(stat, s, i) -> stat`` with ``s``
    the spot vector after step ``i``. Pay-at-hit kinds (``*_hit``) carry
    (hit flag, df-at-first-hit) and need ``rdt`` = rate * dt.
    """
    barrier_up = "up" in kind
    double = "double" in kind
    hit_pay = kind.endswith("_hit")
    if double:
        b_lo, b_hi = (jnp.float32(barrier[0]), jnp.float32(barrier[1]))
    else:
        b = jnp.float32(barrier)

    def _hit(s):
        if double:
            return (s <= b_lo) | (s >= b_hi)
        return (s >= b) if barrier_up else (s <= b)

    def init(s0):
        if kind.startswith("asian"):
            return jnp.zeros_like(s0)
        if kind.startswith("lookback"):
            return s0
        if hit_pay:
            h = _hit(s0).astype(jnp.float32)
            return (h, h)  # (hit, df-at-first-hit; df(0) = 1)
        return _hit(s0).astype(jnp.float32)

    def update(stat, s, i):
        if kind == "asian_arith":
            return stat + s
        if kind == "asian_geo":
            return stat + jnp.log(s)
        if kind == "lookback_float":  # float call: min; float put: max
            return jnp.where(cp > 0, jnp.minimum(stat, s),
                             jnp.maximum(stat, s))
        if kind == "lookback_fixed":  # fixed call: max; fixed put: min
            return jnp.where(cp > 0, jnp.maximum(stat, s),
                             jnp.minimum(stat, s))
        if hit_pay:
            h, dfh = stat
            now = _hit(s).astype(jnp.float32)
            dfh = dfh + (1.0 - h) * now * jnp.exp(-rdt * (i + 1.0))
            return (jnp.maximum(h, now), dfh)
        return jnp.maximum(stat, _hit(s).astype(jnp.float32))

    return init, update


def exotic_payoff(kind: str, cp, strike, n_steps: int, s_t, stat):
    """Terminal payoff from (S_T, running stat) — the counterpart of
    :func:`exotic_stat_fns`, same conventions as the GBM engines."""
    knock_in = kind.endswith("in")
    if kind.endswith("_hit"):
        return stat[1]  # df-at-hit carried in the stat (no terminal df)
    if kind == "asian_arith":
        return jnp.maximum(cp * (stat / n_steps - strike), 0.0)
    if kind == "asian_geo":
        return jnp.maximum(cp * (jnp.exp(stat / n_steps) - strike), 0.0)
    if kind == "lookback_float":
        return jnp.where(cp > 0, s_t - stat, stat - s_t)
    if kind == "lookback_fixed":
        return jnp.maximum(cp * (stat - strike), 0.0)
    if "touch" in kind:
        return stat if kind.startswith("one") else (1.0 - stat)
    vanilla = jnp.maximum(cp * (s_t - strike), 0.0)
    return vanilla * (stat if knock_in else (1.0 - stat))


@functools.partial(jax.jit, static_argnames=(
    "n_paths", "n_steps", "scheme", "antithetic", "return_stderr"))
def _range_accrual_scan(spot, lower, upper, maturity, rate, params, key,
                        dividend, notional, n_paths, n_steps, scheme,
                        antithetic, return_stderr):
    def init(s0):
        return jnp.zeros_like(s0)

    def update(stat, s, i):
        return stat + jnp.where((s >= lower) & (s <= upper), 1.0, 0.0)

    _, acc = _heston_scan(key, spot, maturity, rate, dividend, params,
                          n_paths, n_steps, init, update, scheme,
                          antithetic, jumps=_jumps_of(params))
    pay = notional * acc / n_steps
    price, stderr = _discounted_mean_stderr(pay, rate, maturity)
    return (price, stderr) if return_stderr else price


def heston_range_accrual_price(spot, lower, upper, maturity, rate, params,
                               key, dividend: float = 0.0,
                               notional: float = 100.0,
                               n_paths: int = 100_000, n_steps: int = 252,
                               scheme: str = "euler",
                               antithetic: bool = True,
                               return_stderr: bool = False):
    """Range-accrual note under Heston (or Bates) via the scan engine —
    the oracle for ``pallas_heston_range_accrual_price``."""
    if not 0.0 < float(lower) < float(upper):
        raise ValidationError("need 0 < lower < upper")
    return _range_accrual_scan(spot, lower, upper, maturity, rate, params,
                               key, dividend, notional, n_paths, n_steps,
                               scheme, antithetic, return_stderr)


@functools.partial(jax.jit, static_argnames=("n_paths", "n_steps",
                                             "n_periods", "scheme",
                                             "antithetic", "return_stderr"))
def heston_cliquet_price(spot, maturity, rate, params: HestonParams, key,
                         dividend: float = 0.0, local_floor: float = -0.05,
                         local_cap: float = 0.05, global_floor: float = 0.0,
                         global_cap: float = 1e9, notional: float = 100.0,
                         n_periods: int = 12, n_paths: int = 100_000,
                         n_steps: int = 252, scheme: str = "euler",
                         antithetic: bool = True,
                         return_stderr: bool = False):
    """Cliquet/ratchet under Heston — the canonical forward-smile product
    (a cliquet's value lives in the forward skew that a flat-vol GBM model
    cannot see; cf. ``models/forward_start.py``). Conventions match
    ``models/exotics.cliquet_price``."""
    per = n_steps // n_periods
    if n_periods <= 0 or n_steps % n_periods:
        raise ValidationError("n_steps must be a positive multiple of n_periods")

    def init(s0):
        return (s0, jnp.zeros_like(s0))

    def update(stats, s, i):
        s_start, acc = stats
        is_end = ((i + 1) % per == 0)
        capped = jnp.clip(s / s_start - 1.0, local_floor, local_cap)
        acc = acc + jnp.where(is_end, capped, 0.0)
        s_start = jnp.where(is_end, s, s_start)
        return (s_start, acc)

    _, (_, acc) = _heston_scan(key, spot, maturity, rate, dividend, params,
                               n_paths, n_steps, init, update, scheme,
                               antithetic, jumps=_jumps_of(params))
    pay = notional * jnp.clip(acc, global_floor, global_cap)
    price, stderr = _discounted_mean_stderr(pay, rate, maturity)
    return (price, stderr) if return_stderr else price


@functools.partial(jax.jit, static_argnames=("n_paths", "n_steps", "n_obs",
                                             "scheme", "antithetic",
                                             "return_stderr"))
def heston_autocall_price(spot, maturity, rate, params: HestonParams, key,
                          dividend: float = 0.0, notional: float = 100.0,
                          autocall_barrier: float = 1.0,
                          coupon_barrier: float = 0.8,
                          ki_barrier: float = 0.7, coupon_rate: float = 0.08,
                          n_obs: int = 4, n_paths: int = 100_000,
                          n_steps: int = 252, scheme: str = "euler",
                          antithetic: bool = True,
                          return_stderr: bool = False):
    """Autocallable/snowball under Heston — the product family that IS
    priced under stochastic vol in practice (its vega sign flips with the
    knock-in state). Conventions match ``models/exotics.
    autocallable_price``; coupons/redemptions discount at their dates."""
    obs_every = n_steps // n_obs
    if n_obs <= 0 or n_steps % n_obs:
        raise ValidationError("n_steps must be a positive multiple of n_obs")
    dt = jnp.maximum(jnp.float32(maturity), EPS_TIME) / n_steps

    def init(s0):
        return (jnp.ones_like(s0, dtype=bool),
                jnp.zeros_like(s0, dtype=bool), jnp.zeros_like(s0))

    def update(stats, s, i):
        alive, ki, pv = stats
        ki = ki | (s <= ki_barrier * spot)
        is_obs = ((i + 1) % obs_every == 0)
        df = jnp.exp(-rate * (i + 1).astype(jnp.float32) * dt)
        called = alive & is_obs & (s >= autocall_barrier * spot)
        couponed = alive & is_obs & (s >= coupon_barrier * spot)
        pv = pv + jnp.where(couponed, df * notional * coupon_rate / n_obs, 0.0)
        pv = pv + jnp.where(called, df * notional, 0.0)
        alive = alive & ~called
        return (alive, ki, pv)

    s_t, (alive, ki, pv) = _heston_scan(
        key, spot, maturity, rate, dividend, params, n_paths, n_steps, init,
        update, scheme, antithetic, jumps=_jumps_of(params))
    df_t = jnp.exp(-jnp.float32(rate) * jnp.float32(maturity))
    loss = jnp.minimum(s_t / spot, 1.0)
    final = jnp.where(ki, notional * loss, notional)
    pay = pv + jnp.where(alive, df_t * final, 0.0)
    n = pay.shape[0]
    price = pay.mean()
    stderr = pay.std(ddof=1) / jnp.sqrt(n * 1.0)
    return (price, stderr) if return_stderr else price
