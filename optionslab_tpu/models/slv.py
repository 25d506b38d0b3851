"""Stochastic local volatility (SLV): Heston variance x Dupire leverage.

    dS/S = (r - q) dt + L(t, S) sqrt(v) dW_S
    dv   = kappa (theta - v) dt + eta * sigma sqrt(v) dW_v,
    d<W_S, W_v> = rho dt

The desk-standard exotics model: local vol alone reprices vanillas but has
the wrong forward smile (deterministic future vol); stochastic vol alone
has the right dynamics but misses the market smile. SLV does both — by
Gyongy's lemma the vanillas reprice EXACTLY iff the leverage satisfies

    L^2(t, S) = sigma_LV^2(t, S) / E[v_t | S_t = S].

``mixing`` (eta) interpolates: eta -> 0 collapses to pure local vol
(deterministic v_t, L^2 v_t == sigma_LV^2 by calibration), eta = 1 is the
full Heston vol-of-vol. Vanillas reprice at EVERY eta; exotics (cliquets,
autocalls, barriers) move — exactly the knob a desk marks to forward-smile
products.

Calibration is the particle method of Guyon & Henry-Labordere (2012),
re-designed for XLA: one ``lax.scan`` carries the particle cloud
(log-spot, variance); at each step the conditional expectation
E[v | S] is a fixed-width BINNED regression — particles are bucketed into
``n_bins`` standardized-log-moneyness bins (static shape), ``segment_sum``
accumulates (count, v)-tiles, a counts-weighted 3-tap smoother fills thin
bins, and the leverage row L_i(x) is read back per-particle by linear
interpolation. No dynamic shapes, no host round-trips — the whole
calibrate-and-price program is a single jitted scan.

The reference has no SLV at all (its local vol is ``src/models/
local_vol.py``, vanillas only; its Heston is ``src/pricing_models/
heston.py``) — this module is a beyond-reference capability, but it reuses
the reference-parity payoff conventions (``heston_exotics.exotic_stat_fns``
/ ``exotic_payoff``: Asian averages over steps 1..n, lookback extrema
include S0, discrete barrier monitoring).

Oracles (tests/test_slv.py): (1) the Gyongy check — calibrated-SLV
European prices match the Dupire PDE across strikes at eta = 1;
(2) the eta -> 0 limit reproduces the pure-LV MC engine and the leverage
rows converge to sigma_LV itself; (3) flat-surface SLV with v0 = theta
degrades to plain Heston-with-unit-leverage (cross-checked vs the Lewis
closed form).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.config import EPS_TIME
from ..utils.exceptions import ValidationError
from .heston import HestonParams
from .heston_exotics import (HESTON_EXOTIC_KINDS, _discounted_mean_stderr,
                             exotic_payoff, exotic_stat_fns)
from .local_vol import DupireLocalVol, LocalVolSurface, _bilinear

__all__ = ["SLVModel", "slv_exotic_price", "slv_calibrate_leverage",
           "slv_replay_price", "slv_cliquet_price", "slv_autocall_price",
           "slv_range_accrual_price", "slv_variance_swap",
           "slv_swap_strikes", "SLV_KINDS"]

SLV_KINDS = ("european",) + HESTON_EXOTIC_KINDS

_Z_MAX = 4.0          # bin grid spans mean +/- 4 cross-sectional stds
_COND_FLOOR = 1e-6    # floor on E[v|S] before the sqrt
_LEV_MAX = 50.0       # leverage cap (guards empty-tail pathologies)


def _conditional_variance(x, vp, n_bins):
    """Binned Nadaraya-Watson estimate of E[v | x] on the particle cloud.

    Returns (x_centers (n_bins,), cond (n_bins,)): bin centers in log-spot
    space and the smoothed conditional expectation, thin/empty bins filled
    with progressively wider information (3-tap counts-weighted smoothing,
    then the global mean).
    """
    m = jnp.mean(x)
    s = jnp.maximum(jnp.std(x), 1e-6)
    width = 2.0 * _Z_MAX / n_bins
    z = (x - m) / s
    idx = jnp.clip(jnp.floor((z + _Z_MAX) / width), 0, n_bins - 1)
    idx = idx.astype(jnp.int32)
    counts = jax.ops.segment_sum(jnp.ones_like(vp), idx, num_segments=n_bins)
    vsum = jax.ops.segment_sum(vp, idx, num_segments=n_bins)
    # counts-weighted 3-tap smoother: thin bins borrow neighbours' mass
    def tap3(a):
        return a + jnp.concatenate([a[:1], a[:-1]]) \
                 + jnp.concatenate([a[1:], a[-1:]])
    counts_s = tap3(counts)
    vsum_s = tap3(vsum)
    mean_v = jnp.mean(vp)
    cond = jnp.where(counts_s > 0, vsum_s / jnp.maximum(counts_s, 1.0),
                     mean_v)
    z_centers = -_Z_MAX + (jnp.arange(n_bins, dtype=x.dtype) + 0.5) * width
    return m + s * z_centers, cond


def _slv_scan(key, spot, maturity, rate, dividend, params, mixing,
              lv_grids, n_paths, n_steps, n_bins, init, update,
              antithetic, leverage_rows=None):
    """Particle scan: calibrate the leverage (``leverage_rows=None``) or
    replay stored rows; always carries the payoff statistics.

    Returns (S_T, stats, (x_rows, l_rows)) with rows of shape
    (n_steps, n_bins) — row i is the leverage in force on [t_i, t_{i+1}).
    """
    k_grid, t_grid, vol_grid = lv_grids
    spot = jnp.float32(spot)
    half = n_paths // 2 if antithetic else n_paths
    n_eff = half * 2 if antithetic else n_paths
    t = jnp.maximum(jnp.float32(maturity), EPS_TIME)
    dt = t / n_steps
    sqrt_dt = jnp.sqrt(dt)
    kap = jnp.float32(params.kappa)
    th = jnp.float32(params.theta)
    sig = jnp.float32(mixing) * jnp.float32(params.sigma)
    rho = jnp.float32(params.rho)
    srho = jnp.sqrt(jnp.maximum(1.0 - rho * rho, 0.0))
    rq_dt = (jnp.float32(rate) - jnp.float32(dividend)) * dt

    import inspect

    wants_var = len(inspect.signature(update).parameters) >= 4

    def sigma_lv(x, t_now):
        # x = log(S/S0); surface indexed by forward log-moneyness
        kq = x - (jnp.float32(rate) - jnp.float32(dividend)) * t_now
        return _bilinear(k_grid, t_grid, vol_grid, kq, t_now)

    def step(carry, xs):
        x, v, stats = carry
        if leverage_rows is None:
            i = xs
        else:
            i, x_row, l_row = xs
        kk = jax.random.fold_in(key, i)
        z = jax.random.normal(kk, (2, half), dtype=jnp.float32)
        zv = jnp.concatenate([z[0], -z[0]]) if antithetic else z[0]
        zo = jnp.concatenate([z[1], -z[1]]) if antithetic else z[1]
        zx = rho * zv + srho * zo
        vp = jnp.maximum(v, 0.0)
        t_now = i.astype(jnp.float32) * dt
        if leverage_rows is None:
            x_row, cond = _conditional_variance(x, vp, n_bins)
            l_row = sigma_lv(x_row, t_now) / jnp.sqrt(
                jnp.maximum(cond, _COND_FLOOR))
            l_row = jnp.clip(l_row, 0.0, _LEV_MAX)
        lev = jnp.interp(x, x_row, l_row)
        lv2 = lev * lev * vp
        x = x + rq_dt - 0.5 * lv2 * dt + lev * jnp.sqrt(vp) * sqrt_dt * zx
        v = v + kap * (th - vp) * dt + sig * jnp.sqrt(vp) * sqrt_dt * zv
        if wants_var:  # 4-arg updates also see the step's L²v·dt
            stats = update(stats, spot * jnp.exp(x), i, lv2 * dt)
        else:
            stats = update(stats, spot * jnp.exp(x), i)
        return (x, v, stats), (x_row, l_row)

    x0 = jnp.zeros((n_eff,), jnp.float32)
    v0 = jnp.full((n_eff,), jnp.float32(params.v0))
    stats0 = init(jnp.full((n_eff,), spot))
    steps = jnp.arange(n_steps)
    xs = steps if leverage_rows is None else (steps,) + tuple(leverage_rows)
    (x, _, stats), rows = lax.scan(step, (x0, v0, stats0), xs)
    return spot * jnp.exp(x), stats, rows


def _stat_payoff(kind, cp, strike, barrier, n_steps, rdt=0.0):
    if kind == "european":
        def init(s0):
            return jnp.zeros_like(s0)

        def update(stat, s, i):
            return stat

        def payoff(s_t, stat):
            return jnp.maximum(cp * (s_t - strike), 0.0)

        return init, update, payoff
    init, update = exotic_stat_fns(kind, cp, barrier, rdt=rdt)
    return init, update, functools.partial(exotic_payoff, kind, cp, strike,
                                           n_steps)


@functools.partial(jax.jit, static_argnames=(
    "kind", "n_paths", "n_steps", "n_bins", "antithetic", "return_stderr",
    "return_leverage"))
def slv_exotic_price(kind: str, spot, strike, maturity, rate,
                     params: HestonParams, key, lv_k_grid, lv_t_grid,
                     lv_vol_grid, cp: float = 1.0, dividend: float = 0.0,
                     barrier: float = 0.0, mixing: float = 1.0,
                     n_paths: int = 131_072, n_steps: int = 64,
                     n_bins: int = 31, antithetic: bool = True,
                     return_stderr: bool = False,
                     return_leverage: bool = False):
    """Calibrate the SLV leverage AND price ``kind`` in one jitted scan.

    ``lv_*_grid`` are a ``LocalVolSurface``'s (k_grid, t_grid, grid) —
    the market-calibrated Dupire surface the leverage must reproduce.
    Payoff conventions match the Heston/GBM engines exactly.
    ``return_leverage=True`` additionally returns the per-step
    (x_rows, l_rows) for diagnostics / replay.
    """
    if kind not in SLV_KINDS:
        raise ValidationError(
            f"unknown SLV kind {kind!r}; choose {SLV_KINDS}")
    init, update, payoff = _stat_payoff(kind, cp, strike, barrier,
                                        n_steps,
                                        rdt=rate * maturity / n_steps)
    s_t, stat, rows = _slv_scan(
        key, spot, maturity, rate, dividend, params, mixing,
        (lv_k_grid, lv_t_grid, lv_vol_grid), n_paths, n_steps, n_bins,
        init, update, antithetic)
    pay = payoff(s_t, stat)
    price, stderr = _discounted_mean_stderr(
        pay, 0.0 if kind.endswith("_hit") else rate, maturity)
    out = (price, stderr) if return_stderr else price
    return (out, rows) if return_leverage else out


@functools.partial(jax.jit, static_argnames=("n_paths", "n_steps", "n_bins",
                                             "antithetic"))
def slv_calibrate_leverage(spot, maturity, rate, params: HestonParams, key,
                           lv_k_grid, lv_t_grid, lv_vol_grid,
                           dividend: float = 0.0, mixing: float = 1.0,
                           n_paths: int = 131_072, n_steps: int = 64,
                           n_bins: int = 31, antithetic: bool = True):
    """Run the particle calibration alone; returns (x_rows, l_rows), each
    (n_steps, n_bins) — row i is L(t_i, .) on its particle-adapted
    log-spot grid, linearly interpolable (edge-clamped by jnp.interp)."""
    init, update, _ = _stat_payoff("european", 1.0, spot, 0.0, n_steps)
    _, _, rows = _slv_scan(
        key, spot, maturity, rate, dividend, params, mixing,
        (lv_k_grid, lv_t_grid, lv_vol_grid), n_paths, n_steps, n_bins,
        init, update, antithetic)
    return rows


@functools.partial(jax.jit, static_argnames=("n_paths", "n_steps", "n_bins",
                                             "antithetic", "return_stderr"))
def slv_variance_swap(spot, maturity, rate, params: HestonParams, key,
                      lv_k_grid, lv_t_grid, lv_vol_grid,
                      dividend: float = 0.0, mixing: float = 1.0,
                      n_paths: int = 131_072, n_steps: int = 128,
                      n_bins: int = 31, antithetic: bool = True,
                      return_stderr: bool = False):
    """Fair variance swap strike E[(1/T) ∫ L(S,t)² v_t dt] under SLV via
    the LOG CONTRACT: the Euler log-scheme gives
    E[log(S_T/S0)] = (r−q)T − ½ E[∫ L²v dt] EXACTLY (the martingale
    increments have zero mean), so terminal logs alone estimate K_var —
    no new accumulator in the scan; antithetic pairing cancels most of
    the martingale noise in the per-pair mean.

    Gyongy makes this strike MIXING-INVARIANT: vanillas — hence the log
    contract — reprice the market smile at every ``mixing``, so K_var
    equals the pure-LV value (``models/local_vol.local_vol_variance_swap``)
    and the model-free replication of the same smile. Asserted in tests;
    the spread quoted on variance swaps under SLV comes entirely from
    discretization here."""
    init = lambda s0: jnp.zeros((), jnp.float32)  # noqa: E731
    update = lambda stats, s, i: stats            # noqa: E731
    s_t, _, _ = _slv_scan(
        key, spot, maturity, rate, dividend, params, mixing,
        (lv_k_grid, lv_t_grid, lv_vol_grid), n_paths, n_steps, n_bins,
        init, update, antithetic)
    t = jnp.maximum(jnp.float32(maturity), EPS_TIME)
    x = jnp.log(s_t / jnp.float32(spot))
    drift = (jnp.float32(rate) - jnp.float32(dividend)) * t
    if antithetic:
        half = n_paths // 2
        x = 0.5 * (x[:half] + x[half:])
        n = half
    else:
        n = n_paths
    rv = -(2.0 / t) * (x - drift)
    m = rv.mean()
    se = rv.std(ddof=1) / jnp.sqrt(n * 1.0)
    return (m, se) if return_stderr else m


@functools.partial(jax.jit, static_argnames=(
    "n_paths", "n_steps", "n_bins", "n_periods", "antithetic",
    "return_stderr"))
def slv_cliquet_price(spot, maturity, rate, params: HestonParams, key,
                      lv_k_grid, lv_t_grid, lv_vol_grid,
                      dividend: float = 0.0, mixing: float = 1.0,
                      local_floor: float = -0.05, local_cap: float = 0.05,
                      global_floor: float = 0.0, global_cap: float = 1e9,
                      notional: float = 100.0, n_periods: int = 12,
                      n_paths: int = 131_072, n_steps: int = 252,
                      n_bins: int = 31, antithetic: bool = True,
                      return_stderr: bool = False):
    """Cliquet under SLV — THE use case for the model: the product's
    value lives in the forward smile, which pure local vol flattens and
    pure Heston decouples from today's smile; ``mixing`` marks between
    them with every vanilla still repriced. Conventions match
    ``heston_exotics.heston_cliquet_price``."""
    per = n_steps // n_periods
    if n_periods <= 0 or n_steps % n_periods:
        raise ValidationError(
            "n_steps must be a positive multiple of n_periods")

    def init(s0):
        return (s0, jnp.zeros_like(s0))

    def update(stats, s, i):
        s_start, acc = stats
        is_end = ((i + 1) % per == 0)
        capped = jnp.clip(s / s_start - 1.0, local_floor, local_cap)
        acc = acc + jnp.where(is_end, capped, 0.0)
        s_start = jnp.where(is_end, s, s_start)
        return (s_start, acc)

    _, (_, acc), _rows = _slv_scan(
        key, spot, maturity, rate, dividend, params, mixing,
        (lv_k_grid, lv_t_grid, lv_vol_grid), n_paths, n_steps, n_bins,
        init, update, antithetic)
    pay = notional * jnp.clip(acc, global_floor, global_cap)
    price, stderr = _discounted_mean_stderr(pay, rate, maturity)
    return (price, stderr) if return_stderr else price


@functools.partial(jax.jit, static_argnames=("n_paths", "n_steps", "n_bins",
                                             "antithetic"))
def slv_swap_strikes(spot, maturity, rate, params: HestonParams, key,
                     lv_k_grid, lv_t_grid, lv_vol_grid,
                     dividend: float = 0.0, mixing: float = 1.0,
                     n_paths: int = 131_072, n_steps: int = 128,
                     n_bins: int = 31, antithetic: bool = True):
    """BOTH swap strikes from ONE simulation under SLV: returns
    ``(K_var, se_var, K_vol, se_vol)`` with K_vol in vol units
    (E[sqrt(RV/T)]).

    The model's defining split: K_var is a log-contract functional, so
    Gyongy pins it to the market smile at EVERY ``mixing`` (equal to the
    pure-LV and model-free replication values). K_vol = E[sqrt(.)] is
    CONCAVE in realized variance — its convexity discount grows with the
    variance-of-variance that ``mixing`` dials in, so the vol-swap
    strike MOVES with mixing while K_var stays pinned. That spread is
    precisely what desks use SLV to mark. Pathwise integrated variance
    Σ L²v⁺ dt accumulates in the same particle scan (no second
    simulation). Beyond the reference (no SLV, no vol swaps)."""
    def init(s0):
        return jnp.zeros_like(s0)

    def update(stat, s, i, dv):
        return stat + dv

    _, iv, _ = _slv_scan(
        key, spot, maturity, rate, dividend, params, mixing,
        (lv_k_grid, lv_t_grid, lv_vol_grid), n_paths, n_steps, n_bins,
        init, update, antithetic)
    t = jnp.maximum(jnp.float32(maturity), EPS_TIME)
    rv = iv / t
    vol = jnp.sqrt(jnp.maximum(rv, 0.0))
    if antithetic:  # stats over independent pair means (honest stderr)
        half = rv.shape[0] // 2
        rv_m = 0.5 * (rv[:half] + rv[half:])
        vol_m = 0.5 * (vol[:half] + vol[half:])
    else:
        rv_m, vol_m = rv, vol
    n = rv_m.shape[0] * 1.0
    return (rv_m.mean(), rv_m.std(ddof=1) / jnp.sqrt(n),
            vol_m.mean(), vol_m.std(ddof=1) / jnp.sqrt(n))


@functools.partial(jax.jit, static_argnames=(
    "n_paths", "n_steps", "n_bins", "antithetic", "return_stderr"))
def slv_range_accrual_price(spot, lower, upper, maturity, rate,
                            params: HestonParams, key,
                            lv_k_grid, lv_t_grid, lv_vol_grid,
                            dividend: float = 0.0, mixing: float = 1.0,
                            notional: float = 100.0,
                            n_paths: int = 131_072, n_steps: int = 64,
                            n_bins: int = 31, antithetic: bool = True,
                            return_stderr: bool = False):
    """Range-accrual (corridor) note under SLV: notional x fraction of
    steps with S in [lower, upper]. The corridor digitals read the
    forward smile, so the value moves with ``mixing`` while vanillas
    stay pinned. Conventions match
    ``heston_exotics.heston_range_accrual_price`` and the exact GBM
    closed form (``exotics.range_accrual_closed_form``) — the oracle for
    ``ops/slv_pallas.SLVKernelPricer.range_accrual``."""
    def init(s0):
        return jnp.zeros_like(s0)

    def update(stat, s, i):
        return stat + jnp.where((s >= lower) & (s <= upper), 1.0, 0.0)

    _, acc, _rows = _slv_scan(
        key, spot, maturity, rate, dividend, params, mixing,
        (lv_k_grid, lv_t_grid, lv_vol_grid), n_paths, n_steps, n_bins,
        init, update, antithetic)
    pay = notional * acc / n_steps
    price, stderr = _discounted_mean_stderr(pay, rate, maturity)
    return (price, stderr) if return_stderr else price


@functools.partial(jax.jit, static_argnames=(
    "n_paths", "n_steps", "n_bins", "n_obs", "antithetic",
    "return_stderr"))
def slv_autocall_price(spot, maturity, rate, params: HestonParams, key,
                       lv_k_grid, lv_t_grid, lv_vol_grid,
                       dividend: float = 0.0, mixing: float = 1.0,
                       notional: float = 100.0,
                       autocall_barrier: float = 1.0,
                       coupon_barrier: float = 0.8, ki_barrier: float = 0.7,
                       coupon_rate: float = 0.08, n_obs: int = 4,
                       n_paths: int = 131_072, n_steps: int = 252,
                       n_bins: int = 31, antithetic: bool = True,
                       return_stderr: bool = False):
    """Autocallable under SLV: the knock-in barrier needs the market
    smile (local vol), the vega-sign flip needs stochastic vol — SLV is
    the model desks actually book these on. Coupons/redemptions discount
    at their dates; conventions match ``heston_autocall_price``."""
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
        pv = pv + jnp.where(couponed, df * notional * coupon_rate / n_obs,
                            0.0)
        pv = pv + jnp.where(called, df * notional, 0.0)
        alive = alive & ~called
        return (alive, ki, pv)

    s_t, (alive, ki, pv), _rows = _slv_scan(
        key, spot, maturity, rate, dividend, params, mixing,
        (lv_k_grid, lv_t_grid, lv_vol_grid), n_paths, n_steps, n_bins,
        init, update, antithetic)
    df_t = jnp.exp(-jnp.float32(rate) * jnp.float32(maturity))
    loss = jnp.minimum(s_t / spot, 1.0)
    final = jnp.where(ki, notional * loss, notional)
    pay = pv + jnp.where(alive, df_t * final, 0.0)
    n = pay.shape[0]
    price = pay.mean()
    stderr = pay.std(ddof=1) / jnp.sqrt(n * 1.0)
    return (price, stderr) if return_stderr else price


@functools.partial(jax.jit, static_argnames=(
    "kind", "n_paths", "n_steps", "antithetic", "return_stderr"))
def slv_replay_price(kind: str, spot, strike, maturity, rate,
                     params: HestonParams, key, x_rows, l_rows,
                     cp: float = 1.0, dividend: float = 0.0,
                     barrier: float = 0.0, mixing: float = 1.0,
                     n_paths: int = 131_072, n_steps: int = 64,
                     antithetic: bool = True,
                     return_stderr: bool = False):
    """Price ``kind`` by REPLAYING stored leverage rows (the
    ``slv_calibrate_leverage`` output) instead of re-calibrating —
    calibrate once, price many strikes/kinds on independent paths.
    ``n_steps`` must equal the calibration's (one row per step). This is
    also the scan-side parity oracle for the fused kernel
    (``ops/slv_pallas``), which replays the SAME rows through its
    polynomial table."""
    if kind not in SLV_KINDS:
        raise ValidationError(
            f"unknown SLV kind {kind!r}; choose {SLV_KINDS}")
    if x_rows.shape[0] != n_steps:
        raise ValidationError(
            f"leverage rows have {x_rows.shape[0]} steps, n_steps={n_steps}")
    init, update, payoff = _stat_payoff(kind, cp, strike, barrier,
                                        n_steps,
                                        rdt=rate * maturity / n_steps)
    # the surface grids are unused when rows are supplied; pass trivial
    # placeholders with valid shapes
    dummy = (jnp.zeros((2,), jnp.float32), jnp.zeros((2,), jnp.float32),
             jnp.zeros((2, 2), jnp.float32))
    s_t, stat, _ = _slv_scan(
        key, spot, maturity, rate, dividend, params, mixing, dummy,
        n_paths, n_steps, x_rows.shape[1], init, update, antithetic,
        leverage_rows=(x_rows, l_rows))
    pay = payoff(s_t, stat)
    price, stderr = _discounted_mean_stderr(
        pay, 0.0 if kind.endswith("_hit") else rate, maturity)
    return (price, stderr) if return_stderr else price


class SLVModel:
    """Facade: Dupire surface + Heston params + mixing -> exotic prices.

    >>> dup = DupireLocalVol(iv_fn, spot, rate)
    >>> slv = SLVModel(dup, HestonParams(...), mixing=0.7)
    >>> slv.price("barrier_up-and-out", strike=105, maturity=1.0,
    ...           barrier=130, key=key)
    """

    def __init__(self, surface, params: HestonParams, mixing: float = 1.0):
        if isinstance(surface, DupireLocalVol):
            surface = surface.surface
        if not isinstance(surface, LocalVolSurface):
            raise ValidationError(
                "surface must be a DupireLocalVol or LocalVolSurface")
        self.surface = surface
        self.params = params
        self.mixing = float(mixing)

    def price(self, kind, strike, maturity, key, cp: float = 1.0,
              barrier: float = 0.0, n_paths: int = 131_072,
              n_steps: int = 64, n_bins: int = 31,
              return_stderr: bool = False):
        return slv_exotic_price(
            kind, self.surface.spot, strike, maturity, self.surface.rate,
            self.params, key, self.surface.k_grid, self.surface.t_grid,
            self.surface.grid, cp=cp, dividend=self.surface.dividend,
            barrier=barrier, mixing=self.mixing, n_paths=n_paths,
            n_steps=n_steps, n_bins=n_bins, return_stderr=return_stderr)

    def cliquet(self, maturity, key, **kw):
        """Cliquet under this surface/params/mixing; kwargs forward to
        :func:`slv_cliquet_price` (floors/caps, n_periods, paths)."""
        return slv_cliquet_price(
            self.surface.spot, maturity, self.surface.rate, self.params,
            key, self.surface.k_grid, self.surface.t_grid,
            self.surface.grid, dividend=self.surface.dividend,
            mixing=self.mixing, **kw)

    def autocall(self, maturity, key, **kw):
        """Autocallable note; kwargs forward to
        :func:`slv_autocall_price` (barriers, coupon, n_obs, paths)."""
        return slv_autocall_price(
            self.surface.spot, maturity, self.surface.rate, self.params,
            key, self.surface.k_grid, self.surface.t_grid,
            self.surface.grid, dividend=self.surface.dividend,
            mixing=self.mixing, **kw)

    def leverage(self, maturity, key, n_paths: int = 131_072,
                 n_steps: int = 64, n_bins: int = 31):
        return slv_calibrate_leverage(
            self.surface.spot, maturity, self.surface.rate, self.params,
            key, self.surface.k_grid, self.surface.t_grid,
            self.surface.grid, dividend=self.surface.dividend,
            mixing=self.mixing, n_paths=n_paths, n_steps=n_steps,
            n_bins=n_bins)
