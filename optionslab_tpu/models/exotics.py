"""Exotic option pricers on a shared scan-based GBM path engine.

Reference capabilities covered (SURVEY.md §2.2, ``src/pricing_models/
exotic_options.py``):
  - Asian arithmetic/geometric + geometric closed form (``:133-160``)
  - Barrier: 4 knock types, discrete monitoring (``:174-224``)
  - American via Longstaff–Schwartz LSM (``:236-307``) + early-exercise
    boundary estimation (``:309``)
  - Lookback floating/fixed (``:347-401``)
  - Autocallable/snowball (``:404-491``)
  - Cliquet with local/global caps (``:494-554``)
  - module-level convenience functions (``:557-606``)

TPU-first design: the reference materializes the full ``(n_paths,
n_steps+1)`` path matrix for every payoff (``exotic_options.py:40``). Here
a single ``lax.scan`` engine carries only (log-spot, running statistics) —
running sum for Asians, running extrema for barriers/lookbacks, coupon
state for autocallables — so HBM holds O(paths), not O(paths × steps).
LSM is the one payoff that genuinely needs cross-sectional state at
exercise dates; it stores spots at the ``n_dates`` exercise dates only and
solves the per-date regressions with masked normal equations (fixed
shapes — no dynamic ITM subsetting, SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.math import norm_cdf
from ..utils.exceptions import ValidationError

# ---------------------------------------------------------------------------
# Shared scan engine
# ---------------------------------------------------------------------------


def _gbm_scan(key, spot, maturity, rate, dividend, vol, n_paths, n_steps,
              init_stats, update, antithetic=True, dtype=jnp.float32):
    """Scan paths; ``update(stats, s, step_idx)`` folds running statistics.

    Returns (terminal spots (n_paths,), final stats). Antithetic pairs are
    interleaved as the two halves of the path axis.
    """
    dt = jnp.asarray(maturity / n_steps, dtype)
    drift = jnp.asarray((rate - dividend - 0.5 * vol * vol) * dt, dtype)
    sig_dt = jnp.asarray(vol, dtype) * jnp.sqrt(dt)
    half = n_paths // 2 if antithetic else n_paths

    def step(carry, i):
        log_s, stats = carry
        z = jax.random.normal(jax.random.fold_in(key, i), (half,), dtype=dtype)
        z = jnp.concatenate([z, -z]) if antithetic else z
        log_s = log_s + drift + sig_dt * z
        s = jnp.asarray(spot, dtype) * jnp.exp(log_s)
        stats = update(stats, s, i)
        return (log_s, stats), None

    n_eff = half * 2 if antithetic else n_paths
    log_s0 = jnp.zeros(n_eff, dtype)
    s0 = jnp.full(n_eff, spot, dtype)
    stats0 = init_stats(s0)
    (log_s, stats), _ = lax.scan(step, (log_s0, stats0), jnp.arange(n_steps))
    return jnp.asarray(spot, dtype) * jnp.exp(log_s), stats


def _discounted_mean_stderr(pay, rate, maturity):
    df = jnp.exp(-rate * maturity)
    n = pay.shape[0]
    price = df * pay.mean()
    stderr = df * pay.std(ddof=1) / jnp.sqrt(n * 1.0)
    return price, stderr


# ---------------------------------------------------------------------------
# Asian
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("n_paths", "n_steps", "averaging", "return_stderr"))
def asian_price(spot, strike, maturity, rate, vol, key, cp=1.0, dividend=0.0,
                n_paths: int = 100_000, n_steps: int = 64,
                averaging: str = "arithmetic", return_stderr: bool = False):
    """Fixed-strike Asian on the running average (includes every step after
    t=0, matching discrete averaging)."""
    if averaging not in ("arithmetic", "geometric"):
        raise ValidationError(f"averaging must be arithmetic|geometric, got {averaging}")
    geo = averaging == "geometric"

    def init(s0):
        return jnp.zeros_like(s0)

    def update(acc, s, i):
        return acc + (jnp.log(s) if geo else s)

    _, acc = _gbm_scan(key, spot, maturity, rate, dividend, vol, n_paths, n_steps, init, update)
    avg = jnp.exp(acc / n_steps) if geo else acc / n_steps
    pay = jnp.maximum(cp * (avg - strike), 0.0)
    price, stderr = _discounted_mean_stderr(pay, rate, maturity)
    return (price, stderr) if return_stderr else price


def geometric_asian_closed_form(spot, strike, maturity, rate, vol, cp=1.0,
                                dividend=0.0, n_steps: int = 64):
    """Discrete geometric-average Asian closed form — the test oracle the
    reference also keeps (``exotic_options.py:133-160``).

    log(G/S0) is exactly Normal(μ_g, σ_g²) with
      μ_g  = (r - q - σ²/2)·dt·(m+1)/2
      σ_g² = σ²·dt·(m+1)(2m+1)/(6m)
    and the discounted expectation follows the Black formula on G.
    """
    m = float(n_steps)
    t = jnp.asarray(maturity)
    dt = t / m
    mu_g = (rate - dividend - 0.5 * vol**2) * dt * (m + 1.0) / 2.0
    var_g = vol**2 * dt * (m + 1.0) * (2.0 * m + 1.0) / (6.0 * m)
    sd = jnp.sqrt(jnp.maximum(var_g, 1e-30))
    fwd_g = spot * jnp.exp(mu_g + 0.5 * var_g)
    d1 = (jnp.log(spot / strike) + mu_g + var_g) / sd
    d2 = d1 - sd
    df = jnp.exp(-rate * t)
    return df * cp * (fwd_g * norm_cdf(cp * d1) - strike * norm_cdf(cp * d2))


# ---------------------------------------------------------------------------
# Barrier
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("n_paths", "n_steps", "barrier_type",
                                              "continuous", "return_stderr"))
def barrier_price(spot, strike, barrier, maturity, rate, vol, key, cp=1.0,
                  dividend=0.0, n_paths: int = 100_000, n_steps: int = 64,
                  barrier_type: str = "up-and-out", rebate: float = 0.0,
                  continuous: bool = False, return_stderr: bool = False):
    """Barrier option (reference: ``exotic_options.py:174-224``).

    ``continuous=False``: discrete monitoring at every step — the crossing
    indicator is a running OR in the scan carry (matches the reference).

    ``continuous=True``: Brownian-bridge correction — the carry tracks each
    path's SURVIVAL PROBABILITY, multiplying in the bridge crossing
    probability p = exp(-2·ln(B/S_t)·ln(B/S_{t+1})/(σ²Δt)) between
    monitoring dates. Removes the O(√Δt) discrete-monitoring bias for
    continuously monitored contracts (a capability the reference lacks).
    """
    parts = barrier_type.split("-")
    if len(parts) != 3 or parts[0] not in ("up", "down") or parts[2] not in ("in", "out"):
        raise ValidationError(f"unknown barrier type {barrier_type!r}")
    up = parts[0] == "up"
    knock_in = parts[2] == "in"

    if not continuous:
        def init(s0):
            return (s0 >= barrier) if up else (s0 <= barrier)

        def update(crossed, s, i):
            hit = (s >= barrier) if up else (s <= barrier)
            return crossed | hit

        terminal, crossed = _gbm_scan(key, spot, maturity, rate, dividend, vol,
                                      n_paths, n_steps, init, update)
        survival = (~crossed).astype(jnp.float32)
    else:
        dt = maturity / n_steps
        inv_sig2dt = 1.0 / jnp.maximum(vol * vol * dt, 1e-12)

        def init(s0):
            alive0 = jnp.where((s0 >= barrier) if up else (s0 <= barrier), 0.0, 1.0)
            return (alive0, s0)

        def update(stats, s, i):
            surv, s_prev = stats
            hit = (s >= barrier) if up else (s <= barrier)
            # bridge crossing probability between s_prev and s (both on the
            # non-knocked side): exp(-2·ln(B/s_prev)·ln(B/s)/(σ²Δt))
            a = jnp.log(barrier / jnp.maximum(s_prev, 1e-12))
            b = jnp.log(barrier / jnp.maximum(s, 1e-12))
            p_cross = jnp.exp(-2.0 * a * b * inv_sig2dt)
            p_cross = jnp.where(hit, 1.0, jnp.clip(p_cross, 0.0, 1.0))
            return (surv * (1.0 - p_cross), s)

        terminal, (survival, _) = _gbm_scan(key, spot, maturity, rate, dividend, vol,
                                            n_paths, n_steps, init, update)

    vanilla = jnp.maximum(cp * (terminal - strike), 0.0)
    if knock_in:
        pay = vanilla * (1.0 - survival) + rebate * survival
    else:
        pay = vanilla * survival + rebate * (1.0 - survival)
    price, stderr = _discounted_mean_stderr(pay, rate, maturity)
    return (price, stderr) if return_stderr else price


# ---------------------------------------------------------------------------
# Lookback
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("n_paths", "n_steps", "floating", "return_stderr"))
def lookback_price(spot, strike, maturity, rate, vol, key, cp=1.0, dividend=0.0,
                   n_paths: int = 100_000, n_steps: int = 64,
                   floating: bool = True, return_stderr: bool = False):
    """Lookback on the running extremum (reference: ``exotic_options.py:347``).

    Floating: call pays S_T − min S, put pays max S − S_T.
    Fixed: call pays max S − K, put pays K − min S.
    """

    def init(s0):
        return (s0, s0)  # (running min, running max)

    def update(stats, s, i):
        mn, mx = stats
        return (jnp.minimum(mn, s), jnp.maximum(mx, s))

    terminal, (mn, mx) = _gbm_scan(key, spot, maturity, rate, dividend, vol,
                                   n_paths, n_steps, init, update)
    if floating:
        pay = jnp.where(cp > 0, terminal - mn, mx - terminal)
    else:
        pay = jnp.where(cp > 0, jnp.maximum(mx - strike, 0.0), jnp.maximum(strike - mn, 0.0))
    price, stderr = _discounted_mean_stderr(pay, rate, maturity)
    return (price, stderr) if return_stderr else price


# ---------------------------------------------------------------------------
# Autocallable (snowball-style)
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("n_paths", "n_steps", "n_obs", "return_stderr"))
def autocallable_price(spot, maturity, rate, vol, key, dividend=0.0,
                       notional: float = 100.0, autocall_barrier: float = 1.0,
                       coupon_barrier: float = 0.8, ki_barrier: float = 0.7,
                       coupon_rate: float = 0.08, n_obs: int = 4,
                       n_paths: int = 100_000, n_steps: int = 252,
                       return_stderr: bool = False):
    """Autocall note (reference: ``exotic_options.py:404-491``): at each of
    ``n_obs`` equally spaced observation dates, if S ≥ autocall·S0 the note
    redeems at par + accrued coupon; coupons accrue while S ≥ coupon·S0;
    continuous knock-in at ki·S0 converts final redemption into a short put.

    Scan carry: (alive, knocked_in, pv accumulated). Observation dates are
    step-index masks — static control flow.
    """
    obs_every = n_steps // n_obs

    def init(s0):
        alive = jnp.ones_like(s0, dtype=bool)
        ki = jnp.zeros_like(s0, dtype=bool)
        pv = jnp.zeros_like(s0)
        return (alive, ki, pv)

    def update(stats, s, i):
        alive, ki, pv = stats
        ki = ki | (s <= ki_barrier * spot)
        is_obs = ((i + 1) % obs_every == 0)
        obs_idx = (i + 1) // obs_every  # 1-based observation number
        t_obs = obs_idx * obs_every * (maturity / n_steps)
        df = jnp.exp(-rate * t_obs)
        called = alive & is_obs & (s >= autocall_barrier * spot)
        coupon_paid = alive & is_obs & (s >= coupon_barrier * spot)
        pv = pv + jnp.where(coupon_paid, df * notional * coupon_rate / n_obs, 0.0)
        pv = pv + jnp.where(called, df * notional, 0.0)
        alive = alive & ~called
        return (alive, ki, pv)

    terminal, (alive, ki, pv) = _gbm_scan(key, spot, maturity, rate, dividend, vol,
                                          n_paths, n_steps, init, update)
    df_T = jnp.exp(-rate * maturity)
    # final redemption for notes that survived: par unless knocked in below par
    loss = jnp.minimum(terminal / spot, 1.0)
    final = jnp.where(ki, notional * loss, notional)
    pay = pv + jnp.where(alive, df_T * final, 0.0)
    n = pay.shape[0]
    price = pay.mean()
    stderr = pay.std(ddof=1) / jnp.sqrt(n * 1.0)
    return (price, stderr) if return_stderr else price


# ---------------------------------------------------------------------------
# Cliquet
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("n_paths", "n_steps", "n_periods", "return_stderr"))
def cliquet_price(spot, maturity, rate, vol, key, dividend=0.0,
                  local_floor: float = -0.05, local_cap: float = 0.05,
                  global_floor: float = 0.0, global_cap: float = 1e9,
                  notional: float = 100.0, n_periods: int = 12,
                  n_paths: int = 100_000, n_steps: int = 252,
                  return_stderr: bool = False):
    """Cliquet / ratchet (reference: ``exotic_options.py:494-554``): sum of
    locally capped/floored period returns, globally capped/floored."""
    per = n_steps // n_periods

    def init(s0):
        return (s0, jnp.zeros_like(s0))  # (period start spot, capped return sum)

    def update(stats, s, i):
        s_start, acc = stats
        is_end = ((i + 1) % per == 0)
        ret = s / s_start - 1.0
        capped = jnp.clip(ret, local_floor, local_cap)
        acc = acc + jnp.where(is_end, capped, 0.0)
        s_start = jnp.where(is_end, s, s_start)
        return (s_start, acc)

    _, (_, acc) = _gbm_scan(key, spot, maturity, rate, dividend, vol,
                            n_paths, n_steps, init, update)
    payoff = notional * jnp.clip(acc, global_floor, global_cap)
    price, stderr = _discounted_mean_stderr(payoff, rate, maturity)
    return (price, stderr) if return_stderr else price


# ---------------------------------------------------------------------------
# American via Longstaff–Schwartz
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("n_paths", "n_dates", "basis", "return_stderr"))
def american_lsm_price(spot, strike, maturity, rate, vol, key, cp=-1.0,
                       dividend=0.0, n_paths: int = 100_000, n_dates: int = 50,
                       basis: int = 3, return_stderr: bool = False):
    """Longstaff–Schwartz American pricing (reference: ``exotic_options.py:
    236-307``).

    TPU recast of the dynamically-shaped ITM regression: the per-date
    weighted normal equations use the ITM indicator as a weight —
    fixed-shape ``(basis+1)×(basis+1)`` solves inside a backward scan, no
    boolean subsetting. Basis: polynomials in the CENTERED moneyness
    (S/K − 1) — centering keeps the normal equations well-conditioned in
    float32 (uncentered powers degrade visibly beyond ~50 exercise dates).
    """
    dtype = jnp.float32
    dt = maturity / n_dates
    drift = (rate - dividend - 0.5 * vol * vol) * dt
    sig_dt = vol * jnp.sqrt(jnp.asarray(dt, dtype))
    half = n_paths // 2

    def fwd(log_s, i):
        z = jax.random.normal(jax.random.fold_in(key, i), (half,), dtype=dtype)
        z = jnp.concatenate([z, -z])
        log_s = log_s + drift + sig_dt * z
        return log_s, log_s

    _, log_paths = lax.scan(fwd, jnp.zeros(n_paths, dtype), jnp.arange(n_dates))
    s_paths = spot * jnp.exp(log_paths)  # (n_dates, n_paths)

    def intrinsic(s):
        return jnp.maximum(cp * (s - strike), 0.0)

    disc = jnp.exp(-rate * dt)

    inv_n = 1.0 / n_paths

    def backward(cash, idx):
        # cash: value received along each path at its (current) optimal stop,
        # discounted to date idx+1. Regress continuation on ITM paths.
        s = s_paths[idx]
        ex = intrinsic(s)
        itm = ex > 0
        x = s / strike - 1.0  # centered moneyness: f32-stable regression
        feats = jnp.stack([x**p for p in range(basis + 1)], axis=0)  # (b+1, paths)
        w = itm.astype(dtype)
        y = disc * cash
        hi = lax.Precision.HIGHEST  # TPU default matmul is bf16
        a_mat = jnp.matmul(feats * w, feats.T, precision=hi) * inv_n
        b_vec = jnp.matmul(feats * w, y, precision=hi) * inv_n
        ridge = 1e-8 * jnp.eye(basis + 1, dtype=dtype)
        coef = jnp.linalg.solve(a_mat + ridge, b_vec)
        cont = jnp.matmul(coef, feats, precision=hi)
        exercise = itm & (ex > cont)
        cash = jnp.where(exercise, ex, disc * cash)
        return cash, exercise

    cash_T = intrinsic(s_paths[-1])
    cash, ex_decisions = lax.scan(backward, cash_T, jnp.arange(n_dates - 2, -1, -1))
    pay = disc * cash  # discount the last step back to t=0
    n = pay.shape[0]
    price = pay.mean()
    stderr = pay.std(ddof=1) / jnp.sqrt(n * 1.0)
    price = jnp.maximum(price, intrinsic(jnp.asarray(spot, dtype)))
    return (price, stderr) if return_stderr else price


def lsm_exercise_boundary(spot, strike, maturity, rate, vol, key, cp=-1.0,
                          dividend=0.0, n_paths: int = 50_000, n_dates: int = 50):
    """Early-exercise boundary estimate per date (reference:
    ``exotic_options.py:309``): smallest (put) / largest (call) exercised
    spot at each date, NaN where no exercise occurred."""
    dtype = jnp.float32
    dt = maturity / n_dates
    drift = (rate - dividend - 0.5 * vol * vol) * dt
    sig_dt = vol * jnp.sqrt(jnp.asarray(dt, dtype))
    half = n_paths // 2

    def fwd(log_s, i):
        z = jax.random.normal(jax.random.fold_in(key, i), (half,), dtype=dtype)
        z = jnp.concatenate([z, -z])
        log_s = log_s + drift + sig_dt * z
        return log_s, log_s

    _, log_paths = lax.scan(fwd, jnp.zeros(n_paths, dtype), jnp.arange(n_dates))
    s_paths = spot * jnp.exp(log_paths)
    disc = jnp.exp(-rate * dt)

    def backward(cash, idx):
        s = s_paths[idx]
        ex = jnp.maximum(cp * (s - strike), 0.0)
        itm = ex > 0
        x = s / strike - 1.0  # centered (see american_lsm_price)
        feats = jnp.stack([x**p for p in range(4)], axis=0)
        w = itm.astype(dtype)
        y = disc * cash
        inv_n = 1.0 / n_paths
        hi = lax.Precision.HIGHEST
        coef = jnp.linalg.solve(
            jnp.matmul(feats * w, feats.T, precision=hi) * inv_n
            + 1e-8 * jnp.eye(4, dtype=dtype),
            jnp.matmul(feats * w, y, precision=hi) * inv_n)
        cont = jnp.matmul(coef, feats, precision=hi)
        exercise = itm & (ex > cont)
        boundary = jnp.where(
            jnp.any(exercise),
            jnp.where(cp < 0, jnp.max(jnp.where(exercise, s, -jnp.inf)),
                      jnp.min(jnp.where(exercise, s, jnp.inf))),
            jnp.nan,
        )
        cash = jnp.where(exercise, ex, disc * cash)
        return cash, boundary

    cash_T = jnp.maximum(cp * (s_paths[-1] - strike), 0.0)
    _, boundaries = lax.scan(backward, cash_T, jnp.arange(n_dates - 2, -1, -1))
    return boundaries[::-1]



# ---------------------------------------------------------------------------
# AD Greeks for path-dependent payoffs
# ---------------------------------------------------------------------------
def exotic_greeks(price_fn, spot, vol, rate, maturity, **kwargs):
    """delta/vega/rho/theta of any scan-engine exotic by ``jax.grad``.

    ``price_fn(spot, vol, rate, maturity) -> price`` must be built on the
    differentiable scan engine (Asian/lookback/cliquet payoffs are a.e.
    smooth in the parameters; barriers' crossing indicators have zero
    pathwise derivative at the barrier — use FD for barrier-level
    sensitivities). The reference has no exotic Greeks at all
    (``docs/development_notes.md``: "No American option Greeks").
    """
    spot = jnp.asarray(spot, jnp.float32)
    vol = jnp.asarray(vol, jnp.float32)
    rate = jnp.asarray(rate, jnp.float32)
    maturity = jnp.asarray(maturity, jnp.float32)
    price, grads = jax.value_and_grad(price_fn, argnums=(0, 1, 2, 3))(
        spot, vol, rate, maturity, **kwargs)
    return {
        "price": price,
        "delta": grads[0],
        "vega": grads[1],
        "rho": grads[2],
        "theta": -grads[3],
    }

# ---------------------------------------------------------------------------
# Dataclass adapters (reference exposes exotic classes + convenience fns)
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class AsianOption:
    spot: float
    strike: float
    maturity: float
    rate: float
    vol: float
    option_type: str = "call"
    dividend: float = 0.0
    averaging: str = "arithmetic"
    n_paths: int = 100_000
    n_steps: int = 64
    seed: int = 0
    engine: str = "scan"  # "scan" (AD-capable) | "pallas" (fastest, TPU)

    def price(self, return_stderr: bool = False):
        cp = 1.0 if self.option_type == "call" else -1.0
        if self.engine == "pallas":
            from ..ops.exotic_pallas import pallas_exotic_price

            kind = "asian_arith" if self.averaging == "arithmetic" else "asian_geo"
            p, se, _ = pallas_exotic_price(kind, self.spot, self.strike, self.maturity,
                                           self.rate, self.vol, cp, self.dividend,
                                           n_paths=self.n_paths, n_steps=self.n_steps,
                                           seed=self.seed)
            return (p, se) if return_stderr else p
        return asian_price(self.spot, self.strike, self.maturity, self.rate, self.vol,
                           jax.random.PRNGKey(self.seed), cp, self.dividend,
                           self.n_paths, self.n_steps, self.averaging, return_stderr)

    def greeks(self):
        cp = 1.0 if self.option_type == "call" else -1.0
        if self.engine == "pallas":
            from ..ops.exotic_pallas import pallas_exotic_greeks

            kind = "asian_arith" if self.averaging == "arithmetic" else "asian_geo"
            return pallas_exotic_greeks(kind, self.spot, self.strike,
                                        self.maturity, self.rate, self.vol, cp,
                                        self.dividend, n_paths=self.n_paths,
                                        n_steps=self.n_steps, seed=self.seed)
        key = jax.random.PRNGKey(self.seed)
        return exotic_greeks(
            lambda s, v, r, t: asian_price(s, self.strike, t, r, v, key, cp,
                                           self.dividend, self.n_paths,
                                           self.n_steps, self.averaging),
            self.spot, self.vol, self.rate, self.maturity)


@dataclasses.dataclass
class BarrierOption:
    spot: float
    strike: float
    barrier: float
    maturity: float
    rate: float
    vol: float
    option_type: str = "call"
    barrier_type: str = "up-and-out"
    rebate: float = 0.0
    dividend: float = 0.0
    n_paths: int = 100_000
    n_steps: int = 64
    seed: int = 0
    engine: str = "scan"
    continuous: bool = False  # Brownian-bridge correction (continuous monitoring)

    def price(self, return_stderr: bool = False):
        cp = 1.0 if self.option_type == "call" else -1.0
        if self.engine == "pallas" and self.rebate == 0.0 and not self.continuous:
            from ..ops.exotic_pallas import pallas_exotic_price

            p, se, _ = pallas_exotic_price(f"barrier_{self.barrier_type}", self.spot,
                                           self.strike, self.maturity, self.rate,
                                           self.vol, cp, self.dividend,
                                           barrier=self.barrier, n_paths=self.n_paths,
                                           n_steps=self.n_steps, seed=self.seed)
            return (p, se) if return_stderr else p
        return barrier_price(self.spot, self.strike, self.barrier, self.maturity,
                             self.rate, self.vol, jax.random.PRNGKey(self.seed), cp,
                             self.dividend, self.n_paths, self.n_steps,
                             self.barrier_type, self.rebate, self.continuous,
                             return_stderr)


@dataclasses.dataclass
class LookbackOption:
    spot: float
    strike: float
    maturity: float
    rate: float
    vol: float
    option_type: str = "call"
    floating: bool = True
    dividend: float = 0.0
    n_paths: int = 100_000
    n_steps: int = 64
    seed: int = 0
    engine: str = "scan"

    def price(self, return_stderr: bool = False):
        cp = 1.0 if self.option_type == "call" else -1.0
        if self.engine == "pallas":
            from ..ops.exotic_pallas import pallas_exotic_price

            kind = "lookback_float" if self.floating else "lookback_fixed"
            p, se, _ = pallas_exotic_price(kind, self.spot, self.strike, self.maturity,
                                           self.rate, self.vol, cp, self.dividend,
                                           n_paths=self.n_paths, n_steps=self.n_steps,
                                           seed=self.seed)
            return (p, se) if return_stderr else p
        return lookback_price(self.spot, self.strike, self.maturity, self.rate,
                              self.vol, jax.random.PRNGKey(self.seed), cp,
                              self.dividend, self.n_paths, self.n_steps,
                              self.floating, return_stderr)

    def greeks(self):
        cp = 1.0 if self.option_type == "call" else -1.0
        if self.engine == "pallas":
            from ..ops.exotic_pallas import pallas_exotic_greeks

            kind = "lookback_float" if self.floating else "lookback_fixed"
            return pallas_exotic_greeks(kind, self.spot, self.strike,
                                        self.maturity, self.rate, self.vol, cp,
                                        self.dividend, n_paths=self.n_paths,
                                        n_steps=self.n_steps, seed=self.seed)
        key = jax.random.PRNGKey(self.seed)
        return exotic_greeks(
            lambda s, v, r, t: lookback_price(s, self.strike, t, r, v, key, cp,
                                              self.dividend, self.n_paths,
                                              self.n_steps, self.floating),
            self.spot, self.vol, self.rate, self.maturity)


@dataclasses.dataclass
class AmericanOptionLSM:
    spot: float
    strike: float
    maturity: float
    rate: float
    vol: float
    option_type: str = "put"
    dividend: float = 0.0
    n_paths: int = 100_000
    n_dates: int = 50
    seed: int = 0

    def price(self, return_stderr: bool = False):
        cp = 1.0 if self.option_type == "call" else -1.0
        return american_lsm_price(self.spot, self.strike, self.maturity, self.rate,
                                  self.vol, jax.random.PRNGKey(self.seed), cp,
                                  self.dividend, self.n_paths, self.n_dates,
                                  return_stderr=return_stderr)

    def exercise_boundary(self):
        cp = 1.0 if self.option_type == "call" else -1.0
        return lsm_exercise_boundary(self.spot, self.strike, self.maturity, self.rate,
                                     self.vol, jax.random.PRNGKey(self.seed), cp,
                                     self.dividend, self.n_paths, self.n_dates)


@dataclasses.dataclass
class AutocallableNote:
    spot: float
    maturity: float
    rate: float
    vol: float
    dividend: float = 0.0
    notional: float = 100.0
    autocall_barrier: float = 1.0
    coupon_barrier: float = 0.8
    ki_barrier: float = 0.7
    coupon_rate: float = 0.08
    n_obs: int = 4
    n_paths: int = 100_000
    n_steps: int = 252
    seed: int = 0
    engine: str = "scan"  # "scan" (AD-capable) | "pallas" (fastest, TPU)

    def price(self, return_stderr: bool = False):
        if self.engine == "pallas":
            from ..ops.exotic_pallas import pallas_autocall_price

            p, se, _ = pallas_autocall_price(
                self.spot, self.maturity, self.rate, self.vol, self.dividend,
                self.notional, self.autocall_barrier, self.coupon_barrier,
                self.ki_barrier, self.coupon_rate, self.n_obs,
                n_paths=self.n_paths, n_steps=self.n_steps, seed=self.seed)
            return (p, se) if return_stderr else p
        return autocallable_price(self.spot, self.maturity, self.rate, self.vol,
                                  jax.random.PRNGKey(self.seed), self.dividend,
                                  self.notional, self.autocall_barrier,
                                  self.coupon_barrier, self.ki_barrier,
                                  self.coupon_rate, self.n_obs, self.n_paths,
                                  self.n_steps, return_stderr)


@dataclasses.dataclass
class CliquetOption:
    spot: float
    maturity: float
    rate: float
    vol: float
    dividend: float = 0.0
    local_floor: float = -0.05
    local_cap: float = 0.05
    global_floor: float = 0.0
    global_cap: float = 1e9
    notional: float = 100.0
    n_periods: int = 12
    n_paths: int = 100_000
    n_steps: int = 252
    seed: int = 0
    engine: str = "scan"  # "scan" (AD-capable) | "pallas" (fastest, TPU)

    def price(self, return_stderr: bool = False):
        if self.engine == "pallas":
            from ..ops.exotic_pallas import pallas_cliquet_price

            p, se, _ = pallas_cliquet_price(
                self.spot, self.maturity, self.rate, self.vol, self.dividend,
                self.local_floor, self.local_cap, self.global_floor,
                self.global_cap, self.notional, self.n_periods,
                n_paths=self.n_paths, n_steps=self.n_steps, seed=self.seed)
            return (p, se) if return_stderr else p
        return cliquet_price(self.spot, self.maturity, self.rate, self.vol,
                             jax.random.PRNGKey(self.seed), self.dividend,
                             self.local_floor, self.local_cap, self.global_floor,
                             self.global_cap, self.notional, self.n_periods,
                             self.n_paths, self.n_steps, return_stderr)


# module-level convenience functions (reference: exotic_options.py:557-606)
def price_asian_option(S, K, T, r, sigma, option_type="call", **kw):
    return AsianOption(S, K, T, r, sigma, option_type, **kw).price()


def price_barrier_option(S, K, B, T, r, sigma, option_type="call", barrier_type="up-and-out", **kw):
    return BarrierOption(S, K, B, T, r, sigma, option_type, barrier_type, **kw).price()


def price_american_lsm(S, K, T, r, sigma, option_type="put", **kw):
    return AmericanOptionLSM(S, K, T, r, sigma, option_type, **kw).price()


def price_lookback_option(S, K, T, r, sigma, option_type="call", floating=True, **kw):
    return LookbackOption(S, K, T, r, sigma, option_type, floating, **kw).price()


def range_accrual_closed_form(spot, lower, upper, maturity, rate, vol,
                              dividend=0.0, notional=100.0,
                              n_steps: int = 252):
    """EXACT price of the discretely-monitored range-accrual note under
    GBM: each monitoring step contributes an independent-in-expectation
    digital pair, so

      V = df * N * (1/n) * sum_i [Phi(d2(L, t_i)) - Phi(d2(U, t_i))]

    with d2(K, t) = (ln(S0/K) + (r - q - sigma^2/2) t) / (sigma sqrt(t))
    (P(S_t >= K) = Phi(d2)). The kernel/scan engines must match this to
    MC stderr — a rare exactly-priceable path-dependent payoff."""
    from ..ops.math import norm_cdf

    t_i = jnp.arange(1, n_steps + 1, dtype=jnp.float32) * (
        jnp.float32(maturity) / n_steps)
    mu = jnp.float32(rate) - jnp.float32(dividend) - 0.5 * vol * vol
    sig_sq = vol * jnp.sqrt(t_i)

    def d2(k):
        return (jnp.log(spot / k) + mu * t_i) / sig_sq

    p_in = norm_cdf(d2(jnp.float32(lower))) - norm_cdf(d2(jnp.float32(upper)))
    return (jnp.exp(-jnp.float32(rate) * jnp.float32(maturity))
            * notional * jnp.mean(p_in))


# ---------------------------------------------------------------------------
# Double barrier (knock-out band L < S < U) — exact closed forms + scan MC
# ---------------------------------------------------------------------------
def _double_barrier_terms(spot, lower, upper, maturity, rate, vol, dividend,
                          n_images: int):
    """Shared image-expansion pieces for the double-barrier closed forms.

    The density of x = ln(S_T/S0) ABSORBED at l = ln(L/S0) < 0 < u =
    ln(U/S0) factorizes (Girsanov — the change of drift depends on the
    path only through x_T) as

      f(x) = e^{nu*x - nu^2 s^2/2} * q(x),   nu = m/sigma^2, s = sigma*sqrt(T)

    with q the DRIFTLESS absorbed density by the method of images:

      q(x) = sum_n [ phi_s(x - 2n*D) - phi_s(x - 2u + 2n*D) ],  D = u - l.

    (Both single-barrier limits check out: l -> -inf leaves phi(x) -
    phi(x-2u); u -> +inf leaves phi(x) - phi(x-2l).) Every payoff integral
    then reduces to sums of J_beta(c) = int e^{beta*x} phi_s(x-c) dx =
    e^{beta*c + beta^2 s^2/2} * [Phi((hi-c-beta*s^2)/s) - Phi((lo-c-beta*s^2)/s)].

    Returns (l, u, s, nu, pref, j_integral) where j_integral(beta, lo, hi)
    sums the +/- image terms over n in [-n_images, n_images] and ``pref``
    is the Girsanov constant e^{-nu^2 s^2/2}.
    """
    spot = jnp.asarray(spot, jnp.float64) if jax.config.jax_enable_x64 \
        else jnp.asarray(spot, jnp.float32)
    one = jnp.ones_like(spot)
    l = jnp.log(lower / spot * one)
    u = jnp.log(upper / spot * one)
    t = jnp.maximum(jnp.asarray(maturity, spot.dtype), 1e-12)
    s = vol * jnp.sqrt(t)
    m = rate - dividend - 0.5 * vol * vol
    nu = m / (vol * vol)
    pref = jnp.exp(-0.5 * nu * nu * s * s)
    delta = u - l

    def j_integral(beta, lo, hi):
        total = 0.0
        for n in range(-n_images, n_images + 1):
            for c, sign in ((2.0 * n * delta, 1.0),
                            (2.0 * u - 2.0 * n * delta, -1.0)):
                amp = jnp.exp(beta * c + 0.5 * beta * beta * s * s)
                total = total + sign * amp * (
                    norm_cdf((hi - c - beta * s * s) / s)
                    - norm_cdf((lo - c - beta * s * s) / s))
        return total

    return l, u, s, nu, pref, j_integral


def double_barrier_closed_form(spot, strike, lower, upper, maturity, rate,
                               vol, cp=1.0, dividend=0.0, knock: str = "out",
                               n_images: int = 8):
    """EXACT continuously-monitored double-barrier option under GBM.

    Knock-out: vanilla payoff at T iff the path never leaves (lower,
    upper). Image expansion of the absorbed density (see
    :func:`_double_barrier_terms`); terms decay like exp(-(2nD)^2/2s^2),
    so ``n_images=8`` is far past f64 convergence for any practical band.
    Knock-in follows by exact in-out parity against Black-Scholes.

    A capability the reference lacks entirely (its barrier pricer is
    single-barrier MC, ``src/pricing_models/exotic_options.py:174``). The
    discrete-monitoring MC engines are compared against this formula with
    both barriers Broadie-Glasserman-Kou shifted (U e^{+0.5826 sigma
    sqrt(dt)}, L e^{-0.5826 sigma sqrt(dt)}).
    """
    if knock not in ("out", "in"):
        raise ValidationError("knock must be 'out' or 'in'")
    if not (0.0 < lower < upper):
        raise ValidationError("need 0 < lower < upper")
    l, u, s, nu, pref, j_int = _double_barrier_terms(
        spot, lower, upper, maturity, rate, vol, dividend, n_images)
    k = jnp.log(jnp.asarray(strike, l.dtype) / spot)
    df = jnp.exp(-rate * jnp.asarray(maturity, l.dtype))
    if cp > 0:
        lo, hi = jnp.maximum(l, k), u
    else:
        lo, hi = l, jnp.minimum(u, k)
    lo = jnp.minimum(lo, hi)  # empty exercise region -> zero integral
    ko = df * pref * cp * (spot * j_int(nu + 1.0, lo, hi)
                           - strike * j_int(nu, lo, hi))
    ko = jnp.where((spot <= lower) | (spot >= upper), 0.0, ko)
    if knock == "out":
        return ko
    from .black_scholes import bs_price

    return bs_price(spot, strike, maturity, rate, vol, cp, dividend) - ko


def double_no_touch_closed_form(spot, lower, upper, maturity, rate, vol,
                                dividend=0.0, cash: float = 1.0,
                                n_images: int = 8):
    """EXACT double-no-touch digital (continuous monitoring): pays ``cash``
    at expiry iff the path never leaves (lower, upper). The complementary
    double ONE-touch (cash at expiry if EITHER barrier is hit) is
    ``df*cash - this`` by construction."""
    if not (0.0 < lower < upper):
        raise ValidationError("need 0 < lower < upper")
    l, u, s, nu, pref, j_int = _double_barrier_terms(
        spot, lower, upper, maturity, rate, vol, dividend, n_images)
    df = jnp.exp(-rate * jnp.asarray(maturity, l.dtype))
    p_stay = pref * j_int(nu, l, u)
    p_stay = jnp.where((spot <= lower) | (spot >= upper), 0.0,
                       jnp.clip(p_stay, 0.0, 1.0))
    return df * cash * p_stay


@functools.partial(jax.jit, static_argnames=("n_paths", "n_steps", "knock",
                                             "continuous", "return_stderr"))
def double_barrier_price(spot, strike, lower, upper, maturity, rate, vol, key,
                         cp=1.0, dividend=0.0, n_paths: int = 100_000,
                         n_steps: int = 64, knock: str = "out",
                         continuous: bool = False,
                         return_stderr: bool = False):
    """Double-barrier option by the scan MC engine.

    ``continuous=False``: discrete monitoring at every step (the crossing
    indicator ORs both barriers). ``continuous=True``: per-step survival
    multiplies the two one-sided Brownian-bridge non-crossing
    probabilities (1-p_U)(1-p_L) — exact up to same-interval
    double-crossing terms O(exp(-2 ln(U/L)^2 / sigma^2 dt)), negligible
    unless the band is within a step's reach of BOTH sides. Oracle:
    :func:`double_barrier_closed_form`.
    """
    if knock not in ("out", "in"):
        raise ValidationError("knock must be 'out' or 'in'")

    if not continuous:
        def init(s0):
            return (s0 <= lower) | (s0 >= upper)

        def update(crossed, s, i):
            return crossed | (s <= lower) | (s >= upper)

        terminal, crossed = _gbm_scan(key, spot, maturity, rate, dividend,
                                      vol, n_paths, n_steps, init, update)
        survival = (~crossed).astype(jnp.float32)
    else:
        dt = maturity / n_steps
        inv_sig2dt = 1.0 / jnp.maximum(vol * vol * dt, 1e-12)

        def init(s0):
            alive0 = jnp.where((s0 <= lower) | (s0 >= upper), 0.0, 1.0)
            return (alive0, s0)

        def update(stats, s, i):
            surv, s_prev = stats
            hit = (s <= lower) | (s >= upper)
            a_u = jnp.log(upper / jnp.maximum(s_prev, 1e-12))
            b_u = jnp.log(upper / jnp.maximum(s, 1e-12))
            p_u = jnp.exp(-2.0 * a_u * b_u * inv_sig2dt)
            a_l = jnp.log(lower / jnp.maximum(s_prev, 1e-12))
            b_l = jnp.log(lower / jnp.maximum(s, 1e-12))
            p_l = jnp.exp(-2.0 * a_l * b_l * inv_sig2dt)
            p_stay = (1.0 - jnp.clip(p_u, 0.0, 1.0)) * \
                (1.0 - jnp.clip(p_l, 0.0, 1.0))
            p_stay = jnp.where(hit, 0.0, p_stay)
            return (surv * p_stay, s)

        terminal, (survival, _) = _gbm_scan(key, spot, maturity, rate,
                                            dividend, vol, n_paths, n_steps,
                                            init, update)

    vanilla = jnp.maximum(cp * (terminal - strike), 0.0)
    pay = vanilla * (survival if knock == "out" else (1.0 - survival))
    price, stderr = _discounted_mean_stderr(pay, rate, maturity)
    return (price, stderr) if return_stderr else price


@functools.partial(jax.jit, static_argnames=("n_paths", "n_steps", "touch",
                                             "pay", "return_stderr"))
def double_touch_price(spot, lower, upper, maturity, rate, vol, key,
                       dividend=0.0, cash: float = 1.0,
                       n_paths: int = 100_000, n_steps: int = 64,
                       touch: str = "no", pay: str = "expiry",
                       return_stderr: bool = False):
    """Double one-touch / no-touch digital, discrete monitoring.
    ``pay="expiry"`` (default): cash at expiry on the hit / no-hit event;
    complement identity on shared paths: one + no == df*cash EXACTLY.
    ``pay="hit"`` (one-touch only): cash AT the first band exit.
    Continuous-monitoring oracle: :func:`double_no_touch_closed_form`
    (BGK-shift both barriers for the discrete comparison)."""
    if touch not in ("one", "no"):
        raise ValidationError("touch must be 'one' or 'no'")
    if pay not in ("expiry", "hit"):
        raise ValidationError("pay must be 'expiry' or 'hit'")
    if pay == "hit" and touch == "no":
        raise ValidationError("a no-touch pays at expiry by definition")
    rdt = rate * maturity / n_steps

    def init(s0):
        h = ((s0 <= lower) | (s0 >= upper)).astype(jnp.float32)
        return (h, h)  # (hit flag, df-at-first-hit; df(0)=1)

    def update(stats, s, i):
        h, dfh = stats
        now = ((s <= lower) | (s >= upper)).astype(jnp.float32)
        newly = (1.0 - h) * now
        dfh = dfh + newly * jnp.exp(-rdt * (i + 1.0))
        return (jnp.maximum(h, now), dfh)

    _, (hit, dfh) = _gbm_scan(key, spot, maturity, rate, dividend, vol,
                              n_paths, n_steps, init, update)
    if pay == "hit":
        pay_arr = cash * dfh
        price, stderr = _discounted_mean_stderr(pay_arr, 0.0, maturity)
    else:
        pay_arr = cash * (hit if touch == "one" else (1.0 - hit))
        price, stderr = _discounted_mean_stderr(pay_arr, rate, maturity)
    return (price, stderr) if return_stderr else price


def range_accrual_price(spot, lower, upper, maturity, rate, vol, key,
                        dividend=0.0, notional=100.0,
                        n_paths: int = 100_000, n_steps: int = 252,
                        antithetic: bool = True,
                        return_stderr: bool = False):
    """Range-accrual (corridor) note by the scan MC engine — the oracle
    cross-check for :func:`range_accrual_closed_form` and the Pallas
    kernel (`ops/exotic_pallas.pallas_range_accrual_price`)."""
    if not 0.0 <= lower < upper:
        raise ValidationError("need 0 <= lower < upper")

    def init(s0):
        return jnp.zeros_like(s0)

    def update(stat, s, i):
        return stat + jnp.where((s >= lower) & (s <= upper), 1.0, 0.0)

    _, acc = _gbm_scan(key, spot, maturity, rate, dividend, vol, n_paths,
                       n_steps, init, update, antithetic)
    pay = notional * acc / n_steps
    price, stderr = _discounted_mean_stderr(pay, rate, maturity)
    return (price, stderr) if return_stderr else price


# ---------------------------------------------------------------------------
# Digital touches: at-expiry and AT-HIT (American binary) conventions,
# plus proper at-hit knock-out rebates. Beyond reference: the reference's
# barrier pricer has no rebate or touch contracts at all
# (``src/pricing_models/exotic_options.py:174-224``).
# ---------------------------------------------------------------------------
def one_touch_closed_form(spot, barrier, maturity, rate, vol, dividend=0.0,
                          cash: float = 1.0, pay: str = "expiry"):
    """EXACT continuously-monitored one-touch digital under GBM.

    ``pay="expiry"``: cash at expiry if the barrier was touched
    (``df * P(hit)`` via the reflection formula). ``pay="hit"``: cash AT
    the first hit time (the American binary / Rubinstein–Reiner
    rebate-at-hit formula — the market-standard one-touch convention):

        V = cash * [ (B/S)^(mu+lam) * N(eta z)
                     + (B/S)^(mu-lam) * N(eta z - 2 eta lam sig sqrt(T)) ]
        mu = (r - q - sig^2/2)/sig^2,  lam = sqrt(mu^2 + 2 r/sig^2),
        z = ln(B/S)/(sig sqrt(T)) + lam sig sqrt(T),
        eta = +1 for a down barrier (S > B), -1 for up.

    At r = 0 both conventions coincide (cash paid whenever, undiscounted).
    A spot already at/through the barrier pays immediately (cash; df*cash
    for the expiry convention).
    """
    if pay not in ("expiry", "hit"):
        raise ValidationError("pay must be 'expiry' or 'hit'")
    s = jnp.asarray(spot, jnp.result_type(float))
    b = jnp.asarray(barrier, s.dtype)
    t = jnp.asarray(maturity, s.dtype)
    sig = jnp.asarray(vol, s.dtype)
    sqt = sig * jnp.sqrt(t)
    up = b >= s
    m = jnp.log(b / s)
    hit0 = jnp.where(up, m <= 0.0, m >= 0.0)
    if pay == "expiry":
        nu = rate - dividend - 0.5 * sig * sig
        # P(hit): reflection formula for the running extremum of BM+drift
        arg1 = jnp.where(up, (-m + nu * t), (m - nu * t)) / sqt
        arg2 = (-jnp.abs(m) - jnp.sign(m) * 0.0 - nu * t * jnp.where(up, 1.0, -1.0)) / sqt
        p_hit = norm_cdf(arg1) + jnp.exp(2.0 * nu * m / (sig * sig)) \
            * norm_cdf(jnp.where(up, (-m - nu * t), (m + nu * t)) / sqt)
        del arg2
        df = jnp.exp(-rate * t)
        return df * cash * jnp.where(hit0, 1.0, jnp.clip(p_hit, 0.0, 1.0))
    mu = (rate - dividend - 0.5 * sig * sig) / (sig * sig)
    lam = jnp.sqrt(mu * mu + 2.0 * rate / (sig * sig))
    eta = jnp.where(up, -1.0, 1.0)
    z = m / sqt + lam * sqt
    ratio = b / s
    val = (ratio ** (mu + lam) * norm_cdf(eta * z)
           + ratio ** (mu - lam) * norm_cdf(eta * z - 2.0 * eta * lam * sqt))
    return cash * jnp.where(hit0, 1.0, jnp.clip(val, 0.0, 1.0))


@functools.partial(jax.jit, static_argnames=("n_paths", "n_steps", "touch",
                                             "pay", "return_stderr"))
def one_touch_price(spot, barrier, maturity, rate, vol, key, dividend=0.0,
                    cash: float = 1.0, n_paths: int = 100_000,
                    n_steps: int = 64, touch: str = "one",
                    pay: str = "expiry", return_stderr: bool = False):
    """Single one-touch/no-touch digital by the scan engine, discrete
    monitoring; ``pay="hit"`` (one-touch only) carries the discount factor
    AT the first hit step. Oracle: :func:`one_touch_closed_form` with both
    barriers BGK-shifted for the discrete comparison."""
    if touch not in ("one", "no"):
        raise ValidationError("touch must be 'one' or 'no'")
    if pay not in ("expiry", "hit"):
        raise ValidationError("pay must be 'expiry' or 'hit'")
    if pay == "hit" and touch == "no":
        raise ValidationError("a no-touch pays at expiry by definition")
    up = jnp.asarray(barrier) >= jnp.asarray(spot)  # traced-safe side pick
    rdt = rate * maturity / n_steps

    def _hit(s):
        return jnp.where(up, s >= barrier, s <= barrier)

    def init(s0):
        h = _hit(s0).astype(jnp.float32)
        return (h, h)  # (hit flag, df-at-first-hit; df(0)=1)

    def update(stats, s, i):
        h, dfh = stats
        now = _hit(s).astype(jnp.float32)
        newly = (1.0 - h) * now
        dfh = dfh + newly * jnp.exp(-rdt * (i + 1.0))
        return (jnp.maximum(h, now), dfh)

    _, (hit, dfh) = _gbm_scan(key, spot, maturity, rate, dividend, vol,
                              n_paths, n_steps, init, update)
    if pay == "hit":
        pay_arr = cash * dfh  # already discounted: no terminal df
        price, stderr = _discounted_mean_stderr(pay_arr, 0.0, maturity)
    else:
        pay_arr = cash * (hit if touch == "one" else (1.0 - hit))
        price, stderr = _discounted_mean_stderr(pay_arr, rate, maturity)
    return (price, stderr) if return_stderr else price


@functools.partial(jax.jit, static_argnames=("n_paths", "n_steps",
                                             "barrier_type",
                                             "return_stderr"))
def barrier_rebate_price(spot, strike, barrier, maturity, rate, vol, key,
                         cp=1.0, dividend=0.0, rebate: float = 1.0,
                         n_paths: int = 100_000, n_steps: int = 64,
                         barrier_type: str = "up-and-out",
                         return_stderr: bool = False):
    """Barrier option with the MARKET-STANDARD rebate conventions on
    shared paths: knock-out pays ``rebate`` AT the first hit; knock-in
    pays ``rebate`` at EXPIRY if never knocked in. (``barrier_price``'s
    ``rebate`` kwarg discounts both legs at expiry — kept for
    reference parity.) Discrete monitoring."""
    parts = barrier_type.split("-")
    if len(parts) != 3 or parts[0] not in ("up", "down") \
            or parts[2] not in ("in", "out"):
        raise ValidationError(f"unknown barrier type {barrier_type!r}")
    up = parts[0] == "up"
    knock_in = parts[2] == "in"
    rdt = rate * maturity / n_steps

    def init(s0):
        hit0 = (s0 >= barrier) if up else (s0 <= barrier)
        h = hit0.astype(jnp.float32)
        return (h, h)

    def update(stats, s, i):
        h, dfh = stats
        now = ((s >= barrier) if up else (s <= barrier)).astype(jnp.float32)
        newly = (1.0 - h) * now
        dfh = dfh + newly * jnp.exp(-rdt * (i + 1.0))
        return (jnp.maximum(h, now), dfh)

    terminal, (hit, dfh) = _gbm_scan(key, spot, maturity, rate, dividend,
                                     vol, n_paths, n_steps, init, update)
    df_t = jnp.exp(-rate * maturity)
    vanilla = jnp.maximum(cp * (terminal - strike), 0.0)
    if knock_in:
        pay = df_t * (vanilla * hit + rebate * (1.0 - hit))
    else:
        pay = df_t * vanilla * (1.0 - hit) + rebate * dfh
    price = pay.mean()
    stderr = jnp.std(pay) / jnp.sqrt(pay.shape[0])
    return (price, stderr) if return_stderr else price
