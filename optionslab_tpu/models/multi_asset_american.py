"""Certified [lower, upper] bracket for MULTI-ASSET Bermudan options.

The d-asset extension of the certification family (GBM grid-dual in
``american.py``, Heston in ``heston_american.py``, local-vol in
``local_vol_american.py``): the canonical product is the Bermudan
MAX-CALL on d dividend-paying assets — the Broadie–Glasserman (1997) /
Andersen–Broadie (2004) benchmark, where early exercise is genuinely
optimal (the dividend yield makes waiting costly) and no PDE engine
scales past d=2.

- **Lower bound**: LSM policy on order-statistic features (sorted asset
  prices — the payoff depends on the order stats only, so the regression
  basis matches the problem's symmetry), valued OUT-OF-SAMPLE.
- **Upper bound**: value-surface dual (Glasserman ch. 8): an all-path
  ridge fit of the continuation value defines Ṽ; the martingale
  increment at date k is df_k·Ṽ_k(X_k) − Ê[df_k·Ṽ_k(X_k)|X_{k−1}],
  the conditional mean estimated by ANTITHETIC one-date inner
  transitions (exact GBM — no substepping error anywhere).
  E[max_k (df_k·payoff_k − M_k)] is a true upper bound in expectation;
  inner noise only biases it UP (the safe direction).

The bracket certifies the BERMUDAN value on the date grid (the
benchmark product itself); a model-independent continuous pad like the
put's interest-on-strike bound does not exist for calls on
dividend-paying assets (the between-date exercise gain scales with the
unbounded spot), so none is quoted.

Oracles (tests): d=1, q=0 reduces to the European call (no early
exercise); the 2-asset Broadie–Glasserman table (S0=90/100/110 ->
8.075/13.902/21.345) is contained by the bracket; the lower bound
dominates the European max-call on the same dynamics.

Reference anchor: ``src/exotic_options.py`` prices only single-asset
LSM Americans; nothing multi-asset-American exists there.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..utils.exceptions import ValidationError

__all__ = ["fit_max_call_lsm", "max_call_lower", "max_call_upper",
           "max_call_bracket"]

N_FEAT = 8
N_SFEAT = 12


def _order_stats(s, kind: str = "max_call"):
    """The two payoff-relevant order statistics along the asset axis:
    (top-2 for the max-call, bottom-2 for the min-put).  For d=1 both
    stats coincide (the ridge handles the collinearity)."""
    y = jnp.sort(s, axis=-1)
    if kind == "min_put":
        y1 = y[..., 0]
        y2 = y[..., 1] if s.shape[-1] > 1 else y[..., 0]
    else:
        y1 = y[..., -1]
        y2 = y[..., -2] if s.shape[-1] > 1 else y[..., -1]
    return y1, y2


def _payoff(y1, strike, kind: str):
    return (jnp.maximum(strike - y1, 0.0) if kind == "min_put"
            else jnp.maximum(y1 - strike, 0.0))


def _features(y1, y2, ex):
    """Policy basis (ITM-only fit): polynomials in the top-2 order stats
    of S/K plus the payoff (captures the exercise-boundary kink)."""
    one = jnp.ones_like(y1)
    return jnp.stack([one, y1, y1 * y1, y1 * y1 * y1, y2, y2 * y2,
                      y1 * y2, ex], axis=-1)


def _sfeatures(y1, y2, ex):
    """Richer all-path basis for the dual's value surface."""
    one = jnp.ones_like(y1)
    a2 = y1 * y1
    b2 = y2 * y2
    return jnp.stack([one, y1, a2, a2 * y1, a2 * a2, y2, b2, y1 * y2,
                      a2 * y2, y1 * b2, ex, ex * y1], axis=-1)


@functools.partial(jax.jit, static_argnames=("n_dates", "n_paths", "d"))
def _simulate_dates(key, spots, vols, chol, rate, dividend, maturity,
                    n_dates, n_paths, d):
    """Correlated GBM at every exercise date: (n_dates+1, n_paths, d).
    Exact per-interval transitions — the only error anywhere is MC."""
    dt = maturity / n_dates
    drift = (rate - dividend - 0.5 * vols * vols) * dt
    sig_sdt = vols * jnp.sqrt(dt)

    def body(x, k):
        z = jax.random.normal(jax.random.fold_in(key, k), (n_paths, d),
                              jnp.float32)
        x = x + drift[None, :] + sig_sdt[None, :] * (z @ chol.T)
        return x, x

    x0 = jnp.zeros((n_paths, d), jnp.float32)
    _, xs = lax.scan(body, x0, jnp.arange(1, n_dates + 1))
    xs = jnp.concatenate([x0[None], xs], axis=0)
    return spots[None, None, :] * jnp.exp(xs)


def _setup(spots, vols, corr, d):
    spots = jnp.atleast_1d(jnp.asarray(spots, jnp.float32))
    vols = jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(vols, jnp.float32)),
                            (d,))
    c = np.asarray(corr, np.float64) if corr is not None else np.eye(d)
    if c.shape != (d, d):
        raise ValidationError(f"corr must be ({d}, {d}), got {c.shape}")
    try:
        chol = jnp.asarray(np.linalg.cholesky(c), jnp.float32)
    except np.linalg.LinAlgError as e:
        raise ValidationError("corr must be positive definite") from e
    return spots, vols, chol


def fit_max_call_lsm(spots, strike, maturity, rate, vols, key,
                     dividend: float = 0.0, corr=None, n_dates: int = 9,
                     n_paths: int = 100_000, kind: str = "max_call"):
    """Backward LSM on order-statistic features (f64 host solves).

    Returns (policy_coefs, surface_coefs): (n_dates+1, F) each — the
    ITM-only exercise rule and the all-path ridge value surface."""
    d = len(np.atleast_1d(spots))
    spots_j, vols_j, chol = _setup(spots, vols, corr, d)
    s_paths = _simulate_dates(key, spots_j, vols_j, chol, float(rate),
                              float(dividend), float(maturity), n_dates,
                              n_paths, d)
    s = np.asarray(s_paths, np.float64)
    k_ = float(strike)
    dt = float(maturity) / n_dates
    disc = math.exp(-float(rate) * dt)
    ys = np.sort(s, axis=-1)
    if kind == "min_put":
        y1 = ys[..., 0]
        y2 = ys[..., 1] if d > 1 else y1
        cash = np.maximum(k_ - y1[-1], 0.0)
    else:
        y1 = ys[..., -1]
        y2 = ys[..., -2] if d > 1 else y1
        cash = np.maximum(y1[-1] - k_, 0.0)
    coefs = np.zeros((n_dates + 1, N_FEAT))
    scoefs = np.zeros((n_dates + 1, N_SFEAT))
    for t in range(n_dates - 1, 0, -1):
        cash *= disc
        ex = (np.maximum(k_ - y1[t], 0.0) if kind == "min_put"
              else np.maximum(y1[t] - k_, 0.0))
        sb = np.asarray(_sfeatures(jnp.asarray(y1[t] / k_),
                                   jnp.asarray(y2[t] / k_),
                                   jnp.asarray(ex / k_)))
        ata = sb.T @ sb + 1e-7 * len(ex) * np.eye(N_SFEAT)
        scoefs[t] = np.linalg.solve(ata, sb.T @ (cash / k_))
        itm = ex > 0
        if itm.sum() > 10 * N_FEAT:
            basis = np.asarray(_features(jnp.asarray(y1[t, itm] / k_),
                                         jnp.asarray(y2[t, itm] / k_),
                                         jnp.asarray(ex[itm] / k_)))
            coef, *_ = np.linalg.lstsq(basis, cash[itm] / k_, rcond=None)
            coefs[t] = coef
            cont = basis @ coef * k_
            take = ex[itm] > cont
            idx = np.where(itm)[0][take]
            cash[idx] = ex[idx]
    return jnp.asarray(coefs, jnp.float32), jnp.asarray(scoefs, jnp.float32)


def _exercise_now(coefs, t, s, strike, n_dates, kind):
    y1, y2 = _order_stats(s, kind)
    ex = _payoff(y1, strike, kind)
    phi = _features(y1 / strike, y2 / strike, ex / strike)
    cont = (phi @ coefs[t]) * strike
    last = t >= n_dates
    return ex, (ex > 0.0) & (last | (ex > cont))


def _surface_value(scoefs, t, s, strike, n_dates, vmax, kind):
    """V~_t = max(payoff, clipped continuation fit); zero continuation at
    the last date. ``vmax`` bounds the polynomial wings (min-put: K;
    max-call: a deterministic 8-sigma envelope of the terminal max)."""
    y1, y2 = _order_stats(s, kind)
    ex = _payoff(y1, strike, kind)
    phi = _sfeatures(y1 / strike, y2 / strike, ex / strike)
    cont = jnp.clip((phi @ scoefs[t]) * strike, 0.0, vmax)
    cont = jnp.where(t >= n_dates, 0.0, cont)
    return jnp.maximum(ex, cont)


@functools.partial(jax.jit, static_argnames=("n_dates", "n_paths", "d",
                                             "kind"))
def _lower_pipeline(coefs, key, spots, vols, chol, strike, maturity, rate,
                    dividend, n_dates, n_paths, d, kind):
    s_paths = _simulate_dates(key, spots, vols, chol, rate, dividend,
                              maturity, n_dates, n_paths, d)
    dt = maturity / n_dates

    def body(carry, t):
        alive, cash = carry
        ex, take = _exercise_now(coefs, t, s_paths[t], strike, n_dates,
                                 kind)
        pay_now = alive & take
        cash = jnp.where(pay_now, jnp.exp(-rate * dt * t) * ex, cash)
        return (alive & ~take, cash), None

    n = s_paths.shape[1]
    (_, cash), _ = lax.scan(body, (jnp.ones(n, bool),
                                   jnp.zeros(n, jnp.float32)),
                            jnp.arange(1, n_dates + 1))
    return cash.mean(), cash.std(ddof=1) / jnp.sqrt(1.0 * n)


def max_call_lower(coefs, key, spots, strike, maturity, rate, vols,
                   dividend: float = 0.0, corr=None, n_dates: int = 9,
                   n_paths: int = 200_000, kind: str = "max_call"):
    """Out-of-sample policy value: (lower bound, stderr)."""
    d = len(np.atleast_1d(spots))
    spots_j, vols_j, chol = _setup(spots, vols, corr, d)
    m, se = _lower_pipeline(coefs, key, spots_j, vols_j, chol,
                            float(strike), float(maturity), float(rate),
                            float(dividend), n_dates, n_paths, d, kind)
    return float(m), float(se)


@functools.partial(jax.jit, static_argnames=("n_dates", "n_outer", "n_inner",
                                             "d", "kind"))
def _upper_pipeline(scoefs, key, spots, vols, chol, strike, maturity, rate,
                    dividend, n_dates, n_outer, n_inner, d, kind):
    dt = maturity / n_dates
    drift = (rate - dividend - 0.5 * vols * vols) * dt
    sig_sdt = vols * jnp.sqrt(dt)
    k_outer, k_dual = jax.random.split(jax.random.fold_in(key, 11))
    s_out = _simulate_dates(k_outer, spots, vols, chol, rate, dividend,
                            maturity, n_dates, n_outer, d)
    half = n_inner // 2
    # polynomial-wing cap for the value surface: a DETERMINISTIC constant
    # (it must not peek at the paths, or the dual martingale property
    # breaks) — generous 8-sigma envelope of the terminal max
    if kind == "min_put":
        vmax = strike  # a put on the min is worth at most K
    else:
        vmax = (jnp.max(spots) * jnp.exp((jnp.abs(rate - dividend)
                                          + 8.0 * jnp.max(vols)
                                          / jnp.sqrt(maturity)) * maturity))

    def dual_body(carry, t):
        m_prev, best = carry
        vk = jnp.exp(-rate * dt * t) * _surface_value(
            scoefs, t, s_out[t], strike, n_dates, vmax, kind)
        # antithetic one-date inner transitions from X_{t-1}
        z = jax.random.normal(jax.random.fold_in(k_dual, t),
                              (n_outer, half, d), jnp.float32)
        zc = jnp.einsum("ohd,kd->ohk", z, chol)
        step = drift[None, None, :] + sig_sdt[None, None, :] * zc
        s_prev = s_out[t - 1][:, None, :]
        s_in = jnp.concatenate([s_prev * jnp.exp(step),
                                s_prev * jnp.exp(2.0 * drift[None, None, :]
                                                 - step)], axis=1)
        # note: the antithetic mate uses drift - sig*z (same law)
        v_in = _surface_value(scoefs, t, s_in, strike, n_dates, vmax, kind)
        t2 = jnp.exp(-rate * dt * t) * v_in.mean(axis=1)
        m_t = m_prev + vk - t2
        y1, _ = _order_stats(s_out[t], kind)
        cand = jnp.exp(-rate * dt * t) * _payoff(y1, strike, kind) - m_t
        best = jnp.maximum(best, cand)
        return (m_t, best), None

    y1_0, _ = _order_stats(s_out[0], kind)
    ex0 = _payoff(y1_0, strike, kind)
    (m_n, best), _ = lax.scan(dual_body,
                              (jnp.zeros(n_outer, jnp.float32), ex0),
                              jnp.arange(1, n_dates + 1))
    return best.mean(), best.std(ddof=1) / jnp.sqrt(1.0 * n_outer)


def max_call_upper(scoefs, key, spots, strike, maturity, rate, vols,
                   dividend: float = 0.0, corr=None, n_dates: int = 9,
                   n_outer: int = 2048, n_inner: int = 512,
                   kind: str = "max_call"):
    """Value-surface dual upper bound: (upper, stderr)."""
    d = len(np.atleast_1d(spots))
    spots_j, vols_j, chol = _setup(spots, vols, corr, d)
    m, se = _upper_pipeline(scoefs, key, spots_j, vols_j, chol,
                            float(strike), float(maturity), float(rate),
                            float(dividend), n_dates, n_outer, n_inner, d,
                            kind)
    return float(m), float(se)


def max_call_bracket(spots, strike, maturity, rate, vols,
                     dividend: float = 0.0, corr=None, n_dates: int = 9,
                     n_fit: int = 100_000, n_lower: int = 200_000,
                     n_outer: int = 2048, n_inner: int = 512,
                     seed: int = 0, kind: str = "max_call") -> dict:
    """Certified Bermudan max-call bracket on d correlated assets.

    Returns {lower, lower_se, upper, upper_se, width, n_dates}: the
    Bermudan value on the ``n_dates`` grid lies in [lower, upper] up to
    the quoted MC stderrs.  Defaults reproduce the Broadie–Glasserman /
    Andersen–Broadie benchmark setup (d=2, T=3, 9 exercise dates,
    r=5%, q=10%, sigma=20%, rho=0).
    """
    if float(maturity) <= 0:
        raise ValidationError("maturity must be positive")
    if kind not in ("max_call", "min_put"):
        raise ValidationError(f"kind must be max_call|min_put: {kind!r}")
    key = jax.random.PRNGKey(seed)
    kf, kl, ku = jax.random.split(key, 3)
    coefs, scoefs = fit_max_call_lsm(spots, strike, maturity, rate, vols,
                                     kf, dividend, corr, n_dates, n_fit,
                                     kind=kind)
    lo, lo_se = max_call_lower(coefs, kl, spots, strike, maturity, rate,
                               vols, dividend, corr, n_dates, n_lower,
                               kind=kind)
    up, up_se = max_call_upper(scoefs, ku, spots, strike, maturity, rate,
                               vols, dividend, corr, n_dates, n_outer,
                               n_inner, kind=kind)
    return {"lower": lo, "lower_se": lo_se, "upper": up, "upper_se": up_se,
            "width": up - lo, "n_dates": n_dates, "kind": kind}
