"""Pricing validation: parity, bounds, Greek consistency, MC convergence.

Reference capabilities covered (SURVEY.md §2.2, ``src/pricing_models/
validation.py:21-239``): put-call parity check, arbitrage price bounds,
Greeks sign/range consistency, smile butterfly check via non-uniform FD,
MC convergence harness (σ ~ 1/√N). These are first-class library functions
AND the basis of the test suite (SURVEY.md §7 invariant #4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..types import ContractBatch
from .black_scholes import bs_price
from .monte_carlo import MCConfig, mc_price_result


def check_put_call_parity(call_price, put_price, spot, strike, maturity, rate,
                          dividend=0.0, atol: float = 1e-5) -> dict:
    """C - P = S·e^{-qT} - K·e^{-rT} (reference: validation.py:21)."""
    lhs = jnp.asarray(call_price) - jnp.asarray(put_price)
    rhs = (jnp.asarray(spot) * jnp.exp(-jnp.asarray(dividend) * jnp.asarray(maturity))
           - jnp.asarray(strike) * jnp.exp(-jnp.asarray(rate) * jnp.asarray(maturity)))
    err = jnp.abs(lhs - rhs)
    return {
        "passed": bool(jnp.all(err <= atol)),
        "max_error": float(jnp.max(err)),
        "errors": np.asarray(err),
    }


def check_price_bounds(price, spot, strike, maturity, rate, cp=1.0, dividend=0.0,
                       atol: float = 1e-10) -> dict:
    """European no-arbitrage bounds (reference: validation.py:55):
    call: max(S·e^{-qT} - K·e^{-rT}, 0) <= C <= S·e^{-qT}
    put:  max(K·e^{-rT} - S·e^{-qT}, 0) <= P <= K·e^{-rT}
    """
    p = jnp.asarray(price)
    df_r = jnp.exp(-jnp.asarray(rate) * jnp.asarray(maturity))
    df_q = jnp.exp(-jnp.asarray(dividend) * jnp.asarray(maturity))
    s, k = jnp.asarray(spot) * df_q, jnp.asarray(strike) * df_r
    cp = jnp.asarray(cp)
    lower = jnp.maximum(cp * (s - k), 0.0)
    upper = jnp.where(cp > 0, s, k)
    ok = (p >= lower - atol) & (p <= upper + atol)
    return {"passed": bool(jnp.all(ok)), "violations": np.asarray(~ok)}


def check_greeks_consistency(greeks: dict, cp=1.0) -> dict:
    """Sign/range sanity (reference: validation.py:105): 0<=Δ_call<=1,
    -1<=Δ_put<=0, Γ>=0, vega>=0; rho sign follows cp."""
    cp = np.asarray(cp)
    delta = np.asarray(greeks["delta"])
    issues = []
    if np.any((cp > 0) & ((delta < -1e-9) | (delta > 1 + 1e-9))):
        issues.append("call delta outside [0, 1]")
    if np.any((cp < 0) & ((delta < -1 - 1e-9) | (delta > 1e-9))):
        issues.append("put delta outside [-1, 0]")
    if "gamma" in greeks and np.any(np.asarray(greeks["gamma"]) < -1e-9):
        issues.append("negative gamma")
    if "vega" in greeks and np.any(np.asarray(greeks["vega"]) < -1e-9):
        issues.append("negative vega")
    if "rho" in greeks and np.any(np.sign(np.asarray(greeks["rho"])) * cp < -1e-9):
        issues.append("rho sign inconsistent with option type")
    return {"passed": not issues, "issues": issues}


def check_smile_butterfly(log_strikes, total_variance, tol: float = 1e-8) -> dict:
    """Butterfly (density) positivity on one smile slice — thin wrapper over
    the surface module's non-uniform-grid check (reference: validation.py:151)."""
    from ..surface.arbitrage import butterfly_check

    g, mask = butterfly_check(log_strikes, total_variance, tol)
    return {
        "passed": not bool(jnp.any(mask)),
        "min_g": float(jnp.min(g)),
        "violations": np.asarray(mask),
    }


def mc_convergence_study(spot=100.0, strike=100.0, maturity=1.0, rate=0.05,
                         vol=0.2, path_counts=(1_000, 4_000, 16_000, 64_000),
                         seed: int = 0, antithetic: bool = False) -> dict:
    """Empirical σ ~ 1/√N harness (reference: validation.py:202-239).

    Returns per-N absolute errors vs BS and the fitted log-log slope
    (should be ≈ -0.5).
    """
    exact = float(bs_price(spot, strike, maturity, rate, vol, 1.0, 0.0))
    batch = ContractBatch.make(spot, strike, maturity, rate, vol, "call")
    errors, stderrs = [], []
    for i, n in enumerate(path_counts):
        res = mc_price_result(batch, jax.random.PRNGKey(seed + i),
                              MCConfig(n_paths=int(n), antithetic=antithetic))
        errors.append(abs(float(res.price) - exact))
        stderrs.append(float(res.std_error))
    log_n = np.log(np.asarray(path_counts, np.float64))
    log_se = np.log(np.asarray(stderrs, np.float64))
    slope = float(np.polyfit(log_n, log_se, 1)[0])
    return {
        "path_counts": list(path_counts),
        "abs_errors": errors,
        "stderrs": stderrs,
        "stderr_slope": slope,  # ≈ -0.5
        "converged": bool(abs(slope + 0.5) < 0.15),
    }


def validate_pricer(price_fn, n_points: int = 32, seed: int = 0,
                    atol_parity: float = 5e-3, atol_bounds: float = 1e-10) -> dict:
    """End-to-end pricer audit: random parameter sweep through parity,
    bounds, and Greek checks. ``price_fn(S,K,T,r,sigma,cp,q) -> price``."""
    rng = np.random.default_rng(seed)
    S = rng.uniform(50, 150, n_points)
    K = rng.uniform(50, 150, n_points)
    T = rng.uniform(0.05, 2.0, n_points)
    r = rng.uniform(0.0, 0.08, n_points)
    sig = rng.uniform(0.1, 0.5, n_points)
    calls = np.asarray(price_fn(S, K, T, r, sig, 1.0, 0.0))
    puts = np.asarray(price_fn(S, K, T, r, sig, -1.0, 0.0))
    parity = check_put_call_parity(calls, puts, S, K, T, r, atol=atol_parity)
    bounds_c = check_price_bounds(calls, S, K, T, r, 1.0, atol=atol_bounds)
    bounds_p = check_price_bounds(puts, S, K, T, r, -1.0, atol=atol_bounds)
    return {
        "parity": parity,
        "call_bounds": bounds_c,
        "put_bounds": bounds_p,
        "passed": parity["passed"] and bounds_c["passed"] and bounds_p["passed"],
    }
