"""Quasi-Monte Carlo exotics with Brownian-bridge path construction.

Plain time-ordered increments waste Sobol's best dimensions on the least
important coordinates. The Brownian bridge assigns dimension 0 to the
TERMINAL point, dimension 1 to the midpoint, then recursively bisects —
the first few (best-stratified) Sobol dimensions capture most of the
path's total variance, which is what makes QMC effective for
path-dependent payoffs (PAPERS.md: QMC-for-Greeks literature).

Scope: moderate path counts (QMC shines at N ≤ ~2^17, where it beats
pseudo-random error by an order of magnitude); the path matrix is
materialized (N × steps — fine at QMC scales). For brute-force N, use the
Pallas kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rng import MAX_SOBOL_DIM, qmc_normals
from ..utils.config import EPS_TIME
from ..utils.exceptions import ValidationError


@functools.lru_cache(maxsize=32)
def _bridge_order(n_steps: int):
    """Static Brownian-bridge construction schedule.

    Returns arrays (index, left, right) such that filling W[index[i]] from
    W[left[i]], W[right[i]] in order builds the whole path; entry 0 is the
    terminal point (left = start). Indices are 1-based times 1..n_steps on a
    grid with W[0] = 0.
    """
    filled = [0, n_steps]
    index, left, right = [n_steps], [0], [-1]  # terminal: unconditioned (right=-1)
    segments = [(0, n_steps)]
    while segments:
        nxt = []
        for lo, hi in segments:
            if hi - lo <= 1:
                continue
            mid = (lo + hi) // 2
            index.append(mid)
            left.append(lo)
            right.append(hi)
            filled.append(mid)
            nxt.append((lo, mid))
            nxt.append((mid, hi))
        segments = nxt
    return (np.asarray(index, np.int32), np.asarray(left, np.int32),
            np.asarray(right, np.int32))


def brownian_bridge_paths(z, maturity):
    """(n, n_steps) QMC normals → (n, n_steps+1) Brownian path W (W[:,0]=0).

    Dimension j of ``z`` drives the j-th bridge refinement (terminal first).
    """
    n, m = z.shape
    t = jnp.asarray(maturity, z.dtype)
    dt = t / m
    index, left, right = _bridge_order(m)
    w = jnp.zeros((n, m + 1), z.dtype)
    # terminal point
    w = w.at[:, m].set(jnp.sqrt(t) * z[:, 0])
    for j in range(1, len(index)):
        i, lo, hi = int(index[j]), int(left[j]), int(right[j])
        t_i, t_lo, t_hi = i * dt, lo * dt, hi * dt
        frac = (t_i - t_lo) / (t_hi - t_lo)
        mean = w[:, lo] + frac * (w[:, hi] - w[:, lo])
        var = (t_hi - t_i) * (t_i - t_lo) / (t_hi - t_lo)
        w = w.at[:, i].set(mean + jnp.sqrt(var) * z[:, j])
    return w


def _qmc_gbm_paths(spot, maturity, rate, dividend, vol, n_paths, n_steps, key,
                   dtype=jnp.float32):
    if n_steps > MAX_SOBOL_DIM:
        raise ValidationError(
            f"QMC exotics support n_steps <= {MAX_SOBOL_DIM} (Sobol table); "
            f"use the scan/Pallas engines beyond that")
    z = qmc_normals(n_paths, n_steps, key=key, dtype=dtype)
    w = brownian_bridge_paths(z, maturity)
    times = jnp.linspace(0.0, maturity, n_steps + 1).astype(dtype)
    drift = (rate - dividend - 0.5 * vol * vol) * times
    return spot * jnp.exp(drift[None, :] + vol * w)


@functools.partial(jax.jit, static_argnames=("n_paths", "n_steps", "averaging",
                                             "return_stderr"))
def qmc_asian_price(spot, strike, maturity, rate, vol, key, cp=1.0, dividend=0.0,
                    n_paths: int = 65_536, n_steps: int = 64,
                    averaging: str = "arithmetic", return_stderr: bool = False):
    """Arithmetic/geometric Asian under Brownian-bridge Sobol."""
    paths = _qmc_gbm_paths(spot, maturity, rate, dividend, vol, n_paths, n_steps, key)
    fixings = paths[:, 1:]
    avg = jnp.exp(jnp.log(fixings).mean(axis=1)) if averaging == "geometric" \
        else fixings.mean(axis=1)
    pay = jnp.maximum(cp * (avg - strike), 0.0)
    df = jnp.exp(-rate * jnp.maximum(maturity, EPS_TIME))
    price = df * pay.mean()
    if return_stderr:
        # scramble-based error proxy: stderr of the pseudo-random formula is
        # PESSIMISTIC for QMC; reported for interface parity
        return price, df * pay.std(ddof=1) / jnp.sqrt(n_paths * 1.0)
    return price


@functools.partial(jax.jit, static_argnames=("n_paths", "n_steps", "floating"))
def qmc_lookback_price(spot, strike, maturity, rate, vol, key, cp=1.0, dividend=0.0,
                       n_paths: int = 65_536, n_steps: int = 64,
                       floating: bool = True):
    paths = _qmc_gbm_paths(spot, maturity, rate, dividend, vol, n_paths, n_steps, key)
    mn = paths.min(axis=1)
    mx = paths.max(axis=1)
    terminal = paths[:, -1]
    if floating:
        pay = jnp.where(jnp.asarray(cp) > 0, terminal - mn, mx - terminal)
    else:
        pay = jnp.where(jnp.asarray(cp) > 0, jnp.maximum(mx - strike, 0.0),
                        jnp.maximum(strike - mn, 0.0))
    df = jnp.exp(-rate * jnp.maximum(maturity, EPS_TIME))
    return df * pay.mean()


@functools.partial(jax.jit, static_argnames=("n_paths", "n_steps", "barrier_type"))
def qmc_barrier_price(spot, strike, barrier, maturity, rate, vol, key, cp=1.0,
                      dividend=0.0, n_paths: int = 65_536, n_steps: int = 64,
                      barrier_type: str = "up-and-out"):
    parts = barrier_type.split("-")
    if len(parts) != 3 or parts[0] not in ("up", "down") or parts[2] not in ("in", "out"):
        raise ValidationError(f"unknown barrier type {barrier_type!r}")
    up = parts[0] == "up"
    knock_in = parts[2] == "in"
    paths = _qmc_gbm_paths(spot, maturity, rate, dividend, vol, n_paths, n_steps, key)
    crossed = (paths >= barrier).any(axis=1) if up else (paths <= barrier).any(axis=1)
    vanilla = jnp.maximum(cp * (paths[:, -1] - strike), 0.0)
    pay = jnp.where(crossed, vanilla, 0.0) if knock_in else jnp.where(crossed, 0.0, vanilla)
    df = jnp.exp(-rate * jnp.maximum(maturity, EPS_TIME))
    return df * pay.mean()
