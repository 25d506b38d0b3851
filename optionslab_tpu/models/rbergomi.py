"""Rough Bergomi (rBergomi) model — exact Volterra-Gaussian simulation.

Beyond the reference (no rough-volatility support).  Bayer–Friz–Gatheral
(2016) dynamics:

    v_t = xi0 * exp(eta * V~_t - eta^2/2 * t^{2H}),
    V~_t = sqrt(2H) * int_0^t (t-s)^{H-1/2} dW_s     (Var V~_t = t^{2H})
    dS/S = (r-q) dt + sqrt(v_t) (rho dW + sqrt(1-rho^2) dW_perp)

TPU-first design: instead of the hybrid scheme's FFT convolution, the
(V~ at grid, W at grid) joint Gaussian is simulated EXACTLY — its 2n x 2n
covariance has closed-form/1-D-quadrature entries, is Cholesky-factorized
once at trace time (host, cached per (n_steps, H, T)), and each batch of
paths is one (paths x 2n) @ (2n x 2n) matmul: the hot op lands on the MXU
at full tilt and the only discretization error left is the left-point
spot integral (the variance path itself is exact in distribution).

Oracles: eta -> 0 is Black–Scholes with sigma^2 = xi0; E[v_t] = xi0
exactly (lognormal martingale check); the ATM skew follows the rough
power law psi(tau) ~ tau^{H - 1/2}.
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.exceptions import ValidationError

__all__ = ["RBergomiParams", "rbergomi_price", "rbergomi_greeks",
           "rbergomi_smile_iv", "rbergomi_variance_grid",
           "rbergomi_cliquet_price", "rbergomi_autocall_price",
           "rbergomi_chain_price", "calibrate_rbergomi",
           "xi_curve_from_variance_swaps"]


@dataclasses.dataclass(frozen=True)
class RBergomiParams:
    """hurst in (0, 1/2]: roughness; eta: vol-of-vol; rho: spot/vol
    correlation; xi0: (flat) forward variance level."""

    hurst: float = 0.1
    eta: float = 1.9
    rho: float = -0.9
    xi0: float = 0.04

    def validate(self):
        if not 0.0 < self.hurst <= 0.5:
            raise ValidationError(f"hurst must be in (0, 0.5]: {self.hurst}")
        if not -1.0 < self.rho < 1.0:
            raise ValidationError(f"rho must be in (-1, 1): {self.rho}")
        if self.eta < 0 or self.xi0 <= 0:
            raise ValidationError(
                f"need eta >= 0, xi0 > 0: {self.eta}, {self.xi0}")


@functools.lru_cache(maxsize=16)
def _volterra_cov_host(n_steps: int, hurst: float, maturity: float):
    """Cov([V~_{t_1..n}, W_{t_1..n}]) in f64 (host, cached).

    C_VV[i,i] = t_i^{2H} exactly; off-diagonals by Gauss–Legendre after
    the u = w^{1/(H+1/2)} substitution that removes the (t_i - s)^{H-1/2}
    endpoint singularity.  C_VW is closed-form; C_WW = min(t_i, t_j).
    """
    h = float(hurst)
    n = int(n_steps)
    t = np.linspace(maturity / n, maturity, n)
    p = 1.0 / (h + 0.5)

    x64, w64 = np.polynomial.legendre.leggauss(64)

    c_vv = np.empty((n, n))
    for i in range(n):
        ti = t[i]
        c_vv[i, i] = ti ** (2 * h)
        if i + 1 < n:
            tj = t[i + 1:]
            # 2H * int_0^{ti} u^{H-1/2} (tj - ti + u)^{H-1/2} du,
            # u = w^p: integrand -> p * (tj - ti + w^p)^{H-1/2} on
            # [0, ti^{1/p}]
            b = ti ** (1.0 / p)
            w_nodes = 0.5 * b * (x64 + 1.0)
            w_w = 0.5 * b * w64
            u = w_nodes ** p  # (64,)
            f = (tj[:, None] - ti + u[None, :]) ** (h - 0.5)  # (n-i-1, 64)
            val = 2 * h * p * (f * w_w[None, :]).sum(axis=1)
            c_vv[i, i + 1:] = val
            c_vv[i + 1:, i] = val

    sq2h = np.sqrt(2 * h)
    ti_ = t[:, None]
    tj_ = t[None, :]
    mn = np.minimum(ti_, tj_)
    c_vw = sq2h / (h + 0.5) * (ti_ ** (h + 0.5) - (ti_ - mn) ** (h + 0.5))
    c_ww = mn

    cov = np.block([[c_vv, c_vw], [c_vw.T, c_ww]])
    # tiny jitter for numerical PSD
    cov += 1e-12 * np.eye(2 * n)
    return cov


@functools.lru_cache(maxsize=16)
def _volterra_chol(n_steps: int, hurst: float, maturity: float):
    """Cholesky factor of the block-ordered [V~_{1..n}, W_{1..n}]
    covariance (host, cached, f32 for the MXU matmul)."""
    return np.linalg.cholesky(
        _volterra_cov_host(n_steps, hurst, maturity)).astype(np.float32)


@functools.lru_cache(maxsize=16)
def _volterra_chol_causal(n_steps: int, hurst: float, maturity: float):
    """CAUSAL (time-interleaved) Cholesky factor: state order
    (V~_1, W_1, V~_2, W_2, ...), so row 2(i-1) is V~_{t_i} and row
    2(i-1)+1 is W_{t_i}, and each state is a lower-triangular map of the
    iid normals e_1..e_{2i}.  This makes EXACT conditional transitions
    available: given the past e's, any future (V~, W) block is Gaussian
    with mean L[rows, :past] @ e_past and factor L[rows, fresh-cols] —
    the key to dual (Rogers/Haugh–Kogan style) bounds on the
    non-Markovian rough law without nested path replay
    (``models/rbergomi_american.py``)."""
    n = int(n_steps)
    cov = _volterra_cov_host(n, hurst, maturity)
    perm = np.empty(2 * n, np.int64)
    perm[0::2] = np.arange(n)          # V~_i lives at block index i
    perm[1::2] = n + np.arange(n)      # W_i lives at block index n+i
    return np.linalg.cholesky(cov[np.ix_(perm, perm)]).astype(np.float32)


def rbergomi_variance_grid(params: RBergomiParams, v_tilde, t_grid):
    """v_t on the grid from the exact Volterra draw."""
    return params.xi0 * jnp.exp(params.eta * v_tilde
                                - 0.5 * params.eta**2 * t_grid ** (2 * params.hurst))


def _terminal_spots(spot, rate, dividend, xi0, eta, rho, *, hurst: float,
                    maturity: float, key, n_paths: int, n_steps: int):
    """Terminal spots S_T, differentiable in (spot, rate, dividend, xi0,
    eta, rho).  hurst/maturity stay static (they shape the host-side
    Cholesky factor).

    ``xi0`` is either a scalar (flat forward variance) or an
    (n_steps,)-vector of the forward-variance curve at the LEFT grid
    times [0, t_1, ..., t_{n-1}] — the points the left-point spot
    integral samples."""
    n = n_steps
    lmat = jnp.asarray(_volterra_chol(n, hurst, float(maturity)))
    t_grid = jnp.linspace(maturity / n, maturity, n).astype(jnp.float32)
    dt = jnp.float32(maturity / n)
    half = n_paths // 2

    k1, k2 = jax.random.split(key)
    z = jax.random.normal(k1, (half, 2 * n), jnp.float32)
    z = jnp.concatenate([z, -z], axis=0)  # antithetic
    # the MXU matmul: exact joint (V~, W) draw
    vw = jax.lax.dot_general(z, lmat, (((1,), (1,)), ((), ())),
                             precision=jax.lax.Precision.HIGHEST)
    v_tilde = vw[:, :n]
    w_lvl = vw[:, n:]
    dw = jnp.diff(w_lvl, axis=1, prepend=jnp.zeros((n_paths, 1), jnp.float32))

    # lognormal factor at the grid, shifted to left points (1 at t=0);
    # xi0(t_left) multiplies it so v_left[i] = xi0(t_{i-1}) e^{eta V~ - ...}
    expf = jnp.exp(eta * v_tilde
                   - 0.5 * eta**2 * t_grid[None, :] ** (2 * hurst))
    expf_left = jnp.concatenate(
        [jnp.ones((n_paths, 1), jnp.float32), expf[:, :-1]], axis=1)
    xi_left = jnp.broadcast_to(
        jnp.asarray(xi0, jnp.float32).reshape(-1), (n,))
    v_left = xi_left[None, :] * expf_left
    sq_v = jnp.sqrt(v_left)

    zp = jax.random.normal(k2, (half, n), jnp.float32)
    zp = jnp.concatenate([zp, -zp], axis=0)
    srho = jnp.sqrt(jnp.maximum(1.0 - rho**2, 0.0))
    dz = rho * dw + srho * jnp.sqrt(dt) * zp

    log_s = jnp.sum(sq_v * dz - 0.5 * v_left * dt, axis=1)
    return spot * jnp.exp((rate - dividend) * maturity + log_s)


@functools.partial(jax.jit,
                   static_argnames=("params", "maturity", "n_paths",
                                    "n_steps", "return_iv"))
def _rbergomi_core(spot, strikes, maturity, rate, dividend, cp,
                   params: RBergomiParams, key, n_paths: int, n_steps: int,
                   return_iv: bool = False, xi_left=None):
    xi = (jnp.float32(params.xi0) if xi_left is None
          else jnp.asarray(xi_left, jnp.float32))
    st = _terminal_spots(spot, rate, dividend,
                         xi, jnp.float32(params.eta),
                         jnp.float32(params.rho), hurst=params.hurst,
                         maturity=maturity, key=key, n_paths=n_paths,
                         n_steps=n_steps)
    disc = jnp.exp(-rate * maturity)
    pay = jnp.maximum(cp[:, None] * (st[None, :] - strikes[:, None]), 0.0)
    prices = disc * pay.mean(axis=1)
    stderr = disc * pay.std(axis=1) / jnp.sqrt(jnp.float32(n_paths))
    return prices, stderr


def rbergomi_price(spot, strikes, maturity, rate, params: RBergomiParams,
                   key, dividend=0.0, option_type="call",
                   n_paths: int = 100_000, n_steps: int = 256,
                   xi_curve=None):
    """European prices under rBergomi (exact variance path law).

    Returns (prices, stderr) over the strike array — all strikes share one
    path set (common random numbers).

    ``xi_curve``: optional forward-variance TERM STRUCTURE — a callable
    t -> xi0(t) (evaluated host-side on the left grid times) or an
    (n_steps,)-array at [0, t_1, ..., t_{n-1}].  Overrides the flat
    ``params.xi0``; build one from market variance-swap strikes with
    :func:`xi_curve_from_variance_swaps`.  At eta -> 0 the price reduces
    EXACTLY to Black-Scholes with sigma^2 = (1/T) int_0^T xi0(s) ds."""
    params.validate()
    if n_paths % 2:
        raise ValidationError("n_paths must be even (antithetic)")
    # Operand construction stays on the HOST (numpy): every eager jnp op is
    # a device RPC on the axon backend (~ms each) and this wrapper is hot in
    # bench/calibration loops — the jit boundary of _rbergomi_core does the
    # one transfer.  jax arrays/tracers pass through untouched.
    cp_scalar = 1.0 if str(option_type).lower() in ("call", "c", "1") else -1.0
    if isinstance(strikes, jax.Array):
        strikes = jnp.atleast_1d(strikes).astype(jnp.float32)
        cp = jnp.full(strikes.shape, cp_scalar, jnp.float32)
    else:
        strikes = np.atleast_1d(np.asarray(strikes, np.float32))
        cp = np.full(strikes.shape, cp_scalar, np.float32)
    xi_left = None
    if xi_curve is not None:
        t_left = np.linspace(0.0, float(maturity), n_steps, endpoint=False)
        xi_left = (np.asarray([float(xi_curve(t)) for t in t_left], np.float32)
                   if callable(xi_curve)
                   else np.asarray(xi_curve, np.float32))
        if xi_left.shape != (n_steps,):
            raise ValidationError(
                f"xi_curve array must have shape ({n_steps},), got {xi_left.shape}")
        if np.any(xi_left <= 0):
            raise ValidationError("xi_curve must be positive")
    def _h32(x):
        return x if isinstance(x, jax.Array) else np.float32(x)
    return _rbergomi_core(_h32(spot), strikes, float(maturity),
                          _h32(rate), _h32(dividend), cp,
                          params, key, n_paths, n_steps, xi_left=xi_left)


def xi_curve_from_variance_swaps(maturities, variance_strikes):
    """Forward-variance curve xi0(t) from market variance-swap strikes.

    Model-free identity: K_var(T) * T = int_0^T xi0(s) ds, so piecewise-
    constant forward variance between quoted maturities is

        xi0(t) = d(K_var T)/dT = (K_{i} T_i - K_{i-1} T_{i-1}) / (T_i - T_{i-1})

    Returns a callable t -> xi0(t) (flat extrapolation beyond the ends).
    Feeds :func:`rbergomi_price`'s ``xi_curve`` — by construction the
    model reprices every input variance swap exactly (E[v_t] = xi0(t)).
    """
    t = np.asarray(maturities, np.float64)
    k = np.asarray(variance_strikes, np.float64)
    if t.ndim != 1 or t.shape != k.shape or len(t) == 0:
        raise ValidationError("need matching 1-D maturities/strikes")
    if np.any(np.diff(t) <= 0) or t[0] <= 0:
        raise ValidationError("maturities must be positive and increasing")
    tot = k * t                      # cumulative total variance
    fwd = np.diff(tot, prepend=0.0) / np.diff(t, prepend=0.0)
    if np.any(fwd <= 0):
        raise ValidationError(
            "variance-swap term structure implies non-positive forward "
            "variance (calendar arbitrage in the quotes)")

    def xi(tq):
        idx = np.searchsorted(t, np.asarray(tq, np.float64), side="left")
        return fwd[np.minimum(idx, len(fwd) - 1)]

    return xi


def rbergomi_smile_iv(k_log_moneyness, maturity, params: RBergomiParams, key,
                      spot=100.0, rate=0.0, n_paths: int = 200_000,
                      n_steps: int = 256):
    """Implied-vol smile at forward log-moneyness points (rate folded into
    the strikes so the forward is spot*e^{rT})."""
    from .iv import implied_vol

    k = np.atleast_1d(np.asarray(k_log_moneyness, np.float64))
    fwd = spot * np.exp(rate * maturity)
    strikes = fwd * np.exp(k)
    cp = np.where(k <= 0, -1.0, 1.0)  # OTM side for a stable inversion
    prices = np.empty_like(k)
    for sign in (-1.0, 1.0):
        m = cp == sign
        if m.any():
            p, _ = rbergomi_price(spot, strikes[m], maturity, rate, params,
                                  key, option_type="call" if sign > 0 else "put",
                                  n_paths=n_paths, n_steps=n_steps)
            prices[m] = np.asarray(p)
    return np.asarray(implied_vol(
        jnp.asarray(prices, jnp.float32), jnp.float32(spot),
        jnp.asarray(strikes, jnp.float32), jnp.float32(maturity),
        jnp.float32(rate), jnp.asarray(cp, jnp.float32)))


@functools.partial(jax.jit, static_argnames=("hurst", "maturity", "cp",
                                             "n_paths", "n_steps"))
def _rbergomi_greeks_core(spot, strike, rate, dividend, xi0, eta, rho, key,
                          *, hurst, maturity, cp, n_paths, n_steps,
                          gamma_rel_bump=0.02):
    def price_of(s, r, q, x0, et, rh):
        st = _terminal_spots(s, r, q, x0, et, rh, hurst=hurst,
                             maturity=maturity, key=key, n_paths=n_paths,
                             n_steps=n_steps)
        pay = jnp.maximum(cp * (st - strike), 0.0)
        return jnp.exp(-r * maturity) * jnp.mean(pay)

    price, grads = jax.value_and_grad(price_of, argnums=(0, 1, 2, 3, 4, 5))(
        spot, rate, dividend, xi0, eta, rho)
    # gamma: CRN central FD of the PATHWISE delta (the payoff is piecewise
    # linear in S0, so second-order AD is zero a.e. — FD of the smooth-in-
    # expectation delta estimator on the SAME key is the sound estimator)
    h = gamma_rel_bump * spot
    d_up = jax.grad(price_of, argnums=0)(spot + h, rate, dividend, xi0, eta, rho)
    d_dn = jax.grad(price_of, argnums=0)(spot - h, rate, dividend, xi0, eta, rho)
    gamma = (d_up - d_dn) / (2.0 * h)
    return price, grads, gamma


def rbergomi_greeks(spot, strike, maturity, rate, params: RBergomiParams,
                    key, dividend=0.0, option_type="call",
                    n_paths: int = 200_000, n_steps: int = 128) -> dict:
    """Pathwise-AD Greeks under rough Bergomi, one reverse sweep.

    Beyond-reference: the reference has no rough-vol support at all; here
    the exact Volterra simulation is differentiable end-to-end, so delta /
    rate-rho / dividend sensitivity / forward-variance vega (d/d xi0) /
    vol-of-vol vega (d/d eta) / spot-vol-correlation sensitivity (d/d rho)
    all come from ONE reverse AD pass through the MXU matmul — common
    random numbers by construction (fixed key).

    ``vega`` is also reported in Black-Scholes-equivalent units,
    dP/dsigma_BS = dP/dxi0 * 2 sqrt(xi0) (exact at eta -> 0 where
    sigma = sqrt(xi0); a convention elsewhere).  Gamma uses CRN central
    FD of the pathwise delta (the payoff kink makes second-order
    pathwise AD zero a.e.).

    Oracles (tests): the eta -> 0 limit reproduces BS delta/gamma/vega/
    rho exactly; for rough parameters every entry matches CRN finite
    differences of :func:`rbergomi_price` on the same key.
    """
    params.validate()
    if n_paths % 2:
        raise ValidationError("n_paths must be even (antithetic)")
    cp = 1.0 if str(option_type).lower() in ("call", "c", "1") else -1.0
    price, grads, gamma = _rbergomi_greeks_core(
        jnp.float32(spot), jnp.float32(strike), jnp.float32(rate),
        jnp.float32(dividend), jnp.float32(params.xi0),
        jnp.float32(params.eta), jnp.float32(params.rho), key,
        hurst=params.hurst, maturity=float(maturity), cp=cp,
        n_paths=n_paths, n_steps=n_steps)
    d_s, d_r, d_q, d_xi0, d_eta, d_rho = (float(g) for g in grads)
    return {
        "price": float(price),
        "delta": d_s,
        "gamma": float(gamma),
        "rho_rate": d_r,
        "div_sens": d_q,
        "vega_xi0": d_xi0,
        "vega": d_xi0 * 2.0 * float(np.sqrt(params.xi0)),
        "vega_eta": d_eta,
        "corr_sens": d_rho,
    }


RBERGOMI_EXOTIC_KINDS = (
    "asian_arith", "asian_geo", "lookback_float", "lookback_fixed",
    "barrier_up-and-out", "barrier_up-and-in", "barrier_down-and-out",
    "barrier_down-and-in",
    "one_touch_up", "one_touch_down", "no_touch_up", "no_touch_down",
    # range accrual: barrier = LOWER bound, strike = UPPER bound, pays
    # 100 * accrual fraction (notional fixed at 100 for this engine)
    "range_accrual",
    # double kinds take barrier=(lower, upper)
    "barrier_double-out", "barrier_double-in",
    "one_touch_double", "no_touch_double",
    # pay-at-hit one-touches: unit cash discounted AT the first hit
    "one_touch_up_hit", "one_touch_down_hit", "one_touch_double_hit",
)


def _spot_paths(spot, maturity, rate, dividend, xi0, eta, rho, hurst,
                key, n_paths, n_steps):
    """Full spot-path matrix under the exact Volterra law.

    Returns ``(s_path, x)`` of shape (n_paths, n_steps) at the grid times
    t_1..t_n, where ``x`` is the relative log-spot ln(S_{t_i}/S0) incl.
    drift. Antithetic in the joint (V~, W, W⊥) draw; differentiable in
    (spot, rate, dividend, xi0, eta, rho) — hurst/maturity stay static
    (they shape the host-side Cholesky factor)."""
    n = n_steps
    spot = jnp.float32(spot)
    lmat = jnp.asarray(_volterra_chol(n, hurst, float(maturity)))
    t_grid = jnp.linspace(maturity / n, maturity, n).astype(jnp.float32)
    dt = jnp.float32(maturity / n)
    half = n_paths // 2
    eta = jnp.float32(eta)
    rho = jnp.float32(rho)

    k1, k2 = jax.random.split(key)
    z = jax.random.normal(k1, (half, 2 * n), jnp.float32)
    z = jnp.concatenate([z, -z], axis=0)
    vw = jax.lax.dot_general(z, lmat, (((1,), (1,)), ((), ())),
                             precision=jax.lax.Precision.HIGHEST)
    v_tilde = vw[:, :n]
    w_lvl = vw[:, n:]
    dw = jnp.diff(w_lvl, axis=1,
                  prepend=jnp.zeros((n_paths, 1), jnp.float32))
    expf = jnp.exp(eta * v_tilde
                   - 0.5 * eta**2 * t_grid[None, :] ** (2 * hurst))
    expf_left = jnp.concatenate(
        [jnp.ones((n_paths, 1), jnp.float32), expf[:, :-1]], axis=1)
    v_left = jnp.float32(xi0) * expf_left
    sq_v = jnp.sqrt(v_left)
    zp = jax.random.normal(k2, (half, n), jnp.float32)
    zp = jnp.concatenate([zp, -zp], axis=0)
    srho = jnp.sqrt(jnp.maximum(1.0 - rho**2, 0.0))
    dz = rho * dw + srho * jnp.sqrt(dt) * zp

    # full relative log-spot path: X_i = ln(S_{t_i}/S0) incl. drift
    x = jnp.cumsum(sq_v * dz - 0.5 * v_left * dt, axis=1) \
        + (jnp.float32(rate) - jnp.float32(dividend)) * t_grid[None, :]
    return spot * jnp.exp(x), x


@functools.partial(jax.jit,
                   static_argnames=("kind", "hurst", "maturity", "cp",
                                    "n_paths", "n_steps", "return_stderr"))
def _rbergomi_exotic_core(kind, spot, strike, maturity, rate, dividend, cp,
                          barrier, xi0, eta, rho, hurst, key, n_paths,
                          n_steps, return_stderr):
    """Path matrix under the exact Volterra law → vectorized payoff.

    The Volterra construction already materializes every step's
    (V~, dW) via one MXU matmul, so the full log-spot path is a cumsum —
    path-dependent payoffs cost no extra simulation over the European
    pricer. Monitoring conventions match the GBM/Heston engines exactly
    (Asian averages steps 1..n; extrema/barriers/touches include S0)."""
    spot = jnp.float32(spot)
    s_path, x = _spot_paths(spot, maturity, rate, dividend, xi0, eta, rho,
                            hurst, key, n_paths, n_steps)
    s_t = s_path[:, -1]

    barrier_up = "up" in kind
    knock_in = kind.endswith("in")
    if kind == "range_accrual":
        in_rng = ((s_path >= barrier) & (s_path <= strike)).astype(
            jnp.float32)
        pay = 100.0 * in_rng.mean(axis=1)
    elif kind == "asian_arith":
        pay = jnp.maximum(cp * (s_path.mean(axis=1) - strike), 0.0)
    elif kind == "asian_geo":
        pay = jnp.maximum(
            cp * (spot * jnp.exp(x.mean(axis=1)) - strike), 0.0)
    elif kind == "lookback_float":
        ext = (jnp.minimum(s_path.min(axis=1), spot) if cp > 0
               else jnp.maximum(s_path.max(axis=1), spot))
        pay = cp * (s_t - ext)
    elif kind == "lookback_fixed":
        ext = (jnp.maximum(s_path.max(axis=1), spot) if cp > 0
               else jnp.minimum(s_path.min(axis=1), spot))
        pay = jnp.maximum(cp * (ext - strike), 0.0)
    elif kind.endswith("_hit"):
        # cash AT the first hit: the path matrix gives the hit step
        # directly (argmax of the per-step indicator; spot checked at t=0)
        if "double" in kind:
            hit_mat = (s_path <= barrier[0]) | (s_path >= barrier[1])
            hit0 = (spot <= barrier[0]) | (spot >= barrier[1])
        elif barrier_up:
            hit_mat = s_path >= barrier
            hit0 = jnp.asarray(spot >= barrier)
        else:
            hit_mat = s_path <= barrier
            hit0 = jnp.asarray(spot <= barrier)
        any_hit = hit_mat.any(axis=1)
        first = jnp.argmax(hit_mat, axis=1).astype(jnp.float32) + 1.0
        dt = jnp.float32(maturity) / hit_mat.shape[1]
        df_hit = jnp.exp(-jnp.float32(rate) * dt * first)
        pay = jnp.where(hit0, 1.0,
                        jnp.where(any_hit, df_hit, 0.0))
    else:
        if "double" in kind:
            hit = ((jnp.minimum(s_path.min(axis=1), spot) <= barrier[0])
                   | (jnp.maximum(s_path.max(axis=1), spot) >= barrier[1]))
        elif barrier_up:
            hit = jnp.maximum(s_path.max(axis=1), spot) >= barrier
        else:
            hit = jnp.minimum(s_path.min(axis=1), spot) <= barrier
        hit = hit.astype(jnp.float32)
        if "touch" in kind:
            pay = hit if kind.startswith("one") else (1.0 - hit)
        else:
            vanilla = jnp.maximum(cp * (s_t - strike), 0.0)
            pay = vanilla * (hit if knock_in else (1.0 - hit))
    # pay-at-hit kinds carry the discount inside pay already
    df = (jnp.float32(1.0) if kind.endswith("_hit")
          else jnp.exp(-jnp.float32(rate) * jnp.float32(maturity)))
    price = df * pay.mean()
    if not return_stderr:
        return price
    stderr = df * pay.std(ddof=1) / jnp.sqrt(n_paths * 1.0)
    return price, stderr


def rbergomi_exotic_price(kind: str, spot, strike, maturity, rate,
                          params: RBergomiParams, key, cp: float = 1.0,
                          dividend: float = 0.0, barrier: float = 0.0,
                          n_paths: int = 100_000, n_steps: int = 256,
                          return_stderr: bool = False):
    """Exotics under ROUGH volatility — the dynamics that actually match
    short-dated skew term structure (H ~ 0.1), applied to the payoffs a
    desk quotes daily. Completes the payoff x dynamics matrix's rough
    column (GBM / local-vol / Heston / Bates elsewhere); the reference
    has neither rough vol nor stochastic-vol exotics.

    ``kind`` in RBERGOMI_EXOTIC_KINDS; conventions match the other
    engines (discrete monitoring at every step incl. S0 for extrema /
    barriers; one-touch pays unit cash at expiry). At eta -> 0 prices
    reduce to the GBM engines with sigma = sqrt(xi0).
    """
    params.validate()
    if kind not in RBERGOMI_EXOTIC_KINDS:
        raise ValidationError(
            f"unknown rbergomi exotic kind {kind!r}; "
            f"choose {RBERGOMI_EXOTIC_KINDS}")
    if n_paths % 2:
        raise ValidationError("n_paths must be even (antithetic)")
    if "double" in kind:
        b = (jnp.float32(barrier[0]), jnp.float32(barrier[1]))
    else:
        b = jnp.float32(barrier)
    return _rbergomi_exotic_core(kind, spot, jnp.float32(strike),
                                 float(maturity), rate, dividend,
                                 float(cp), b,
                                 params.xi0, params.eta, params.rho,
                                 float(params.hurst), key, n_paths,
                                 n_steps, return_stderr)


@functools.partial(jax.jit,
                   static_argnames=("hurst", "maturity", "n_periods",
                                    "n_paths", "n_steps", "return_stderr"))
def _rbergomi_cliquet_core(spot, maturity, rate, dividend, local_floor,
                           local_cap, global_floor, global_cap, notional,
                           xi0, eta, rho, hurst, key, n_periods, n_paths,
                           n_steps, return_stderr):
    s_path, _ = _spot_paths(spot, maturity, rate, dividend, xi0, eta, rho,
                            hurst, key, n_paths, n_steps)
    per = n_steps // n_periods
    cols = per * np.arange(1, n_periods + 1) - 1     # period-end steps
    fix = s_path[:, cols]                            # (n_paths, n_periods)
    prev = jnp.concatenate(
        [jnp.full((n_paths, 1), jnp.float32(spot)), fix[:, :-1]], axis=1)
    acc = jnp.clip(fix / prev - 1.0, local_floor, local_cap).sum(axis=1)
    pay = notional * jnp.clip(acc, global_floor, global_cap)
    df = jnp.exp(-jnp.float32(rate) * jnp.float32(maturity))
    price = df * pay.mean()
    if not return_stderr:
        return price
    # paths are antithetic pairs (i, i+half): only n_paths/2 draws are
    # independent, so the honest stderr is over the pair MEANS (for the
    # collared, non-monotone payoff pairs can be positively correlated)
    half = n_paths // 2
    pair_mean = 0.5 * (pay[:half] + pay[half:])
    return price, df * pair_mean.std(ddof=1) / jnp.sqrt(half * 1.0)


def rbergomi_cliquet_price(spot, maturity, rate, params: RBergomiParams,
                           key, dividend: float = 0.0,
                           local_floor: float = -0.05,
                           local_cap: float = 0.05,
                           global_floor: float = 0.0,
                           global_cap: float = 1e9,
                           notional: float = 100.0, n_periods: int = 12,
                           n_paths: int = 100_000, n_steps: int = 252,
                           return_stderr: bool = False):
    """Cliquet/ratchet under ROUGH volatility — the forward-smile product
    priced under the dynamics that actually match forward-skew term
    structure (H ~ 0.1 steepens short-dated forward smiles that Heston
    flattens). Conventions match ``models/exotics.cliquet_price``
    (period returns at the n_periods equally spaced fixing dates, local
    clip then global clip, discounted at maturity); at eta -> 0 it
    reduces to the GBM engine with sigma = sqrt(xi0)."""
    params.validate()
    if n_periods <= 0 or n_steps % n_periods:
        raise ValidationError(
            "n_steps must be a positive multiple of n_periods")
    if n_paths % 2:
        raise ValidationError("n_paths must be even (antithetic)")
    return _rbergomi_cliquet_core(
        jnp.float32(spot), float(maturity), jnp.float32(rate),
        jnp.float32(dividend), jnp.float32(local_floor),
        jnp.float32(local_cap), jnp.float32(global_floor),
        jnp.float32(global_cap), jnp.float32(notional),
        jnp.float32(params.xi0), jnp.float32(params.eta),
        jnp.float32(params.rho), float(params.hurst), key, n_periods,
        n_paths, n_steps, return_stderr)


@functools.partial(jax.jit,
                   static_argnames=("hurst", "maturity", "n_obs",
                                    "n_paths", "n_steps", "return_stderr"))
def _rbergomi_autocall_core(spot, maturity, rate, dividend, notional,
                            autocall_barrier, coupon_barrier, ki_barrier,
                            coupon_rate, xi0, eta, rho, hurst, key, n_obs,
                            n_paths, n_steps, return_stderr):
    spot = jnp.float32(spot)
    s_path, _ = _spot_paths(spot, maturity, rate, dividend, xi0, eta, rho,
                            hurst, key, n_paths, n_steps)
    obs_every = n_steps // n_obs
    cols = obs_every * np.arange(1, n_obs + 1) - 1   # observation steps
    s_obs = s_path[:, cols]                          # (n_paths, n_obs)
    t_obs = jnp.float32(maturity / n_steps) * (cols + 1).astype(jnp.float32)
    df_obs = jnp.exp(-jnp.float32(rate) * t_obs)     # (n_obs,)
    call_hit = s_obs >= autocall_barrier * spot
    # alive at observation j <=> no call at any EARLIER observation
    prior_calls = jnp.cumsum(call_hit, axis=1) - call_hit.astype(jnp.int32)
    alive_at = prior_calls == 0
    couponed = alive_at & (s_obs >= coupon_barrier * spot)
    called = alive_at & call_hit                     # true only at 1st call
    pv = (jnp.where(couponed, df_obs * notional * coupon_rate / n_obs, 0.0)
          + jnp.where(called, df_obs * notional, 0.0)).sum(axis=1)
    # continuous (per-step) knock-in monitoring, steps 1..n as the scans do
    ki = (s_path <= ki_barrier * spot).any(axis=1)
    alive_end = ~call_hit.any(axis=1)
    loss = jnp.minimum(s_path[:, -1] / spot, 1.0)
    final = jnp.where(ki, notional * loss, notional)
    df_t = jnp.exp(-jnp.float32(rate) * jnp.float32(maturity))
    pay = pv + jnp.where(alive_end, df_t * final, 0.0)
    price = pay.mean()
    if not return_stderr:
        return price
    # stderr over the antithetic pair means (see _rbergomi_cliquet_core)
    half = n_paths // 2
    pair_mean = 0.5 * (pay[:half] + pay[half:])
    return price, pair_mean.std(ddof=1) / jnp.sqrt(half * 1.0)


def rbergomi_autocall_price(spot, maturity, rate, params: RBergomiParams,
                            key, dividend: float = 0.0,
                            notional: float = 100.0,
                            autocall_barrier: float = 1.0,
                            coupon_barrier: float = 0.8,
                            ki_barrier: float = 0.7,
                            coupon_rate: float = 0.08, n_obs: int = 4,
                            n_paths: int = 100_000, n_steps: int = 252,
                            return_stderr: bool = False):
    """Autocallable/snowball under ROUGH volatility. Conventions match
    ``models/exotics.autocallable_price`` exactly: n_obs equally spaced
    observation dates (call at par + accrued coupon when S >= autocall
    barrier x S0, coupons accrue while S >= coupon barrier x S0),
    per-step knock-in at ki x S0 turning final redemption into a short
    put, coupons/redemptions discounted at their dates. At eta -> 0 it
    reduces to the GBM engine with sigma = sqrt(xi0)."""
    params.validate()
    if n_obs <= 0 or n_steps % n_obs:
        raise ValidationError("n_steps must be a positive multiple of n_obs")
    if n_paths % 2:
        raise ValidationError("n_paths must be even (antithetic)")
    return _rbergomi_autocall_core(
        jnp.float32(spot), float(maturity), jnp.float32(rate),
        jnp.float32(dividend), jnp.float32(notional),
        jnp.float32(autocall_barrier), jnp.float32(coupon_barrier),
        jnp.float32(ki_barrier), jnp.float32(coupon_rate),
        jnp.float32(params.xi0), jnp.float32(params.eta),
        jnp.float32(params.rho), float(params.hurst), key, n_obs,
        n_paths, n_steps, return_stderr)


# ---------------------------------------------------------------------------
# Chain pricing + full (H, eta, rho, xi0) calibration
# ---------------------------------------------------------------------------

_GL64_X, _GL64_W = np.polynomial.legendre.leggauss(64)


def _volterra_cov_dynamic(t_grid, h):
    """(2n, 2n) covariance of (V~_{t_1..n}, W_{t_1..n}) as a TRACEABLE
    function of the Hurst exponent ``h`` — the piece that makes rough
    Bergomi CALIBRATABLE on-device.

    Same quadrature as the host-side :func:`_volterra_chol` (u = w^p
    substitution kills the (t_i - s)^{H-1/2} endpoint singularity;
    64-node Gauss–Legendre), but built entirely from jnp ops so
    ``jax.grad`` flows through H into the Cholesky factor and the whole
    MC smile. Supports non-uniform grids (multi-expiry chains). Powers
    of possibly-zero bases are masked BEFORE the pow so the H-gradient
    (x^a log x) never sees x = 0.
    """
    t = jnp.asarray(t_grid, jnp.float32)
    p = 1.0 / (h + 0.5)
    xq = jnp.asarray(_GL64_X, jnp.float32)
    wq = jnp.asarray(_GL64_W, jnp.float32)
    b = t ** (h + 0.5)                                   # t^{1/p}, (n,)
    wn = 0.5 * b[:, None] * (xq[None, :] + 1.0)          # (n, q) in (0, b)
    ww = 0.5 * b[:, None] * wq[None, :]
    u = wn ** p                                          # (n, q), > 0
    # diff[i, j, q] = t_j - t_i + u_iq; > 0 iff t_j >= t_i (u > 0)
    diff = t[None, :, None] - t[:, None, None] + u[:, None, :]
    later = t[None, :] >= t[:, None]
    f = jnp.where(later[:, :, None], diff, 1.0) ** (h - 0.5)
    val = 2.0 * h * p * jnp.einsum("iq,ijq->ij", ww, f)
    upper = jnp.where(t[None, :] > t[:, None], val, 0.0)
    c_vv = upper + upper.T + jnp.diag(t ** (2.0 * h))    # diag exact
    mn = jnp.minimum(t[:, None], t[None, :])
    gap = t[:, None] - mn
    gap_pow = jnp.where(gap > 0, jnp.where(gap > 0, gap, 1.0) ** (h + 0.5),
                        0.0)
    c_vw = jnp.sqrt(2.0 * h) / (h + 0.5) * (b[:, None] - gap_pow)
    c_ww = mn
    return jnp.concatenate(
        [jnp.concatenate([c_vv, c_vw], axis=1),
         jnp.concatenate([c_vw.T, c_ww], axis=1)], axis=0)


def _volterra_logs_dynamic(t_grid, h, eta, rho, xi0, rate, dividend, z, zp):
    """Relative log-spot paths ln(S_{t_i}/S0) on an arbitrary positive
    grid, differentiable in EVERY parameter including h. ``z`` is the
    (n_paths, 2n) standard-normal block, ``zp`` the (n_paths, n)
    orthogonal spot block — drawn ONCE by the caller so every loss
    evaluation reuses the identical noise (CRN: the calibration loss
    surface is deterministic)."""
    t = jnp.asarray(t_grid, jnp.float32)
    n = t.shape[0]
    cov = _volterra_cov_dynamic(t, h)
    # relative jitter: f32 Cholesky of the (levels) covariance needs it;
    # scale by the mean diagonal so it tracks the grid's units
    jit_eps = 1e-6 * jnp.mean(jnp.diag(cov))
    lmat = jnp.linalg.cholesky(cov + jit_eps * jnp.eye(2 * n, dtype=cov.dtype))
    vw = jax.lax.dot_general(z, lmat, (((1,), (1,)), ((), ())),
                             precision=jax.lax.Precision.HIGHEST)
    v_tilde = vw[:, :n]
    w_lvl = vw[:, n:]
    n_paths = z.shape[0]
    dw = jnp.diff(w_lvl, axis=1,
                  prepend=jnp.zeros((n_paths, 1), jnp.float32))
    dt = jnp.diff(t, prepend=jnp.zeros((1,), jnp.float32))   # (n,)
    expf = jnp.exp(eta * v_tilde - 0.5 * eta**2 * t[None, :] ** (2.0 * h))
    expf_left = jnp.concatenate(
        [jnp.ones((n_paths, 1), jnp.float32), expf[:, :-1]], axis=1)
    v_left = xi0 * expf_left
    srho = jnp.sqrt(jnp.maximum(1.0 - rho**2, 0.0))
    dz = rho * dw + srho * jnp.sqrt(dt)[None, :] * zp
    return (jnp.cumsum(jnp.sqrt(v_left) * dz - 0.5 * v_left * dt[None, :],
                       axis=1)
            + (rate - dividend) * t[None, :])


def _chain_grid(expiries, max_dt: float, min_seg: int):
    """Host-side simulation grid hitting every expiry exactly.

    Returns (t_grid, expiry_index) — consecutive-expiry segments
    subdivided at ~max_dt (at least min_seg substeps each)."""
    exps = sorted({float(t) for t in np.asarray(expiries).ravel()})
    if exps[0] <= 0:
        raise ValidationError("expiries must be positive")
    grid: list[float] = []
    idx: dict[float, int] = {}
    prev = 0.0
    for te in exps:
        m = max(min_seg, int(np.ceil((te - prev) / max_dt)))
        grid.extend(np.linspace(prev, te, m + 1)[1:].tolist())
        idx[te] = len(grid) - 1
        prev = te
    return np.asarray(grid, np.float32), idx


@functools.partial(jax.jit, static_argnames=("n_paths",))
def _chain_price_core(t_grid, e_idx, strikes, cps, dfs, spot, rate, dividend,
                      h, eta, rho, xi0, z, zp, *, n_paths):
    x = _volterra_logs_dynamic(t_grid, h, eta, rho, xi0, rate, dividend,
                               z, zp)
    x_q = x[:, e_idx]                                # (n_paths, n_quotes)
    pay = jnp.maximum(cps[None, :] * (spot * jnp.exp(x_q)
                                      - strikes[None, :]), 0.0)
    return dfs * pay.mean(axis=0)


def rbergomi_chain_price(strikes, maturities, cps, spot, rate,
                         params: RBergomiParams, key, dividend: float = 0.0,
                         n_paths: int = 131_072, max_dt: float = 0.02,
                         min_seg: int = 16):
    """Price a whole multi-expiry vanilla chain under rough Bergomi in ONE
    jitted program (one path set to the longest expiry, every quote read
    off the same paths — common random numbers across the chain).

    Differentiability: this is the forward map the calibration
    differentiates; unlike :func:`rbergomi_price` (host-cached Cholesky,
    static H), the covariance is built in-graph so H is a live input.
    """
    params.validate()
    strikes = np.asarray(strikes, np.float32).ravel()
    mats = np.asarray(maturities, np.float32).ravel()
    cps = np.asarray(cps, np.float32).ravel()
    t_grid, idx = _chain_grid(mats, max_dt, min_seg)
    e_idx = jnp.asarray([idx[float(t)] for t in mats], jnp.int32)
    dfs = jnp.exp(-jnp.float32(rate) * jnp.asarray(mats, jnp.float32))
    n = len(t_grid)
    half = n_paths // 2
    k1, k2 = jax.random.split(key)
    z = jax.random.normal(k1, (half, 2 * n), jnp.float32)
    z = jnp.concatenate([z, -z], axis=0)
    zp = jax.random.normal(k2, (half, n), jnp.float32)
    zp = jnp.concatenate([zp, -zp], axis=0)
    return _chain_price_core(
        jnp.asarray(t_grid), e_idx, jnp.asarray(strikes), jnp.asarray(cps),
        dfs, jnp.float32(spot), jnp.float32(rate), jnp.float32(dividend),
        jnp.float32(params.hurst), jnp.float32(params.eta),
        jnp.float32(params.rho), jnp.float32(params.xi0), z, zp,
        n_paths=n_paths)


def _rb_to_unconstrained(p: RBergomiParams):
    h = np.clip(p.hurst, 1e-3, 0.499)
    return jnp.asarray([
        np.log(h / (0.5 - h)),                       # 0.5*sigmoid -> (0,.5)
        np.log(np.expm1(max(p.eta, 1e-4))),          # softplus
        np.arctanh(np.clip(p.rho, -0.999, 0.999)),   # tanh
        np.log(max(p.xi0, 1e-6)),                    # exp
    ], jnp.float32)


def _rb_from_unconstrained(x):
    return (0.5 * jax.nn.sigmoid(x[0]), jax.nn.softplus(x[1]),
            jnp.tanh(x[2]), jnp.exp(x[3]))


def calibrate_rbergomi(market_prices, strikes, maturities, cps, spot, rate,
                       dividend: float = 0.0,
                       init: RBergomiParams | None = None,
                       n_steps: int = 300, learning_rate: float = 0.05,
                       n_paths: int = 65_536, max_dt: float = 0.02,
                       min_seg: int = 16, seed: int = 0,
                       weights=None) -> tuple[RBergomiParams, float]:
    """Calibrate ALL FOUR rough-Bergomi parameters (H, eta, rho, xi0) to a
    vanilla chain by scanned Adam on a CRN MC loss — including the Hurst
    exponent, which is usually frozen because it reshapes the Volterra
    covariance: here the covariance quadrature + Cholesky live INSIDE the
    differentiated graph (:func:`_volterra_cov_dynamic`), so dLoss/dH
    flows through the factor into the smile.

    The noise is drawn once (fixed seed) and closed over: every Adam step
    reprices the identical path functional, making the MC loss surface
    deterministic — the scan converges like a deterministic objective
    (same CRN design as ``calibrate_heston_mc``). Loss is relative price
    error (vega-like weighting via ``weights`` if supplied). H is
    identified by the skew TERM STRUCTURE (psi(tau) ~ tau^{H-1/2}), so
    the chain should contain at least one short expiry — and that short
    expiry needs FINE substeps: ``min_seg`` floors the per-segment step
    count because the left-point Euler bias of a coarsely-stepped rough
    path distorts exactly the short-end skew that identifies H
    (measured: min_seg 4 recovered H = 0.076 for a true 0.12 with rho
    slammed to -0.95; min_seg 16 recovers H to ±0.007).

    Beyond the reference (no rough vol); anchor for the calibration
    pattern: ``src/pricing_models/heston.py:312``.
    Returns (params, best_loss).
    """
    from ..ops.optim import scan_adam
    from ..utils.exceptions import CalibrationError

    market = jnp.asarray(market_prices, jnp.float32).ravel()
    w = (jnp.ones_like(market) if weights is None
         else jnp.asarray(weights, jnp.float32).ravel())
    strikes_np = np.asarray(strikes, np.float32).ravel()
    mats = np.asarray(maturities, np.float32).ravel()
    cps_np = np.asarray(cps, np.float32).ravel()
    if not (market.shape[0] == strikes_np.shape[0] == mats.shape[0]
            == cps_np.shape[0]):
        raise ValidationError("market/strikes/maturities/cps must align")
    init = init or RBergomiParams(hurst=0.15, eta=1.5, rho=-0.6, xi0=0.04)
    x0 = _rb_to_unconstrained(init)

    t_grid, idx = _chain_grid(mats, max_dt, min_seg)
    e_idx = jnp.asarray([idx[float(t)] for t in mats], jnp.int32)
    dfs = jnp.exp(-jnp.float32(rate) * jnp.asarray(mats, jnp.float32))
    n = len(t_grid)
    half = n_paths // 2
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    z = jax.random.normal(k1, (half, 2 * n), jnp.float32)
    z = jnp.concatenate([z, -z], axis=0)
    zp = jax.random.normal(k2, (half, n), jnp.float32)
    zp = jnp.concatenate([zp, -zp], axis=0)
    tg = jnp.asarray(t_grid)
    ks = jnp.asarray(strikes_np)
    cpj = jnp.asarray(cps_np)
    s0 = jnp.float32(spot)
    r = jnp.float32(rate)
    q = jnp.float32(dividend)

    def loss_fn(x):
        h, eta, rho, xi0 = _rb_from_unconstrained(x)
        xl = _volterra_logs_dynamic(tg, h, eta, rho, xi0, r, q, z, zp)
        pay = jnp.maximum(cpj[None, :] * (s0 * jnp.exp(xl[:, e_idx])
                                          - ks[None, :]), 0.0)
        model = dfs * pay.mean(axis=0)
        rel = (model - market) / jnp.maximum(market, 1e-3)
        return jnp.mean(w * rel * rel)

    best_x, best_loss, _ = scan_adam(loss_fn, x0, n_steps, learning_rate)
    if not np.isfinite(float(best_loss)):
        raise CalibrationError("rBergomi calibration diverged "
                               "(non-finite loss)")
    h, eta, rho, xi0 = (float(v) for v in _rb_from_unconstrained(best_x))
    params = RBergomiParams(hurst=h, eta=eta, rho=rho, xi0=xi0)
    params.validate()
    return params, float(best_loss)


def rbergomi_exotic_greeks(kind: str, spot, strike, maturity, rate,
                           params: RBergomiParams, key, cp: float = 1.0,
                           dividend: float = 0.0, n_paths: int = 100_000,
                           n_steps: int = 256) -> dict:
    """Pathwise-AD Greeks for CONTINUOUS rough-vol exotics (Asians and
    lookbacks): delta / rate-rho / forward-variance vega (d xi0, and the
    2*sqrt(xi0) spot-vol convention) / vol-of-vol vega (d eta) /
    spot-vol-correlation sensitivity in ONE reverse pass through the
    exact Volterra matmul; CRN gamma by central FD of the AD delta.

    Barriers/touches have a.e.-zero pathwise derivatives — use the GBM/
    Heston LR machinery or CRN-FD of :func:`rbergomi_exotic_price`.
    """
    params.validate()
    if kind not in ("asian_arith", "asian_geo", "lookback_float",
                    "lookback_fixed"):
        raise ValidationError(
            "pathwise AD covers asian/lookback kinds (continuous "
            f"payoffs), got {kind!r}")
    if n_paths % 2:
        raise ValidationError("n_paths must be even (antithetic)")

    def price_of(s0, r, xi0, eta, rho):
        return _rbergomi_exotic_core(
            kind, s0, jnp.float32(strike), float(maturity), r, dividend,
            float(cp), jnp.float32(0.0), xi0, eta, rho,
            float(params.hurst), key, n_paths, n_steps, False)

    args = (jnp.float32(spot), jnp.float32(rate), jnp.float32(params.xi0),
            jnp.float32(params.eta), jnp.float32(params.rho))
    price, grads = jax.value_and_grad(price_of, argnums=(0, 1, 2, 3, 4))(
        *args)
    h = jnp.float32(0.5)
    d_up = jax.grad(price_of, argnums=0)(args[0] + h, *args[1:])
    d_dn = jax.grad(price_of, argnums=0)(args[0] - h, *args[1:])
    d_xi0 = float(grads[2])
    return {
        "price": float(price),
        "delta": float(grads[0]),
        "gamma": float((d_up - d_dn) / (2.0 * h)),
        "rho": float(grads[1]),
        "vega_xi0": d_xi0,
        "vega": d_xi0 * 2.0 * float(np.sqrt(params.xi0)),
        "vega_eta": float(grads[3]),
        "corr_sens": float(grads[4]),
    }
