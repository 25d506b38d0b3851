"""Heston PDE solver: Douglas ADI on a (log-spot, variance) grid.

Beyond the reference (its FDM is 1-D Black–Scholes only,
``fdm_solver.py``): European AND American options under stochastic
volatility, priced on the full 2-D Heston PDE

    V_t + (r-q-v/2) V_x + kappa(theta-v) V_v + v/2 V_xx
        + rho*sigma*v V_xv + sigma^2 v/2 V_vv - r V = 0.

TPU-first design: the Douglas ADI splitting needs one tridiagonal solve
along x (batched over all variance rows) and one along v (batched over
all spot columns) per step — both are the existing ``ops.tridiag``
batched Thomas scan; the mixed term is applied explicitly as a stencil.
Time stepping is one ``lax.scan``; everything is fixed-shape and
AD-compatible.  American exercise uses obstacle projection each step
(the 1-D engine's Howard iteration generalizes, but projection paired
with Douglas is the standard Hout–Foulon treatment).

Oracles (tests): European vs the Lewis CF engine; the frozen-variance
limit (sigma -> 0, v0 = theta) vs the 1-D BS solver for BOTH European
and American; American >= European >= intrinsic monotonicity.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.tridiag import tridiag_solve
from ..utils.exceptions import ValidationError
from .heston import HestonParams

__all__ = ["heston_fdm_price", "heston_fdm_greeks"]


def _apply_tridiag(lo, di, up, v):
    """Matrix-free tridiagonal apply along the last axis."""
    left = jnp.concatenate([jnp.zeros_like(v[..., :1]), v[..., :-1]], axis=-1)
    right = jnp.concatenate([v[..., 1:], jnp.zeros_like(v[..., :1])], axis=-1)
    return lo * left + di * v + up * right


def _adi_setup(spot, strike, maturity, rate, dividend, cp,
               params: HestonParams, n_x: int, n_v: int, n_t: int,
               american: bool):
    """Build grids, Douglas stencils and the (projection-free) step
    closure shared by the European/American solver and the Bermudan
    slice recorder. Returns ``(step, intrinsic, meta)`` with
    ``meta = (x_lo, dx, dxi, c_v)`` (grid geometry for the readers; v
    maps through ξ = asinh(v/c_v))."""
    f32 = jnp.float32
    spot, strike, maturity, rate, dividend, cp = (
        jnp.asarray(a, f32) for a in (spot, strike, maturity, rate,
                                      dividend, cp))
    kap, th, sig, rho, v0 = (jnp.asarray(a, f32) for a in
                             (params.kappa, params.theta, params.sigma,
                              params.rho, params.v0))

    # ---- grids (geometry is STOP-GRADIENT so AD Greeks differentiate the
    # PDE solution on a frozen mesh, not the mesh itself — the 1-D
    # engine's pattern, fdm.py ``_grid``) ----------------------------------
    vbar = jnp.maximum(v0, th)
    half_width = 5.0 * jnp.sqrt(vbar * maturity) + \
        1.5 * jnp.abs(jnp.log(spot / strike)) + 0.5
    x_lo = lax.stop_gradient(jnp.log(strike) - half_width)
    x_hi = lax.stop_gradient(jnp.log(strike) + half_width)
    x = jnp.linspace(x_lo, x_hi, n_x)
    dx = (x_hi - x_lo) / (n_x - 1)
    # sinh-stretched variance grid (Hout–Foulon): v = c·sinh(ξ), uniform
    # ξ — fine resolution near v = 0/v0, a FAR v_max covering the CIR
    # transient tail (a 5·vbar uniform cap was measured to bias d_sigma
    # by ~13% through the artificial dV/dv = 0 wall while barely moving
    # the price — truncation error cancelling discretization error)
    v_max = lax.stop_gradient(1.5 * vbar
                              + 10.0 * sig * jnp.sqrt(vbar / (2.0 * kap))
                              + 2.0 * sig * sig / kap)
    c_v = lax.stop_gradient(vbar)
    xi_max = jnp.arcsinh(v_max / c_v)
    xi = jnp.linspace(0.0, xi_max, n_v)
    dxi = xi_max / (n_v - 1)
    v = c_v * jnp.sinh(xi)
    gp = c_v * jnp.cosh(xi)  # dv/dξ; d²v/dξ² = v itself
    dt = maturity / n_t

    s_grid = jnp.exp(x)
    intrinsic = jnp.maximum(cp * (s_grid[None, :] - strike), 0.0)  # (n_v,n_x)
    intrinsic = jnp.broadcast_to(intrinsic, (n_v, n_x))

    # ---- A1: x-direction stencil per variance row (n_v, n_x) -------------
    vj = v[:, None]
    conv_x = (rate - dividend - 0.5 * vj) / (2.0 * dx)
    diff_x = 0.5 * vj / (dx * dx)
    a1 = diff_x - conv_x
    c1 = diff_x + conv_x
    b1 = -2.0 * diff_x - 0.5 * rate
    a1 = jnp.broadcast_to(a1, (n_v, n_x))
    b1 = jnp.broadcast_to(b1, (n_v, n_x))
    c1 = jnp.broadcast_to(c1, (n_v, n_x))
    # Dirichlet x-boundaries: pin first/last columns to identity rows
    edge = jnp.zeros((n_v, 1), f32)
    a1 = jnp.concatenate([edge, a1[:, 1:-1], edge], axis=1)
    c1 = jnp.concatenate([edge, c1[:, 1:-1], edge], axis=1)
    b1 = jnp.concatenate([jnp.zeros((n_v, 1), f32), b1[:, 1:-1],
                          jnp.zeros((n_v, 1), f32)], axis=1)

    # ---- A2: v-direction stencil per spot column (n_x, n_v), in the ξ
    # coordinate: L_v V = [κ(θ−v)/g' − σ²v·v/(2g'³)]·V_ξ + [σ²v/(2g'²)]·V_ξξ
    # (chain rule with g(ξ) = c·sinh ξ, g'' = v) ---------------------------
    vk = v[None, :]
    gpk = gp[None, :]
    conv_v = (kap * (th - vk) / gpk
              - 0.5 * sig * sig * vk * vk / gpk**3) / (2.0 * dxi)
    diff_v = 0.5 * sig * sig * vk / (gpk * gpk * dxi * dxi)
    a2 = diff_v - conv_v
    c2 = diff_v + conv_v
    b2 = -2.0 * diff_v - 0.5 * rate
    a2 = jnp.broadcast_to(a2, (n_x, n_v))
    b2 = jnp.broadcast_to(b2, (n_x, n_v))
    c2 = jnp.broadcast_to(c2, (n_x, n_v))
    # v = 0 row: degenerate PDE, upwind drift kappa*theta > 0 (g'(0) = c)
    up0 = kap * th / (c_v * dxi)
    a2 = a2.at[:, 0].set(0.0)
    b2 = b2.at[:, 0].set(-up0 - 0.5 * rate)
    c2 = c2.at[:, 0].set(up0)
    # v = v_max row: dV/dv ~ 0 far field — drop v-derivatives
    a2 = a2.at[:, -1].set(0.0)
    b2 = b2.at[:, -1].set(-0.5 * rate)
    c2 = c2.at[:, -1].set(0.0)

    theta_s = jnp.float32(0.5)  # Douglas implicitness

    i1_lo, i1_di, i1_up = -theta_s * dt * a1, 1.0 - theta_s * dt * b1, -theta_s * dt * c1
    # identity on pinned x-boundary rows
    i1_di = i1_di.at[:, 0].set(1.0).at[:, -1].set(1.0)
    i2_lo, i2_di, i2_up = -theta_s * dt * a2, 1.0 - theta_s * dt * b2, -theta_s * dt * c2

    def mixed(vgrid):
        """rho*sigma*v * V_xv = (rho*sigma*v/g')·V_xξ by central
        differences (zero at edges)."""
        core = (vgrid[2:, 2:] - vgrid[2:, :-2] - vgrid[:-2, 2:]
                + vgrid[:-2, :-2]) / (4.0 * dx * dxi)
        out = jnp.zeros_like(vgrid)
        return out.at[1:-1, 1:-1].set(
            rho * sig * (v[1:-1] / gp[1:-1])[:, None] * core)

    def x_boundary(tau):
        """Dirichlet values at x_lo / x_hi for time-to-maturity tau."""
        df_r = jnp.exp(-rate * tau)
        df_q = jnp.exp(-dividend * tau)
        lo_eu = jnp.maximum(cp * (s_grid[0] * df_q - strike * df_r), 0.0)
        hi_eu = jnp.maximum(cp * (s_grid[-1] * df_q - strike * df_r), 0.0)
        if american:
            lo_eu = jnp.maximum(lo_eu, intrinsic[0, 0])
            hi_eu = jnp.maximum(hi_eu, intrinsic[0, -1])
        return lo_eu, hi_eu

    def step(vg, i):
        tau = (i + 1).astype(f32) * dt
        a0v = mixed(vg)
        a1v = _apply_tridiag(a1, b1, c1, vg)
        a2v = _apply_tridiag(a2, b2, c2, vg.T).T
        y0 = vg + dt * (a0v + a1v + a2v)
        # x-sweep: (I - th dt A1) Y1 = Y0 - th dt A1 V
        rhs1 = y0 - theta_s * dt * a1v
        blo, bhi = x_boundary(tau)
        rhs1 = rhs1.at[:, 0].set(blo).at[:, -1].set(bhi)
        y1 = tridiag_solve(i1_lo, i1_di, i1_up, rhs1)
        # v-sweep: (I - th dt A2) Y2 = Y1 - th dt A2 V
        rhs2 = (y1 - theta_s * dt * a2v).T
        y2 = tridiag_solve(i2_lo, i2_di, i2_up, rhs2).T
        y2 = y2.at[:, 0].set(blo).at[:, -1].set(bhi)
        return y2

    return step, intrinsic, (x_lo, dx, dxi, c_v)


def _bilinear_at(grid, xq, vq, x_lo, dx, dxi, c_v):
    """Bilinear read of a (n_v, n_x) grid at (log-spot xq, variance vq);
    v maps through the sinh stretch (ξ = asinh(v/c)); queries clamp to
    the grid edges. Any query shape."""
    n_v, n_x = grid.shape
    fx = jnp.clip((xq - x_lo) / dx, 0.0, n_x - 1.001)
    fv = jnp.clip(jnp.arcsinh(vq / c_v) / dxi, 0.0, n_v - 1.001)
    ix = jnp.floor(fx).astype(jnp.int32)
    iv = jnp.floor(fv).astype(jnp.int32)
    wx = fx - ix
    wv = fv - iv
    p00 = grid[iv, ix]
    p01 = grid[iv, ix + 1]
    p10 = grid[iv + 1, ix]
    p11 = grid[iv + 1, ix + 1]
    return ((1 - wv) * ((1 - wx) * p00 + wx * p01)
            + wv * ((1 - wx) * p10 + wx * p11))


@functools.partial(jax.jit, static_argnames=("n_x", "n_v", "n_t", "american"))
def _heston_adi(spot, strike, maturity, rate, dividend, cp,
                params: HestonParams, n_x: int, n_v: int, n_t: int,
                american: bool):
    step, intrinsic, (x_lo, dx, dxi, c_v) = _adi_setup(
        spot, strike, maturity, rate, dividend, cp, params, n_x, n_v, n_t,
        american)

    def body(vg, i):
        y2 = step(vg, i)
        if american:
            y2 = jnp.maximum(y2, intrinsic)
        return y2, None

    vg, _ = lax.scan(body, intrinsic, jnp.arange(n_t))
    return _bilinear_at(vg, jnp.log(jnp.asarray(spot, jnp.float32)),
                        jnp.asarray(params.v0, jnp.float32), x_lo, dx,
                        dxi, c_v)


def _adi_solve_grid(spot, strike, maturity, rate, dividend, cp,
                    params: HestonParams, n_x: int, n_v: int, n_t: int,
                    american: bool):
    """Full backward solve returning the t=0 grid + geometry. The scan
    body is rematerialized (``jax.checkpoint``) so reverse-mode AD over
    the n_t steps stores O(1) grids instead of O(n_t)."""
    step, intrinsic, meta = _adi_setup(spot, strike, maturity, rate,
                                       dividend, cp, params, n_x, n_v, n_t,
                                       american)

    @jax.checkpoint
    def body(vg, i):
        y2 = step(vg, i)
        if american:
            y2 = jnp.maximum(y2, intrinsic)
        return y2, None

    vg, _ = lax.scan(body, intrinsic, jnp.arange(n_t))
    return vg, meta


def _readout_quad(vg, x_lo, dx, dxi, c_v, spot, v0):
    """Biquadratic (3x3 Lagrange) readout at (log spot, v0): smooth in
    BOTH coordinates, so AD delta/gamma (spot) and vega/vomma (v0) are
    the standard central stencils — with the stop-gradient mesh, v0
    enters ONLY here, making the v0-ladder free of any solve AD."""
    n_v, n_x = vg.shape
    fx = (jnp.log(spot) - x_lo) / dx
    fv = jnp.arcsinh(v0 / c_v) / dxi
    jx = lax.stop_gradient(jnp.clip(jnp.round(fx), 1, n_x - 2)).astype(jnp.int32)
    jv = lax.stop_gradient(jnp.clip(jnp.round(fv), 1, n_v - 2)).astype(jnp.int32)
    tx = fx - jx
    tv = fv - jv
    wx = (0.5 * tx * (tx - 1.0), 1.0 - tx * tx, 0.5 * tx * (tx + 1.0))
    wv = (0.5 * tv * (tv - 1.0), 1.0 - tv * tv, 0.5 * tv * (tv + 1.0))
    out = 0.0
    for a in range(3):
        for b in range(3):
            out = out + wv[a] * wx[b] * vg[jv + a - 1, jx + b - 1]
    return out


@functools.partial(jax.jit, static_argnames=("n_x", "n_v", "n_t", "american"))
def _fdm_greeks_pipeline(spot, strike, maturity, rate, dividend, cp,
                         params: HestonParams, n_x: int, n_v: int, n_t: int,
                         american: bool):
    import dataclasses

    f32 = jnp.float32
    spot = jnp.asarray(spot, f32)
    v0 = jnp.asarray(params.v0, f32)
    vg, (x_lo, dx, dxi, c_v) = _adi_solve_grid(spot, strike, maturity,
                                               rate, dividend, cp, params,
                                               n_x, n_v, n_t, american)

    def read(s_, w_):
        return _readout_quad(vg, x_lo, dx, dxi, c_v, s_, w_)

    price = read(spot, v0)
    delta, vega_v0 = jax.grad(read, (0, 1))(spot, v0)
    gamma = jax.grad(jax.grad(read, 0), 0)(spot, v0)
    vanna = jax.grad(jax.grad(read, 0), 1)(spot, v0)
    vomma = jax.grad(jax.grad(read, 1), 1)(spot, v0)

    def by_params(pk):
        pp = dataclasses.replace(params, kappa=pk[0], theta=pk[1],
                                 sigma=pk[2], rho=pk[3])
        vg2, meta2 = _adi_solve_grid(spot, strike, pk[5], pk[4],
                                     dividend, cp, pp, n_x, n_v,
                                     n_t, american)
        return _readout_quad(vg2, *meta2, spot, v0)

    pk0 = jnp.asarray([params.kappa, params.theta, params.sigma, params.rho,
                       rate, maturity], f32)
    gp = jax.grad(by_params)(pk0)
    return {"price": price, "delta": delta, "gamma": gamma,
            "vega_v0": vega_v0, "vanna_v0": vanna, "vomma_v0": vomma,
            "d_kappa": gp[0], "d_theta": gp[1], "d_sigma": gp[2],
            "d_rho": gp[3], "rho_rate": gp[4], "theta_cal": -gp[5]}


def heston_fdm_greeks(spot, strike, maturity, rate, params: HestonParams,
                      dividend=0.0, option_type="call",
                      american: bool = False, n_x: int = 201, n_v: int = 101,
                      n_t: int = 200) -> dict:
    """Full Greek ladder through the 2-D ADI solve, European or AMERICAN:

    - spot/v0 ladder (delta, gamma, vega_v0, vanna_v0, vomma_v0) from the
      biquadratic readout alone — with the stop-gradient mesh these cost
      nothing beyond the one solve;
    - kappa/theta/sigma/rho/rate sensitivities + calendar theta
      (``theta_cal`` = −dV/dT) by ONE reverse-mode pass through the
      rematerialized scan (the obstacle projection differentiates as its
      active-set subgradient — exact a.e. for the American).

    The reference has no American Greeks under stochastic vol at all
    (its FDM is 1-D BS, ``src/models/fdm_solver.py``); oracle coverage:
    AD of the Lewis CF engine (European), CRN central differences of this
    same solver (American).
    """
    params.validate()
    if float(maturity) <= 0:
        raise ValidationError("maturity must be > 0 for the Greek ladder")
    cp = 1.0 if str(option_type).lower() in ("call", "c", "1") else -1.0
    out = _fdm_greeks_pipeline(float(spot), float(strike), float(maturity),
                               float(rate), float(dividend), cp, params,
                               n_x, n_v, n_t, bool(american))
    return {k: float(v) for k, v in out.items()}


@functools.partial(jax.jit, static_argnames=("n_x", "n_v", "n_dates",
                                             "steps_per_date"))
def _heston_adi_bermudan(spot, strike, maturity, rate, dividend, cp,
                         params: HestonParams, n_x: int, n_v: int,
                         n_dates: int, steps_per_date: int):
    """Bermudan ADI: obstacle projection ONLY at the ``n_dates`` exercise
    dates (uniform grid, dates 1..n_dates·T/n_dates), recording the
    CONTINUATION slice at each date just before projection.

    Returns ``(price0, cont_all, x_lo, dx, dxi, c_v)``:

    - ``price0``: the Bermudan value at (spot, v0) — the PDE answer for
      the same date grid the MC bracket certifies;
    - ``cont_all``: (n_dates+1, n_v, n_x) continuation-value slices in
      FORWARD date index (entry 0 unused; entry n_dates all-zero so that
      max(exercise, cont) degrades to the terminal payoff).

    These near-exact surfaces drive both sides of the tightened
    American-under-Heston bracket: the exercise policy (lower bound) and
    the dual martingale surface (upper bound) in ``heston_american``.
    """
    spd = steps_per_date
    step, intrinsic, (x_lo, dx, dxi, c_v) = _adi_setup(
        spot, strike, maturity, rate, dividend, cp, params, n_x, n_v,
        n_dates * spd, american=True)

    def run_block(vg, b):
        def inner(vg2, j):
            return step(vg2, b * spd + j), None

        vg, _ = lax.scan(inner, vg, jnp.arange(spd))
        return vg

    def block(vg, b):
        vg = run_block(vg, b)
        cont = vg
        return jnp.maximum(vg, intrinsic), cont

    # blocks b = 0..n_dates-2 end at forward dates n_dates-1 .. 1 (tau =
    # (b+1)T/n_dates), each followed by exercise; the final block reaches
    # t = 0 with no projection (no date-0 exercise, matching the MC grid)
    vg, conts = lax.scan(block, intrinsic, jnp.arange(n_dates - 1))
    vg = run_block(vg, n_dates - 1)
    price0 = _bilinear_at(vg, jnp.log(jnp.asarray(spot, jnp.float32)),
                          jnp.asarray(params.v0, jnp.float32), x_lo, dx,
                          dxi, c_v)
    zero = jnp.zeros((1,) + intrinsic.shape, intrinsic.dtype)
    cont_all = jnp.concatenate([zero, conts[::-1], zero], axis=0)
    return price0, cont_all, x_lo, dx, dxi, c_v


def heston_fdm_price(spot, strike, maturity, rate, params: HestonParams,
                     dividend=0.0, option_type="call", american: bool = False,
                     n_x: int = 201, n_v: int = 101, n_t: int = 200):
    """Heston European/American price by Douglas ADI on the 2-D PDE.

    Scalars in, scalar out (vmap for batches).  ``n_x/n_v/n_t`` trade
    accuracy for time; the defaults put ATM European within ~0.1% of the
    Lewis engine."""
    params.validate()
    if float(maturity) <= 0:
        return float(np.maximum(
            (1.0 if str(option_type).lower().startswith("c") else -1.0)
            * (float(spot) - float(strike)), 0.0))
    cp = 1.0 if str(option_type).lower() in ("call", "c", "1") else -1.0
    return _heston_adi(spot, strike, float(maturity), rate, dividend, cp,
                       params, n_x, n_v, n_t, bool(american))


# ---------------------------------------------------------------------------
# SLV (Heston x frozen leverage) Bermudan ADI — the tightened-bracket engine
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("n_x", "n_v", "n_dates",
                                             "steps_per_date"))
def _slv_adi_bermudan(spot, strike, maturity, rate, dividend, cp,
                      params: HestonParams, mixing, x_rows, l_rows,
                      n_x: int, n_v: int, n_dates: int,
                      steps_per_date: int):
    """Bermudan ADI under the FROZEN-LEVERAGE SLV law: the x-direction
    diffusion is L(x, t)²·v and the mixed term ρσ·L·v, with L read from
    the SAME particle-calibrated per-substep leverage rows the MC bracket
    replays (piecewise-constant in time, exactly like the Euler path law)
    — so the continuation slices approximate the value surface of the
    law being certified, not a different model. The x-stencils and the
    implicit x-sweep matrices are rebuilt per time step (the leverage is
    time-dependent); the v-direction operator is leverage-free and stays
    static. Everything else mirrors :func:`_heston_adi_bermudan`.

    Returns ``(price0, cont_all, x_lo, dx, dxi, c_v)``.
    """
    f32 = jnp.float32
    spot, strike, maturity, rate, dividend, cp = (
        jnp.asarray(a, f32) for a in (spot, strike, maturity, rate,
                                      dividend, cp))
    kap, th, rho, v0 = (jnp.asarray(a, f32) for a in
                        (params.kappa, params.theta, params.rho, params.v0))
    sig = jnp.asarray(mixing, f32) * jnp.asarray(params.sigma, f32)

    n_t = n_dates * steps_per_date
    spd = steps_per_date
    # ---- grids (stop-gradient geometry, cf. _adi_setup) -------------------
    vbar = jnp.maximum(v0, th)
    half_width = 5.0 * jnp.sqrt(vbar * maturity) + \
        1.5 * jnp.abs(jnp.log(spot / strike)) + 0.5
    x_lo = lax.stop_gradient(jnp.log(strike) - half_width)
    x_hi = lax.stop_gradient(jnp.log(strike) + half_width)
    x = jnp.linspace(x_lo, x_hi, n_x)
    dx = (x_hi - x_lo) / (n_x - 1)
    v_max = lax.stop_gradient(
        1.5 * vbar + 10.0 * sig * jnp.sqrt(vbar / (2.0 * kap))
        + 2.0 * sig * sig / kap)
    c_v = lax.stop_gradient(vbar)
    xi_max = jnp.arcsinh(v_max / c_v)
    xi = jnp.linspace(0.0, xi_max, n_v)
    dxi = xi_max / (n_v - 1)
    v = c_v * jnp.sinh(xi)
    gp = c_v * jnp.cosh(xi)
    dt = maturity / n_t

    s_grid = jnp.exp(x)
    intrinsic = jnp.maximum(cp * (s_grid[None, :] - strike), 0.0)
    intrinsic = jnp.broadcast_to(intrinsic, (n_v, n_x))

    # leverage on the ADI x-grid, one row per MC substep (host rows are
    # indexed by RELATIVE log-spot)
    n_rows = x_rows.shape[0]
    x_rel = x - jnp.log(spot)
    lev_tab = jax.vmap(lambda xr, lr: jnp.interp(x_rel, xr, lr))(
        jnp.asarray(x_rows, f32), jnp.asarray(l_rows, f32))   # (n_rows, n_x)
    dt_mc = maturity / n_rows

    # ---- static v-direction operator (leverage-free) ----------------------
    vk = v[None, :]
    gpk = gp[None, :]
    conv_v = (kap * (th - vk) / gpk
              - 0.5 * sig * sig * vk * vk / gpk**3) / (2.0 * dxi)
    diff_v = 0.5 * sig * sig * vk / (gpk * gpk * dxi * dxi)
    a2 = diff_v - conv_v
    c2 = diff_v + conv_v
    b2 = -2.0 * diff_v - 0.5 * rate
    a2 = jnp.broadcast_to(a2, (n_x, n_v))
    b2 = jnp.broadcast_to(b2, (n_x, n_v))
    c2 = jnp.broadcast_to(c2, (n_x, n_v))
    up0 = kap * th / (c_v * dxi)
    a2 = a2.at[:, 0].set(0.0)
    b2 = b2.at[:, 0].set(-up0 - 0.5 * rate)
    c2 = c2.at[:, 0].set(up0)
    a2 = a2.at[:, -1].set(0.0)
    b2 = b2.at[:, -1].set(-0.5 * rate)
    c2 = c2.at[:, -1].set(0.0)

    theta_s = jnp.float32(0.5)
    i2_lo, i2_di, i2_up = (-theta_s * dt * a2, 1.0 - theta_s * dt * b2,
                           -theta_s * dt * c2)
    edge = jnp.zeros((n_v, 1), f32)
    zcol = jnp.zeros((n_v, 1), f32)

    def x_stencil(lev2):
        """(a1, b1, c1) for the step's leverage row (n_x,) squared."""
        vj = v[:, None]
        l2 = lev2[None, :]
        conv_x = (rate - dividend - 0.5 * l2 * vj) / (2.0 * dx)
        diff_x = 0.5 * l2 * vj / (dx * dx)
        a1 = diff_x - conv_x
        c1 = diff_x + conv_x
        b1 = -2.0 * diff_x - 0.5 * rate
        a1 = jnp.concatenate([edge, a1[:, 1:-1], edge], axis=1)
        c1 = jnp.concatenate([edge, c1[:, 1:-1], edge], axis=1)
        b1 = jnp.concatenate([zcol, b1[:, 1:-1], zcol], axis=1)
        return a1, b1, c1

    def mixed(vgrid, lev):
        core = (vgrid[2:, 2:] - vgrid[2:, :-2] - vgrid[:-2, 2:]
                + vgrid[:-2, :-2]) / (4.0 * dx * dxi)
        out = jnp.zeros_like(vgrid)
        return out.at[1:-1, 1:-1].set(
            rho * sig * lev[None, 1:-1]
            * (v[1:-1] / gp[1:-1])[:, None] * core)

    def x_boundary(tau):
        df_r = jnp.exp(-rate * tau)
        df_q = jnp.exp(-dividend * tau)
        lo_eu = jnp.maximum(cp * (s_grid[0] * df_q - strike * df_r), 0.0)
        hi_eu = jnp.maximum(cp * (s_grid[-1] * df_q - strike * df_r), 0.0)
        lo_eu = jnp.maximum(lo_eu, intrinsic[0, 0])
        hi_eu = jnp.maximum(hi_eu, intrinsic[0, -1])
        return lo_eu, hi_eu

    def step(vg, i):
        tau = (i + 1).astype(f32) * dt
        # leverage row in force on the FORWARD interval this backward
        # step integrates over
        t_fwd = maturity - tau + 0.5 * dt
        row = jnp.clip((t_fwd / dt_mc).astype(jnp.int32), 0, n_rows - 1)
        lev = lax.dynamic_index_in_dim(lev_tab, row, 0, keepdims=False)
        a1, b1, c1 = x_stencil(lev * lev)
        a0v = mixed(vg, lev)
        a1v = _apply_tridiag(a1, b1, c1, vg)
        a2v = _apply_tridiag(a2, b2, c2, vg.T).T
        y0 = vg + dt * (a0v + a1v + a2v)
        rhs1 = y0 - theta_s * dt * a1v
        blo, bhi = x_boundary(tau)
        rhs1 = rhs1.at[:, 0].set(blo).at[:, -1].set(bhi)
        i1_lo = -theta_s * dt * a1
        i1_di = (1.0 - theta_s * dt * b1).at[:, 0].set(1.0).at[:, -1].set(1.0)
        i1_up = -theta_s * dt * c1
        y1 = tridiag_solve(i1_lo, i1_di, i1_up, rhs1)
        rhs2 = (y1 - theta_s * dt * a2v).T
        y2 = tridiag_solve(i2_lo, i2_di, i2_up, rhs2).T
        y2 = y2.at[:, 0].set(blo).at[:, -1].set(bhi)
        return y2

    def run_block(vg, b):
        def inner(vg2, j):
            return step(vg2, b * spd + j), None

        vg, _ = lax.scan(inner, vg, jnp.arange(spd))
        return vg

    def block(vg, b):
        vg = run_block(vg, b)
        cont = vg
        return jnp.maximum(vg, intrinsic), cont

    vg, conts = lax.scan(block, intrinsic, jnp.arange(n_dates - 1))
    vg = run_block(vg, n_dates - 1)
    price0 = _bilinear_at(vg, jnp.log(spot), v0, x_lo, dx, dxi, c_v)
    zero = jnp.zeros((1,) + intrinsic.shape, intrinsic.dtype)
    cont_all = jnp.concatenate([zero, conts[::-1], zero], axis=0)
    return price0, cont_all, x_lo, dx, dxi, c_v
