"""Dupire local volatility: surface extraction + local-vol PDE pricer.

Reference capabilities covered (SURVEY.md §2.2, ``src/pricing_models/
local_vol.py``):
  - σ_loc²(K,T) from an IV surface via the Dupire formula with derivatives
    of BS call prices (``:73-138``)
  - interpolated surface object (``:163`` RectBivariateSpline)
  - explicit-FDM pricer reading σ(S,t) per node (``:181-262``)
  - ``PricerProtocol``-compatible ``price`` (``:264``)
  - sample smile generator (``:280``)

TPU-first design: the Dupire numerator/denominator come from AD derivatives
of the (smooth, interpolated) total-variance surface — the "local vol from
total variance" form

    σ_loc²(k,T) = ∂_T w / [1 − (k/w)∂_k w + ¼(−¼ − 1/w + k²/w²)(∂_k w)²
                            + ½ ∂²_k w]

which avoids differentiating noisy call prices (reference FD-differentiates
BS prices). Interpolation is bilinear in (k, T) on a dense grid — jit-able
and AD-safe; the local-vol PDE is the same θ-scheme engine as ``fdm.py``
with a σ(S,t) lookup per node/step.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.tridiag import tridiag_solve
from ..utils.config import EPS_TIME
from ..utils.exceptions import ValidationError


def _bilinear(grid_x, grid_y, values, xq, yq):
    """Differentiable bilinear interpolation; clamps outside the grid.

    values: (n_y, n_x); xq/yq broadcastable."""
    nx = grid_x.shape[0]
    ny = grid_y.shape[0]
    dx = grid_x[1] - grid_x[0]
    dy = grid_y[1] - grid_y[0]
    fx = jnp.clip((xq - grid_x[0]) / dx, 0.0, nx - 1.001)
    fy = jnp.clip((yq - grid_y[0]) / dy, 0.0, ny - 1.001)
    ix = jnp.floor(fx).astype(jnp.int32)
    iy = jnp.floor(fy).astype(jnp.int32)
    tx = fx - ix
    ty = fy - iy
    v00 = values[iy, ix]
    v01 = values[iy, ix + 1]
    v10 = values[iy + 1, ix]
    v11 = values[iy + 1, ix + 1]
    return (v00 * (1 - tx) * (1 - ty) + v01 * tx * (1 - ty)
            + v10 * (1 - tx) * ty + v11 * tx * ty)


class LocalVolSurface:
    """σ_loc(S, t) interpolator on a dense (log-moneyness, T) grid."""

    def __init__(self, k_grid, t_grid, local_vol_grid, spot, rate, dividend=0.0):
        self.k_grid = jnp.asarray(k_grid, jnp.float32)
        self.t_grid = jnp.asarray(t_grid, jnp.float32)
        self.grid = jnp.asarray(local_vol_grid, jnp.float32)  # (n_t, n_k)
        self.spot = float(spot)
        self.rate = float(rate)
        self.dividend = float(dividend)

    def __call__(self, s, t):
        """σ_loc at spot level(s) s and time(s) t (k = log(s/S0·e^{(r-q)t}))."""
        fwd = self.spot * jnp.exp((self.rate - self.dividend) * jnp.asarray(t))
        k = jnp.log(jnp.maximum(jnp.asarray(s), 1e-12) / fwd)
        return _bilinear(self.k_grid, self.t_grid, self.grid, k, jnp.asarray(t))


class DupireLocalVol:
    """Extracts σ_loc(k, T) from an IV function and prices through it."""

    def __init__(self, iv_fn, spot, rate, dividend=0.0,
                 k_range=(-0.8, 0.8), t_range=(0.02, 2.5), n_k: int = 121, n_t: int = 60):
        """``iv_fn(k, T) -> implied vol`` must be a smooth (differentiable)
        function of log-moneyness k and maturity T — e.g. an SVI/SSVI/PINN
        surface or an interpolated market surface."""
        self.iv_fn = iv_fn
        self.spot = float(spot)
        self.rate = float(rate)
        self.dividend = float(dividend)
        self.k_grid = jnp.linspace(*k_range, n_k)
        self.t_grid = jnp.linspace(*t_range, n_t)
        self.surface = self._build()

    def _w(self, k, t):
        iv = self.iv_fn(k, t)
        return iv * iv * t

    def local_variance(self, k, t):
        """Dupire in total-variance form via AD (no FD of prices)."""
        k = jnp.asarray(k, jnp.float32)
        t = jnp.asarray(t, jnp.float32)

        w_fn = self._w
        w = w_fn(k, t)
        dw_dt = jax.vmap(lambda kk, tt: jax.grad(lambda a: w_fn(kk, a))(tt))(k.ravel(), t.ravel()).reshape(k.shape)
        dw_dk = jax.vmap(lambda kk, tt: jax.grad(lambda a: w_fn(a, tt))(kk))(k.ravel(), t.ravel()).reshape(k.shape)
        d2w_dk2 = jax.vmap(
            lambda kk, tt: jax.grad(jax.grad(lambda a: w_fn(a, tt)))(kk)
        )(k.ravel(), t.ravel()).reshape(k.shape)

        w_safe = jnp.maximum(w, 1e-8)
        denom = (1.0 - k / w_safe * dw_dk
                 + 0.25 * (-0.25 - 1.0 / w_safe + (k / w_safe) ** 2) * dw_dk**2
                 + 0.5 * d2w_dk2)
        return jnp.clip(jnp.maximum(dw_dt, 1e-8) / jnp.maximum(denom, 1e-4), 1e-6, 4.0)

    def _build(self) -> LocalVolSurface:
        kk, tt = jnp.meshgrid(self.k_grid, self.t_grid)  # (n_t, n_k)
        var = self.local_variance(kk, tt)
        return LocalVolSurface(self.k_grid, self.t_grid, jnp.sqrt(var),
                               self.spot, self.rate, self.dividend)

    # -- PDE pricer through the local-vol surface ---------------------------
    def _solve(self, strike, maturity, cp, n_space: int = 201, n_time: int = 200,
               american: bool = False):
        return _lv_solve(self.surface.k_grid, self.surface.t_grid, self.surface.grid,
                         self.spot, self.rate, self.dividend, strike, maturity, cp,
                         n_space=n_space, n_time=n_time, american=american)

    def price(self, S, K, T, r=None, sigma=None, option_type="call", q=None):
        """PricerProtocol-compatible (reference: ``local_vol.py:264``);
        r/σ/q arguments are ignored — the surface supplies dynamics."""
        if abs(float(S) - self.spot) > 1e-9 * max(self.spot, 1.0):
            raise ValidationError(
                "local-vol surface was built for spot "
                f"{self.spot}; rebuild for S={S}")
        cp = 1.0 if str(option_type).lower() in ("call", "c", "1") else -1.0
        return self._solve(jnp.float32(K), jnp.float32(T), jnp.float32(cp))


def sample_smile_iv_fn(base_vol=0.2, skew=-0.15, smile=0.1, term=0.02):
    """Smooth synthetic IV surface (reference's sample smile,
    ``local_vol.py:280``) for demos/tests."""

    def iv(k, t):
        return (base_vol + skew * k + smile * k * k
                + term * jnp.sqrt(jnp.maximum(t, 1e-6)))

    return iv


@functools.partial(jax.jit, static_argnames=("n_space", "n_time", "american"))
def _lv_solve(k_grid, t_grid, vol_grid, spot, rate, dividend, strike, maturity, cp,
              n_space: int = 201, n_time: int = 200, american: bool = False):
    """Implicit time stepping through the interpolated local-vol surface."""
    strike = jnp.asarray(strike, jnp.float32)
    maturity = jnp.asarray(maturity, jnp.float32)
    cp = jnp.asarray(cp, jnp.float32)
    t_total = jnp.maximum(maturity, EPS_TIME)

    def sigma_at(s, t):
        fwd = spot * jnp.exp((rate - dividend) * t)
        kq = jnp.log(jnp.maximum(s, 1e-12) / fwd)
        return _bilinear(k_grid, t_grid, vol_grid, kq, t)

    atm_vol = sigma_at(jnp.asarray(spot, jnp.float32), 0.5 * t_total)
    half = 6.0 * jnp.maximum(atm_vol, 0.1) * jnp.sqrt(t_total)
    x = jax.lax.stop_gradient(jnp.log(spot) + jnp.linspace(-1.0, 1.0, n_space) * half)
    dx = x[1] - x[0]
    s_nodes = jnp.exp(x)
    dt = t_total / n_time
    intrinsic = jnp.maximum(cp * (s_nodes - strike), 0.0)

    def step(v, i):
        tau = t_total - (i + 0.5) * dt  # calendar time of this step
        sig = sigma_at(s_nodes, jnp.maximum(tau, 1e-4))
        sig2 = sig * sig
        mu = rate - dividend - 0.5 * sig2
        a = 0.5 * sig2 / dx**2 - 0.5 * mu / dx
        b = -sig2 / dx**2 - rate
        c = 0.5 * sig2 / dx**2 + 0.5 * mu / dx
        lo = (-dt * a).at[0].set(0.0).at[-1].set(0.0)
        di = (1.0 - dt * b).at[0].set(1.0).at[-1].set(1.0)
        up = (-dt * c).at[0].set(0.0).at[-1].set(0.0)
        tau_exp = (i + 1.0) * dt
        vlo = jnp.where(cp > 0, 0.0, strike * jnp.exp(-rate * tau_exp) - s_nodes[0])
        vhi = jnp.where(cp > 0, s_nodes[-1] * jnp.exp(-dividend * tau_exp)
                        - strike * jnp.exp(-rate * tau_exp), 0.0)
        rhs = v.at[0].set(jnp.maximum(vlo, 0.0)).at[-1].set(jnp.maximum(vhi, 0.0))
        v_new = tridiag_solve(lo, di, up, rhs)
        if american:
            v_new = jnp.maximum(v_new, intrinsic)
        return v_new, None

    v, _ = lax.scan(step, intrinsic, jnp.arange(n_time, dtype=jnp.float32))
    return v[n_space // 2]


@functools.partial(jax.jit, static_argnames=("n_paths", "n_steps", "payoff"))
def _lv_mc(k_grid, t_grid, vol_grid, spot, rate, dividend, strike, maturity, cp,
           key, n_paths: int = 200_000, n_steps: int = 100, payoff: str = "european"):
    """Monte Carlo under the local-vol surface: log-Euler scan with a
    bilinear σ(S, t) lookup per step. Supports European and arithmetic-
    Asian payoffs. Returns (price, stderr)."""
    dtype = jnp.float32
    t_total = jnp.maximum(jnp.asarray(maturity, dtype), EPS_TIME)
    dt = t_total / n_steps
    sqrt_dt = jnp.sqrt(dt)
    half = n_paths // 2

    def sigma_at(s, t):
        fwd = spot * jnp.exp((rate - dividend) * t)
        kq = jnp.log(jnp.maximum(s, 1e-12) / fwd)
        return _bilinear(k_grid, t_grid, vol_grid, kq, t)

    def step(carry, i):
        log_s, acc = carry
        t_now = i * dt
        s = spot * jnp.exp(log_s)
        sig = sigma_at(s, t_now)
        z = jax.random.normal(jax.random.fold_in(key, i), (half,), dtype=dtype)
        z = jnp.concatenate([z, -z])
        log_s = log_s + (rate - dividend - 0.5 * sig * sig) * dt + sig * sqrt_dt * z
        acc = acc + spot * jnp.exp(log_s)
        return (log_s, acc), None

    (log_s, acc), _ = jax.lax.scan(step, (jnp.zeros(n_paths, dtype),
                                          jnp.zeros(n_paths, dtype)),
                                   jnp.arange(n_steps, dtype=dtype))
    terminal = spot * jnp.exp(log_s)
    underlying = acc / n_steps if payoff == "asian" else terminal
    pay = jnp.maximum(cp * (underlying - strike), 0.0)
    df = jnp.exp(-rate * t_total)
    price = df * pay.mean()
    stderr = df * pay.std(ddof=1) / jnp.sqrt(n_paths * 1.0)
    return price, stderr


def local_vol_mc_price(dupire: "DupireLocalVol", strike, maturity, cp=1.0,
                       payoff: str = "european", n_paths: int = 200_000,
                       n_steps: int = 100, seed: int = 0):
    """Price European or arithmetic-Asian options by MC under a calibrated
    Dupire surface — pricing path-dependent payoffs consistently with the
    vanilla smile (the reference's local vol only prices vanillas via
    explicit FDM, ``local_vol.py:181-262``). Returns (price, stderr)."""
    if payoff not in ("european", "asian"):
        raise ValidationError(f"payoff must be european|asian, got {payoff}")
    return _lv_mc(dupire.surface.k_grid, dupire.surface.t_grid, dupire.surface.grid,
                  dupire.spot, dupire.rate, dupire.dividend,
                  jnp.float32(strike), jnp.float32(maturity), jnp.float32(cp),
                  jax.random.PRNGKey(seed), n_paths=n_paths, n_steps=n_steps,
                  payoff=payoff)


@functools.partial(jax.jit, static_argnames=("n_paths", "n_steps"))
def _lv_realized_variance(k_grid, t_grid, vol_grid, spot, rate, dividend,
                          maturity, key, n_paths, n_steps):
    """Per-path MODEL integrated variance RV = (1/T) ∫ σ_loc(S_t, t)² dt
    along local-vol paths (left-point sampling, same scan as ``_lv_mc``).

    Accumulating σ² directly (instead of squared log-returns) removes the
    2·RV²/n realized-variance chatter — the estimator targets E[RV] with
    only the path-to-path variance of the smile traversal left. Returns
    (E[RV], se, E[√RV], se): the fair VARIANCE swap strike and the fair
    VOLATILITY swap strike (the latter BELOW √E[RV] by Jensen)."""
    dtype = jnp.float32
    t_total = jnp.maximum(jnp.asarray(maturity, dtype), EPS_TIME)
    dt = t_total / n_steps
    sqrt_dt = jnp.sqrt(dt)
    half = n_paths // 2

    def sigma_at(s, t):
        fwd = spot * jnp.exp((rate - dividend) * t)
        kq = jnp.log(jnp.maximum(s, 1e-12) / fwd)
        return _bilinear(k_grid, t_grid, vol_grid, kq, t)

    def step(carry, i):
        log_s, acc = carry
        t_now = i * dt
        s = spot * jnp.exp(log_s)
        sig = sigma_at(s, t_now)
        z = jax.random.normal(jax.random.fold_in(key, i), (half,), dtype=dtype)
        z = jnp.concatenate([z, -z])
        log_s = log_s + (rate - dividend - 0.5 * sig * sig) * dt \
            + sig * sqrt_dt * z
        acc = acc + sig * sig * dt
        return (log_s, acc), None

    (_, acc), _ = jax.lax.scan(step, (jnp.zeros(n_paths, dtype),
                                      jnp.zeros(n_paths, dtype)),
                               jnp.arange(n_steps, dtype=dtype))
    rv = acc / t_total
    vol = jnp.sqrt(rv)
    # stderr over the antithetic PAIR means (pairs are (i, i+half)):
    # only n_paths/2 draws are independent, and the smile traversal
    # correlates the two branches positively
    rv_pm = 0.5 * (rv[:half] + rv[half:])
    vol_pm = 0.5 * (vol[:half] + vol[half:])
    rn = jnp.sqrt(half * 1.0)
    return (rv.mean(), rv_pm.std(ddof=1) / rn,
            vol.mean(), vol_pm.std(ddof=1) / rn)


def _check_varswap_wing_coverage(dupire: "DupireLocalVol", maturity):
    """Warn when the Dupire grid's k-range cannot span the strike strip a
    variance swap integrates over.

    The fair strike E[(1/T)∫σ_loc² dt] matches the model-free replication
    only when σ_loc is trusted wherever the paths wander (≈ ±2.5·σ_ATM·√T
    in log-moneyness). Beyond ``k_grid`` the bilinear surface CLAMPS to
    the edge value, silently biasing K_var — the default ±0.8 grid lost
    18% of K_var vs a ±2.5 strip on a smiling surface. Build the
    ``DupireLocalVol`` with ``k_range=(-2.5, 2.5)`` (or wider) for swap
    work."""
    import warnings

    kg = np.asarray(dupire.surface.k_grid)
    tg = np.asarray(dupire.surface.t_grid)
    vg = np.asarray(dupire.surface.grid)
    t = float(maturity)
    sig_atm = float(vg[np.argmin(np.abs(tg - t)), np.argmin(np.abs(kg))])
    need = 2.5 * sig_atm * np.sqrt(max(t, 1e-8))
    if need > min(-float(kg[0]), float(kg[-1])) + 1e-9:
        warnings.warn(
            f"Dupire k_grid [{float(kg[0]):.2f}, {float(kg[-1]):.2f}] "
            f"does not span the ±{need:.2f} log-moneyness strip a "
            f"T={t:g} variance swap integrates over; clamped wings bias "
            "K_var (18% shortfall measured on the default ±0.8 grid). "
            "Rebuild the surface with k_range=(-2.5, 2.5) or wider.",
            stacklevel=3)


def local_vol_swap_strikes(dupire: "DupireLocalVol", maturity,
                           n_paths: int = 200_000, n_steps: int = 100,
                           seed: int = 0):
    """Both swap strikes from ONE simulation: returns
    ``(K_var, se_var, K_vol, se_vol)``. The per-path integrated variance
    and its square root are functionals of the same paths, so pricing
    the variance swap and the volatility swap separately would run the
    identical n_paths×n_steps scan twice (0.5–3 s/dispatch over the TPU
    tunnel). Wing-coverage requirement: see ``local_vol_variance_swap``."""
    _check_varswap_wing_coverage(dupire, maturity)
    return _lv_realized_variance(
        dupire.surface.k_grid, dupire.surface.t_grid, dupire.surface.grid,
        dupire.spot, dupire.rate, dupire.dividend, jnp.float32(maturity),
        jax.random.PRNGKey(seed), n_paths, n_steps)


def local_vol_variance_swap(dupire: "DupireLocalVol", maturity,
                            n_paths: int = 200_000, n_steps: int = 100,
                            seed: int = 0):
    """Fair variance swap strike E[(1/T) ∫ σ_loc²(S_t, t) dt] under the
    calibrated Dupire dynamics. Returns (K_var, stderr).

    Because local vol reprices the vanilla smile by construction, this MC
    strike must agree with the MODEL-FREE replication of the same smile
    (``models/var_swap.variance_swap_strike_from_iv``) up to grid/Euler
    discretization — an end-to-end consistency check of the whole Dupire
    pipeline, asserted in tests. On a flat surface RV is deterministic:
    K_var = σ² with zero stderr.

    REQUIREMENT: the Dupire surface's ``k_grid`` must span the
    replication strip (≈ ±2.5·σ_ATM·√T log-moneyness; k_range=(-2.5, 2.5)
    is safe for equity-like vols) — beyond the grid the surface clamps
    to its edge value and K_var is silently biased (an 18% shortfall was
    measured with the default ±0.8 grid on a smiling surface). A warning
    fires when the grid is too narrow. The reference has no variance-swap
    machinery at all (beyond-reference; cf. its vanilla-only local vol,
    ``src/models/local_vol.py``)."""
    m, se, _, _ = local_vol_swap_strikes(dupire, maturity, n_paths,
                                         n_steps, seed)
    return m, se


def local_vol_cliquet_price(dupire: "DupireLocalVol", maturity,
                            local_floor: float = -0.05,
                            local_cap: float = 0.05,
                            global_floor: float = 0.0,
                            global_cap: float = 1e9,
                            notional: float = 100.0, n_periods: int = 12,
                            n_paths: int = 131_072, n_steps: int = 252,
                            seed: int = 0, return_stderr: bool = False):
    """Cliquet/ratchet under PURE Dupire local vol: the SLV engine at
    mixing=0, where the Gyongy leverage absorbs the (deterministic,
    eta=0) variance path so the instantaneous vol is exactly
    σ_loc(S, t) — pure-LV dynamics with zero new simulation code.
    Conventions match ``models/exotics.cliquet_price``; a flat surface
    reproduces the GBM engine. Pure LV FLATTENS forward smiles, so this
    is the textbook lower anchor for the cliquet's mixing
    interpolation (cf. ``models/slv.slv_cliquet_price``)."""
    import jax as _jax

    from .heston import HestonParams
    from .slv import slv_cliquet_price

    par = HestonParams.make(0.04, 2.0, 0.04, 0.3, -0.7)
    return slv_cliquet_price(
        jnp.float32(dupire.spot), float(maturity),
        jnp.float32(dupire.rate), par, _jax.random.PRNGKey(seed),
        dupire.surface.k_grid, dupire.surface.t_grid, dupire.surface.grid,
        dividend=jnp.float32(dupire.dividend), mixing=0.0,
        local_floor=local_floor, local_cap=local_cap,
        global_floor=global_floor, global_cap=global_cap,
        notional=notional, n_periods=n_periods, n_paths=n_paths,
        n_steps=n_steps, return_stderr=return_stderr)


def local_vol_autocall_price(dupire: "DupireLocalVol", maturity,
                             notional: float = 100.0,
                             autocall_barrier: float = 1.0,
                             coupon_barrier: float = 0.8,
                             ki_barrier: float = 0.7,
                             coupon_rate: float = 0.08, n_obs: int = 4,
                             n_paths: int = 131_072, n_steps: int = 252,
                             seed: int = 0, return_stderr: bool = False):
    """Autocallable under PURE Dupire local vol (SLV engine at mixing=0
    — see :func:`local_vol_cliquet_price` for why that is exact). The
    knock-in barrier prices on the market smile; what pure LV misses is
    the vega-sign dynamics, which is the ``mixing`` knob's job.
    Conventions match ``models/exotics.autocallable_price``."""
    import jax as _jax

    from .heston import HestonParams
    from .slv import slv_autocall_price

    par = HestonParams.make(0.04, 2.0, 0.04, 0.3, -0.7)
    return slv_autocall_price(
        jnp.float32(dupire.spot), float(maturity),
        jnp.float32(dupire.rate), par, _jax.random.PRNGKey(seed),
        dupire.surface.k_grid, dupire.surface.t_grid, dupire.surface.grid,
        dividend=jnp.float32(dupire.dividend), mixing=0.0,
        notional=notional, autocall_barrier=autocall_barrier,
        coupon_barrier=coupon_barrier, ki_barrier=ki_barrier,
        coupon_rate=coupon_rate, n_obs=n_obs, n_paths=n_paths,
        n_steps=n_steps, return_stderr=return_stderr)


def local_vol_vol_swap_strike(dupire: "DupireLocalVol", maturity,
                              n_paths: int = 200_000, n_steps: int = 100,
                              seed: int = 0):
    """Fair VOLATILITY swap strike E[√((1/T) ∫ σ_loc² dt)] under Dupire
    dynamics — sits below √K_var by Jensen; the gap prices the convexity
    the smile's vol-of-vol induces in √RV. Returns (K_vol, stderr).
    Wing-coverage requirement: see ``local_vol_variance_swap``; use
    ``local_vol_swap_strikes`` when you need both strikes (one sim)."""
    _, _, m, se = local_vol_swap_strikes(dupire, maturity, n_paths,
                                         n_steps, seed)
    return m, se
