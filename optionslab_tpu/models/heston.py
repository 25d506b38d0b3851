"""Heston stochastic-volatility model: semi-analytic pricing, MC, calibration.

Reference capabilities covered (SURVEY.md §2.2):
  - ``src/pricing_models/heston.py:84-130`` — Gatheral-form characteristic
    function ("little trap" branching).
  - ``heston.py:131-183`` — semi-analytic European pricing via an adaptive
    Lewis integral (``scipy.integrate.quad`` on [0,100]).
  - ``heston.py:184-311`` — full-truncation Euler Monte Carlo + path
    simulator.
  - ``heston.py:312-414`` — L-BFGS-B calibration to an IV surface;
    Feller-condition warning (``heston.py:74-81``).

TPU-first design: the adaptive quadrature becomes a FIXED Gauss–Legendre
rule (static nodes → one fused, vmap-able launch; accuracy vs SciPy quad
is asserted in tests); the CF evaluates for all (node, contract) pairs at
once. MC never materializes paths: a `lax.scan` carries (log-spot,
variance). Calibration is gradient-based through the pricer itself
(`jax.value_and_grad` + Adam with box transforms) — no finite differences.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..types import ContractBatch
from ..utils.config import EPS_TIME
from ..utils.exceptions import CalibrationError, ValidationError
from ..utils.logging import get_logger

logger = get_logger(__name__)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HestonParams:
    """v0: initial variance, kappa: mean-reversion speed, theta: long-run
    variance, sigma: vol-of-vol, rho: spot/vol correlation."""

    v0: jnp.ndarray
    kappa: jnp.ndarray
    theta: jnp.ndarray
    sigma: jnp.ndarray
    rho: jnp.ndarray

    @classmethod
    def make(cls, v0=0.04, kappa=2.0, theta=0.04, sigma=0.3, rho=-0.7, dtype=jnp.float32):
        # host inputs stay HOST scalars: an eager jnp.asarray costs a
        # ~40 ms RPC over the TPU tunnel (x5 fields, per make()), and
        # downstream float(field) reads would each sync device->host.
        # jax arrays/tracers pass through jnp (calibration loops build
        # params from traced values via the plain constructor).
        return cls(*(jnp.asarray(x, dtype) if isinstance(x, jax.Array)
                     else np.asarray(x, dtype)
                     for x in (v0, kappa, theta, sigma, rho)))

    def feller_ok(self) -> jnp.ndarray:
        """2κθ ≥ σ² (variance stays strictly positive)."""
        return 2.0 * self.kappa * self.theta >= self.sigma**2

    def validate(self):
        vals = {f.name: float(np.asarray(getattr(self, f.name)).ravel()[0])
                for f in dataclasses.fields(self)}
        if vals["v0"] <= 0 or vals["kappa"] <= 0 or vals["theta"] <= 0 or vals["sigma"] <= 0:
            raise ValidationError(f"Heston params must be positive: {vals}")
        if not -1.0 < vals["rho"] < 1.0:
            raise ValidationError(f"rho must be in (-1, 1): {vals['rho']}")
        if 2 * vals["kappa"] * vals["theta"] < vals["sigma"] ** 2:
            logger.warning(
                "Feller condition violated (2κθ=%.4f < σ²=%.4f): variance can hit zero",
                2 * vals["kappa"] * vals["theta"], vals["sigma"] ** 2,
            )


@functools.lru_cache(maxsize=8)
def _gl_nodes(n: int, a: float, b: float):
    """Gauss–Legendre nodes/weights on [a, b] (host-side, cached)."""
    x, w = np.polynomial.legendre.leggauss(n)
    return 0.5 * (b - a) * x + 0.5 * (a + b), 0.5 * (b - a) * w


def _heston_cd(u, params: HestonParams, maturity):
    """(C, D) of the Heston log-forward CF exp(theta*C + v0*D), little-trap
    branch (stable for large T).  Exposed separately so forward-start
    pricing can integrate D against the CIR transition law of v_{T1}."""
    kappa, sigma, rho = params.kappa, params.sigma, params.rho
    iu = 1j * u
    alpha = -0.5 * u * (u + 1j)
    beta = kappa - rho * sigma * iu
    gamma2 = 0.5 * sigma**2
    d = jnp.sqrt(beta**2 - 4.0 * alpha * gamma2)
    rp = (beta + d) / sigma**2
    rm = (beta - d) / sigma**2
    g = rm / rp
    ed = jnp.exp(-d * maturity)
    D = rm * (1.0 - ed) / (1.0 - g * ed)
    C = kappa * (rm * maturity - (2.0 / sigma**2) * jnp.log((1.0 - g * ed) / (1.0 - g)))
    return C, D


def _heston_cf(u, params: HestonParams, maturity):
    """CF of log(S_T/F) under Heston (Gatheral formulation, as the
    reference uses at ``heston.py:84-130``) evaluated on complex arrays
    for all quadrature nodes at once."""
    C, D = _heston_cd(u, params, maturity)
    return jnp.exp(params.theta * C + params.v0 * D)


def lewis_price(batch: ContractBatch, cf_fn, n_nodes: int = 128,
                u_max: float = 200.0) -> jnp.ndarray:
    """Generic Lewis (2000) single-integral pricer:

        C = S e^{-qT} - (√(SK) e^{-(r+q)T/2} / π) ∫₀^∞ Re[e^{iuk} φ(u - i/2)]
            du / (u² + ¼),   k = ln(S/K) + (r-q)T

    for ANY forward-normalized CF ``cf_fn(u, t) = E[exp(iu·ln(S_T/F))]``
    (must satisfy φ(-i) = 1).  Fixed Gauss–Legendre rule (nodes static →
    fully jit/vmap; replaces the reference's adaptive quad at
    ``heston.py:170``).  Puts via put-call parity.  Shared by the Heston
    and Bates engines.
    """
    b = batch.broadcast()
    dtype = b.dtype
    u_np, w_np = _gl_nodes(n_nodes, 1e-8, u_max)
    u = jnp.asarray(u_np, dtype)[:, None]
    w = jnp.asarray(w_np, dtype)[:, None]

    flat = jax.tree.map(lambda x: x.reshape(-1), b)
    t = jnp.maximum(flat.maturity, EPS_TIME)
    k = jnp.log(flat.spot / flat.strike) + (flat.rate - flat.dividend) * t

    phi = cf_fn(u - 0.5j, t[None, :])
    integrand = jnp.real(jnp.exp(1j * u * k[None, :]) * phi) / (u * u + 0.25)
    integral = jnp.sum(w * integrand, axis=0)

    df_q = jnp.exp(-flat.dividend * t)
    df_r = jnp.exp(-flat.rate * t)
    call = flat.spot * df_q - (
        jnp.sqrt(flat.spot * flat.strike) * jnp.exp(-(flat.rate + flat.dividend) * t / 2.0)
        / math.pi * integral
    )
    call = jnp.maximum(call, 0.0)
    put = call - flat.spot * df_q + flat.strike * df_r  # parity
    price = jnp.where(flat.cp > 0, call, put)
    intrinsic = jnp.maximum(flat.cp * (flat.spot - flat.strike), 0.0)
    price = jnp.where(flat.maturity <= EPS_TIME, intrinsic, price)
    return price.reshape(b.shape).astype(dtype)


@functools.partial(jax.jit, static_argnames=("n_nodes", "u_max"))
def heston_price(batch: ContractBatch, params: HestonParams,
                 n_nodes: int = 128, u_max: float = 200.0) -> jnp.ndarray:
    """European prices via the Lewis single integral (see
    :func:`lewis_price`) with the Heston CF."""
    return lewis_price(batch, lambda u, t: _heston_cf(u, params, t),
                       n_nodes=n_nodes, u_max=u_max)


# ---------------------------------------------------------------------------
# COS method (Fang–Oosterlee 2008) — second semi-analytic engine
# ---------------------------------------------------------------------------
def _heston_cumulants(params: HestonParams, rate, dividend, t):
    """c1, c2 of ln(S_T/S_0) (COS paper eq. 30) for the truncation range."""
    v0, k, th, s = params.v0, params.kappa, params.theta, params.sigma
    rho = params.rho
    ekt = jnp.exp(-k * t)
    c1 = (rate - dividend) * t + (1.0 - ekt) * (th - v0) / (2.0 * k) - 0.5 * th * t
    c2 = (1.0 / (8.0 * k**3)) * (
        s * t * k * ekt * (v0 - th) * (8.0 * k * rho - 4.0 * s)
        + k * rho * s * (1.0 - ekt) * (16.0 * th - 8.0 * v0)
        + 2.0 * th * k * t * (-4.0 * k * rho * s + s**2 + 4.0 * k**2)
        + s**2 * ((th - 2.0 * v0) * jnp.exp(-2.0 * k * t) + th * (6.0 * ekt - 7.0) + 2.0 * v0)
        + 8.0 * k**2 * (v0 - th) * (1.0 - ekt)
    )
    return c1, jnp.maximum(c2, 1e-12)


@functools.partial(jax.jit, static_argnames=("n_terms", "trunc_l"))
def heston_price_cos(batch: ContractBatch, params: HestonParams,
                     n_terms: int = 256, trunc_l: float = 12.0) -> jnp.ndarray:
    """European prices via the COS expansion (Fang–Oosterlee 2008) — an
    independent semi-analytic engine cross-checking the Lewis integral of
    :func:`heston_price` (reference single engine: ``heston.py:131-183``).

    Fourier-cosine expansion of the density on [a, b] from the c1/c2
    cumulants (range a,b = c1 ∓ L·√(c2·T-free)); the PUT coefficients are
    evaluated (bounded payoff on [a, 0] — numerically stable deep OTM) and
    calls recovered via parity. Fully closed-form coefficients → one fused
    launch over all (term, contract) pairs; AD-differentiable for Greeks.
    """
    b = batch.broadcast()
    dtype = b.dtype
    flat = jax.tree.map(lambda x: x.reshape(-1), b)
    t = jnp.maximum(flat.maturity, EPS_TIME)
    x = jnp.log(flat.spot / flat.strike)  # (C,)

    c1, c2 = _heston_cumulants(params, flat.rate, flat.dividend, t)
    # expansion variable is y = ln(S_T/K): density centered near c1 + x,
    # so the truncation range carries the per-strike shift (COS paper eq. 49)
    a = c1 + x - trunc_l * jnp.sqrt(c2)
    bb = c1 + x + trunc_l * jnp.sqrt(c2)
    width = bb - a

    k = jnp.arange(n_terms, dtype=dtype)[:, None]  # (N, 1)
    u = k * jnp.pi / width[None, :]  # (N, C)

    # CF of ln(S_T/S_0): forward-centered CF shifted by the drift
    phi = _heston_cf(u - 0.0j, params, t[None, :]) * jnp.exp(
        1j * u * (flat.rate - flat.dividend)[None, :] * t[None, :])

    # put payoff cosine coefficients on [a, d0], d0 = 0 clipped into [a, b]
    # (the payoff support (-inf, 0) intersected with the truncation range):
    #   V_k = 2K/(b-a) · (-chi_k(a,d0) + psi_k(a,d0))
    kpw = k * jnp.pi / width[None, :]
    d0 = jnp.clip(0.0, a, bb)[None, :]
    arg_d = kpw * (d0 - a[None, :])
    chi = (jnp.cos(arg_d) * jnp.exp(d0) - jnp.exp(a[None, :])
           + kpw * jnp.sin(arg_d) * jnp.exp(d0)) / (1.0 + kpw * kpw)
    psi = jnp.where(k == 0, d0 - a[None, :],
                    jnp.sin(arg_d) / jnp.where(k == 0, 1.0, kpw))
    v_k = 2.0 / width[None, :] * flat.strike[None, :] * (-chi + psi)

    terms = jnp.real(phi * jnp.exp(1j * u * (x - a)[None, :])) * v_k
    terms = terms.at[0].mul(0.5)  # Σ' halves the k=0 term
    put = jnp.exp(-flat.rate * t) * jnp.sum(terms, axis=0)
    put = jnp.maximum(put, 0.0)
    call = put + flat.spot * jnp.exp(-flat.dividend * t) - flat.strike * jnp.exp(-flat.rate * t)
    price = jnp.where(flat.cp > 0, call, put)
    intrinsic = jnp.maximum(flat.cp * (flat.spot - flat.strike), 0.0)
    price = jnp.where(flat.maturity <= EPS_TIME, intrinsic, price)
    return price.reshape(b.shape).astype(dtype)


# ---------------------------------------------------------------------------
# Monte Carlo (full-truncation Euler), scan over steps — no path matrix
# ---------------------------------------------------------------------------
@functools.partial(jax.jit,
                   static_argnames=("n_paths", "n_steps", "antithetic",
                                    "scheme"))
def heston_mc_price(batch: ContractBatch, params: HestonParams, key,
                    n_paths: int = 100_000, n_steps: int = 100,
                    antithetic: bool = True,
                    scheme: str = "euler") -> jnp.ndarray:
    """Heston MC. ``scheme='euler'``: full-truncation Euler (reference:
    ``heston.py:184``, v⁺ = max(v,0) in drift and diffusion, O(dt) bias).
    ``scheme='qe'``: Andersen (2008) quadratic-exponential — the variance
    transition is sampled from its (nearly exact) moment-matched law, so
    coarse step counts stay unbiased where Euler drifts (~30x lower bias
    at 16 steps in the tests).  Branch-free: the psi <= 1.5 quadratic and
    psi > 1.5 exponential branches are computed in parallel and selected
    with jnp.where (XLA-friendly, no data-dependent control flow).

    Either way the steps axis is a scan carrying (x, v); normals are drawn
    per step from a folded key — HBM holds only the (n_paths,) state,
    never (n_paths × n_steps)."""
    if scheme == "qe":
        return _heston_mc_qe(batch, params, key, n_paths, n_steps, antithetic)
    if scheme != "euler":
        raise ValidationError(f"scheme must be euler|qe, got {scheme!r}")
    b = batch.broadcast()
    flat = jax.tree.map(lambda x: x.reshape(-1).astype(jnp.float32), b)
    # simulation runs in f32 regardless of batch/param dtype (the scan carry
    # must keep one dtype; callers wanting f64 stats should average batches)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
    c = flat.spot.shape[0]
    half = n_paths // 2 if antithetic else n_paths

    t = jnp.maximum(flat.maturity, EPS_TIME)[:, None]
    dt = t / n_steps
    sqrt_dt = jnp.sqrt(dt)
    rho, srho = params.rho, jnp.sqrt(jnp.maximum(1.0 - params.rho**2, 0.0))

    def step(carry, k_step):
        x, v = carry  # (c, paths)
        kk = jax.random.fold_in(key, k_step)
        z = jax.random.normal(kk, (2, c, half), dtype=jnp.float32)
        zv = jnp.concatenate([z[0], -z[0]], axis=-1) if antithetic else z[0]
        zx_ = jnp.concatenate([z[1], -z[1]], axis=-1) if antithetic else z[1]
        zx = rho * zv + srho * zx_
        vp = jnp.maximum(v, 0.0)
        sq_v = jnp.sqrt(vp)
        x = x + (flat.rate - flat.dividend)[:, None] * dt - 0.5 * vp * dt + sq_v * sqrt_dt * zx
        v = v + params.kappa * (params.theta - vp) * dt + params.sigma * sq_v * sqrt_dt * zv
        return (x, v), None

    n_eff = half * 2 if antithetic else n_paths
    x0 = jnp.zeros((c, n_eff), jnp.float32)
    v0 = jnp.broadcast_to(params.v0, (c, n_eff)).astype(jnp.float32)
    (x, _), _ = lax.scan(step, (x0, v0), jnp.arange(n_steps))
    st = flat.spot[:, None] * jnp.exp(x)
    pay = jnp.maximum(flat.cp[:, None] * (st - flat.strike[:, None]), 0.0)
    price = jnp.exp(-flat.rate * flat.maturity) * pay.mean(axis=-1)
    intrinsic = jnp.maximum(flat.cp * (flat.spot - flat.strike), 0.0)
    price = jnp.where(flat.maturity <= EPS_TIME, intrinsic, price)
    return price.reshape(b.shape)


def _heston_mc_qe(batch: ContractBatch, params: HestonParams, key,
                  n_paths: int, n_steps: int, antithetic: bool) -> jnp.ndarray:
    """Andersen QE with central (gamma1 = gamma2 = 1/2) log-spot weights."""
    b = batch.broadcast()
    flat = jax.tree.map(lambda x: x.reshape(-1).astype(jnp.float32), b)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
    c = flat.spot.shape[0]
    half = n_paths // 2 if antithetic else n_paths
    n_eff = half * 2 if antithetic else n_paths

    t = jnp.maximum(flat.maturity, EPS_TIME)[:, None]
    dt = t / n_steps
    kap, th, sig, rho = params.kappa, params.theta, params.sigma, params.rho

    emkd = jnp.exp(-kap * dt)
    # exact conditional moments of v_{t+dt} | v_t = m1 + m2 * v_t form
    c1 = th * (1.0 - emkd)                      # E = c1 + emkd * v
    s2_v = sig**2 * emkd * (1.0 - emkd) / kap   # Var = s2_v * v + s2_0
    s2_0 = th * sig**2 * (1.0 - emkd) ** 2 / (2.0 * kap)

    # log-spot weights (Andersen eq. 33), gamma1 = gamma2 = 1/2
    g1 = g2 = 0.5
    k0 = -rho * kap * th * dt / sig
    k1 = g1 * dt * (kap * rho / sig - 0.5) - rho / sig
    k2 = g2 * dt * (kap * rho / sig - 0.5) + rho / sig
    k3 = g1 * dt * (1.0 - rho**2)
    k4 = g2 * dt * (1.0 - rho**2)

    def step(carry, k_step):
        x, v = carry  # (c, paths)
        kk = jax.random.fold_in(key, k_step)
        zr = jax.random.normal(kk, (2, c, half), dtype=jnp.float32)
        zv = jnp.concatenate([zr[0], -zr[0]], axis=-1) if antithetic else zr[0]
        zx = jnp.concatenate([zr[1], -zr[1]], axis=-1) if antithetic else zr[1]
        u = jax.random.uniform(jax.random.fold_in(kk, 1), (c, n_eff),
                               jnp.float32, 1e-7, 1.0 - 1e-7)

        m = c1 + emkd * v
        s2 = s2_v * v + s2_0
        psi = s2 / jnp.maximum(m * m, 1e-30)

        # quadratic branch (psi <= 1.5)
        inv_psi = 2.0 / jnp.maximum(psi, 1e-10)
        b2 = jnp.maximum(inv_psi - 1.0 + jnp.sqrt(
            jnp.maximum(inv_psi * (inv_psi - 1.0), 0.0)), 0.0)
        a = m / (1.0 + b2)
        v_quad = a * (jnp.sqrt(b2) + zv) ** 2

        # exponential branch (psi > 1.5); uses the uniform (zv unused here)
        p = jnp.clip((psi - 1.0) / (psi + 1.0), 0.0, 1.0 - 1e-7)
        beta = (1.0 - p) / jnp.maximum(m, 1e-30)
        v_exp = jnp.where(u <= p, 0.0,
                          jnp.log((1.0 - p) / jnp.maximum(1.0 - u, 1e-30))
                          / jnp.maximum(beta, 1e-30))

        v_new = jnp.where(psi <= 1.5, v_quad, v_exp)
        x = x + (flat.rate - flat.dividend)[:, None] * dt + k0 + k1 * v \
            + k2 * v_new + jnp.sqrt(jnp.maximum(k3 * v + k4 * v_new, 0.0)) * zx
        return (x, v_new), None

    x0 = jnp.zeros((c, n_eff), jnp.float32)
    v0 = jnp.broadcast_to(params.v0, (c, n_eff)).astype(jnp.float32)
    (x, _), _ = lax.scan(step, (x0, v0), jnp.arange(n_steps))
    st = flat.spot[:, None] * jnp.exp(x)
    pay = jnp.maximum(flat.cp[:, None] * (st - flat.strike[:, None]), 0.0)
    price = jnp.exp(-flat.rate * flat.maturity) * pay.mean(axis=-1)
    intrinsic = jnp.maximum(flat.cp * (flat.spot - flat.strike), 0.0)
    price = jnp.where(flat.maturity <= EPS_TIME, intrinsic, price)
    return price.reshape(b.shape)


@functools.partial(jax.jit, static_argnames=("n_paths", "n_steps"))
def heston_simulate_paths(spot, params: HestonParams, rate, dividend, maturity, key,
                          n_paths: int = 1000, n_steps: int = 252):
    """(n_paths, n_steps+1) spot paths + variance paths (reference:
    ``heston.py:257`` simulate_paths). For when the caller genuinely wants
    the trajectories (plots, exotics prototyping)."""
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
    rate = jnp.asarray(rate, jnp.float32)
    dividend = jnp.asarray(dividend, jnp.float32)
    dt = jnp.asarray(maturity / n_steps, jnp.float32)
    sqrt_dt = jnp.sqrt(dt)
    srho = jnp.sqrt(jnp.maximum(1.0 - params.rho**2, 0.0))

    def step(carry, k_step):
        x, v = carry
        kk = jax.random.fold_in(key, k_step)
        z = jax.random.normal(kk, (2, n_paths), dtype=jnp.float32)
        zv, zx_ = z[0], z[1]
        zx = params.rho * zv + srho * zx_
        vp = jnp.maximum(v, 0.0)
        sq_v = jnp.sqrt(vp)
        x_new = x + (rate - dividend - 0.5 * vp) * dt + sq_v * sqrt_dt * zx
        v_new = v + params.kappa * (params.theta - vp) * dt + params.sigma * sq_v * sqrt_dt * zv
        return (x_new, v_new), (x_new, vp)

    x0 = jnp.zeros(n_paths, jnp.float32)
    v0 = jnp.full(n_paths, params.v0, jnp.float32)
    _, (xs, vs) = lax.scan(step, (x0, v0), jnp.arange(n_steps))
    log_paths = jnp.concatenate([x0[None, :], xs], axis=0)  # (steps+1, paths)
    spots = spot * jnp.exp(log_paths).T
    variances = jnp.concatenate([v0[None, :], vs], axis=0).T
    return spots, variances


# ---------------------------------------------------------------------------
# Calibration: AD through the semi-analytic pricer
# ---------------------------------------------------------------------------
def _to_unconstrained(p: HestonParams):
    inv_sp = lambda x: jnp.log(jnp.expm1(jnp.maximum(x, 1e-8)))
    return jnp.stack([
        inv_sp(p.v0), inv_sp(p.kappa), inv_sp(p.theta), inv_sp(p.sigma),
        jnp.arctanh(jnp.clip(p.rho, -0.999, 0.999)),
    ])


def _from_unconstrained(x) -> HestonParams:
    sp = jax.nn.softplus
    return HestonParams(v0=sp(x[0]), kappa=sp(x[1]), theta=sp(x[2]),
                        sigma=sp(x[3]), rho=jnp.tanh(x[4]))


def calibrate_heston(market_prices, batch: ContractBatch,
                     init: HestonParams | None = None,
                     n_steps: int = 500, learning_rate: float = 0.05,
                     weights=None) -> tuple[HestonParams, float]:
    """Fit Heston to observed option prices by Adam on the RELATIVE price
    RMSE, with positivity/(-1,1) enforced by softplus/tanh transforms.

    The reference calibrates with L-BFGS-B on an objective that re-prices
    AND re-inverts IV per point (``heston.py:351-387``); here the loss is
    vega-weighted price error (equivalent first-order to IV error, no inner
    root-find) and gradients come from AD through :func:`heston_price`.
    Returns (params, final_loss); raises CalibrationError on NaN collapse.
    The whole Adam loop is one scanned on-device program.
    """
    from ..ops.optim import scan_adam

    market = jnp.asarray(market_prices, jnp.float32)
    w = jnp.ones_like(market) if weights is None else jnp.asarray(weights, jnp.float32)
    init = init or HestonParams.make()
    x0 = _to_unconstrained(init)

    def loss_fn(x):
        p = _from_unconstrained(x)
        model = heston_price(batch, p)
        rel = (model - market) / jnp.maximum(market, 1e-3)
        return jnp.mean(w * rel * rel)

    best_x, best_loss, _ = scan_adam(loss_fn, x0, n_steps, learning_rate)
    if not np.isfinite(float(best_loss)):
        raise CalibrationError("Heston calibration diverged (non-finite loss)")
    params = _from_unconstrained(best_x)
    params.validate()
    return params, float(best_loss)


def calibrate_heston_mc(market_prices, strikes, maturities, cps, spot, rate,
                        dividend: float = 0.0,
                        init: HestonParams | None = None,
                        n_steps: int = 200, learning_rate: float = 0.05,
                        n_paths: int = 1_000_000, max_dt: float = 0.02,
                        seed: int = 0, sampler: str = "prng",
                        weights=None) -> tuple[HestonParams, float]:
    """Kernel-speed MC calibration: every Adam step prices the WHOLE chain
    and gets the full (v0, kappa, theta, sigma, rho) gradient from ONE
    Pallas launch (``ops.heston_pallas.make_chain_pricer`` — in-kernel
    pathwise sensitivity moments via custom_vjp, no AD through the
    simulation). The fixed seed makes the MC loss surface deterministic,
    so the scanned Adam loop converges like a deterministic objective;
    the optimum differs from :func:`calibrate_heston` (Lewis-AD) only by
    MC + Euler-discretization error at the chosen n_paths/max_dt.

    Use this when the pricing model has no affine CF (the same kernel
    pattern extends to local-vol/SVJ variants) or to cross-check the
    semi-analytic calibration end-to-end through the simulation engine.
    Reference anchor: ``src/pricing_models/heston.py:312`` (calibrate) —
    there each L-BFGS objective evaluation re-prices the chain serially
    on the host.

    Returns (params, final_loss); raises CalibrationError on divergence.
    """
    from ..ops.heston_pallas import make_chain_pricer
    from ..ops.optim import scan_adam

    market = jnp.asarray(market_prices, jnp.float32).ravel()
    w = (jnp.ones_like(market) if weights is None
         else jnp.asarray(weights, jnp.float32).ravel())
    init = init or HestonParams.make()
    x0 = _to_unconstrained(jax.tree.map(lambda v: jnp.asarray(v, jnp.float32),
                                        init))
    pricer = make_chain_pricer(strikes, maturities, cps, spot, rate,
                               dividend=dividend, n_paths=n_paths,
                               max_dt=max_dt, seed=seed, sampler=sampler)

    def loss_fn(x):
        p = _from_unconstrained(x)
        pvec = jnp.stack([p.v0, p.kappa, p.theta, p.sigma, p.rho])
        model = pricer(pvec)
        rel = (model - market) / jnp.maximum(market, 1e-3)
        return jnp.mean(w * rel * rel)

    best_x, best_loss, _ = scan_adam(loss_fn, x0, n_steps, learning_rate)
    if not np.isfinite(float(best_loss)):
        raise CalibrationError("Heston MC calibration diverged "
                               "(non-finite loss)")
    params = _from_unconstrained(best_x)
    params.validate()
    return params, float(best_loss)


class HestonPricer:
    """Object adapter (reference: ``heston.py:42``). Maps the unified
    protocol's sigma to v0=σ² like the reference's HestonAdapter
    (``unified_greeks.py:74``) when used through the Greeks engine."""

    def __init__(self, v0=0.04, kappa=2.0, theta=0.04, sigma=0.3, rho=-0.7):
        self.params = HestonParams.make(v0, kappa, theta, sigma, rho)
        self.params.validate()

    def price_european(self, S, K, T, r, option_type="call", q=0.0,
                       engine: str = "lewis"):
        """``engine``: "lewis" (Gauss–Legendre Lewis integral) or "cos"
        (Fang–Oosterlee expansion) — two independent semi-analytic engines
        that cross-check each other (tests assert 2e-4 agreement)."""
        batch = ContractBatch.make(S, K, T, r, jnp.sqrt(self.params.v0), option_type, q)
        if engine == "cos":
            return heston_price_cos(batch, self.params)
        return heston_price(batch, self.params)

    price = price_european

    def price_monte_carlo(self, S, K, T, r, option_type="call", q=0.0,
                          n_paths=100_000, n_steps=100, seed=0, engine="scan"):
        if engine == "pallas":
            from ..ops.heston_pallas import pallas_heston_price

            cp = 1.0 if str(option_type).lower().startswith("c") else -1.0
            price, _, _ = pallas_heston_price(S, K, T, r, self.params, cp, q,
                                              n_paths=n_paths, n_steps=n_steps,
                                              seed=seed)
            return price
        batch = ContractBatch.make(S, K, T, r, jnp.sqrt(self.params.v0), option_type, q)
        return heston_mc_price(batch, self.params, jax.random.PRNGKey(seed),
                               n_paths=n_paths, n_steps=n_steps)

    def simulate_paths(self, S, T, r, q=0.0, n_paths=1000, n_steps=252, seed=0):
        return heston_simulate_paths(S, self.params, r, q, T, jax.random.PRNGKey(seed),
                                     n_paths=n_paths, n_steps=n_steps)
