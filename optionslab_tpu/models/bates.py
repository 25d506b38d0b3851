"""Bates (1996) stochastic-volatility-with-jumps (SVJ) model.

Capability beyond the reference, which ships Heston (``heston.py``) and
Merton (``jump_diffusion.py``) separately but no combined SVJ dynamics:

    dS/S = (r - q - lam*kbar) dt + sqrt(v) dW_S + (e^J - 1) dN
    dv   = kappa (theta - v) dt + sigma sqrt(v) dW_v,   d<W_S,W_v> = rho dt
    J ~ N(mu_j, sigma_j^2),  N ~ Poisson(lam),  kbar = e^{mu_j+sigma_j^2/2}-1

TPU-first design: the CF factorizes as phi_Bates = phi_Heston * phi_Jump
(both forward-normalized), so pricing reuses the shared fixed-quadrature
Lewis engine (``heston.lewis_price``) and the COS expansion (with the
jump cumulants added) — two independent semi-analytic engines, both one
fused launch over all (node, contract) pairs, both AD-differentiable.
Reductions: lam -> 0 is exactly Heston; sigma -> 0, v0 = theta is exactly
Merton — both asserted in tests against the existing engines.
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..types import ContractBatch
from ..utils.config import EPS_TIME
from ..utils.exceptions import CalibrationError, ValidationError
from .heston import HestonParams, _heston_cf, lewis_price

__all__ = ["BatesParams", "bates_price", "bates_price_cos", "bates_mc_price",
           "calibrate_bates", "BatesPricer"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BatesParams:
    """Heston diffusion params + lognormal jump params.

    lam: jump intensity (per year), mu_j / sigma_j: mean / std of the
    log-jump size."""

    v0: jnp.ndarray
    kappa: jnp.ndarray
    theta: jnp.ndarray
    sigma: jnp.ndarray
    rho: jnp.ndarray
    lam: jnp.ndarray
    mu_j: jnp.ndarray
    sigma_j: jnp.ndarray

    @classmethod
    def make(cls, v0=0.04, kappa=2.0, theta=0.04, sigma=0.3, rho=-0.7,
             lam=0.5, mu_j=-0.1, sigma_j=0.15, dtype=jnp.float32):
        # host inputs stay host scalars (see HestonParams.make: eager
        # jnp.asarray costs a ~40 ms tunnel RPC per field)
        return cls(*(jnp.asarray(x, dtype) if isinstance(x, jax.Array)
                     else np.asarray(x, dtype)
                     for x in (v0, kappa, theta, sigma, rho, lam, mu_j,
                               sigma_j)))

    @property
    def heston(self) -> HestonParams:
        return HestonParams(v0=self.v0, kappa=self.kappa, theta=self.theta,
                            sigma=self.sigma, rho=self.rho)

    def validate(self):
        self.heston.validate()
        vals = {n: float(np.asarray(getattr(self, n)).ravel()[0])
                for n in ("lam", "sigma_j")}
        if vals["lam"] < 0:
            raise ValidationError(f"jump intensity must be >= 0: {vals['lam']}")
        if vals["sigma_j"] < 0:
            raise ValidationError(f"jump vol must be >= 0: {vals['sigma_j']}")


def _jump_cf(u, params: BatesParams, maturity):
    """Forward-normalized CF of the compensated jump component of
    ln(S_T/F): exp(lam*T*(e^{iu mu_j - u^2 sigma_j^2/2} - 1) - iu*lam*T*kbar)
    with kbar = e^{mu_j + sigma_j^2/2} - 1.  Satisfies phi(-i) = 1."""
    iu = 1j * u
    kbar = jnp.exp(params.mu_j + 0.5 * params.sigma_j**2) - 1.0
    return jnp.exp(params.lam * maturity * (
        jnp.exp(iu * params.mu_j - 0.5 * u * u * params.sigma_j**2) - 1.0)
        - iu * params.lam * maturity * kbar)


def _bates_cf(u, params: BatesParams, maturity):
    return _heston_cf(u, params.heston, maturity) * _jump_cf(u, params, maturity)


@functools.partial(jax.jit, static_argnames=("n_nodes", "u_max"))
def bates_price(batch: ContractBatch, params: BatesParams,
                n_nodes: int = 128, u_max: float = 200.0) -> jnp.ndarray:
    """European prices via the shared Lewis engine with the Bates CF."""
    return lewis_price(batch, lambda u, t: _bates_cf(u, params, t),
                       n_nodes=n_nodes, u_max=u_max)


@functools.partial(jax.jit, static_argnames=("n_terms", "trunc_l"))
def bates_price_cos(batch: ContractBatch, params: BatesParams,
                    n_terms: int = 256, trunc_l: float = 12.0) -> jnp.ndarray:
    """European prices via the COS expansion — the independent second
    engine.  Heston cumulants + jump cumulants (c1 += lam*T*(mu_j - kbar),
    c2 += lam*T*(mu_j^2 + sigma_j^2)) set the truncation range."""
    from .heston import _heston_cumulants

    b = batch.broadcast()
    dtype = b.dtype
    flat = jax.tree.map(lambda x: x.reshape(-1), b)
    t = jnp.maximum(flat.maturity, EPS_TIME)
    x = jnp.log(flat.spot / flat.strike)

    c1, c2 = _heston_cumulants(params.heston, flat.rate, flat.dividend, t)
    kbar = jnp.exp(params.mu_j + 0.5 * params.sigma_j**2) - 1.0
    c1 = c1 + params.lam * t * (params.mu_j - kbar)
    c2 = c2 + params.lam * t * (params.mu_j**2 + params.sigma_j**2)

    a = c1 + x - trunc_l * jnp.sqrt(c2)
    bb = c1 + x + trunc_l * jnp.sqrt(c2)
    width = bb - a

    k = jnp.arange(n_terms, dtype=dtype)[:, None]
    u = k * jnp.pi / width[None, :]

    phi = _bates_cf(u - 0.0j, params, t[None, :]) * jnp.exp(
        1j * u * (flat.rate - flat.dividend)[None, :] * t[None, :])

    kpw = k * jnp.pi / width[None, :]
    d0 = jnp.clip(0.0, a, bb)[None, :]
    arg_d = kpw * (d0 - a[None, :])
    chi = (jnp.cos(arg_d) * jnp.exp(d0) - jnp.exp(a[None, :])
           + kpw * jnp.sin(arg_d) * jnp.exp(d0)) / (1.0 + kpw * kpw)
    psi = jnp.where(k == 0, d0 - a[None, :],
                    jnp.sin(arg_d) / jnp.where(k == 0, 1.0, kpw))
    v_k = 2.0 / width[None, :] * flat.strike[None, :] * (-chi + psi)

    terms = jnp.real(phi * jnp.exp(1j * u * (x - a)[None, :])) * v_k
    terms = terms.at[0].mul(0.5)
    put = jnp.exp(-flat.rate * t) * jnp.sum(terms, axis=0)
    put = jnp.maximum(put, 0.0)
    call = put + flat.spot * jnp.exp(-flat.dividend * t) \
        - flat.strike * jnp.exp(-flat.rate * t)
    price = jnp.where(flat.cp > 0, call, put)
    intrinsic = jnp.maximum(flat.cp * (flat.spot - flat.strike), 0.0)
    price = jnp.where(flat.maturity <= EPS_TIME, intrinsic, price)
    return price.reshape(b.shape).astype(dtype)


@functools.partial(jax.jit, static_argnames=("n_paths", "n_steps", "antithetic"))
def bates_mc_price(batch: ContractBatch, params: BatesParams, key,
                   n_paths: int = 100_000, n_steps: int = 100,
                   antithetic: bool = True) -> jnp.ndarray:
    """Full-truncation Euler MC with compound-Poisson log-jumps.

    Same scan layout as ``heston_mc_price`` (HBM holds only the (c, paths)
    state); per step the jump contribution is N_i*mu_j + sigma_j*sqrt(N_i)*Z
    with N_i ~ Poisson(lam dt) — exact in distribution, fixed shapes."""
    b = batch.broadcast()
    flat = jax.tree.map(lambda x: x.reshape(-1).astype(jnp.float32), b)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
    c = flat.spot.shape[0]
    half = n_paths // 2 if antithetic else n_paths

    t = jnp.maximum(flat.maturity, EPS_TIME)[:, None]
    dt = t / n_steps
    sqrt_dt = jnp.sqrt(dt)
    rho, srho = params.rho, jnp.sqrt(jnp.maximum(1.0 - params.rho**2, 0.0))
    kbar = jnp.exp(params.mu_j + 0.5 * params.sigma_j**2) - 1.0

    def step(carry, k_step):
        x, v = carry  # (c, paths)
        kk = jax.random.fold_in(key, k_step)
        z = jax.random.normal(kk, (3, c, half), dtype=jnp.float32)
        zv = jnp.concatenate([z[0], -z[0]], axis=-1) if antithetic else z[0]
        zx_ = jnp.concatenate([z[1], -z[1]], axis=-1) if antithetic else z[1]
        zj = jnp.concatenate([z[2], -z[2]], axis=-1) if antithetic else z[2]
        zx = rho * zv + srho * zx_
        # Poisson jump count per (contract, path) this step — NOT
        # antithetic-mirrored (counts have no sign symmetry)
        n_jump = jax.random.poisson(
            jax.random.fold_in(kk, 7), params.lam * dt,
            (c, half * 2 if antithetic else n_paths)).astype(jnp.float32)
        vp = jnp.maximum(v, 0.0)
        sq_v = jnp.sqrt(vp)
        jump = n_jump * params.mu_j + params.sigma_j * jnp.sqrt(n_jump) * zj
        x = x + (flat.rate - flat.dividend)[:, None] * dt \
            - params.lam * kbar * dt - 0.5 * vp * dt \
            + sq_v * sqrt_dt * zx + jump
        v = v + params.kappa * (params.theta - vp) * dt \
            + params.sigma * sq_v * sqrt_dt * zv
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


# ---------------------------------------------------------------------------
# Calibration (scanned Adam, one device dispatch)
# ---------------------------------------------------------------------------
def _to_unconstrained(p: BatesParams):
    inv_sp = lambda x: jnp.log(jnp.expm1(jnp.maximum(x, 1e-8)))
    return jnp.stack([
        inv_sp(p.v0), inv_sp(p.kappa), inv_sp(p.theta), inv_sp(p.sigma),
        jnp.arctanh(jnp.clip(p.rho, -0.99, 0.99)),
        inv_sp(jnp.maximum(p.lam, 1e-6)), p.mu_j,
        inv_sp(jnp.maximum(p.sigma_j, 1e-6)),
    ])


def _from_unconstrained(x) -> BatesParams:
    sp = jax.nn.softplus
    return BatesParams(v0=sp(x[0]), kappa=sp(x[1]), theta=sp(x[2]),
                       sigma=sp(x[3]), rho=jnp.tanh(x[4]), lam=sp(x[5]),
                       mu_j=x[6], sigma_j=sp(x[7]))


def calibrate_bates(market_prices, batch: ContractBatch,
                    init: BatesParams | None = None, n_steps: int = 600,
                    learning_rate: float = 0.02,
                    weights=None) -> tuple[BatesParams, float]:
    """Fit all 8 Bates params to market prices (relative-MSE loss), the
    whole Adam loop as ONE scanned device program."""
    from ..ops.optim import scan_adam

    target = jnp.asarray(market_prices)
    w = jnp.ones_like(target) if weights is None else jnp.asarray(weights)
    init = init or BatesParams.make()
    x0 = _to_unconstrained(init)

    def loss_fn(x):
        p = _from_unconstrained(x)
        model = bates_price(batch, p)
        rel = (model - target) / jnp.maximum(target, 1e-4)
        return jnp.mean(w * rel * rel)

    best_x, best_loss, _ = scan_adam(loss_fn, x0, n_steps, learning_rate)
    if not np.isfinite(float(best_loss)):
        raise CalibrationError("Bates calibration diverged (non-finite loss)")
    return _from_unconstrained(best_x), float(best_loss)


class BatesPricer:
    """Object adapter mirroring ``HestonPricer`` (reference façade shape:
    ``heston.py:354``-style constructor + price_european)."""

    def __init__(self, v0=0.04, kappa=2.0, theta=0.04, sigma=0.3, rho=-0.7,
                 lam=0.5, mu_j=-0.1, sigma_j=0.15):
        self.params = BatesParams.make(v0, kappa, theta, sigma, rho, lam,
                                       mu_j, sigma_j)
        self.params.validate()

    def price_european(self, S, K, T, r, option_type="call", q=0.0,
                       engine: str = "lewis"):
        batch = ContractBatch.make(spot=S, strike=K, maturity=T, rate=r,
                                   vol=0.2, option_type=option_type,
                                   dividend=q)
        if engine == "cos":
            return bates_price_cos(batch, self.params)
        if engine != "lewis":
            raise ValidationError(f"unknown engine {engine!r}; lewis|cos")
        return bates_price(batch, self.params)
