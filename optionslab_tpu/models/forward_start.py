"""Forward-start options under Heston and Bates — semi-analytic.

Beyond the reference (no forward-start / forward-smile support there).
Payoff at T2:  S_{T1} * max(S_{T2}/S_{T1} - k, 0)  (proportional strike k;
the standard cliquet building block).

Derivation (Kruse–Nögel 2005 structure, assembled from this package's own
Heston machinery): with X = ln(S_{T2}/S_{T1}) and tau = T2 - T1,

    V = e^{-r T2} E[S_{T1} (e^X - k)^+]
      = S0 e^{-q T1} * LewisPrice(spot=1, strike=k, T=tau, cf=phi_R)

where phi_R(u) = E^S[exp(iu * ln(S_{T2}/(S_{T1} e^{(r-q)tau})))] under the
SHARE measure (numeraire S up to T1).  Conditioning on v_{T1}:

    phi_R(u) = exp(theta * C(u, tau)) * M_{v_T1}(D(u, tau))

with (C, D) the usual Heston log-forward CF pieces (``heston._heston_cd``)
and M the CIR transition MGF of v_{T1} *under the share measure*, where
Girsanov shifts the variance drift: kappa* = kappa - rho*sigma,
theta* = kappa*theta/kappa*.  M is the noncentral-chi-square MGF

    M(z) = (1 - 2 c z)^{-nu/2} exp(lambda c z / (1 - 2 c z)),
    c = sigma^2 (1 - e^{-k* t})/(4 k*),  nu = 4 k* theta*/sigma^2,
    lambda = 4 k* e^{-k* t} v0 / (sigma^2 (1 - e^{-k* t})).

Branch safety: along the Lewis contour u - i/2, Re D(u, tau) <= 0, so
Re(1 - 2cz) >= 1 and the principal log never crosses the cut.

Bates: jumps are iid increments independent of v, so the jump CF over tau
multiplies phi_R — forward-start SVJ for free.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..types import ContractBatch
from ..utils.exceptions import ValidationError
from .heston import HestonParams, _heston_cd, lewis_price

__all__ = ["forward_start_price", "forward_start_mc_price",
           "forward_smile_iv"]


def _cir_share_mgf(z, params: HestonParams, t1):
    """E^S[exp(z * v_{T1})] under the share measure (shifted CIR)."""
    kap_s = params.kappa - params.rho * params.sigma
    # guard the kappa* -> 0 singularity (c and lambda have finite limits;
    # a tiny shift keeps the closed form stable without visible error)
    kap_s = jnp.where(jnp.abs(kap_s) < 1e-6, 1e-6, kap_s)
    theta_s = params.kappa * params.theta / kap_s
    # guard the t1 -> 0 singularity of lambda: use expm1 (f32-exact for
    # tiny kappa*t1, unlike 1 - exp) and clamp away from 0 PRESERVING THE
    # SIGN — kappa* = kappa - rho*sigma is legitimately negative for
    # rho*sigma > kappa, where 1 - e^{-kappa* t1} < 0 is correct (a
    # one-sided max here silently replaced the MGF with its degenerate
    # form and mispriced by ~30 sigma).  In the clamped limit
    # lam*c -> emkt*v0 and nu*c -> 0, so the MGF degrades gracefully to
    # its exact t1=0 value exp(z*v0) (deterministic v_{T1} = v0).
    one_memkt = -jnp.expm1(-kap_s * t1)
    one_memkt = jnp.where(jnp.abs(one_memkt) < 1e-12, 1e-12, one_memkt)
    emkt = 1.0 - one_memkt
    c = params.sigma**2 * one_memkt / (4.0 * kap_s)
    nu = 4.0 * kap_s * theta_s / params.sigma**2
    lam = 4.0 * kap_s * emkt * params.v0 / (params.sigma**2 * one_memkt)
    one_m = 1.0 - 2.0 * c * z
    return jnp.exp(-0.5 * nu * jnp.log(one_m) + lam * c * z / one_m)


def _forward_return_cf(u, params, t1, tau, jump_cf=None):
    hp = params.heston if hasattr(params, "heston") else params
    C, D = _heston_cd(u, hp, tau)
    phi = jnp.exp(hp.theta * C) * _cir_share_mgf(D, hp, t1)
    if jump_cf is not None:
        phi = phi * jump_cf(u, tau)
    return phi


@functools.partial(jax.jit, static_argnames=("n_nodes", "u_max"))
def forward_start_price(spot, k_ratio, t1, t2, rate, params,
                        dividend=0.0, option_type=1.0,
                        n_nodes: int = 128, u_max: float = 200.0):
    """Forward-start option: payoff S_{T1} * max(cp*(S_{T2}/S_{T1} - k), 0).

    ``params``: HestonParams or BatesParams.  Semi-analytic via the shared
    Lewis engine on the forward-return CF.  Fully AD-differentiable."""
    tau = jnp.asarray(t2) - jnp.asarray(t1)
    jump_cf = None
    if hasattr(params, "lam"):  # Bates: multiply the iid jump CF over tau
        from .bates import _jump_cf

        jump_cf = lambda u, tt: _jump_cf(u, params, tt)
    cf = lambda u, tt: _forward_return_cf(u, params, jnp.asarray(t1), tt,
                                          jump_cf)
    cp = jnp.asarray(option_type, jnp.result_type(float))
    unit = ContractBatch(
        spot=jnp.ones_like(jnp.asarray(k_ratio, jnp.result_type(float))),
        strike=jnp.asarray(k_ratio, jnp.result_type(float)),
        maturity=tau, rate=jnp.asarray(rate), vol=jnp.asarray(0.2),
        dividend=jnp.asarray(dividend), cp=cp)
    unit_price = lewis_price(unit, cf, n_nodes=n_nodes, u_max=u_max)
    return jnp.asarray(spot) * jnp.exp(-jnp.asarray(dividend)
                                       * jnp.asarray(t1)) * unit_price


def forward_smile_iv(k_ratios, t1, t2, params, rate=0.0, dividend=0.0):
    """Forward implied-vol smile: BS-implied vols of forward-start prices
    on the unit asset over [T1, T2] (the market's 'forward smile')."""
    from .iv import implied_volatility_vectorized

    k = jnp.asarray(k_ratios)
    tau = float(t2) - float(t1)
    prices = forward_start_price(1.0, k, t1, t2, rate, params,
                                 dividend=dividend)
    # undo the e^{-q T1} prefactor: the unit-asset option value itself
    prices = prices / np.exp(-float(dividend) * float(t1))
    dt = prices.dtype
    one = jnp.ones((), dt)
    return implied_volatility_vectorized(prices, one, k.astype(dt),
                                         jnp.asarray(tau, dt),
                                         jnp.asarray(rate, dt), cp=one,
                                         dividend=jnp.asarray(dividend, dt))


@functools.partial(jax.jit,
                   static_argnames=("n_paths", "n_steps", "antithetic"))
def forward_start_mc_price(spot, k_ratio, t1, t2, rate, params, key,
                           dividend=0.0, option_type=1.0,
                           n_paths: int = 200_000, n_steps: int = 200,
                           antithetic: bool = True):
    """MC oracle: full-truncation Euler to T2 recording S at T1.

    Returns (price, stderr).  Supports Heston and Bates params."""
    from jax import lax

    # simulation runs in f32 regardless of param dtype (scan carry dtype)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
    hp = params.heston if hasattr(params, "heston") else params
    has_jumps = hasattr(params, "lam")
    rate = jnp.float32(rate)
    dividend = jnp.float32(dividend)
    t1 = jnp.float32(t1)
    t2 = jnp.float32(t2)
    dt = t2 / n_steps
    # T1 snapped to the nearest grid index (exact when t1/t2*n_steps is int)
    i1 = jnp.round(t1 / dt).astype(jnp.int32)
    sq_dt = jnp.sqrt(dt)
    half = n_paths // 2 if antithetic else n_paths
    n_eff = half * 2 if antithetic else n_paths
    rho, srho = hp.rho, jnp.sqrt(jnp.maximum(1.0 - hp.rho**2, 0.0))
    if has_jumps:
        kbar = jnp.exp(params.mu_j + 0.5 * params.sigma_j**2) - 1.0

    def step(carry, i):
        x, v, x1 = carry
        kk = jax.random.fold_in(key, i)
        z = jax.random.normal(kk, (3, half), jnp.float32)
        zv = jnp.concatenate([z[0], -z[0]]) if antithetic else z[0]
        zx_ = jnp.concatenate([z[1], -z[1]]) if antithetic else z[1]
        zx = rho * zv + srho * zx_
        vp = jnp.maximum(v, 0.0)
        sq_v = jnp.sqrt(vp)
        x_new = x + (rate - dividend) * dt - 0.5 * vp * dt + sq_v * sq_dt * zx
        if has_jumps:
            zj = jnp.concatenate([z[2], -z[2]]) if antithetic else z[2]
            n_jump = jax.random.poisson(jax.random.fold_in(kk, 7),
                                        params.lam * dt,
                                        (n_eff,)).astype(jnp.float32)
            x_new = x_new - params.lam * kbar * dt + n_jump * params.mu_j \
                + params.sigma_j * jnp.sqrt(n_jump) * zj
        v_new = v + hp.kappa * (hp.theta - vp) * dt \
            + hp.sigma * sq_v * sq_dt * zv
        x1 = jnp.where(i + 1 == i1, x_new, x1)
        return (x_new, v_new, x1), None

    x0 = jnp.zeros((n_eff,), jnp.float32)
    v0 = jnp.full((n_eff,), hp.v0, jnp.float32)
    (x, _, x1), _ = lax.scan(step, (x0, v0, x0), jnp.arange(n_steps))
    s1 = jnp.asarray(spot, jnp.float32) * jnp.exp(x1)
    ratio = jnp.exp(x - x1)
    cp = jnp.asarray(option_type, jnp.float32)
    pay = s1 * jnp.maximum(cp * (ratio - jnp.asarray(k_ratio, jnp.float32)),
                           0.0)
    disc = jnp.exp(-rate * t2)
    price = disc * pay.mean()
    stderr = disc * pay.std() / jnp.sqrt(jnp.float32(n_eff))
    return price, stderr
