"""Pure-jump Lévy models: Variance Gamma and Normal Inverse Gaussian.

Beyond the reference (its jump models stop at Merton/Kou compound
Poisson).  Both models are one-line characteristic functions on the
shared fixed-quadrature Lewis engine (``heston.lewis_price``) — the same
TPU-first pattern as Heston/Bates: static nodes, one fused launch, AD
Greeks for free.

CFs of ln(S_T/F), martingale-normalized with the exponential compensator
omega = -psi(-i) so phi(-i) = 1:

  VG  (Madan–Carr–Chang 1998):  psi(u) = -T/nu * ln(1 - iu*theta*nu
                                          + 0.5*sigma^2*nu*u^2)
  NIG (Barndorff-Nielsen 1997): psi(u) = T*delta*(sqrt(alpha^2 - beta^2)
                                          - sqrt(alpha^2 - (beta + iu)^2))

MC engines simulate the exact terminal law by subordination (gamma /
inverse-Gaussian time change of a Brownian motion) — single-step exact
draws, no path discretization error.
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..types import ContractBatch
from ..utils.exceptions import ValidationError
from .heston import lewis_price

__all__ = ["VGParams", "NIGParams", "vg_price", "nig_price",
           "vg_mc_price", "nig_mc_price"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VGParams:
    """sigma: diffusion scale, nu: gamma-subordinator variance (jump
    activity; nu -> 0 recovers Black–Scholes), theta: drift of the
    subordinated BM (skew)."""

    sigma: jnp.ndarray
    nu: jnp.ndarray
    theta: jnp.ndarray

    @classmethod
    def make(cls, sigma=0.2, nu=0.2, theta=-0.14, dtype=jnp.float32):
        return cls(*(jnp.asarray(x, dtype) for x in (sigma, nu, theta)))

    def validate(self):
        s, n = (float(np.asarray(getattr(self, a)).ravel()[0])
                for a in ("sigma", "nu"))
        if s <= 0 or n <= 0:
            raise ValidationError(f"VG needs sigma > 0, nu > 0: {s}, {n}")
        # the martingale compensator needs 1 - theta*nu - sigma^2 nu/2 > 0
        th = float(np.asarray(self.theta).ravel()[0])
        if 1.0 - th * n - 0.5 * s * s * n <= 0:
            raise ValidationError(
                "VG martingale condition 1 - theta*nu - sigma^2*nu/2 > 0 "
                f"violated: {1.0 - th * n - 0.5 * s * s * n}")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NIGParams:
    """alpha: tail heaviness, beta: skew (|beta| < alpha), delta: scale."""

    alpha: jnp.ndarray
    beta: jnp.ndarray
    delta: jnp.ndarray

    @classmethod
    def make(cls, alpha=8.0, beta=-3.0, delta=0.3, dtype=jnp.float32):
        return cls(*(jnp.asarray(x, dtype) for x in (alpha, beta, delta)))

    def validate(self):
        a, b, d = (float(np.asarray(getattr(self, n)).ravel()[0])
                   for n in ("alpha", "beta", "delta"))
        if d <= 0 or a <= 0 or abs(b) >= a:
            raise ValidationError(
                f"NIG needs delta > 0, 0 < |beta| < alpha: {a}, {b}, {d}")
        if abs(b + 1.0) >= a:
            raise ValidationError(
                f"NIG martingale condition |beta + 1| < alpha violated: "
                f"beta={b}, alpha={a}")


def _clog1p(z):
    """Complex log(1+z) without forming 1+z (which rounds z away at f32
    for |z| ~ 1e-5 and, divided by nu in the VG CF, blows the BS limit)."""
    series = z * (1.0 - z * (0.5 - z / 3.0))  # z - z^2/2 + z^3/3
    return jnp.where(jnp.abs(z) < 1e-4, series, jnp.log(1.0 + z))


def _vg_log_cf_unnorm(u, p: VGParams, t):
    """log E[e^{iu X_t}] of the raw VG process (no compensator)."""
    iu = 1j * u
    z = -iu * p.theta * p.nu + 0.5 * p.sigma**2 * p.nu * u * u
    return -(t / p.nu) * _clog1p(z)


def _nig_log_cf_unnorm(u, p: NIGParams, t):
    iu = 1j * u
    g0 = jnp.sqrt(p.alpha**2 - p.beta**2)
    return t * p.delta * (g0 - jnp.sqrt(p.alpha**2 - (p.beta + iu) ** 2))


def _normalized_cf(log_cf_unnorm, params, u, t):
    """phi of ln(S_T/F): subtract iu * (compensator) so phi(-i) = 1."""
    omega = log_cf_unnorm(jnp.asarray(-1j), params, t)  # = log E[e^{X_t}]
    return jnp.exp(log_cf_unnorm(u, params, t) - 1j * u * omega)


@functools.partial(jax.jit, static_argnames=("n_nodes", "u_max"))
def vg_price(batch: ContractBatch, params: VGParams, n_nodes: int = 256,
             u_max: float = 400.0) -> jnp.ndarray:
    """European prices under Variance Gamma via the shared Lewis engine.

    (VG's CF decays only polynomially — the default quadrature is denser
    than Heston's.)"""
    return lewis_price(
        batch, lambda u, t: _normalized_cf(_vg_log_cf_unnorm, params, u, t),
        n_nodes=n_nodes, u_max=u_max)


@functools.partial(jax.jit, static_argnames=("n_nodes", "u_max"))
def nig_price(batch: ContractBatch, params: NIGParams, n_nodes: int = 256,
              u_max: float = 400.0) -> jnp.ndarray:
    """European prices under Normal Inverse Gaussian (shared Lewis engine)."""
    return lewis_price(
        batch, lambda u, t: _normalized_cf(_nig_log_cf_unnorm, params, u, t),
        n_nodes=n_nodes, u_max=u_max)


@functools.partial(jax.jit, static_argnames=("n_paths",))
def vg_mc_price(batch: ContractBatch, params: VGParams, key,
                n_paths: int = 200_000):
    """Exact terminal MC by gamma subordination: G ~ Gamma(T/nu, nu),
    X = theta*G + sigma*sqrt(G)*Z.  One draw per path — no time stepping."""
    b = batch.broadcast()
    flat = jax.tree.map(lambda x: x.reshape(-1).astype(jnp.float32), b)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
    c = flat.spot.shape[0]
    t = flat.maturity[:, None]
    kg, kz = jax.random.split(key)
    g = params.nu * jax.random.gamma(kg, t / params.nu, (c, n_paths),
                                     jnp.float32)
    z = jax.random.normal(kz, (c, n_paths), jnp.float32)
    x = params.theta * g + params.sigma * jnp.sqrt(g) * z
    # exponential compensator from the closed-form log-MGF at u = -i
    omega = jnp.real(_vg_log_cf_unnorm(jnp.asarray(-1j), params, t))
    st = flat.spot[:, None] * jnp.exp(
        (flat.rate - flat.dividend)[:, None] * t + x - omega)
    pay = jnp.maximum(flat.cp[:, None] * (st - flat.strike[:, None]), 0.0)
    price = jnp.exp(-flat.rate * flat.maturity) * pay.mean(axis=-1)
    stderr = jnp.exp(-flat.rate * flat.maturity) * pay.std(axis=-1) \
        / jnp.sqrt(jnp.float32(n_paths))
    return price.reshape(b.shape), stderr.reshape(b.shape)


@functools.partial(jax.jit, static_argnames=("n_paths",))
def nig_mc_price(batch: ContractBatch, params: NIGParams, key,
                 n_paths: int = 200_000):
    """Exact terminal MC by inverse-Gaussian subordination:
    IG(mu = T/g0, lam = T^2 * delta^2 ... ) — standard IG sampler
    (Michael–Schucany–Haas) from one normal + one uniform per path."""
    b = batch.broadcast()
    flat = jax.tree.map(lambda x: x.reshape(-1).astype(jnp.float32), b)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)
    c = flat.spot.shape[0]
    t = flat.maturity[:, None]
    g0 = jnp.sqrt(params.alpha**2 - params.beta**2)
    # subordinator I_t ~ IG(mean = delta*t/g0, shape = delta^2 t^2)
    mu = params.delta * t / g0
    lam = (params.delta * t) ** 2
    kn, ku, kz = jax.random.split(key, 3)
    nrm = jax.random.normal(kn, (c, n_paths), jnp.float32)
    y = nrm * nrm
    x1 = mu + mu * mu * y / (2.0 * lam) - (mu / (2.0 * lam)) * jnp.sqrt(
        4.0 * mu * lam * y + (mu * y) ** 2)
    u = jax.random.uniform(ku, (c, n_paths), jnp.float32)
    ig = jnp.where(u <= mu / (mu + x1), x1, mu * mu / x1)
    z = jax.random.normal(kz, (c, n_paths), jnp.float32)
    x = params.beta * ig + jnp.sqrt(ig) * z
    omega = jnp.real(_nig_log_cf_unnorm(jnp.asarray(-1j), params, t))
    st = flat.spot[:, None] * jnp.exp(
        (flat.rate - flat.dividend)[:, None] * t + x - omega)
    pay = jnp.maximum(flat.cp[:, None] * (st - flat.strike[:, None]), 0.0)
    price = jnp.exp(-flat.rate * flat.maturity) * pay.mean(axis=-1)
    stderr = jnp.exp(-flat.rate * flat.maturity) * pay.std(axis=-1) \
        / jnp.sqrt(jnp.float32(n_paths))
    return price.reshape(b.shape), stderr.reshape(b.shape)
