"""Jump-diffusion models: Merton (lognormal jumps) and Kou (double exponential).

Reference capabilities covered (SURVEY.md §2.2):
  - ``src/pricing_models/jump_diffusion.py:42-159`` — Merton series
    expansion (Poisson-weighted Black–Scholes) with convergence cutoff,
    kappa property.
  - ``jump_diffusion.py:160-272`` — Merton MC with per-path Poisson jump
    counts + single-path simulator.
  - ``jump_diffusion.py:273-372`` — Kou double-exponential variant (MC).

TPU-first design: the Merton series is a FIXED-length weighted sum (static
``n_terms``; the tail weight bound is checked in tests instead of a
data-dependent cutoff) evaluated as one vectorized launch over (contracts ×
terms). MC uses the exact compound-Poisson terminal distribution: draw the
Poisson count N and the summed jump sizes in closed form per path — no
per-step jump loop (the reference loops Python-side per path,
``jump_diffusion.py:213-216``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..types import ContractBatch
from ..utils.config import EPS_TIME
from ..utils.exceptions import ValidationError
from .black_scholes import bs_price


# ---------------------------------------------------------------------------
# Merton: series expansion
# ---------------------------------------------------------------------------
def merton_kappa(mu_j, sigma_j):
    """E[e^J] - 1 for lognormal jumps (reference: kappa property, :64)."""
    return jnp.exp(mu_j + 0.5 * sigma_j**2) - 1.0


@functools.partial(jax.jit, static_argnames=("n_terms",))
def merton_price(batch: ContractBatch, lam, mu_j, sigma_j, n_terms: int = 40) -> jnp.ndarray:
    """Merton 1976: price = Σ_n P(N=n) · BS(σ_n, r_n) with
    σ_n² = σ² + n·σ_J²/T, r_n = r − λκ + n·(μ_J + σ_J²/2)/T.

    ``n_terms`` is static (40 covers λT ≤ ~10 to 1e-12 tail mass — the
    bound the reference trims to dynamically at ``jump_diffusion.py:128``).
    """
    b = batch.broadcast()
    lam = jnp.asarray(lam, b.dtype)
    mu_j = jnp.asarray(mu_j, b.dtype)
    sigma_j = jnp.asarray(sigma_j, b.dtype)
    t = jnp.maximum(b.maturity, EPS_TIME)
    kappa = merton_kappa(mu_j, sigma_j)
    lam_p = lam * (1.0 + kappa)  # intensity under the n-conditioned measure

    n = jnp.arange(n_terms, dtype=b.dtype)
    # log Poisson weights with lam' (Merton's trick folds e^J drift into them)
    # clamp keeps λ=0 finite in f32: n=0 → weight 1, n≥1 → exp(-69n) ≈ 0
    log_w = -lam_p * t[..., None] + n * jnp.log(jnp.maximum(lam_p * t[..., None], 1e-30)) - lax.lgamma(n + 1.0)
    w = jnp.exp(log_w)

    sig_n = jnp.sqrt(b.vol[..., None] ** 2 + n * sigma_j**2 / t[..., None])
    r_n = b.rate[..., None] - lam * kappa + n * (mu_j + 0.5 * sigma_j**2) / t[..., None]
    prices_n = bs_price(
        b.spot[..., None], b.strike[..., None], t[..., None], r_n, sig_n,
        b.cp[..., None], b.dividend[..., None],
    )
    price = jnp.sum(w * prices_n, axis=-1)
    intrinsic = jnp.maximum(b.cp * (b.spot - b.strike), 0.0)
    return jnp.where(b.maturity <= EPS_TIME, intrinsic, price)


@functools.partial(jax.jit, static_argnames=("n_paths", "antithetic"))
def merton_mc_price(batch: ContractBatch, lam, mu_j, sigma_j, key,
                    n_paths: int = 100_000, antithetic: bool = True) -> jnp.ndarray:
    """Exact terminal sampling: N ~ Poisson(λT); Σjumps | N ~ Normal(Nμ_J, Nσ_J²).

    One draw per path, no step loop, no per-path Python (contrast
    ``jump_diffusion.py:213-216``).
    """
    b = batch.broadcast()
    flat = jax.tree.map(lambda x: x.reshape(-1).astype(jnp.float32), b)
    lam = jnp.asarray(lam, jnp.float32)
    mu_j = jnp.asarray(mu_j, jnp.float32)
    sigma_j = jnp.asarray(sigma_j, jnp.float32)
    c = flat.spot.shape[0]
    t = jnp.maximum(flat.maturity, EPS_TIME)[:, None]

    k_n, k_z, k_j = jax.random.split(key, 3)
    half = n_paths // 2 if antithetic else n_paths
    n_jumps = jax.random.poisson(k_n, lam * t, (c, half)).astype(jnp.float32)
    zj = jax.random.normal(k_j, (c, half), dtype=jnp.float32)
    jump_sum = n_jumps * mu_j + jnp.sqrt(n_jumps) * sigma_j * zj
    z = jax.random.normal(k_z, (c, half), dtype=jnp.float32)
    if antithetic:
        z = jnp.concatenate([z, -z], axis=1)
        jump_sum = jnp.concatenate([jump_sum, jump_sum], axis=1)  # CRN on jumps

    kappa = merton_kappa(mu_j, sigma_j)
    drift = (flat.rate - flat.dividend - lam * kappa - 0.5 * flat.vol**2)[:, None] * t
    diffu = (flat.vol * jnp.sqrt(t[:, 0]))[:, None] * z
    st = flat.spot[:, None] * jnp.exp(drift + diffu + jump_sum)
    pay = jnp.maximum(flat.cp[:, None] * (st - flat.strike[:, None]), 0.0)
    price = jnp.exp(-flat.rate * flat.maturity) * pay.mean(axis=1)
    intrinsic = jnp.maximum(flat.cp * (flat.spot - flat.strike), 0.0)
    return jnp.where(flat.maturity <= EPS_TIME, intrinsic, price).reshape(b.shape)


@functools.partial(jax.jit, static_argnames=("n_steps",))
def merton_simulate_path(spot, maturity, rate, vol, lam, mu_j, sigma_j, key,
                         n_steps: int = 252, dividend=0.0):
    """Single jump-diffusion trajectory (reference: simulate_path, :227)."""
    dt = maturity / n_steps
    k_z, k_n, k_j = jax.random.split(key, 3)
    z = jax.random.normal(k_z, (n_steps,))
    n_jumps = jax.random.poisson(k_n, lam * dt, (n_steps,)).astype(z.dtype)
    zj = jax.random.normal(k_j, (n_steps,))
    jumps = n_jumps * mu_j + jnp.sqrt(n_jumps) * sigma_j * zj
    kappa = merton_kappa(jnp.asarray(mu_j), jnp.asarray(sigma_j))
    incr = (rate - dividend - lam * kappa - 0.5 * vol**2) * dt + vol * jnp.sqrt(dt) * z + jumps
    log_path = jnp.concatenate([jnp.zeros(1, z.dtype), jnp.cumsum(incr)])
    return spot * jnp.exp(log_path)


# ---------------------------------------------------------------------------
# Kou double-exponential jumps
# ---------------------------------------------------------------------------
def kou_kappa(p_up, eta1, eta2):
    """E[e^J]-1 for Kou jumps: p·η₁/(η₁-1) + (1-p)·η₂/(η₂+1) - 1 (needs η₁>1)."""
    return p_up * eta1 / (eta1 - 1.0) + (1.0 - p_up) * eta2 / (eta2 + 1.0) - 1.0


@functools.partial(jax.jit, static_argnames=("n_paths", "max_jumps", "antithetic"))
def kou_mc_price(batch: ContractBatch, lam, p_up, eta1, eta2, key,
                 n_paths: int = 100_000, max_jumps: int = 32,
                 antithetic: bool = True) -> jnp.ndarray:
    """Kou (2002) double-exponential jump MC (reference: ``jump_diffusion.py:273``).

    Jump sum sampled with a fixed jump buffer: draw ``max_jumps`` candidate
    jumps per path, mask by the Poisson count (static shapes; tail
    P(N > max_jumps) is negligible for λT ≤ ~8 and asserted in tests).
    """
    b = batch.broadcast()
    flat = jax.tree.map(lambda x: x.reshape(-1).astype(jnp.float32), b)
    lam, p_up, eta1, eta2 = (jnp.asarray(x, jnp.float32) for x in (lam, p_up, eta1, eta2))
    c = flat.spot.shape[0]
    t = jnp.maximum(flat.maturity, EPS_TIME)[:, None]
    half = n_paths // 2 if antithetic else n_paths

    k_n, k_z, k_u, k_e = jax.random.split(key, 4)
    n_jumps = jax.random.poisson(k_n, lam * t, (c, half)).astype(jnp.float32)
    # candidate jumps: sign from Bernoulli(p_up), magnitude Exp(η±)
    u = jax.random.uniform(k_u, (c, half, max_jumps))
    e = jax.random.exponential(k_e, (c, half, max_jumps))
    jump_vals = jnp.where(u < p_up, e / eta1, -e / eta2)
    mask = jnp.arange(max_jumps)[None, None, :] < n_jumps[..., None]
    jump_sum = jnp.sum(jnp.where(mask, jump_vals, 0.0), axis=-1)

    z = jax.random.normal(k_z, (c, half), dtype=jnp.float32)
    if antithetic:
        z = jnp.concatenate([z, -z], axis=1)
        jump_sum = jnp.concatenate([jump_sum, jump_sum], axis=1)

    kappa = kou_kappa(p_up, eta1, eta2)
    drift = (flat.rate - flat.dividend - lam * kappa - 0.5 * flat.vol**2)[:, None] * t
    diffu = (flat.vol * jnp.sqrt(t[:, 0]))[:, None] * z
    st = flat.spot[:, None] * jnp.exp(drift + diffu + jump_sum)
    pay = jnp.maximum(flat.cp[:, None] * (st - flat.strike[:, None]), 0.0)
    price = jnp.exp(-flat.rate * flat.maturity) * pay.mean(axis=1)
    intrinsic = jnp.maximum(flat.cp * (flat.spot - flat.strike), 0.0)
    return jnp.where(flat.maturity <= EPS_TIME, intrinsic, price).reshape(b.shape)


# ---------------------------------------------------------------------------
# Object adapters (reference: MertonJumpDiffusion / KouJumpDiffusion)
# ---------------------------------------------------------------------------
class MertonJumpDiffusion:
    def __init__(self, lam=0.5, mu_j=-0.1, sigma_j=0.2):
        if lam < 0 or sigma_j < 0:
            raise ValidationError("lambda and sigma_j must be non-negative")
        self.lam, self.mu_j, self.sigma_j = lam, mu_j, sigma_j

    @property
    def kappa(self):
        return float(merton_kappa(jnp.asarray(self.mu_j), jnp.asarray(self.sigma_j)))

    def price(self, S, K, T, r, sigma, option_type="call", q=0.0):
        batch = ContractBatch.make(S, K, T, r, sigma, option_type, q)
        return merton_price(batch, self.lam, self.mu_j, self.sigma_j)

    def price_monte_carlo(self, S, K, T, r, sigma, option_type="call", q=0.0,
                          n_paths=100_000, seed=0):
        batch = ContractBatch.make(S, K, T, r, sigma, option_type, q)
        return merton_mc_price(batch, self.lam, self.mu_j, self.sigma_j,
                               jax.random.PRNGKey(seed), n_paths=n_paths)

    def simulate_path(self, S, T, r, sigma, n_steps=252, q=0.0, seed=0):
        return merton_simulate_path(S, T, r, sigma, self.lam, self.mu_j, self.sigma_j,
                                    jax.random.PRNGKey(seed), n_steps=n_steps, dividend=q)


class KouJumpDiffusion:
    def __init__(self, lam=0.5, p_up=0.4, eta1=10.0, eta2=5.0):
        if eta1 <= 1.0:
            raise ValidationError("eta1 must exceed 1 for a finite jump mean")
        if not 0.0 <= p_up <= 1.0:
            raise ValidationError("p_up must be a probability")
        self.lam, self.p_up, self.eta1, self.eta2 = lam, p_up, eta1, eta2

    @property
    def kappa(self):
        return float(kou_kappa(jnp.asarray(self.p_up), jnp.asarray(self.eta1),
                               jnp.asarray(self.eta2)))

    def price_monte_carlo(self, S, K, T, r, sigma, option_type="call", q=0.0,
                          n_paths=100_000, seed=0):
        batch = ContractBatch.make(S, K, T, r, sigma, option_type, q)
        return kou_mc_price(batch, self.lam, self.p_up, self.eta1, self.eta2,
                            jax.random.PRNGKey(seed), n_paths=n_paths)
