"""Monte Carlo pricing engine — XLA path (the Pallas kernel lives in
``optionslab_tpu.ops.gbm_pallas``; the sharded multi-chip path in
``optionslab_tpu.parallel.sharded_mc``).

Reference capabilities covered (SURVEY.md §2.1/§2.2):
  - ``src/simulation/gbm_numpy.py:15,56,86`` — terminal GBM (multi-step and
    single-step exact) + full-path simulation, antithetic variates.
  - ``src/simulation/gbm_qmc.py:14,49`` — Sobol QMC terminal GBM.
  - ``src/pricing_models/monte_carlo.py:46-190`` — MonteCarloPricer: method
    dispatch, MCResult with standard error, control variate on terminal spot.
  - ``src/pricing_models/monte_carlo_unified.py:236-691`` — batch pricing of
    many options over shared random numbers, delta/gamma with CRN.

TPU-first design decisions:
  * The *steps* axis is never materialized: multi-step simulation is a
    ``lax.scan`` whose carry is the running log-spot — HBM traffic is O(paths)
    not O(paths × steps) (reference materializes the full normals cube,
    ``monte_carlo_unified.py:329``).
  * The *contracts* axis broadcasts against a SHARED normal draw (common
    random numbers by construction), so a whole book prices in one launch.
  * Greeks are AD-first: ``jax.grad`` through the simulator gives pathwise
    delta/vega/rho/theta (the payoff is a.e. differentiable). Gamma — whose
    pathwise second derivative is a.e. zero — uses the likelihood-ratio /
    pathwise mixed estimator derived in :func:`mc_greeks`. CRN finite
    differences are kept in the tests as a cross-check oracle only.
  * Randomness is counter-based threefry; the same (seed, path-index) pair
    gives the same normal on any device topology.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.math import smooth_indicator
from ..ops.rng import qmc_normals
from ..types import ContractBatch
from ..utils.config import DEFAULT_DTYPE, EPS_TIME
from ..utils.exceptions import ValidationError


class MCMethod(enum.Enum):
    """Sampling backend (reference: ``monte_carlo.py:28`` MCMethod)."""

    XLA = "xla"  # jax.random pseudo-random (replaces NUMPY/NUMBA/FAST)
    QMC = "qmc"  # scrambled Sobol / shifted Halton
    PALLAS = "pallas"  # fused on-chip kernel (ops/gbm_pallas.py)


@dataclasses.dataclass(frozen=True)
class MCConfig:
    n_paths: int = 100_000
    n_steps: int = 1  # 1 = exact single-step terminal GBM (reference default)
    antithetic: bool = True
    method: MCMethod = MCMethod.XLA
    dtype: object = DEFAULT_DTYPE


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MCResult:
    """Price with MC standard error (reference: ``monte_carlo.py:37``)."""

    price: jnp.ndarray
    std_error: jnp.ndarray
    n_paths: jnp.ndarray

    def confidence_interval(self, z: float = 1.96):
        return self.price - z * self.std_error, self.price + z * self.std_error


def _validate_config(cfg: MCConfig) -> None:
    if cfg.n_paths <= 0:
        raise ValidationError(f"n_paths must be positive, got {cfg.n_paths}")
    if cfg.n_steps <= 0:
        raise ValidationError(f"n_steps must be positive, got {cfg.n_steps}")
    if cfg.antithetic and cfg.n_paths % 2:
        raise ValidationError("antithetic sampling requires an even n_paths")


# ---------------------------------------------------------------------------
# Normal draws — (n_paths, n_steps), shared across the contract axis (CRN)
# ---------------------------------------------------------------------------
def draw_normals(key, cfg: MCConfig) -> jnp.ndarray:
    """(n_paths, n_steps) standard normals per config (antithetic pairs are
    rows i and i + n/2)."""
    n, m = cfg.n_paths, cfg.n_steps
    if cfg.method == MCMethod.QMC:
        if cfg.antithetic:
            z = qmc_normals(n // 2, m, key=key, dtype=cfg.dtype)
            return jnp.concatenate([z, -z], axis=0)
        return qmc_normals(n, m, key=key, dtype=cfg.dtype)
    if cfg.antithetic:
        z = jax.random.normal(key, (n // 2, m), dtype=cfg.dtype)
        return jnp.concatenate([z, -z], axis=0)
    return jax.random.normal(key, (n, m), dtype=cfg.dtype)


# ---------------------------------------------------------------------------
# GBM terminal / path simulation (differentiable)
# ---------------------------------------------------------------------------
def gbm_terminal(batch: ContractBatch, z: jnp.ndarray) -> jnp.ndarray:
    """Terminal spots (contracts..., n_paths) from normals z (n_paths, n_steps).

    Single XLA launch: the step axis reduces via a sum of normals (GBM
    increments are exact at any step count for terminal-only payoffs —
    reference exploits the same identity at ``gbm_numpy.py:15`` using
    ``sum`` instead of ``cumsum``).
    """
    n_steps = z.shape[-1]
    dt = batch.maturity[..., None] / n_steps
    drift = (batch.rate - batch.dividend - 0.5 * batch.vol**2)[..., None] * batch.maturity[..., None]
    vol_term = batch.vol[..., None] * jnp.sqrt(dt)
    # sum of per-step shocks — (paths,) after reducing the step axis
    # HIGHEST: TPU default contraction precision is bf16 — unacceptable
    # for the core price path
    shock = jnp.einsum("pm,...m->...p", z,
                       jnp.broadcast_to(vol_term, batch.shape + (n_steps,)),
                       precision=jax.lax.Precision.HIGHEST)
    return batch.spot[..., None] * jnp.exp(drift + shock)


def gbm_paths(batch: ContractBatch, z: jnp.ndarray) -> jnp.ndarray:
    """Full paths (contracts..., n_paths, n_steps+1) including t=0.

    For path-dependent payoffs that genuinely need every node (reference:
    ``gbm_numpy.py:86`` simulate_gbm_paths). Exotic pricers should prefer
    the scan-based running-statistic engine in ``models/exotics.py`` which
    never materializes this array.
    """
    n_steps = z.shape[-1]
    dt = (batch.maturity / n_steps)[..., None, None]
    drift = ((batch.rate - batch.dividend - 0.5 * batch.vol**2)[..., None, None]) * dt
    shock = batch.vol[..., None, None] * jnp.sqrt(dt) * z
    log_increments = drift + shock  # (..., n_paths, n_steps)
    log_path = jnp.cumsum(log_increments, axis=-1)
    s0 = batch.spot[..., None, None]
    paths = s0 * jnp.exp(log_path)
    return jnp.concatenate([jnp.broadcast_to(s0, paths[..., :1].shape), paths], axis=-1)


# ---------------------------------------------------------------------------
# Pricing
# ---------------------------------------------------------------------------
def _discounted_mean(batch: ContractBatch, payoffs: jnp.ndarray):
    df = batch.discount()
    mean = payoffs.mean(axis=-1)
    return df * mean


def mc_price(
    batch: ContractBatch,
    key,
    cfg: MCConfig = MCConfig(),
    payoff_fn: Callable | None = None,
) -> jnp.ndarray:
    """Discounted expected payoff. Differentiable wrt every batch field.

    ``payoff_fn(batch, terminal) -> payoffs`` defaults to vanilla intrinsic.
    """
    z = draw_normals(key, cfg)
    terminal = gbm_terminal(batch.broadcast(), z)
    b = batch.broadcast()
    payoffs = b.intrinsic(terminal) if payoff_fn is None else payoff_fn(b, terminal)
    live = _discounted_mean(b, payoffs)
    # expired contracts: intrinsic (reference short-circuit, monte_carlo.py:133)
    return jnp.where(b.maturity <= EPS_TIME, b.intrinsic(), live)


def mc_price_result(batch: ContractBatch, key, cfg: MCConfig = MCConfig()) -> MCResult:
    """Price + standard error (reference MCResult, ``monte_carlo.py:149``)."""
    _validate_config(cfg)
    z = draw_normals(key, cfg)
    b = batch.broadcast()
    terminal = gbm_terminal(b, z)
    pay = b.intrinsic(terminal)
    df = b.discount()
    price = df * pay.mean(axis=-1)
    if cfg.antithetic:
        # stderr from antithetic PAIR means (the independent samples)
        half = cfg.n_paths // 2
        pair = 0.5 * (pay[..., :half] + pay[..., half:])
        se = df * pair.std(axis=-1, ddof=1) / jnp.sqrt(half)
    else:
        se = df * pay.std(axis=-1, ddof=1) / jnp.sqrt(cfg.n_paths)
    price = jnp.where(b.maturity <= EPS_TIME, b.intrinsic(), price)
    se = jnp.where(b.maturity <= EPS_TIME, 0.0, se)
    return MCResult(price=price, std_error=se, n_paths=jnp.asarray(cfg.n_paths))


def mc_price_control_variate(batch: ContractBatch, key, cfg: MCConfig = MCConfig()) -> MCResult:
    """Control variate on the terminal spot, E[S_T] = F known in closed form
    (reference: ``monte_carlo.py:154`` price_with_control_variate).

    beta is the regression coefficient cov(payoff, S_T)/var(S_T), estimated
    on-device from the same draw.
    """
    _validate_config(cfg)
    z = draw_normals(key, cfg)
    b = batch.broadcast()
    terminal = gbm_terminal(b, z)
    pay = b.intrinsic(terminal)
    fwd = b.forward()[..., None]
    cv = terminal - fwd  # zero-mean control
    pay_c = pay - pay.mean(axis=-1, keepdims=True)
    beta = (pay_c * cv).mean(axis=-1) / jnp.maximum(
        (cv * cv).mean(axis=-1), jnp.asarray(1e-12, pay.dtype)
    )
    adjusted = pay - beta[..., None] * cv
    df = b.discount()
    price = df * adjusted.mean(axis=-1)
    se = df * adjusted.std(axis=-1, ddof=1) / jnp.sqrt(cfg.n_paths)
    return MCResult(price=price, std_error=se, n_paths=jnp.asarray(cfg.n_paths))


# ---------------------------------------------------------------------------
# Greeks: pathwise AD + likelihood-ratio gamma
# ---------------------------------------------------------------------------
def mc_greeks(batch: ContractBatch, key, cfg: MCConfig = MCConfig()) -> dict:
    """Full MC Greeks in one reverse-mode sweep + LR/PW gamma.

    delta/vega/rho/theta/dual_delta: pathwise via ``jax.grad`` of
    :func:`mc_price` at fixed key (CRN is automatic — the randomness is an
    explicit input, reference needed manual seed reuse,
    ``monte_carlo_unified.py:513``).

    gamma: the vanilla payoff's pathwise second derivative is a.e. 0, so we
    use the mixed pathwise–likelihood-ratio estimator (Glasserman §7.3):
    differentiating the pathwise delta E[1{cp·(S_T-K)>0} cp·S_T/S_0] once
    more by LR on the terminal density gives, for single-step exact GBM
    (S_T = S_0 exp((r-q-σ²/2)T + σ√T Z)):

        Γ = e^{-rT}/S_0² · E[ cp·1{cp(S_T-K)>0} · S_T · (Z/(σ√T) - 1) ]

    which is unbiased for any payoff of the terminal spot with an a.e.
    derivative; validated against BS analytic gamma in tests.
    """
    z = draw_normals(key, cfg)

    def price_of(S, sig, r, T, q, K):
        b = ContractBatch(S, K, T, r, sig, q, batch.cp).broadcast()
        terminal = gbm_terminal(b, z)
        return jnp.sum(b.discount() * b.intrinsic(terminal).mean(axis=-1))

    b0 = batch.broadcast()
    args = (b0.spot, b0.vol, b0.rate, b0.maturity, b0.dividend, b0.strike)
    dS, dsig, dr, dT, dq, dK = jax.grad(price_of, argnums=(0, 1, 2, 3, 4, 5))(*args)

    # LR-PW gamma on the effective single-step representation:
    # z_eff = (sum of step shocks)/sqrt(T_total) is standard normal.
    n_steps = z.shape[-1]
    z_eff = z.sum(axis=-1) / jnp.sqrt(jnp.asarray(float(n_steps), z.dtype))  # (paths,)
    terminal = gbm_terminal(b0, z)
    sig_sqrt_t = b0.vol * jnp.sqrt(jnp.maximum(b0.maturity, EPS_TIME))
    indicator = (b0.cp[..., None] * (terminal - b0.strike[..., None])) > 0
    weight = z_eff / sig_sqrt_t[..., None] - 1.0
    gamma = (
        b0.discount()
        / jnp.maximum(b0.spot, 1e-30) ** 2
        * (b0.cp[..., None] * jnp.where(indicator, terminal, 0.0) * weight).mean(axis=-1)
    )
    return {
        "price": mc_price(batch, key, cfg),
        "delta": dS,
        "gamma": gamma,
        "vega": dsig,
        "rho": dr,
        "theta": -dT,
        "dual_delta": dK,
        "dividend_rho": dq,
    }


def mc_greeks_smoothed(
    batch: ContractBatch, key, cfg: MCConfig = MCConfig(), width: float = 0.5
) -> dict:
    """Second-order-capable greeks for ARBITRARY payoffs by kink smoothing.

    Replaces the payoff indicator with a sigmoid of width ``width`` (in spot
    units) so ``jax.grad(jax.grad)`` is meaningful. Bias is O(width²);
    used when no LR weight is available (exotics with custom payoffs).
    """
    z = draw_normals(key, cfg)

    def price_of(S):
        b = ContractBatch(S, batch.strike, batch.maturity, batch.rate, batch.vol, batch.dividend, batch.cp).broadcast()
        terminal = gbm_terminal(b, z)
        x = b.cp[..., None] * (terminal - b.strike[..., None])
        smoothed = x * smooth_indicator(x, width)
        return jnp.sum(b.discount() * smoothed.mean(axis=-1))

    b0 = batch.broadcast()
    delta = jax.grad(price_of)(b0.spot)
    gamma = jax.jacfwd(jax.grad(price_of))(b0.spot)
    if b0.shape != ():  # jacfwd gives a (n, n) diagonal matrix for batched S
        gamma = jnp.diagonal(gamma, axis1=-2, axis2=-1).reshape(b0.shape)
    return {"delta": delta, "gamma": gamma}


# ---------------------------------------------------------------------------
# Object-style pricer (unified protocol, mirrors MonteCarloPricer/Uni)
# ---------------------------------------------------------------------------
class MonteCarloPricer:
    """Stateful-looking adapter over the functional engine.

    ``price``/``price_batch``/``delta_gamma``/``delta_gamma_batch`` mirror
    ``MonteCarloPricerUni`` (``monte_carlo_unified.py:451,513,562,633``); all
    are jit-compiled on first use and cached by input shape.
    """

    def __init__(self, n_paths: int = 100_000, n_steps: int = 1, antithetic: bool = True,
                 method: MCMethod = MCMethod.XLA, seed: int = 0, dtype=None):
        self.cfg = MCConfig(
            n_paths=n_paths, n_steps=n_steps, antithetic=antithetic, method=method,
            dtype=dtype or DEFAULT_DTYPE,
        )
        _validate_config(self.cfg)
        self.seed = seed
        self._key = jax.random.PRNGKey(seed)
        self._price_jit = jax.jit(lambda b, k: mc_price(b, k, self.cfg))
        self._result_jit = jax.jit(lambda b, k: mc_price_result(b, k, self.cfg))
        self._greeks_jit = jax.jit(lambda b, k: mc_greeks(b, k, self.cfg))

    def _batch(self, S, K, T, r, sigma, option_type, q):
        return ContractBatch.make(S, K, T, r, sigma, option_type, q, dtype=self.cfg.dtype)

    def _pallas(self, batch):
        from ..ops.gbm_pallas import pallas_mc_price_greeks

        return pallas_mc_price_greeks(batch, n_paths=self.cfg.n_paths, seed=self.seed)

    def price(self, S, K, T, r, sigma, option_type="call", q=0.0, return_result: bool = False):
        b = self._batch(S, K, T, r, sigma, option_type, q)
        if self.cfg.method == MCMethod.PALLAS:
            out = self._pallas(b)
            if return_result:
                return MCResult(price=out["price"], std_error=out["std_error"],
                                n_paths=jnp.asarray(self.cfg.n_paths))
            return out["price"]
        if return_result:
            return self._result_jit(b, self._key)
        return self._price_jit(b, self._key)

    # batch aliases — the functional engine is batched by construction
    price_batch = price

    def delta_gamma(self, S, K, T, r, sigma, option_type="call", q=0.0):
        g = self.greeks(S, K, T, r, sigma, option_type, q)
        return g["delta"], g["gamma"]

    delta_gamma_batch = delta_gamma

    def greeks(self, S, K, T, r, sigma, option_type="call", q=0.0):
        b = self._batch(S, K, T, r, sigma, option_type, q)
        if self.cfg.method == MCMethod.PALLAS:
            return self._pallas(b)
        return self._greeks_jit(b, self._key)
