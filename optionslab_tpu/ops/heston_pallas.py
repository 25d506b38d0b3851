"""Fused Pallas kernel for Heston Monte Carlo (full-truncation Euler).

The stochastic-vol analog of ``exotic_pallas.py``: both state factors
(log-spot, variance) live in VMEM for the whole path; per step the kernel
draws two correlated normals, advances (x, v) with full truncation, and at
maturity reduces the discounted payoff moments on chip. Antithetic pairs
(−z_v, −z_x) share each draw.

Replaces the per-step ``jax.random.fold_in`` scan of ``models.heston.
heston_mc_price`` on the hot path (the scan engine remains the reference
implementation and the vmapped/AD path; tests cross-check statistically).

In-kernel Greeks (:func:`pallas_heston_greeks`): Heston terminal spots are
LINEAR in S0 (∂S_T/∂S0 = S_T/S0) and the rate enters only the drift
(∂x_T/∂r = T), so ONE extra moment Σ 1{exercise}·S_T yields both
pathwise delta and rho exactly — no extra simulation state.

Samplers: ``prng`` (hardware, default) or ``hash`` (counter-based murmur3
— bit-identical on TPU and the CPU interpreter; used by off-TPU tests).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.config import EPS_TIME
from .kernel_rng import draw_normals

ROWS = 128
LANES = 512
PATHS_PER_BLOCK = 2 * ROWS * LANES  # antithetic pair per draw


def _heston_kernel(seed_ref, p_ref, *refs, n_steps: int, cp: float,
                   sampler: str, vega: bool):
    """p_ref (SMEM f32[12]): S0, K, mu_dt=(r-q)dt, dt, sqrt_dt, kappa, theta,
    sigma_v, rho, srho, v0, unused.

    ``seed_ref = [seed, block0]``: streams index by GLOBAL block id (sharded
    launches own contiguous ranges — topology-invariant path sets).

    ``vega=True`` additionally carries the forward sensitivities
    (∂x/∂v0, ∂v/∂v0) through the full-truncation Euler recursion — the
    exact pathwise derivative of the SCHEME, so v0-vega comes out of the
    same pass (moment Σ 1{exercise}·S_T·∂x_T/∂v0).
    """
    if vega:
        pay_ref, pay2_ref, m1_ref, mv_ref = refs
    else:
        pay_ref, pay2_ref, m1_ref = refs
    block = pl.program_id(0) + seed_ref[1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in refs:
            ref[:, :] = jnp.zeros_like(ref)

    if sampler != "hash":
        pltpu.prng_seed(seed_ref[0] + block * jnp.int32(-1640531535))
    seed = seed_ref[0]

    s0, strike = p_ref[0], p_ref[1]
    mu_dt, dt, sqrt_dt = p_ref[2], p_ref[3], p_ref[4]
    kappa, theta_lr, sigma_v = p_ref[5], p_ref[6], p_ref[7]
    rho, srho, v0 = p_ref[8], p_ref[9], p_ref[10]

    shape = (ROWS, LANES)
    x0 = jnp.full(shape, jnp.log(s0), jnp.float32)
    vv0 = jnp.full(shape, v0, jnp.float32)
    zero = jnp.zeros(shape, jnp.float32)
    one = jnp.ones(shape, jnp.float32)

    def advance(x, v, dx, dv, sv, sx):
        ind = jnp.where(v > 0.0, 1.0, 0.0)  # full truncation: v⁺ = max(v,0)
        vp = v * ind
        sq = jnp.sqrt(vp)
        x = x + mu_dt - 0.5 * vp * dt + sq * sqrt_dt * sx
        v = v + kappa * (theta_lr - vp) * dt + sigma_v * sq * sqrt_dt * sv
        if vega:
            # d(sqrt(v⁺))/dv0 = ind/(2√v⁺)·dv (guarded at the origin)
            dsq = ind / (2.0 * jnp.maximum(sq, 1e-6)) * dv
            dx = dx - 0.5 * ind * dv * dt + dsq * sqrt_dt * sx
            dv = dv - kappa * ind * dv * dt + sigma_v * dsq * sqrt_dt * sv
        return x, v, dx, dv

    def body(i, carry):
        if vega:
            xa, va, xb, vb, dxa, dva, dxb, dvb = carry
        else:  # no dead sensitivity carries in the price-only variant
            (xa, va, xb, vb), (dxa, dva, dxb, dvb) = carry, (0., 0., 0., 0.)
        zv, zo = draw_normals(sampler, seed, block, i, n_steps, shape)
        zx = rho * zv + srho * zo
        xa, va, dxa, dva = advance(xa, va, dxa, dva, zv, zx)
        xb, vb, dxb, dvb = advance(xb, vb, dxb, dvb, -zv, -zx)
        if vega:
            return xa, va, xb, vb, dxa, dva, dxb, dvb
        return xa, va, xb, vb

    carry0 = ((x0, vv0, x0, vv0, zero, one, zero, one) if vega
              else (x0, vv0, x0, vv0))
    out_carry = jax.lax.fori_loop(0, n_steps, body, carry0)
    xa, va, xb, vb = out_carry[:4]
    dxa, dxb = (out_carry[4], out_carry[6]) if vega else (None, None)

    acc = jnp.zeros(shape, jnp.float32)
    acc2 = jnp.zeros(shape, jnp.float32)
    acc1 = jnp.zeros(shape, jnp.float32)
    accv = jnp.zeros(shape, jnp.float32)
    for x, dx in ((xa, dxa), (xb, dxb)):
        st = jnp.exp(x)
        d = cp * (st - strike)
        p = jnp.maximum(d, 0.0)
        ind_st = jnp.where(d > 0, st, 0.0)
        acc += p
        acc2 += p * p
        acc1 += ind_st  # Σ 1{exercise}·S_T → delta & rho
        if vega:
            accv += ind_st * dx  # Σ 1{ex}·S_T·∂x_T/∂v0 → v0-vega
    for off in range(0, LANES, 128):
        pay_ref[:, :] += acc[:, off:off + 128]
        pay2_ref[:, :] += acc2[:, off:off + 128]
        m1_ref[:, :] += acc1[:, off:off + 128]
        if vega:
            mv_ref[:, :] += accv[:, off:off + 128]


@functools.partial(jax.jit, static_argnames=("n_steps", "n_blocks", "cp",
                                             "sampler", "vega"))
def _launch(seed, params, *, n_steps: int, n_blocks: int, cp: float,
            sampler: str = "prng", vega: bool = False):
    n_out = 4 if vega else 3
    acc_spec = pl.BlockSpec((ROWS, 128), lambda b: (0, 0), memory_space=pltpu.VMEM)
    interpret = False if jax.default_backend() == "tpu" else pltpu.InterpretParams()
    return pl.pallas_call(
        functools.partial(_heston_kernel, n_steps=n_steps, cp=cp,
                          sampler=sampler, vega=vega),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[acc_spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((ROWS, 128), jnp.float32)] * n_out,
        cost_estimate=pl.CostEstimate(
            flops=n_blocks * n_steps * ROWS * LANES * 2 * (22 if vega else 14),
            bytes_accessed=n_out * ROWS * 128 * 4,
            transcendentals=n_blocks * n_steps * ROWS * LANES * 6,
        ),
        interpret=interpret,
    )(seed, params)


def _params_vec(spot, strike, maturity, rate, params, dividend, n_steps):
    t = max(float(maturity), EPS_TIME)
    dt = t / n_steps
    rho = float(params.rho)
    return t, jnp.asarray([
        float(spot), float(strike), (float(rate) - float(dividend)) * dt, dt,
        math.sqrt(dt), float(params.kappa), float(params.theta),
        float(params.sigma), rho, math.sqrt(max(1.0 - rho * rho, 0.0)),
        float(params.v0), 0.0,
    ], jnp.float32)


def _combine_moments(outs, n: int, scalars, cp: float, vega: bool) -> dict:
    """Moment tiles → price/stderr/delta/rho (+ v0-vega). Shared by the
    single-device pipeline and the sharded (psum-reduced) path."""
    spot, t, df, v0 = scalars
    pay, pay2, m1 = outs[:3]
    mean = pay.sum() / n
    var = jnp.maximum(pay2.sum() / n - mean * mean, 0.0)
    mean1 = m1.sum() / n
    price = df * mean
    out = {
        "price": price,
        "std_error": df * jnp.sqrt(var / n),
        # ∂S_T/∂S0 = S_T/S0 (S0 enters x only through log S0)
        "delta": df * cp * mean1 / spot,
        # ∂x_T/∂r = T → dpay = cp·1{ex}·S_T·T; plus the discount term
        "rho": t * (df * cp * mean1 - price),
    }
    if vega:
        meanv = outs[3].sum() / n
        out["vega_v0"] = df * cp * meanv  # ∂price/∂v0 (pathwise, exact in-scheme)
        # chain rule to spot-vol vega: σ0 = √v0 ⇒ ∂/∂σ0 = 2σ0·∂/∂v0
        out["vega"] = 2.0 * jnp.sqrt(v0) * out["vega_v0"]
    return out


@functools.partial(jax.jit,
                   static_argnames=("n_steps", "n_blocks", "cp", "sampler",
                                    "vega"))
def _pipeline(seed, p, scalars, *, n_steps, n_blocks, cp, sampler,
              vega=False):
    """launch → moment combination in ONE traced program (single dispatch
    over the tunnel — the ~25-30 ms eager-op overhead otherwise dominates
    small workloads)."""
    outs = _launch(seed, p, n_steps=n_steps, n_blocks=n_blocks,
                   cp=cp, sampler=sampler, vega=vega)
    return _combine_moments(outs, n_blocks * PATHS_PER_BLOCK, scalars, cp,
                            vega)


def pallas_heston_greeks(spot, strike, maturity, rate, params, cp: float = 1.0,
                         dividend: float = 0.0, n_paths: int = 1_000_000,
                         n_steps: int = 100, seed: int = 0,
                         sampler: str = "prng", vega: bool = True) -> dict:
    """Heston price + stderr + pathwise delta/rho (+ v0-vega) in one pass.

    ``params``: a ``models.heston.HestonParams`` (or anything with
    v0/kappa/theta/sigma/rho attributes). With ``vega=True`` (default) the
    kernel carries the forward sensitivities (∂x/∂v0, ∂v/∂v0) through the
    Euler recursion and returns ``vega_v0`` (∂price/∂v0) plus ``vega``
    (∂price/∂√v0). The returned dict also carries ``paths``. Validated
    against AD of the Lewis integral (``models.heston.heston_price``).
    """
    t, p = _params_vec(spot, strike, maturity, rate, params, dividend, n_steps)
    n_blocks = max(1, math.ceil(n_paths / PATHS_PER_BLOCK))
    scalars = jnp.asarray([float(spot), t, math.exp(-float(rate) * t),
                           float(params.v0)], jnp.float32)
    out = dict(_pipeline(jnp.asarray([seed, 0], jnp.int32), p, scalars,
                         n_steps=n_steps, n_blocks=n_blocks, cp=float(cp),
                         sampler=sampler, vega=vega))
    out["paths"] = n_blocks * PATHS_PER_BLOCK
    return out


def pallas_heston_price(spot, strike, maturity, rate, params, cp: float = 1.0,
                        dividend: float = 0.0, n_paths: int = 1_000_000,
                        n_steps: int = 100, seed: int = 0,
                        sampler: str = "prng"):
    """(price, stderr, actual_paths) under Heston via the fused kernel."""
    out = pallas_heston_greeks(spot, strike, maturity, rate, params, cp,
                               dividend, n_paths, n_steps, seed, sampler,
                               vega=False)
    return out["price"], out["std_error"], out["paths"]
