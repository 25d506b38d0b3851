"""Fused Pallas kernel for Heston Monte Carlo (full-truncation Euler).

The stochastic-vol analog of ``exotic_pallas.py``: both state factors
(log-spot, variance) live in VMEM for the whole path; per step the kernel
draws two correlated normals from the hardware PRNG, advances (x, v) with
full truncation, and at maturity reduces the discounted payoff moments on
chip. Antithetic pairs (−z_v, −z_x) share each draw.

Replaces the per-step ``jax.random.fold_in`` scan of ``models.heston.
heston_mc_price`` on the hot path (the scan engine remains the reference
implementation and the vmapped/AD path; tests cross-check statistically).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.config import EPS_TIME

ROWS = 128
LANES = 512
PATHS_PER_BLOCK = 2 * ROWS * LANES  # antithetic pair per draw
_TWO_PI = 6.283185307179586
_INV_2_24 = 1.0 / (1 << 24)
_INV_2_25 = 1.0 / (1 << 25)


def _normals(shape):
    mask24 = jnp.int32(0x00FFFFFF)
    u1 = ((pltpu.prng_random_bits(shape) >> 8) & mask24).astype(jnp.float32) * _INV_2_24 + _INV_2_25
    u2 = ((pltpu.prng_random_bits(shape) >> 8) & mask24).astype(jnp.float32) * _INV_2_24 + _INV_2_25
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    th = _TWO_PI * u2
    return r * jnp.cos(th), r * jnp.sin(th)


def _heston_kernel(seed_ref, p_ref, pay_ref, pay2_ref, *, n_steps: int, cp: float):
    """p_ref (SMEM f32[12]): S0, K, mu_dt=(r-q)dt, dt, sqrt_dt, kappa, theta,
    sigma_v, rho, srho, v0, unused."""
    block = pl.program_id(0)

    @pl.when(block == 0)
    def _init():
        pay_ref[:, :] = jnp.zeros_like(pay_ref)
        pay2_ref[:, :] = jnp.zeros_like(pay2_ref)

    pltpu.prng_seed(seed_ref[0] + block * jnp.int32(-1640531535))

    s0, strike = p_ref[0], p_ref[1]
    mu_dt, dt, sqrt_dt = p_ref[2], p_ref[3], p_ref[4]
    kappa, theta_lr, sigma_v = p_ref[5], p_ref[6], p_ref[7]
    rho, srho, v0 = p_ref[8], p_ref[9], p_ref[10]

    shape = (ROWS, LANES)
    x0 = jnp.full(shape, jnp.log(s0), jnp.float32)
    vv0 = jnp.full(shape, v0, jnp.float32)

    def body(i, carry):
        xa, va, xb, vb = carry
        zv, zo = _normals(shape)
        zx = rho * zv + srho * zo

        def advance(x, v, sv, sx):
            vp = jnp.maximum(v, 0.0)
            sq = jnp.sqrt(vp)
            x = x + mu_dt - 0.5 * vp * dt + sq * sqrt_dt * sx
            v = v + kappa * (theta_lr - vp) * dt + sigma_v * sq * sqrt_dt * sv
            return x, v

        xa, va = advance(xa, va, zv, zx)
        xb, vb = advance(xb, vb, -zv, -zx)
        return xa, va, xb, vb

    xa, va, xb, vb = jax.lax.fori_loop(0, n_steps, body, (x0, vv0, x0, vv0))

    acc = jnp.zeros(shape, jnp.float32)
    acc2 = jnp.zeros(shape, jnp.float32)
    for x in (xa, xb):
        p = jnp.maximum(cp * (jnp.exp(x) - strike), 0.0)
        acc += p
        acc2 += p * p
    for off in range(0, LANES, 128):
        pay_ref[:, :] += acc[:, off:off + 128]
        pay2_ref[:, :] += acc2[:, off:off + 128]


@functools.partial(jax.jit, static_argnames=("n_steps", "n_blocks", "cp"))
def _launch(seed, params, *, n_steps: int, n_blocks: int, cp: float):
    acc_spec = pl.BlockSpec((ROWS, 128), lambda b: (0, 0), memory_space=pltpu.VMEM)
    interpret = False if jax.default_backend() == "tpu" else pltpu.InterpretParams()
    return pl.pallas_call(
        functools.partial(_heston_kernel, n_steps=n_steps, cp=cp),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[acc_spec, acc_spec],
        out_shape=[jax.ShapeDtypeStruct((ROWS, 128), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=n_blocks * n_steps * ROWS * LANES * 2 * 14,
            bytes_accessed=2 * ROWS * 128 * 4,
            transcendentals=n_blocks * n_steps * ROWS * LANES * 6,
        ),
        interpret=interpret,
    )(seed, params)


def pallas_heston_price(spot, strike, maturity, rate, params, cp: float = 1.0,
                        dividend: float = 0.0, n_paths: int = 1_000_000,
                        n_steps: int = 100, seed: int = 0):
    """(price, stderr, actual_paths) under Heston via the fused kernel.

    ``params``: a ``models.heston.HestonParams`` (or anything with
    v0/kappa/theta/sigma/rho attributes).
    """
    t = max(float(maturity), EPS_TIME)
    dt = t / n_steps
    rho = float(params.rho)
    p = jnp.asarray([
        float(spot), float(strike), (float(rate) - float(dividend)) * dt, dt,
        math.sqrt(dt), float(params.kappa), float(params.theta),
        float(params.sigma), rho, math.sqrt(max(1.0 - rho * rho, 0.0)),
        float(params.v0), 0.0,
    ], jnp.float32)
    n_blocks = max(1, math.ceil(n_paths / PATHS_PER_BLOCK))
    pay, pay2 = _launch(jnp.asarray([seed], jnp.int32), p, n_steps=n_steps,
                        n_blocks=n_blocks, cp=float(cp))
    n = n_blocks * PATHS_PER_BLOCK
    mean = pay.sum() / n
    var = jnp.maximum(pay2.sum() / n - mean * mean, 0.0)
    df = math.exp(-float(rate) * t)
    return df * mean, df * jnp.sqrt(var / n), n
