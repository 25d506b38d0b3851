"""Fused Pallas kernel for path-dependent (exotic) payoffs.

Extends the terminal-GBM kernel (``gbm_pallas.py``) with an IN-KERNEL time
loop: each grid step simulates a block of paths through ALL time steps,
carrying running statistics (sum / log-sum / min / max / barrier-crossed)
in VMEM registers — the payoff is computed from the statistics inside the
kernel and only (Σ payoff, Σ payoff²) accumulators ever leave the chip.

This is the speed-of-light version of the ``lax.scan`` exotic engine
(``models/exotics.py``): no per-step HBM traffic at all, hardware PRNG,
and the Box–Muller cos/sin × (±antithetic) trick giving four path states
per random draw. The scan engine remains the reference implementation and
the AD path; tests cross-check the two statistically.

Supported payoff kinds (static): asian_arith / asian_geo (call/put),
lookback_float / lookback_fixed (call/put), barrier up/down × in/out
(call/put, discrete monitoring at every step).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.config import EPS_TIME
from ..utils.exceptions import ValidationError

ROWS = 128  # path-block sublanes
LANES = 512  # path-block lanes
_TWO_PI = 6.283185307179586
_INV_2_24 = 1.0 / (1 << 24)
_INV_2_25 = 1.0 / (1 << 25)

PAYOFF_KINDS = (
    "asian_arith", "asian_geo", "lookback_float", "lookback_fixed",
    "barrier_up-and-out", "barrier_up-and-in", "barrier_down-and-out",
    "barrier_down-and-in",
)


def _normals(shape):
    mask24 = jnp.int32(0x00FFFFFF)
    u1 = ((pltpu.prng_random_bits(shape) >> 8) & mask24).astype(jnp.float32) * _INV_2_24 + _INV_2_25
    u2 = ((pltpu.prng_random_bits(shape) >> 8) & mask24).astype(jnp.float32) * _INV_2_24 + _INV_2_25
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    th = _TWO_PI * u2
    return r * jnp.cos(th), r * jnp.sin(th)


def _exotic_kernel(seed_ref, param_ref, pay_ref, pay2_ref, *, kind: str,
                   n_steps: int, cp: float):
    """param_ref (SMEM, float32[8]): S0, K, drift_dt, vol_sqrt_dt, barrier,
    inv_n_steps, unused, unused."""
    block = pl.program_id(0)

    @pl.when(block == 0)
    def _init():
        pay_ref[:, :] = jnp.zeros_like(pay_ref)
        pay2_ref[:, :] = jnp.zeros_like(pay2_ref)

    pltpu.prng_seed(seed_ref[0] + block * jnp.int32(-1640531535))

    s0 = param_ref[0]
    strike = param_ref[1]
    drift_dt = param_ref[2]
    vol_sqrt_dt = param_ref[3]
    barrier = param_ref[4]
    inv_n = param_ref[5]

    shape = (ROWS, LANES)
    barrier_up = "up" in kind
    knock_in = kind.endswith("in")
    geo = kind.startswith("asian_geo")  # carried in log space (no per-step exp)

    def init_stat(s_like):
        if kind.startswith("asian_arith"):
            return s_like  # running sum of S, seeded with S0 (removed in payoff)
        if geo:
            return jnp.zeros(shape, jnp.float32)
        if kind.startswith("lookback"):
            return s_like  # running extremum seeded at S0
        hit0 = (s_like >= barrier) if barrier_up else (s_like <= barrier)
        return hit0.astype(jnp.float32)

    def update_stat(stat, s_or_log):
        if kind.startswith("asian_arith"):
            return stat + s_or_log
        if geo:
            return stat + s_or_log  # log-spot
        if kind.startswith("lookback"):
            if cp > 0 and kind == "lookback_float":
                return jnp.minimum(stat, s_or_log)  # float call pays S_T - min
            if cp < 0 and kind == "lookback_float":
                return jnp.maximum(stat, s_or_log)
            if cp > 0:
                return jnp.maximum(stat, s_or_log)  # fixed call pays max - K
            return jnp.minimum(stat, s_or_log)
        hit = (s_or_log >= barrier) if barrier_up else (s_or_log <= barrier)
        return jnp.maximum(stat, hit.astype(jnp.float32))

    def payoff(stat, s_or_log):
        s_t = jnp.exp(s_or_log) if geo else s_or_log
        if kind.startswith("asian"):
            if kind.startswith("asian_arith"):
                avg = (stat - s0) * inv_n
            else:
                avg = jnp.exp(stat * inv_n)
            return jnp.maximum(cp * (avg - strike), 0.0)
        if kind == "lookback_float":
            return (s_t - stat) if cp > 0 else (stat - s_t)
        if kind == "lookback_fixed":
            return jnp.maximum(cp * (stat - strike), 0.0)
        vanilla = jnp.maximum(cp * (s_t - strike), 0.0)
        return vanilla * (stat if knock_in else (1.0 - stat))

    if geo:
        state0 = jnp.full(shape, jnp.log(s0), jnp.float32)
    else:
        state0 = jnp.full(shape, s0, jnp.float32)
    states = (state0, state0, state0, state0)
    stats = tuple(init_stat(state0) for _ in range(4))
    # series exp: drift_dt ~ 1e-4, and the TPU fast exp's absolute error
    # near 1 would otherwise compound across all n_steps multiplications
    gd = drift_dt
    growth = 1.0 + gd * (1.0 + gd * (0.5 + gd / 6.0))

    def body(i, carry):
        (xa, xb, xc, xd), (sa, sb, sc, sd) = carry
        z1, z2 = _normals(shape)
        if geo:
            xa = xa + drift_dt + vol_sqrt_dt * z1
            xb = xb + drift_dt - vol_sqrt_dt * z1
            xc = xc + drift_dt + vol_sqrt_dt * z2
            xd = xd + drift_dt - vol_sqrt_dt * z2
        else:
            # antithetic shares the exponential: e^{-s·z} = 1/e^{s·z}
            w1 = jnp.exp(vol_sqrt_dt * z1)
            w2 = jnp.exp(vol_sqrt_dt * z2)
            xa = xa * (growth * w1)
            xb = xb * growth / w1
            xc = xc * (growth * w2)
            xd = xd * growth / w2
        sa = update_stat(sa, xa)
        sb = update_stat(sb, xb)
        sc = update_stat(sc, xc)
        sd = update_stat(sd, xd)
        return (xa, xb, xc, xd), (sa, sb, sc, sd)

    states, stats = jax.lax.fori_loop(0, n_steps, body, (states, stats))

    acc = jnp.zeros(shape, jnp.float32)
    acc2 = jnp.zeros(shape, jnp.float32)
    for x, st in zip(states, stats):
        p = payoff(st, x)
        acc += p
        acc2 += p * p
    for off in range(0, LANES, 128):
        pay_ref[:, :] += acc[:, off:off + 128]
        pay2_ref[:, :] += acc2[:, off:off + 128]


@functools.partial(jax.jit, static_argnames=("kind", "n_steps", "n_blocks", "cp"))
def _launch(seed, params, *, kind: str, n_steps: int, n_blocks: int, cp: float):
    acc_spec = pl.BlockSpec((ROWS, 128), lambda b: (0, 0), memory_space=pltpu.VMEM)
    interpret = False if jax.default_backend() == "tpu" else pltpu.InterpretParams()
    return pl.pallas_call(
        functools.partial(_exotic_kernel, kind=kind, n_steps=n_steps, cp=cp),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[acc_spec, acc_spec],
        out_shape=[jax.ShapeDtypeStruct((ROWS, 128), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=n_blocks * n_steps * ROWS * LANES * 4 * 8,
            bytes_accessed=2 * ROWS * 128 * 4,
            transcendentals=n_blocks * n_steps * ROWS * LANES * 8,
        ),
        interpret=interpret,
    )(seed, params)


PATHS_PER_BLOCK = 4 * ROWS * LANES


def pallas_exotic_price(kind: str, spot, strike, maturity, rate, vol,
                        cp: float = 1.0, dividend: float = 0.0,
                        barrier: float = 0.0, n_paths: int = 1_000_000,
                        n_steps: int = 64, seed: int = 0):
    """Fused exotic pricing: (price, stderr, actual_paths).

    ``kind`` ∈ PAYOFF_KINDS. Whole simulation is one kernel launch; path
    count rounds up to whole blocks of {PATHS_PER_BLOCK}.
    """
    if kind not in PAYOFF_KINDS:
        raise ValidationError(f"unknown exotic kind {kind!r}; choose {PAYOFF_KINDS}")
    t = max(float(maturity), EPS_TIME)
    dt = t / n_steps
    params = jnp.asarray([
        float(spot), float(strike),
        (float(rate) - float(dividend) - 0.5 * float(vol) ** 2) * dt,
        float(vol) * math.sqrt(dt),
        float(barrier), 1.0 / n_steps, 0.0, 0.0,
    ], jnp.float32)
    n_blocks = max(1, math.ceil(n_paths / PATHS_PER_BLOCK))
    pay, pay2 = _launch(jnp.asarray([seed], jnp.int32), params, kind=kind,
                        n_steps=n_steps, n_blocks=n_blocks, cp=float(cp))
    n = n_blocks * PATHS_PER_BLOCK
    total = pay.sum()
    total2 = pay2.sum()
    mean = total / n
    var = jnp.maximum(total2 / n - mean * mean, 0.0)
    df = math.exp(-float(rate) * t)
    price = df * mean
    stderr = df * jnp.sqrt(var / n)
    return price, stderr, n
