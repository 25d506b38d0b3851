"""Fused Pallas TPU kernel: GBM terminal simulation + payoff/Greek reduction.

This is the TPU-native replacement for the reference's hot loop — the
``(n_options × n_sims × n_steps)`` normals cube materialized at
``monte_carlo_unified.py:329`` and the Numba ``prange`` path loops
(``gbm_numba.py:75``). Design (SURVEY.md §5 "long-context" analog):

  * **No HBM path materialization.** Normals are generated *inside* the
    kernel with the hardware PRNG (`pltpu.prng_random_bits`) and consumed
    immediately; only 4 accumulator tiles of shape (C, 128) ever leave VMEM.
  * **Box–Muller with both branches.** Each uniform pair yields a cos and a
    sin normal; with antithetic ±z that is 4 payoff evaluations per random
    pair — 4× the paths per random bit.
  * **Counter-based determinism.** The PRNG is re-seeded per (seed, block)
    so any path block can be regenerated independently — the property that
    lets the path axis shard freely over ICI.
  * **Greeks in the same pass.** The kernel accumulates, per contract row:
      A  = Σ payoff                (price, stderr)
      B  = Σ payoff²               (stderr)
      M1 = Σ 1{exercise}·S_T       (pathwise delta; rho/theta derived)
      Mz = Σ 1{exercise}·S_T·z     (pathwise vega; LR-PW gamma)
    Host-side closed-form combinations (see :func:`_combine`) then produce
    price, delta, gamma, vega, theta, rho and the standard error — one
    kernel launch for the full Greek ladder, vs the reference's 3+ full
    re-simulations (``monte_carlo_unified.py:633`` delta_gamma_batch).

Layout: contracts live on the sublane axis (padded to 8), path blocks on
the lane axis (LANES per draw). Books smaller than 8 rows are replicated
across rows — replicas process *different* random paths (the PRNG stream
differs per row), so replication adds samples instead of wasting compute;
the host combiner merges replica moments.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import ContractBatch
from ..utils.config import EPS_TIME
from .kernel_rng import hash_uniform

SUBLANES = 8  # f32 sublane tile
TARGET_ROWS = 256  # replicate small books up to this many rows: bigger tiles
                   # amortize per-grid-step overhead (~3x on 1-contract books)
_VMEM_ELEMS_PER_BUF = 256 * 1024  # ~1 MB f32 per live buffer, ~8 live => ~8 MB


def _lanes_for(rows: int) -> int:
    """Lane width per path block: as wide as VMEM allows, 128-aligned."""
    return int(min(2048, max(128, (_VMEM_ELEMS_PER_BUF // rows) // 128 * 128)))


_TWO_PI = 6.283185307179586
_INV_2_24 = 1.0 / (1 << 24)
_INV_2_25 = 1.0 / (1 << 25)

# 30-bit direction numbers for the first two Sobol dimensions (dim 1 = van
# der Corput; dim 2: s=1, a=0, m=[1] with v_k = v_{k-1} ^ (v_{k-1} >> 1)).
_QMC_BITS = 30
_INV_2_30 = 1.0 / (1 << _QMC_BITS)
_V1 = tuple(1 << (_QMC_BITS - 1 - k) for k in range(_QMC_BITS))
_V2_list = [1 << (_QMC_BITS - 1)]
for _k in range(1, _QMC_BITS):
    _V2_list.append(_V2_list[-1] ^ (_V2_list[-1] >> 1))
_V2 = tuple(_V2_list)


def _sobol_pair(idx, scramble1, scramble2):
    """2-D scrambled-Sobol uniforms for integer point indices ``idx``.

    Gray-code XOR of static direction numbers, fully unrolled int32 vector
    ops; ``scramble*`` are seed-derived digital shifts (net-preserving).
    """
    gray = idx ^ (idx >> 1)
    x1 = jnp.zeros_like(idx)
    x2 = jnp.zeros_like(idx)
    for k in range(_QMC_BITS):
        bit = (gray >> k) & 1
        x1 = x1 ^ (bit * _V1[k])
        x2 = x2 ^ (bit * _V2[k])
    x1 = x1 ^ scramble1
    x2 = x2 ^ scramble2
    u1 = x1.astype(jnp.float32) * _INV_2_30 + 0.5 * _INV_2_30
    u2 = x2.astype(jnp.float32) * _INV_2_30 + 0.5 * _INV_2_30
    return u1, u2


def _mix32(h):
    """murmur3-style finalizer (portable logical shifts via mask)."""
    h = h ^ ((h >> 16) & jnp.int32(0x0000FFFF))
    h = h * jnp.int32(-2048144789)  # 0x85ebca6b
    h = h ^ ((h >> 13) & jnp.int32(0x0007FFFF))
    h = h * jnp.int32(-1028477387)  # 0xc2b2ae35
    h = h ^ ((h >> 16) & jnp.int32(0x0000FFFF))
    return h


def _gbm_kernel(seed_ref, s0_ref, k_ref, cp_ref, a_ref, s_ref, rep_ref, cid_ref,
                *refs, lanes: int, sampler: str = "prng", reps: int = 1,
                greeks: bool = True):
    """One grid step = one path block of 4*lanes paths per row.

    ``seed_ref`` is ``[seed, block0]``: ``block0`` offsets the grid index
    into a GLOBAL block id, so a device that owns blocks ``[block0,
    block0+n)`` of a sharded launch reproduces exactly the blocks a
    single-device launch would have computed — the path set is a function
    of (seed, global block) only, independent of topology.

    ``greeks=False`` compiles the Greek moment accumulators (m1, mz) out
    entirely — the literal price-only kernel used by the benchmark to
    prove the ladder is free (same hot loop, two fewer tile reductions).
    """
    if greeks:
        pay_ref, pay2_ref, m1_ref, mz_ref = refs
    else:
        pay_ref, pay2_ref = refs
    # RNG streams index by GLOBAL block id; accumulator init fires on the
    # first LOCAL grid step of this launch (each device zeroes its own tiles)
    block = pl.program_id(0) + seed_ref[1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in refs:
            ref[:, :] = jnp.zeros_like(ref)

    rows = s0_ref.shape[0]
    if sampler == "sobol":
        # Low-discrepancy with per-CONTRACT randomization: replicas of one
        # contract consume DISJOINT chunks of a single 2-D net (their merged
        # moments jointly cover it), while different contracts see the SAME
        # net under different seed-derived digital scrambles — every
        # contract in a book gets full-net QMC accuracy (digital shifts
        # preserve the (t,m,s)-net structure).
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
        mask30 = jnp.int32((1 << _QMC_BITS) - 1)
        if reps % 8 == 0:
            # 8 independently-scrambled replicates per contract (replica
            # group = rep mod 8, each group a dense stream under its own
            # group+contract-salted scramble) — the host quotes the
            # randomized-QMC replication stderr from the per-row sums
            # (see exotic_pallas._mean_stderr)
            g_id = rep_ref[:, :] & 7
            idx = (block * ((reps // 8) * lanes)
                   + (rep_ref[:, :] >> 3) * lanes + col_ids + 1)
            h = _mix32((cid_ref[:, :] + g_id * jnp.int32(0x3C6EF372))
                       ^ (seed_ref[0] * jnp.int32(-1640531535)))
        else:
            idx = block * (reps * lanes) + rep_ref[:, :] * lanes \
                + col_ids + 1
            h = _mix32(cid_ref[:, :] ^ (seed_ref[0]
                                        * jnp.int32(-1640531535)))
        s1 = h & mask30
        s2 = _mix32(h + jnp.int32(0x632BE5AB)) & mask30
        u1, u2 = _sobol_pair(idx, s1, s2)
    elif sampler == "hash":
        # counter-based murmur3 stream: pure int32 ops, bit-identical on
        # Mosaic and the CPU interpreter (cross-platform determinism)
        rid = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
        lane_id = rid * lanes + col
        base = block * (2 * rows * lanes)
        u1 = hash_uniform(base + lane_id, seed_ref[0])
        u2 = hash_uniform(base + rows * lanes + lane_id, seed_ref[0])
    else:
        # independent, reproducible stream per (seed, block)
        pltpu.prng_seed(seed_ref[0] + block * jnp.int32(-1640531535))  # Knuth 2654435761 as i32
        # random bits arrive as int32; (x >> 8) & 0xFFFFFF equals the logical
        # shift's low 24 bits, and int32→f32 is a supported Mosaic cast
        # (uint32→f32 is not).
        mask24 = jnp.int32(0x00FFFFFF)
        u1_bits = (pltpu.prng_random_bits((rows, lanes)) >> 8) & mask24
        u2_bits = (pltpu.prng_random_bits((rows, lanes)) >> 8) & mask24
        # uniforms strictly inside (0,1): 24 bits + half-ulp offset
        u1 = u1_bits.astype(jnp.float32) * _INV_2_24 + _INV_2_25
        u2 = u2_bits.astype(jnp.float32) * _INV_2_24 + _INV_2_25
    radius = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = _TWO_PI * u2
    z_cos = radius * jnp.cos(theta)
    z_sin = radius * jnp.sin(theta)

    s0 = s0_ref[:, :]  # (rows, 1)
    k = k_ref[:, :]
    cp = cp_ref[:, :]
    a = a_ref[:, :]  # (r - q - σ²/2)·T
    s = s_ref[:, :]  # σ·√T

    acc_pay = jnp.zeros((rows, lanes), jnp.float32)
    acc_pay2 = jnp.zeros((rows, lanes), jnp.float32)
    acc_m1 = jnp.zeros((rows, lanes), jnp.float32)
    acc_mz = jnp.zeros((rows, lanes), jnp.float32)
    base = s0 * jnp.exp(a)  # S0·e^{drift}, one exp for all four branches
    # antithetic shares the exponential: e^{-s·z} = 1/e^{s·z}
    grow_cos = jnp.exp(s * z_cos)
    grow_sin = jnp.exp(s * z_sin)
    branches = (
        (z_cos, base * grow_cos),
        (-z_cos, base / grow_cos),
        (z_sin, base * grow_sin),
        (-z_sin, base / grow_sin),
    )
    for z, st in branches:
        x = cp * (st - k)
        pay = jnp.maximum(x, 0.0)
        acc_pay += pay
        acc_pay2 += pay * pay
        if greeks:
            ind_st = jnp.where(x > 0, st, 0.0)
            acc_m1 += ind_st
            acc_mz += ind_st * z

    # lane-chunk reduction into the (rows, 128) accumulators
    for off in range(0, lanes, 128):
        pay_ref[:, :] += acc_pay[:, off:off + 128]
        pay2_ref[:, :] += acc_pay2[:, off:off + 128]
        if greeks:
            m1_ref[:, :] += acc_m1[:, off:off + 128]
            mz_ref[:, :] += acc_mz[:, off:off + 128]


@functools.partial(jax.jit, static_argnames=("n_blocks", "rows", "lanes", "interpret",
                                              "sampler", "reps", "greeks"))
def _launch(seed, s0, k, cp, a, s, rep_id, cid, *, n_blocks: int, rows: int,
            lanes: int, interpret: bool = False, sampler: str = "prng",
            reps: int = 1, greeks: bool = True):
    n_out = 4 if greeks else 2
    out_shape = [jax.ShapeDtypeStruct((rows, 128), jnp.float32)] * n_out
    acc_spec = pl.BlockSpec((rows, 128), lambda b: (0, 0), memory_space=pltpu.VMEM)
    param_spec = pl.BlockSpec((rows, 1), lambda b: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_gbm_kernel, lanes=lanes, sampler=sampler, reps=reps,
                          greeks=greeks),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # [seed, block0] (2,) int32
            param_spec, param_spec, param_spec, param_spec, param_spec,
            param_spec, param_spec,  # replica index / contract id (int32)
        ],
        out_specs=[acc_spec] * n_out,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=n_blocks * rows * lanes * 4 * 12,
            bytes_accessed=rows * (7 * 4 + 4 * 128 * 4),
            transcendentals=n_blocks * rows * lanes * 7,
        ),
        interpret=interpret,
    )(seed, s0, k, cp, a, s, rep_id, cid)


def _prepare(batch: ContractBatch):
    """Flatten + pad/replicate the book onto SUBLANES-aligned rows."""
    b = batch.broadcast()
    c = max(b.size, 1)
    flat = jax.tree.map(lambda x: jnp.broadcast_to(x, b.shape).reshape(-1).astype(jnp.float32), b)
    reps = max(1, TARGET_ROWS // c)  # replicate small books into big tiles
    rows = ((c * reps + SUBLANES - 1) // SUBLANES) * SUBLANES
    pad = rows - c * reps

    def expand(x):
        tiled = jnp.tile(x, reps)
        return jnp.pad(tiled, (0, pad), mode="edge").reshape(rows, 1)

    s0 = expand(flat.spot)
    k = expand(flat.strike)
    cp = expand(flat.cp)
    t = jnp.maximum(flat.maturity, EPS_TIME)
    a = expand((flat.rate - flat.dividend - 0.5 * flat.vol**2) * flat.maturity)
    s = expand(flat.vol * jnp.sqrt(t))
    # row i = rep*c + j holds replica `rep` of contract j (edge-padded tail
    # rows are discarded by _combine): QMC net/scramble assignment
    row = jnp.arange(rows, dtype=jnp.int32)
    rep_id = jnp.minimum(row // c, reps - 1).reshape(rows, 1)
    cid = (row % c).reshape(rows, 1)
    return b, flat, (s0, k, cp, a, s, rep_id, cid), c, reps, rows, pad


def _combine(b, flat, outs, c, reps, n_per_row, dtype,
             sampler: str = "prng"):
    """Row moments → price/Greeks/stderr per original contract. Under
    the replicated-scramble QMC layout (sobol, reps % 8 == 0) the stderr
    is the randomized replication estimate over the 8 per-contract
    replica groups — sqrt(Var/n) is unreliable under QMC (see
    ops/exotic_pallas._mean_stderr)."""
    pay_rows = outs[0].sum(axis=1)
    pay, pay2, m1, mz = [o.sum(axis=1) for o in outs]  # (rows,)

    def merge(v):
        # rows [i, i+c, i+2c, ...] are replicas of contract i
        return v[: c * reps].reshape(reps, c).sum(axis=0)

    n = jnp.asarray(n_per_row * reps, jnp.float32)
    pay, pay2, m1, mz = merge(pay), merge(pay2), merge(m1), merge(mz)
    rep_se = None
    if sampler == "sobol" and reps % 8 == 0:
        grp = pay_rows[: c * reps].reshape(reps // 8, 8, c).sum(axis=0)             * (8.0 / n)                               # (8, c) group means
        rep_se = grp.std(axis=0, ddof=1) / jnp.sqrt(8.0)

    t = jnp.maximum(flat.maturity, EPS_TIME)
    sqrt_t = jnp.sqrt(t)
    sig_sqrt_t = jnp.maximum(flat.vol * sqrt_t, 1e-12)
    df = jnp.exp(-flat.rate * flat.maturity)
    mean_pay = pay / n
    mean_m1 = m1 / n
    mean_mz = mz / n

    price = df * mean_pay
    var = jnp.maximum(pay2 / n - mean_pay**2, 0.0)
    stderr = df * (rep_se if rep_se is not None else jnp.sqrt(var / n))
    delta = df * flat.cp * mean_m1 / flat.spot
    vega = df * flat.cp * (mean_mz * sqrt_t - flat.vol * t * mean_m1)
    gamma = df * flat.cp * (mean_mz / sig_sqrt_t - mean_m1) / flat.spot**2
    # identities on the same moments (no extra accumulator needed):
    # price = S·delta - K·cp·df·E[1{}]  =>  dual_delta = (price - S·delta)/K
    dual_delta = (price - flat.spot * delta) / flat.strike
    dividend_rho = -t * flat.spot * delta
    rho = t * (df * flat.cp * mean_m1 - price)
    theta = -(
        -flat.rate * price
        + df * flat.cp * (
            (flat.rate - flat.dividend - 0.5 * flat.vol**2) * mean_m1
            + flat.vol / (2.0 * sqrt_t) * mean_mz
        )
    )

    expired = flat.maturity <= EPS_TIME
    intrinsic = jnp.maximum(flat.cp * (flat.spot - flat.strike), 0.0)
    out = {
        "price": jnp.where(expired, intrinsic, price),
        "std_error": jnp.where(expired, 0.0, stderr),
        "delta": delta,
        "gamma": gamma,
        "vega": vega,
        "rho": rho,
        "theta": theta,
        "dual_delta": dual_delta,
        "dividend_rho": dividend_rho,
    }
    return {kk: v.reshape(b.shape).astype(dtype) for kk, v in out.items()}


@functools.partial(jax.jit, static_argnames=("n_paths", "sampler"))
def _full_pipeline(batch: ContractBatch, seed, n_paths: int,
                   sampler: str = "prng") -> dict:
    """prepare → kernel → combine, traced as ONE program so a call costs a
    single dispatch (the tunnel-latency lesson: eager host ops dominate
    otherwise)."""
    b, flat, params, c, reps, rows, _pad = _prepare(batch)
    lanes = _lanes_for(rows)
    paths_per_row_block = 4 * lanes  # cos/sin × (±antithetic)
    n_blocks = max(1, math.ceil(n_paths / (paths_per_row_block * reps)))
    seed_arr = jnp.stack([jnp.asarray(seed, jnp.int32),
                          jnp.zeros((), jnp.int32)])
    # off-TPU (unit tests): run under the TPU-semantics interpreter, which
    # implements the pltpu PRNG primitives (plain interpret=True does not)
    interpret = False if jax.default_backend() == "tpu" else pltpu.InterpretParams()
    outs = _launch(seed_arr, *params, n_blocks=n_blocks, rows=rows, lanes=lanes,
                   interpret=interpret, sampler=sampler, reps=reps)
    return _combine(b, flat, outs, c, reps, n_blocks * paths_per_row_block,
                    batch.dtype, sampler=sampler)


@functools.partial(jax.jit, static_argnames=("n_paths", "sampler"))
def _price_only_pipeline(batch: ContractBatch, seed, n_paths: int,
                         sampler: str = "prng"):
    """Same hot loop as ``_full_pipeline`` with the Greek moment
    accumulators compiled OUT (``greeks=False``) — the benchmark's
    price-only sibling that makes the vs-CPU-baseline multiple an
    apples-to-apples (price vs price) comparison."""
    b, flat, params, c, reps, rows, _pad = _prepare(batch)
    lanes = _lanes_for(rows)
    paths_per_row_block = 4 * lanes
    n_blocks = max(1, math.ceil(n_paths / (paths_per_row_block * reps)))
    seed_arr = jnp.stack([jnp.asarray(seed, jnp.int32),
                          jnp.zeros((), jnp.int32)])
    interpret = False if jax.default_backend() == "tpu" else pltpu.InterpretParams()
    pay, pay2 = _launch(seed_arr, *params, n_blocks=n_blocks, rows=rows,
                        lanes=lanes, interpret=interpret, sampler=sampler,
                        reps=reps, greeks=False)

    def merge(v):
        return v[: c * reps].reshape(reps, c).sum(axis=0)

    n = jnp.asarray(n_blocks * paths_per_row_block * reps, jnp.float32)
    pay_rows = pay.sum(axis=1)
    pay_c, pay2_c = merge(pay_rows), merge(pay2.sum(axis=1))
    df = jnp.exp(-flat.rate * flat.maturity)
    mean = pay_c / n
    var = jnp.maximum(pay2_c / n - mean * mean, 0.0)
    if sampler == "sobol" and reps % 8 == 0:  # replication stderr
        grp = pay_rows[: c * reps].reshape(reps // 8, 8, c).sum(axis=0)             * (8.0 / n)
        stderr = df * grp.std(axis=0, ddof=1) / jnp.sqrt(8.0)
    else:
        stderr = df * jnp.sqrt(var / n)
    price = df * mean
    expired = flat.maturity <= EPS_TIME
    intrinsic = jnp.maximum(flat.cp * (flat.spot - flat.strike), 0.0)
    price = jnp.where(expired, intrinsic, price)
    stderr = jnp.where(expired, 0.0, stderr)
    return (price.reshape(b.shape).astype(batch.dtype),
            stderr.reshape(b.shape).astype(batch.dtype))


def pallas_mc_price_only(batch: ContractBatch, n_paths: int = 1_000_000,
                         seed: int = 0, sampler: str = "prng"):
    """(price, stderr) with the Greek accumulators compiled out — the
    literal price-only rate for roofline/baseline comparisons. Same path
    set as :func:`pallas_mc_price_greeks` (identical RNG streams), so
    prices agree to f32 reduction order."""
    return _price_only_pipeline(batch, jnp.asarray(seed, jnp.int32), n_paths,
                                sampler)


def pallas_mc_price_greeks(batch: ContractBatch, n_paths: int = 1_000_000, seed: int = 0,
                           sampler: str = "prng") -> dict:
    """Price + stderr + full first/second-order Greek ladder, one kernel pass.

    ``sampler="sobol"`` uses the in-kernel scrambled low-discrepancy
    sequence: ~40-90x lower error per path. Replicas of one contract
    jointly consume a single net, and every contract in a multi-contract
    book sees the SAME full net under its own digital scramble — book
    pricing keeps per-contract QMC accuracy (reference QMC anchor:
    ``src/simulation/gbm_qmc.py:14``, which is single-asset only).

    ``n_paths`` is the *per-contract* path budget; it is rounded up to a
    whole number of path blocks (the actual count is what stderr reflects).
    Returns a dict with price/std_error/delta/gamma/vega/rho/theta arrays
    shaped like the broadcast batch.
    """
    return _full_pipeline(batch, jnp.asarray(seed, jnp.int32), n_paths, sampler)


def pallas_paths_per_launch(batch: ContractBatch, n_paths: int) -> int:
    """Actual number of simulated paths per contract for a given request."""
    b = batch.broadcast()
    c = max(b.size, 1)
    reps = max(1, TARGET_ROWS // c)
    rows = ((c * reps + SUBLANES - 1) // SUBLANES) * SUBLANES
    per_block = 4 * _lanes_for(rows)
    n_blocks = max(1, math.ceil(n_paths / (per_block * reps)))
    return n_blocks * per_block * reps


# ---------------------------------------------------------------------------
# custom_vjp: make jax.grad compose with the fused kernel
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def pallas_mc_price(batch: ContractBatch, n_paths: int = 1_000_000, seed: int = 0,
                    sampler: str = "prng"):
    """Differentiable price through the fused kernel.

    ``jax.grad`` of this function returns the kernel's own pathwise/LR
    Greeks (computed in the SAME forward pass — the backward pass is free):
    d/dspot = delta, d/dstrike = dual_delta, d/dmaturity = -theta,
    d/drate = rho, d/dvol = vega, d/ddividend = dividend_rho. ``cp`` is
    treated as non-differentiable (zero cotangent).
    """
    return _full_pipeline(batch, jnp.asarray(seed, jnp.int32), n_paths, sampler)["price"]


def _pallas_mc_price_fwd(batch, n_paths, seed, sampler):
    out = _full_pipeline(batch, jnp.asarray(seed, jnp.int32), n_paths, sampler)
    return out["price"], (out, batch)


def _pallas_mc_price_bwd(n_paths, seed, sampler, res, g):
    out, batch = res
    b = batch.broadcast()

    def fit(grad, field):
        # cotangent in the broadcast shape, then summed back over the
        # dimensions that were broadcast relative to the primal field
        # (standard broadcast-VJP semantics: a scalar strike shared across
        # a book receives the SUM of per-contract sensitivities)
        full = jnp.broadcast_to(grad * g, b.shape)
        shp = jnp.shape(field)
        extra = full.ndim - len(shp)
        if extra:
            full = full.sum(axis=tuple(range(extra)))
        axes = tuple(i for i, s in enumerate(shp) if s == 1 and full.shape[i] != 1)
        if axes:
            full = full.sum(axis=axes, keepdims=True)
        return full.reshape(shp).astype(jnp.result_type(field))

    tangent = ContractBatch(
        spot=fit(out["delta"], batch.spot),
        strike=fit(out["dual_delta"], batch.strike),
        maturity=fit(-out["theta"], batch.maturity),
        rate=fit(out["rho"], batch.rate),
        vol=fit(out["vega"], batch.vol),
        dividend=fit(out["dividend_rho"], batch.dividend),
        cp=jnp.zeros(jnp.shape(batch.cp), jnp.result_type(batch.cp)),
    )
    return (tangent,)


pallas_mc_price.defvjp(_pallas_mc_price_fwd, _pallas_mc_price_bwd)
