"""Fused Pallas kernel for multi-asset (correlated GBM) exotics.

BEYOND the reference (single-asset throughout ``src/pricing_models``):
the kernel simulates d ∈ {2..4} correlated assets entirely in VMEM
registers — per step it draws d independent normals per path, correlates
them through an UNROLLED Cholesky combination (the L factors live in SMEM;
for d ≤ 4 that is ≤ 10 fused multiply-adds, far cheaper than an MXU
dispatch at these shapes), advances the d log-spots, and updates the
payoff statistic. Only the payoff moment tiles ever leave the chip —
the XLA scan engine (``models/multi_asset.py``) moves the O(d × paths)
carry through HBM every step; here it never leaves registers.

Payoff kinds (static): basket (arithmetic Σ wᵢSᵢ(T)), basket_geo
(ΠSᵢ^wᵢ — exact lognormal oracle), rainbow_best / rainbow_worst
(max/min Sᵢ(T)), spread (S₁−S₂−K, Margrabe-exact at K=0), basket_asian
(arithmetic Asian on the running basket level).

Antithetic branches: per step each asset draws one Box–Muller pair
(z_cos, z_sin); branch A uses +z_cos, B −z_cos, C +z_sin, D −z_sin —
four correlated path systems per random draw, same scheme as the
single-asset kernels. ``seed_ref = [seed, block0]`` global-block
ownership makes the path set topology-invariant (shardable with
``parallel/sharded_pallas``'s machinery).

Samplers: ``prng`` (hardware) / ``hash`` (counter-based murmur3,
CPU-verifiable). Scan-engine parity and the geometric-basket / Margrabe
closed forms are the test oracles.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.config import EPS_TIME
from ..utils.exceptions import ValidationError
from .exotic_pallas import _mean_stderr
from .kernel_rng import draw_normals

ROWS = 128
LANES = 256  # 4 branches × d ≤ 4 assets of (128, LANES) carries in VMEM
PATHS_PER_BLOCK = 4 * ROWS * LANES

KINDS = ("basket", "basket_geo", "rainbow_best", "rainbow_worst", "spread",
         "basket_asian")


def _ma_kernel(seed_ref, p_ref, *refs, d: int, kind: str,
               n_steps: int, cp: float, sampler: str, lr: bool = False):
    """p_ref layout (SMEM f32): per asset i<d: [s0_i, drift_dt_i,
    sig_sqrt_dt_i, w_i], then the d·d row-major Cholesky factor L, then
    [strike], then (lr only) the d·d row-major L⁻¹.

    ``lr=True`` additionally reduces per-asset likelihood-ratio delta
    moments Σ pay·score_i with score_i = Σ_j (L⁻¹)_{ji}·ζ₁_j (the
    first-step iid normals back-rotated through the correlation) — the
    payoff-agnostic per-asset hedge delta in the same pass.
    """
    if lr:
        pay_ref, pay2_ref = refs[0], refs[1]
        del_refs = refs[2:2 + d]
    else:
        pay_ref, pay2_ref = refs
    block = pl.program_id(0) + seed_ref[1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in refs:
            ref[:, :] = jnp.zeros_like(ref)

    if sampler != "hash":
        pltpu.prng_seed(seed_ref[0] + block * jnp.int32(-1640531535))
    seed = seed_ref[0]

    s0 = [p_ref[4 * i + 0] for i in range(d)]
    drift = [p_ref[4 * i + 1] for i in range(d)]
    sig = [p_ref[4 * i + 2] for i in range(d)]
    w = [p_ref[4 * i + 3] for i in range(d)]
    L = [[p_ref[4 * d + i * d + j] for j in range(d)] for i in range(d)]
    strike = p_ref[4 * d + d * d]
    if lr:
        base_inv = 4 * d + d * d + 1
        Linv = [[p_ref[base_inv + i * d + j] for j in range(d)]
                for i in range(d)]

    shape = (ROWS, LANES)
    # 4 antithetic branches × d assets of log-spot offsets (start at 0;
    # payoff multiplies by s0 — keeps the adds drift-centered)
    zero = jnp.zeros(shape, jnp.float32)
    xs = [[zero for _ in range(d)] for _ in range(4)]
    asian = [zero, zero, zero, zero] if kind == "basket_asian" else None
    # first-step iid normals per stream (cos, sin), for the LR scores
    z1st = ([zero] * d, [zero] * d) if lr else None

    def basket_level(x_b):
        lvl = w[0] * s0[0] * jnp.exp(x_b[0])
        for i in range(1, d):
            lvl = lvl + w[i] * s0[i] * jnp.exp(x_b[i])
        return lvl

    def body(step, carry):
        xs, asian, z1st = carry
        # one Box–Muller pair per asset: stream 1 (cos) feeds branches
        # A(+)/B(−), stream 2 (sin) feeds C(+)/D(−)
        zc, zs = [], []
        for i in range(d):
            c, s = draw_normals(sampler, seed, block, step * d + i,
                                n_steps * d, shape)
            zc.append(c)
            zs.append(s)
        if lr:
            first = step == 0
            z1st = ([jnp.where(first, z, old)
                     for z, old in zip(zc, z1st[0])],
                    [jnp.where(first, z, old)
                     for z, old in zip(zs, z1st[1])])
        new_xs = []
        for b, (zz, sgn) in enumerate(((zc, 1.0), (zc, -1.0),
                                       (zs, 1.0), (zs, -1.0))):
            x_b = xs[b]
            nx = []
            for i in range(d):
                # unrolled Cholesky row: wᵢ = Σ_j L[i][j]·z_j
                shock = L[i][0] * zz[0]
                for j in range(1, i + 1):
                    shock = shock + L[i][j] * zz[j]
                nx.append(x_b[i] + drift[i] + sig[i] * sgn * shock)
            new_xs.append(nx)
        if kind == "basket_asian":
            asian = [a + basket_level(x_b) for a, x_b in zip(asian, new_xs)]
        return new_xs, asian, z1st

    xs, asian, z1st = jax.lax.fori_loop(0, n_steps, body, (xs, asian, z1st))

    acc = jnp.zeros(shape, jnp.float32)
    acc2 = jnp.zeros(shape, jnp.float32)
    acc_del = [jnp.zeros(shape, jnp.float32) for _ in range(d)] if lr else []
    for b in range(4):
        x_b = xs[b]
        if kind == "basket":
            lvl = basket_level(x_b)
            pay = jnp.maximum(cp * (lvl - strike), 0.0)
        elif kind == "basket_geo":
            lg = w[0] * (jnp.log(s0[0]) + x_b[0])
            for i in range(1, d):
                lg = lg + w[i] * (jnp.log(s0[i]) + x_b[i])
            pay = jnp.maximum(cp * (jnp.exp(lg) - strike), 0.0)
        elif kind in ("rainbow_best", "rainbow_worst"):
            lvl = s0[0] * jnp.exp(x_b[0])
            for i in range(1, d):
                si = s0[i] * jnp.exp(x_b[i])
                lvl = (jnp.maximum(lvl, si) if kind == "rainbow_best"
                       else jnp.minimum(lvl, si))
            pay = jnp.maximum(cp * (lvl - strike), 0.0)
        elif kind == "spread":
            lvl = s0[0] * jnp.exp(x_b[0]) - s0[1] * jnp.exp(x_b[1])
            pay = jnp.maximum(cp * (lvl - strike), 0.0)
        else:  # basket_asian
            avg = asian[b] * (1.0 / n_steps)
            pay = jnp.maximum(cp * (avg - strike), 0.0)
        acc += pay
        acc2 += pay * pay
        if lr:
            # branch b's first-step iid normals: sign · stream
            sgn = (1.0, -1.0, 1.0, -1.0)[b]
            zeta = z1st[0] if b < 2 else z1st[1]
            for i in range(d):
                score = Linv[0][i] * zeta[0]  # score = L^{-T} ζ₁
                for j in range(1, d):
                    score = score + Linv[j][i] * zeta[j]
                acc_del[i] += pay * (sgn * score)
    for off in range(0, LANES, 128):
        pay_ref[:, :] += acc[:, off:off + 128]
        pay2_ref[:, :] += acc2[:, off:off + 128]
        if lr:
            for ref, a in zip(del_refs, acc_del):
                ref[:, :] += a[:, off:off + 128]


@functools.partial(jax.jit, static_argnames=("d", "kind", "n_steps",
                                             "n_blocks", "cp", "sampler",
                                             "lr"))
def _launch(seed, params, *, d: int, kind: str, n_steps: int, n_blocks: int,
            cp: float, sampler: str = "prng", lr: bool = False):
    n_out = 2 + (d if lr else 0)
    acc_spec = pl.BlockSpec((ROWS, 128), lambda b: (0, 0),
                            memory_space=pltpu.VMEM)
    interpret = (False if jax.default_backend() == "tpu"
                 else pltpu.InterpretParams())
    return pl.pallas_call(
        functools.partial(_ma_kernel, d=d, kind=kind, n_steps=n_steps,
                          cp=cp, sampler=sampler, lr=lr),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[acc_spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((ROWS, 128), jnp.float32)] * n_out,
        cost_estimate=pl.CostEstimate(
            flops=n_blocks * n_steps * ROWS * LANES * 4 * d * 10,
            bytes_accessed=2 * ROWS * 128 * 4,
            transcendentals=n_blocks * n_steps * ROWS * LANES * 4 * d,
        ),
        interpret=interpret,
    )(seed, params)


def _params_vec(spots, weights, strike, maturity, rate, vols, corr,
                dividends, n_steps, lr: bool = False):
    spots = np.asarray(spots, np.float64).ravel()
    vols = np.asarray(vols, np.float64).ravel()
    d = spots.size
    if not 2 <= d <= 4:
        raise ValidationError(f"kernel supports 2..4 assets, got {d}")
    if vols.size != d:
        raise ValidationError("vols must match spots length")
    weights = (np.asarray(weights, np.float64).ravel() if weights is not None
               else np.full(d, 1.0 / d))
    if weights.size != d:
        raise ValidationError(f"weights must have {d} entries, got "
                              f"{weights.size}")
    divs = np.broadcast_to(np.asarray(dividends, np.float64), (d,))
    c = np.asarray(corr, np.float64)
    if c.shape != (d, d):
        raise ValidationError(f"corr must be ({d},{d}), got {c.shape}")
    L = np.linalg.cholesky(c + 1e-9 * np.eye(d))
    t = max(float(maturity), EPS_TIME)
    dt = t / n_steps
    p = []
    for i in range(d):
        p += [spots[i], (float(rate) - divs[i] - 0.5 * vols[i] ** 2) * dt,
              vols[i] * math.sqrt(dt), weights[i]]
    p += list(L.ravel())
    p += [float(strike)]
    if lr:
        p += list(np.linalg.inv(L).ravel())
    return d, t, jnp.asarray(p, jnp.float32)


def pallas_multi_asset_price(kind: str, spots, strike, maturity, rate, vols,
                             corr, weights=None, cp: float = 1.0,
                             dividends=0.0, n_paths: int = 1_000_000,
                             n_steps: int = 1, seed: int = 0,
                             sampler: str = "prng"):
    """(price, stderr, actual_paths) from the fused multi-asset kernel.

    ``kind`` ∈ {basket, basket_geo, rainbow_best, rainbow_worst, spread,
    basket_asian}. Terminal payoffs are exact with ``n_steps=1`` (GBM
    increments are exact at any step size); ``basket_asian`` monitors the
    basket at every one of the ``n_steps`` dates. ``weights`` defaults to
    equal; ``spread`` ignores weights and requires exactly 2 assets.
    Oracles in the tests: the XLA scan engine (``models/multi_asset.py``),
    the geometric-basket Black formula (exact), Margrabe at K=0 (exact).
    """
    if kind not in KINDS:
        raise ValidationError(f"unknown kind {kind!r}; choose {KINDS}")
    d, t, p = _params_vec(spots, weights, strike, maturity, rate, vols, corr,
                          dividends, n_steps)
    if kind == "spread" and d != 2:
        raise ValidationError("spread requires exactly 2 assets")
    n_blocks = max(1, math.ceil(n_paths / PATHS_PER_BLOCK))
    pay, pay2 = _launch(jnp.asarray([seed, 0], jnp.int32), p, d=d, kind=kind,
                        n_steps=n_steps, n_blocks=n_blocks, cp=float(cp),
                        sampler=sampler)
    return _mean_stderr(pay, pay2, n_blocks * PATHS_PER_BLOCK,
                        math.exp(-float(rate) * t))


def pallas_multi_asset_greeks(kind: str, spots, strike, maturity, rate, vols,
                              corr, weights=None, cp: float = 1.0,
                              dividends=0.0, n_paths: int = 1_000_000,
                              n_steps: int = 1, seed: int = 0,
                              sampler: str = "prng") -> dict:
    """Price + stderr + the PER-ASSET likelihood-ratio delta vector in one
    kernel pass (any kind — LR differentiates the correlated Gaussian
    density, so rainbows' max/min kinks cost nothing):

      delta_i = df·E[pay · (L⁻ᵀζ₁)_i] / (S0_i·σ_i·√dt)

    where ζ₁ are the first-step pre-correlation iid normals. Oracle in the
    tests: pathwise AD of the XLA engine (``models.multi_asset_greeks``).
    Returns {price, std_error, delta (d,), paths}.
    """
    if kind not in KINDS:
        raise ValidationError(f"unknown kind {kind!r}; choose {KINDS}")
    d, t, p = _params_vec(spots, weights, strike, maturity, rate, vols, corr,
                          dividends, n_steps, lr=True)
    if kind == "spread" and d != 2:
        raise ValidationError("spread requires exactly 2 assets")
    n_blocks = max(1, math.ceil(n_paths / PATHS_PER_BLOCK))
    outs = _launch(jnp.asarray([seed, 0], jnp.int32), p, d=d, kind=kind,
                   n_steps=n_steps, n_blocks=n_blocks, cp=float(cp),
                   sampler=sampler, lr=True)
    n = n_blocks * PATHS_PER_BLOCK
    df = math.exp(-float(rate) * t)
    price, se, _ = _mean_stderr(outs[0], outs[1], n, df)
    spots_a = np.asarray(spots, np.float64).ravel()
    vols_a = np.asarray(vols, np.float64).ravel()
    sqdt = math.sqrt(t / n_steps)
    delta = jnp.stack([
        df * outs[2 + i].sum() / n / (spots_a[i] * vols_a[i] * sqdt)
        for i in range(d)
    ])
    return {"price": price, "std_error": se, "delta": delta, "paths": n}
