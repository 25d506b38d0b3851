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
from .exotic_pallas import _mean_stderr, _sobol_nd
from .gbm_pallas import _QMC_BITS, _mix32
from .kernel_rng import TWO_PI, draw_normals

ROWS = 128
LANES = 256  # 4 branches × d ≤ 4 assets of (128, LANES) carries in VMEM
PATHS_PER_BLOCK = 4 * ROWS * LANES

KINDS = ("basket", "basket_geo", "rainbow_best", "rainbow_worst", "spread",
         "basket_asian",
         # internal: arithmetic-basket payoff MINUS its geometric control
         # variate (exact closed-form mean added back host-side)
         "basket_cv")


def _ma_kernel(seed_ref, p_ref, *refs, d: int, kind: str,
               n_steps: int, cp: float, sampler: str, lr: bool = False):
    """p_ref layout (SMEM f32): per asset i<d: [s0_i, drift_dt_i,
    sig_sqrt_dt_i, w_i], then the d·d row-major Cholesky factor L, then
    [strike], then (lr only) the d·d row-major L⁻¹, the d per-asset
    1/σ_i (annualized), [√dt, 1/(2T)], and the d theta weights
    c1_i = drift_dt_i/(σ_i·√dt·T).

    ``lr=True`` reduces the FULL likelihood-ratio Greek ladder in the
    same pass — every moment is a functional of the iid pre-correlation
    normals z_k (step k), their back-rotation g_k = L⁻ᵀz_k and the
    correlated pre-σ shocks (Lz_k):

      delta_i  score: g_{1,i}/(S0_i σ_i √dt)              (first step)
      gamma_ij moment: pay·g_{1,i}·g_{1,j}                (first step;
                host combines with C⁻¹ and the delta moment)
      vega_i   score: Σ_k g_{k,i}[(Lz_k)_i/σ_i − √dt] − n/σ_i
      theta    score: [Σ_k|z_k|² − nd]/(2T) + Σ_i c1_i Σ_k g_{k,i}
      rho      score: √dt Σ_i Σ_k g_{k,i}/σ_i   (host adds −T·price)

    Carried per stream (cos/sin): a_i = Σ_k g_{k,i}(Lz_k)_i,
    b_i = Σ_k g_{k,i}, q = Σ_k|z_k|², plus the first-step normals.
    Antithetic signs: a and q are even in the branch sign, b and g₁ odd.
    """
    ntri = d * (d + 1) // 2
    if lr:
        pay_ref, pay2_ref = refs[0], refs[1]
        del_refs = refs[2:2 + d]
        veg_refs = refs[2 + d:2 + 2 * d]
        gam_refs = refs[2 + 2 * d:2 + 2 * d + ntri]
        th_ref = refs[2 + 2 * d + ntri]
        rho_ref = refs[3 + 2 * d + ntri]
    else:
        pay_ref, pay2_ref = refs
    block = pl.program_id(0) + seed_ref[1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in refs:
            ref[:, :] = jnp.zeros_like(ref)

    if sampler == "prng":
        pltpu.prng_seed(seed_ref[0] + block * jnp.int32(-1640531535))
    seed = seed_ref[0]
    qmc = sampler.startswith("sobol")

    s0 = [p_ref[4 * i + 0] for i in range(d)]
    drift = [p_ref[4 * i + 1] for i in range(d)]
    sig = [p_ref[4 * i + 2] for i in range(d)]
    w = [p_ref[4 * i + 3] for i in range(d)]
    L = [[p_ref[4 * d + i * d + j] for j in range(d)] for i in range(d)]
    strike = p_ref[4 * d + d * d]
    if kind == "basket_cv":
        # Π s0_i^{w_i}, computed host-side at full precision: the geo leg
        # exponentiates only the RELATIVE log-basket (small argument)
        g0 = p_ref[4 * d + d * d + 1]
    if lr:
        base_inv = 4 * d + d * d + 1
        Linv = [[p_ref[base_inv + i * d + j] for j in range(d)]
                for i in range(d)]
        base_x = base_inv + d * d
        inv_sig = [p_ref[base_x + i] for i in range(d)]
        sqdt = p_ref[base_x + d]
        c0 = p_ref[base_x + d + 1]
        c1 = [p_ref[base_x + d + 2 + i] for i in range(d)]

    shape = (ROWS, LANES)
    # 4 antithetic branches × d assets of log-spot offsets (start at 0;
    # payoff multiplies by s0 — keeps the adds drift-centered)
    zero = jnp.zeros(shape, jnp.float32)
    if qmc:
        # terminal-only (n_steps == 1, enforced at launch): one scrambled
        # 2d-dim Sobol point per path drives BOTH streams' d-dim normal
        # draws exactly (Box–Muller pairs on dims (2i, 2i+1)); the GBM
        # one-step increment is exact, so the whole terminal law is QMC.
        # Global point index rides the block id — topology-invariant
        # (shardable) like every sampler here.
        rid = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        cid = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        # group-salted scrambles: 8 independent replicates (rid % 8) so
        # the host can quote a randomized-QMC stderr (see exotic_pallas)
        g_id = rid & 7
        idx = block * ((ROWS // 8) * LANES) + (rid >> 3) * LANES + cid + 1
        mask30 = jnp.int32((1 << _QMC_BITS) - 1)
        h = _mix32((seed + g_id * jnp.int32(0x3C6EF372))
                   * jnp.int32(-1640531535) + jnp.int32(0x632BE5AB))
        scrambles = []
        for _ in range(2 * d):
            scrambles.append(h & mask30)
            h = _mix32(h + jnp.int32(-1640531527))
        us = _sobol_nd(idx, scrambles, 2 * d)
        sob = []
        for i in range(d):
            rad = jnp.sqrt(-2.0 * jnp.log(us[2 * i]))
            th = TWO_PI * us[2 * i + 1]
            sob.append((rad * jnp.cos(th), rad * jnp.sin(th)))
    xs = [[zero for _ in range(d)] for _ in range(4)]
    asian = [zero, zero, zero, zero] if kind == "basket_asian" else None
    # per-stream (cos, sin) LR carries: first-step normals, a_i, b_i, q
    z1st = [[zero] * d, [zero] * d] if lr else None
    va = [[zero] * d, [zero] * d] if lr else None
    vb = [[zero] * d, [zero] * d] if lr else None
    vq = [zero, zero] if lr else None

    def basket_level(x_b):
        lvl = w[0] * s0[0] * jnp.exp(x_b[0])
        for i in range(1, d):
            lvl = lvl + w[i] * s0[i] * jnp.exp(x_b[i])
        return lvl

    def body(step, carry):
        xs, asian, z1st, va, vb, vq = carry
        # one Box–Muller pair per asset: stream 0 (cos) feeds branches
        # A(+)/B(−), stream 1 (sin) feeds C(+)/D(−)
        zc, zs = [], []
        for i in range(d):
            if qmc:
                c, s = sob[i]
            else:
                c, s = draw_normals(sampler, seed, block, step * d + i,
                                    n_steps * d, shape)
            zc.append(c)
            zs.append(s)
        streams = (zc, zs)
        # correlated pre-σ shocks, once per stream (branches differ only
        # by sign): shock_i = Σ_j L[i][j]·z_j
        shocks = []
        for zz in streams:
            sh = []
            for i in range(d):
                acc_s = L[i][0] * zz[0]
                for j in range(1, i + 1):
                    acc_s = acc_s + L[i][j] * zz[j]
                sh.append(acc_s)
            shocks.append(sh)
        if lr:
            first = step == 0
            z1st = [[jnp.where(first, z, old)
                     for z, old in zip(streams[t], z1st[t])]
                    for t in range(2)]
            for t in range(2):
                zz = streams[t]
                for i in range(d):
                    # g_i = (L⁻ᵀ z)_i = Σ_j L⁻¹[j][i]·z_j
                    g = Linv[0][i] * zz[0]
                    for j in range(1, d):
                        g = g + Linv[j][i] * zz[j]
                    va[t][i] = va[t][i] + g * shocks[t][i]
                    vb[t][i] = vb[t][i] + g
                qsum = zz[0] * zz[0]
                for i in range(1, d):
                    qsum = qsum + zz[i] * zz[i]
                vq[t] = vq[t] + qsum
        new_xs = []
        for b in range(4):
            t, sgn = b // 2, (1.0, -1.0)[b % 2]
            x_b = xs[b]
            nx = []
            for i in range(d):
                nx.append(x_b[i] + drift[i] + sig[i] * sgn * shocks[t][i])
            new_xs.append(nx)
        if kind == "basket_asian":
            asian = [a + basket_level(x_b) for a, x_b in zip(asian, new_xs)]
        return new_xs, asian, z1st, va, vb, vq

    xs, asian, z1st, va, vb, vq = jax.lax.fori_loop(
        0, n_steps, body, (xs, asian, z1st, va, vb, vq))

    acc = jnp.zeros(shape, jnp.float32)
    acc2 = jnp.zeros(shape, jnp.float32)
    acc_del = [jnp.zeros(shape, jnp.float32) for _ in range(d)] if lr else []
    acc_veg = [jnp.zeros(shape, jnp.float32) for _ in range(d)] if lr else []
    acc_gam = [jnp.zeros(shape, jnp.float32)
               for _ in range(ntri)] if lr else []
    acc_th = jnp.zeros(shape, jnp.float32)
    acc_rho = jnp.zeros(shape, jnp.float32)
    for b in range(4):
        x_b = xs[b]
        if kind == "basket":
            lvl = basket_level(x_b)
            pay = jnp.maximum(cp * (lvl - strike), 0.0)
        elif kind == "basket_cv":
            lvl = basket_level(x_b)
            glog = w[0] * x_b[0]
            for i in range(1, d):
                glog = glog + w[i] * x_b[i]
            pay = (jnp.maximum(cp * (lvl - strike), 0.0)
                   - jnp.maximum(cp * (g0 * jnp.exp(glog) - strike), 0.0))
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
            t, sgn = b // 2, (1.0, -1.0)[b % 2]
            zeta = z1st[t]
            g1 = []
            for i in range(d):
                g = Linv[0][i] * zeta[0]  # g₁ = L⁻ᵀ ζ₁
                for j in range(1, d):
                    g = g + Linv[j][i] * zeta[j]
                g1.append(g)
            for i in range(d):
                acc_del[i] += pay * (sgn * g1[i])
                score_v = (inv_sig[i] * (va[t][i] - float(n_steps))
                           - sqdt * sgn * vb[t][i])
                acc_veg[i] += pay * score_v
            k = 0
            for i in range(d):
                for j in range(i, d):
                    acc_gam[k] += pay * (g1[i] * g1[j])
                    k += 1
            sb_r = sgn * vb[t][0] * inv_sig[0]
            sb_th = c1[0] * sgn * vb[t][0]
            for i in range(1, d):
                sb_r = sb_r + sgn * vb[t][i] * inv_sig[i]
                sb_th = sb_th + c1[i] * sgn * vb[t][i]
            acc_th += pay * (c0 * (vq[t] - float(n_steps * d)) + sb_th)
            acc_rho += pay * (sqdt * sb_r)
    accs = [acc, acc2]
    if lr:
        accs += acc_del + acc_veg + acc_gam + [acc_th, acc_rho]
    for off in range(0, LANES, 128):
        for ref, a in zip(refs, accs):
            ref[:, :] += a[:, off:off + 128]


@functools.partial(jax.jit, static_argnames=("d", "kind", "n_steps",
                                             "n_blocks", "cp", "sampler",
                                             "lr"))
def _launch(seed, params, *, d: int, kind: str, n_steps: int, n_blocks: int,
            cp: float, sampler: str = "prng", lr: bool = False):
    if sampler.startswith("sobol") and n_steps != 1:
        raise ValidationError(
            "multi-asset QMC is terminal-only (n_steps=1): the 2d-dim "
            "Sobol point drives the exact one-step GBM increment; use "
            "prng/hash for multi-step monitoring (basket_asian)")
    n_out = 2 + (2 * d + d * (d + 1) // 2 + 2 if lr else 0)
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


@functools.partial(jax.jit, static_argnames=("d", "kind", "n_steps",
                                             "n_blocks", "cp", "sampler"))
def _ma_price_pipeline(seed, p, df, *, d, kind, n_steps, n_blocks, cp,
                       sampler):
    """Launch + moment reduction in ONE jitted program — the eager
    reduction tail cost extra RPC round-trips per call over the tunnel
    (CLAUDE.md: hot paths must be single jitted programs)."""
    pay, pay2 = _launch(seed, p, d=d, kind=kind, n_steps=n_steps,
                        n_blocks=n_blocks, cp=cp, sampler=sampler)
    price, se, _ = _mean_stderr(pay, pay2, n_blocks * PATHS_PER_BLOCK, df,
                                sampler)
    return price, se


def _params_vec(spots, weights, strike, maturity, rate, vols, corr,
                dividends, n_steps, lr: bool = False, cv: bool = False):
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
    if cv:
        p += [float(np.prod(spots ** weights))]  # g0 = Π s0^w (f64 host)
    if lr:
        p += list(np.linalg.inv(L).ravel())
        sqdt = math.sqrt(dt)
        p += list(1.0 / vols)                      # inv_sig
        p += [sqdt, 1.0 / (2.0 * t)]               # sqdt, c0
        p += [((float(rate) - divs[i] - 0.5 * vols[i] ** 2) * dt)
              / (vols[i] * sqdt * t) for i in range(d)]  # c1 (theta wts)
    return d, t, np.asarray(p, np.float32)


def pallas_multi_asset_price(kind: str, spots, strike, maturity, rate, vols,
                             corr, weights=None, cp: float = 1.0,
                             dividends=0.0, n_paths: int = 1_000_000,
                             n_steps: int = 1, seed: int = 0,
                             sampler: str = "prng",
                             control_variate: bool = False):
    """(price, stderr, actual_paths) from the fused multi-asset kernel.

    ``kind`` ∈ {basket, basket_geo, rainbow_best, rainbow_worst, spread,
    basket_asian}. Terminal payoffs are exact with ``n_steps=1`` (GBM
    increments are exact at any step size); ``basket_asian`` monitors the
    basket at every one of the ``n_steps`` dates. ``weights`` defaults to
    equal; ``spread`` ignores weights and requires exactly 2 assets.
    Oracles in the tests: the XLA scan engine (``models/multi_asset.py``),
    the geometric-basket Black formula (exact), Margrabe at K=0 (exact).

    ``sampler="sobol"`` (terminal kinds, ``n_steps=1`` only): one
    scrambled 2d-dim Sobol point per path drives the exact terminal law
    — the full dimension fits the in-kernel 8-dim direction table for
    d ≤ 4, so this is PURE QMC, not a hybrid bridge. The reported stderr
    then uses the plain-MC formula and is indicative only.

    ``control_variate=True`` (``basket`` only): the kernel prices the
    difference against the geometric basket on the same paths and the
    exact geometric-basket closed form is added back (Kemna–Vorst for
    baskets); the stderr is the TRUE CV-estimator uncertainty. Composes
    with any sampler.
    """
    if control_variate:
        if kind != "basket":
            raise ValidationError("control_variate applies to the "
                                  "arithmetic basket (geometric CV)")
        kind = "basket_cv"
    if kind not in KINDS:
        raise ValidationError(f"unknown kind {kind!r}; choose {KINDS}")
    d, t, p = _params_vec(spots, weights, strike, maturity, rate, vols, corr,
                          dividends, n_steps, cv=kind == "basket_cv")
    if kind == "spread" and d != 2:
        raise ValidationError("spread requires exactly 2 assets")
    n_blocks = max(1, math.ceil(n_paths / PATHS_PER_BLOCK))
    price, se = _ma_price_pipeline(
        np.asarray([seed, 0], np.int32), p,
        np.float32(math.exp(-float(rate) * t)), d=d, kind=kind,
        n_steps=n_steps, n_blocks=n_blocks, cp=float(cp), sampler=sampler)
    n = n_blocks * PATHS_PER_BLOCK
    if kind == "basket_cv":
        from ..models.multi_asset import geometric_basket_closed_form

        weights_a = (np.asarray(weights, np.float64).ravel()
                     if weights is not None
                     else np.full(d, 1.0 / d))
        price = price + geometric_basket_closed_form(
            spots, weights_a, strike, t, rate, vols, corr, cp, dividends)
    return price, se, n


def pallas_multi_asset_greeks(kind: str, spots, strike, maturity, rate, vols,
                              corr, weights=None, cp: float = 1.0,
                              dividends=0.0, n_paths: int = 1_000_000,
                              n_steps: int = 1, seed: int = 0,
                              sampler: str = "prng") -> dict:
    """Price + stderr + the FULL per-asset likelihood-ratio Greek ladder
    in one kernel pass (any kind — LR differentiates the correlated
    Gaussian density, so rainbows' max/min kinks cost nothing):

      delta_i  = df·E[pay·g₁ᵢ] / (S0_i·σ_i·√dt),  g₁ = L⁻ᵀζ₁
      gamma_ij = (Hˣ_ij − δ_ij·S0_i·delta_i) / (S0_i·S0_j),
                 Hˣ_ij = df·(E[pay·g₁ᵢg₁ⱼ] − C⁻¹_ij·E[pay])/(σ_iσ_j·dt)
      vega_i   = df·E[pay·(Σ_k gₖᵢ[(Lzₖ)ᵢ/σᵢ − √dt] − n/σᵢ)]
      theta    = r·price − df·E[pay·score_T]  (−∂V/∂T, discrete contract:
                 monitoring dates rescale with T at fixed n_steps)
      rho      = df·E[pay·√dt·Σ_kᵢ gₖᵢ/σᵢ] − T·price

    where ζ₁/zₖ are the per-step pre-correlation iid normals. LR variance
    grows like 1/dt for gamma and like n_steps for vega/theta/rho —
    at terminal kinds (n_steps=1) all entries are tight; for basket_asian
    raise n_paths accordingly. Oracles in the tests: AD of the exact
    geometric-basket Black formula (delta/vega/theta/rho and the full
    Hessian), pathwise AD of the XLA engine, Margrabe gradients.
    Capability anchor: the reference's FD engine covers every parameter
    for every pricer (``src/greeks/unified_greeks.py:235``) — this ladder
    does the same at kernel speed.
    Returns {price, std_error, delta (d,), vega (d,), gamma (d,d),
    theta, rho, paths}.

    ``sampler="sobol"`` (terminal kinds only) applies the pure 2d-dim
    QMC terminal law to the ladder too: every moment E[pay·score] is an
    integral of a deterministic functional of the SAME normals, so the
    LR estimators stay consistent under QMC (unlike the hybrid bridge
    samplers, whose residual replay changes which normals the scores
    see); ``std_error`` keeps the plain-MC formula and is indicative.
    """
    if kind not in KINDS or kind == "basket_cv":
        raise ValidationError(f"unknown kind {kind!r}; choose {KINDS}")
    d, t, p = _params_vec(spots, weights, strike, maturity, rate, vols, corr,
                          dividends, n_steps, lr=True)
    if kind == "spread" and d != 2:
        raise ValidationError("spread requires exactly 2 assets")
    n_blocks = max(1, math.ceil(n_paths / PATHS_PER_BLOCK))
    outs = _launch(np.asarray([seed, 0], np.int32), p, d=d, kind=kind,
                   n_steps=n_steps, n_blocks=n_blocks, cp=float(cp),
                   sampler=sampler, lr=True)
    return _combine_lr(outs, n_blocks * PATHS_PER_BLOCK, d, t, rate, spots,
                       vols, corr, n_steps)


def _combine_lr(outs, n: int, d: int, t: float, rate, spots, vols, corr,
                n_steps: int) -> dict:
    """Host-side assembly of the LR ladder from the kernel's moment tiles
    (shared by the single-device and ``shard_map`` paths — the sharded
    pipeline psums the tiles over ICI first, then this runs once)."""
    df = math.exp(-float(rate) * t)
    rate_f = float(rate)
    price, se, _ = _mean_stderr(outs[0], outs[1], n, df)
    spots_a = np.asarray(spots, np.float64).ravel()
    vols_a = np.asarray(vols, np.float64).ravel()
    dt = t / n_steps
    sqdt = math.sqrt(dt)
    m_pay = outs[0].sum() / n
    m_del = [outs[2 + i].sum() / n for i in range(d)]
    m_veg = [outs[2 + d + i].sum() / n for i in range(d)]
    ntri = d * (d + 1) // 2
    m_gam = [outs[2 + 2 * d + k].sum() / n for k in range(ntri)]
    m_th = outs[2 + 2 * d + ntri].sum() / n
    m_rho = outs[3 + 2 * d + ntri].sum() / n

    delta = jnp.stack([
        df * m_del[i] / (spots_a[i] * vols_a[i] * sqdt) for i in range(d)])
    vega = jnp.stack([df * m_veg[i] for i in range(d)])
    cinv = np.linalg.inv(np.asarray(corr, np.float64)
                         + 1e-9 * np.eye(d))
    rows = []
    k = 0
    tri = {}
    for i in range(d):
        for j in range(i, d):
            tri[(i, j)] = m_gam[k]
            k += 1
    for i in range(d):
        row = []
        for j in range(d):
            mg = tri[(i, j) if i <= j else (j, i)]
            hx = df * (mg - cinv[i, j] * m_pay) / (vols_a[i] * vols_a[j] * dt)
            g = hx / (spots_a[i] * spots_a[j])
            if i == j:
                g = g - delta[i] / spots_a[i]
            row.append(g)
        rows.append(jnp.stack(row))
    gamma = jnp.stack(rows)
    theta = rate_f * price - df * m_th
    rho = df * m_rho - t * price
    return {"price": price, "std_error": se, "delta": delta, "vega": vega,
            "gamma": gamma, "theta": theta, "rho": rho, "paths": n}
