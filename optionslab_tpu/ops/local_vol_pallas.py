"""Fused Pallas kernel for local-volatility (Dupire) Monte Carlo.

The scan engine (``models/local_vol._lv_mc``) does a bilinear σ(S, t)
table lookup per step — gathers, which TPUs hate, and an HBM round-trip
of the path state every step. The kernel replaces the lookup with a
POLYNOMIAL evaluation: host-side, for every time step the surface slice
σ(·, t_i) is least-squares-fitted with a degree-``DEGREE`` polynomial in
x = log(S/S0) over that step's ±4-stddev REACHABLE band, weighted by the
path density; in-kernel each step is then a 7-coefficient Horner
evaluation (pure VPU fmas, no gathers, no HBM). x is clamped to the
fitted band per step.

Fit accuracy: the density-weighted rms residual of the worst step is
returned (vols) — for smooth surfaces it is ~1e-3; bilinear-table kinks
in the far wings carry negligible weight because no paths reach them.
Reference anchor: ``src/models/local_vol.py`` prices vanillas on
an explicit-FDM grid only — here the SAME calibrated surface prices
path-dependent payoffs at kernel speed, consistently with the smile.

``seed_ref = [seed, block0]`` global-block ownership as in the other
kernels (topology-invariant path sets; shardable). Samplers: ``prng`` /
``hash`` (plain MC) and ``sobol_bb`` / ``sobol_bb_hash`` (hybrid bridge
QMC — the same 8-level dyadic construction as the exotic kernel: the
bridge REPARAMETERIZES the iid normal draws, which is model-independent,
so it applies unchanged under state-dependent σ(x, t); the variance
reduction is largest when the payoff is dominated by the pinned z-sums,
which holds approximately for mild smiles). Greeks reject the QMC
samplers (LR scores assume iid normals).
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
from .exotic_pallas import _bridge_plan, _sobol_nd
from .gbm_pallas import _QMC_BITS, _mix32
from .kernel_rng import TWO_PI, draw_normals

ROWS = 128
LANES = 512
PATHS_PER_BLOCK = 4 * ROWS * LANES
DEGREE = 6  # polynomial degree of the per-step sigma(x) fit

# scalar params before the per-step table; each step row is
# [x_lo_i, x_hi_i, c_deg, ..., c_0]. Single barrier/touch kinds use
# _P_BARRIER; double kinds put the (lower, upper) band in relative-log
# space into (_P_BARRIER, _P_BARRIER2). _P_RDT = r*dt (pay-at-hit
# in-kernel discounting).
(_P_S0, _P_K, _P_MU_DT, _P_DT, _P_SQDT, _P_BARRIER, _P_BARRIER2,
 _P_RDT) = range(8)
_N_SCALARS = 8
_ROW = DEGREE + 3


def _lv_kernel(seed_ref, p_ref, *refs, n_steps: int,
               cp: float, payoff: str, sampler: str, greeks: bool = False):
    """``greeks=True`` additionally reduces the likelihood-ratio moments
    for the STICKY-STRIKE (Dupire-model) delta/gamma and the
    parallel-surface-shift vega:

    - a spot bump with the physical surface σ(S,t) FIXED is an initial
      log-state shift; only the first transition density depends on the
      start state, so the first-step LR scores z₁/(S0σ₀√dt) and
      (z₁²−1)/(S0σ₀√dt)² are exact for ANY payoff kind
      (σ₀ = σ(0, t₀) is deterministic — all paths start at x=0);
    - vega is ∂price/∂ε for σ(x,t) → σ(x,t)+ε, via the per-step
      state-dependent LR score Σ_k[(z_k²−1)/σ_k − z_k√dt] carried per
      branch (exact; same scalar form as the GBM LR vega);
    - lookback payoffs' extremum INCLUDES the start S0, so the payoff has
      a DIRECT start-state dependence the density scores cannot see: the
      boundary moments b₀ = Σ(∂pay/∂x₀)/S0 (±1{extremum at t=0}, cp/ITM
      signed) and b₁ = Σ b₀-term·z₁ complete delta and gamma exactly.

    Extra outputs: Σpay·z₁, Σpay·(z₁²−1), Σpay·vscore
    (+ b₀, b₁ for lookback kinds).
    """
    lb_greeks = greeks and payoff.startswith("lookback")
    if lb_greeks:
        pay_ref, pay2_ref, mdel_ref, mgam_ref, mveg_ref, b0_ref, b1_ref = refs
    elif greeks:
        pay_ref, pay2_ref, mdel_ref, mgam_ref, mveg_ref = refs
    else:
        pay_ref, pay2_ref = refs
    block = pl.program_id(0) + seed_ref[1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in refs:
            ref[:, :] = jnp.zeros_like(ref)

    qmc = sampler.startswith("sobol_bb")
    # QMC residuals always ride the counter-based hash stream (exact
    # two-pass replay by construction; the hardware-PRNG reseed variant
    # trips a pathological Mosaic compile — see exotic_pallas)
    residual = "hash" if (qmc or sampler == "hash"
                          or sampler.endswith("hash")) else "prng"
    if residual != "hash":
        pltpu.prng_seed(seed_ref[0] + block * jnp.int32(-1640531535))
    seed = seed_ref[0]

    s0 = p_ref[_P_S0]
    strike = p_ref[_P_K]
    mu_dt = p_ref[_P_MU_DT]  # (r - q)·dt
    dt = p_ref[_P_DT]
    sqdt = p_ref[_P_SQDT]

    shape = (ROWS, LANES)
    zero = jnp.zeros(shape, jnp.float32)
    xs = (zero, zero, zero, zero)  # log(S/S0) per antithetic branch
    touch_kind = "touch" in payoff
    barrier_kind = payoff.startswith("barrier") or touch_kind
    double = "double" in payoff
    hit_pay = payoff.endswith("_hit")  # cash discounted at first hit
    lookback_kind = payoff.startswith("lookback")
    up = "up" in payoff
    # float call / fixed put track the running MINIMUM (cf. exotic kernel)
    lb_min = (payoff == "lookback_float") == (cp > 0)
    if payoff == "asian":
        aux = (zero, zero, zero, zero)  # running spot sums
    elif payoff == "range_accrual":
        aux = (zero, zero, zero, zero)  # in-corridor step counters
    elif lookback_kind:
        aux = (zero, zero, zero, zero)  # running extremum of x (x0 = 0)
    elif barrier_kind:
        # crossed-flag per branch; levels passed in log(S/S0) space
        if double:
            h0 = jnp.where((p_ref[_P_BARRIER] >= 0.0)
                           | (p_ref[_P_BARRIER2] <= 0.0), 1.0, 0.0) + zero
        else:
            b_log = p_ref[_P_BARRIER]
            z0 = jnp.zeros(shape, jnp.float32)
            h0 = jnp.where(z0 >= b_log, 1.0, 0.0) if up else \
                jnp.where(z0 <= b_log, 1.0, 0.0)
        if hit_pay:
            # per branch: (hit flag, pv = df-at-first-hit; df(0) = 1)
            aux = ((h0, h0), (h0, h0), (h0, h0), (h0, h0))
        else:
            aux = (h0, h0, h0, h0)
    else:
        aux = ()
    # greek carries: first-step normals per stream + per-branch vega score
    gz1 = [zero, zero] if greeks else []
    gvs = [zero, zero, zero, zero] if greeks else []

    if qmc:
        # Hybrid bridge QMC (cf. exotic_pallas): a scrambled Sobol point
        # per path pins the terminal z-sum and up to 7 dyadic midpoint
        # sums; hash residuals fill in conditionally per segment. The
        # construction produces an EXACT iid N(0,1) step sequence — the
        # state-dependent σ(x) consumes it unchanged.
        bounds, constructs = _bridge_plan(n_steps, 8)
        n_dim = 1 + len(constructs)
        n_pairs = (n_dim + 1) // 2
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
        for _ in range(2 * n_pairs):
            scrambles.append(h & mask30)
            h = _mix32(h + jnp.int32(-1640531527))
        us = _sobol_nd(idx, scrambles, 2 * n_pairs)
        g = []
        for i2 in range(n_pairs):
            rad = jnp.sqrt(-2.0 * jnp.log(us[2 * i2]))
            th = TWO_PI * us[2 * i2 + 1]
            g.append(rad * jnp.cos(th))
            g.append(rad * jnp.sin(th))
        csum = {0: zero, n_steps: math.sqrt(float(n_steps)) * g[0]}
        for (m, a, b), gd in zip(constructs, g[1:]):
            frac = (m - a) / (b - a)
            sd = math.sqrt((m - a) * (b - m) / (b - a))
            csum[m] = csum[a] + (csum[b] - csum[a]) * frac + sd * gd
        segs = list(zip(bounds[:-1], bounds[1:]))
        targets = [csum[b] - csum[a] for a, b in segs]

        def pre(i, carry):
            sc, ss = carry
            z1, z2 = draw_normals(residual, seed, block, i, n_steps, shape)
            return sc + z1, ss + z2

        seg_sums = []
        for a, b in segs:
            seg_sums.append(jax.lax.fori_loop(a, b, pre, (zero, zero)))

    def sigma(x, i):
        # Horner over the step-i coefficients (highest degree first);
        # scalar SMEM loads at a traced step index — no vector gathers.
        # Each step carries its own fit range [x_lo_i, x_hi_i] (the
        # ±4-stddev reachable band — tight fits where the paths are).
        base = _N_SCALARS + i * _ROW
        xc = jnp.clip(x, p_ref[base], p_ref[base + 1])
        acc = jnp.full(shape, 0.0, jnp.float32) + p_ref[base + 2]
        for j in range(1, DEGREE + 1):
            acc = acc * xc + p_ref[base + 2 + j]
        return jnp.maximum(acc, 1e-4)  # vol floor: fit can dip near edges

    def make_body(offs):
        def body(i, carry):
            xs, aux, gz1, gvs = carry
            z1, z2 = draw_normals(residual, seed, block, i, n_steps, shape)
            if offs is None:
                zs = (z1, -z1, z2, -z2)
            else:
                # conditional-law residuals: each branch's segment z-sum
                # is pinned to its bridge target by a constant offset
                oc_p, oc_m, os_p, os_m = offs
                zs = (z1 + oc_p, -z1 + oc_m, z2 + os_p, -z2 + os_m)
            if greeks:
                first = i == 0
                gz1 = [jnp.where(first, z1, gz1[0]),
                       jnp.where(first, z2, gz1[1])]
            new_xs, new_gvs = [], []
            for b, (x, z) in enumerate(zip(xs, zs)):
                sig = sigma(x, i)
                new_xs.append(x + mu_dt - 0.5 * sig * sig * dt
                              + sig * sqdt * z)
                if greeks:
                    new_gvs.append(gvs[b] + (z * z - 1.0) / sig - z * sqdt)
            new_xs = tuple(new_xs)
            gvs = new_gvs if greeks else gvs
            if payoff == "asian":
                aux = tuple(a + s0 * jnp.exp(x) for a, x in zip(aux, new_xs))
            elif payoff == "range_accrual":
                # corridor in RELATIVE log space: (lower, upper) ride the
                # double-kind band slots
                lo, hi = p_ref[_P_BARRIER], p_ref[_P_BARRIER2]
                aux = tuple(
                    a + jnp.where((x >= lo) & (x <= hi), 1.0, 0.0)
                    for a, x in zip(aux, new_xs))
            elif lookback_kind:
                ext = jnp.minimum if lb_min else jnp.maximum
                aux = tuple(ext(a, x) for a, x in zip(aux, new_xs))
            elif barrier_kind:  # discrete monitoring at every step
                if double:
                    lo, hi = p_ref[_P_BARRIER], p_ref[_P_BARRIER2]

                    def _now(x):
                        return jnp.where((x <= lo) | (x >= hi), 1.0, 0.0)
                elif up:
                    b_log = p_ref[_P_BARRIER]

                    def _now(x):
                        return jnp.where(x >= b_log, 1.0, 0.0)
                else:
                    b_log = p_ref[_P_BARRIER]

                    def _now(x):
                        return jnp.where(x <= b_log, 1.0, 0.0)
                if hit_pay:
                    df_i = jnp.exp(-p_ref[_P_RDT]
                                   * (i + 1).astype(jnp.float32))
                    aux = tuple(
                        (jnp.maximum(h, _now(x)),
                         pv + (1.0 - h) * _now(x) * df_i)
                        for (h, pv), x in zip(aux, new_xs))
                else:
                    aux = tuple(jnp.maximum(h, _now(x))
                                for h, x in zip(aux, new_xs))
            return new_xs, aux, gz1, gvs

        return body

    if qmc:
        carry = (xs, aux, gz1, gvs)
        for j, (a, b) in enumerate(segs):
            sc_j, ss_j = seg_sums[j]
            inv = 1.0 / (b - a)
            offs = ((targets[j] - sc_j) * inv, (targets[j] + sc_j) * inv,
                    (targets[j] - ss_j) * inv, (targets[j] + ss_j) * inv)
            carry = jax.lax.fori_loop(a, b, make_body(offs), carry)
        xs, aux, gz1, gvs = carry
    else:
        xs, aux, gz1, gvs = jax.lax.fori_loop(0, n_steps, make_body(None),
                                              (xs, aux, gz1, gvs))

    acc = jnp.zeros(shape, jnp.float32)
    acc2 = jnp.zeros(shape, jnp.float32)
    acc_d = jnp.zeros(shape, jnp.float32)
    acc_g = jnp.zeros(shape, jnp.float32)
    acc_v = jnp.zeros(shape, jnp.float32)
    acc_b0 = jnp.zeros(shape, jnp.float32)
    acc_b1 = jnp.zeros(shape, jnp.float32)
    knock_in = payoff.endswith("in")
    for b in range(4):
        if payoff == "asian":
            lvl = aux[b] * (1.0 / n_steps)
            pay = jnp.maximum(cp * (lvl - strike), 0.0)
        elif payoff == "lookback_float":
            ext_s = s0 * jnp.exp(aux[b])
            s_t = s0 * jnp.exp(xs[b])
            pay = (s_t - ext_s) if cp > 0 else (ext_s - s_t)
        elif payoff == "lookback_fixed":
            ext_s = s0 * jnp.exp(aux[b])
            pay = jnp.maximum(cp * (ext_s - strike), 0.0)
        elif payoff == "range_accrual":
            # accrual fraction on unit notional (host scales + discounts)
            pay = aux[b] * (1.0 / n_steps)
        elif hit_pay:
            pay = aux[b][1]  # df-at-hit carried in-kernel (host df = 1)
        elif touch_kind:
            # unit cash paid AT EXPIRY on the hit event (host discounts)
            pay = aux[b] if payoff.startswith("one") else (1.0 - aux[b])
        elif barrier_kind:
            vanilla = jnp.maximum(cp * (s0 * jnp.exp(xs[b]) - strike), 0.0)
            pay = vanilla * (aux[b] if knock_in else (1.0 - aux[b]))
        else:
            lvl = s0 * jnp.exp(xs[b])
            pay = jnp.maximum(cp * (lvl - strike), 0.0)
        acc += pay
        acc2 += pay * pay
        if greeks:
            sgn = (1.0, -1.0, 1.0, -1.0)[b]
            z1b = gz1[b // 2]  # branch's first-step normal is sgn·stream
            acc_d += pay * (sgn * z1b)
            acc_g += pay * (z1b * z1b - 1.0)
            acc_v += pay * gvs[b]
            if lb_greeks:
                at0 = jnp.where(aux[b] == 0.0, 1.0, 0.0)
                if payoff == "lookback_fixed":
                    itm = jnp.where(cp * (s0 - strike) > 0.0, 1.0, 0.0)
                    f0 = cp * at0 * itm
                else:  # float: call pays S_T − min (−), put max − S_T (+)
                    f0 = (-at0) if cp > 0 else at0
                acc_b0 += f0
                acc_b1 += f0 * (sgn * z1b)
    accs = [acc, acc2]
    if greeks:
        accs += [acc_d, acc_g, acc_v]
    if lb_greeks:
        accs += [acc_b0, acc_b1]
    for off in range(0, LANES, 128):
        for ref, a in zip(refs, accs):
            ref[:, :] += a[:, off:off + 128]


@functools.partial(jax.jit, static_argnames=("n_steps", "n_blocks", "cp",
                                             "payoff", "sampler"))
def _lv_price_pipeline(seed, p, df, *, n_steps, n_blocks, cp, payoff,
                       sampler):
    """Launch + moment reduction in ONE jitted program — the eager
    reduction tail cost extra RPC round-trips per call over the tunnel
    (CLAUDE.md: hot paths must be single jitted programs)."""
    from .exotic_pallas import _mean_stderr

    pay, pay2 = _launch(seed, p, n_steps=n_steps, n_blocks=n_blocks,
                        cp=cp, payoff=payoff, sampler=sampler)
    price, se, _ = _mean_stderr(pay, pay2, n_blocks * PATHS_PER_BLOCK, df,
                                sampler)
    return price, se


@functools.partial(jax.jit, static_argnames=("n_steps", "n_blocks", "cp",
                                             "payoff", "sampler", "greeks"))
def _launch(seed, params, *, n_steps: int, n_blocks: int, cp: float,
            payoff: str, sampler: str = "prng", greeks: bool = False):
    if sampler.startswith("sobol"):
        if n_steps < 2:
            raise ValidationError("bridge QMC needs n_steps >= 2 (terminal "
                                  "+ midpoint coordinates)")
        if greeks:
            raise ValidationError(
                "LR scores assume iid normals; the bridge-QMC samplers "
                "correlate increments — use prng/hash for LR Greeks")
    n_out = ((7 if payoff.startswith("lookback") else 5) if greeks else 2)
    acc_spec = pl.BlockSpec((ROWS, 128), lambda b: (0, 0),
                            memory_space=pltpu.VMEM)
    interpret = (False if jax.default_backend() == "tpu"
                 else pltpu.InterpretParams())
    return pl.pallas_call(
        functools.partial(_lv_kernel, n_steps=n_steps, cp=cp, payoff=payoff,
                          sampler=sampler, greeks=greeks),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[acc_spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((ROWS, 128), jnp.float32)] * n_out,
        cost_estimate=pl.CostEstimate(
            flops=n_blocks * n_steps * ROWS * LANES * 4 * (28 if greeks else 20),
            bytes_accessed=n_out * ROWS * 128 * 4,
            transcendentals=n_blocks * n_steps * ROWS * LANES * 4,
        ),
        interpret=interpret,
    )(seed, params)


def fit_sigma_polys(sigma_fn, spot, rate, dividend, maturity, n_steps: int,
                    n_fit: int = 41):
    """Per-step least-squares polynomial fits of σ(x = log(S/S0), t_i)
    over that step's REACHABLE band (drift center ± 4 ATM stddevs — tight
    fits exactly where the paths live, which is what makes degree-6
    enough even for steep smiles).

    ``sigma_fn(s, t) -> vol`` is any callable (e.g. a calibrated
    :class:`models.local_vol.LocalVolSurface`). Returns (rows
    (n_steps, DEGREE+3) of [x_lo, x_hi, c_deg..c_0], and the worst
    per-step DENSITY-WEIGHTED rms fit residual (vols).
    """
    t_total = max(float(maturity), EPS_TIME)
    dt = t_total / n_steps
    times = np.arange(n_steps) * dt
    # TWO batched surface evaluations total (per-dispatch RPC over the
    # tunnel is 0.5-3 s — an eager call per step would dominate): first
    # the ATM term structure, then every (s, t) fit point at once
    atms = np.asarray(sigma_fn(jnp.full(n_steps, float(spot), jnp.float32),
                               jnp.asarray(times, jnp.float32)),
                      np.float64).ravel()
    centers = (float(rate) - float(dividend) - 0.5 * atms**2) * times
    halves = 4.0 * atms * np.sqrt(times) + 0.05
    xg = centers[:, None] + np.linspace(-1.0, 1.0, n_fit) * halves[:, None]
    sg = float(spot) * np.exp(xg)
    tg = np.broadcast_to(times[:, None], xg.shape)
    vols = np.asarray(sigma_fn(jnp.asarray(sg.ravel(), jnp.float32),
                               jnp.asarray(tg.ravel(), jnp.float32)),
                      np.float64).reshape(xg.shape)
    rows = np.empty((n_steps, _ROW), np.float64)
    resid = 0.0
    for i in range(n_steps):
        # density-weighted fit: bilinear surfaces are piecewise linear
        # (kinked), and a polynomial cannot chase wing kinks — weight by
        # the path density so the fit is tight where the paths are
        sd = max(atms[i] * math.sqrt(times[i]), 0.02)
        dens = np.exp(-0.5 * ((xg[i] - centers[i]) / sd) ** 2)
        c = np.polyfit(xg[i], vols[i], DEGREE, w=np.sqrt(dens))
        rows[i] = np.concatenate([[xg[i, 0], xg[i, -1]], c])
        err = np.polyval(c, xg[i]) - vols[i]
        resid = max(resid, float(np.sqrt((dens * err**2).sum() / dens.sum())))
    return rows, resid


class LocalVolKernelPricer:
    """Fit once, price many: precomputes the per-step σ-polynomial table
    (the host-side cost — ~100 surface evals + polyfits) at construction,
    then every ``price`` call is a single kernel launch. Use this for
    repeated pricing; :func:`pallas_local_vol_price` is the one-shot
    convenience that refits every call."""

    def __init__(self, dupire, maturity, n_steps: int = 100):
        self.spot = float(dupire.spot)
        self.rate = float(dupire.rate)
        self.dividend = float(dupire.dividend)
        self.t_total = max(float(maturity), EPS_TIME)
        self.n_steps = int(n_steps)
        self.rows, self.fit_residual = fit_sigma_polys(
            dupire.surface, self.spot, self.rate, self.dividend,
            self.t_total, self.n_steps)
        dt = self.t_total / self.n_steps
        self._head = np.asarray(
            [self.spot, 0.0, (self.rate - self.dividend) * dt, dt,
             math.sqrt(dt), 0.0, 0.0, self.rate * dt], np.float64)

    PAYOFFS = ("european", "asian", "range_accrual",
               "barrier_up-and-out", "barrier_up-and-in",
               "barrier_down-and-out", "barrier_down-and-in",
               "lookback_float", "lookback_fixed",
               "one_touch_up", "one_touch_down", "no_touch_up",
               "no_touch_down",
               # double kinds take (lower, upper) via the lower/upper kwargs
               "barrier_double-out", "barrier_double-in",
               "one_touch_double", "no_touch_double",
               # pay-at-hit one-touches (in-kernel first-hit discounting)
               "one_touch_up_hit", "one_touch_down_hit",
               "one_touch_double_hit")

    def _params(self, strike, payoff, barrier, lower=0.0, upper=0.0):
        if payoff not in self.PAYOFFS:
            raise ValidationError(
                f"payoff must be one of {self.PAYOFFS}, got {payoff!r}")
        head = self._head.copy()
        head[_P_K] = float(strike)
        if "double" in payoff or payoff == "range_accrual":
            if not 0.0 < float(lower) < float(upper):
                raise ValidationError(
                    "double/range kinds need 0 < lower < upper")
            head[_P_BARRIER] = math.log(float(lower) / self.spot)
            head[_P_BARRIER2] = math.log(float(upper) / self.spot)
        elif payoff.startswith("barrier") or "touch" in payoff:
            if barrier <= 0.0:
                raise ValidationError("barrier level must be positive")
            head[_P_BARRIER] = math.log(barrier / self.spot)
        return np.concatenate([head, self.rows.ravel()])

    def price(self, strike, cp: float = 1.0, payoff: str = "european",
              barrier: float = 0.0, n_paths: int = 1_000_000, seed: int = 0,
              sampler: str = "prng", lower: float = 0.0,
              upper: float = 0.0):
        """(price, stderr, actual_paths) for one contract on the
        precomputed surface table. Barrier kinds monitor discretely at
        every step and price CONSISTENTLY with the vanilla smile — the
        point of a local-vol model (the reference's local vol prices
        vanillas only); lookback kinds track the discrete extremum.

        ``sampler="sobol_bb"`` enables the 8-level hybrid bridge QMC
        (needs ``n_steps >= 2``); the reported stderr is then the
        randomized-replication estimate over the kernel's 8 group-
        scrambled Sobol replicates — trustworthy under QMC (see
        exotic_pallas._mean_stderr)."""
        p = self._params(strike, payoff, barrier, lower, upper)
        n_blocks = max(1, math.ceil(n_paths / PATHS_PER_BLOCK))
        df = (1.0 if payoff.endswith("_hit")  # discounted at hit in-kernel
              else math.exp(-self.rate * self.t_total))
        price, se = _lv_price_pipeline(
            np.asarray([seed, 0], np.int32), np.asarray(p, np.float32),
            np.float32(df), n_steps=self.n_steps, n_blocks=n_blocks,
            cp=float(cp), payoff=payoff, sampler=sampler)
        return price, se, n_blocks * PATHS_PER_BLOCK

    def greeks(self, strike, cp: float = 1.0, payoff: str = "european",
               barrier: float = 0.0, n_paths: int = 1_000_000, seed: int = 0,
               sampler: str = "prng", lower: float = 0.0,
               upper: float = 0.0) -> dict:
        """Price + stderr + likelihood-ratio delta/gamma/vega in the same
        kernel pass, for ANY payoff kind (LR differentiates the transition
        densities, so barrier/lookback discontinuities cost nothing).

        CONVENTION: delta/gamma are the STICKY-STRIKE (Dupire-model)
        hedge ratios — the local-vol surface σ(S, t) stays fixed in
        PHYSICAL spot when S0 bumps (the model's own dynamics). A spot
        bump is an initial log-state shift, and only the first transition
        density depends on the start state; its score includes the
        σ'(x₀) slope terms, which ride the same reduced moments — delta
        is exact for ANY payoff kind. Gamma omits the second-order
        σ'/σ'' score terms (exact up to O(dt·skew); the CRN-FD oracle
        bounds the residual at test settings).
        ``vega`` is the parallel surface shift ∂price/∂ε for σ(·,·)+ε.
        Oracles in the tests: CRN finite differences with the table
        RE-FITTED from the same physical surface at the bumped spot
        (= sticky-strike) and with every step's c₀ bumped (= parallel
        shift).
        """
        p = self._params(strike, payoff, barrier, lower, upper)
        n_blocks = max(1, math.ceil(n_paths / PATHS_PER_BLOCK))
        outs = _launch(np.asarray([seed, 0], np.int32),
                       np.asarray(p, np.float32),
                       n_steps=self.n_steps, n_blocks=n_blocks,
                       cp=float(cp), payoff=payoff, sampler=sampler,
                       greeks=True)
        return self._combine_greeks(outs, n_blocks * PATHS_PER_BLOCK,
                                    payoff)

    def _combine_greeks(self, outs, n: int, payoff: str) -> dict:
        """Moment tiles → ladder dict (shared with the sharded path,
        which psums the tiles over the mesh before this runs once)."""
        from .exotic_pallas import _mean_stderr

        df = (1.0 if payoff.endswith("_hit")
              else math.exp(-self.rate * self.t_total))
        price, se, _ = _mean_stderr(outs[0], outs[1], n, df)
        # sigma and its x-slope at the common start state x=0, step 0
        # (deterministic — all paths share it)
        c0 = self.rows[0]
        x0c = float(np.clip(0.0, c0[0], c0[1]))
        sig0 = max(float(np.polyval(c0[2:], x0c)), 1e-4)
        dsig0 = float(np.polyval(np.polyder(c0[2:]), x0c))
        sqdt = math.sqrt(self.t_total / self.n_steps)
        m_d = float(outs[2].sum()) / n
        m_g = float(outs[3].sum()) / n
        m_v = float(outs[4].sum()) / n
        # first-step score incl. the sigma'(x0) state-dependence of the
        # transition density: z1/(sig0*sqdt) + (sig0'/sig0)(z1^2-1)
        # - sig0'*sqdt*z1 — the correction terms ride the SAME reduced
        # moments (m_d, m_g), so the sticky-strike delta is exact even on
        # steeply skewed surfaces at coarse step counts
        delta = (df / self.spot) * (m_d / (sig0 * sqdt)
                                    + dsig0 / sig0 * m_g
                                    - dsig0 * sqdt * m_d)
        gamma = (df * m_g / (self.spot * sig0 * sqdt) ** 2
                 - delta / self.spot)
        if payoff.startswith("lookback"):
            # boundary terms: the extremum includes S0, so the payoff has
            # a direct start-state dependence (∂f/∂x₀ = S0·b₀ when the
            # extremum is attained at t=0); completes the density scores
            m_b0 = float(outs[5].sum()) / n
            m_b1 = float(outs[6].sum()) / n
            delta = delta + df * m_b0
            gamma = gamma + 2.0 * df * m_b1 / (self.spot * sig0 * sqdt)
        return {"price": price, "std_error": se, "delta": delta,
                "gamma": gamma, "vega": df * m_v, "paths": n,
                "fit_residual": self.fit_residual}


def pallas_local_vol_price(dupire, strike, maturity, cp: float = 1.0,
                           payoff: str = "european",
                           n_paths: int = 1_000_000, n_steps: int = 100,
                           seed: int = 0, sampler: str = "prng"):
    """European / arithmetic-Asian price under a calibrated Dupire surface
    on the fused kernel. ``dupire`` is a ``models.local_vol.DupireLocalVol``
    (or anything with ``.surface`` (callable), ``.spot``, ``.rate``,
    ``.dividend``). Returns (price, stderr, actual_paths, fit_residual) —
    ``fit_residual`` is the worst per-step density-weighted rms error of
    the polynomial σ fits (vols) — check it before trusting the price.
    """
    pricer = LocalVolKernelPricer(dupire, maturity, n_steps)
    price, se, n = pricer.price(strike, cp=cp, payoff=payoff,
                                n_paths=n_paths, seed=seed, sampler=sampler)
    return price, se, n, pricer.fit_residual
