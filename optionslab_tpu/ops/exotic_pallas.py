"""Fused Pallas kernels for path-dependent (exotic) payoffs.

Extends the terminal-GBM kernel (``gbm_pallas.py``) with an IN-KERNEL time
loop: each grid step simulates a block of paths through ALL time steps,
carrying running statistics (sum / log-sum / min / max / barrier-crossed /
coupon state) in VMEM registers — the payoff is computed from the
statistics inside the kernel and only a handful of (ROWS, 128) moment
accumulators ever leave the chip.

This is the speed-of-light version of the ``lax.scan`` exotic engine
(``models/exotics.py``): no per-step HBM traffic at all, hardware PRNG,
and the Box–Muller cos/sin × (±antithetic) trick giving four path states
per random draw. The scan engine remains the reference implementation and
the general AD path; tests cross-check the two statistically.

Reference capability anchors: ``src/pricing_models/exotic_options.py``
(Asian :83, barrier :174, lookback :347, autocallable :404-491, cliquet
:494-554) and ``src/greeks/unified_greeks.py:177,235`` (exotic Greeks via
FD re-pricing — here Greeks come out of the SAME kernel pass).

Payoff kinds (static): asian_arith / asian_geo (call/put), lookback_float
/ lookback_fixed (call/put), barrier up/down × in/out (call/put, discrete
monitoring at every step), cliquet (local/global caps), autocall
(snowball: autocall/coupon/knock-in barriers at discrete observations).

In-kernel Greeks (:func:`pallas_exotic_greeks`, Asian + lookback): the
kernel additionally carries the Brownian path value W and payoff-specific
derivative accumulators, and reduces three pathwise moments

    P0 = Σ cp·1{exercise}·A          (Σ payoff-homogeneous part)
    G1 = Σ cp·1{exercise}·⟨S, W⟩     (Brownian-weighted moment)
    G2 = Σ cp·1{exercise}·⟨S, t/T⟩   (time-weighted moment)

from which delta/vega/rho/theta (and dividend-rho) follow by closed-form
chain rules host-side — the full first-order ladder in ONE pass instead
of the scan engine's ~1000× slower AD replay or the reference's 4+ FD
re-pricings.

Samplers: ``prng`` (default) uses the TPU hardware PRNG — fastest, but the
CPU TPU-interpreter stubs it with zeros, so off-TPU tests use ``hash``, a
counter-based murmur3-style generator built from pure int32 ops that runs
bit-identically on TPU and under the interpreter (cross-platform
determinism + CPU-verifiable end-to-end numerics).
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
from .gbm_pallas import _QMC_BITS, _mix32, _sobol_pair
from .kernel_rng import TWO_PI, draw_normals as _draw_normals_impl
from .rng import _direction_matrix

# static 30-bit direction-number table for the first 8 Sobol dimensions
# (Joe–Kuo D6 via ops/rng; baked as Python ints → unrolled XORs in-kernel)
_V8 = tuple(tuple(int(x) for x in row) for row in _direction_matrix()[:8])


def _sobol_nd(idx, scrambles, n_dim: int):
    """n_dim ≤ 8 scrambled-Sobol uniforms for integer point indices
    ``idx`` — the n-D generalization of ``gbm_pallas._sobol_pair``
    (Gray-code XOR of static direction numbers, unrolled int32 ops;
    per-dimension digital-shift scrambles preserve the net)."""
    gray = idx ^ (idx >> 1)
    xs = [jnp.zeros_like(idx) for _ in range(n_dim)]
    for k in range(_QMC_BITS):
        bit = (gray >> k) & 1
        for d in range(n_dim):
            xs[d] = xs[d] ^ (bit * _V8[d][k])
    inv = 1.0 / (1 << _QMC_BITS)
    return [((x ^ s).astype(jnp.float32) * inv + 0.5 * inv)
            for x, s in zip(xs, scrambles)]


def _bridge_plan(n_steps: int, max_levels: int):
    """Static dyadic-bisection plan for the bridge coordinates.

    Returns (sorted boundary list including 0 and n_steps, constructs:
    [(mid, lo, hi)] in conditional-sampling order — BFS bisection, so
    coordinate importance matches Sobol dimension quality)."""
    from collections import deque

    bounds = [0, n_steps]
    constructs = []
    q = deque([(0, n_steps)])
    while len(constructs) < max_levels - 1 and q:
        a, b = q.popleft()
        if b - a < 2:
            continue
        m = (a + b) // 2
        constructs.append((m, a, b))
        bounds.append(m)
        q.append((a, m))
        q.append((m, b))
    return sorted(bounds), constructs

ROWS = 128  # path-block sublanes
LANES = 512  # path-block lanes (price kernel)
LANES_G = 256  # Greeks kernel: ~18 carried tiles, keep VMEM pressure low

PAYOFF_KINDS = (
    "asian_arith", "asian_geo", "lookback_float", "lookback_fixed",
    "barrier_up-and-out", "barrier_up-and-in", "barrier_down-and-out",
    "barrier_down-and-in", "cliquet", "autocall",
    # digital barriers: unit cash at EXPIRY if the barrier was hit
    # (one-touch) / never hit (no-touch) on the monitoring grid
    "one_touch_up", "one_touch_down", "no_touch_up", "no_touch_down",
    # internal: arithmetic-Asian payoff MINUS its geometric control
    # variate (exact closed-form mean added back host-side)
    "asian_arith_cv",
    # range accrual: notional * (fraction of monitoring steps with
    # L <= S <= U), paid at expiry (corridor / fairway note)
    "range_accrual",
    # double barrier: knock band (lower, upper) monitored every step;
    # vanilla payoff killed (out) / activated (in) on first exit, plus the
    # digital pair (unit cash at expiry on exit / no-exit). Continuous-
    # monitoring closed-form oracle: models/exotics.double_barrier_closed_form
    "barrier_double-out", "barrier_double-in",
    "one_touch_double", "no_touch_double",
    # PAY-AT-HIT one-touches (American binaries, the market-standard
    # convention): unit cash discounted at the FIRST hit step, carried
    # in-kernel (host df = 1, like autocall). Closed-form oracle:
    # models/exotics.one_touch_closed_form(pay="hit") (Rubinstein-Reiner
    # rebate-at-hit). KO rebates compose: KO + R * one_touch_*_hit.
    "one_touch_up_hit", "one_touch_down_hit", "one_touch_double_hit",
)
GREEK_KINDS = ("asian_arith", "asian_geo", "lookback_float", "lookback_fixed")

# params float32 vector layout (SMEM)
_P_S0, _P_K, _P_DRIFT_DT, _P_VOLSQDT, _P_BARRIER, _P_INV_N, _P_GROWTH, \
    _P_RDT, _P_SQDT, _P_A, _P_B, _P_C, _P_D, _P_E = range(14)
N_PARAMS = 14


_draw_normals = _draw_normals_impl  # shared with the other kernels (kernel_rng)


# ---------------------------------------------------------------------------
# Price kernel (all payoff kinds)
# ---------------------------------------------------------------------------
def _exotic_kernel(seed_ref, param_ref, *refs, kind: str,
                   n_steps: int, cp: float, period: int, sampler: str,
                   lr: bool = False, n_contracts: int = 1):
    # seed_ref = [seed, block0]: RNG streams index by GLOBAL block id so a
    # sharded launch owning blocks [block0, block0+n) reproduces exactly
    # the single-device path set; init fires on the first LOCAL grid step
    #
    # lr=True additionally reduces likelihood-ratio score moments — the
    # payoff-AGNOSTIC Greek method (scores differentiate the path DENSITY,
    # so discontinuous payoffs like barriers/autocalls get unbiased
    # delta/gamma/vega/rho from the same pass):
    #   D1 = Σ pay·z₁            (first-step score → delta)
    #   DG = Σ pay·(z₁²−1)       (→ gamma)
    #   DZ = Σ pay·Σᵢzᵢ          (→ rho, vega drift term, theta drift term)
    #   D2 = Σ pay·Σᵢ(zᵢ²−1)     (→ vega, theta)
    #   DR = Σ ∂pv/∂r|explicit   (autocall only: the in-kernel coupon
    #        discount derivative −Σ tᵢ·dfᵢ·cashᵢ → rho and theta)
    hit_pay = kind.endswith("_hit")  # cash discounted at first hit
    if n_contracts > 1:
        # contract-book launch: rows interleave contracts (contract id =
        # rid % n_contracts); per-contract payoff params ride SMEM
        book_ref, *refs = refs
    if lr:
        if kind == "autocall" or hit_pay:
            (pay_ref, pay2_ref, d1_ref, dg_ref, dz_ref, d2_ref,
             dr_ref) = refs
        else:
            pay_ref, pay2_ref, d1_ref, dg_ref, dz_ref, d2_ref = refs
    else:
        pay_ref, pay2_ref = refs
    block = pl.program_id(0) + seed_ref[1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in refs:
            ref[:, :] = jnp.zeros_like(ref)

    qmc = sampler.startswith("sobol_bb")
    # QMC residuals ALWAYS ride the counter-based hash stream: replay of
    # pass 1 in pass 2 is exact by construction (no PRNG reseed trick),
    # and the hardware-PRNG variant of the segmented two-pass structure
    # trips a pathological Mosaic compile (>25 min vs 26 s)
    residual = "hash" if (qmc or sampler == "hash"
                          or sampler.endswith("hash")) else "prng"
    if residual != "hash":
        pltpu.prng_seed(seed_ref[0] + block * jnp.int32(-1640531535))
    seed = seed_ref[0]

    s0 = param_ref[_P_S0]
    inv_s0 = 1.0 / s0
    drift_dt = param_ref[_P_DRIFT_DT]
    vol_sqrt_dt = param_ref[_P_VOLSQDT]
    inv_n = param_ref[_P_INV_N]
    # exp(drift_dt) computed host-side at full precision: the in-kernel fast
    # exp's absolute error near 1 would compound across all n_steps
    growth = param_ref[_P_GROWTH]
    rdt = param_ref[_P_RDT]
    if n_contracts > 1:
        # per-contract payoff params as (ROWS, 1) row tiles (broadcast
        # against the (ROWS, LANES) path tiles): book slot layout
        # [K, BARRIER, A, B, C, D, E] per contract, contract = rid % nc
        ridc = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0) \
            % n_contracts

        def _row(slot):
            v = jnp.full((ROWS, 1), book_ref[slot], jnp.float32)
            for c in range(1, n_contracts):
                v = jnp.where(ridc == c, book_ref[c * 7 + slot], v)
            return v

        strike, barrier = _row(0), _row(1)
        pA, pB, pC, pD, pE = (_row(2), _row(3), _row(4), _row(5), _row(6))
    else:
        strike = param_ref[_P_K]
        barrier = param_ref[_P_BARRIER]
        pA, pB = param_ref[_P_A], param_ref[_P_B]
        pC, pD, pE = param_ref[_P_C], param_ref[_P_D], param_ref[_P_E]

    shape = (ROWS, LANES)
    barrier_up = "up" in kind
    knock_in = kind.endswith("in")
    geo = kind.startswith("asian_geo")  # carried in log space (no per-step exp)

    def init_stat(s_like):
        if kind == "asian_arith_cv":
            # running (Σ S_i seeded with S0, Σ log(S_i/S0))
            return (s_like, jnp.zeros(shape, jnp.float32))
        if kind.startswith("asian_arith"):
            return (s_like,)  # running sum of S, seeded with S0 (removed in payoff)
        if geo:
            return (jnp.zeros(shape, jnp.float32),)
        if kind.startswith("lookback"):
            return (s_like,)  # running extremum seeded at S0
        if kind == "cliquet":
            # (period-start spot, capped-return accumulator)
            return (s_like, jnp.zeros(shape, jnp.float32))
        if kind == "autocall":
            # (alive, knocked-in, pv of coupons/redemptions, all float 0/1;
            # +∂pv/∂r explicit when the LR ladder is on)
            base_stat = (jnp.ones(shape, jnp.float32),
                         jnp.zeros(shape, jnp.float32),
                         jnp.zeros(shape, jnp.float32))
            return base_stat + ((jnp.zeros(shape, jnp.float32),)
                                if lr else ())
        if kind == "range_accrual":
            # steps 1..n accrue (S0 excluded, the averages convention)
            return (jnp.zeros(shape, jnp.float32),)
        if hit_pay:
            if "double" in kind:
                h0 = (s_like <= pA) | (s_like >= pB)
            else:
                h0 = (s_like >= barrier) if barrier_up \
                    else (s_like <= barrier)
            h0 = h0.astype(jnp.float32)
            # (hit flag, pv = df-at-first-hit; df(0) = 1 [, dr])
            return (h0, h0) + ((jnp.zeros(shape, jnp.float32),)
                               if lr else ())
        if "double" in kind:
            hit0 = (s_like <= pA) | (s_like >= pB)
            return (hit0.astype(jnp.float32),)
        hit0 = (s_like >= barrier) if barrier_up else (s_like <= barrier)
        return (hit0.astype(jnp.float32),)

    def update_stat(stat, s_or_log, i):
        if kind == "asian_arith_cv":
            # the log argument sits near 1, where the TPU fast-log error
            # is benign (absolute log-prices would bias the geo leg)
            return (stat[0] + s_or_log,
                    stat[1] + jnp.log(s_or_log * inv_s0))
        if kind.startswith("asian_arith"):
            return (stat[0] + s_or_log,)
        if geo:
            return (stat[0] + s_or_log,)  # log-spot
        if kind.startswith("lookback"):
            if cp > 0 and kind == "lookback_float":
                return (jnp.minimum(stat[0], s_or_log),)  # float call pays S_T - min
            if cp < 0 and kind == "lookback_float":
                return (jnp.maximum(stat[0], s_or_log),)
            if cp > 0:
                return (jnp.maximum(stat[0], s_or_log),)  # fixed call pays max - K
            return (jnp.minimum(stat[0], s_or_log),)
        if kind == "cliquet":
            s_start, acc = stat
            is_end = jnp.where((i + 1) % period == 0, 1.0, 0.0)
            capped = jnp.clip(s_or_log / s_start - 1.0,
                              pA, pB)
            acc = acc + is_end * capped
            s_start = s_start + is_end * (s_or_log - s_start)
            return (s_start, acc)
        if kind == "autocall":
            alive, ki, pv = stat[:3]
            ki = jnp.maximum(ki, jnp.where(s_or_log <= pC, 1.0, 0.0))
            is_obs = jnp.where((i + 1) % period == 0, 1.0, 0.0)
            df_i = jnp.exp(-rdt * (i + 1).astype(jnp.float32))
            called = alive * is_obs * jnp.where(s_or_log >= pA, 1.0, 0.0)
            couponed = alive * is_obs * jnp.where(s_or_log >= pB, 1.0, 0.0)
            cash = pD * couponed + pE * called
            pv = pv + df_i * cash
            alive = alive * (1.0 - called)
            if lr:
                # ∂(dfᵢ·cash)/∂r = −tᵢ·dfᵢ·cash, tᵢ = (i+1)·dt
                dt = param_ref[_P_SQDT] * param_ref[_P_SQDT]
                t_i = dt * (i + 1).astype(jnp.float32)
                return (alive, ki, pv, stat[3] - t_i * df_i * cash)
            return (alive, ki, pv)
        if kind == "range_accrual":
            acc = jnp.where((s_or_log >= pA)
                            & (s_or_log <= pB), 1.0, 0.0)
            return (stat[0] + acc,)
        if hit_pay:
            h, pv = stat[:2]
            if "double" in kind:
                now = ((s_or_log <= pA)
                       | (s_or_log >= pB))
            else:
                now = (s_or_log >= barrier) if barrier_up \
                    else (s_or_log <= barrier)
            now = now.astype(jnp.float32)
            newly = (1.0 - h) * now
            steps = (i + 1).astype(jnp.float32)
            df_i = jnp.exp(-rdt * steps)
            pv = pv + newly * df_i
            if lr:  # ∂pv/∂r = −t_hit·df_hit on the newly-hit event
                dt = param_ref[_P_SQDT] * param_ref[_P_SQDT]
                return (jnp.maximum(h, now), pv,
                        stat[2] - steps * dt * newly * df_i)
            return (jnp.maximum(h, now), pv)
        if "double" in kind:
            hit = ((s_or_log <= pA)
                   | (s_or_log >= pB))
            return (jnp.maximum(stat[0], hit.astype(jnp.float32)),)
        hit = (s_or_log >= barrier) if barrier_up else (s_or_log <= barrier)
        return (jnp.maximum(stat[0], hit.astype(jnp.float32)),)

    def payoff(stat, s_or_log):
        # geo carries RELATIVE log-spots (x - log S0): the final exp sees
        # a small argument, where the TPU fast-exp error is benign (at
        # |arg| ~ log(100) its relative error alone is a ~2e-3 price bias)
        s_t = s0 * jnp.exp(s_or_log) if geo else s_or_log
        if kind == "asian_arith_cv":
            avg = (stat[0] - s0) * inv_n
            geo_avg = s0 * jnp.exp(stat[1] * inv_n)
            return (jnp.maximum(cp * (avg - strike), 0.0)
                    - jnp.maximum(cp * (geo_avg - strike), 0.0))
        if kind.startswith("asian"):
            if kind.startswith("asian_arith"):
                avg = (stat[0] - s0) * inv_n
            else:
                avg = s0 * jnp.exp(stat[0] * inv_n)
            return jnp.maximum(cp * (avg - strike), 0.0)
        if kind == "lookback_float":
            return (s_t - stat[0]) if cp > 0 else (stat[0] - s_t)
        if kind == "lookback_fixed":
            return jnp.maximum(cp * (stat[0] - strike), 0.0)
        if kind == "cliquet":
            # notional · clip(Σ capped period returns, global floor, cap)
            return pE * jnp.clip(stat[1], pC, pD)
        if kind == "autocall":
            alive, ki, pv = stat[:3]
            df_t = jnp.exp(-rdt * float(n_steps))
            loss = jnp.maximum(1.0 - s_t / s0, 0.0)
            final = pE * (1.0 - ki * loss)
            return pv + alive * df_t * final  # already discounted in-kernel
        if hit_pay:
            return stat[1]  # df-at-hit carried in-kernel (host df = 1)
        if "touch" in kind:
            # unit cash at expiry on the hit / no-hit event (host-side df)
            return stat[0] if kind.startswith("one") else (1.0 - stat[0])
        if kind == "range_accrual":
            return pE * stat[0] * inv_n
        vanilla = jnp.maximum(cp * (s_t - strike), 0.0)
        return vanilla * (stat[0] if knock_in else (1.0 - stat[0]))

    # geo always, and EVERY kind under QMC, carries relative log-spots
    # (additive f32-exact updates — see make_body); stats always seed from
    # the PRICE-space start (init_stat ignores it for geo)
    if geo or qmc:
        state0 = jnp.zeros(shape, jnp.float32)  # RELATIVE log-spot x−lnS0
    else:
        state0 = jnp.full(shape, s0, jnp.float32)
    price0 = jnp.full(shape, s0, jnp.float32)
    states = (state0, state0, state0, state0)
    stats = tuple(init_stat(price0) for _ in range(4))
    zero = jnp.zeros(shape, jnp.float32)

    if qmc:
        # Hybrid bridge QMC, up to EIGHT dyadic bridge coordinates: a
        # scrambled Sobol point per path drives the terminal sum and up
        # to 7 recursive-bisection midpoint sums (the dominant principal
        # components of an Asian/European payoff's variance);
        # counter-replayable residual normals fill in conditionally
        # within each segment. All in z-units (sums of standard normals),
        # so the existing vol·√dt scaling applies.
        bounds, constructs = _bridge_plan(n_steps, 8)
        n_dim = 1 + len(constructs)
        n_pairs = (n_dim + 1) // 2
        rid = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        cid = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        # R=8 independently-scrambled replicates, one per row-group
        # (rid % 8): each group consumes its OWN dense Sobol stream under
        # a group-salted digital scramble, so the host can quote an
        # HONEST randomized-QMC error bar from the per-row sums it
        # already receives (std over the 8 replicate means) — the
        # plain-MC stderr formula is wrong in both directions under QMC.
        g_id = rid & 7
        idx = block * ((ROWS // 8) * LANES) + (rid >> 3) * LANES + cid + 1
        mask30 = jnp.int32((1 << _QMC_BITS) - 1)
        h0 = _mix32((seed + g_id * jnp.int32(0x3C6EF372))
                    * jnp.int32(-1640531535) + jnp.int32(0x632BE5AB))
        scrambles = []
        h = h0
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
        # pinned cumulative z-sums at the bridge boundaries
        csum = {0: zero, n_steps: math.sqrt(float(n_steps)) * g[0]}
        for (m, a, b), gd in zip(constructs, g[1:]):
            frac = (m - a) / (b - a)
            sd = math.sqrt((m - a) * (b - m) / (b - a))
            csum[m] = csum[a] + (csum[b] - csum[a]) * frac + sd * gd
        segs = list(zip(bounds[:-1], bounds[1:]))
        targets = [csum[b] - csum[a] for a, b in segs]

        # pass 1: per-SEGMENT residual sums of both draw streams
        # (sequential segment loops preserve the counter order for the
        # pass-2 replay)
        def pre(i, carry):
            sc, ss = carry
            z1, z2 = _draw_normals(residual, seed, block, i, n_steps, shape)
            return sc + z1, ss + z2

        seg_sums = []
        for a, b in segs:
            seg_sums.append(jax.lax.fori_loop(a, b, pre, (zero, zero)))
        if residual != "hash":  # replay the hardware PRNG stream in pass 2
            pltpu.prng_seed(seed_ref[0] + block * jnp.int32(-1640531535))
    # (z₁ at step 0, Σz, Σ(z²−1)) per draw stream (cos, sin); antithetic
    # branches flip the SIGNED pieces, share the squared one. No dead
    # carries in the price-only variant (mirrors the heston kernel).
    scores = (zero, zero, zero, zero, zero, zero) if lr else ()

    def make_body(offs):
        def body(i, carry):
            (xa, xb, xc, xd), (sa, sb, sc, sd), sc6 = carry
            z1, z2 = _draw_normals(residual, seed, block, i, n_steps, shape)
            if offs is not None:
                # conditional-law residuals: each branch's segment sum is
                # pinned to its bridge target by a constant offset. ALL
                # kinds carry RELATIVE log-spots under QMC: the additive
                # update is exact in f32 while any per-step multiplicative
                # offset factor would compound the TPU fast-exp relative
                # error into a ~1e-3 systematic price bias; prices are
                # exponentiated only where consumed (one small-argument
                # exp per branch per stat update).
                oc_p, oc_m, os_p, os_m = offs
                xa = xa + drift_dt + vol_sqrt_dt * (z1 + oc_p)
                xb = xb + drift_dt + vol_sqrt_dt * (-z1 + oc_m)
                xc = xc + drift_dt + vol_sqrt_dt * (z2 + os_p)
                xd = xd + drift_dt + vol_sqrt_dt * (-z2 + os_m)
            elif geo:
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
            if offs is not None and not geo:
                sa = update_stat(sa, s0 * jnp.exp(xa), i)
                sb = update_stat(sb, s0 * jnp.exp(xb), i)
                sc = update_stat(sc, s0 * jnp.exp(xc), i)
                sd = update_stat(sd, s0 * jnp.exp(xd), i)
            else:
                sa = update_stat(sa, xa, i)
                sb = update_stat(sb, xb, i)
                sc = update_stat(sc, xc, i)
                sd = update_stat(sd, xd, i)
            if lr:
                zf1, zf2, sz1, sz2, szz1, szz2 = sc6
                first = i == 0
                sc6 = (jnp.where(first, z1, zf1), jnp.where(first, z2, zf2),
                       sz1 + z1, sz2 + z2,
                       szz1 + z1 * z1 - 1.0, szz2 + z2 * z2 - 1.0)
            return (xa, xb, xc, xd), (sa, sb, sc, sd), sc6

        return body

    if qmc:
        carry = (states, stats, scores)
        for j, (a, b) in enumerate(segs):
            sc_j, ss_j = seg_sums[j]
            inv = 1.0 / (b - a)
            offs = ((targets[j] - sc_j) * inv, (targets[j] + sc_j) * inv,
                    (targets[j] - ss_j) * inv, (targets[j] + ss_j) * inv)
            carry = jax.lax.fori_loop(a, b, make_body(offs), carry)
        states, stats, scores = carry
    else:
        states, stats, scores = jax.lax.fori_loop(
            0, n_steps, make_body(None), (states, stats, scores))

    acc = jnp.zeros(shape, jnp.float32)
    acc2 = jnp.zeros(shape, jnp.float32)
    acc_lr = [jnp.zeros(shape, jnp.float32) for _ in range(4)]
    acc_dr = jnp.zeros(shape, jnp.float32)
    zf1, zf2, sz1, sz2, szz1, szz2 = scores if lr else (zero,) * 6
    branch_scores = ((zf1, sz1, szz1), (-zf1, -sz1, szz1),
                     (zf2, sz2, szz2), (-zf2, -sz2, szz2))
    for (x, st), (zf, sz, szz) in zip(zip(states, stats), branch_scores):
        p = payoff(st, s0 * jnp.exp(x) if (qmc and not geo) else x)
        acc += p
        acc2 += p * p
        if lr:
            acc_lr[0] += p * zf
            acc_lr[1] += p * (zf * zf - 1.0)
            acc_lr[2] += p * sz
            acc_lr[3] += p * szz
            if hit_pay:
                acc_dr += st[2]
            elif kind == "autocall":
                # explicit ∂pv/∂r: coupon part carried in the stat, plus
                # the −T·df_T·(final redemption) term for surviving paths
                alive, ki = st[0], st[1]
                dt = param_ref[_P_SQDT] * param_ref[_P_SQDT]
                df_t = jnp.exp(-rdt * float(n_steps))
                loss = jnp.maximum(1.0 - x / s0, 0.0)
                final = pE * (1.0 - ki * loss)
                acc_dr += st[3] - (dt * float(n_steps)) * df_t * alive * final
    for off in range(0, LANES, 128):
        pay_ref[:, :] += acc[:, off:off + 128]
        pay2_ref[:, :] += acc2[:, off:off + 128]
        if lr:
            for ref, a in zip((d1_ref, dg_ref, dz_ref, d2_ref), acc_lr):
                ref[:, :] += a[:, off:off + 128]
            if kind == "autocall" or hit_pay:
                dr_ref[:, :] += acc_dr[:, off:off + 128]


@functools.partial(jax.jit, static_argnames=("kind", "n_steps", "n_blocks", "cp",
                                             "period", "sampler", "lr",
                                             "n_contracts"))
def _launch(seed, params, book=None, *, kind: str, n_steps: int,
            n_blocks: int, cp: float, period: int = 1,
            sampler: str = "prng", lr: bool = False, n_contracts: int = 1):
    if sampler.startswith("sobol") and n_steps < 2:
        raise ValidationError("bridge QMC needs n_steps >= 2 (terminal + "
                              "midpoint coordinates)")
    n_out = (7 if (kind == "autocall" or kind.endswith("_hit"))
             else 6) if lr else 2
    acc_spec = pl.BlockSpec((ROWS, 128), lambda b: (0, 0), memory_space=pltpu.VMEM)
    interpret = False if jax.default_backend() == "tpu" else pltpu.InterpretParams()
    operands = (seed, params) if n_contracts == 1 else (seed, params, book)
    return pl.pallas_call(
        functools.partial(_exotic_kernel, kind=kind, n_steps=n_steps, cp=cp,
                          period=period, sampler=sampler, lr=lr,
                          n_contracts=n_contracts),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * len(operands),
        out_specs=[acc_spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((ROWS, 128), jnp.float32)] * n_out,
        cost_estimate=pl.CostEstimate(
            flops=n_blocks * n_steps * ROWS * LANES * 4 * (12 if lr else 8),
            bytes_accessed=n_out * ROWS * 128 * 4,
            transcendentals=n_blocks * n_steps * ROWS * LANES * 8,
        ),
        interpret=interpret,
    )(*operands)


PATHS_PER_BLOCK = 4 * ROWS * LANES


def _base_params(spot, strike, maturity, rate, vol, dividend, barrier, n_steps):
    t = max(float(maturity), EPS_TIME)
    dt = t / n_steps
    drift_dt = (float(rate) - float(dividend) - 0.5 * float(vol) ** 2) * dt
    p = [0.0] * N_PARAMS
    p[_P_S0] = float(spot)
    p[_P_K] = float(strike)
    p[_P_DRIFT_DT] = drift_dt
    p[_P_VOLSQDT] = float(vol) * math.sqrt(dt)
    p[_P_BARRIER] = float(barrier)
    p[_P_INV_N] = 1.0 / n_steps
    p[_P_GROWTH] = math.exp(drift_dt)  # full-precision host exp
    p[_P_RDT] = float(rate) * dt
    p[_P_SQDT] = math.sqrt(dt)
    return p, t


def pallas_exotic_price(kind: str, spot, strike, maturity, rate, vol,
                        cp: float = 1.0, dividend: float = 0.0,
                        barrier: float = 0.0, n_paths: int = 1_000_000,
                        n_steps: int = 64, seed: int = 0,
                        sampler: str = "prng",
                        control_variate: bool = False,
                        lower: float = 0.0, upper: float = 0.0):
    """Fused exotic pricing: (price, stderr, actual_paths).

    ``kind`` ∈ PAYOFF_KINDS (cliquet/autocall have dedicated wrappers with
    their structured parameters). Whole simulation is one kernel launch;
    path count rounds up to whole blocks of {PATHS_PER_BLOCK}.

    Samplers: ``prng`` / ``hash`` (plain MC), ``sobol_bb`` /
    ``sobol_bb_hash`` (hybrid bridge QMC: a per-path scrambled Sobol
    point drives up to EIGHT dyadic Brownian-bridge coordinates —
    terminal + 7 recursive midpoints — and replayed residual normals
    fill in conditionally within each segment). Measured gain on a
    16-step geometric Asian: ~24x rms error at one block; the
    full 64-dim bridge on the XLA engine (``models/qmc_exotics``)
    remains the maximum-accuracy path. Under the QMC samplers the
    kernel runs 8 INDEPENDENTLY-SCRAMBLED replicates (one per
    row-group) and the reported stderr is their randomized-QMC
    replication estimate — a trustworthy error bar (the plain
    sqrt(Var/n) formula is wrong in both directions under QMC), same
    construction as ``models/qmc_exotics``'s estimator at kernel speed.

    ``control_variate=True`` (``asian_arith`` only): the kernel prices
    the DIFFERENCE against the geometric-average payoff on the same
    paths and the exact discrete geometric closed form is added back —
    the classic Kemna–Vorst control variate at kernel speed. The
    returned stderr is the stderr of the difference, i.e. the TRUE
    uncertainty of the CV estimator. Composes with any sampler.
    """
    if control_variate:
        if kind != "asian_arith":
            raise ValidationError("control_variate applies to asian_arith "
                                  "(geometric Kemna–Vorst CV)")
        kind = "asian_arith_cv"
    if kind not in PAYOFF_KINDS:
        raise ValidationError(f"unknown exotic kind {kind!r}; choose {PAYOFF_KINDS}")
    if kind in ("cliquet", "autocall", "range_accrual"):
        raise ValidationError(f"use pallas_{kind}_price for structured params")
    if sampler.startswith("sobol") and n_steps < 2:
        raise ValidationError("bridge QMC needs n_steps >= 2 (terminal + "
                              "midpoint coordinates)")
    p, t = _base_params(spot, strike, maturity, rate, vol, dividend, barrier, n_steps)
    if "double" in kind:
        if not 0.0 < lower < upper:
            raise ValidationError("double kinds need 0 < lower < upper")
        p[_P_A], p[_P_B] = float(lower), float(upper)
    n_blocks = max(1, math.ceil(n_paths / PATHS_PER_BLOCK))
    # pay-at-hit kinds discount in-kernel at the hit step: host df = 1
    df = 1.0 if kind.endswith("_hit") else math.exp(-float(rate) * t)
    price, se = _price_pipeline(
        np.asarray([seed, 0], np.int32), np.asarray(p, np.float32),
        np.float32(df), kind=kind, n_steps=n_steps, n_blocks=n_blocks,
        cp=float(cp), sampler=sampler)
    n = n_blocks * PATHS_PER_BLOCK
    if kind == "asian_arith_cv":
        from ..models.exotics import geometric_asian_closed_form

        price = price + geometric_asian_closed_form(
            spot, strike, t, rate, vol, cp, dividend, n_steps)
    return price, se, n


@functools.partial(jax.jit, static_argnames=("kind", "n_steps", "n_blocks",
                                             "cp", "period", "sampler"))
def _price_pipeline(seed, p, df, *, kind, n_steps, n_blocks, cp, period=1,
                    sampler="prng"):
    """Launch + moment reduction in ONE jitted program (one tunnel
    dispatch) — the eager ``_mean_stderr`` tail cost extra RPC
    round-trips per price call, which dominate at short-step workloads
    (CLAUDE.md: "hot paths must be single jitted programs")."""
    pay, pay2 = _launch(seed, p, kind=kind, n_steps=n_steps,
                        n_blocks=n_blocks, cp=cp, period=period,
                        sampler=sampler)
    price, se, _ = _mean_stderr(pay, pay2, n_blocks * PATHS_PER_BLOCK, df,
                                sampler)
    return price, se


def _mean_stderr(pay, pay2, n, df, sampler: str = "prng"):
    """Mean + error bar from the kernel's (ROWS, 128) accumulator tiles.

    Plain-MC samplers: the usual sqrt(Var/n). QMC samplers: the kernel
    runs 8 INDEPENDENTLY-SCRAMBLED Sobol replicates, one per row-group
    (rid % 8), so the per-row sums partition into 8 independent
    estimates and the quoted error is the randomized-QMC replication
    stderr std(replicate means)/sqrt(8) — trustworthy under QMC, where
    sqrt(Var/n) is wrong in both directions (stratification shrinks the
    true error; the four antithetic branches sharing one bridge point
    inflate it). Same construction as ``models/qmc_exotics``'s
    randomized estimator, at kernel speed."""
    total = pay.sum()
    mean = total / n
    if sampler.startswith("sobol"):
        rep = pay.reshape(ROWS // 8, 8, -1).sum(axis=(0, 2)) * (8.0 / n)
        se = rep.std(ddof=1) / math.sqrt(8.0)
        return df * mean, df * se, n
    total2 = pay2.sum()
    var = jnp.maximum(total2 / n - mean * mean, 0.0)
    return df * mean, df * jnp.sqrt(var / n), n


# ---------------------------------------------------------------------------
# Contract books: one launch prices N contracts (mixed strikes/barriers)
# ---------------------------------------------------------------------------
_BOOK_KINDS_EXCLUDED = ("cliquet", "autocall", "range_accrual",
                        "asian_arith_cv")


def _book_pad(n_contracts: int) -> int:
    """Pad the book to the next power of two (rows interleave contracts:
    contract id = rid % nc, so nc must divide ROWS = 128)."""
    if not 1 <= n_contracts <= ROWS:
        raise ValidationError(f"book size must be 1..{ROWS}: {n_contracts}")
    p = 1
    while p < n_contracts:
        p *= 2
    return p


def _book_smem(strikes, barriers, a, b, c, d, e, nc_pad):
    """SMEM book vector: [K, BARRIER, A, B, C, D, E] per contract, the
    book padded by repeating the last contract."""
    nc = len(strikes)

    def at(xs, i):
        return float(xs[min(i, nc - 1)])

    vec = []
    for i in range(nc_pad):
        vec += [at(strikes, i), at(barriers, i), at(a, i), at(b, i),
                at(c, i), at(d, i), at(e, i)]
    return np.asarray(vec, np.float32)


def _book_lists(kind, strikes, barriers, lowers, uppers):
    """Normalize/validate the per-contract param lists for ``kind``."""
    strikes = [float(s) for s in strikes]
    nc = len(strikes)
    if nc == 0:
        raise ValidationError("empty contract book")

    def norm(xs, name, need):
        if xs is None:
            if need:
                raise ValidationError(f"kind {kind!r} needs {name} "
                                      "(one per contract)")
            return [0.0] * nc
        xs = [float(x) for x in xs]
        if len(xs) != nc:
            raise ValidationError(f"{name} must have one entry per "
                                  f"contract ({nc}): got {len(xs)}")
        return xs

    needs_barrier = ("barrier" in kind or "touch" in kind) \
        and "double" not in kind
    needs_band = "double" in kind
    barriers = norm(barriers, "barriers", needs_barrier)
    lowers = norm(lowers, "lowers", needs_band)
    uppers = norm(uppers, "uppers", needs_band)
    if needs_band:
        for lo, up in zip(lowers, uppers):
            if not 0.0 < lo < up:
                raise ValidationError("double kinds need 0 < lower < upper "
                                      "per contract")
    return strikes, barriers, lowers, uppers


def _check_book_call(kind, sampler):
    if kind not in PAYOFF_KINDS or kind in _BOOK_KINDS_EXCLUDED:
        raise ValidationError(
            f"book pricing supports the non-structured PAYOFF_KINDS: "
            f"got {kind!r}")
    if sampler.startswith("sobol"):
        raise ValidationError(
            "book launches support prng|hash samplers (the QMC replicate "
            "groups ride the row axis the book interleaves)")


@functools.partial(jax.jit, static_argnames=("kind", "n_steps", "n_blocks",
                                             "cp", "sampler", "n_contracts"))
def _book_price_pipeline(seed, p, book, df, *, kind, n_steps, n_blocks, cp,
                         sampler="prng", n_contracts=1):
    """One launch + per-contract moment reduction, ONE traced program.
    Reference analog: ``MonteCarloPricerUni.price_batch``
    (``src/pricing_models/monte_carlo_unified.py:562``) — there a Python
    loop over contracts; here contracts interleave the row axis of the
    same path block, so an N-contract book costs ONE tunnel dispatch."""
    pay, pay2 = _launch(seed, p, book, kind=kind, n_steps=n_steps,
                        n_blocks=n_blocks, cp=cp, sampler=sampler,
                        n_contracts=n_contracts)
    n = n_blocks * (ROWS // n_contracts) * LANES * 4
    s1 = pay.reshape(ROWS // n_contracts, n_contracts, -1).sum(axis=(0, 2))
    s2 = pay2.reshape(ROWS // n_contracts, n_contracts, -1).sum(axis=(0, 2))
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    return df * mean, df * jnp.sqrt(var / n)


def pallas_exotic_book_price(kind: str, spot, strikes, maturity, rate, vol,
                             cp: float = 1.0, dividend: float = 0.0,
                             barriers=None, lowers=None, uppers=None,
                             n_paths: int = 1_000_000, n_steps: int = 64,
                             seed: int = 0, sampler: str = "prng"):
    """Price a BOOK of same-kind contracts (mixed strikes / barriers /
    bands) under one GBM dynamics in ONE kernel launch.

    Contracts interleave the row axis (contract id = rid % nc, book
    padded to a power of two), so an N-contract book costs one tunnel
    dispatch instead of N — over the TPU tunnel each dispatch is
    ~0.5–3 s, so this is the difference between interactive and not.
    ``n_paths`` is PER CONTRACT. Returns ``(prices, stderrs, n_paths)``
    with one entry per requested contract.

    Reference analog: ``MonteCarloPricerUni.price_batch``
    (``src/pricing_models/monte_carlo_unified.py:562``)."""
    _check_book_call(kind, sampler)
    strikes, barriers, lowers, uppers = _book_lists(
        kind, strikes, barriers, lowers, uppers)
    nc = len(strikes)
    nc_pad = _book_pad(nc)
    p, t = _base_params(spot, strikes[0], maturity, rate, vol, dividend,
                        barriers[0], n_steps)
    a = lowers if "double" in kind else [0.0] * nc
    b = uppers if "double" in kind else [0.0] * nc
    if "double" in kind:
        # nc_pad == 1 books take the kernel's SCALAR path (the book
        # operand is dropped in _launch): the band must also live in the
        # param vector or a single-contract double book silently prices
        # as immediately knocked
        p[_P_A], p[_P_B] = a[0], b[0]
    zeros = [0.0] * nc
    book = _book_smem(strikes, barriers, a, b, zeros, zeros, zeros, nc_pad)
    paths_per_block = (ROWS // nc_pad) * LANES * 4
    n_blocks = max(1, math.ceil(n_paths / paths_per_block))
    df = 1.0 if kind.endswith("_hit") else math.exp(-float(rate) * t)
    prices, ses = _book_price_pipeline(
        np.asarray([seed, 0], np.int32), np.asarray(p, np.float32),
        book, np.float32(df), kind=kind, n_steps=n_steps,
        n_blocks=n_blocks, cp=float(cp), sampler=sampler,
        n_contracts=nc_pad)
    return prices[:nc], ses[:nc], n_blocks * paths_per_block


@functools.partial(jax.jit, static_argnames=("kind", "n_steps", "n_blocks",
                                             "cp", "sampler", "n_contracts"))
def _book_lr_pipeline(seed, p, book, scalars, *, kind, n_steps, n_blocks,
                      cp, sampler, n_contracts):
    """Book launch(lr=True) → per-contract LR Greek ladders, ONE traced
    program (same score algebra as ``_lr_pipeline``, reduced per
    row-group instead of globally)."""
    outs = _launch(seed, p, book, kind=kind, n_steps=n_steps,
                   n_blocks=n_blocks, cp=cp, sampler=sampler, lr=True,
                   n_contracts=n_contracts)
    n = n_blocks * (ROWS // n_contracts) * LANES * 4
    spot, sig, t, df, mu, rate = scalars
    dt = t / n_steps
    sqdt = jnp.sqrt(dt)

    def red(o):
        return o.reshape(ROWS // n_contracts, n_contracts, -1) \
                .sum(axis=(0, 2)) / n

    pay_m, pay2_m, d1_m, dg_m, dz_m, d2_m = [red(o) for o in outs[:6]]
    price = df * pay_m
    var = jnp.maximum(pay2_m - pay_m * pay_m, 0.0)
    score_t_m = d2_m / (2.0 * t) + mu * sqdt / (sig * t) * dz_m
    out = {
        "price": price,
        "std_error": df * jnp.sqrt(var / n),
        "delta": df * d1_m / (spot * sig * sqdt),
        "gamma": df * (dg_m / (sig * sig * dt) - d1_m / (sig * sqdt))
                 / (spot * spot),
        "vega": df * (d2_m / sig - sqdt * dz_m),
    }
    if kind.endswith("_hit"):
        dr_m = red(outs[6])
        out["rho"] = sqdt / sig * dz_m + dr_m
        out["theta"] = -score_t_m - rate / t * dr_m
    else:
        out["rho"] = df * sqdt / sig * dz_m - t * price
        out["theta"] = rate * price - df * score_t_m
    return out


def pallas_exotic_book_lr_greeks(kind: str, spot, strikes, maturity, rate,
                                 vol, cp: float = 1.0,
                                 dividend: float = 0.0, barriers=None,
                                 lowers=None, uppers=None,
                                 n_paths: int = 1_000_000,
                                 n_steps: int = 64, seed: int = 0,
                                 sampler: str = "prng") -> dict:
    """Per-contract price + LR delta/gamma/vega/rho/theta for a book of
    same-kind contracts in ONE kernel launch (see
    :func:`pallas_exotic_book_price` for the row-interleave layout;
    ``n_paths`` per contract). Every dict value has one entry per
    contract."""
    _check_book_call(kind, sampler)
    strikes, barriers, lowers, uppers = _book_lists(
        kind, strikes, barriers, lowers, uppers)
    nc = len(strikes)
    nc_pad = _book_pad(nc)
    p, t = _base_params(spot, strikes[0], maturity, rate, vol, dividend,
                        barriers[0], n_steps)
    a = lowers if "double" in kind else [0.0] * nc
    b = uppers if "double" in kind else [0.0] * nc
    if "double" in kind:
        # single-contract books take the kernel's scalar path — see
        # pallas_exotic_book_price
        p[_P_A], p[_P_B] = a[0], b[0]
    zeros = [0.0] * nc
    book = _book_smem(strikes, barriers, a, b, zeros, zeros, zeros, nc_pad)
    paths_per_block = (ROWS // nc_pad) * LANES * 4
    n_blocks = max(1, math.ceil(n_paths / paths_per_block))
    df = 1.0 if kind.endswith("_hit") else math.exp(-float(rate) * t)
    mu = float(rate) - float(dividend) - 0.5 * float(vol) ** 2
    scalars = np.asarray([float(spot), float(vol), t, df, mu,
                           float(rate)], np.float32)
    out = _book_lr_pipeline(
        np.asarray([seed, 0], np.int32), np.asarray(p, np.float32),
        book, scalars, kind=kind, n_steps=n_steps, n_blocks=n_blocks,
        cp=float(cp), sampler=sampler, n_contracts=nc_pad)
    out = {k: v[:nc] for k, v in out.items()}
    out["paths"] = n_blocks * paths_per_block
    return out


def pallas_cliquet_price(spot, maturity, rate, vol, dividend: float = 0.0,
                         local_floor: float = -0.05, local_cap: float = 0.05,
                         global_floor: float = 0.0, global_cap: float = 1e9,
                         notional: float = 100.0, n_periods: int = 12,
                         n_paths: int = 1_000_000, n_steps: int = 252,
                         seed: int = 0, sampler: str = "prng"):
    """Fused cliquet/ratchet (scan parity: ``models/exotics.cliquet_price``;
    reference anchor ``exotic_options.py:494-554``)."""
    if n_periods <= 0 or n_steps % n_periods:
        raise ValidationError("n_steps must be a positive multiple of n_periods")
    p, t = _base_params(spot, 0.0, maturity, rate, vol, dividend, 0.0, n_steps)
    p[_P_A], p[_P_B] = float(local_floor), float(local_cap)
    p[_P_C], p[_P_D] = float(global_floor), float(global_cap)
    p[_P_E] = float(notional)
    n_blocks = max(1, math.ceil(n_paths / PATHS_PER_BLOCK))
    price, se = _price_pipeline(
        np.asarray([seed, 0], np.int32), np.asarray(p, np.float32),
        np.float32(math.exp(-float(rate) * t)), kind="cliquet",
        n_steps=n_steps, n_blocks=n_blocks, cp=1.0,
        period=n_steps // n_periods, sampler=sampler)
    return price, se, n_blocks * PATHS_PER_BLOCK


def pallas_autocall_price(spot, maturity, rate, vol, dividend: float = 0.0,
                          notional: float = 100.0, autocall_barrier: float = 1.0,
                          coupon_barrier: float = 0.8, ki_barrier: float = 0.7,
                          coupon_rate: float = 0.08, n_obs: int = 4,
                          n_paths: int = 1_000_000, n_steps: int = 252,
                          seed: int = 0, sampler: str = "prng"):
    """Fused autocallable/snowball note (scan parity:
    ``models/exotics.autocallable_price``; reference anchor
    ``exotic_options.py:404-491``). Coupons/redemptions are discounted
    IN-KERNEL at their observation dates, so no terminal discount applies.
    """
    if n_obs <= 0 or n_steps % n_obs:
        raise ValidationError("n_steps must be a positive multiple of n_obs")
    p, _t = _base_params(spot, 0.0, maturity, rate, vol, dividend, 0.0, n_steps)
    p[_P_A] = float(autocall_barrier) * float(spot)
    p[_P_B] = float(coupon_barrier) * float(spot)
    p[_P_C] = float(ki_barrier) * float(spot)
    p[_P_D] = float(notional) * float(coupon_rate) / n_obs
    p[_P_E] = float(notional)
    n_blocks = max(1, math.ceil(n_paths / PATHS_PER_BLOCK))
    price, se = _price_pipeline(
        np.asarray([seed, 0], np.int32), np.asarray(p, np.float32),
        np.float32(1.0), kind="autocall", n_steps=n_steps,
        n_blocks=n_blocks, cp=1.0, period=n_steps // n_obs,
        sampler=sampler)
    return price, se, n_blocks * PATHS_PER_BLOCK


# ---------------------------------------------------------------------------
# Likelihood-ratio Greeks: payoff-agnostic — barriers/cliquets/autocalls too
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("kind", "n_steps", "n_blocks",
                                             "cp", "period", "sampler",
                                             "discounted"))
def _lr_pipeline(seed, params, scalars, *, kind, n_steps, n_blocks, cp,
                 period, sampler, discounted):
    """launch(lr=True) → LR score combination, ONE traced program.

    LR scores differentiate the Gaussian transition DENSITY, not the payoff
    — so discontinuous payoffs (barrier indicators, autocall triggers) get
    unbiased Greeks where pathwise derivatives are zero a.e.:

      delta = df·E[pay·z₁]/(S0·σ√dt)         gamma via the 2nd-order score
      vega  = df·E[pay·(Σ(zᵢ²−1)/σ − √dt·Σzᵢ)]
      rho   = df·(√dt/σ)·E[pay·Σzᵢ] − T·price
      theta = r·price − df·E[pay·score_T],
              score_T = Σ(zᵢ²−1)/(2T) + μ√dt/(σT)·Σzᵢ  (μ = r−q−σ²/2;
              the dt = T/n fixed-count rescaling — same identity as the
              pathwise kernel's theta)

    ``discounted=True`` means the kernel already discounted the payoff
    (autocall): df=1 host-side, and the explicit coupon-discount
    derivative moment DR = Σ(−tᵢ·dfᵢ·cashᵢ) carried in-kernel completes
    rho (= score part + E[DR]) and theta (= −E[pay·score_T] − (r/T)·E[DR]).
    """
    if sampler.startswith("sobol"):
        raise ValidationError(
            "LR scores assume iid normals; the bridge-QMC samplers "
            "correlate increments — use prng/hash for LR Greeks")
    outs = _launch(seed, params, kind=kind, n_steps=n_steps,
                   n_blocks=n_blocks, cp=cp, period=period, sampler=sampler,
                   lr=True)
    n = n_blocks * PATHS_PER_BLOCK
    spot, sig, t, df, mu, rate = scalars
    dt = t / n_steps
    sqdt = jnp.sqrt(dt)
    pay_m, pay2_m, d1_m, dg_m, dz_m, d2_m = [o.sum() / n for o in outs[:6]]
    price = df * pay_m
    var = jnp.maximum(pay2_m - pay_m * pay_m, 0.0)
    score_t_m = d2_m / (2.0 * t) + mu * sqdt / (sig * t) * dz_m
    out = {
        "price": price,
        "std_error": df * jnp.sqrt(var / n),
        "delta": df * d1_m / (spot * sig * sqdt),
        "gamma": df * (dg_m / (sig * sig * dt) - d1_m / (sig * sqdt))
                 / (spot * spot),
        "vega": df * (d2_m / sig - sqdt * dz_m),
    }
    if discounted:
        dr_m = outs[6].sum() / n
        out["rho"] = sqdt / sig * dz_m + dr_m
        out["theta"] = -score_t_m - rate / t * dr_m
    else:
        out["rho"] = df * sqdt / sig * dz_m - t * price
        out["theta"] = rate * price - df * score_t_m
    return out


def pallas_exotic_lr_greeks(kind: str, spot, strike, maturity, rate, vol,
                            cp: float = 1.0, dividend: float = 0.0,
                            barrier: float = 0.0, n_paths: int = 1_000_000,
                            n_steps: int = 64, seed: int = 0,
                            sampler: str = "prng",
                            lower: float = 0.0, upper: float = 0.0) -> dict:
    """Exotic price + likelihood-ratio delta/gamma/vega/rho in ONE kernel
    pass — for ANY payoff kind, including barriers whose pathwise
    derivative is zero a.e. (the reference prices these Greeks by FD
    re-simulation, ``src/greeks/unified_greeks.py:177,235``).

    Trade-off vs :func:`pallas_exotic_greeks` (pathwise, asian/lookback
    only): LR estimates have a higher variance constant (score variance
    grows ~√n_steps for vega/rho), but they are unbiased for ALL payoffs
    and come at full kernel speed — throw paths at them. Returned dict
    carries ``paths``.
    """
    if kind not in PAYOFF_KINDS or kind == "asian_arith_cv":
        raise ValidationError(f"unknown exotic kind {kind!r}; choose {PAYOFF_KINDS}")
    if kind in ("cliquet", "autocall", "range_accrual"):
        raise ValidationError(f"use pallas_{kind}_lr_greeks for structured params")
    p, t = _base_params(spot, strike, maturity, rate, vol, dividend, barrier,
                        n_steps)
    if "double" in kind:
        if not 0.0 < lower < upper:
            raise ValidationError("double kinds need 0 < lower < upper")
        p[_P_A], p[_P_B] = float(lower), float(upper)
    n_blocks = max(1, math.ceil(n_paths / PATHS_PER_BLOCK))
    mu = float(rate) - float(dividend) - 0.5 * float(vol) ** 2
    hit_pay = kind.endswith("_hit")  # in-kernel discounting + DR moment
    scalars = np.asarray([float(spot), float(vol), t,
                           1.0 if hit_pay else math.exp(-float(rate) * t),
                           mu, float(rate)], np.float32)
    out = dict(_lr_pipeline(np.asarray([seed, 0], np.int32),
                            np.asarray(p, np.float32), scalars, kind=kind,
                            n_steps=n_steps, n_blocks=n_blocks, cp=float(cp),
                            period=1, sampler=sampler,
                            discounted=hit_pay))
    out["paths"] = n_blocks * PATHS_PER_BLOCK
    return out


def pallas_cliquet_lr_greeks(spot, maturity, rate, vol, dividend: float = 0.0,
                             local_floor: float = -0.05, local_cap: float = 0.05,
                             global_floor: float = 0.0, global_cap: float = 1e9,
                             notional: float = 100.0, n_periods: int = 12,
                             n_paths: int = 1_000_000, n_steps: int = 252,
                             seed: int = 0, sampler: str = "prng") -> dict:
    """Cliquet price + LR delta/gamma/vega/rho in one pass (delta/gamma are
    w.r.t. the simulation start with the initial fixing frozen — the hedge
    sensitivity)."""
    if n_periods <= 0 or n_steps % n_periods:
        raise ValidationError("n_steps must be a positive multiple of n_periods")
    p, t = _base_params(spot, 0.0, maturity, rate, vol, dividend, 0.0, n_steps)
    p[_P_A], p[_P_B] = float(local_floor), float(local_cap)
    p[_P_C], p[_P_D] = float(global_floor), float(global_cap)
    p[_P_E] = float(notional)
    n_blocks = max(1, math.ceil(n_paths / PATHS_PER_BLOCK))
    mu = float(rate) - float(dividend) - 0.5 * float(vol) ** 2
    scalars = np.asarray([float(spot), float(vol), t,
                           math.exp(-float(rate) * t), mu, float(rate)],
                          jnp.float32)
    out = dict(_lr_pipeline(np.asarray([seed, 0], np.int32),
                            np.asarray(p, np.float32), scalars,
                            kind="cliquet", n_steps=n_steps,
                            n_blocks=n_blocks, cp=1.0,
                            period=n_steps // n_periods, sampler=sampler,
                            discounted=False))
    out["paths"] = n_blocks * PATHS_PER_BLOCK
    return out


def pallas_autocall_lr_greeks(spot, maturity, rate, vol, dividend: float = 0.0,
                              notional: float = 100.0,
                              autocall_barrier: float = 1.0,
                              coupon_barrier: float = 0.8,
                              ki_barrier: float = 0.7,
                              coupon_rate: float = 0.08, n_obs: int = 4,
                              n_paths: int = 1_000_000, n_steps: int = 252,
                              seed: int = 0, sampler: str = "prng") -> dict:
    """Autocall price + LR delta/gamma/vega/rho/theta in one pass. Barriers
    are fixed at inception (S0-relative constants), so delta/gamma are the
    hedge sensitivities with fixings frozen. Coupons are discounted
    IN-KERNEL; the explicit discount-factor derivative rides a dedicated
    moment (DR = −Σtᵢ·dfᵢ·cashᵢ) that completes both rho and theta."""
    if n_obs <= 0 or n_steps % n_obs:
        raise ValidationError("n_steps must be a positive multiple of n_obs")
    p, t = _base_params(spot, 0.0, maturity, rate, vol, dividend, 0.0, n_steps)
    p[_P_A] = float(autocall_barrier) * float(spot)
    p[_P_B] = float(coupon_barrier) * float(spot)
    p[_P_C] = float(ki_barrier) * float(spot)
    p[_P_D] = float(notional) * float(coupon_rate) / n_obs
    p[_P_E] = float(notional)
    n_blocks = max(1, math.ceil(n_paths / PATHS_PER_BLOCK))
    mu = float(rate) - float(dividend) - 0.5 * float(vol) ** 2
    scalars = np.asarray([float(spot), float(vol), t, 1.0, mu,
                           float(rate)], np.float32)
    out = dict(_lr_pipeline(np.asarray([seed, 0], np.int32),
                            np.asarray(p, np.float32), scalars,
                            kind="autocall", n_steps=n_steps,
                            n_blocks=n_blocks, cp=1.0,
                            period=n_steps // n_obs, sampler=sampler,
                            discounted=True))
    out["paths"] = n_blocks * PATHS_PER_BLOCK
    return out


def pallas_range_accrual_price(spot, lower, upper, maturity, rate, vol,
                               dividend: float = 0.0,
                               notional: float = 100.0,
                               n_paths: int = 1_000_000, n_steps: int = 252,
                               seed: int = 0, sampler: str = "prng"):
    """Fused range-accrual (corridor) note: notional × fraction of
    monitoring steps with ``lower <= S <= upper``, paid at expiry.
    Returns (price, stderr, actual_paths). EXACT closed-form oracle under
    GBM: ``models/exotics.range_accrual_closed_form`` (a sum of digital
    pairs) — used by the tests."""
    if not 0.0 <= lower < upper:
        raise ValidationError("need 0 <= lower < upper")
    p, t = _base_params(spot, 0.0, maturity, rate, vol, dividend, 0.0,
                        n_steps)
    p[_P_A], p[_P_B] = float(lower), float(upper)
    p[_P_E] = float(notional)
    n_blocks = max(1, math.ceil(n_paths / PATHS_PER_BLOCK))
    price, se = _price_pipeline(
        np.asarray([seed, 0], np.int32), np.asarray(p, np.float32),
        np.float32(math.exp(-float(rate) * t)), kind="range_accrual",
        n_steps=n_steps, n_blocks=n_blocks, cp=1.0, sampler=sampler)
    return price, se, n_blocks * PATHS_PER_BLOCK


def pallas_range_accrual_lr_greeks(spot, lower, upper, maturity, rate, vol,
                                   dividend: float = 0.0,
                                   notional: float = 100.0,
                                   n_paths: int = 1_000_000,
                                   n_steps: int = 252, seed: int = 0,
                                   sampler: str = "prng") -> dict:
    """Range-accrual price + LR delta/gamma/vega/rho/theta in one pass —
    the payoff is a sum of indicators (pathwise derivative zero a.e.), so
    the LR scores are the only kernel-speed Greeks. Oracle: AD of the
    closed form."""
    if not 0.0 <= lower < upper:
        raise ValidationError("need 0 <= lower < upper")
    if sampler.startswith("sobol"):
        raise ValidationError("LR scores assume iid normals — use prng/hash")
    p, t = _base_params(spot, 0.0, maturity, rate, vol, dividend, 0.0,
                        n_steps)
    p[_P_A], p[_P_B] = float(lower), float(upper)
    p[_P_E] = float(notional)
    n_blocks = max(1, math.ceil(n_paths / PATHS_PER_BLOCK))
    mu = float(rate) - float(dividend) - 0.5 * float(vol) ** 2
    scalars = np.asarray([float(spot), float(vol), t,
                           math.exp(-float(rate) * t), mu, float(rate)],
                          jnp.float32)
    out = dict(_lr_pipeline(np.asarray([seed, 0], np.int32),
                            np.asarray(p, np.float32), scalars,
                            kind="range_accrual", n_steps=n_steps,
                            n_blocks=n_blocks, cp=1.0, period=1,
                            sampler=sampler, discounted=False))
    out["paths"] = n_blocks * PATHS_PER_BLOCK
    return out


def exotic_kernel_ladder(kind: str, spot, strike=0.0, maturity=1.0,
                         rate=0.05, vol=0.2, cp: float = 1.0,
                         dividend: float = 0.0, barrier: float = 0.0,
                         barrier_type: str = "up-and-out",
                         averaging: str = "arithmetic", floating: bool = True,
                         n_paths: int = 1_000_000, n_steps: int = 64,
                         seed: int = 0, sampler: str | None = None,
                         lower: float = 0.0, upper: float = 0.0,
                         pay: str = "expiry") -> dict:
    """User-facing dispatch to the fused-kernel Greek ladders (used by the
    CLI and the HTTP server): pathwise for asian/lookback, likelihood-ratio
    for barrier/cliquet/autocallable. ``sampler=None`` auto-selects the
    hardware PRNG on TPU and the counter-based hash generator elsewhere
    (off-TPU the interpreter stubs the hardware PRNG). Raises
    :class:`ValidationError` on unsupported kinds. The returned dict
    reports ``greek_method`` and the actual ``n_steps`` used (cliquet/
    autocall round up to a whole number of observation periods).
    """
    if sampler is None:
        sampler = "prng" if jax.default_backend() == "tpu" else "hash"
    kw = dict(n_paths=n_paths, n_steps=n_steps, seed=seed, sampler=sampler)
    if kind == "asian":
        k = "asian_arith" if averaging.startswith("arith") else "asian_geo"
        out = pallas_exotic_greeks(k, spot, strike, maturity, rate, vol, cp,
                                   dividend, **kw)
        method = "pathwise"
    elif kind == "lookback":
        k = "lookback_float" if floating else "lookback_fixed"
        out = pallas_exotic_greeks(k, spot, strike, maturity, rate, vol, cp,
                                   dividend, **kw)
        method = "pathwise"
    elif kind == "barrier":
        out = pallas_exotic_lr_greeks(f"barrier_{barrier_type}", spot, strike,
                                      maturity, rate, vol, cp, dividend,
                                      barrier=barrier, **kw)
        method = "likelihood-ratio"
    elif kind in ("double-barrier", "double_barrier"):
        knock = "in" if barrier_type.endswith("in") else "out"
        out = pallas_exotic_lr_greeks(f"barrier_double-{knock}", spot, strike,
                                      maturity, rate, vol, cp, dividend,
                                      lower=lower, upper=upper, **kw)
        method = "likelihood-ratio"
    elif kind in ("double-touch", "double_touch"):
        touch = "one" if barrier_type.startswith("one") else "no"
        if pay == "hit":
            if touch != "one":
                raise ValidationError(
                    "a no-touch pays at expiry by definition")
            k = "one_touch_double_hit"
        else:
            k = f"{touch}_touch_double"
        out = pallas_exotic_lr_greeks(k, spot, strike, maturity, rate, vol,
                                      cp, dividend, lower=lower,
                                      upper=upper, **kw)
        method = "likelihood-ratio"
    elif kind in ("one-touch", "no-touch", "one_touch", "no_touch"):
        one = kind.replace("_", "-").startswith("one")
        if pay == "hit" and not one:
            raise ValidationError("a no-touch pays at expiry by definition")
        side = "up" if barrier >= spot else "down"
        k = f"{'one' if one else 'no'}_touch_{side}"
        if pay == "hit":
            k += "_hit"
        out = pallas_exotic_lr_greeks(k, spot, strike, maturity, rate, vol,
                                      cp, dividend, barrier=barrier, **kw)
        method = "likelihood-ratio"
    elif kind == "cliquet":
        if kw["n_steps"] % 12:  # 12 monthly resets need n_steps % 12 == 0
            kw["n_steps"] = max(12, -(-kw["n_steps"] // 12) * 12)
        out = pallas_cliquet_lr_greeks(spot, maturity, rate, vol, dividend,
                                       **kw)
        method = "likelihood-ratio"
    elif kind in ("autocallable", "autocall"):
        if kw["n_steps"] % 4:  # default n_obs = 4 observations
            kw["n_steps"] = max(4, -(-kw["n_steps"] // 4) * 4)
        out = pallas_autocall_lr_greeks(spot, maturity, rate, vol, dividend,
                                        **kw)
        method = "likelihood-ratio"
    else:
        raise ValidationError(
            f"kernel Greek ladder not available for kind {kind!r}; choose "
            "asian|lookback|barrier|one-touch|no-touch|double-barrier|"
            "double-touch|cliquet|autocallable")
    res = {k2: float(v) for k2, v in out.items() if k2 != "paths"}
    res.update(kind=kind, greek_method=method, paths=int(out["paths"]),
               n_steps=kw["n_steps"])
    if kind in ("cliquet", "autocallable", "autocall"):
        # surface the frozen-fixings semantics to CLI/server consumers:
        # these payoffs are scale-invariant (spot-relative references), so
        # a re-striking spot bump has ~zero FD delta while the LR delta is
        # the hedge delta with the initial fixing/barriers frozen
        res["delta_convention"] = ("frozen-fixings hedge delta: initial "
                                   "fixing and barriers fixed at inception; "
                                   "a re-striking spot bump would show ~0")
    return res


# ---------------------------------------------------------------------------
# Greeks kernel: price + pathwise delta/vega/rho/theta in one pass
# ---------------------------------------------------------------------------
def _exotic_greeks_kernel(seed_ref, param_ref, pay_ref, pay2_ref, p0_ref,
                          g1_ref, g2_ref, *, kind: str, n_steps: int,
                          cp: float, sampler: str):
    """Carries, per antithetic branch: spot (or log-spot), the shared
    Brownian values w1/w2, the payoff statistic, and derivative
    accumulators. Reduces the P0/G1/G2 pathwise moments (module docstring).
    """
    block = pl.program_id(0) + seed_ref[1]  # global block id (see price kernel)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (pay_ref, pay2_ref, p0_ref, g1_ref, g2_ref):
            ref[:, :] = jnp.zeros_like(ref)

    if sampler != "hash":
        pltpu.prng_seed(seed_ref[0] + block * jnp.int32(-1640531535))
    seed = seed_ref[0]

    s0 = param_ref[_P_S0]
    strike = param_ref[_P_K]
    drift_dt = param_ref[_P_DRIFT_DT]
    vol_sqrt_dt = param_ref[_P_VOLSQDT]
    inv_n = param_ref[_P_INV_N]
    growth = param_ref[_P_GROWTH]
    sqdt = param_ref[_P_SQDT]

    shape = (ROWS, LANES_G)
    geo = kind == "asian_geo"
    signs = (1.0, -1.0, 1.0, -1.0)  # branch sign on (w1, w1, w2, w2)

    zero = jnp.zeros(shape, jnp.float32)
    if geo:
        state0 = jnp.zeros(shape, jnp.float32)  # RELATIVE log-spot x−lnS0
    else:
        state0 = jnp.full(shape, s0, jnp.float32)
    xs = (state0, state0, state0, state0)
    ws = (zero, zero)  # Brownian W for the (cos, sin) streams

    if kind.startswith("asian"):
        # (running Σ S or Σ log S, Σ S·W [arith] or Σ W [geo], Σ S·(i/n))
        aux0 = (zero, zero, zero)
    else:
        # lookback: (running extremum m, W at extremum, (i/n) at extremum)
        aux0 = (state0, zero, zero)
    auxs = (aux0, aux0, aux0, aux0)

    minimum = (kind == "lookback_float") == (cp > 0)  # float call / fixed put → min

    def body(i, carry):
        xs, (w1, w2), auxs = carry
        z1, z2 = _draw_normals(sampler, seed, block, i, n_steps, shape)
        w1 = w1 + sqdt * z1
        w2 = w2 + sqdt * z2
        if geo:
            xs_new = (xs[0] + drift_dt + vol_sqrt_dt * z1,
                      xs[1] + drift_dt - vol_sqrt_dt * z1,
                      xs[2] + drift_dt + vol_sqrt_dt * z2,
                      xs[3] + drift_dt - vol_sqrt_dt * z2)
        else:
            e1 = jnp.exp(vol_sqrt_dt * z1)
            e2 = jnp.exp(vol_sqrt_dt * z2)
            xs_new = (xs[0] * (growth * e1), xs[1] * growth / e1,
                      xs[2] * (growth * e2), xs[3] * growth / e2)
        frac = (i + 1).astype(jnp.float32) * inv_n  # t_{i+1}/T
        new_auxs = []
        for b, (x, aux) in enumerate(zip(xs_new, auxs)):
            wb = signs[b] * (w1 if b < 2 else w2)
            if kind == "asian_arith":
                asum, aw, ai = aux
                new_auxs.append((asum + x, aw + x * wb, ai + x * frac))
            elif kind == "asian_geo":
                lsum, cw, _ = aux
                new_auxs.append((lsum + x, cw + wb, zero))
            else:  # lookback: extremum + (W, i/n) frozen at the extremum
                m, mw, mt = aux
                better = (x < m) if minimum else (x > m)
                new_auxs.append((jnp.where(better, x, m),
                                 jnp.where(better, wb, mw),
                                 jnp.where(better, frac, mt)))
        return xs_new, (w1, w2), tuple(new_auxs)

    xs, (w1, w2), auxs = jax.lax.fori_loop(0, n_steps, body, (xs, ws, auxs))

    acc = [jnp.zeros(shape, jnp.float32) for _ in range(5)]
    for b, (x, aux) in enumerate(zip(xs, auxs)):
        wb = signs[b] * (w1 if b < 2 else w2)
        if kind == "asian_arith":
            asum, aw, ai = aux
            avg = asum * inv_n
            pay = jnp.maximum(cp * (avg - strike), 0.0)
            ind = jnp.where(pay > 0, 1.0, 0.0)
            p0 = cp * ind * avg
            g1 = cp * ind * aw * inv_n
            g2 = cp * ind * ai * inv_n
        elif kind == "asian_geo":
            lsum, cw, _ = aux
            # relative log carry: exp sees a SMALL argument (fast-exp at
            # |ln S0| ≈ 4.6 alone is a ~2e-3 price bias on TPU)
            avg = s0 * jnp.exp(lsum * inv_n)
            pay = jnp.maximum(cp * (avg - strike), 0.0)
            ind = jnp.where(pay > 0, 1.0, 0.0)
            p0 = cp * ind * avg
            g1 = cp * ind * avg * cw * inv_n
            g2 = jnp.zeros_like(p0)  # host substitutes (n+1)/(2n) · P0
        elif kind == "lookback_fixed":
            m, mw, mt = aux
            pay = jnp.maximum(cp * (m - strike), 0.0)
            ind = jnp.where(pay > 0, 1.0, 0.0)
            p0 = cp * ind * m
            g1 = cp * ind * m * mw
            g2 = cp * ind * m * mt
        else:  # lookback_float: pay = cp·(S_T − m), homogeneous of degree 1
            m, mw, mt = aux
            s_t = x
            pay = cp * (s_t - m)
            p0 = pay
            g1 = cp * (s_t * wb - m * mw)
            g2 = cp * (s_t * 1.0 - m * mt)
        acc = [a + v for a, v in zip(acc, (pay, pay * pay, p0, g1, g2))]

    for off in range(0, LANES_G, 128):
        for ref, a in zip((pay_ref, pay2_ref, p0_ref, g1_ref, g2_ref), acc):
            ref[:, :] += a[:, off:off + 128]


@functools.partial(jax.jit, static_argnames=("kind", "n_steps", "n_blocks", "cp",
                                             "sampler"))
def _launch_greeks(seed, params, *, kind: str, n_steps: int, n_blocks: int,
                   cp: float, sampler: str = "prng"):
    acc_spec = pl.BlockSpec((ROWS, 128), lambda b: (0, 0), memory_space=pltpu.VMEM)
    interpret = False if jax.default_backend() == "tpu" else pltpu.InterpretParams()
    return pl.pallas_call(
        functools.partial(_exotic_greeks_kernel, kind=kind, n_steps=n_steps,
                          cp=cp, sampler=sampler),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[acc_spec] * 5,
        out_shape=[jax.ShapeDtypeStruct((ROWS, 128), jnp.float32)] * 5,
        cost_estimate=pl.CostEstimate(
            flops=n_blocks * n_steps * ROWS * LANES_G * 4 * 14,
            bytes_accessed=5 * ROWS * 128 * 4,
            transcendentals=n_blocks * n_steps * ROWS * LANES_G * 8,
        ),
        interpret=interpret,
    )(seed, params)


PATHS_PER_BLOCK_G = 4 * ROWS * LANES_G


def _combine_greeks(outs, n: int, scalars, kind: str, n_steps: int) -> dict:
    """P0/G1/G2 moment tiles → the first-order Greek ladder (chain rules in
    the module docstring). Shared by the single-device pipeline and the
    sharded (psum-reduced) path."""
    spot, rate, vol, t, a_drift, df = scalars
    pay_m, pay2_m, p0_m, g1_m, g2_m = [o.sum() / n for o in outs]
    if kind == "asian_geo":
        g2_m = 0.5 * (1.0 + 1.0 / n_steps) * p0_m  # Σ(i/n)/n = (n+1)/(2n)
    price = df * pay_m
    var = jnp.maximum(pay2_m - pay_m * pay_m, 0.0)
    return {
        "price": price,
        "std_error": df * jnp.sqrt(var / n),
        "delta": df * p0_m / spot,
        "vega": df * (g1_m - vol * t * g2_m),
        "rho": -t * price + df * t * g2_m,
        "theta": rate * price - df * (a_drift * g2_m + vol / (2.0 * t) * g1_m),
        "dividend_rho": -df * t * g2_m,
    }


@functools.partial(jax.jit, static_argnames=("kind", "n_steps", "n_blocks", "cp",
                                             "sampler"))
def _greeks_pipeline(seed, params, scalars, *, kind, n_steps, n_blocks, cp, sampler):
    """launch → moment combination, traced as ONE program (single dispatch
    over the tunnel)."""
    outs = _launch_greeks(seed, params, kind=kind, n_steps=n_steps,
                          n_blocks=n_blocks, cp=cp, sampler=sampler)
    return _combine_greeks(outs, n_blocks * PATHS_PER_BLOCK_G, scalars,
                           kind, n_steps)


def pallas_exotic_greeks(kind: str, spot, strike, maturity, rate, vol,
                         cp: float = 1.0, dividend: float = 0.0,
                         n_paths: int = 1_000_000, n_steps: int = 64,
                         seed: int = 0, sampler: str = "prng") -> dict:
    """Exotic price + pathwise delta/vega/rho/theta/dividend_rho in ONE
    kernel pass (kind ∈ GREEK_KINDS).

    Pathwise chain rules (exact for these a.e.-smooth payoffs):
      ∂S_i/∂S0 = S_i/S0,  ∂S_i/∂σ = S_i(W_i − σ t_i),  ∂S_i/∂r = S_i t_i,
      ∂S_i/∂T = S_i(a·t_i/T + σ W_i/(2T)),  a = r − q − σ²/2,
    reduced in-kernel to the P0/G1/G2 moments and combined host-side.

    Caveat: for ``lookback_fixed`` with strike EXACTLY equal to spot, the
    extremum (seeded at S0) has a probability atom at the payoff kink and
    delta is ill-defined (left/right derivatives differ); any K ≠ S0 is
    atom-free and exact.
    Validated against the scan engine's AD (`models/exotics.exotic_greeks`)
    and the lookback homogeneity identity. The returned dict also carries
    ``paths`` (actual simulated path count).
    """
    if kind not in GREEK_KINDS:
        raise ValidationError(
            f"in-kernel Greeks support {GREEK_KINDS}; for {kind!r} use the "
            "scan engine's AD (models/exotics.exotic_greeks) — barrier "
            "indicators have zero pathwise derivative")
    if sampler.startswith("sobol"):
        raise ValidationError("the Greeks kernel supports prng/hash only")
    p, t = _base_params(spot, strike, maturity, rate, vol, dividend, 0.0, n_steps)
    n_blocks = max(1, math.ceil(n_paths / PATHS_PER_BLOCK_G))
    a_drift = float(rate) - float(dividend) - 0.5 * float(vol) ** 2
    scalars = np.asarray([float(spot), float(rate), float(vol), t, a_drift,
                          math.exp(-float(rate) * t)], np.float32)
    out = _greeks_pipeline(np.asarray([seed, 0], np.int32),
                           np.asarray(p, np.float32), scalars, kind=kind,
                           n_steps=n_steps, n_blocks=n_blocks, cp=float(cp),
                           sampler=sampler)
    out = dict(out)
    out["paths"] = n_blocks * PATHS_PER_BLOCK_G
    return out
