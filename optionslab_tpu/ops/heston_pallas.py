"""Fused Pallas kernels for Heston Monte Carlo.

The stochastic-vol analog of ``exotic_pallas.py``: both state factors
(log-spot, variance) live in VMEM for the whole path; per step the kernel
draws two correlated normals, advances (x, v), and at maturity reduces
the discounted payoff moments on chip. Antithetic pairs (−z_v, −z_x)
share each draw.

Schemes: full-truncation Euler (``_heston_kernel``) and Andersen (2008)
quadratic-exponential (``_heston_qe_kernel``, ``scheme="qe"`` — the
moment-matched variance law keeps coarse step counts near-unbiased where
Euler drifts; mirrors ``models/heston.py``'s XLA QE engine).

Replaces the per-step ``jax.random.fold_in`` scan of ``models.heston.
heston_mc_price`` on the hot path (the scan engine remains the reference
implementation and the vmapped/AD path; tests cross-check statistically).

In-kernel Greeks (:func:`pallas_heston_greeks`): Heston terminal spots are
LINEAR in S0 (∂S_T/∂S0 = S_T/S0) and the rate enters only the drift
(∂x_T/∂r = T), so ONE extra moment Σ 1{exercise}·S_T yields both
pathwise delta and rho exactly — no extra simulation state. With
``ladder=True`` the kernel carries forward sensitivities for EVERY model
parameter (v0/kappa/theta/sigma/rho) plus maturity — the complete
calibration gradient and calendar theta in one pass.

Samplers: ``prng`` (hardware, default) or ``hash`` (counter-based murmur3
— bit-identical on TPU and the CPU interpreter; used by off-TPU tests).
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
from .kernel_rng import TWO_PI, draw_jump, draw_normals, draw_uniform

ROWS = 128
LANES = 512
PATHS_PER_BLOCK = 2 * ROWS * LANES  # antithetic pair per draw
LADDER_LANES = 256  # narrower tiles for the 26-carry full-ladder kernel
LADDER_PATHS_PER_BLOCK = 2 * ROWS * LADDER_LANES


# sensitivity slots carried by the full-ladder Euler kernel, per branch:
# (dx, dv) pairs for v0/kappa/theta/sigma + dx-only rho + (dx, dv) for T
_LADDER_PARAMS = ("v0", "kappa", "theta", "sigma", "rho", "T")


def _heston_kernel(seed_ref, p_ref, *refs, n_steps: int, cp: float,
                   sampler: str, vega: bool, ladder: bool = False,
                   lanes: int = LANES):
    """p_ref (SMEM f32[12]): S0, K, mu_dt=(r-q)dt, dt, sqrt_dt, kappa, theta,
    sigma_v, rho, srho, v0, T.

    ``seed_ref = [seed, block0]``: streams index by GLOBAL block id (sharded
    launches own contiguous ranges — topology-invariant path sets).

    ``vega=True`` additionally carries the forward sensitivities
    (∂x/∂v0, ∂v/∂v0) through the full-truncation Euler recursion — the
    exact pathwise derivative of the SCHEME, so v0-vega comes out of the
    same pass (moment Σ 1{exercise}·S_T·∂x_T/∂v0).

    ``ladder=True`` (supersedes ``vega``) carries forward sensitivities
    for EVERY Heston parameter — v0, kappa, theta, sigma_v, rho — plus
    the maturity T (with dt = T/n fixed-count rescaling), giving the full
    calibration gradient and theta in the same pass.  Each is the exact
    pathwise derivative of the Euler recursion:

      d(sqrt v⁺) = 1{v>0}·dv/(2√v⁺);  explicit terms enter dv for
      kappa ((θ−v⁺)dt), theta (κ·dt), sigma (√v⁺·√dt·z_v); rho enters
      only the spot shock (∂z_x/∂ρ = z_v − (ρ/√(1−ρ²))·z_⊥); T scales
      every dt and √dt (d(dt)/dT = dt/T, d(√dt)/dT = √dt/(2T)).
    """
    if ladder:
        (pay_ref, pay2_ref, m1_ref, mv0_ref, mkap_ref, mth_ref, msig_ref,
         mrho_ref, mt_ref) = refs
    elif vega:
        pay_ref, pay2_ref, m1_ref, mv_ref = refs
    else:
        pay_ref, pay2_ref, m1_ref = refs
    block = pl.program_id(0) + seed_ref[1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in refs:
            ref[:, :] = jnp.zeros_like(ref)

    qmc = sampler.startswith("sobol_bb")
    # QMC residuals always ride the counter-based hash stream (exact
    # two-pass replay; the hardware-PRNG reseed variant trips a
    # pathological Mosaic compile — see exotic_pallas)
    residual = "hash" if (qmc or sampler == "hash") else sampler
    if residual == "prng":
        pltpu.prng_seed(seed_ref[0] + block * jnp.int32(-1640531535))
    seed = seed_ref[0]

    s0, strike = p_ref[0], p_ref[1]
    mu_dt, dt, sqrt_dt = p_ref[2], p_ref[3], p_ref[4]
    kappa, theta_lr, sigma_v = p_ref[5], p_ref[6], p_ref[7]
    rho, srho, v0 = p_ref[8], p_ref[9], p_ref[10]
    t_mat = p_ref[11]
    inv_t = 1.0 / t_mat
    crho = rho / jnp.maximum(srho, 1e-4)

    shape = (ROWS, lanes)
    # RELATIVE log-spot carry (x0 = 0, payoff multiplies by s0): Mosaic's
    # fast exp has argument-dependent relative error, and under QMC the
    # per-branch offsets break the ±antithetic (w, 1/w) cancellation —
    # keep exp's argument small (see NOTES_r3 "TPU fast-exp bias")
    x0 = jnp.zeros(shape, jnp.float32)
    vv0 = jnp.full(shape, v0, jnp.float32)
    zero = jnp.zeros(shape, jnp.float32)
    one = jnp.ones(shape, jnp.float32)
    nsens = 11 if ladder else (2 if vega else 0)

    if qmc:
        # Hybrid bridge QMC over BOTH streams (price path only): one
        # scrambled Sobol point pins up to 4 dyadic z-sum coordinates of
        # the variance stream z_v AND 4 of the orthogonal spot stream
        # z_o (2·(1+constructs) ≤ 8 dims); hash residuals fill in
        # conditionally per segment. The bridge reparameterizes the iid
        # normals, so the Euler scheme consumes an exact N(0,1) step law.
        bounds, constructs = _bridge_plan(n_steps, 4)
        n_lvl = 1 + len(constructs)  # per stream
        rid = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        cid = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        # group-salted scrambles: 8 independent replicates (rid % 8) so
        # the host can quote a randomized-QMC stderr (see exotic_pallas)
        g_id = rid & 7
        idx = block * ((ROWS // 8) * lanes) + (rid >> 3) * lanes + cid + 1
        mask30 = jnp.int32((1 << _QMC_BITS) - 1)
        h = _mix32((seed + g_id * jnp.int32(0x3C6EF372))
                   * jnp.int32(-1640531535) + jnp.int32(0x632BE5AB))
        scrambles = []
        for _ in range(2 * n_lvl):
            scrambles.append(h & mask30)
            h = _mix32(h + jnp.int32(-1640531527))
        us = _sobol_nd(idx, scrambles, 2 * n_lvl)
        gv, go = [], []
        for k in range(n_lvl):  # pair k: (z_v level k, z_o level k)
            rad = jnp.sqrt(-2.0 * jnp.log(us[2 * k]))
            th = TWO_PI * us[2 * k + 1]
            gv.append(rad * jnp.cos(th))
            go.append(rad * jnp.sin(th))
        csums = []
        for g in (gv, go):
            csum = {0: zero, n_steps: math.sqrt(float(n_steps)) * g[0]}
            for (m, a, b), gd in zip(constructs, g[1:]):
                frac = (m - a) / (b - a)
                sd = math.sqrt((m - a) * (b - m) / (b - a))
                csum[m] = csum[a] + (csum[b] - csum[a]) * frac + sd * gd
            csums.append(csum)
        segs = list(zip(bounds[:-1], bounds[1:]))
        tv = [csums[0][b] - csums[0][a] for a, b in segs]
        to = [csums[1][b] - csums[1][a] for a, b in segs]

        def pre(i, carry):
            sv, so = carry
            z1, z2 = draw_normals(residual, seed, block, i, n_steps, shape)
            return sv + z1, so + z2

        seg_sums = [jax.lax.fori_loop(a, b, pre, (zero, zero))
                    for a, b in segs]

    def advance(x, v, sens, sv, so, sx):
        ind = jnp.where(v > 0.0, 1.0, 0.0)  # full truncation: v⁺ = max(v,0)
        vp = v * ind
        sq = jnp.sqrt(vp)
        x_new = x + mu_dt - 0.5 * vp * dt + sq * sqrt_dt * sx
        v_new = v + kappa * (theta_lr - vp) * dt + sigma_v * sq * sqrt_dt * sv
        if nsens == 0:
            return x_new, v_new, sens
        # d(sqrt(v⁺))/dp = ind·dv_p/(2√v⁺) (guarded at the origin)
        inv2sq = ind / (2.0 * jnp.maximum(sq, 1e-6))

        def prop(dx, dv, ex_dv=None):
            dsq = inv2sq * dv
            dx_n = dx - 0.5 * ind * dv * dt + dsq * sqrt_dt * sx
            dv_n = dv - kappa * ind * dv * dt + sigma_v * dsq * sqrt_dt * sv
            if ex_dv is not None:
                dv_n = dv_n + ex_dv
            return dx_n, dv_n

        if not ladder:  # vega-only: (dx, dv) for v0
            dx, dv = prop(sens[0], sens[1])
            return x_new, v_new, [dx, dv]
        (dxv, dvv, dxk, dvk, dxt, dvt, dxs, dvs, dxr, dxm, dvm) = sens
        dxv, dvv = prop(dxv, dvv)
        dxk, dvk = prop(dxk, dvk, ex_dv=(theta_lr - vp) * dt)
        dxt, dvt = prop(dxt, dvt, ex_dv=kappa * dt)
        dxs, dvs = prop(dxs, dvs, ex_dv=sq * sqrt_dt * sv)
        # rho: enters only the spot shock; v path is rho-independent
        dxr = dxr + sq * sqrt_dt * (sv - crho * so)
        # T: every dt and sqrt_dt rescales (fixed step count)
        dsqm = inv2sq * dvm * sqrt_dt + sq * sqrt_dt * (0.5 * inv_t)
        dxm = dxm + mu_dt * inv_t - 0.5 * (ind * dvm * dt + vp * dt * inv_t) \
            + dsqm * sx
        dvm = dvm + kappa * (theta_lr - vp) * dt * inv_t \
            - kappa * ind * dvm * dt + sigma_v * dsqm * sv
        return x_new, v_new, [dxv, dvv, dxk, dvk, dxt, dvt, dxs, dvs,
                              dxr, dxm, dvm]

    def make_body(offs):
        def body(i, carry):
            xa, va, xb, vb = carry[:4]
            sa = list(carry[4:4 + nsens])
            sb = list(carry[4 + nsens:4 + 2 * nsens])
            zv, zo = draw_normals(residual, seed, block, i, n_steps, shape)
            if offs is None:
                zva, zoa, zvb, zob = zv, zo, -zv, -zo
            else:
                # conditional-law residuals: each branch's segment z-sums
                # are pinned to the shared bridge targets
                ovp, oop, ovm, oom = offs
                zva, zoa = zv + ovp, zo + oop
                zvb, zob = -zv + ovm, -zo + oom
            zxa = rho * zva + srho * zoa
            zxb = rho * zvb + srho * zob
            xa, va, sa = advance(xa, va, sa, zva, zoa, zxa)
            xb, vb, sb = advance(xb, vb, sb, zvb, zob, zxb)
            return tuple([xa, va, xb, vb] + sa + sb)

        return body

    if ladder:
        sens0 = [zero, one] + [zero] * 9
    elif vega:
        sens0 = [zero, one]
    else:
        sens0 = []
    carry0 = tuple([x0, vv0, x0, vv0] + sens0 + list(sens0))
    if qmc:
        out_carry = carry0
        for j, (a, b) in enumerate(segs):
            sv_j, so_j = seg_sums[j]
            inv = 1.0 / (b - a)
            offs = ((tv[j] - sv_j) * inv, (to[j] - so_j) * inv,
                    (tv[j] + sv_j) * inv, (to[j] + so_j) * inv)
            out_carry = jax.lax.fori_loop(a, b, make_body(offs), out_carry)
    else:
        out_carry = jax.lax.fori_loop(0, n_steps, make_body(None), carry0)
    xa, va, xb, vb = out_carry[:4]
    sa = out_carry[4:4 + nsens]
    sb = out_carry[4 + nsens:4 + 2 * nsens]

    accs = [jnp.zeros(shape, jnp.float32) for _ in range(len(refs))]
    # per-branch dx slots aligned with the moment refs beyond pay/pay2/m1
    if ladder:
        dx_slots = ((sa[0], sa[2], sa[4], sa[6], sa[8], sa[9]),
                    (sb[0], sb[2], sb[4], sb[6], sb[8], sb[9]))
    elif vega:
        dx_slots = ((sa[0],), (sb[0],))
    else:
        dx_slots = ((), ())
    for x, dxs_b in ((xa, dx_slots[0]), (xb, dx_slots[1])):
        st = s0 * jnp.exp(x)
        d = cp * (st - strike)
        p = jnp.maximum(d, 0.0)
        ind_st = jnp.where(d > 0, st, 0.0)
        accs[0] += p
        accs[1] += p * p
        accs[2] += ind_st  # Σ 1{exercise}·S_T → delta & rho
        for k, dx in enumerate(dxs_b):
            accs[3 + k] += ind_st * dx  # Σ 1{ex}·S_T·∂x_T/∂p
    for off in range(0, lanes, 128):
        for ref, a in zip(refs, accs):
            ref[:, :] += a[:, off:off + 128]


def _heston_qe_kernel(seed_ref, p_ref, *refs, n_steps: int, cp: float,
                      sampler: str):
    """Andersen (2008) quadratic-exponential scheme, branch-free in-kernel.

    p_ref (SMEM f32[14]): S0, K, mu_dt, emkd, c1, s2_v, s2_0, k0, k1, k2,
    k3, k4, v0, psi_clip. The variance transition draws from its
    moment-matched law (quadratic branch psi<=1.5, exponential branch
    otherwise, both evaluated and selected with jnp.where), so coarse
    step counts stay unbiased where Euler drifts (~30x at 16-24 steps —
    mirrors the XLA engine ``models/heston.py:297``). Antithetic branch B
    uses (−z_v, −z_x, 1−u).

    Outputs pay/pay2/m1: delta and rate-rho remain EXACT pathwise
    (S_T linear in S0; r enters only via mu_dt ⇒ ∂x_T/∂r = T).
    """
    pay_ref, pay2_ref, m1_ref = refs
    block = pl.program_id(0) + seed_ref[1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in refs:
            ref[:, :] = jnp.zeros_like(ref)

    if sampler != "hash":
        pltpu.prng_seed(seed_ref[0] + block * jnp.int32(-1640531535))
    seed = seed_ref[0]

    s0, strike, mu_dt = p_ref[0], p_ref[1], p_ref[2]
    emkd, c1, s2_v, s2_0 = p_ref[3], p_ref[4], p_ref[5], p_ref[6]
    k0, k1, k2, k3, k4 = p_ref[7], p_ref[8], p_ref[9], p_ref[10], p_ref[11]
    v0 = p_ref[12]

    shape = (ROWS, LANES)
    # relative log-spot carry (fast-exp discipline — see _heston_kernel)
    x0 = jnp.zeros(shape, jnp.float32)
    vv0 = jnp.full(shape, v0, jnp.float32)

    def advance(x, v, zv, zx, u):
        m = c1 + emkd * v
        s2 = s2_v * v + s2_0
        psi = s2 / jnp.maximum(m * m, 1e-30)
        # quadratic branch (psi <= 1.5)
        inv_psi = 2.0 / jnp.maximum(psi, 1e-10)
        b2 = jnp.maximum(inv_psi - 1.0 + jnp.sqrt(
            jnp.maximum(inv_psi * (inv_psi - 1.0), 0.0)), 0.0)
        a = m / (1.0 + b2)
        v_quad = a * (jnp.sqrt(b2) + zv) ** 2
        # exponential branch (psi > 1.5)
        p_mass = jnp.clip((psi - 1.0) / (psi + 1.0), 0.0, 1.0 - 1e-7)
        beta = (1.0 - p_mass) / jnp.maximum(m, 1e-30)
        v_exp = jnp.where(
            u <= p_mass, 0.0,
            jnp.log((1.0 - p_mass) / jnp.maximum(1.0 - u, 1e-30))
            / jnp.maximum(beta, 1e-30))
        v_new = jnp.where(psi <= 1.5, v_quad, v_exp)
        x_new = x + mu_dt + k0 + k1 * v + k2 * v_new \
            + jnp.sqrt(jnp.maximum(k3 * v + k4 * v_new, 0.0)) * zx
        return x_new, v_new

    def body(i, carry):
        xa, va, xb, vb = carry
        zv, zx = draw_normals(sampler, seed, block, i, n_steps, shape)
        u = draw_uniform(sampler, seed, block, i, n_steps, shape)
        xa, va = advance(xa, va, zv, zx, u)
        xb, vb = advance(xb, vb, -zv, -zx, 1.0 - u)
        return xa, va, xb, vb

    xa, va, xb, vb = jax.lax.fori_loop(0, n_steps, body, (x0, vv0, x0, vv0))

    acc = jnp.zeros(shape, jnp.float32)
    acc2 = jnp.zeros(shape, jnp.float32)
    acc1 = jnp.zeros(shape, jnp.float32)
    for x in (xa, xb):
        st = s0 * jnp.exp(x)
        d = cp * (st - strike)
        p = jnp.maximum(d, 0.0)
        acc += p
        acc2 += p * p
        acc1 += jnp.where(d > 0, st, 0.0)
    for off in range(0, LANES, 128):
        pay_ref[:, :] += acc[:, off:off + 128]
        pay2_ref[:, :] += acc2[:, off:off + 128]
        m1_ref[:, :] += acc1[:, off:off + 128]


def _heston_qe_ladder_kernel(seed_ref, p_ref, *refs, n_steps: int, cp: float,
                             sampler: str):
    """Full parameter ladder on the Andersen-QE scheme by in-kernel
    common-random-number forward bumps.

    The QE transition is NOT pathwise-differentiable in the parameters:
    the quadratic↔exponential branch switch at psi = 1.5 moves with
    (kappa, theta, sigma), so forward sensitivities carry an O(switch
    density) bias. The sound estimator is same-draw finite differences —
    every bumped path system consumes the IDENTICAL (z_v, z_x, u)
    stream, so the FD noise is O(h) of the payoff noise while the QE
    scheme's near-unbiasedness at coarse steps is preserved (the Euler
    ladder is exact-in-scheme but inherits Euler's discretization bias).

    p_ref (SMEM f32): [s0, strike] + 7 constant sets × [mu_dt, emkd, c1,
    s2_v, s2_0, k0, k1, k2, k3, k4, v0] — base then bumps of
    (v0, kappa, theta, sigma, rho, T). Carries 7 antithetic path-system
    pairs (28 tiles at LADDER_LANES); outputs pay/pay²/m1 of the base
    system + Σpay of each bumped system (9 refs).
    """
    n_sets = len(refs) - 3 + 1
    block = pl.program_id(0) + seed_ref[1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in refs:
            ref[:, :] = jnp.zeros_like(ref)

    if sampler != "hash":
        pltpu.prng_seed(seed_ref[0] + block * jnp.int32(-1640531535))
    seed = seed_ref[0]

    s0, strike = p_ref[0], p_ref[1]
    C = [[p_ref[2 + s * 11 + j] for j in range(11)] for s in range(n_sets)]

    shape = (ROWS, LADDER_LANES)
    zero = jnp.zeros(shape, jnp.float32)

    def advance(x, v, c, zv, zx, u):
        mu_dt, emkd, c1, s2_v, s2_0, k0, k1, k2, k3, k4, _v0 = c
        m = c1 + emkd * v
        s2 = s2_v * v + s2_0
        psi = s2 / jnp.maximum(m * m, 1e-30)
        inv_psi = 2.0 / jnp.maximum(psi, 1e-10)
        b2 = jnp.maximum(inv_psi - 1.0 + jnp.sqrt(
            jnp.maximum(inv_psi * (inv_psi - 1.0), 0.0)), 0.0)
        a = m / (1.0 + b2)
        v_quad = a * (jnp.sqrt(b2) + zv) ** 2
        p_mass = jnp.clip((psi - 1.0) / (psi + 1.0), 0.0, 1.0 - 1e-7)
        beta = (1.0 - p_mass) / jnp.maximum(m, 1e-30)
        v_exp = jnp.where(
            u <= p_mass, 0.0,
            jnp.log((1.0 - p_mass) / jnp.maximum(1.0 - u, 1e-30))
            / jnp.maximum(beta, 1e-30))
        v_new = jnp.where(psi <= 1.5, v_quad, v_exp)
        x_new = x + mu_dt + k0 + k1 * v + k2 * v_new \
            + jnp.sqrt(jnp.maximum(k3 * v + k4 * v_new, 0.0)) * zx
        return x_new, v_new

    def body(i, carry):
        zv, zx = draw_normals(sampler, seed, block, i, n_steps, shape)
        u = draw_uniform(sampler, seed, block, i, n_steps, shape)
        new = []
        for s in range(n_sets):
            xa, va, xb, vb = carry[4 * s:4 * s + 4]
            xa, va = advance(xa, va, C[s], zv, zx, u)
            xb, vb = advance(xb, vb, C[s], -zv, -zx, 1.0 - u)
            new += [xa, va, xb, vb]
        return tuple(new)

    carry0 = []
    for s in range(n_sets):
        v0_s = jnp.full(shape, C[s][10], jnp.float32)
        carry0 += [zero, v0_s, zero, v0_s]
    out_carry = jax.lax.fori_loop(0, n_steps, body, tuple(carry0))

    accs = [jnp.zeros(shape, jnp.float32) for _ in range(len(refs))]
    for s in range(n_sets):
        for b in range(2):
            st = s0 * jnp.exp(out_carry[4 * s + 2 * b])
            d = cp * (st - strike)
            p = jnp.maximum(d, 0.0)
            if s == 0:
                accs[0] += p
                accs[1] += p * p
                accs[2] += jnp.where(d > 0, st, 0.0)
            else:
                accs[2 + s] += p
    for off in range(0, LADDER_LANES, 128):
        for ref, a in zip(refs, accs):
            ref[:, :] += a[:, off:off + 128]


def _fold8(a):
    """(ROWS, LANES) → (8, 128) partial-sum tile (canonical fold order)."""
    t = a[:, 0:128]
    for off in range(128, LANES, 128):
        t = t + a[:, off:off + 128]
    r = t[0:8, :]
    for rr in range(8, ROWS, 8):
        r = r + t[rr:rr + 8, :]
    return r


def _heston_chain_kernel(seed_ref, p_ref, *refs, n_steps: int,
                         quote_steps: tuple, cps: tuple, sampler: str):
    """Whole-chain Heston pricing + the full calibration gradient in ONE
    kernel launch — the engine under kernel-speed calibration.

    p_ref (SMEM f32): [s0, mu=(r−q), kappa, theta, sigma_v, rho, srho, v0,
    crho=ρ/√(1−ρ²)] + per-step dt[n_steps] (variable grid: expiries land
    exactly on step boundaries) + per-quote strikes[Q].

    Quote q expires at the END of step ``quote_steps[q]``; there the
    kernel folds the quote's payoff moments — pay, pay², and the five
    pathwise-gradient moments Σ1{ex}·S_t·∂x_t/∂p for p ∈ (v0, κ, θ, σ_v,
    ρ) — to (8,128) tiles (7 output refs per quote). Sensitivities are
    the exact pathwise derivatives of the full-truncation Euler scheme,
    carried per antithetic branch exactly as in ``_heston_kernel``'s
    ladder mode. Reference capability anchor: ``src/pricing_models/
    heston.py:312`` (calibrate) — there each objective evaluation
    re-prices the chain serially; here one launch returns every quote's
    price AND ∂price/∂(all 5 params).
    """
    q_count = len(quote_steps)
    block = pl.program_id(0) + seed_ref[1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in refs:
            ref[:, :] = jnp.zeros_like(ref)

    if sampler != "hash":
        pltpu.prng_seed(seed_ref[0] + block * jnp.int32(-1640531535))
    seed = seed_ref[0]

    s0, mu = p_ref[0], p_ref[1]
    kappa, theta_lr, sigma_v = p_ref[2], p_ref[3], p_ref[4]
    rho, srho, v0, crho = p_ref[5], p_ref[6], p_ref[7], p_ref[8]
    DT0 = 9
    KS0 = DT0 + n_steps

    shape = (ROWS, LANES)
    # relative log-spot carry (fast-exp discipline — see _heston_kernel)
    x0 = jnp.zeros(shape, jnp.float32)
    vv0 = jnp.full(shape, v0, jnp.float32)
    zero = jnp.zeros(shape, jnp.float32)
    one = jnp.ones(shape, jnp.float32)
    NS = 9  # sens slots/branch: (dx,dv)·(v0,κ,θ,σ) + dx_ρ

    def advance(x, v, sens, dt, sqrt_dt, sv, so, sx):
        ind = jnp.where(v > 0.0, 1.0, 0.0)
        vp = v * ind
        sq = jnp.sqrt(vp)
        x_new = x + mu * dt - 0.5 * vp * dt + sq * sqrt_dt * sx
        v_new = v + kappa * (theta_lr - vp) * dt + sigma_v * sq * sqrt_dt * sv
        inv2sq = ind / (2.0 * jnp.maximum(sq, 1e-6))

        def prop(dx, dv, ex_dv=None):
            dsq = inv2sq * dv
            dx_n = dx - 0.5 * ind * dv * dt + dsq * sqrt_dt * sx
            dv_n = dv - kappa * ind * dv * dt + sigma_v * dsq * sqrt_dt * sv
            if ex_dv is not None:
                dv_n = dv_n + ex_dv
            return dx_n, dv_n

        dxv, dvv = prop(sens[0], sens[1])
        dxk, dvk = prop(sens[2], sens[3], ex_dv=(theta_lr - vp) * dt)
        dxt, dvt = prop(sens[4], sens[5], ex_dv=kappa * dt)
        dxs, dvs = prop(sens[6], sens[7], ex_dv=sq * sqrt_dt * sv)
        dxr = sens[8] + sq * sqrt_dt * (sv - crho * so)
        return x_new, v_new, [dxv, dvv, dxk, dvk, dxt, dvt, dxs, dvs, dxr]

    def body(i, carry):
        xa, va, xb, vb = carry[:4]
        sa = list(carry[4:4 + NS])
        sb = list(carry[4 + NS:4 + 2 * NS])
        dt = p_ref[DT0 + i]
        sqrt_dt = jnp.sqrt(dt)
        zv, zo = draw_normals(sampler, seed, block, i, n_steps, shape)
        zx = rho * zv + srho * zo
        xa, va, sa = advance(xa, va, sa, dt, sqrt_dt, zv, zo, zx)
        xb, vb, sb = advance(xb, vb, sb, dt, sqrt_dt, -zv, -zo, -zx)

        for q in range(q_count):
            @pl.when(i == quote_steps[q])
            def _(q=q, xa=xa, xb=xb, sa=sa, sb=sb):
                strike = p_ref[KS0 + q]
                cpq = cps[q]
                accs = [zero] * 7
                for x, sens in ((xa, sa), (xb, sb)):
                    st = s0 * jnp.exp(x)
                    dd = cpq * (st - strike)
                    pay = jnp.maximum(dd, 0.0)
                    ind_st = jnp.where(dd > 0, st, 0.0)
                    accs[0] = accs[0] + pay
                    accs[1] = accs[1] + pay * pay
                    for k, sl in enumerate((0, 2, 4, 6, 8)):
                        accs[2 + k] = accs[2 + k] + ind_st * sens[sl]
                for k in range(7):
                    refs[q * 7 + k][:, :] += _fold8(accs[k])

        return tuple([xa, va, xb, vb] + sa + sb)

    sens0 = [zero, one] + [zero] * 7
    carry0 = tuple([x0, vv0, x0, vv0] + sens0 + list(sens0))
    jax.lax.fori_loop(0, n_steps, body, carry0)


@functools.partial(jax.jit, static_argnames=("n_steps", "n_blocks",
                                             "quote_steps", "cps",
                                             "sampler"))
def _launch_chain(seed, params, *, n_steps: int, n_blocks: int,
                  quote_steps: tuple, cps: tuple, sampler: str = "prng"):
    n_out = 7 * len(quote_steps)
    acc_spec = pl.BlockSpec((8, 128), lambda b: (0, 0),
                            memory_space=pltpu.VMEM)
    interpret = (False if jax.default_backend() == "tpu"
                 else pltpu.InterpretParams())
    return pl.pallas_call(
        functools.partial(_heston_chain_kernel, n_steps=n_steps,
                          quote_steps=quote_steps, cps=cps, sampler=sampler),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[acc_spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((8, 128), jnp.float32)] * n_out,
        cost_estimate=pl.CostEstimate(
            flops=n_blocks * n_steps * ROWS * LANES * 2 * 70,
            bytes_accessed=n_out * 8 * 128 * 4,
            transcendentals=n_blocks * n_steps * ROWS * LANES * 6,
        ),
        interpret=interpret,
    )(seed, params)


def _chain_grid(maturities, max_dt: float):
    """Variable step grid whose boundaries hit every expiry exactly.
    Returns (dts ndarray, quote_steps tuple: END-of-step index/quote)."""
    mats = np.asarray(maturities, np.float64).ravel()
    uniq = np.unique(np.maximum(mats, EPS_TIME))
    dts, q_step_of_expiry = [], {}
    t_prev = 0.0
    for te in uniq:
        n_sub = max(1, int(math.ceil((te - t_prev) / max_dt - 1e-9)))
        dts += [(te - t_prev) / n_sub] * n_sub
        q_step_of_expiry[float(te)] = len(dts) - 1
        t_prev = te
    steps = tuple(q_step_of_expiry[float(max(t, EPS_TIME))] for t in mats)
    return np.asarray(dts, np.float64), steps


def pallas_heston_chain_ladder(strikes, maturities, cps, spot, rate, params,
                               dividend: float = 0.0,
                               n_paths: int = 1_000_000,
                               max_dt: float = 0.01, seed: int = 0,
                               sampler: str = "prng"):
    """Price a whole option chain under Heston AND return every quote's
    gradient w.r.t. (v0, kappa, theta, sigma, rho) — one kernel launch.

    ``cps``: +1/−1 per quote. Returns (prices (Q,), stderrs (Q,),
    grads (Q, 5)). The time grid is variable-step so every expiry lands
    exactly on a step boundary (max step ``max_dt`` years).
    Differentiable calibration rides :func:`make_chain_pricer`.
    """
    strikes = np.asarray(strikes, np.float64).ravel()
    mats = np.asarray(maturities, np.float64).ravel()
    cps_arr = np.asarray(cps, np.float64).ravel()
    if not (strikes.size == mats.size == cps_arr.size):
        raise ValidationError("strikes/maturities/cps must have equal length")
    dts, quote_steps = _chain_grid(mats, max_dt)
    # numpy operand construction + ONE jitted launch+reduce program —
    # the eager predecessor paid an RPC per jnp op plus ~7 reductions
    # PER QUOTE over the tunnel (CLAUDE.md: hot wrappers are single
    # jitted programs, operands built with numpy)
    pvec = np.asarray([float(params.v0), float(params.kappa),
                       float(params.theta), float(params.sigma),
                       float(params.rho)], np.float32)
    n_blocks = max(1, math.ceil(n_paths / PATHS_PER_BLOCK))
    dfs = np.exp(-float(rate) * np.maximum(mats, EPS_TIME)).astype(np.float32)
    return _chain_ladder_pipeline(
        pvec, np.asarray(dts, np.float32), float(spot), float(rate),
        float(dividend), np.asarray(strikes, np.float32), dfs,
        np.asarray([seed, 0], np.int32),
        n_blocks=n_blocks, quote_steps=quote_steps,
        cps=tuple(float(c) for c in cps_arr), sampler=sampler,
        n=n_blocks * PATHS_PER_BLOCK)


@functools.partial(jax.jit, static_argnames=("n_blocks", "quote_steps",
                                             "cps", "sampler", "n"))
def _chain_ladder_pipeline(pvec, dts, spot, rate, dividend, strikes, dfs,
                           seed_arr, *, n_blocks, quote_steps, cps,
                           sampler, n):
    """Chain launch + per-quote (price, stderr, 5-param grad) reductions
    as ONE traced program (one tunnel dispatch). pvec, the market
    scalars, and the SEED are all traced operands — one compiled program
    serves every calibration step, market tick, and CRN reseed."""
    outs = _chain_launch_from_pvec(pvec, dts, spot, rate, dividend,
                                   n_blocks=n_blocks,
                                   quote_steps=quote_steps, cps=cps,
                                   sampler=sampler, seed=seed_arr,
                                   strikes=strikes)
    return _chain_reduce(outs, dfs, np.asarray(cps, np.float32),
                         np.float32(n))


def _chain_launch_from_pvec(pvec, dts, spot, rate, dividend, *, n_blocks,
                            quote_steps, cps, sampler, seed, strikes):
    """Assemble the SMEM param vector from a TRACED pvec (jit-friendly —
    the calibration loop differentiates through this assembly).
    ``seed`` may be a host int OR a prebuilt (2,) int32 operand (traced
    seeds let one compiled program serve every seed)."""
    v0, kap, th, sig, rho = pvec[0], pvec[1], pvec[2], pvec[3], pvec[4]
    srho = jnp.sqrt(jnp.maximum(1.0 - rho * rho, 1e-8))
    crho = rho / jnp.maximum(srho, 1e-4)
    # asarray (not the f32 scalar constructor): spot/rate/dividend may be
    # TRACED operands — one compiled program serves every market tick
    mu = jnp.asarray(rate, jnp.float32) - jnp.asarray(dividend, jnp.float32)
    head = jnp.stack([jnp.asarray(spot, jnp.float32), mu,
                      kap, th, sig, rho, srho, v0, crho])
    p = jnp.concatenate([head.astype(jnp.float32), dts.astype(jnp.float32),
                         jnp.asarray(strikes, jnp.float32)])
    seed_op = (seed if getattr(seed, "ndim", None) == 1
               else np.asarray([seed, 0], np.int32))
    return _launch_chain(seed_op, p,
                         n_steps=int(dts.shape[0]), n_blocks=n_blocks,
                         quote_steps=quote_steps, cps=cps, sampler=sampler)


def _chain_post(outs, strikes, mats, cps_arr, rate, n):
    # f32 throughout regardless of the x64 flag: the kernel moments are
    # f32 and the custom_vjp cotangents must match the primal dtype
    dfs = np.exp(-rate * np.maximum(mats, EPS_TIME)).astype(np.float32)
    return _chain_reduce(outs, dfs, np.asarray(cps_arr, np.float32),
                         np.float32(n))


def _chain_reduce(outs, dfs, cps32, n32):
    """Per-quote (price, stderr, 5-param grad) from the chain kernel's
    7-moment tiles — shared by the fused ladder pipeline and the
    calibration pricer's custom_vjp."""
    prices, ses, grads = [], [], []
    for q in range(len(cps32)):
        pay = outs[q * 7 + 0].sum() / n32
        pay2 = outs[q * 7 + 1].sum() / n32
        var = jnp.maximum(pay2 - pay * pay, jnp.float32(0.0))
        prices.append(dfs[q] * pay)
        ses.append(dfs[q] * jnp.sqrt(var / n32))
        grads.append(jnp.stack([
            dfs[q] * cps32[q] * outs[q * 7 + 2 + k].sum() / n32
            for k in range(5)]))
    return jnp.stack(prices), jnp.stack(ses), jnp.stack(grads)


def make_chain_pricer(strikes, maturities, cps, spot, rate,
                      dividend: float = 0.0, n_paths: int = 1_000_000,
                      max_dt: float = 0.01, seed: int = 0,
                      sampler: str = "prng"):
    """Build a DIFFERENTIABLE chain pricer pvec(5,) → prices (Q,) whose
    VJP comes from the in-kernel pathwise gradient moments (custom_vjp —
    no AD through the simulation). Fixed seed ⇒ deterministic loss
    surface; drop it into ``ops/optim.scan_adam`` for kernel-speed
    calibration (see ``models.heston.calibrate_heston_mc``)."""
    strikes_a = np.asarray(strikes, np.float64).ravel()
    mats = np.asarray(maturities, np.float64).ravel()
    cps_arr = np.asarray(cps, np.float64).ravel()
    dts, quote_steps = _chain_grid(mats, max_dt)
    dts_j = jnp.asarray(dts, jnp.float32)
    n_blocks = max(1, math.ceil(n_paths / PATHS_PER_BLOCK))
    n = n_blocks * PATHS_PER_BLOCK
    cps_t = tuple(float(c) for c in cps_arr)
    strikes_j = jnp.asarray(strikes_a, jnp.float32)

    def _run(pvec):
        outs = _chain_launch_from_pvec(
            pvec, dts_j, float(spot), float(rate), float(dividend),
            n_blocks=n_blocks, quote_steps=quote_steps, cps=cps_t,
            sampler=sampler, seed=seed, strikes=strikes_j)
        return _chain_post(outs, strikes_a, mats, cps_arr, float(rate), n)

    @jax.custom_vjp
    def prices(pvec):
        p, _, _ = _run(pvec)
        return p

    def fwd(pvec):
        p, _, g = _run(pvec)
        return p, g

    def bwd(g, ct):
        return (g.T @ ct.astype(g.dtype),)

    prices.defvjp(fwd, bwd)
    return prices


@functools.partial(jax.jit, static_argnames=("n_steps", "n_blocks", "cp",
                                             "sampler", "vega", "ladder",
                                             "scheme"))
def _launch(seed, params, *, n_steps: int, n_blocks: int, cp: float,
            sampler: str = "prng", vega: bool = False, ladder: bool = False,
            scheme: str = "euler"):
    if sampler.startswith("sobol"):
        if scheme == "qe":
            raise ValidationError("bridge QMC rides the Euler scheme only "
                                  "(the QE variance transition consumes a "
                                  "uniform the bridge does not pin)")
        if vega or ladder:
            raise ValidationError("bridge QMC is price/delta/rho only — "
                                  "use prng/hash for the sensitivity "
                                  "ladder")
        if n_steps < 2:
            raise ValidationError("bridge QMC needs n_steps >= 2 (terminal "
                                  "+ midpoint coordinates)")
    if scheme == "qe" and ladder:
        n_out = 9
        kern = functools.partial(_heston_qe_ladder_kernel, n_steps=n_steps,
                                 cp=cp, sampler=sampler)
    elif scheme == "qe":
        n_out = 3
        kern = functools.partial(_heston_qe_kernel, n_steps=n_steps, cp=cp,
                                 sampler=sampler)
    else:
        n_out = 9 if ladder else (4 if vega else 3)
        # the 26-tile ladder carry at full lane width sits past a Mosaic
        # compile cliff (>25 min over the tunnel); half-width lanes keep
        # the identical math and compile normally
        kern = functools.partial(_heston_kernel, n_steps=n_steps, cp=cp,
                                 sampler=sampler, vega=vega, ladder=ladder,
                                 lanes=LADDER_LANES if ladder else LANES)
    acc_spec = pl.BlockSpec((ROWS, 128), lambda b: (0, 0), memory_space=pltpu.VMEM)
    interpret = False if jax.default_backend() == "tpu" else pltpu.InterpretParams()
    return pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[acc_spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((ROWS, 128), jnp.float32)] * n_out,
        cost_estimate=pl.CostEstimate(
            flops=n_blocks * n_steps * ROWS * LANES * 2
            * (80 if ladder else (22 if vega else 14)),
            bytes_accessed=n_out * ROWS * 128 * 4,
            transcendentals=n_blocks * n_steps * ROWS * LANES * 6,
        ),
        interpret=interpret,
    )(seed, params)


def _params_vec(spot, strike, maturity, rate, params, dividend, n_steps):
    t = max(float(maturity), EPS_TIME)
    dt = t / n_steps
    rho = float(params.rho)
    return t, np.asarray([
        float(spot), float(strike), (float(rate) - float(dividend)) * dt, dt,
        math.sqrt(dt), float(params.kappa), float(params.theta),
        float(params.sigma), rho, math.sqrt(max(1.0 - rho * rho, 0.0)),
        float(params.v0), t,
    ], np.float32)


def _qe_consts(kap, th, sig, rho, v0, dt, mu):
    """The 11 per-set QE constants (Andersen eq. 33, gamma1=gamma2=1/2):
    [mu_dt, emkd, c1, s2_v, s2_0, k0, k1, k2, k3, k4, v0]."""
    emkd = math.exp(-kap * dt)
    c1 = th * (1.0 - emkd)
    s2_v = sig * sig * emkd * (1.0 - emkd) / kap
    s2_0 = th * sig * sig * (1.0 - emkd) ** 2 / (2.0 * kap)
    g1 = g2 = 0.5
    k0 = -rho * kap * th * dt / sig
    k1 = g1 * dt * (kap * rho / sig - 0.5) - rho / sig
    k2 = g2 * dt * (kap * rho / sig - 0.5) + rho / sig
    k3 = g1 * dt * (1.0 - rho * rho)
    k4 = g2 * dt * (1.0 - rho * rho)
    return [mu * dt, emkd, c1, s2_v, s2_0, k0, k1, k2, k3, k4, v0]


def _params_vec_qe(spot, strike, maturity, rate, params, dividend,
                   n_steps):
    """Host-side QE constants — mirrors ``models/heston.py:_heston_mc_qe``."""
    t = max(float(maturity), EPS_TIME)
    dt = t / n_steps
    c = _qe_consts(float(params.kappa), float(params.theta),
                   float(params.sigma), float(params.rho),
                   float(params.v0), dt, float(rate) - float(dividend))
    # legacy layout: [s0, K, mu_dt, emkd, c1, s2_v, s2_0, k0..k4, v0, pad]
    return t, np.asarray([float(spot), float(strike)] + c + [0.0],
                          jnp.float32)


def _params_vec_qe_ladder(spot, strike, maturity, rate, params, dividend,
                          n_steps, h_rel: float = 1e-3):
    """Base + 6 CRN-bumped QE constant sets (v0, kappa, theta, sigma,
    rho, T). Returns (t, p, hs) — ``hs`` are the absolute bump sizes the
    host-side FD divides by. Multiplicative bumps except rho (additive,
    clipped inside (−1, 1)) so the FD stays well-scaled at any level."""
    t = max(float(maturity), EPS_TIME)
    mu = float(rate) - float(dividend)
    kap, th = float(params.kappa), float(params.theta)
    sig, rho, v0 = float(params.sigma), float(params.rho), float(params.v0)
    dt = t / n_steps
    base = (kap, th, sig, rho, v0, dt)
    h_v0 = h_rel * max(v0, 1e-2)
    h_kap = h_rel * max(kap, 0.1)
    h_th = h_rel * max(th, 1e-2)
    h_sig = h_rel * max(sig, 1e-2)
    h_rho = h_rel
    rho_b = min(rho + h_rho, 0.999)
    h_rho = rho_b - rho
    h_t = h_rel * t
    sets = [
        base,
        (kap, th, sig, rho, v0 + h_v0, dt),
        (kap + h_kap, th, sig, rho, v0, dt),
        (kap, th + h_th, sig, rho, v0, dt),
        (kap, th, sig + h_sig, rho, v0, dt),
        (kap, th, sig, rho_b, v0, dt),
        (kap, th, sig, rho, v0, (t + h_t) / n_steps),
    ]
    p = [float(spot), float(strike)]
    for (k_, t_, s_, r_, v_, d_) in sets:
        p += _qe_consts(k_, t_, s_, r_, v_, d_, mu)
    hs = np.asarray([h_v0, h_kap, h_th, h_sig, h_rho, h_t], np.float32)
    return t, np.asarray(p, np.float32), hs


def _combine_moments(outs, n: int, scalars, cp: float, vega: bool,
                     ladder: bool = False, sampler: str = "prng") -> dict:
    """Moment tiles → price/stderr/delta/rho (+ v0-vega / full ladder).
    Shared by the single-device pipeline and the sharded (psum) path.
    ``scalars``: [spot, t, df, v0] (+ rate when ladder — traced, NOT a
    static jit arg: a static float rate would retrace per distinct
    value). Under QMC the stderr is the randomized-replication estimate
    over the kernel's 8 group-scrambled Sobol replicates (rid % 8) —
    sqrt(Var/n) is unreliable under QMC (see ops/exotic_pallas)."""
    import math as _math

    spot, t, df, v0 = scalars[:4]
    rate = scalars[4] if ladder else 0.0
    pay, pay2, m1 = outs[:3]
    mean = pay.sum() / n
    var = jnp.maximum(pay2.sum() / n - mean * mean, 0.0)
    if sampler.startswith("sobol"):
        rep = pay.reshape(pay.shape[0] // 8, 8, -1).sum(axis=(0, 2)) \
            * (8.0 / n)
        se = rep.std(ddof=1) / _math.sqrt(8.0)
    else:
        se = jnp.sqrt(var / n)
    mean1 = m1.sum() / n
    price = df * mean
    out = {
        "price": price,
        "std_error": df * se,
        # ∂S_T/∂S0 = S_T/S0 (S0 enters x only through log S0)
        "delta": df * cp * mean1 / spot,
        # ∂x_T/∂r = T → dpay = cp·1{ex}·S_T·T; plus the discount term
        "rho": t * (df * cp * mean1 - price),
    }
    if ladder:
        dv0, dkap, dth, dsig, drho, dt_m = [
            df * cp * outs[3 + k].sum() / n for k in range(6)]
        out["vega_v0"] = dv0
        out["vega"] = 2.0 * jnp.sqrt(v0) * dv0
        out["d_kappa"] = dkap
        out["d_theta"] = dth
        out["d_sigma"] = dsig
        out["d_rho"] = drho
        # theta (calendar) = −∂V/∂T = r·V − df·E[∂pay/∂T]
        out["theta"] = rate * price - dt_m
    elif vega:
        meanv = outs[3].sum() / n
        out["vega_v0"] = df * cp * meanv  # ∂price/∂v0 (pathwise, exact in-scheme)
        # chain rule to spot-vol vega: σ0 = √v0 ⇒ ∂/∂σ0 = 2σ0·∂/∂v0
        out["vega"] = 2.0 * jnp.sqrt(v0) * out["vega_v0"]
    return out


def _combine_qe_ladder(outs, n: int, scalars, cp: float) -> dict:
    """QE CRN-bump moment tiles → the full ladder dict. ``scalars``:
    [spot, t, df, v0, rate, h_v0, h_kap, h_th, h_sig, h_rho, h_t]
    (traced). Same output keys as the Euler ladder."""
    spot, t, df, v0, rate = scalars[:5]
    hs = scalars[5:11]
    pay, pay2, m1 = outs[:3]
    mean = pay.sum() / n
    var = jnp.maximum(pay2.sum() / n - mean * mean, 0.0)
    mean1 = m1.sum() / n
    price = df * mean
    # forward CRN differences of the bumped-system payoff means
    d = [(outs[3 + k].sum() / n - mean) / hs[k] for k in range(6)]
    dv0 = df * d[0]
    return {
        "price": price,
        "std_error": df * jnp.sqrt(var / n),
        "delta": df * cp * mean1 / spot,       # exact pathwise (S_T ∝ S0)
        "rho": t * (df * cp * mean1 - price),  # exact pathwise (∂x_T/∂r = T)
        "vega_v0": dv0,
        "vega": 2.0 * jnp.sqrt(v0) * dv0,
        "d_kappa": df * d[1],
        "d_theta": df * d[2],
        "d_sigma": df * d[3],
        "d_rho": df * d[4],
        # theta (calendar) = −∂(df·mean)/∂T = r·price − df·∂mean/∂T
        "theta": rate * price - df * d[5],
    }


@functools.partial(jax.jit,
                   static_argnames=("n_steps", "n_blocks", "cp", "sampler",
                                    "vega", "ladder", "scheme"))
def _pipeline(seed, p, scalars, *, n_steps, n_blocks, cp, sampler,
              vega=False, ladder=False, scheme="euler"):
    """launch → moment combination in ONE traced program (single dispatch
    over the tunnel — the ~25-30 ms eager-op overhead otherwise dominates
    small workloads)."""
    outs = _launch(seed, p, n_steps=n_steps, n_blocks=n_blocks,
                   cp=cp, sampler=sampler, vega=vega, ladder=ladder,
                   scheme=scheme)
    ppb = LADDER_PATHS_PER_BLOCK if ladder else PATHS_PER_BLOCK
    if scheme == "qe" and ladder:
        return _combine_qe_ladder(outs, n_blocks * ppb, scalars, cp)
    return _combine_moments(outs, n_blocks * ppb, scalars, cp,
                            vega, ladder=ladder, sampler=sampler)


def pallas_heston_greeks(spot, strike, maturity, rate, params, cp: float = 1.0,
                         dividend: float = 0.0, n_paths: int = 1_000_000,
                         n_steps: int = 100, seed: int = 0,
                         sampler: str = "prng", vega: bool = True,
                         ladder: bool = False, scheme: str = "euler",
                         h_rel: float = 1e-3) -> dict:
    """Heston price + stderr + pathwise delta/rho (+ v0-vega) in one pass.

    ``params``: a ``models.heston.HestonParams`` (or anything with
    v0/kappa/theta/sigma/rho attributes). With ``vega=True`` (default) the
    kernel carries the forward sensitivities (∂x/∂v0, ∂v/∂v0) through the
    Euler recursion and returns ``vega_v0`` (∂price/∂v0) plus ``vega``
    (∂price/∂√v0).

    ``ladder=True`` returns the FULL parameter ladder in the same pass:
    ``d_kappa``, ``d_theta``, ``d_sigma``, ``d_rho`` (∂price/∂param — the
    complete calibration gradient) and ``theta`` (calendar, −∂V/∂T), each
    the exact pathwise derivative of the Euler scheme. Validated against
    AD of the Lewis integral (``models.heston.heston_price``); capability
    anchor ``src/greeks/unified_greeks.py:235`` (the reference FD engine
    covers every parameter — this does it at kernel speed, unbiased).
    The returned dict also carries ``paths``.

    ``scheme="qe"`` + ``ladder=True``: the same ladder on the Andersen-QE
    scheme via in-kernel common-random-number forward bumps of relative
    size ``h_rel`` (the QE branch switch is not pathwise-differentiable —
    see ``_heston_qe_ladder_kernel``). Near-unbiased at coarse steps
    where the Euler ladder inherits the Euler discretization bias.
    """
    if scheme == "qe":
        if not ladder:
            raise ValidationError("scheme='qe' greeks require ladder=True "
                                  "(the CRN-bump kernel) — price/delta/rho "
                                  "alone ride pallas_heston_price")
        t, p, hs = _params_vec_qe_ladder(spot, strike, maturity, rate,
                                         params, dividend, n_steps, h_rel)
        n_blocks = max(1, math.ceil(n_paths / LADDER_PATHS_PER_BLOCK))
        scalars = np.asarray(
            [float(spot), t, math.exp(-float(rate) * t), float(params.v0),
             float(rate)] + list(hs), np.float32)
        out = dict(_pipeline(np.asarray([seed, 0], np.int32), p, scalars,
                             n_steps=n_steps, n_blocks=n_blocks,
                             cp=float(cp), sampler=sampler, ladder=True,
                             scheme="qe"))
        out["paths"] = n_blocks * LADDER_PATHS_PER_BLOCK
        return out
    t, p = _params_vec(spot, strike, maturity, rate, params, dividend, n_steps)
    ppb = LADDER_PATHS_PER_BLOCK if ladder else PATHS_PER_BLOCK
    n_blocks = max(1, math.ceil(n_paths / ppb))
    scalars = np.asarray([float(spot), t, math.exp(-float(rate) * t),
                          float(params.v0), float(rate)], np.float32)
    out = dict(_pipeline(np.asarray([seed, 0], np.int32), p, scalars,
                         n_steps=n_steps, n_blocks=n_blocks, cp=float(cp),
                         sampler=sampler, vega=vega and not ladder,
                         ladder=ladder))
    out["paths"] = n_blocks * ppb
    return out


# ---------------------------------------------------------------------------
# Path-dependent (exotic) payoffs under Heston — the last cell of the
# payoff × dynamics matrix at kernel speed (GBM: exotic_pallas, local vol:
# local_vol_pallas, stochastic vol: here). Reference anchors:
# src/pricing_models/exotic_options.py (payoff families) ×
# src/pricing_models/heston.py:184 (dynamics) — the reference has no
# stochastic-vol exotics at all.
# ---------------------------------------------------------------------------
HESTON_EXOTIC_KINDS = (
    "asian_arith", "asian_geo", "lookback_float", "lookback_fixed",
    "barrier_up-and-out", "barrier_up-and-in", "barrier_down-and-out",
    "barrier_down-and-in",
    "one_touch_up", "one_touch_down", "no_touch_up", "no_touch_down",
    "cliquet", "autocall", "range_accrual",
    # double kinds: band (lower, upper) in relative-log slots _HX_A/_HX_B
    "barrier_double-out", "barrier_double-in",
    "one_touch_double", "no_touch_double",
    # pay-at-hit one-touches: cash discounted AT the first hit in-kernel
    # (host df = 1, like autocall); LR rho/theta complete via a DR moment
    "one_touch_up_hit", "one_touch_down_hit", "one_touch_double_hit",
)

# exotic param vector layout (SMEM f32): common head + dynamics tail
(_HX_S0, _HX_K, _HX_LOGB, _HX_INVN, _HX_RDT, _HX_DT, _HX_SQDT,
 _HX_A, _HX_B, _HX_C, _HX_D, _HX_E, _HX_DYN) = range(13)
# euler tail: [mu_dt, kappa, theta, sigma_v, rho, srho, v0]
# qe tail:    [mu_dt, emkd, c1, s2_v, s2_0, k0, k1, k2, k3, k4, v0]


def _heston_exotic_kernel(seed_ref, p_ref, *refs, kind: str, n_steps: int,
                          cp: float, period: int, sampler: str, scheme: str,
                          lr: bool = False, jumps: bool = False,
                          n_contracts: int = 1):
    """Exotic payoffs under Heston, fully fused: (x, v) plus the payoff's
    running statistics live in VMEM registers for the whole path.

    Statistics are carried in RELATIVE-LOG space wherever possible (the
    fast-exp discipline): extrema/barriers compare x against
    ``log(level/S0)`` directly (exp is monotone), so only the arithmetic
    Asian and cliquet pay a per-step exp.

    ``lr=True`` (Euler scheme) reduces likelihood-ratio score moments in
    the same pass. All scores differentiate the JOINT (y, v) transition
    density — under correlation the spot score is the INDEPENDENT normal
    zo₀, not zx₀ (the marginal zx₀ score leaks rho·E[pay·zv₀] of
    variance-path dependence and is biased for any payoff correlated with
    the vol path):

      D1 = Σ pay·zo₀            → delta = D1/(n S0 √(1−ρ²) √(v0 dt))
      DG = Σ pay·(zo₀²−1)       → gamma (with the same 1/√(1−ρ²) scaling)
      DV = Σ pay·score_v0       exact ∂ln p/∂v0 (v0 enters ONLY the two
           step-0 transitions — Markov): score_v0 = −zv₀·a − zo₀·(b−ρa)/√(1−ρ²)
           − 1/v0 with a = ∂zv₀/∂v0, b = ∂zx₀/∂v0 at fixed path
      SR = Σ pay·Σᵢ zoᵢ·√dt/(√(1−ρ²)√vᵢ⁺)  drift score → rate rho (gated
           at vᵢ⁺=0, where the truncated transition is deterministic and
           carries no rate information)
      TS = Σ pay·Σᵢ tᵢ, the dt = T/n maturity score of BOTH transitions,
           tᵢ = zvᵢκ(θ−vᵢ⁺)/(σ√(vᵢ⁺dt)) + zoᵢ[(μ−vᵢ⁺/2)−ρκ(θ−vᵢ⁺)/σ]/
           (√(1−ρ²)√(vᵢ⁺dt)) + (zvᵢ²+zoᵢ²−2)/(2dt), gated at vᵢ⁺=0
           → theta = r·price − df·E[pay·TS]/n

    Structured kinds: cliquet works as-is (delta/gamma are the
    frozen-fixings hedge sensitivities — the first baseline IS S0, so the
    score measures spot sensitivity with fixings frozen); autocall
    discounts in-kernel, so an 8th moment DR = −Σ tᵢ·dfᵢ·cashᵢ (incl.
    final redemption) completes rho and theta exactly as in the GBM
    autocall ladder (``exotic_pallas`` ``discounted=True``).
    """
    hit_pay = kind.endswith("_hit")  # cash discounted at first hit
    if n_contracts > 1:
        # contract-book launch: rows interleave contracts (contract id =
        # rid % n_contracts); per-contract payoff params ride SMEM
        book_ref, *refs = refs
    if lr:
        if kind == "autocall" or hit_pay:
            (pay_ref, pay2_ref, d1_ref, dg_ref, dv_ref, sr_ref, ts_ref,
             dr_ref) = refs
        else:
            pay_ref, pay2_ref, d1_ref, dg_ref, dv_ref, sr_ref, ts_ref = refs
    else:
        pay_ref, pay2_ref = refs
    block = pl.program_id(0) + seed_ref[1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in refs:
            ref[:, :] = jnp.zeros_like(ref)

    qmc = sampler.startswith("sobol_bb")
    # QMC residuals always ride the counter-based hash stream (exact
    # two-pass replay; hardware-PRNG residuals trip a pathological
    # Mosaic compile — see the vanilla Heston kernel)
    residual = "hash" if (qmc or sampler == "hash") else sampler
    if residual != "hash":
        pltpu.prng_seed(seed_ref[0] + block * jnp.int32(-1640531535))
    seed = seed_ref[0]

    s0 = p_ref[_HX_S0]
    inv_n, rdt = p_ref[_HX_INVN], p_ref[_HX_RDT]
    if n_contracts > 1:
        # per-contract payoff params as (ROWS, 1) row tiles (broadcast
        # against the (ROWS, LANES) path tiles): book slot layout
        # [K, LOGB, A, B, C, D, E] per contract, contract = rid % nc
        ridc = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0) \
            % n_contracts

        def _row(slot):
            v = jnp.full((ROWS, 1), book_ref[slot], jnp.float32)
            for c in range(1, n_contracts):
                v = jnp.where(ridc == c, book_ref[c * 7 + slot], v)
            return v

        strike, log_b = _row(0), _row(1)
        pA, pB, pC, pD, pE = (_row(2), _row(3), _row(4), _row(5), _row(6))
    else:
        strike, log_b = p_ref[_HX_K], p_ref[_HX_LOGB]
        pA, pB = p_ref[_HX_A], p_ref[_HX_B]
        pC, pD, pE = p_ref[_HX_C], p_ref[_HX_D], p_ref[_HX_E]
    dt, sqrt_dt = p_ref[_HX_DT], p_ref[_HX_SQDT]
    mu_dt = p_ref[_HX_DYN]
    if scheme == "euler":
        kappa, theta_lr = p_ref[_HX_DYN + 1], p_ref[_HX_DYN + 2]
        sigma_v, rho = p_ref[_HX_DYN + 3], p_ref[_HX_DYN + 4]
        srho, v0 = p_ref[_HX_DYN + 5], p_ref[_HX_DYN + 6]
    else:
        emkd, c1 = p_ref[_HX_DYN + 1], p_ref[_HX_DYN + 2]
        s2_v, s2_0 = p_ref[_HX_DYN + 3], p_ref[_HX_DYN + 4]
        k0, k1 = p_ref[_HX_DYN + 5], p_ref[_HX_DYN + 6]
        k2, k3 = p_ref[_HX_DYN + 7], p_ref[_HX_DYN + 8]
        k4, v0 = p_ref[_HX_DYN + 9], p_ref[_HX_DYN + 10]
        rho = srho = jnp.float32(0.0)  # correlation folded into k-weights
    if jumps:
        # Bates tail: inverse-CDF count thresholds (truncate at 3 jumps
        # per step, bias O((lam*dt)^4)), size params, intensity
        jb = _HX_DYN + (7 if scheme == "euler" else 11)
        thr0, thr1, thr2 = p_ref[jb], p_ref[jb + 1], p_ref[jb + 2]
        mu_j, sigma_j, lam_j = p_ref[jb + 3], p_ref[jb + 4], p_ref[jb + 5]

    shape = (ROWS, LANES)
    zero = jnp.zeros(shape, jnp.float32)
    one = jnp.ones(shape, jnp.float32)
    barrier_up = "up" in kind
    knock_in = kind.endswith("in")

    def init_stat():
        if kind in ("asian_arith", "asian_geo"):
            return (zero,)
        if kind.startswith("lookback"):
            return (zero,)  # extremum of x, seeded at x0 = 0 (S0 included)
        if kind == "cliquet":
            return (zero, zero)  # (period-start x, capped-return acc)
        if kind == "autocall":
            # (alive, knocked-in, pv[, discount-derivative moment])
            return (one, zero, zero, zero) if lr else (one, zero, zero)
        if kind == "range_accrual":
            return (zero,)  # accrual counter, steps 1..n
        if hit_pay:
            if "double" in kind:
                h0 = jnp.where((pA >= 0.0)
                               | (pB <= 0.0), 1.0, 0.0)
            else:
                h0 = jnp.where(log_b <= 0.0 if barrier_up else log_b >= 0.0,
                               1.0, 0.0)
            # (hit flag, pv = df-at-first-hit; df(0) = 1 [, dr])
            return (zero + h0, zero + h0) + ((zero,) if lr else ())
        if "double" in kind:
            # x0 = 0 outside the log band [A, B] counts as hit
            hit0 = jnp.where((pA >= 0.0) | (pB <= 0.0),
                             1.0, 0.0)
            return (zero + hit0,)
        # x0 = 0: S0 already beyond the barrier counts as hit
        hit0 = jnp.where(log_b <= 0.0 if barrier_up else log_b >= 0.0,
                         1.0, 0.0)
        return (zero + hit0,)

    def update_stat(stat, x, i):
        if kind == "asian_arith":
            return (stat[0] + jnp.exp(x),)  # relative prices (small args)
        if kind == "asian_geo":
            return (stat[0] + x,)
        if kind.startswith("lookback"):
            lo = (cp > 0) == (kind == "lookback_float")  # float call / fixed put: min
            return ((jnp.minimum if lo else jnp.maximum)(stat[0], x),)
        if kind == "cliquet":
            x_start, acc = stat
            is_end = jnp.where((i + 1) % period == 0, 1.0, 0.0)
            capped = jnp.clip(jnp.exp(x - x_start) - 1.0,
                              pA, pB)
            acc = acc + is_end * capped
            x_start = x_start + is_end * (x - x_start)
            return (x_start, acc)
        if kind == "autocall":
            alive, ki, pv = stat[:3]
            ki = jnp.maximum(ki, jnp.where(x <= pC, 1.0, 0.0))
            is_obs = jnp.where((i + 1) % period == 0, 1.0, 0.0)
            steps = (i + 1).astype(jnp.float32)
            df_i = jnp.exp(-rdt * steps)
            called = alive * is_obs * jnp.where(x >= pA, 1.0, 0.0)
            couponed = alive * is_obs * jnp.where(x >= pB, 1.0, 0.0)
            cash = pD * couponed + pE * called
            pv = pv + df_i * cash
            alive = alive * (1.0 - called)
            if lr:  # DR = −Σ tᵢ·dfᵢ·cashᵢ (coupon/call legs)
                dr = stat[3] - steps * dt * df_i * cash
                return (alive, ki, pv, dr)
            return (alive, ki, pv)
        if kind == "range_accrual":
            # corridor in RELATIVE log space: A=log(L/S0), B=log(U/S0)
            acc = jnp.where((x >= pA) & (x <= pB),
                            1.0, 0.0)
            return (stat[0] + acc,)
        if hit_pay:
            h, pv = stat[:2]
            if "double" in kind:
                now = (x <= pA) | (x >= pB)
            else:
                now = (x >= log_b) if barrier_up else (x <= log_b)
            now = now.astype(jnp.float32)
            newly = (1.0 - h) * now
            steps = (i + 1).astype(jnp.float32)
            df_i = jnp.exp(-rdt * steps)
            pv = pv + newly * df_i
            if lr:  # ∂pv/∂r = −t_hit·df_hit on the newly-hit event
                return (jnp.maximum(h, now), pv,
                        stat[2] - steps * dt * newly * df_i)
            return (jnp.maximum(h, now), pv)
        if "double" in kind:
            hit = (x <= pA) | (x >= pB)
            return (jnp.maximum(stat[0], hit.astype(jnp.float32)),)
        hit = (x >= log_b) if barrier_up else (x <= log_b)
        return (jnp.maximum(stat[0], hit.astype(jnp.float32)),)

    def payoff(stat, x):
        s_t = s0 * jnp.exp(x)
        if kind == "asian_arith":
            return jnp.maximum(cp * (s0 * stat[0] * inv_n - strike), 0.0)
        if kind == "asian_geo":
            return jnp.maximum(cp * (s0 * jnp.exp(stat[0] * inv_n) - strike),
                               0.0)
        if kind == "lookback_float":
            ext = s0 * jnp.exp(stat[0])
            return (s_t - ext) if cp > 0 else (ext - s_t)
        if kind == "lookback_fixed":
            return jnp.maximum(cp * (s0 * jnp.exp(stat[0]) - strike), 0.0)
        if kind == "cliquet":
            return pE * jnp.clip(stat[1], pC,
                                           pD)
        if kind == "autocall":
            alive, ki, pv = stat[:3]
            df_t = jnp.exp(-rdt * float(n_steps))
            loss = jnp.maximum(1.0 - jnp.exp(x), 0.0)
            final = pE * (1.0 - ki * loss)
            return pv + alive * df_t * final  # discounted in-kernel
        if hit_pay:
            return stat[1]  # df-at-hit carried in-kernel (host df = 1)
        if "touch" in kind:
            return stat[0] if kind.startswith("one") else (1.0 - stat[0])
        if kind == "range_accrual":
            return pE * stat[0] * inv_n
        vanilla = jnp.maximum(cp * (s_t - strike), 0.0)
        return vanilla * (stat[0] if knock_in else (1.0 - stat[0]))

    def advance_euler(x, v, zv, zx, zo):
        ind = jnp.where(v > 0.0, 1.0, 0.0)
        vp = v * ind
        sq = jnp.sqrt(vp)
        x_new = x + mu_dt - 0.5 * vp * dt + sq * sqrt_dt * zx
        v_new = v + kappa * (theta_lr - vp) * dt + sigma_v * sq * sqrt_dt * zv
        if not lr:
            return x_new, v_new, None, None
        # per-step scores of the joint density at fixed endpoints, gated
        # where the truncated transition is deterministic (v⁺ = 0):
        #   rate:  the drift perturbs only the INDEPENDENT shock zo
        #          → zo·√dt/(srho·√v⁺)
        #   maturity (dt = T/n): both shocks and the Jacobian move
        #          → zv·κ(θ−v⁺)/(σ√(v⁺dt)) + zo·[(μ−v⁺/2)−ρκ(θ−v⁺)/σ]/
        #            (srho·√(v⁺dt)) + (zv²+zo²−2)/(2dt)
        srho_g = jnp.maximum(srho, 1e-4)
        inv_sqvdt = ind / (jnp.maximum(sq, 1e-6) * sqrt_dt)
        ds = zo * dt * inv_sqvdt / srho_g
        kth = kappa * (theta_lr - vp)
        ts = (zv * kth / sigma_v * inv_sqvdt
              + zo * (mu_dt / dt - 0.5 * vp - rho * kth / sigma_v)
              * inv_sqvdt / srho_g
              + ind * (zv * zv + zo * zo - 2.0) / (2.0 * dt))
        return x_new, v_new, ds, ts

    def advance_qe(x, v, zv, zx, u):
        m = c1 + emkd * v
        s2 = s2_v * v + s2_0
        psi = s2 / jnp.maximum(m * m, 1e-30)
        inv_psi = 2.0 / jnp.maximum(psi, 1e-10)
        b2 = jnp.maximum(inv_psi - 1.0 + jnp.sqrt(
            jnp.maximum(inv_psi * (inv_psi - 1.0), 0.0)), 0.0)
        a = m / (1.0 + b2)
        v_quad = a * (jnp.sqrt(b2) + zv) ** 2
        p_mass = jnp.clip((psi - 1.0) / (psi + 1.0), 0.0, 1.0 - 1e-7)
        beta = (1.0 - p_mass) / jnp.maximum(m, 1e-30)
        v_exp = jnp.where(
            u <= p_mass, 0.0,
            jnp.log((1.0 - p_mass) / jnp.maximum(1.0 - u, 1e-30))
            / jnp.maximum(beta, 1e-30))
        v_new = jnp.where(psi <= 1.5, v_quad, v_exp)
        x_new = x + mu_dt + k0 + k1 * v + k2 * v_new \
            + jnp.sqrt(jnp.maximum(k3 * v + k4 * v_new, 0.0)) * zx
        return x_new, v_new

    if qmc:
        # Hybrid bridge QMC over BOTH streams (Euler price path only,
        # lr=False): one scrambled Sobol point pins up to 4 dyadic z-sum
        # coordinates of the variance stream AND 4 of the orthogonal spot
        # stream; hash residuals fill in conditionally per segment. The
        # bridge reparameterizes the iid normals — the payoff statistics
        # update inside the segment replay exactly as under plain MC.
        assert scheme == "euler" and not lr
        bounds, constructs = _bridge_plan(n_steps, 4)
        n_lvl = 1 + len(constructs)  # per stream
        rid = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        cid = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        # group-salted scrambles: 8 independent replicates (rid % 8) so
        # the host can quote a randomized-QMC stderr (see exotic_pallas)
        g_id = rid & 7
        idx = block * ((ROWS // 8) * LANES) + (rid >> 3) * LANES + cid + 1
        mask30 = jnp.int32((1 << _QMC_BITS) - 1)
        h = _mix32((seed + g_id * jnp.int32(0x3C6EF372))
                   * jnp.int32(-1640531535) + jnp.int32(0x2C9277B5))
        scrambles = []
        for _ in range(2 * n_lvl):
            scrambles.append(h & mask30)
            h = _mix32(h + jnp.int32(-1640531527))
        us = _sobol_nd(idx, scrambles, 2 * n_lvl)
        gv, go = [], []
        for k in range(n_lvl):
            rad = jnp.sqrt(-2.0 * jnp.log(us[2 * k]))
            th = TWO_PI * us[2 * k + 1]
            gv.append(rad * jnp.cos(th))
            go.append(rad * jnp.sin(th))
        csums = []
        for g in (gv, go):
            csum = {0: zero, n_steps: math.sqrt(float(n_steps)) * g[0]}
            for (m, a, b), gd in zip(constructs, g[1:]):
                frac = (m - a) / (b - a)
                sd = math.sqrt((m - a) * (b - m) / (b - a))
                csum[m] = csum[a] + (csum[b] - csum[a]) * frac + sd * gd
            csums.append(csum)
        segs = list(zip(bounds[:-1], bounds[1:]))
        tv = [csums[0][b] - csums[0][a] for a, b in segs]
        to = [csums[1][b] - csums[1][a] for a, b in segs]

        def pre(i, carry):
            sv, so = carry
            z1, z2 = draw_normals(residual, seed, block, i, n_steps, shape)
            return sv + z1, so + z2

        seg_sums = [jax.lax.fori_loop(a, b, pre, (zero, zero))
                    for a, b in segs]

    def make_body(offs):
        def body(i, carry):
            xa, va, xb, vb = carry[:4]
            sta = carry[4]
            stb = carry[5]
            zv, zo = draw_normals(residual, seed, block, i, n_steps, shape)
            if offs is None:
                zva, zoa, zvb, zob = zv, zo, -zv, -zo
            else:
                # conditional-law residuals: each branch's segment z-sums
                # are pinned to the shared bridge targets
                ovp, oop, ovm, oom = offs
                zva, zoa = zv + ovp, zo + oop
                zvb, zob = -zv + ovm, -zo + oom
            if scheme == "qe":
                # QE folds correlation into the k-weights: the spot shock
                # is the INDEPENDENT normal zo (Andersen eq. 33)
                u = draw_uniform(residual, seed, block, i, n_steps, shape)
                xa, va = advance_qe(xa, va, zva, zoa, u)
                xb, vb = advance_qe(xb, vb, zvb, zob, 1.0 - u)
                dsa = dsb = tsa = tsb = None
            else:
                zxa = rho * zva + srho * zoa
                zxb = rho * zvb + srho * zob
                xa, va, dsa, tsa = advance_euler(xa, va, zva, zxa, zoa)
                xb, vb, dsb, tsb = advance_euler(xb, vb, zvb, zxb, zob)
            if jumps:
                # compound-Poisson log-jump: count shared across the
                # antithetic pair (valid MC — marginals exact), size
                # normal mirrored; x-only, independent of the vol scheme
                uj, zj = draw_jump(residual, seed, block, i, n_steps, shape)
                n_j = (jnp.where(uj > thr0, 1.0, 0.0)
                       + jnp.where(uj > thr1, 1.0, 0.0)
                       + jnp.where(uj > thr2, 1.0, 0.0))
                jsz = sigma_j * jnp.sqrt(n_j)
                xa = xa + n_j * mu_j + jsz * zj
                xb = xb + n_j * mu_j - jsz * zj
                if lr:
                    # Poisson dt-score: d ln P(n | lam dt)/d dt = n/dt - lam
                    tj = n_j / dt - lam_j
                    tsa = tsa + tj
                    tsb = tsb + tj
            sta = update_stat(sta, xa, i)
            stb = update_stat(stb, xb, i)
            if not lr:
                return (xa, va, xb, vb, sta, stb)
            zv0, zo0, sra, srb, tta, ttb = carry[6:12]
            first = i == 0
            zv0 = jnp.where(first, zv, zv0)
            zo0 = jnp.where(first, zo, zo0)
            return (xa, va, xb, vb, sta, stb, zv0, zo0, sra + dsa,
                    srb + dsb, tta + tsa, ttb + tsb)

        return body

    x0 = zero
    vv0 = jnp.full(shape, v0, jnp.float32)
    carry0 = (x0, vv0, x0, vv0, init_stat(), init_stat()) \
        + ((zero, zero, zero, zero, zero, zero) if lr else ())
    if qmc:
        out = carry0
        for j, (a, b) in enumerate(segs):
            sv_j, so_j = seg_sums[j]
            inv = 1.0 / (b - a)
            offs = ((tv[j] - sv_j) * inv, (to[j] - so_j) * inv,
                    (tv[j] + sv_j) * inv, (to[j] + so_j) * inv)
            out = jax.lax.fori_loop(a, b, make_body(offs), out)
    else:
        out = jax.lax.fori_loop(0, n_steps, make_body(None), carry0)
    xa, _, xb, _ = out[:4]
    sta, stb = out[4], out[5]
    zv0, zo0, sra, srb, tta, ttb = (out[6:12] if lr
                                    else (zero,) * 6)

    accs = [jnp.zeros(shape, jnp.float32) for _ in range(len(refs))]
    if lr:
        sq_v0dt = jnp.sqrt(jnp.maximum(v0, 1e-8) * dt)
        inv_v0 = 1.0 / jnp.maximum(v0, 1e-8)
        srho_g = jnp.maximum(srho, 1e-4)
    for sign, x, st, sr, ts in ((1.0, xa, sta, sra, tta),
                                (-1.0, xb, stb, srb, ttb)):
        p = payoff(st, x)
        accs[0] += p
        accs[1] += p * p
        if lr:
            zvs, zos = sign * zv0, sign * zo0
            zxs = rho * zvs + srho * zos
            accs[2] += p * zos
            accs[3] += p * (zos * zos - 1.0)
            # score_v0 = −zv₀·a − zo₀·(b − ρa)/srho − 1/v0;
            # a = ∂zv₀/∂v0 = (κdt−1)/(σ√(v0dt)) − zv₀/(2v0),
            # b = ∂zx₀/∂v0 = √dt/(2√v0) − zx₀/(2v0)   (at fixed path)
            a_t = (kappa * dt - 1.0) / (sigma_v * sq_v0dt) \
                - zvs * (0.5 * inv_v0)
            b_t = sqrt_dt / (2.0 * jnp.sqrt(jnp.maximum(v0, 1e-8))) \
                - zxs * (0.5 * inv_v0)
            sc_v = -zvs * a_t - zos * (b_t - rho * a_t) / srho_g - inv_v0
            accs[4] += p * sc_v
            accs[5] += p * sr
            accs[6] += p * ts
            if hit_pay:
                accs[7] += st[2]
            elif kind == "autocall":
                # DR: coupon/call legs (carried) + final-redemption leg
                alive, ki = st[0], st[1]
                df_t = jnp.exp(-rdt * float(n_steps))
                loss = jnp.maximum(1.0 - jnp.exp(x), 0.0)
                final = pE * (1.0 - ki * loss)
                t_total = dt * float(n_steps)
                accs[7] += st[3] - alive * t_total * df_t * final
    for off in range(0, LANES, 128):
        for ref, a in zip(refs, accs):
            ref[:, :] += a[:, off:off + 128]


@functools.partial(jax.jit, static_argnames=("kind", "n_steps", "n_blocks",
                                             "cp", "period", "sampler",
                                             "scheme", "lr", "jumps",
                                             "n_contracts"))
def _launch_exotic(seed, params, book=None, *, kind: str, n_steps: int,
                   n_blocks: int, cp: float, period: int = 1,
                   sampler: str = "prng", scheme: str = "euler",
                   lr: bool = False, jumps: bool = False,
                   n_contracts: int = 1):
    n_out = (8 if (kind == "autocall" or kind.endswith("_hit"))
             else 7) if lr else 2
    acc_spec = pl.BlockSpec((ROWS, 128), lambda b: (0, 0),
                            memory_space=pltpu.VMEM)
    interpret = (False if jax.default_backend() == "tpu"
                 else pltpu.InterpretParams())
    operands = (seed, params) if n_contracts == 1 else (seed, params, book)
    return pl.pallas_call(
        functools.partial(_heston_exotic_kernel, kind=kind, n_steps=n_steps,
                          cp=cp, period=period, sampler=sampler,
                          scheme=scheme, lr=lr, jumps=jumps,
                          n_contracts=n_contracts),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * len(operands),
        out_specs=[acc_spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((ROWS, 128), jnp.float32)] * n_out,
        cost_estimate=pl.CostEstimate(
            flops=n_blocks * n_steps * ROWS * LANES * 2 * (30 if lr else 22),
            bytes_accessed=n_out * ROWS * 128 * 4,
            transcendentals=n_blocks * n_steps * ROWS * LANES * 8,
        ),
        interpret=interpret,
    )(*operands)


@functools.partial(jax.jit, static_argnames=("kind", "n_steps", "n_blocks",
                                             "cp", "period", "sampler",
                                             "scheme", "jumps"))
def _exotic_price_pipeline(seed, p, df, *, kind, n_steps, n_blocks, cp,
                           period=1, sampler="prng", scheme="euler",
                           jumps=False):
    """Launch + moment reduction in ONE jitted program (one tunnel
    dispatch). The eager-reduction predecessor cost ~5 extra RPC
    round-trips per price call — at 64-step workloads that overhead,
    not the kernel, set the measured rate (see CLAUDE.md "hot paths
    must be single jitted programs"). Under ``sobol_bb`` the stderr is
    the randomized-replication estimate over the kernel's 8
    group-scrambled Sobol replicates (rid % 8), exactly as the GBM
    exotic module's ``_mean_stderr`` — sqrt(Var/n) is unreliable under
    QMC (stratification shrinks the true error; the antithetic pair
    sharing one bridge point inflates it)."""
    pay, pay2 = _launch_exotic(seed, p, kind=kind, n_steps=n_steps,
                               n_blocks=n_blocks, cp=cp, period=period,
                               sampler=sampler, scheme=scheme, jumps=jumps)
    n = n_blocks * PATHS_PER_BLOCK
    mean = pay.sum() / n
    if sampler.startswith("sobol"):
        rep = pay.reshape(pay.shape[0] // 8, 8, -1).sum(axis=(0, 2)) \
            * (8.0 / n)
        se = rep.std(ddof=1) / math.sqrt(8.0)
    else:
        var = jnp.maximum(pay2.sum() / n - mean * mean, 0.0)
        se = jnp.sqrt(var / n)
    return df * mean, df * se


def _check_exotic_sampler(sampler: str, scheme: str, n_steps: int) -> None:
    if sampler.startswith("sobol"):
        if sampler != "sobol_bb":
            raise ValidationError("the Heston exotic kernel samplers are "
                                  "prng|hash|sobol_bb")
        if scheme != "euler":
            raise ValidationError("sobol_bb bridge QMC requires the Euler "
                                  "scheme (QE consumes a third uniform "
                                  "stream the bridge cannot pin)")
        if n_steps < 2:
            raise ValidationError("sobol_bb needs n_steps >= 2")


def _exotic_params(spot, strike, maturity, rate, params, dividend, barrier,
                   n_steps, scheme):
    """SMEM param vector for the exotic kernel. ``params`` may be a
    HestonParams or a BatesParams — the Bates jump tail (inverse-CDF count
    thresholds + size params + intensity) is appended and the
    −lam·kbar martingale compensator folds into the drift."""
    t = max(float(maturity), EPS_TIME)
    dt = t / n_steps
    mu = float(rate) - float(dividend)
    bates = hasattr(params, "lam")
    if bates:
        lam = float(params.lam)
        mu_j, sig_j = float(params.mu_j), float(params.sigma_j)
        kbar = math.exp(mu_j + 0.5 * sig_j**2) - 1.0
        mu -= lam * kbar
    log_b = (math.log(max(float(barrier), 1e-30) / float(spot))
             if float(barrier) > 0.0 else 0.0)
    head = [float(spot), float(strike), log_b, 1.0 / n_steps,
            float(rate) * dt, dt, math.sqrt(dt),
            0.0, 0.0, 0.0, 0.0, 0.0]
    if scheme == "qe":
        # layout: [mu_dt, emkd, c1, s2_v, s2_0, k0..k4, v0]
        tail = _qe_consts(float(params.kappa), float(params.theta),
                          float(params.sigma), float(params.rho),
                          float(params.v0), dt, mu)
    else:
        rho = float(params.rho)
        tail = [mu * dt, float(params.kappa), float(params.theta),
                float(params.sigma), rho,
                math.sqrt(max(1.0 - rho * rho, 0.0)), float(params.v0)]
    if bates:
        # count CDF thresholds P(N <= k), k = 0..2 (count = #thresholds
        # exceeded, truncated at 3)
        ld = lam * dt
        p0 = math.exp(-ld)
        tail += [p0, p0 * (1.0 + ld), p0 * (1.0 + ld + 0.5 * ld * ld),
                 mu_j, sig_j, lam]
    return head + tail, t


def pallas_heston_exotic_price(kind: str, spot, strike, maturity, rate,
                               params, cp: float = 1.0,
                               dividend: float = 0.0, barrier: float = 0.0,
                               n_paths: int = 1_000_000, n_steps: int = 64,
                               seed: int = 0, sampler: str = "prng",
                               scheme: str = "euler",
                               lower: float = 0.0, upper: float = 0.0):
    """Fused exotic pricing under Heston: (price, stderr, actual_paths).

    ``kind`` ∈ HESTON_EXOTIC_KINDS minus the structured kinds (cliquet/
    autocall have dedicated wrappers). Payoff conventions match the GBM
    exotic kernel exactly; scan parity: ``models/heston_exotics.py``.
    ``scheme``: ``euler`` (full truncation) or ``qe`` (Andersen — near-
    unbiased at coarse step counts). ``sampler="sobol_bb"`` (Euler,
    n_steps ≥ 2): hybrid bridge QMC pinning 4 dyadic z-sum coordinates on
    EACH of the variance and orthogonal-spot streams from one scrambled
    8-dim Sobol point, hash residuals conditionally per segment — the
    payoff statistics update inside the replay exactly as under plain MC.
    """
    if kind not in HESTON_EXOTIC_KINDS:
        raise ValidationError(
            f"unknown heston exotic kind {kind!r}; choose {HESTON_EXOTIC_KINDS}")
    if kind in ("cliquet", "autocall", "range_accrual"):
        raise ValidationError(
            f"use pallas_heston_{kind}_price for structured params")
    _check_exotic_sampler(sampler, scheme, n_steps)
    p, t = _exotic_params(spot, strike, maturity, rate, params, dividend,
                          barrier, n_steps, scheme)
    if "double" in kind:
        _set_double_band(p, spot, lower, upper)
    n_blocks = max(1, math.ceil(n_paths / PATHS_PER_BLOCK))
    # pay-at-hit kinds discount in-kernel at the hit step: host df = 1
    df = 1.0 if kind.endswith("_hit") else math.exp(-float(rate) * t)
    price, se = _exotic_price_pipeline(
        np.asarray([seed, 0], np.int32), np.asarray(p, np.float32),
        np.float32(df), kind=kind, n_steps=n_steps, n_blocks=n_blocks,
        cp=float(cp), sampler=sampler, scheme=scheme,
        jumps=hasattr(params, "lam"))
    return price, se, n_blocks * PATHS_PER_BLOCK


def _set_double_band(p, spot, lower, upper):
    """Write the double-barrier band into the relative-log A/B slots."""
    if not 0.0 < lower < upper:
        raise ValidationError("double kinds need 0 < lower < upper")
    p[_HX_A] = math.log(float(lower) / float(spot))
    p[_HX_B] = math.log(float(upper) / float(spot))


# ---------------------------------------------------------------------------
# Contract books: one launch prices N contracts (mixed strikes/barriers)
# under the SAME Heston/Bates dynamics
# ---------------------------------------------------------------------------
def _heston_book_vec(kind, spot, strikes, barriers, lowers, uppers):
    """Per-contract SMEM book [K, LOGB, A, B, C, D, E] — barrier levels
    converted to RELATIVE log space (the kernel compares x directly);
    normalization/validation delegates to ``exotic_pallas._book_lists``.
    Returns (book_vec, nc, nc_pad, strikes, barriers, lowers, uppers)
    with the lists normalized (floats, one entry per contract)."""
    from .exotic_pallas import _book_lists, _book_pad, _book_smem

    strikes, barriers, lowers, uppers = _book_lists(
        kind, strikes, barriers, lowers, uppers)
    nc = len(strikes)
    spot = float(spot)
    log_bs = [math.log(max(b, 1e-30) / spot) if b > 0.0 else 0.0
              for b in barriers]
    if "double" in kind:
        a_log = [math.log(lo / spot) for lo in lowers]
        b_log = [math.log(up / spot) for up in uppers]
    else:
        a_log = b_log = [0.0] * nc
    zeros = [0.0] * nc
    nc_pad = _book_pad(nc)
    return (_book_smem(strikes, log_bs, a_log, b_log, zeros, zeros, zeros,
                       nc_pad), nc, nc_pad, strikes, barriers, lowers,
            uppers)


def _check_heston_book_call(kind, sampler, scheme, n_steps):
    if kind not in HESTON_EXOTIC_KINDS \
            or kind in ("cliquet", "autocall", "range_accrual"):
        raise ValidationError(
            f"book pricing supports the non-structured exotic kinds: "
            f"got {kind!r}")
    if sampler.startswith("sobol"):
        raise ValidationError(
            "book launches support prng|hash samplers (the QMC replicate "
            "groups ride the row axis the book interleaves)")
    _check_exotic_sampler(sampler, scheme, n_steps)


@functools.partial(jax.jit, static_argnames=("kind", "n_steps", "n_blocks",
                                             "cp", "sampler", "scheme",
                                             "jumps", "n_contracts"))
def _exotic_book_price_pipeline(seed, p, book, df, *, kind, n_steps,
                                n_blocks, cp, sampler="prng",
                                scheme="euler", jumps=False,
                                n_contracts=1):
    """Book launch + per-contract moment reduction, ONE traced program.
    Reference analog: ``MonteCarloPricerUni.price_batch``
    (``src/pricing_models/monte_carlo_unified.py:562``)."""
    pay, pay2 = _launch_exotic(seed, p, book, kind=kind, n_steps=n_steps,
                               n_blocks=n_blocks, cp=cp, sampler=sampler,
                               scheme=scheme, jumps=jumps,
                               n_contracts=n_contracts)
    n = n_blocks * (ROWS // n_contracts) * LANES * 2
    s1 = pay.reshape(ROWS // n_contracts, n_contracts, -1).sum(axis=(0, 2))
    s2 = pay2.reshape(ROWS // n_contracts, n_contracts, -1).sum(axis=(0, 2))
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    return df * mean, df * jnp.sqrt(var / n)


def pallas_heston_exotic_book_price(kind: str, spot, strikes, maturity,
                                    rate, params, cp: float = 1.0,
                                    dividend: float = 0.0, barriers=None,
                                    lowers=None, uppers=None,
                                    n_paths: int = 1_000_000,
                                    n_steps: int = 64, seed: int = 0,
                                    sampler: str = "prng",
                                    scheme: str = "euler"):
    """Price a BOOK of same-kind exotics (mixed strikes / barriers /
    bands) under ONE Heston/Bates dynamics in ONE kernel launch.

    Contracts interleave the row axis (contract id = rid % nc, book
    padded to a power of two) so an N-contract book costs one tunnel
    dispatch instead of N (each ~0.5–3 s over the tunnel). ``n_paths``
    is PER CONTRACT. Returns ``(prices, stderrs, n_paths)`` with one
    entry per requested contract. Reference analog:
    ``MonteCarloPricerUni.price_batch``
    (``src/pricing_models/monte_carlo_unified.py:562``)."""
    _check_heston_book_call(kind, sampler, scheme, n_steps)
    book, nc, nc_pad, strikes, barriers, lowers, uppers = _heston_book_vec(
        kind, spot, strikes, barriers, lowers, uppers)
    # contract 0's barrier/band must ALSO ride the scalar param vector:
    # nc_pad == 1 books take the kernel's scalar path (the book operand
    # is dropped in _launch_exotic)
    p, t = _exotic_params(spot, strikes[0], maturity, rate, params,
                          dividend, barriers[0], n_steps, scheme)
    if "double" in kind:
        _set_double_band(p, spot, lowers[0], uppers[0])
    paths_per_block = (ROWS // nc_pad) * LANES * 2
    n_blocks = max(1, math.ceil(n_paths / paths_per_block))
    df = 1.0 if kind.endswith("_hit") else math.exp(-float(rate) * t)
    prices, ses = _exotic_book_price_pipeline(
        np.asarray([seed, 0], np.int32), np.asarray(p, np.float32),
        book, np.float32(df), kind=kind, n_steps=n_steps,
        n_blocks=n_blocks, cp=float(cp), sampler=sampler, scheme=scheme,
        jumps=hasattr(params, "lam"), n_contracts=nc_pad)
    return prices[:nc], ses[:nc], n_blocks * paths_per_block


@functools.partial(jax.jit, static_argnames=("kind", "n_steps", "n_blocks",
                                             "cp", "sampler", "jumps",
                                             "n_contracts"))
def _exotic_book_lr_pipeline(seed, p, book, scalars, *, kind, n_steps,
                             n_blocks, cp, sampler, jumps, n_contracts):
    """Book launch(lr=True) → per-contract LR Greek ladders, ONE traced
    program (same score algebra as ``_combine_exotic_lr``, reduced per
    row-group instead of globally)."""
    outs = _launch_exotic(seed, p, book, kind=kind, n_steps=n_steps,
                          n_blocks=n_blocks, cp=cp, sampler=sampler,
                          scheme="euler", lr=True, jumps=jumps,
                          n_contracts=n_contracts)
    n = n_blocks * (ROWS // n_contracts) * LANES * 2

    def red(o):
        return o.reshape(ROWS // n_contracts, n_contracts, -1) \
                .sum(axis=(0, 2)) / n

    return _combine_exotic_lr(outs, n, scalars, n_steps,
                              discounted=kind.endswith("_hit"),
                              reduce_fn=red)


def pallas_heston_exotic_book_lr_greeks(kind: str, spot, strikes, maturity,
                                        rate, params, cp: float = 1.0,
                                        dividend: float = 0.0,
                                        barriers=None, lowers=None,
                                        uppers=None,
                                        n_paths: int = 1_000_000,
                                        n_steps: int = 64, seed: int = 0,
                                        sampler: str = "prng") -> dict:
    """Per-contract price + LR delta/gamma/vega_v0/vega/rho/theta for a
    book of same-kind exotics under ONE Heston/Bates dynamics in ONE
    kernel launch (Euler scheme; ``n_paths`` per contract). Every dict
    value has one entry per contract."""
    _check_heston_book_call(kind, sampler, "euler", n_steps)
    book, nc, nc_pad, strikes, barriers, lowers, uppers = _heston_book_vec(
        kind, spot, strikes, barriers, lowers, uppers)
    # see pallas_heston_exotic_book_price: contract 0's levels also ride
    # the scalar params for the nc_pad == 1 path
    p, t = _exotic_params(spot, strikes[0], maturity, rate, params,
                          dividend, barriers[0], n_steps, "euler")
    if "double" in kind:
        _set_double_band(p, spot, lowers[0], uppers[0])
    paths_per_block = (ROWS // nc_pad) * LANES * 2
    n_blocks = max(1, math.ceil(n_paths / paths_per_block))
    out = dict(_exotic_book_lr_pipeline(
        np.asarray([seed, 0], np.int32), np.asarray(p, np.float32),
        book, _lr_scalars(spot, t, rate, params, n_steps), kind=kind,
        n_steps=n_steps, n_blocks=n_blocks, cp=float(cp), sampler=sampler,
        jumps=hasattr(params, "lam"), n_contracts=nc_pad))
    out = {k: v[:nc] for k, v in out.items()}
    out["paths"] = n_blocks * paths_per_block
    return out


def pallas_heston_cliquet_price(spot, maturity, rate, params,
                                dividend: float = 0.0,
                                local_floor: float = -0.05,
                                local_cap: float = 0.05,
                                global_floor: float = 0.0,
                                global_cap: float = 1e9,
                                notional: float = 100.0, n_periods: int = 12,
                                n_paths: int = 1_000_000, n_steps: int = 252,
                                seed: int = 0, sampler: str = "prng",
                                scheme: str = "euler"):
    """Fused cliquet under Heston — the forward-smile product priced under
    the dynamics that actually generate a forward smile (scan parity:
    ``models/heston_exotics.heston_cliquet_price``)."""
    if n_periods <= 0 or n_steps % n_periods:
        raise ValidationError("n_steps must be a positive multiple of n_periods")
    _check_exotic_sampler(sampler, scheme, n_steps)
    p, t = _exotic_params(spot, 0.0, maturity, rate, params, dividend, 0.0,
                          n_steps, scheme)
    p[_HX_A], p[_HX_B] = float(local_floor), float(local_cap)
    p[_HX_C], p[_HX_D] = float(global_floor), float(global_cap)
    p[_HX_E] = float(notional)
    n_blocks = max(1, math.ceil(n_paths / PATHS_PER_BLOCK))
    price, se = _exotic_price_pipeline(
        np.asarray([seed, 0], np.int32), np.asarray(p, np.float32),
        np.float32(math.exp(-float(rate) * t)), kind="cliquet",
        n_steps=n_steps, n_blocks=n_blocks, cp=1.0,
        period=n_steps // n_periods, sampler=sampler, scheme=scheme,
        jumps=hasattr(params, "lam"))
    return price, se, n_blocks * PATHS_PER_BLOCK


def pallas_heston_autocall_price(spot, maturity, rate, params,
                                 dividend: float = 0.0,
                                 notional: float = 100.0,
                                 autocall_barrier: float = 1.0,
                                 coupon_barrier: float = 0.8,
                                 ki_barrier: float = 0.7,
                                 coupon_rate: float = 0.08, n_obs: int = 4,
                                 n_paths: int = 1_000_000,
                                 n_steps: int = 252, seed: int = 0,
                                 sampler: str = "prng",
                                 scheme: str = "euler"):
    """Fused autocallable under Heston — the stochastic-vol product (vega
    sign flips with the knock-in state; GBM misprices it structurally).
    Coupons/redemptions discount in-kernel; scan parity:
    ``models/heston_exotics.heston_autocall_price``. Barrier levels are
    RELATIVE to spot (compared in log space in-kernel)."""
    if n_obs <= 0 or n_steps % n_obs:
        raise ValidationError("n_steps must be a positive multiple of n_obs")
    _check_exotic_sampler(sampler, scheme, n_steps)
    p, _t = _exotic_params(spot, 0.0, maturity, rate, params, dividend, 0.0,
                           n_steps, scheme)
    p[_HX_A] = math.log(max(float(autocall_barrier), 1e-9))
    p[_HX_B] = math.log(max(float(coupon_barrier), 1e-9))
    p[_HX_C] = math.log(max(float(ki_barrier), 1e-9))
    p[_HX_D] = float(notional) * float(coupon_rate) / n_obs
    p[_HX_E] = float(notional)
    n_blocks = max(1, math.ceil(n_paths / PATHS_PER_BLOCK))
    price, se = _exotic_price_pipeline(
        np.asarray([seed, 0], np.int32), np.asarray(p, np.float32),
        np.float32(1.0), kind="autocall", n_steps=n_steps,
        n_blocks=n_blocks, cp=1.0, period=n_steps // n_obs,
        sampler=sampler, scheme=scheme, jumps=hasattr(params, "lam"))
    return price, se, n_blocks * PATHS_PER_BLOCK


def _combine_exotic_lr(outs, n: int, scalars, n_steps: int,
                       discounted: bool = False, reduce_fn=None) -> dict:
    """LR moment tiles → price/stderr/delta/gamma/vega_v0/vega/rho/theta.
    ``scalars``: [spot, t, df, v0, dt, srho, rate] (traced). Shared by the
    single-device pipeline and the sharded (psum) path. The D1/DG moments
    are zo₀-scores (joint-density LR) → the 1/(srho·√(v0 dt)) scaling;
    theta = r·price − df·E[pay·TS]/n_steps (TS sums the per-step dt
    scores; dt = T/n fixed-count rescaling, same identity as the GBM
    ladder). ``discounted=True`` (autocall): payoff already discounted
    in-kernel — df=1 and the 8th moment DR completes rho and theta."""
    spot, t, df, v0, dt, srho, rate = scalars[:7]
    if discounted:
        df = jnp.float32(1.0)
    if reduce_fn is None:
        reduce_fn = lambda o: o.sum() / n  # noqa: E731 — default global mean
    pay_m, pay2_m, d1_m, dg_m, dv_m, sr_m, ts_m = [
        reduce_fn(o) for o in outs[:7]]
    price = df * pay_m
    var = jnp.maximum(pay2_m - pay_m * pay_m, 0.0)
    c = 1.0 / (jnp.maximum(srho, 1e-4) * jnp.sqrt(v0 * dt))
    dv0 = df * dv_m
    score_t_m = ts_m / n_steps
    out = {
        "price": price,
        "std_error": df * jnp.sqrt(var / n),
        "delta": df * d1_m * c / spot,
        "gamma": df * (dg_m * c * c - d1_m * c) / (spot * spot),
        "vega_v0": dv0,
        "vega": 2.0 * jnp.sqrt(v0) * dv0,
    }
    if discounted:
        dr_m = reduce_fn(outs[7])
        out["rho"] = sr_m + dr_m
        out["theta"] = -score_t_m - rate / t * dr_m
    else:
        out["rho"] = df * sr_m - t * price
        out["theta"] = rate * price - df * score_t_m
    return out


@functools.partial(jax.jit, static_argnames=("kind", "n_steps", "n_blocks",
                                             "cp", "period", "sampler",
                                             "jumps"))
def _exotic_lr_pipeline(seed, p, scalars, *, kind, n_steps, n_blocks, cp,
                        sampler, period=1, jumps=False):
    outs = _launch_exotic(seed, p, kind=kind, n_steps=n_steps,
                          n_blocks=n_blocks, cp=cp, period=period,
                          sampler=sampler, scheme="euler", lr=True,
                          jumps=jumps)
    return _combine_exotic_lr(outs, n_blocks * PATHS_PER_BLOCK, scalars,
                              n_steps,
                              discounted=(kind == "autocall"
                                          or kind.endswith("_hit")))


def pallas_heston_exotic_lr_greeks(kind: str, spot, strike, maturity, rate,
                                   params, cp: float = 1.0,
                                   dividend: float = 0.0,
                                   barrier: float = 0.0,
                                   n_paths: int = 1_000_000,
                                   n_steps: int = 64, seed: int = 0,
                                   sampler: str = "prng",
                                   lower: float = 0.0,
                                   upper: float = 0.0) -> dict:
    """Heston exotic price + likelihood-ratio delta/gamma/vega_v0/rho/theta
    in ONE kernel pass — for ANY payoff kind including barriers and
    touches whose pathwise derivative is zero a.e.

    The scores differentiate the EULER transition densities (scheme-exact,
    unbiased for the simulated measure): spot scores use only the
    first-step shock (S0 enters one transition — Markov), the v0 score is
    the exact ∂ln p/∂v0 of the two step-0 transitions, and the rate and
    maturity scores sum per-step perturbations, gated where v⁺ = 0 (full
    truncation makes that transition deterministic; the gate drops an
    information-free term, so the estimator stays unbiased whenever
    P(v⁺ = 0) = 0 and degrades gracefully under heavy Feller violation).
    ``vega`` is the spot-vol convention 2√v0·vega_v0; ``theta`` is −dV/dT
    at fixed step COUNT (dt = T/n rescaling). Euler scheme only.

    Structured kinds have dedicated wrappers with their product params:
    :func:`pallas_heston_cliquet_lr_greeks` /
    :func:`pallas_heston_autocall_lr_greeks`.
    """
    structured = ("cliquet", "autocall", "range_accrual")
    if kind not in HESTON_EXOTIC_KINDS or kind in structured:
        raise ValidationError(
            f"use pallas_heston_{kind}_lr_greeks for structured params"
            if kind in structured
            else f"unknown heston exotic kind {kind!r}")
    if sampler.startswith("sobol"):
        raise ValidationError("LR scores assume iid normals — use prng/hash")
    p, t = _exotic_params(spot, strike, maturity, rate, params, dividend,
                          barrier, n_steps, "euler")
    if "double" in kind:
        _set_double_band(p, spot, lower, upper)
    n_blocks = max(1, math.ceil(n_paths / PATHS_PER_BLOCK))
    out = dict(_exotic_lr_pipeline(
        np.asarray([seed, 0], np.int32), np.asarray(p, np.float32),
        _lr_scalars(spot, t, rate, params, n_steps), kind=kind,
        n_steps=n_steps, n_blocks=n_blocks, cp=float(cp), sampler=sampler,
        jumps=hasattr(params, "lam")))
    out["paths"] = n_blocks * PATHS_PER_BLOCK
    return out


def _lr_scalars(spot, t, rate, params, n_steps):
    # host numpy: eager jnp array creation costs ~40 ms/op over the
    # axon tunnel; the jit boundary transfers np operands for free
    return np.asarray(
        [float(spot), t, math.exp(-float(rate) * t), float(params.v0),
         t / n_steps, math.sqrt(max(1.0 - float(params.rho) ** 2, 0.0)),
         float(rate)], np.float32)


def pallas_heston_cliquet_lr_greeks(spot, maturity, rate, params,
                                    dividend: float = 0.0,
                                    local_floor: float = -0.05,
                                    local_cap: float = 0.05,
                                    global_floor: float = 0.0,
                                    global_cap: float = 1e9,
                                    notional: float = 100.0,
                                    n_periods: int = 12,
                                    n_paths: int = 1_000_000,
                                    n_steps: int = 252, seed: int = 0,
                                    sampler: str = "prng") -> dict:
    """Cliquet LR ladder under Heston in one pass: vega_v0/rho/theta are
    the forward-smile sensitivities a flat-vol model cannot produce;
    delta/gamma are FROZEN-FIXINGS hedge sensitivities (w.r.t. the
    simulation start with the initial fixing held at its current level —
    the payoff is scale-invariant, so the unconditional spot sensitivity
    is 0 and the frozen-fixings delta is the quantity a desk hedges)."""
    if n_periods <= 0 or n_steps % n_periods:
        raise ValidationError("n_steps must be a positive multiple of n_periods")
    if sampler.startswith("sobol"):
        raise ValidationError("LR scores assume iid normals — use prng/hash")
    p, t = _exotic_params(spot, 0.0, maturity, rate, params, dividend, 0.0,
                          n_steps, "euler")
    p[_HX_A], p[_HX_B] = float(local_floor), float(local_cap)
    p[_HX_C], p[_HX_D] = float(global_floor), float(global_cap)
    p[_HX_E] = float(notional)
    n_blocks = max(1, math.ceil(n_paths / PATHS_PER_BLOCK))
    out = dict(_exotic_lr_pipeline(
        np.asarray([seed, 0], np.int32), np.asarray(p, np.float32),
        _lr_scalars(spot, t, rate, params, n_steps), kind="cliquet",
        n_steps=n_steps, n_blocks=n_blocks, cp=1.0,
        period=n_steps // n_periods, sampler=sampler,
        jumps=hasattr(params, "lam")))
    out["paths"] = n_blocks * PATHS_PER_BLOCK
    out["delta_convention"] = ("frozen-fixings hedge delta: initial "
                               "fixing held at its current level (the "
                               "scale-invariant unconditional delta is 0)")
    return out


def pallas_heston_autocall_lr_greeks(spot, maturity, rate, params,
                                     dividend: float = 0.0,
                                     notional: float = 100.0,
                                     autocall_barrier: float = 1.0,
                                     coupon_barrier: float = 0.8,
                                     ki_barrier: float = 0.7,
                                     coupon_rate: float = 0.08,
                                     n_obs: int = 4,
                                     n_paths: int = 1_000_000,
                                     n_steps: int = 252, seed: int = 0,
                                     sampler: str = "prng") -> dict:
    """Autocall LR ladder under Heston in one pass — THE stochastic-vol
    ladder a desk needs (vega sign flips with the knock-in state; the
    v0-vega here is smile-consistent, unlike a GBM reprice). Cashflows
    discount in-kernel; the DR moment (−Σtᵢdfᵢcashᵢ incl. redemption)
    completes rho and theta. Barrier levels are set from spot at
    inception; delta/gamma are FROZEN-FIXINGS hedge sensitivities (the
    barriers stay at their absolute levels as spot moves — the
    unconditional scale-invariant delta is 0)."""
    if n_obs <= 0 or n_steps % n_obs:
        raise ValidationError("n_steps must be a positive multiple of n_obs")
    if sampler.startswith("sobol"):
        raise ValidationError("LR scores assume iid normals — use prng/hash")
    p, t = _exotic_params(spot, 0.0, maturity, rate, params, dividend, 0.0,
                          n_steps, "euler")
    p[_HX_A] = math.log(max(float(autocall_barrier), 1e-9))
    p[_HX_B] = math.log(max(float(coupon_barrier), 1e-9))
    p[_HX_C] = math.log(max(float(ki_barrier), 1e-9))
    p[_HX_D] = float(notional) * float(coupon_rate) / n_obs
    p[_HX_E] = float(notional)
    n_blocks = max(1, math.ceil(n_paths / PATHS_PER_BLOCK))
    out = dict(_exotic_lr_pipeline(
        np.asarray([seed, 0], np.int32), np.asarray(p, np.float32),
        _lr_scalars(spot, t, rate, params, n_steps), kind="autocall",
        n_steps=n_steps, n_blocks=n_blocks, cp=1.0,
        period=n_steps // n_obs, sampler=sampler,
        jumps=hasattr(params, "lam")))
    out["paths"] = n_blocks * PATHS_PER_BLOCK
    out["delta_convention"] = ("frozen-fixings hedge delta: barriers "
                               "held at their inception levels (the "
                               "scale-invariant unconditional delta is 0)")
    return out


def pallas_heston_range_accrual_price(spot, lower, upper, maturity, rate,
                                      params, dividend: float = 0.0,
                                      notional: float = 100.0,
                                      n_paths: int = 1_000_000,
                                      n_steps: int = 252, seed: int = 0,
                                      sampler: str = "prng",
                                      scheme: str = "euler"):
    """Range-accrual (corridor) note under Heston/Bates dynamics — the
    smile-consistent accrual probability a flat-vol model misstates.
    Corridor compared in relative log space in-kernel. Returns
    (price, stderr, actual_paths); scan parity via the generic engine."""
    if not 0.0 < lower < upper:
        raise ValidationError("need 0 < lower < upper")
    _check_exotic_sampler(sampler, scheme, n_steps)
    p, t = _exotic_params(spot, 0.0, maturity, rate, params, dividend, 0.0,
                          n_steps, scheme)
    p[_HX_A] = math.log(float(lower) / float(spot))
    p[_HX_B] = math.log(float(upper) / float(spot))
    p[_HX_E] = float(notional)
    n_blocks = max(1, math.ceil(n_paths / PATHS_PER_BLOCK))
    # single jitted launch+reduce pipeline (every eager post-launch op
    # costs a tunnel RPC), with the honest randomized-QMC stderr branch
    price, se = _exotic_price_pipeline(
        np.asarray([seed, 0], np.int32), np.asarray(p, np.float32),
        np.float32(math.exp(-float(rate) * t)), kind="range_accrual",
        n_steps=n_steps, n_blocks=n_blocks, cp=1.0, sampler=sampler,
        scheme=scheme, jumps=hasattr(params, "lam"))
    return price, se, n_blocks * PATHS_PER_BLOCK


def pallas_heston_range_accrual_lr_greeks(spot, lower, upper, maturity,
                                          rate, params,
                                          dividend: float = 0.0,
                                          notional: float = 100.0,
                                          n_paths: int = 1_000_000,
                                          n_steps: int = 252, seed: int = 0,
                                          sampler: str = "prng") -> dict:
    """Range-accrual LR ladder under Heston/Bates (Euler): the payoff is
    pure indicators, so the joint-density scores are the only
    kernel-speed Greeks. Same moments/combine as every other kind."""
    if not 0.0 < lower < upper:
        raise ValidationError("need 0 < lower < upper")
    if sampler.startswith("sobol"):
        raise ValidationError("LR scores assume iid normals — use prng/hash")
    p, t = _exotic_params(spot, 0.0, maturity, rate, params, dividend, 0.0,
                          n_steps, "euler")
    p[_HX_A] = math.log(float(lower) / float(spot))
    p[_HX_B] = math.log(float(upper) / float(spot))
    p[_HX_E] = float(notional)
    n_blocks = max(1, math.ceil(n_paths / PATHS_PER_BLOCK))
    out = dict(_exotic_lr_pipeline(
        np.asarray([seed, 0], np.int32), np.asarray(p, np.float32),
        _lr_scalars(spot, t, rate, params, n_steps), kind="range_accrual",
        n_steps=n_steps, n_blocks=n_blocks, cp=1.0, sampler=sampler,
        jumps=hasattr(params, "lam")))
    out["paths"] = n_blocks * PATHS_PER_BLOCK
    return out


def pallas_heston_price(spot, strike, maturity, rate, params, cp: float = 1.0,
                        dividend: float = 0.0, n_paths: int = 1_000_000,
                        n_steps: int = 100, seed: int = 0,
                        sampler: str = "prng", scheme: str = "euler"):
    """(price, stderr, actual_paths) under Heston via the fused kernel.

    ``scheme``: ``euler`` (full truncation) or ``qe`` (Andersen
    quadratic-exponential — near-unbiased at coarse steps; mirrors the
    XLA engine's ``heston_mc_price(..., scheme='qe')``).

    ``sampler="sobol_bb"`` (Euler scheme, ``n_steps >= 2``): hybrid
    bridge QMC over BOTH Brownian streams — one scrambled Sobol point
    pins up to 4 dyadic z-sum coordinates of the variance stream and 4
    of the orthogonal spot stream; hash residuals fill in conditionally.
    The reported stderr then uses the plain-MC formula and is indicative
    only (see ``exotic_pallas``)."""
    if scheme == "qe":
        t, p = _params_vec_qe(spot, strike, maturity, rate, params, dividend,
                              n_steps)
        n_blocks = max(1, math.ceil(n_paths / PATHS_PER_BLOCK))
        scalars = np.asarray([float(spot), t, math.exp(-float(rate) * t),
                               float(params.v0)], jnp.float32)
        out = dict(_pipeline(np.asarray([seed, 0], np.int32), p, scalars,
                             n_steps=n_steps, n_blocks=n_blocks,
                             cp=float(cp), sampler=sampler, scheme="qe"))
        return out["price"], out["std_error"], n_blocks * PATHS_PER_BLOCK
    out = pallas_heston_greeks(spot, strike, maturity, rate, params, cp,
                               dividend, n_paths, n_steps, seed, sampler,
                               vega=False)
    return out["price"], out["std_error"], out["paths"]
