"""Fused Pallas kernel for stochastic-local-vol (SLV) Monte Carlo.

Two-phase design, each phase where it is cheapest:

1. **Calibrate** (XLA scan, once per surface/maturity): the particle
   method in ``models/slv.py`` produces per-step leverage rows
   L(t_i, x) on particle-adapted grids — it needs cross-path binned
   reductions every step, which belong in XLA, not in a per-block kernel.
2. **Replay** (this kernel, once per contract/ladder): each step's
   leverage row is least-squares-fitted with a degree-6 polynomial in
   x = log(S/S0) (density-weighted — the same trick as
   ``local_vol_pallas.fit_sigma_polys``), so the in-kernel lookup is a
   7-coefficient Horner evaluation: pure VPU fmas, no gathers, no HBM
   traffic. The dynamics are Heston-with-leverage:

       dx = (mu - L(x,t)^2 v/2) dt + L(x,t) sqrt(v) dW_x
       dv = kappa (theta - v) dt + eta*sigma sqrt(v) dW_v

   with full-truncation Euler, branch-free, antithetic pair per draw.

``lr=True`` reduces likelihood-ratio score moments in the same pass —
delta/gamma/v0-vega/rate-rho for ANY payoff kind (barriers and touches
have zero pathwise derivative a.e.; LR differentiates the transition
densities instead). Conventions (each verified against CRN-FD oracles):

- **delta/gamma are STICKY-STRIKE**: the calibrated leverage surface
  stays fixed in PHYSICAL spot when S0 bumps (the model's own dynamics
  — the same convention as ``local_vol_pallas``). A spot bump is then a
  start-state shift against the table; the first-step score, conditional
  on the variance shock zv0, is

      score = zo0/s * (1 - L0 L0' v0 dt + L0' sqrt(v0 dt) rho zv0)
            + (zo0^2 - 1) * L0'/L0,     s = srho L0 sqrt(v0 dt)

  (zo0 = the INDEPENDENT spot shock — the marginal-zx score is biased
  under correlation, see ``heston_pallas``). The L0' terms ride two
  extra reduced moments (pay*zo0*zv0 and pay*(zo0^2-1)); gamma keeps the
  leading 1/s^2 term and drops L'' second-order terms (O(dt*skew^2),
  bounded by the CRN-FD oracle in the tests). Lookback kinds add the
  boundary moments b0/b1 (the extremum includes S0 — a DIRECT payoff
  dependence the density scores cannot see, cf. ``local_vol_pallas``).
- **v0-vega and rho are FROZEN-LEVERAGE** (pure model-parameter bumps):
  the exact ``d ln p / d v0`` score of the two step-0 transitions and the
  per-step drift score. A desk re-calibrating L after the bump (to keep
  vanillas repriced) gets a different number by construction; this
  ladder reports the dynamics sensitivity and says so.
- **theta is not offered**: the leverage table is indexed by step, so a
  maturity bump changes which table the model runs on — there is no
  frozen-table theta that means anything. Use FD over two calibrations.

``seed_ref = [seed, block0]`` global-block ownership as the other kernel
families (topology-invariant path sets). Samplers: ``prng`` (hardware)
and ``hash`` (counter-based, CPU-verifiable).

The reference has no SLV at all (``src/models/local_vol.py`` prices
vanillas only; ``src/pricing_models/heston.py`` has no leverage) — this
kernel is beyond-reference capability at the repo's own kernel standard.
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
LANES = 512
PATHS_PER_BLOCK = 2 * ROWS * LANES  # antithetic pair per draw
DEGREE = 6

# scalar head before the per-step leverage table; each step row is
# [x_lo_i, x_hi_i, c_deg, ..., c_0]. _S_A.._S_E are the structured-kind
# product params (cliquet floors/caps/notional; autocall barriers in
# relative log space + coupon + notional), zero otherwise.
(_S_S0, _S_K, _S_LOGB, _S_INVN, _S_RDT, _S_DT, _S_SQDT, _S_MUDT,
 _S_KAPPA, _S_THETA, _S_SIGV, _S_RHO, _S_SRHO, _S_V0,
 _S_A, _S_B, _S_C, _S_D, _S_E) = range(19)
_N_SCALARS = 19
_ROW = DEGREE + 3

KINDS = (
    "european", "asian_arith", "asian_geo", "lookback_float",
    "lookback_fixed",
    "barrier_up-and-out", "barrier_up-and-in", "barrier_down-and-out",
    "barrier_down-and-in",
    "one_touch_up", "one_touch_down", "no_touch_up", "no_touch_down",
    # double kinds: band (lower, upper) in relative-log slots _S_A/_S_B
    "barrier_double-out", "barrier_double-in",
    "one_touch_double", "no_touch_double",
    # pay-at-hit one-touches: cash discounted AT the first hit in-kernel
    "one_touch_up_hit", "one_touch_down_hit", "one_touch_double_hit",
)
STRUCTURED_KINDS = ("cliquet", "autocall", "range_accrual")


def _slv_kernel(seed_ref, p_ref, *refs, kind: str, n_steps: int, cp: float,
                sampler: str, lr: bool = False, period: int = 1):
    hit_pay = kind.endswith("_hit")
    """Statistics are carried in RELATIVE-log space (the fast-exp
    discipline, cf. ``heston_pallas``): extrema/barriers compare x
    against log(level/S0) directly; only the arithmetic Asian pays a
    per-step exp (of a small argument).

    ``lr=True`` extra moments: D1 = pay*zo0, DG = pay*(zo0^2-1),
    DX = pay*zo0*zv0 (the L0' cross term), DV = pay*score_v0 (exact
    step-0 ``d ln p / d v0``), SR = pay*sum_i drift scores; lookback
    kinds add B0/B1 (start-state boundary terms)."""
    lb = kind.startswith("lookback")
    block = pl.program_id(0) + seed_ref[1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in refs:
            ref[:, :] = jnp.zeros_like(ref)

    if sampler != "hash":
        pltpu.prng_seed(seed_ref[0] + block * jnp.int32(-1640531535))
    seed = seed_ref[0]

    s0, strike, log_b = p_ref[_S_S0], p_ref[_S_K], p_ref[_S_LOGB]
    inv_n, rdt = p_ref[_S_INVN], p_ref[_S_RDT]
    dt, sqrt_dt, mu_dt = p_ref[_S_DT], p_ref[_S_SQDT], p_ref[_S_MUDT]
    kappa, theta_v = p_ref[_S_KAPPA], p_ref[_S_THETA]
    sigma_v, rho = p_ref[_S_SIGV], p_ref[_S_RHO]
    srho, v0 = p_ref[_S_SRHO], p_ref[_S_V0]

    shape = (ROWS, LANES)
    zero = jnp.zeros(shape, jnp.float32)
    one = jnp.ones(shape, jnp.float32)
    barrier_up = "up" in kind
    knock_in = kind.endswith("in")

    def leverage(x, i):
        # Horner over step i's coefficients; scalar SMEM loads at a
        # traced index — no vector gathers (cf. local_vol_pallas)
        base = _N_SCALARS + i * _ROW
        xc = jnp.clip(x, p_ref[base], p_ref[base + 1])
        acc = jnp.full(shape, 0.0, jnp.float32) + p_ref[base + 2]
        for j in range(1, DEGREE + 1):
            acc = acc * xc + p_ref[base + 2 + j]
        return jnp.maximum(acc, 1e-4)

    def init_stat():
        if kind in ("asian_arith", "asian_geo", "lookback_float",
                    "lookback_fixed"):
            return (zero,)
        if kind == "european":
            return ()
        if kind == "cliquet":
            return (zero, zero)  # (period-start x, capped-return acc)
        if kind == "autocall":
            # (alive, knocked-in, pv[, discount-derivative moment])
            return (one, zero, zero, zero) if lr else (one, zero, zero)
        if kind == "range_accrual":
            return (zero,)  # accrual counter, steps 1..n
        if hit_pay:
            if "double" in kind:
                h0 = jnp.where((p_ref[_S_A] >= 0.0) | (p_ref[_S_B] <= 0.0),
                               1.0, 0.0)
            else:
                h0 = jnp.where(log_b <= 0.0 if barrier_up else log_b >= 0.0,
                               1.0, 0.0)
            # (hit flag, pv = df-at-first-hit; df(0) = 1 [, dr])
            return (zero + h0, zero + h0) + ((zero,) if lr else ())
        if "double" in kind:
            # x0 = 0 outside the log band [A, B] counts as hit
            hit0 = jnp.where((p_ref[_S_A] >= 0.0) | (p_ref[_S_B] <= 0.0),
                             1.0, 0.0)
            return (zero + hit0,)
        hit0 = jnp.where(log_b <= 0.0 if barrier_up else log_b >= 0.0,
                         1.0, 0.0)
        return (zero + hit0,)

    def update_stat(stat, x, i):
        if kind == "asian_arith":
            return (stat[0] + jnp.exp(x),)  # relative prices, small args
        if kind == "asian_geo":
            return (stat[0] + x,)
        if kind.startswith("lookback"):
            lo = (cp > 0) == (kind == "lookback_float")
            return ((jnp.minimum if lo else jnp.maximum)(stat[0], x),)
        if kind == "european":
            return stat
        if kind == "cliquet":
            x_start, acc = stat
            is_end = jnp.where((i + 1) % period == 0, 1.0, 0.0)
            capped = jnp.clip(jnp.exp(x - x_start) - 1.0,
                              p_ref[_S_A], p_ref[_S_B])
            acc = acc + is_end * capped
            x_start = x_start + is_end * (x - x_start)
            return (x_start, acc)
        if kind == "autocall":
            alive, ki, pv = stat[:3]
            ki = jnp.maximum(ki, jnp.where(x <= p_ref[_S_C], 1.0, 0.0))
            is_obs = jnp.where((i + 1) % period == 0, 1.0, 0.0)
            steps = (i + 1).astype(jnp.float32)
            df_i = jnp.exp(-rdt * steps)
            called = alive * is_obs * jnp.where(x >= p_ref[_S_A], 1.0, 0.0)
            couponed = alive * is_obs * jnp.where(x >= p_ref[_S_B], 1.0,
                                                  0.0)
            cash = p_ref[_S_D] * couponed + p_ref[_S_E] * called
            pv = pv + df_i * cash
            alive = alive * (1.0 - called)
            if lr:  # DR = -sum t_i df_i cash_i (coupon/call legs)
                dr = stat[3] - steps * dt * df_i * cash
                return (alive, ki, pv, dr)
            return (alive, ki, pv)
        if kind == "range_accrual":
            # corridor in RELATIVE log space: A=log(L/S0), B=log(U/S0)
            acc = jnp.where((x >= p_ref[_S_A]) & (x <= p_ref[_S_B]),
                            1.0, 0.0)
            return (stat[0] + acc,)
        if hit_pay:
            h, pv = stat[:2]
            if "double" in kind:
                now = (x <= p_ref[_S_A]) | (x >= p_ref[_S_B])
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
            hit = (x <= p_ref[_S_A]) | (x >= p_ref[_S_B])
            return (jnp.maximum(stat[0], hit.astype(jnp.float32)),)
        hit = (x >= log_b) if barrier_up else (x <= log_b)
        return (jnp.maximum(stat[0], hit.astype(jnp.float32)),)

    def payoff(stat, x):
        s_t = s0 * jnp.exp(x)
        if kind == "asian_arith":
            return jnp.maximum(cp * (s0 * stat[0] * inv_n - strike), 0.0)
        if kind == "asian_geo":
            return jnp.maximum(
                cp * (s0 * jnp.exp(stat[0] * inv_n) - strike), 0.0)
        if kind == "lookback_float":
            ext = s0 * jnp.exp(stat[0])
            return (s_t - ext) if cp > 0 else (ext - s_t)
        if kind == "lookback_fixed":
            return jnp.maximum(cp * (s0 * jnp.exp(stat[0]) - strike), 0.0)
        if kind == "european":
            return jnp.maximum(cp * (s_t - strike), 0.0)
        if kind == "cliquet":
            return p_ref[_S_E] * jnp.clip(stat[1], p_ref[_S_C], p_ref[_S_D])
        if kind == "autocall":
            alive, ki, pv = stat[:3]
            df_t = jnp.exp(-rdt * float(n_steps))
            loss = jnp.maximum(1.0 - jnp.exp(x), 0.0)
            final = p_ref[_S_E] * (1.0 - ki * loss)
            return pv + alive * df_t * final  # discounted in-kernel
        if kind == "range_accrual":
            return p_ref[_S_E] * stat[0] * inv_n
        if hit_pay:
            return stat[1]  # df-at-hit carried in-kernel (host df = 1)
        if "touch" in kind:
            return stat[0] if kind.startswith("one") else (1.0 - stat[0])
        vanilla = jnp.maximum(cp * (s_t - strike), 0.0)
        return vanilla * (stat[0] if knock_in else (1.0 - stat[0]))

    def advance(x, v, zv, zo, i):
        ind = jnp.where(v > 0.0, 1.0, 0.0)
        vp = v * ind
        sq = jnp.sqrt(vp)
        lev = leverage(x, i)
        sig = lev * sq  # instantaneous vol of x
        zx = rho * zv + srho * zo
        x_new = x + mu_dt - 0.5 * sig * sig * dt + sig * sqrt_dt * zx
        v_new = v + kappa * (theta_v - vp) * dt \
            + sigma_v * sq * sqrt_dt * zv
        if not lr:
            return x_new, v_new, None
        # per-step rate drift score: mu enters the x-step mean; the
        # perturbation loads on the INDEPENDENT shock zo (cf.
        # heston_pallas) — gated where v+ = 0 (deterministic transition)
        srho_g = jnp.maximum(srho, 1e-4)
        ds = zo * dt * ind / (srho_g * lev
                              * jnp.maximum(sq, 1e-6) * sqrt_dt)
        return x_new, v_new, ds

    def body(i, carry):
        xa, va, xb, vb, sta, stb = carry[:6]
        zv, zo = draw_normals(sampler, seed, block, i, n_steps, shape)
        xa, va, dsa = advance(xa, va, zv, zo, i)
        xb, vb, dsb = advance(xb, vb, -zv, -zo, i)
        sta = update_stat(sta, xa, i)
        stb = update_stat(stb, xb, i)
        if not lr:
            return (xa, va, xb, vb, sta, stb)
        zv0, zo0, sra, srb = carry[6:10]
        first = i == 0
        zv0 = jnp.where(first, zv, zv0)
        zo0 = jnp.where(first, zo, zo0)
        return (xa, va, xb, vb, sta, stb, zv0, zo0, sra + dsa, srb + dsb)

    x0 = zero
    vv0 = jnp.full(shape, v0, jnp.float32)
    carry0 = (x0, vv0, x0, vv0, init_stat(), init_stat()) \
        + ((zero, zero, zero, zero) if lr else ())
    out = jax.lax.fori_loop(0, n_steps, body, carry0)
    xa, _, xb, _ = out[:4]
    sta, stb = out[4], out[5]
    zv0, zo0, sra, srb = out[6:10] if lr else ((zero,) * 4)

    accs = [jnp.zeros(shape, jnp.float32) for _ in range(len(refs))]
    if lr:
        sq_v0dt = jnp.sqrt(jnp.maximum(v0, 1e-8) * dt)
        inv_v0 = 1.0 / jnp.maximum(v0, 1e-8)
        srho_g = jnp.maximum(srho, 1e-4)
        # start-state leverage (deterministic: all paths start at x = 0)
        l0 = jnp.maximum(_horner0(p_ref), 1e-4)
    for sign, x, st, sr in ((1.0, xa, sta, sra), (-1.0, xb, stb, srb)):
        p = payoff(st, x)
        accs[0] += p
        accs[1] += p * p
        if lr:
            zvs, zos = sign * zv0, sign * zo0
            zxs = rho * zvs + srho * zos
            accs[2] += p * zos
            accs[3] += p * (zos * zos - 1.0)
            accs[4] += p * zos * zvs
            # score_v0 = -zv0*a - zo0*(b - rho*a)/srho - 1/v0;
            # a = dzv0/dv0 = (kappa dt - 1)/(sigma sqrt(v0 dt)) - zv0/(2v0)
            # b = dzx0/dv0 = L0 sqrt(dt)/(2 sqrt(v0)) - zx0/(2v0)
            # (identical to heston_pallas with the L0 factor in b — the
            # variance transition has no leverage; Jacobian term -1/v0)
            # sigma_v guard: at mixing -> 0 the variance transition
            # degenerates and the LR v0 score diverges — vega_v0 is only
            # meaningful at mixing > 0 (use the LV kernel at mixing = 0)
            a_t = (kappa * dt - 1.0) / (jnp.maximum(sigma_v, 1e-4)
                                        * sq_v0dt) \
                - zvs * (0.5 * inv_v0)
            b_t = l0 * sqrt_dt / (2.0 * jnp.sqrt(jnp.maximum(v0, 1e-8))) \
                - zxs * (0.5 * inv_v0)
            sc_v = -zvs * a_t - zos * (b_t - rho * a_t) / srho_g - inv_v0
            accs[5] += p * sc_v
            accs[6] += p * sr
            if hit_pay:
                accs[7] += st[2]
            elif kind == "autocall":
                # DR: coupon/call legs (carried) + final-redemption leg
                alive, ki = st[0], st[1]
                df_t = jnp.exp(-rdt * float(n_steps))
                loss = jnp.maximum(1.0 - jnp.exp(x), 0.0)
                final = p_ref[_S_E] * (1.0 - ki * loss)
                t_total = dt * float(n_steps)
                accs[7] += st[3] - alive * t_total * df_t * final
            if lb:
                # extremum includes the start state: direct d pay/d x0
                # when the extremum is attained at t = 0 (stat == 0)
                at0 = jnp.where(st[0] == 0.0, 1.0, 0.0)
                if kind == "lookback_fixed":
                    itm = jnp.where(cp * (s0 - strike) > 0.0, 1.0, 0.0)
                    f0 = cp * at0 * itm
                else:
                    f0 = (-at0) if cp > 0 else at0
                accs[7] += f0
                accs[8] += f0 * zos
    for off in range(0, LANES, 128):
        for ref, a in zip(refs, accs):
            ref[:, :] += a[:, off:off + 128]


def _horner0(p_ref):
    """L(x = 0) from step 0's polynomial (scalar SMEM Horner at the
    clamped start state)."""
    base = _N_SCALARS
    xc = jnp.clip(jnp.float32(0.0), p_ref[base], p_ref[base + 1])
    acc = p_ref[base + 2]
    for j in range(1, DEGREE + 1):
        acc = acc * xc + p_ref[base + 2 + j]
    return acc


@functools.partial(jax.jit, static_argnames=("kind", "n_steps", "n_blocks",
                                             "cp", "sampler", "lr",
                                             "period"))
def _launch(seed, params, *, kind: str, n_steps: int, n_blocks: int,
            cp: float, sampler: str = "prng", lr: bool = False,
            period: int = 1):
    n_out = ((9 if kind.startswith("lookback")
              else (8 if (kind == "autocall" or kind.endswith("_hit"))
                    else 7)) if lr else 2)
    acc_spec = pl.BlockSpec((ROWS, 128), lambda b: (0, 0),
                            memory_space=pltpu.VMEM)
    interpret = (False if jax.default_backend() == "tpu"
                 else pltpu.InterpretParams())
    return pl.pallas_call(
        functools.partial(_slv_kernel, kind=kind, n_steps=n_steps, cp=cp,
                          sampler=sampler, lr=lr, period=period),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[acc_spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((ROWS, 128), jnp.float32)] * n_out,
        cost_estimate=pl.CostEstimate(
            flops=n_blocks * n_steps * ROWS * LANES * 2 * (34 if lr else 26),
            bytes_accessed=n_out * ROWS * 128 * 4,
            transcendentals=n_blocks * n_steps * ROWS * LANES * 6,
        ),
        interpret=interpret,
    )(seed, params)


@functools.partial(jax.jit, static_argnames=("kind", "n_steps",
                                             "n_blocks", "cp", "sampler"))
def _slv_price_pipeline(seed, p, df, *, kind, n_steps, n_blocks, cp,
                        sampler):
    """Launch + moment reduction in ONE jitted program — the eager
    reduction tail cost extra RPC round-trips per call over the tunnel
    (CLAUDE.md: hot paths must be single jitted programs)."""
    pay, pay2 = _launch(seed, p, kind=kind, n_steps=n_steps,
                        n_blocks=n_blocks, cp=cp, sampler=sampler)
    price, se, _ = _mean_stderr(pay, pay2, n_blocks * PATHS_PER_BLOCK, df)
    return price, se


def fit_leverage_polys(x_rows, l_rows):
    """Per-step degree-6 polynomial fits of the calibrated leverage rows
    (``models.slv.slv_calibrate_leverage`` output). The rows live on
    standardized particle grids, so the Gaussian density in the
    standardized coordinate is the natural fit weight — tight where the
    paths are, indifferent to count-starved tail bins (which the
    calibration clamps). Returns (rows (n_steps, DEGREE+3) of
    [x_lo, x_hi, c_deg..c_0], worst density-weighted rms residual)."""
    x_rows = np.asarray(x_rows, np.float64)
    l_rows = np.asarray(l_rows, np.float64)
    n_steps, n_bins = x_rows.shape
    rows = np.empty((n_steps, _ROW), np.float64)
    resid = 0.0
    for i in range(n_steps):
        xg, lg = x_rows[i], l_rows[i]
        m = 0.5 * (xg[0] + xg[-1])
        s = max((xg[-1] - xg[0]) / 8.0, 1e-6)  # grid spans ±4 stds
        z = (xg - m) / s
        # interior band only: |z| <= 3.2 holds 99.86% of the paths; the
        # far tail bins are count-starved and carry the calibration's
        # fallback/cap values, which would drag the polynomial. The
        # kernel clamps x to the fitted band, matching jnp.interp's
        # edge behaviour to within the tail mass.
        keep = np.abs(z) <= 3.2
        dens = np.exp(-0.5 * z[keep] ** 2)
        if xg[keep][-1] - xg[keep][0] < 1e-4:
            # early steps: the particle cloud (hence the grid) is still
            # nearly a point — a constant fit is exact and a degree-6
            # polyfit would be ill-conditioned
            c = np.zeros(DEGREE + 1)
            c[-1] = float((dens * lg[keep]).sum() / dens.sum())
        else:
            c = np.polyfit(xg[keep], lg[keep], DEGREE, w=np.sqrt(dens))
        rows[i] = np.concatenate([[xg[keep][0], xg[keep][-1]], c])
        err = np.polyval(c, xg[keep]) - lg[keep]
        resid = max(resid, float(np.sqrt((dens * err**2).sum() / dens.sum())))
    return rows, resid


class SLVKernelPricer:
    """Calibrate once, price many at kernel speed: runs the particle
    leverage calibration (XLA scan) and the polynomial fits at
    construction, then every ``price``/``greeks`` call is one fused
    kernel launch.

    >>> dup = DupireLocalVol(iv_fn, spot, rate)
    >>> pricer = SLVKernelPricer(dup, HestonParams.make(...), maturity=1.0,
    ...                          mixing=0.8)
    >>> pricer.price("barrier_up-and-out", strike=100.0, barrier=120.0)
    >>> pricer.greeks("asian_arith", strike=100.0)
    """

    def __init__(self, dupire, params, maturity, mixing: float = 1.0,
                 n_steps: int = 64, n_cal_paths: int = 262_144,
                 n_bins: int = 31, cal_seed: int = 0):
        from ..models.slv import slv_calibrate_leverage

        surface = getattr(dupire, "surface", dupire)
        self.spot = float(surface.spot)
        self.rate = float(surface.rate)
        self.dividend = float(surface.dividend)
        self.t_total = max(float(maturity), EPS_TIME)
        self.n_steps = int(n_steps)
        self.params = params
        self.mixing = float(mixing)
        x_rows, l_rows = slv_calibrate_leverage(
            self.spot, self.t_total, self.rate, params,
            jax.random.PRNGKey(cal_seed), surface.k_grid, surface.t_grid,
            surface.grid, dividend=self.dividend, mixing=self.mixing,
            n_paths=n_cal_paths, n_steps=self.n_steps, n_bins=n_bins)
        self.rows, self.fit_residual = fit_leverage_polys(x_rows, l_rows)
        dt = self.t_total / self.n_steps
        rho = float(params.rho)
        self._head = np.asarray(
            [self.spot, 0.0, 0.0, 1.0 / self.n_steps,
             float(self.rate) * dt, dt, math.sqrt(dt),
             (self.rate - self.dividend) * dt,
             float(params.kappa), float(params.theta),
             self.mixing * float(params.sigma), rho,
             math.sqrt(max(1.0 - rho * rho, 0.0)), float(params.v0),
             0.0, 0.0, 0.0, 0.0, 0.0],  # _S_A.._S_E (structured kinds)
            np.float64)

    def _params_vec(self, kind, strike, barrier, lower=0.0, upper=0.0):
        if kind not in KINDS:
            raise ValidationError(
                f"unknown SLV kernel kind {kind!r}; choose {KINDS}")
        head = self._head.copy()
        head[_S_K] = float(strike)
        if "double" in kind:
            if not 0.0 < float(lower) < float(upper):
                raise ValidationError("double kinds need 0 < lower < upper")
            head[_S_A] = math.log(float(lower) / self.spot)
            head[_S_B] = math.log(float(upper) / self.spot)
        elif "barrier" in kind or "touch" in kind:
            if float(barrier) <= 0.0:
                raise ValidationError("barrier level must be positive")
            head[_S_LOGB] = math.log(float(barrier) / self.spot)
        return np.concatenate([head, self.rows.ravel()])

    def price(self, kind, strike, cp: float = 1.0, barrier: float = 0.0,
              n_paths: int = 1_000_000, seed: int = 0,
              sampler: str = "prng", lower: float = 0.0,
              upper: float = 0.0):
        """(price, stderr, actual_paths) for one contract on the
        calibrated leverage. Barriers/touches monitor discretely at every
        step; payoff conventions match ``models/slv.slv_exotic_price``
        (scan parity asserted in the tests)."""
        if sampler not in ("prng", "hash"):
            raise ValidationError("SLV kernel samplers are prng|hash")
        p = self._params_vec(kind, strike, barrier, lower, upper)
        n_blocks = max(1, math.ceil(n_paths / PATHS_PER_BLOCK))
        df = (1.0 if kind.endswith("_hit")  # discounted at hit in-kernel
              else math.exp(-self.rate * self.t_total))
        price, se = _slv_price_pipeline(
            np.asarray([seed, 0], np.int32), np.asarray(p, np.float32),
            np.float32(df), kind=kind, n_steps=self.n_steps,
            n_blocks=n_blocks, cp=float(cp), sampler=sampler)
        return price, se, n_blocks * PATHS_PER_BLOCK

    def greeks(self, kind, strike, cp: float = 1.0, barrier: float = 0.0,
               n_paths: int = 1_000_000, seed: int = 0,
               sampler: str = "prng", lower: float = 0.0,
               upper: float = 0.0) -> dict:
        """Price + stderr + LR delta/gamma (sticky-strike), v0-vega and
        rate-rho (frozen-leverage) in ONE kernel pass, any kind. See the
        module docstring for the exact conventions; ``vega`` is the
        spot-vol convention 2*sqrt(v0)*vega_v0."""
        if sampler not in ("prng", "hash"):
            raise ValidationError("LR scores assume iid normals; SLV "
                                  "kernel samplers are prng|hash")
        if self.mixing * float(self.params.sigma) < 1e-3:
            raise ValidationError(
                "the LR v0 score diverges as mixing*sigma -> 0 (the "
                "variance transition degenerates); at mixing ~ 0 the "
                "model IS local vol — use ops.local_vol_pallas."
                "LocalVolKernelPricer.greeks instead")
        p = self._params_vec(kind, strike, barrier, lower, upper)
        n_blocks = max(1, math.ceil(n_paths / PATHS_PER_BLOCK))
        outs = _launch(np.asarray([seed, 0], np.int32),
                       np.asarray(p, np.float32), kind=kind,
                       n_steps=self.n_steps, n_blocks=n_blocks,
                       cp=float(cp), sampler=sampler, lr=True)
        return self._combine_lr(outs, n_blocks * PATHS_PER_BLOCK, kind)

    def cliquet(self, local_floor: float = -0.05, local_cap: float = 0.05,
                global_floor: float = 0.0, global_cap: float = 1e9,
                notional: float = 100.0, n_periods: int = 12,
                n_paths: int = 1_000_000, seed: int = 0,
                sampler: str = "prng", greeks: bool = False):
        """Cliquet on the calibrated leverage — the forward-smile product
        SLV exists for. ``greeks=True`` returns the one-pass LR ladder
        (delta/gamma are FROZEN-FIXINGS: the first baseline IS spot, so
        the scale-invariant unconditional delta is 0 and the frozen-
        fixings delta is what a desk hedges); else (price, stderr, n).
        Conventions match ``models/slv.slv_cliquet_price``."""
        if n_periods <= 0 or self.n_steps % n_periods:
            raise ValidationError(
                "n_steps must be a positive multiple of n_periods")
        return self._structured(
            "cliquet", (float(local_floor), float(local_cap),
                        float(global_floor), float(global_cap),
                        float(notional)),
            self.n_steps // n_periods, n_paths, seed, sampler, greeks)

    def autocall(self, notional: float = 100.0,
                 autocall_barrier: float = 1.0, coupon_barrier: float = 0.8,
                 ki_barrier: float = 0.7, coupon_rate: float = 0.08,
                 n_obs: int = 4, n_paths: int = 1_000_000, seed: int = 0,
                 sampler: str = "prng", greeks: bool = False):
        """Autocallable on the calibrated leverage: the knock-in barrier
        needs the market smile, the vega flip needs stochastic vol — the
        product SLV is booked on in practice. Cashflows discount
        in-kernel; ``greeks=True`` adds the LR ladder (the DR moment
        completes rho; frozen-fixings delta). Barrier levels are RELATIVE
        to spot. Conventions match ``models/slv.slv_autocall_price``."""
        if n_obs <= 0 or self.n_steps % n_obs:
            raise ValidationError(
                "n_steps must be a positive multiple of n_obs")
        return self._structured(
            "autocall", (math.log(max(float(autocall_barrier), 1e-9)),
                         math.log(max(float(coupon_barrier), 1e-9)),
                         math.log(max(float(ki_barrier), 1e-9)),
                         float(notional) * float(coupon_rate) / n_obs,
                         float(notional)),
            self.n_steps // n_obs, n_paths, seed, sampler, greeks)

    def range_accrual(self, lower, upper, notional: float = 100.0,
                      n_paths: int = 1_000_000, seed: int = 0,
                      sampler: str = "prng", greeks: bool = False):
        """Range-accrual (corridor) note on the calibrated leverage:
        pays notional x (fraction of steps with S in [lower, upper]).
        Both the corridor width the note accrues over AND the forward
        smile it is sensitive to move with ``mixing`` while the vanillas
        stay pinned — exactly the product class SLV exists for.
        Conventions match ``models/slv.slv_range_accrual_price`` and the
        GBM closed form (``models/exotics.range_accrual_closed_form``).
        ``greeks=True`` adds the one-pass LR ladder (corridor levels are
        ABSOLUTE, so LR delta is the true hedge delta)."""
        if not 0.0 < float(lower) < float(upper):
            raise ValidationError("need 0 < lower < upper")
        return self._structured(
            "range_accrual", (math.log(float(lower) / self.spot),
                              math.log(float(upper) / self.spot),
                              0.0, 0.0, float(notional)),
            1, n_paths, seed, sampler, greeks)

    def _structured(self, kind, abcde, period, n_paths, seed, sampler,
                    greeks):
        if sampler not in ("prng", "hash"):
            raise ValidationError("SLV kernel samplers are prng|hash")
        if greeks and self.mixing * float(self.params.sigma) < 1e-3:
            raise ValidationError("the LR v0 score diverges as "
                                  "mixing*sigma -> 0; see greeks()")
        head = self._head.copy()
        head[_S_A:_S_E + 1] = abcde
        p = np.concatenate([head, self.rows.ravel()])
        n_blocks = max(1, math.ceil(n_paths / PATHS_PER_BLOCK))
        outs = _launch(np.asarray([seed, 0], np.int32),
                       np.asarray(p, np.float32), kind=kind,
                       n_steps=self.n_steps, n_blocks=n_blocks, cp=1.0,
                       sampler=sampler, lr=greeks, period=period)
        n = n_blocks * PATHS_PER_BLOCK
        if greeks:
            return self._combine_lr(outs, n, kind)
        df = (1.0 if kind == "autocall"
              else math.exp(-self.rate * self.t_total))
        return _mean_stderr(outs[0], outs[1], n, df)

    def _combine_lr(self, outs, n: int, kind: str) -> dict:
        """Moment tiles -> ladder dict (kept separate so a sharded path
        can psum the tiles first, cf. the other kernel families).
        ``kind == "autocall"``: the payoff is discounted in-kernel, so
        df = 1 and the DR moment completes rho."""
        discounted = kind == "autocall" or kind.endswith("_hit")
        df = 1.0 if discounted else math.exp(-self.rate * self.t_total)
        t = self.t_total
        dt = t / self.n_steps
        price, se, _ = _mean_stderr(outs[0], outs[1], n, df)
        v0 = float(self.params.v0)
        rho = float(self.params.rho)
        srho = max(math.sqrt(max(1.0 - rho * rho, 0.0)), 1e-4)
        # start-state leverage and slope from step 0's polynomial
        c0 = self.rows[0]
        x0c = float(np.clip(0.0, c0[0], c0[1]))
        l0 = max(float(np.polyval(c0[2:], x0c)), 1e-4)
        dl0 = float(np.polyval(np.polyder(c0[2:]), x0c))
        s_cond = srho * l0 * math.sqrt(v0 * dt)  # conditional x1 std
        m_d = float(outs[2].sum()) / n
        m_g = float(outs[3].sum()) / n
        m_x = float(outs[4].sum()) / n
        m_v = float(outs[5].sum()) / n
        m_sr = float(outs[6].sum()) / n
        # sticky-strike first-step score (see module docstring): the
        # mean shift (1 - L0 L0' v0 dt + L0' sqrt(v0 dt) rho zv0) loads
        # on zo0/s; the std sensitivity L0'/L0 on (zo0^2 - 1)
        delta = (df / self.spot) * (
            m_d * (1.0 - l0 * dl0 * v0 * dt) / s_cond
            + m_x * rho * dl0 / (srho * l0)
            + m_g * dl0 / l0)
        gamma = (df * m_g / (self.spot * s_cond) ** 2
                 - delta / self.spot)
        if kind.startswith("lookback"):
            m_b0 = float(outs[7].sum()) / n
            m_b1 = float(outs[8].sum()) / n
            delta = delta + df * m_b0
            gamma = gamma + 2.0 * df * m_b1 / (self.spot * s_cond)
        dv0 = df * m_v
        if discounted:
            dr_m = float(outs[7].sum()) / n
            rho_rate = m_sr + dr_m
        else:
            rho_rate = df * m_sr - t * price
        delta_conv = ("frozen-fixings hedge delta: barriers/baselines set "
                      "from spot at inception held fixed (the scale-"
                      "invariant unconditional delta is 0)"
                      if kind in STRUCTURED_KINDS else
                      "sticky-strike: physical leverage surface fixed "
                      "under the spot bump")
        return {"price": price, "std_error": se,
                "delta": delta, "gamma": gamma,
                "vega_v0": dv0, "vega": 2.0 * math.sqrt(v0) * dv0,
                "rho": rho_rate, "paths": n,
                "fit_residual": self.fit_residual,
                "delta_convention": delta_conv,
                "vega_convention": ("frozen-leverage dynamics "
                                    "sensitivity, 2*sqrt(v0)*vega_v0")}


def pallas_slv_exotic_price(dupire, params, kind, strike, maturity,
                            cp: float = 1.0, barrier: float = 0.0,
                            mixing: float = 1.0, n_paths: int = 1_000_000,
                            n_steps: int = 64, seed: int = 0,
                            sampler: str = "prng", lower: float = 0.0,
                            upper: float = 0.0):
    """One-shot convenience: calibrate the leverage (XLA particle scan),
    fit the polynomial table, price ``kind`` on the fused kernel.
    Returns (price, stderr, actual_paths, fit_residual). For repeated
    pricing on one surface/maturity use :class:`SLVKernelPricer`."""
    pricer = SLVKernelPricer(dupire, params, maturity, mixing=mixing,
                             n_steps=n_steps)
    price, se, n = pricer.price(kind, strike, cp=cp, barrier=barrier,
                                n_paths=n_paths, seed=seed, sampler=sampler,
                                lower=lower, upper=upper)
    return price, se, n, pricer.fit_residual
