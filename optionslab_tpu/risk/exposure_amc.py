"""AMC exposure: EE/PFE/CVA profiles for PATH-DEPENDENT trades.

The closed-form engine (``risk/exposure.py``) revalues vanillas/forwards
analytically at every (path, date). Real netting sets also hold barriers,
Asians and lookbacks, whose future value at an exposure date depends on
the path's accumulated state — the industry answer is American Monte
Carlo (Longstaff–Schwartz regression revaluation, Cesari et al.): regress
the trade's discounted terminal cashflow on basis functions of the
date-k Markov state (S_k plus the payoff's running statistic), and use
the fitted conditional expectation as the mark.

Honesty: the regression is fit on a TRAINING half of the paths and the
exposure is computed on the other half OUT-OF-SAMPLE — the classic
in-sample AMC look-ahead bias (regression noise correlated with the
positive-part) is excluded by construction, so the martingale oracle
E[df_t V̂_t] == V_0 holds within stderr rather than drifting high.

TPU-first: ONE jitted program simulates the fine path (cumsum Brownian
levels, no scan), reduces the running statistics (cumsum / cummax /
cummin), solves every date's ridge normal equations as a batched
(dates, F, F) ``jnp.linalg.solve``, and evaluates the marks on the
valuation half — no per-date host loops.

Scope: one underlying per netting set (the Markov state is
(S, per-trade statistic)); quantities may be signed (netting). Knocked-
OUT trades mark to zero; knocked-IN trades mark as the vanilla closed
form after the hit (exact) and by regression before it.

Reference anchor: the reference has no exposure/XVA machinery at all
(``src/risk_analysis/`` stops at VaR/ES); this extends the repo's own
closed-form exposure engine to the payoff families of
``models/exotics.py``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..models.black_scholes import bs_price
from ..utils.exceptions import ValidationError
from .exposure import ExposureResult

__all__ = ["ExoticPosition", "amc_exposure_profile",
           "amc_dynamics_kwargs"]


def amc_dynamics_kwargs(model: str, *, spot, rate, vol,
                        heston_params=None, bates_params=None,
                        rbergomi_params=None, mixing=1.0) -> dict:
    """Map a façade model name to :func:`amc_exposure_profile` dynamics
    kwargs — the ONE place CLI ``xva --model`` and HTTP ``/xva`` share.
    The ``*_params`` are override DICTS (same conventions as the
    ``/american`` route); ``vol`` seeds the SLV smile's base level.

    An override dict that the chosen model cannot consume raises
    ``ValidationError`` rather than being silently dropped (a client
    sending ``heston_params`` with ``model=bates`` would otherwise get
    default-parameter dynamics with no error)."""
    model = str(model).lower()
    consumes = {"bs": (), "heston": ("heston_params",),
                "bates": ("bates_params",),
                "slv": ("heston_params",), "rbergomi": ("rbergomi_params",)}
    if model not in consumes:
        raise ValidationError(f"unknown xva model {model!r}; choose "
                              "bs|heston|bates|slv|rbergomi")
    overrides = {"heston_params": heston_params, "bates_params": bates_params,
                 "rbergomi_params": rbergomi_params}
    stray = [k for k, v in overrides.items()
             if v and k not in consumes[model]]
    if stray:
        raise ValidationError(
            f"model={model!r} does not consume {', '.join(stray)}; it "
            f"accepts {list(consumes[model]) or 'no override dicts'}")
    if model != "slv" and float(mixing) != 1.0:
        raise ValidationError("mixing applies to model='slv' only")
    if model == "bs":
        return {}
    if model == "heston":
        from ..models.heston import HestonParams

        return {"heston_params": HestonParams.make(**(heston_params or {}))}
    if model == "bates":
        from ..models.bates import BatesParams

        return {"heston_params": BatesParams.make(**(bates_params or {}))}
    if model == "slv":
        from ..models.heston import HestonParams
        from ..models.local_vol import DupireLocalVol, sample_smile_iv_fn

        return {"dupire": DupireLocalVol(sample_smile_iv_fn(base_vol=vol),
                                         spot, rate),
                "heston_params": HestonParams.make(**(heston_params or {})),
                "mixing": float(mixing)}
    from ..models.rbergomi import RBergomiParams

    return {"rbergomi_params": RBergomiParams(**(rbergomi_params or {}))}

AMC_KINDS = ("vanilla", "asian_arith", "lookback_float", "lookback_fixed",
             "barrier_up-and-out", "barrier_up-and-in",
             "barrier_down-and-out", "barrier_down-and-in")


@dataclasses.dataclass(frozen=True)
class ExoticPosition:
    """One (possibly path-dependent) trade in an AMC netting set."""
    kind: str = "vanilla"
    quantity: float = 1.0
    strike: float = 100.0
    maturity: float = 1.0
    option_type: str = "call"
    barrier: float = 0.0
    vol: float = 0.2

    def validate(self):
        if self.kind not in AMC_KINDS:
            raise ValidationError(
                f"kind must be one of {AMC_KINDS}, got {self.kind!r}")
        if "barrier" in self.kind and self.barrier <= 0:
            raise ValidationError("barrier kinds need barrier > 0")
        if self.maturity <= 0 or self.vol <= 0:
            raise ValidationError("need maturity > 0 and vol > 0")


def _features(s, stat, spot, strike, cp, v=None, m=None):
    """Regression basis in the normalized Markov state (s, stat[, v[, m]]),
    plus the two INTRINSIC features max(cp(s−K),0) and max(cp(stat−K),0)
    — the payoff kink that polynomials smooth over (same trick as the
    LSM policy bases); a tight basis also shrinks the positive-part
    convexity bias E[max(V̂,0)] − E[V̂] of noisy marks. Under Heston
    dynamics the instantaneous variance joins the state (the mark is a
    function of (S, v, stat)). Under rough Bergomi the law is
    NON-Markovian in (S, v): the forward-Volterra conditional mean
    m = E[V~_next | F_t] joins the state (the same feature the certified
    American bracket regresses on, ``models/rbergomi_american.py``)."""
    x = s / spot
    a = stat / spot
    k = strike / spot
    one = jnp.ones_like(x)
    exs = jnp.maximum(cp * (x - k), 0.0)
    exa = jnp.maximum(cp * (a - k), 0.0)
    cols = [one, x, x * x, x * x * x, a, a * a, x * a, x * x * a, exs, exa]
    if v is not None:
        cols += [v, v * v, x * v, exs * v]
    if m is not None:
        cols += [m, m * m, x * m]
    return jnp.stack(cols, axis=-1)


def _sim_fine_heston(key, n_paths, n_fine, dt, spot, rate, dividend,
                     params):
    """(paths, n_fine) spot AND variance levels under Andersen-QE Heston
    — the same transition law as the American-bracket machinery
    (``models.heston_american._qe_apply``). A ``BatesParams`` (has
    ``lam``) adds the exact compound-Poisson log-jump per substep with
    the martingale drift compensator — identical law to the Bates
    bracket (``_qe_substep(..., jc)``); lam=0 is bit-identical to
    Heston (poisson(0) draws are always 0)."""
    from ..models.heston_american import (_apply_jump, _jump_comp,
                                          _jump_consts, _qe_apply,
                                          _qe_consts)

    params32 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)
    consts = _qe_consts(params32, jnp.float32(dt))
    jc = _jump_consts(params32, jnp.float32(dt))
    mu_dt = (jnp.float32(rate - dividend)
             - _jump_comp(params32)) * jnp.float32(dt)

    def body(carry, i):
        x, v = carry
        kk = jax.random.fold_in(key, i)
        kz, ku = jax.random.split(kk)
        z = jax.random.normal(kz, (2, n_paths), jnp.float32)
        u = jax.random.uniform(ku, (n_paths,), jnp.float32, 1e-7,
                               1.0 - 1e-7)
        x, v = _qe_apply(x, v, z[0], z[1], u, consts, mu_dt)
        if jc is not None:
            x = _apply_jump(x, jax.random.fold_in(kk, 13), jc, jnp.float32)
        return (x, v), (x, v)

    x0 = jnp.zeros((n_paths,), jnp.float32)
    v0 = jnp.full((n_paths,), jnp.float32(params.v0))
    _, (xs, vs) = jax.lax.scan(body, (x0, v0), jnp.arange(n_fine))
    return spot * jnp.exp(xs.T), vs.T


def _sim_fine_slv(key, n_paths, n_fine, dt, spot, rate, dividend, params,
                  mixing, x_rows, l_rows):
    """(paths, n_fine) spot AND variance levels under the FROZEN-LEVERAGE
    Euler-SLV law — the identical transition every SLV pipeline replays
    (``models.slv_american._slv_apply``; one leverage row per fine
    substep)."""
    from ..models.slv_american import _dyn, _slv_apply

    dyn = _dyn(params, mixing, rate, dividend, dt * n_fine, n_fine, 1)

    def body(carry, xs_in):
        x, v = carry
        i, x_row, l_row = xs_in
        z = jax.random.normal(jax.random.fold_in(key, i), (2, n_paths),
                              jnp.float32)
        x, v = _slv_apply(x, v, z[0], z[1], dyn, x_row, l_row)
        return (x, v), (x, v)

    x0 = jnp.zeros((n_paths,), jnp.float32)
    v0 = jnp.full((n_paths,), jnp.float32(params.v0))
    _, (xs, vs) = jax.lax.scan(body, (x0, v0),
                               (jnp.arange(n_fine), x_rows, l_rows))
    return spot * jnp.exp(xs.T), vs.T


def _m_readout_dates(lc: np.ndarray, n_dates: int, n_sub: int):
    """(n_dates, 2n) host matrix M with m_d = M[d] @ e = the conditional
    mean E[V~ at the NEXT exposure date | F at date d] under the causal
    (time-interleaved) Volterra factorization. The exposure date grid is
    the American bracket's date grid shifted by one (its row 0 sits at
    t=0; exposure dates start at t_1), so this is exactly
    ``rbergomi_american._m_readout_matrix(lc, n_dates, n_sub)[1:]`` — one
    implementation of the subtle row/mask index arithmetic. The last
    date (no next) reads out zero; its feature is unused (tau=0 there,
    the mark is the settled payoff)."""
    from ..models.rbergomi_american import _m_readout_matrix

    return _m_readout_matrix(lc, n_dates, n_sub)[1:]


def _sim_fine_rbergomi(key, n_paths, n_fine, dt, spot, rate, dividend,
                       params, lc, mmat):
    """(paths, n_fine) spot and instantaneous-variance levels under the
    EXACT rough-Bergomi law (joint Volterra/Brownian Gaussian vector via
    the causal Cholesky factor — the same law the certified American
    bracket simulates, ``models.rbergomi_american._simulate_dates``),
    plus the (paths, n_dates) forward-Volterra feature m the regression
    state needs because the law is non-Markovian in (S, v)."""
    n = n_fine
    t_fine = jnp.arange(1, n + 1, dtype=jnp.float32) * jnp.float32(dt)
    eta = jnp.float32(params.eta)
    rho = jnp.float32(params.rho)
    xi0 = jnp.float32(params.xi0)
    k1, k2 = jax.random.split(key)
    e = jax.random.normal(k1, (n_paths, 2 * n), jnp.float32)
    zp = jax.random.normal(k2, (n_paths, n), jnp.float32)
    g = jax.lax.dot_general(e, lc, (((1,), (1,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST)
    v_tilde = g[:, 0::2]
    w_lvl = g[:, 1::2]
    dw = jnp.diff(w_lvl, axis=1,
                  prepend=jnp.zeros((n_paths, 1), jnp.float32))
    v_grid = xi0 * jnp.exp(eta * v_tilde - 0.5 * eta * eta
                           * t_fine[None, :] ** (2.0 * float(params.hurst)))
    v_left = jnp.concatenate(
        [jnp.full((n_paths, 1), xi0, jnp.float32), v_grid[:, :-1]], axis=1)
    srho = jnp.sqrt(jnp.maximum(1.0 - rho * rho, 0.0))
    dz = rho * dw + srho * jnp.sqrt(jnp.float32(dt)) * zp
    x = jnp.cumsum(jnp.sqrt(v_left) * dz - 0.5 * v_left * jnp.float32(dt),
                   axis=1) + jnp.float32(rate - dividend) * t_fine[None, :]
    m_d = jax.lax.dot_general(e, mmat, (((1,), (1,)), ((), ())),
                              precision=jax.lax.Precision.HIGHEST)
    return spot * jnp.exp(x), v_grid, m_d


def _running_stat(s_fine, kind, cp):
    """(paths, steps) running statistic AFTER each substep; S0 excluded
    from averages (steps 1..n convention) but INCLUDED in extrema via the
    caller seeding the cummax/cummin with S0."""
    if kind == "asian_arith":
        csum = jnp.cumsum(s_fine, axis=1)
        cnt = jnp.arange(1, s_fine.shape[1] + 1, dtype=s_fine.dtype)
        return csum / cnt[None, :]
    if kind in ("lookback_float", "lookback_fixed"):
        lo = (cp > 0) == (kind == "lookback_float")
        return (jax.lax.cummin if lo else jax.lax.cummax)(s_fine, axis=1)
    return s_fine  # vanilla / barrier: state is S itself


def amc_exposure_profile(book, *, spot: float = 100.0, rate: float = 0.05,
                         vol: float | None = None, dividend: float = 0.0,
                         horizon: float | None = None, n_dates: int = 24,
                         n_sub: int = 8, n_paths: int = 65536,
                         seed: int = 0, quantile: float = 0.95,
                         ridge: float = 1e-6, heston_params=None,
                         dupire=None, mixing: float = 1.0,
                         rbergomi_params=None) -> ExposureResult:
    """EE/EPE/PFE/ENE profile of a netting set of path-dependent trades.

    ``book``: list of :class:`ExoticPosition` on ONE underlying.
    Dynamics: risk-neutral GBM at ``vol`` (default: the first position's
    vol) — or, with ``heston_params``, Andersen-QE Heston
    (:class:`~..models.heston.HestonParams`) or Bates with exact
    compound-Poisson jumps (:class:`~..models.bates.BatesParams`; the
    martingale compensator rides the drift, lam=0 is bit-identical to
    Heston) — or, with ``dupire`` (+ ``heston_params`` + ``mixing``),
    the frozen-leverage Euler-SLV law (one particle-calibrated leverage
    row per fine substep, the same transition the SLV American bracket
    certifies): the SMILE-CONSISTENT exposure a desk actually wants for
    barrier books. Under any stochastic-vol law the regression state
    gains the instantaneous variance and each position's ``vol`` is
    ignored. Barrier/extrema monitoring and Asian averaging happen on
    the FINE grid (``n_dates * n_sub`` substeps over the horizon) —
    state the monitoring convention when comparing against pricers with
    a different fixing schedule. With ``rbergomi_params``
    (:class:`~..models.rbergomi.RBergomiParams`), paths follow the EXACT
    (non-Markovian) rough-Bergomi law via the causal Volterra
    factorization and the regression state gains BOTH the instantaneous
    variance and the forward-Volterra conditional mean m = E[V~_next|F_t]
    — without m the conditional mark is not a function of the regression
    state at all (eta→0 recovers the GBM profile at vol=sqrt(xi0)).
    Returns an
    :class:`~.exposure.ExposureResult`, so :func:`~.exposure.cva_dva`
    composes unchanged. Note: under stochastic vol the knocked-in
    "exact vanilla" mark uses the regression too (no flat-vol shortcut).
    """
    pos = list(book)
    if not pos:
        raise ValidationError("amc_exposure_profile needs a non-empty book")
    for p in pos:
        p.validate()
    if not 0.0 < quantile < 1.0:
        raise ValidationError(f"quantile must be in (0,1): {quantile}")
    if n_paths % 2:
        raise ValidationError("n_paths must be even (train/valuation split)")
    horizon = float(horizon if horizon is not None
                    else max(p.maturity for p in pos))
    vol = float(vol if vol is not None else pos[0].vol)
    n_fine = n_dates * n_sub
    dt = horizon / n_fine
    # trade i's final monitoring substep (1-based index into the fine grid)
    m_idx = [max(1, min(n_fine, int(round(p.maturity / dt)))) for p in pos]
    d_idx = jnp.arange(n_sub - 1, n_fine, n_sub)  # date-grid substeps
    dates = (jnp.asarray(d_idx, jnp.float32) + 1.0) * dt
    half = n_paths // 2
    if rbergomi_params is not None:
        if heston_params is not None or dupire is not None:
            raise ValidationError("rbergomi_params is exclusive with "
                                  "heston_params/dupire")
        rbergomi_params.validate()
        from ..models.rbergomi import _volterra_chol_causal

        lc_np = _volterra_chol_causal(n_fine, float(rbergomi_params.hurst),
                                      float(horizon))
        rb_lc = jnp.asarray(lc_np)
        rb_mmat = jnp.asarray(_m_readout_dates(lc_np, n_dates, n_sub))
    if dupire is not None:
        if heston_params is None:
            raise ValidationError("SLV exposure needs heston_params "
                                  "alongside dupire")
        from ..models.slv import slv_calibrate_leverage

        surface = getattr(dupire, "surface", dupire)
        lev_rows = slv_calibrate_leverage(
            spot, horizon, rate, heston_params,
            jax.random.PRNGKey(seed + 104_729), surface.k_grid,
            surface.t_grid, surface.grid, dividend=dividend, mixing=mixing,
            n_paths=min(n_paths, 262_144), n_steps=n_fine)
    else:
        lev_rows = None

    @jax.jit
    def run(key):
        m_dates = None
        if rbergomi_params is not None:
            s_fine, v_fine, m_dates = _sim_fine_rbergomi(
                key, n_paths, n_fine, dt, spot, rate, dividend,
                rbergomi_params, rb_lc, rb_mmat)
        elif lev_rows is not None:
            s_fine, v_fine = _sim_fine_slv(key, n_paths, n_fine, dt, spot,
                                           rate, dividend, heston_params,
                                           mixing, *lev_rows)
        elif heston_params is not None:
            s_fine, v_fine = _sim_fine_heston(key, n_paths, n_fine, dt,
                                              spot, rate, dividend,
                                              heston_params)
        else:
            z = jax.random.normal(key, (n_paths, n_fine), jnp.float32)
            w = jnp.cumsum(z, axis=1) * np.float32(np.sqrt(dt))
            t_fine = (jnp.arange(1, n_fine + 1, dtype=jnp.float32)) * dt
            s_fine = spot * jnp.exp((rate - dividend - 0.5 * vol * vol)
                                    * t_fine[None, :] + vol * w)
            v_fine = None
        v_net = jnp.zeros((half, n_dates), jnp.float32)
        for p, mi in zip(pos, m_idx):
            cp = 1.0 if str(p.option_type).lower().startswith("c") else -1.0
            t_mat = mi * dt
            s_trade = s_fine[:, :mi]
            stat = _running_stat(s_trade, p.kind, cp)
            if p.kind.startswith("lookback"):
                stat = (jnp.minimum(stat, spot) if (cp > 0) ==
                        (p.kind == "lookback_float")
                        else jnp.maximum(stat, spot))
            if "barrier" in p.kind:
                up = "up" in p.kind
                ext = (jax.lax.cummax if up else jax.lax.cummin)(
                    s_trade, axis=1)
                ext = (jnp.maximum(ext, spot) if up
                       else jnp.minimum(ext, spot))
                hit = ((ext >= p.barrier) if up
                       else (ext <= p.barrier)).astype(jnp.float32)
            s_t = s_trade[:, -1]
            if p.kind == "asian_arith":
                pay = jnp.maximum(cp * (stat[:, -1] - p.strike), 0.0)
            elif p.kind == "lookback_float":
                pay = cp * (s_t - stat[:, -1])
            elif p.kind == "lookback_fixed":
                pay = jnp.maximum(cp * (stat[:, -1] - p.strike), 0.0)
            elif "barrier" in p.kind:
                van_pay = jnp.maximum(cp * (s_t - p.strike), 0.0)
                pay = van_pay * (hit[:, -1] if p.kind.endswith("in")
                                 else (1.0 - hit[:, -1]))
            else:
                pay = jnp.maximum(cp * (s_t - p.strike), 0.0)

            # marks on the date grid (paths, n_dates)
            sd = s_fine[:, d_idx]
            statd = stat[:, jnp.minimum(d_idx, mi - 1)]
            t_d = dates
            tau = t_mat - t_d  # (n_dates,)
            live = tau > 1e-9  # regression dates strictly before maturity
            # y: cashflow discounted from maturity back to each date
            y = pay[:, None] * jnp.exp(-rate * jnp.maximum(tau, 0.0))[None, :]
            vd = None if v_fine is None else v_fine[:, d_idx]
            phi = _features(sd, statd, spot, p.strike, cp, vd, m_dates)
            if "barrier" in p.kind:
                out_kind = p.kind.endswith("out")
                hd = hit[:, jnp.minimum(d_idx, mi - 1)]
                if out_kind:
                    # knocked-out: worth 0; regress on surviving paths
                    wgt = 1.0 - hd
                else:
                    # knocked-in: exactly a vanilla after the hit (closed
                    # form); regress only the not-yet-in paths
                    wgt = 1.0 - hd
            else:
                wgt = jnp.ones_like(sd)
            wtr = wgt[:half] * live[None, :]
            # per-date column scales (training-half RMS, floored): at
            # high vol the raw polynomial columns span orders of
            # magnitude and the f32 Gram matrix goes singular -> NaN
            # marks (r4 rBergomi lesson: normalize, solve, and keep the
            # SAME scales at eval time — folding them back recreates
            # the blowup). Scale-only (no centering) preserves the
            # intercept column.
            n_w = jnp.maximum(wtr.sum(axis=0), 1.0)  # (dates,)
            rms = jnp.sqrt(jnp.einsum("pdf,pd->df", phi[:half] ** 2, wtr)
                           / n_w[:, None])
            rms = jnp.maximum(rms, 1e-6)  # (dates, F)
            phi_tr = phi[:half] / rms[None, :, :]
            # batched ridge normal equations per date: (dates, F, F)
            g = jnp.einsum("pdf,pdg,pd->dfg", phi_tr, phi_tr, wtr)
            b = jnp.einsum("pdf,pd,pd->df", phi_tr, y[:half], wtr)
            f_dim = g.shape[-1]
            g = g + ridge * half * jnp.eye(f_dim)[None, :, :]
            coef = jnp.linalg.solve(g, b[..., None])[..., 0]  # (dates, F)
            # out-of-sample marks on the valuation half (same scales)
            cont = jnp.einsum("pdf,df->pd", phi[half:] / rms[None, :, :],
                              coef)
            cont = jnp.clip(cont, 0.0, None) if p.kind != "lookback_float" \
                else cont
            if "barrier" in p.kind:
                hv = hd[half:]
                if p.kind.endswith("out"):
                    cont = (1.0 - hv) * cont
                elif v_fine is None:
                    van = bs_price(sd[half:], p.strike,
                                   jnp.maximum(tau, 1e-8)[None, :], rate,
                                   p.vol, cp, dividend)
                    cont = (1.0 - hv) * cont + hv * van
                else:
                    # Heston: no flat-vol shortcut — a SECOND regression
                    # on the knocked-in paths marks the vanilla leg
                    wtr_in = hd[:half] * live[None, :]
                    g_in = jnp.einsum("pdf,pdg,pd->dfg", phi_tr, phi_tr,
                                      wtr_in)
                    b_in = jnp.einsum("pdf,pd,pd->df", phi_tr,
                                      (van_pay[:half, None]
                                       * jnp.exp(-rate * jnp.maximum(
                                           tau, 0.0))[None, :]), wtr_in)
                    g_in = g_in + ridge * half * jnp.eye(f_dim)[None, :, :]
                    c_in = jnp.linalg.solve(g_in, b_in[..., None])[..., 0]
                    van = jnp.clip(
                        jnp.einsum("pdf,df->pd",
                                   phi[half:] / rms[None, :, :], c_in),
                        0.0, None)
                    cont = (1.0 - hv) * cont + hv * van
            # at/after maturity: the settled payoff is exposure THROUGH
            # the payoff date (same convention as the closed-form engine),
            # zero afterwards
            at_or_after = ~live
            settled = (t_d <= t_mat + 0.5 * dt * n_sub)
            v_trade = jnp.where(at_or_after[None, :],
                                jnp.where(settled[None, :],
                                          y[half:], 0.0), cont)
            v_net = v_net + p.quantity * v_trade

        e_pos = jnp.maximum(v_net, 0.0)
        e_neg = jnp.maximum(-v_net, 0.0)
        df = jnp.exp(-rate * dates)[None, :]
        return (jnp.mean(e_pos, axis=0), jnp.mean(df * e_pos, axis=0),
                jnp.mean(e_neg, axis=0), jnp.mean(df * e_neg, axis=0),
                jnp.quantile(e_pos, quantile, axis=0))

    ee, ee_d, ene, ene_d, pfe = (np.asarray(x) for x in
                                 run(jax.random.PRNGKey(seed)))
    return ExposureResult(
        dates=np.asarray(dates), ee=ee, ee_discounted=ee_d, ene=ene,
        ene_discounted=ene_d, pfe=pfe, quantile=quantile,
        epe=float(np.mean(ee)), max_pfe=float(pfe.max()), rate=rate,
        n_paths=half)
