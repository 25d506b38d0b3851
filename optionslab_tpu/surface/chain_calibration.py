"""End-to-end option-chain -> SVI/SSVI surface calibration.

The reference wires this flow through the dashboard's vol-surface page
(``streamlit_app/pages/13_Volatility_Surface.py``: load chain -> backfill
IVs -> per-expiry smile fit -> arbitrage report) with manual pandas
plumbing per page.  Here it is one function over the same layers:
``data/loader.py`` (chain + vectorized IV backfill) -> ``surface/svi.py``
(scanned-Adam slice + surface calibrations, one device dispatch each) ->
``surface/arbitrage.py`` (static no-arb diagnostics).

TPU notes: every calibration is a single jitted ``scan_adam`` program;
the SSVI surface fit runs over the *scattered* quotes directly (no grid
interpolation step) by exploiting that ``ssvi_total_variance`` is
pointwise in (k, theta).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.exceptions import CalibrationError, ValidationError
from .svi import (SVIParams, SSVIParams, calibrate_svi, check_butterfly,
                  ssvi_total_variance, svi_total_variance)

__all__ = ["ChainCalibrationResult", "calibrate_chain", "chain_smile_data",
           "svi_surface_iv_fn", "local_vol_from_chain",
           "calibrate_model_to_chain"]


@dataclasses.dataclass
class ChainCalibrationResult:
    """Everything the vol-surface page displays, as plain data."""

    expiries: np.ndarray              # (n_exp,) bucket maturities (years)
    n_quotes: np.ndarray              # (n_exp,) quotes used per slice
    svi_params: list                  # [SVIParams] per expiry
    svi_rmse_vol: np.ndarray          # (n_exp,) RMSE in vol points
    thetas: np.ndarray                # (n_exp,) fitted ATM total variance
    ssvi: "SSVIParams"
    ssvi_rmse_vol: float
    report: dict
    spot: float
    rate: float
    slice_quotes: list = dataclasses.field(default_factory=list, repr=False)
    # [(k, iv_adjusted)] per expiry — the exact data each slice was fit to
    essvi: object = None            # ESSVIParams when essvi=True
    essvi_rmse_vol: float = float("nan")

    def to_dict(self) -> dict:
        def p2d(p):
            return {f: float(np.asarray(getattr(p, f))) for f in
                    ("a", "b", "rho", "m", "sigma")}

        return {
            "expiries": [float(t) for t in self.expiries],
            "n_quotes": [int(n) for n in self.n_quotes],
            "svi_params": [p2d(p) for p in self.svi_params],
            "svi_rmse_vol": [float(x) for x in self.svi_rmse_vol],
            "thetas": [float(t) for t in self.thetas],
            "ssvi": {"rho": float(np.asarray(self.ssvi.rho)),
                     "eta": float(np.asarray(self.ssvi.eta)),
                     "gamma": float(np.asarray(self.ssvi.gamma))},
            "ssvi_rmse_vol": float(self.ssvi_rmse_vol),
            "report": self.report,
            "spot": self.spot,
            "rate": self.rate,
            **({"essvi": {
                "theta": [float(x) for x in np.asarray(self.essvi.theta)],
                "rho": [float(x) for x in np.asarray(self.essvi.rho)],
                "psi": [float(x) for x in np.asarray(self.essvi.psi)]},
                "essvi_rmse_vol": float(self.essvi_rmse_vol)}
               if self.essvi is not None else {}),
        }

    def svi_vol(self, log_moneyness, expiry_index: int):
        """Fitted slice vol at forward log-moneyness k = log(K/F)."""
        t = float(self.expiries[expiry_index])
        w = svi_total_variance(jnp.asarray(log_moneyness, jnp.float32),
                               self.svi_params[expiry_index])
        return jnp.sqrt(jnp.maximum(w, 1e-12) / t)


def _as_dataframe(chain):
    if hasattr(chain, "df"):
        return chain.df
    return chain


def _bucket_expiries(ttm: np.ndarray, n_bins: int):
    """Group maturities: exact distinct values when few, quantile bins else.

    Returns (labels, bucket_ttm) where labels[i] indexes bucket_ttm."""
    uniq = np.unique(np.round(ttm, 6))
    if len(uniq) <= n_bins:
        labels = np.searchsorted(uniq, np.round(ttm, 6))
        return labels, uniq
    edges = np.quantile(ttm, np.linspace(0.0, 1.0, n_bins + 1))
    edges[0] -= 1e-9
    labels = np.clip(np.searchsorted(edges, ttm, side="left") - 1, 0, n_bins - 1)
    bucket_ttm = np.array([np.median(ttm[labels == b]) if np.any(labels == b)
                           else 0.5 * (edges[b] + edges[b + 1])
                           for b in range(n_bins)])
    keep = np.array([np.any(labels == b) for b in range(n_bins)])
    remap = np.cumsum(keep) - 1
    return remap[labels], bucket_ttm[keep]


def _atm_term_structure(k_all, ttm, iv, k_window: float = 0.15):
    """Smooth sigma_atm(T) estimate from near-the-money quotes (binned
    medians + linear interpolation).  Returns a vectorized callable."""
    atm = np.abs(k_all) < k_window
    if atm.sum() < 8:
        level = float(np.median(iv))
        return lambda t: np.full_like(np.asarray(t, np.float64), level)
    t_atm, iv_atm = ttm[atm], iv[atm]
    nb = int(np.clip(atm.sum() // 8, 2, 12))
    edges = np.quantile(t_atm, np.linspace(0.0, 1.0, nb + 1))
    idx = np.clip(np.searchsorted(edges, t_atm, side="left") - 1, 0, nb - 1)
    centers, meds = [], []
    for b in range(nb):
        m = idx == b
        if m.any():
            centers.append(float(np.median(t_atm[m])))
            meds.append(float(np.median(iv_atm[m])))
    centers, meds = np.asarray(centers), np.asarray(meds)
    return lambda t: np.interp(np.asarray(t, np.float64), centers, meds)


def _calibrate_ssvi_scattered(k_flat, theta_flat, w_flat, n_steps, learning_rate):
    """SSVI (rho, eta, gamma) fit directly on scattered quotes.

    ``ssvi_total_variance`` is pointwise, so no maturity grid is needed:
    each quote carries the theta of its expiry. One scanned-Adam dispatch."""
    from ..ops.optim import scan_adam

    k = jnp.asarray(k_flat, jnp.float32)
    th = jnp.asarray(theta_flat, jnp.float32)
    w_obs = jnp.asarray(w_flat, jnp.float32)

    inv_sp = lambda x: jnp.log(jnp.expm1(jnp.maximum(x, 1e-8)))
    x0 = jnp.stack([jnp.arctanh(jnp.asarray(-0.3)), inv_sp(jnp.asarray(1.0)),
                    jnp.arctanh(jnp.asarray(0.5 * 2 - 1))])

    def unpack(x):
        return SSVIParams(rho=jnp.tanh(x[0]), eta=jax.nn.softplus(x[1]),
                          gamma=(jnp.tanh(x[2]) + 1.0) / 2.0 * 0.98 + 0.01)

    def loss_fn(x):
        p = unpack(x)
        w = ssvi_total_variance(k, th, p)
        fit = jnp.mean((w - w_obs) ** 2)
        pen = jnp.maximum(p.eta * (1.0 + jnp.abs(p.rho)) - 2.0, 0.0) ** 2
        return fit + 10.0 * pen

    best_x, best_loss, _ = scan_adam(loss_fn, x0, n_steps, learning_rate)
    if not np.isfinite(float(best_loss)):
        raise CalibrationError("SSVI chain calibration diverged")
    return unpack(best_x)


def calibrate_chain(chain, *, n_expiry_bins: int = 6, from_prices: bool = False,
                    min_quotes_per_slice: int = 8, n_steps: int = 600,
                    learning_rate: float = 0.02,
                    essvi: bool = False) -> ChainCalibrationResult:
    """Chain snapshot -> per-expiry SVI slices + global SSVI + arb report.

    ``chain``: an ``OptionChainDataset`` or DataFrame with the standard
    columns (``data/loader.py``).  ``from_prices=True`` backfills implied
    vols from option prices first (vectorized Newton, one launch).

    Moneyness convention: forward log-moneyness k = log(K/F),
    F = S exp(r T) (SVI's natural coordinate; Gatheral 2004).

    ``essvi=True`` additionally fits an eSSVI surface (per-expiry rho/psi,
    :mod:`~.essvi`) jointly over all slices in one scanned-Adam dispatch —
    typically well below the global-SSVI RMSE on real chains — and merges
    its exact no-arb report under ``report["essvi_*"]``.
    """
    if from_prices or "implied_volatility" not in _as_dataframe(chain).columns:
        if hasattr(chain, "backfill_implied_vol"):
            chain = chain.backfill_implied_vol()
        else:  # raw DataFrame
            from ..data.loader import OptionChainDataset
            chain = OptionChainDataset(chain).backfill_implied_vol()
    df = _as_dataframe(chain)

    need = ["underlying_price", "strike_price", "time_to_maturity",
            "implied_volatility"]
    for c in need:
        if c not in df.columns:
            raise ValidationError(f"chain is missing column {c!r}")

    iv = np.asarray(df["implied_volatility"], np.float64)
    ok = np.isfinite(iv) & (iv > 0.01) & (iv < 3.0)
    df = df.loc[ok]
    if len(df) < min_quotes_per_slice:
        raise ValidationError(f"only {len(df)} usable quotes after filtering")

    s = np.asarray(df["underlying_price"], np.float64)
    strike = np.asarray(df["strike_price"], np.float64)
    ttm = np.asarray(df["time_to_maturity"], np.float64)
    iv = np.asarray(df["implied_volatility"], np.float64)
    rate = (float(np.median(df["risk_free_rate"]))
            if "risk_free_rate" in df.columns else 0.0)
    spot = float(np.median(s))

    fwd = s * np.exp(rate * ttm)
    k_all = np.log(strike / fwd)

    labels, bucket_ttm = _bucket_expiries(ttm, n_expiry_bins)

    # ATM vol term structure: lets quotes inside a bucket be LEVEL-adjusted
    # to the bucket maturity (iv * sigma_atm(T_bucket)/sigma_atm(T_quote)),
    # so fast short-end term structure does not contaminate the smile shape.
    sigma_atm = _atm_term_structure(k_all, ttm, iv)

    svi_params, rmse, thetas, counts, expiries = [], [], [], [], []
    slice_quotes = []  # (k, iv, T) per kept slice, for SSVI + diagnostics
    for b, t in enumerate(bucket_ttm):
        sel = labels == b
        if sel.sum() < min_quotes_per_slice:
            continue
        kb, tb = k_all[sel], ttm[sel]
        t = float(t)
        # Level-adjust each quote's vol to the bucket maturity via the ATM
        # term structure, then fit the smile at the single maturity t.
        # (Fitting w-space with per-quote T instead underweights short-dated
        # quotes; fitting raw vols instead smears the short-end term
        # structure into the smile shape.)
        ivb = iv[sel] * sigma_atm(t) / sigma_atm(tb)
        p, _ = calibrate_svi(kb, vols=ivb, maturity=t, n_steps=n_steps,
                             learning_rate=learning_rate)
        w_fit = np.asarray(svi_total_variance(jnp.asarray(kb, jnp.float32), p))
        vol_fit = np.sqrt(np.maximum(w_fit, 1e-12) / t)
        svi_params.append(p)
        rmse.append(float(np.sqrt(np.mean((vol_fit - ivb) ** 2))))
        thetas.append(float(np.asarray(
            svi_total_variance(jnp.zeros((), jnp.float32), p))))
        counts.append(int(sel.sum()))
        expiries.append(t)
        slice_quotes.append((kb, ivb, t))

    if not svi_params:
        raise CalibrationError(
            f"no expiry bucket has >= {min_quotes_per_slice} quotes")

    order = np.argsort(expiries)
    svi_params = [svi_params[i] for i in order]
    slice_quotes = [slice_quotes[i] for i in order]
    expiries = np.asarray(expiries, np.float64)[order]
    rmse = np.asarray(rmse)[order]
    thetas = np.asarray(thetas)[order]
    counts = np.asarray(counts)[order]

    # SSVI on the scattered quotes, theta taken from each quote's slice fit
    k_flat = np.concatenate([q[0] for q in slice_quotes])
    w_flat = np.concatenate([(q[1] ** 2) * q[2] for q in slice_quotes])
    th_flat = np.concatenate([np.full(len(q[0]), thetas[i])
                              for i, q in enumerate(slice_quotes)])
    ssvi = _calibrate_ssvi_scattered(k_flat, th_flat, w_flat, n_steps,
                                     learning_rate)
    w_ssvi = np.asarray(ssvi_total_variance(
        jnp.asarray(k_flat, jnp.float32), jnp.asarray(th_flat, jnp.float32),
        ssvi))
    t_flat = np.concatenate([np.full(len(q[0]), q[2]) for q in slice_quotes])
    ssvi_rmse = float(np.sqrt(np.mean(
        (np.sqrt(np.maximum(w_ssvi, 1e-12) / t_flat)
         - np.concatenate([q[1] for q in slice_quotes])) ** 2)))

    # --- static no-arbitrage diagnostics on the FITTED surface ------------
    k_dense = jnp.linspace(float(k_all.min()), float(k_all.max()), 101)
    w_slices = np.stack([np.asarray(svi_total_variance(k_dense, p))
                         for p in svi_params])
    calendar_violation_rate = (float(np.mean(np.diff(w_slices, axis=0) < -1e-8))
                               if len(svi_params) > 1 else 0.0)
    bfly = [check_butterfly(p, k_dense) for p in svi_params]
    eta_r = float(np.asarray(ssvi.eta)) * (1.0 + abs(float(np.asarray(ssvi.rho))))
    report = {
        "butterfly_free": bfly,
        "calendar_violation_rate": calendar_violation_rate,
        "theta_monotone": bool(np.all(np.diff(thetas) >= -1e-8)),
        "ssvi_butterfly_condition": eta_r,           # <= 2 is arb-free
        "ssvi_butterfly_free": eta_r <= 2.0 + 1e-9,
        "arbitrage_free": (calendar_violation_rate == 0.0 and all(bfly)),
        "total_quotes_used": int(counts.sum()),
    }

    essvi_params, essvi_rmse = None, float("nan")
    if essvi:
        from .essvi import calibrate_essvi, essvi_report, essvi_total_variance

        ks = [q[0] for q in slice_quotes]
        ws = [(q[1] ** 2) * q[2] for q in slice_quotes]
        essvi_params, _ = calibrate_essvi(ks, ws, thetas_init=thetas,
                                          n_steps=max(n_steps, 1200),
                                          learning_rate=learning_rate)
        errs = []
        for i, (kq, ivq, tq) in enumerate(slice_quotes):
            w_e = np.asarray(essvi_total_variance(
                jnp.asarray(kq, jnp.float32), essvi_params.theta[i],
                essvi_params.rho[i], essvi_params.psi[i]))
            errs.append(np.sqrt(np.maximum(w_e, 1e-12) / tq) - ivq)
        essvi_rmse = float(np.sqrt(np.mean(np.concatenate(errs) ** 2)))
        rep_e = essvi_report(essvi_params, float(k_all.min()) - 0.2,
                             float(k_all.max()) + 0.2)
        report.update({f"essvi_{k}": v for k, v in rep_e.items()})

    return ChainCalibrationResult(
        expiries=expiries, n_quotes=counts, svi_params=svi_params,
        svi_rmse_vol=rmse, thetas=thetas, ssvi=ssvi, ssvi_rmse_vol=ssvi_rmse,
        report=report, spot=spot, rate=rate,
        slice_quotes=[(q[0], q[1]) for q in slice_quotes],
        essvi=essvi_params, essvi_rmse_vol=essvi_rmse)


def svi_surface_iv_fn(result: ChainCalibrationResult):
    """Smooth-in-(k,T) implied-vol function from the calibrated slices.

    Total variance is linearly interpolated in T between slice fits
    (calendar-monotone when the slices are); before the first expiry w
    scales proportionally to T from zero (w = w_1 * T/T_1), after the last
    it grows linearly (w = w_n * T/T_n) — both keep dw/dT > 0 so the
    Dupire numerator stays positive.  Differentiable in k and (a.e.) in T:
    the exact input :class:`~..models.local_vol.DupireLocalVol` needs.
    """
    expiries = jnp.asarray(result.expiries, jnp.float32)
    params = list(result.svi_params)
    t_lo, t_hi = expiries[0], expiries[-1]

    def w_scalar(k, t):
        w_sl = jnp.stack([svi_total_variance(k, p) for p in params])
        t_c = jnp.clip(t, t_lo, t_hi)
        w_in = jnp.interp(t_c, expiries, w_sl)
        w = jnp.where(t < t_lo, w_sl[0] * t / t_lo,
                      jnp.where(t > t_hi, w_sl[-1] * t / t_hi, w_in))
        return jnp.maximum(w, 1e-10)

    def w_fn(k, t):
        k = jnp.asarray(k, jnp.float32)
        t = jnp.asarray(t, jnp.float32)
        if k.ndim == 0 and t.ndim == 0:
            return w_scalar(k, t)
        kb, tb = jnp.broadcast_arrays(k, t)
        return jax.vmap(w_scalar)(kb.ravel(), tb.ravel()).reshape(kb.shape)

    def iv_fn(k, t):
        return jnp.sqrt(w_fn(k, t) / jnp.maximum(jnp.asarray(t, jnp.float32),
                                                 1e-8))

    return iv_fn


def local_vol_from_chain(chain, *, n_expiry_bins: int = 5,
                         from_prices: bool = False, n_steps: int = 600,
                         n_k: int = 121, n_t: int = 60,
                         result: ChainCalibrationResult | None = None):
    """Market chain -> Dupire local-volatility surface, one call.

    The full pipeline the reference documents across separate modules
    (``data_loader`` -> ``iv_solver`` -> surface fit -> ``local_vol.py``):
    calibrate SVI slices, build the smooth surface function, extract
    sigma_loc(k, T) by AD.  Returns (DupireLocalVol, ChainCalibrationResult);
    exotics priced through it (``local_vol_mc_price``) are consistent with
    the market smile by construction.
    """
    from ..models.local_vol import DupireLocalVol

    if result is None:
        result = calibrate_chain(chain, n_expiry_bins=n_expiry_bins,
                                 from_prices=from_prices, n_steps=n_steps)
    iv_fn = svi_surface_iv_fn(result)
    k_all = np.concatenate([q[0] for q in result.slice_quotes])
    k_pad = 0.1 + 0.15 * (k_all.max() - k_all.min())
    dupire = DupireLocalVol(
        iv_fn, spot=result.spot, rate=result.rate,
        k_range=(float(k_all.min() - k_pad), float(k_all.max() + k_pad)),
        t_range=(max(0.25 * float(result.expiries[0]), 0.01),
                 float(result.expiries[-1])),
        n_k=n_k, n_t=n_t)
    return dupire, result


def calibrate_model_to_chain(chain, model: str = "heston", *,
                             from_prices: bool = False, n_steps: int = 800,
                             max_quotes: int = 400, seed: int = 0,
                             mc_paths: int = 1_000_000,
                             mc_max_dt: float = 0.02) -> dict:
    """Fit a CF model (Heston or Bates) directly to chain option prices.

    The dynamic-model counterpart of :func:`calibrate_chain` (which fits
    static smiles): one scanned-Adam program over the whole quote set via
    ``calibrate_heston`` / ``calibrate_bates``.  Returns fitted params,
    the relative-MSE loss, and price/IV RMSE diagnostics.

    ``model="heston-mc"`` routes to the kernel-speed simulation path
    instead (:func:`~..models.heston.calibrate_heston_mc`): every Adam
    step prices the whole chain AND gets all five parameter gradients
    from ONE fused Pallas launch — use it when the dynamics have no
    affine CF or to validate the semi-analytic fit end-to-end through
    the simulation engine. Quotes are thinned to 12 for the kernel
    (per-quote sensitivity tiles live in VMEM); diagnostics are priced
    with the Lewis engine, so ``price_rmse`` folds in MC + Euler
    discretization error of the fitted params.
    """
    from ..models.black_scholes import bs_price
    from ..models.iv import implied_vol
    from ..types import ContractBatch

    if from_prices or "implied_volatility" not in _as_dataframe(chain).columns:
        if not hasattr(chain, "backfill_implied_vol"):
            from ..data.loader import OptionChainDataset

            chain = OptionChainDataset(chain)
        chain = chain.backfill_implied_vol()
    df = _as_dataframe(chain)
    iv = np.asarray(df["implied_volatility"], np.float64)
    ok = np.isfinite(iv) & (iv > 0.01) & (iv < 3.0)
    df = df.loc[ok]
    if model == "heston-mc":
        max_quotes = min(max_quotes, 12)
    elif model == "rbergomi":
        # one XLA program reprices every quote off a shared path set, so
        # quotes are cheap — the grid (union of expiries) is what scales
        max_quotes = min(max_quotes, 24)
    if len(df) > max_quotes:  # deterministic thinning for the Adam loop
        df = df.iloc[np.linspace(0, len(df) - 1, max_quotes).astype(int)]

    s = np.asarray(df["underlying_price"], np.float64)
    strike = np.asarray(df["strike_price"], np.float64)
    ttm = np.asarray(df["time_to_maturity"], np.float64)
    iv = np.asarray(df["implied_volatility"], np.float64)
    rate = (np.asarray(df["risk_free_rate"], np.float64)
            if "risk_free_rate" in df.columns else np.zeros_like(s))
    cp = (np.where(np.asarray(df["option_type"]).astype(str) == "put",
                   -1.0, 1.0)
          if "option_type" in df.columns else np.ones_like(s))

    batch = ContractBatch.make(spot=s, strike=strike, maturity=ttm,
                               rate=rate, vol=iv, option_type=cp)
    target = (np.asarray(df["option_price"], np.float64)
              if "option_price" in df.columns
              else np.asarray(bs_price(s, strike, ttm, rate, iv, cp, 0.0)))

    if model == "heston":
        from ..models.heston import calibrate_heston

        params, loss = calibrate_heston(target, batch, n_steps=n_steps)
        names = ("v0", "kappa", "theta", "sigma", "rho")
        from ..models.heston import heston_price as price_fn
        fitted = np.asarray(price_fn(batch, params))
    elif model == "bates":
        from ..models.bates import calibrate_bates

        params, loss = calibrate_bates(target, batch, n_steps=n_steps)
        names = ("v0", "kappa", "theta", "sigma", "rho", "lam", "mu_j",
                 "sigma_j")
        from ..models.bates import bates_price as price_fn
        fitted = np.asarray(price_fn(batch, params))
    elif model == "heston-mc":
        import jax

        from ..models.heston import calibrate_heston_mc, heston_price

        # hardware PRNG on chip; counter-hash off-TPU (the interpreter
        # stubs the hardware PRNG with zeros)
        sampler = "prng" if jax.default_backend() == "tpu" else "hash"
        params, loss = calibrate_heston_mc(
            target, strike, ttm, cp, float(np.median(s)),
            float(np.median(rate)), n_steps=min(n_steps, 200),
            n_paths=mc_paths, max_dt=mc_max_dt, seed=seed, sampler=sampler)
        names = ("v0", "kappa", "theta", "sigma", "rho")
        fitted = np.asarray(heston_price(batch, params))
    elif model == "rbergomi":
        import jax

        from ..models.rbergomi import (calibrate_rbergomi,
                                       rbergomi_chain_price)

        n_paths = min(mc_paths, 131_072)
        params, loss = calibrate_rbergomi(
            target, strike, ttm, cp, float(np.median(s)),
            float(np.median(rate)), n_steps=min(n_steps, 300),
            n_paths=n_paths, max_dt=mc_max_dt, seed=seed)
        names = ("hurst", "eta", "rho", "xi0")
        # diagnostics on an INDEPENDENT key: reported RMSE includes the
        # fit's own MC error instead of reusing the calibration noise
        fitted = np.asarray(rbergomi_chain_price(
            strike, ttm, cp, float(np.median(s)), float(np.median(rate)),
            params, jax.random.PRNGKey(seed + 1), n_paths=n_paths,
            max_dt=mc_max_dt))
    else:
        raise ValidationError(
            f"model must be heston|heston-mc|bates|rbergomi, got {model!r}")

    iv_fit = np.asarray(implied_vol(jnp.asarray(fitted, jnp.float32),
                                    jnp.asarray(s, jnp.float32),
                                    jnp.asarray(strike, jnp.float32),
                                    jnp.asarray(ttm, jnp.float32),
                                    jnp.asarray(rate, jnp.float32),
                                    jnp.asarray(cp, jnp.float32)))
    good = np.isfinite(iv_fit)
    return {
        "model": model,
        "params": {n: float(np.asarray(getattr(params, n))) for n in names},
        "loss": float(loss),
        "price_rmse": float(np.sqrt(np.mean((fitted - target) ** 2))),
        "iv_rmse": (float(np.sqrt(np.mean((iv_fit[good] - iv[good]) ** 2)))
                    if good.any() else float("nan")),
        "n_quotes": int(len(df)),
    }


def chain_smile_data(chain, result: ChainCalibrationResult,
                     expiry_index: int, n_fit: int = 101):
    """Quotes the slice was fit to (level-adjusted to the bucket maturity)
    + the fitted SVI curve, for plotting.

    Returns dict with k_market, iv_market, k_fit, iv_fit, expiry."""
    t = float(result.expiries[expiry_index])
    k, iv_adj = result.slice_quotes[expiry_index]
    k_fit = (np.linspace(k.min() - 0.05, k.max() + 0.05, n_fit) if len(k)
             else np.linspace(-0.3, 0.3, n_fit))
    iv_fit = np.asarray(result.svi_vol(k_fit, expiry_index))
    return {"k_market": np.asarray(k), "iv_market": np.asarray(iv_adj),
            "k_fit": k_fit, "iv_fit": iv_fit, "expiry": t}
