"""Vol-surface benchmark harness: error / speed / stability across models.

Reference capabilities covered (SURVEY.md §2.9, ``src/benchmarks/
vol_surface_benchmark.py``):
  - model registry of unified ``calibrate/predict/get_params`` wrappers
    (SVI ``:166``, SABR ``:203``, MLP ``:246``, RF ``:297``, PINN ``:345``)
  - ``ErrorMetrics``: RMSE/MAE/MAPE/max, ATM (|k|<0.05) and wing (|k|>0.2)
    splits, term-structure error (``:31-51``)
  - ``SpeedMetrics``: calibration ms, prediction ms, smiles/s (``:55-69``)
  - ``StabilityMetrics``: parameter CV across trials, arbitrage-free %,
    convergence % (``:73-87``)
  - ``run(data, n_trials)`` + results table + best-model pick (``:478,117``)

Plus the paper's **EPP (exploitable profit proxy)** metric: discounted
butterfly-violation mass convertible into riskless P&L, computed on the
dense predicted surface (reference paper §EPP, <50 ms for 800 strikes —
here it is one fused jnp expression).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import numpy as np

import jax

from ..surface.arbitrage import butterfly_check
from ..utils.logging import get_logger

logger = get_logger(__name__)


# ---------------------------------------------------------------------------
# Metric dataclasses
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class ErrorMetrics:
    rmse: float
    mae: float
    mape: float
    max_error: float
    atm_rmse: float
    wing_rmse: float
    term_rmse: float

    @classmethod
    def from_predictions(cls, k, t, pred, truth):
        k = np.asarray(k).ravel()
        pred = np.asarray(pred).ravel()
        truth = np.asarray(truth).ravel()
        err = pred - truth
        atm = np.abs(k) < 0.05
        wing = np.abs(k) > 0.2

        def rmse(mask):
            return float(np.sqrt(np.mean(err[mask] ** 2))) if mask.any() else float("nan")

        # term-structure error: per-maturity mean-IV error
        t = np.asarray(t).ravel()
        term_err = []
        for tv in np.unique(t):
            m = t == tv
            term_err.append(pred[m].mean() - truth[m].mean())
        return cls(
            rmse=float(np.sqrt(np.mean(err**2))),
            mae=float(np.mean(np.abs(err))),
            mape=float(np.mean(np.abs(err) / np.maximum(truth, 1e-12))) * 100.0,
            max_error=float(np.max(np.abs(err))),
            atm_rmse=rmse(atm),
            wing_rmse=rmse(wing),
            term_rmse=float(np.sqrt(np.mean(np.asarray(term_err) ** 2))),
        )


@dataclasses.dataclass
class SpeedMetrics:
    calibration_ms: float
    prediction_ms: float
    smiles_per_second: float
    # best-of-trials ≈ steady-state (jit cache warm); the mean includes
    # any first-call compile. A desk recalibrating all day pays the warm
    # number — both are reported.
    calibration_warm_ms: float = 0.0
    prediction_warm_ms: float = 0.0


@dataclasses.dataclass
class StabilityMetrics:
    param_cv: float  # mean coefficient of variation of fitted params
    arb_free_pct: float
    convergence_pct: float


@dataclasses.dataclass
class BenchmarkEntry:
    model: str
    error: ErrorMetrics
    speed: SpeedMetrics
    stability: StabilityMetrics
    epp_bps: float


# ---------------------------------------------------------------------------
# EPP — exploitable profit proxy from butterfly violations
# ---------------------------------------------------------------------------
def compute_epp(log_strikes, total_variance, maturity) -> float:
    """Basis-point measure of the arbitrage a predicted smile leaks: the
    integrated magnitude of negative Gatheral density g(k)<0, scaled by
    vega mass. 0 for an arbitrage-free smile."""
    g, mask = butterfly_check(log_strikes, total_variance)
    g = np.asarray(g)
    k = np.asarray(log_strikes)[1:-1]
    neg = np.where(np.asarray(mask), -g, 0.0)
    if neg.size < 2:
        return 0.0
    epp = np.trapezoid(neg, k)
    del maturity
    return float(epp * 1e4)  # bps


def surface_epp(log_strikes, maturities, iv_grid) -> float:
    """Mean EPP across maturity slices."""
    t = np.asarray(maturities).reshape(-1, 1)
    w = np.asarray(iv_grid) ** 2 * t
    return float(np.mean([
        compute_epp(log_strikes, w[i], t[i, 0]) for i in range(w.shape[0])
    ]))


# ---------------------------------------------------------------------------
# Model wrappers — unified calibrate/predict/get_params
# ---------------------------------------------------------------------------
class SVIWrapper:
    name = "svi"

    def __init__(self, n_steps: int = 600):
        self.n_steps = n_steps

    def calibrate(self, k, vols, t, seed=0):
        from ..surface.svi import calibrate_svi

        self.t = float(np.mean(t))
        self.params, loss = calibrate_svi(k, vols=vols, maturity=self.t,
                                          n_steps=self.n_steps)
        return loss

    def predict(self, k, t=None):
        from ..surface.svi import svi_implied_vol

        return np.asarray(svi_implied_vol(np.asarray(k), self.t, self.params))

    def get_params(self) -> np.ndarray:
        return np.asarray([float(self.params.a), float(self.params.b),
                           float(self.params.rho), float(self.params.m),
                           float(self.params.sigma)])


class SABRWrapper:
    name = "sabr"

    def __init__(self, beta: float = 0.5, n_steps: int = 400):
        self.beta = beta
        self.n_steps = n_steps

    def calibrate(self, k, vols, t, seed=0):
        from ..models.sabr import calibrate_sabr

        self.t = float(np.mean(t))
        self.forward = 100.0
        strikes = self.forward * np.exp(np.asarray(k))
        self.params, loss = calibrate_sabr(self.forward, strikes, self.t, vols,
                                           beta=self.beta, n_steps=self.n_steps)
        return loss

    def predict(self, k, t=None):
        from ..models.sabr import sabr_implied_vol

        strikes = self.forward * np.exp(np.asarray(k))
        return np.asarray(sabr_implied_vol(self.forward, strikes, self.t, self.params))

    def get_params(self) -> np.ndarray:
        return np.asarray([float(self.params.alpha), float(self.params.rho),
                           float(self.params.nu)])


class SSVIWrapper:
    """Single-slice SSVI fit (θ taken from the observed ATM variance)."""

    name = "ssvi"

    def __init__(self, n_steps: int = 500):
        self.n_steps = n_steps

    def calibrate(self, k, vols, t, seed=0):
        from ..surface.svi import calibrate_ssvi

        k = np.asarray(k)
        vols = np.asarray(vols)
        self.t = float(np.mean(t))
        atm_idx = int(np.argmin(np.abs(k)))
        self.theta = float(vols[atm_idx] ** 2 * self.t)
        w = (vols**2 * self.t)[None, :]
        self.params, loss = calibrate_ssvi(k[None, :], np.asarray([self.theta]), w,
                                           n_steps=self.n_steps)
        return loss

    def predict(self, k, t=None):
        from ..surface.svi import ssvi_implied_vol

        return np.asarray(ssvi_implied_vol(np.asarray(k), self.theta, self.t, self.params))

    def get_params(self) -> np.ndarray:
        return np.asarray([float(self.params.rho), float(self.params.eta),
                           float(self.params.gamma)])


class _FeatureModelWrapper:
    """Adapts VolatilityModelBase subclasses to smile calibration."""

    model_cls = None
    model_kwargs: dict = {}

    def _frame(self, k, vols, t):
        import pandas as pd

        k = np.asarray(k)
        df = pd.DataFrame({
            "underlying_price": 100.0,
            "strike_price": 100.0 * np.exp(-k),
            "time_to_maturity": t if np.ndim(t) else np.full(k.size, t),
            "risk_free_rate": 0.03,
            "historical_volatility": 0.2,
        })
        if vols is not None:
            df["implied_volatility"] = np.asarray(vols)
        from ..surface.features import engineer_features

        return engineer_features(df)

    def calibrate(self, k, vols, t, seed=0):
        self.t = t
        self.model = self.model_cls(seed=seed, **self.model_kwargs)
        metrics = self.model.train(self._frame(k, vols, t))
        return metrics["rmse"]

    def predict(self, k, t=None):
        return self.model.predict_volatility(self._frame(k, None, t if t is not None else self.t))

    def get_params(self) -> np.ndarray:
        return np.asarray([])  # nonparametric


class MLPWrapper(_FeatureModelWrapper):
    name = "mlp"

    def __init__(self, epochs: int = 2000):
        from ..surface.mlp import MLPModel

        # scanned trainer: 2000 full-batch epochs are one cached device
        # program (~tens of ms warm); dropout off for a 1-smile fit
        self.model_cls = MLPModel
        self.model_kwargs = {"hidden_layers": (32, 16), "epochs": epochs,
                             "dropout_rate": 0.02}


class KernelRidgeWrapper(_FeatureModelWrapper):
    name = "kernel_ridge"

    def __init__(self):
        from ..surface.kernel_ridge import KernelRidgeModel

        self.model_cls = KernelRidgeModel
        self.model_kwargs = {"gamma": 0.7, "alpha": 1e-4}


class RandomForestWrapper(_FeatureModelWrapper):
    name = "random_forest"

    def __init__(self):
        from ..surface.forest import RandomForestVolatilityModel

        self.model_cls = RandomForestVolatilityModel
        self.model_kwargs = {"n_estimators": 50}


class PINNWrapper:
    name = "pinn"

    def __init__(self, epochs: int = 1200):
        self.epochs = epochs

    def calibrate(self, k, vols, t, seed=0):
        import pandas as pd

        from ..surface.pinn import PINNVolatilityModel

        self.t = t
        df = pd.DataFrame({
            "log_moneyness": np.asarray(k),
            "time_to_maturity": t if np.ndim(t) else np.full(np.asarray(k).size, t),
            "implied_volatility": np.asarray(vols),
        })
        self.model = PINNVolatilityModel(hidden_layers=(64, 64),
                                         n_collocation=256,
                                         epochs=self.epochs, seed=seed)
        metrics = self.model.train(df)
        return metrics["rmse"]

    def predict(self, k, t=None):
        import pandas as pd

        tt = t if t is not None else self.t
        df = pd.DataFrame({
            "log_moneyness": np.asarray(k),
            "time_to_maturity": tt if np.ndim(tt) else np.full(np.asarray(k).size, tt),
        })
        return self.model.predict_volatility(df)

    def get_params(self) -> np.ndarray:
        return np.asarray([])


class ESSVIWrapper:
    """Single-slice eSSVI (theta, rho, psi) — butterfly-arb-free by
    construction of the penalty/parameterization (surface/essvi.py)."""

    name = "essvi"

    def __init__(self, n_steps: int = 800):
        self.n_steps = n_steps

    def calibrate(self, k, vols, t, seed=0):
        from ..surface.essvi import calibrate_essvi

        self.t = float(np.mean(t))
        w = np.asarray(vols, np.float64) ** 2 * self.t
        self.params, loss = calibrate_essvi([np.asarray(k)], [w],
                                            n_steps=self.n_steps)
        return loss

    def predict(self, k, t=None):
        from ..surface.essvi import essvi_total_variance

        w = np.asarray(essvi_total_variance(
            np.asarray(k, np.float32), self.params.theta[0],
            self.params.rho[0], self.params.psi[0]))
        return np.sqrt(np.maximum(w, 1e-12) / self.t)

    def get_params(self) -> np.ndarray:
        return np.asarray([float(self.params.theta[0]),
                           float(self.params.rho[0]),
                           float(self.params.psi[0])])


DEFAULT_WRAPPERS: dict[str, Callable] = {
    "svi": SVIWrapper,
    "ssvi": SSVIWrapper,
    "essvi": ESSVIWrapper,
    "sabr": SABRWrapper,
    "mlp": MLPWrapper,
    "kernel_ridge": KernelRidgeWrapper,
    "random_forest": RandomForestWrapper,
    "pinn": PINNWrapper,
}


# ---------------------------------------------------------------------------
# Harness
# ---------------------------------------------------------------------------
class VolSurfaceBenchmark:
    def __init__(self, models: list[str] | None = None, wrappers: dict | None = None):
        registry = wrappers or DEFAULT_WRAPPERS
        names = models or list(registry)
        unknown = [n for n in names if n not in registry]
        if unknown:
            raise ValueError(f"unknown benchmark models {unknown}; have {list(registry)}")
        self.factories = {n: registry[n] for n in names}
        self.entries: list[BenchmarkEntry] = []

    def run(self, log_strikes, vols, maturity, n_trials: int = 3,
            truth_fn: Callable | None = None) -> "VolSurfaceBenchmark":
        """Benchmark every model on one smile: fit quality vs (optionally)
        a noiseless truth function, timings, stability across reseeded
        trials, arbitrage-freeness, EPP."""
        k = np.asarray(log_strikes)
        vols = np.asarray(vols)
        k_dense = np.linspace(k.min(), k.max(), 101)
        truth_dense = truth_fn(k_dense) if truth_fn else None

        for name, factory in self.factories.items():
            logger.info("benchmarking %s", name)
            params_across, cal_times, pred_times, converged = [], [], [], 0
            wrapper = None
            for trial in range(n_trials):
                wrapper = factory()
                t0 = time.perf_counter()
                try:
                    wrapper.calibrate(k, vols, maturity, seed=trial)
                    converged += 1
                except Exception as e:
                    logger.warning("%s trial %d failed: %s", name, trial, e)
                    continue
                cal_times.append((time.perf_counter() - t0) * 1e3)
                t0 = time.perf_counter()
                pred = np.asarray(jax.block_until_ready(wrapper.predict(k_dense)))
                pred_times.append((time.perf_counter() - t0) * 1e3)
                p = wrapper.get_params()
                if p.size:
                    params_across.append(p)
            if wrapper is None or not cal_times:
                continue

            pred_fit = np.asarray(wrapper.predict(k)).ravel()
            target = truth_fn(k) if truth_fn else vols
            error = ErrorMetrics.from_predictions(
                k, np.full(k.size, np.mean(maturity)), pred_fit, target)
            if truth_dense is not None:
                dense_pred = np.asarray(wrapper.predict(k_dense)).ravel()
                error = ErrorMetrics.from_predictions(
                    k_dense, np.full(k_dense.size, np.mean(maturity)),
                    dense_pred, truth_dense)

            pred_dense = np.asarray(wrapper.predict(k_dense)).ravel()
            w_dense = pred_dense**2 * np.mean(maturity)
            _, bf_mask = butterfly_check(k_dense, w_dense)
            arb_free = 100.0 * (1.0 - float(np.mean(np.asarray(bf_mask))))
            epp = compute_epp(k_dense, w_dense, np.mean(maturity))

            if params_across and len(params_across) > 1:
                pa = np.stack(params_across)
                cv = np.abs(pa.std(axis=0) / np.maximum(np.abs(pa.mean(axis=0)), 1e-12))
                param_cv = float(cv.mean())
            else:
                param_cv = 0.0

            self.entries.append(BenchmarkEntry(
                model=name,
                error=error,
                speed=SpeedMetrics(
                    calibration_ms=float(np.mean(cal_times)),
                    prediction_ms=float(np.mean(pred_times)),
                    smiles_per_second=1e3 / float(np.mean(pred_times)),
                    calibration_warm_ms=float(np.min(cal_times)),
                    prediction_warm_ms=float(np.min(pred_times)),
                ),
                stability=StabilityMetrics(
                    param_cv=param_cv,
                    arb_free_pct=arb_free,
                    convergence_pct=100.0 * converged / n_trials,
                ),
                epp_bps=epp,
            ))
        return self

    def to_dataframe(self):
        import pandas as pd

        rows = []
        for e in self.entries:
            rows.append({
                "model": e.model,
                "rmse_bps": e.error.rmse * 1e4,
                "mae_bps": e.error.mae * 1e4,
                "atm_rmse_bps": e.error.atm_rmse * 1e4,
                "wing_rmse_bps": e.error.wing_rmse * 1e4,
                "calibration_ms": e.speed.calibration_ms,
                "calibration_warm_ms": e.speed.calibration_warm_ms,
                "prediction_ms": e.speed.prediction_ms,
                "prediction_warm_ms": e.speed.prediction_warm_ms,
                "arb_free_pct": e.stability.arb_free_pct,
                "convergence_pct": e.stability.convergence_pct,
                "param_cv": e.stability.param_cv,
                "epp_bps": e.epp_bps,
            })
        return pd.DataFrame(rows)

    def best_model(self, metric: str = "rmse_bps") -> str:
        df = self.to_dataframe()
        if df.empty:
            raise ValueError("no successful benchmark entries")
        return str(df.sort_values(metric).iloc[0]["model"])
