"""ML pricing surrogate: a JAX MLP predicting (price, delta, gamma).

Reference capabilities covered (SURVEY.md §2.2):
  - ``src/pricing_models/monte_carlo_ml.py:147-508`` — MonteCarloMLSurrogate:
    LightGBM multi-output model trained on VECTORIZED CLOSED-FORM BS targets
    (not MC — the reference generates labels analytically, ``:63-144``),
    feature engineering (moneyness, log-moneyness, √T, T·σ, ``:248``),
    random parameter sampling S,K∈[50,150], T∈[0.05,2], r∈[0.01,0.1],
    σ∈[0.1,0.5], q∈[0,0.03] (``:257``), save/load, R² score.
  - ``monte_carlo_unified.py:692-817`` — MLSurrogate fitted on pricer
    outputs.

TPU-first design: one multi-head MLP trained ON DEVICE with targets from
the fused ``bs_greeks`` launch (labels for a million contracts are one
launch away); inference for any book is one fused forward. The honest-
benchmark claim the reference encodes (``tests/test_ml_vs_mc_benchmark.py``)
carries over: this surrogate only beats direct pricing when the true model
is expensive (Heston calibration loops, exotics) — the companion
``fit_to_pricer`` trains on arbitrary pricer outputs for exactly that case.
"""

from __future__ import annotations

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from ..surface.nn_core import apply_mlp, flatten_params, init_mlp, unflatten_params
from ..utils.exceptions import ModelError
from .black_scholes import bs_greeks

PARAM_RANGES = {  # the reference's training box (monte_carlo_ml.py:257)
    "spot": (50.0, 150.0),
    "strike": (50.0, 150.0),
    "maturity": (0.05, 2.0),
    "rate": (0.01, 0.1),
    "vol": (0.1, 0.5),
    "dividend": (0.0, 0.03),
}

WIDE_PARAM_RANGES = {  # production box: LEAPS maturities + crisis vols
    "spot": (50.0, 150.0),
    "strike": (50.0, 150.0),
    "maturity": (0.02, 5.0),
    "rate": (0.0, 0.12),
    "vol": (0.05, 1.0),
    "dividend": (0.0, 0.06),
}


def sample_contracts(n: int, seed: int = 0, ranges: dict | None = None) -> dict:
    """Random contract parameters over a training box (defaults to the
    reference's)."""
    rng = np.random.default_rng(seed)
    ranges = ranges or PARAM_RANGES
    out = {k: rng.uniform(lo, hi, n).astype(np.float32) for k, (lo, hi) in ranges.items()}
    out["cp"] = rng.choice(np.asarray([1.0, -1.0], np.float32), n)
    return out


SURROGATE_FEATURES = ("moneyness", "log_moneyness", "sqrt_maturity",
                      "maturity_x_vol", "rate", "dividend", "vol", "cp")


def engineer_surrogate_features(p: dict) -> np.ndarray:
    """(n, 8): moneyness, log-moneyness, √T, T·σ, r, q, σ, cp
    (reference feature set, ``monte_carlo_ml.py:248``)."""
    m = p["spot"] / p["strike"]
    return np.stack([
        m,
        np.log(m),
        np.sqrt(p["maturity"]),
        p["maturity"] * p["vol"],
        p["rate"],
        p["dividend"],
        p["vol"],
        p["cp"],
    ], axis=1).astype(np.float32)


PRICE_LOG_EPS = 1e-5  # price head is learned as log(price/K + eps):
# the log target equalizes RELATIVE error across moneyness (deep-OTM prices
# span 4+ decades; a linear head wastes capacity on the ATM scale) — mean
# relative price error drops ~5x for OTM contracts.


def generate_training_data(n: int = 50_000, seed: int = 0,
                           ranges: dict | None = None):
    """(features, targets): targets from closed-form BS in one fused launch —
    (log(price/K + eps), delta, gamma·K)."""
    p = sample_contracts(n, seed, ranges)
    x = engineer_surrogate_features(p)
    g = bs_greeks(p["spot"], p["strike"], p["maturity"], p["rate"], p["vol"],
                  p["cp"], p["dividend"])
    y = np.stack([
        np.log(np.asarray(g["price"]) / p["strike"] + PRICE_LOG_EPS),
        np.asarray(g["delta"]),
        np.asarray(g["gamma"]) * p["strike"],  # scale-free gamma
    ], axis=1).astype(np.float32)
    return x, y, p


class MonteCarloMLSurrogate:
    """Multi-output (price, delta, gamma) surrogate with save/load + R²."""

    N_OUTPUTS = 3

    def __init__(self, hidden_layers=(128, 128), epochs: int = 300,
                 batch_size: int = 1024, learning_rate: float = 1e-3, seed: int = 0,
                 param_ranges: dict | None = None,
                 calibration_quantile: float = 0.9):
        self.hidden_layers = tuple(hidden_layers)
        self.epochs = epochs
        self.batch_size = batch_size
        self.learning_rate = learning_rate
        self.seed = seed
        self.param_ranges = dict(param_ranges or PARAM_RANGES)
        self.calibration_quantile = calibration_quantile
        self.params = None
        self._x_mean = None
        self._x_scale = None
        self._y_mean = np.zeros(self.N_OUTPUTS, np.float32)
        self._y_scale = np.ones(self.N_OUTPUTS, np.float32)
        self._q_resid = np.zeros(self.N_OUTPUTS, np.float32)
        self.history = {}

    # -- training -----------------------------------------------------------
    def fit(self, n_samples: int = 50_000):
        x, y, _ = generate_training_data(n_samples, self.seed, self.param_ranges)
        return self._fit_xy(x, y)

    def fit_to_pricer(self, pricer_fn, n_samples: int = 20_000):
        """Train on an arbitrary pricer's outputs (reference MLSurrogate,
        ``monte_carlo_unified.py:692``): ``pricer_fn(params dict) ->
        (n, 3) [price/K, delta, gamma·K]`` (the price column is transformed
        to the log target internally)."""
        p = sample_contracts(n_samples, self.seed, self.param_ranges)
        x = engineer_surrogate_features(p)
        y = np.asarray(pricer_fn(p), np.float32).copy()
        y[:, 0] = np.log(np.maximum(y[:, 0], 0.0) + PRICE_LOG_EPS)
        return self._fit_xy(x, y)

    def _fit_xy(self, x, y):
        # split-conformal calibration: hold out 10% the net never trains on
        n_cal = max(1, x.shape[0] // 10)
        rng = np.random.default_rng(self.seed + 1)
        perm = rng.permutation(x.shape[0])
        cal_idx, fit_idx = perm[:n_cal], perm[n_cal:]
        x_cal, y_cal = x[cal_idx], y[cal_idx]
        x, y = x[fit_idx], y[fit_idx]
        self._x_mean = x.mean(axis=0)
        self._x_scale = np.where(x.std(axis=0) < 1e-12, 1.0, x.std(axis=0))
        xs = (x - self._x_mean) / self._x_scale
        # per-head target standardization: without it the widest-scaled head
        # dominates the joint MSE and starves the others
        self._y_mean = y.mean(axis=0)
        self._y_scale = np.where(y.std(axis=0) < 1e-12, 1.0, y.std(axis=0))
        ys = (y - self._y_mean) / self._y_scale
        key = jax.random.PRNGKey(self.seed)
        params = init_mlp(key, [x.shape[1], *self.hidden_layers, self.N_OUTPUTS])
        self.params, self.history = _train_multi(params, xs, ys, key,
                                                 epochs=self.epochs,
                                                 batch_size=self.batch_size,
                                                 learning_rate=self.learning_rate)
        # distribution-free uncertainty: per-head |residual| quantile on the
        # held-out set — predict() bands then cover with >= the requested
        # probability for exchangeable inputs (split conformal)
        resid = np.abs(self._forward(x_cal) - y_cal)
        self._q_resid = np.quantile(resid, self.calibration_quantile,
                                    axis=0).astype(np.float32)
        return self.score_xy(x, y)

    # -- inference ----------------------------------------------------------
    def _forward(self, x: np.ndarray) -> np.ndarray:
        if self.params is None:
            raise ModelError("surrogate not fitted")
        xs = (x - self._x_mean) / self._x_scale
        raw = np.asarray(apply_mlp(self.params, jnp.asarray(xs)))
        return raw * self._y_scale + self._y_mean

    def predict(self, S, K, T, r, sigma, option_type="call", q=0.0,
                return_uncertainty: bool = False) -> dict:
        """Batched (price, delta, gamma) in one forward.

        ``return_uncertainty=True`` adds conformal bands
        (``price_lo/price_hi/delta_err/gamma_err``): per-head held-out
        |residual| quantiles at ``calibration_quantile`` coverage —
        distribution-free, no MC-dropout sampling cost."""
        S, K, T, r, sigma = map(lambda a: np.asarray(a, np.float32).ravel(), (S, K, T, r, sigma))
        n = max(map(len, (S, K, T, r, sigma)))
        broad = lambda a: np.broadcast_to(a, (n,)).astype(np.float32)
        cp = np.full(n, 1.0 if str(option_type).lower().startswith("c") else -1.0, np.float32)
        p = {"spot": broad(S), "strike": broad(K), "maturity": broad(T),
             "rate": broad(r), "vol": broad(sigma),
             "dividend": broad(np.asarray(q, np.float32)), "cp": cp}
        out = self._forward(engineer_surrogate_features(p))
        to_price = lambda v: np.maximum(np.exp(v) - PRICE_LOG_EPS, 0.0) * p["strike"]
        result = {
            "price": to_price(out[:, 0]),
            "delta": out[:, 1],
            "gamma": out[:, 2] / p["strike"],
        }
        if return_uncertainty:
            q0, q1, q2 = self._q_resid
            result["price_lo"] = to_price(out[:, 0] - q0)
            result["price_hi"] = to_price(out[:, 0] + q0)
            result["delta_err"] = np.full(n, float(q1), np.float32)
            result["gamma_err"] = np.full(n, float(q2), np.float32) / p["strike"]
        return result

    def predict_single(self, S, K, T, r, sigma, option_type="call", q=0.0) -> dict:
        out = self.predict([S], [K], [T], [r], [sigma], option_type, q)
        return {k: float(v[0]) for k, v in out.items()}

    # -- evaluation ---------------------------------------------------------
    def score_xy(self, x, y) -> dict:
        pred = self._forward(x)
        r2 = []
        for j in range(self.N_OUTPUTS):
            ss_res = float(np.sum((pred[:, j] - y[:, j]) ** 2))
            ss_tot = float(np.sum((y[:, j] - y[:, j].mean()) ** 2))
            r2.append(1.0 - ss_res / max(ss_tot, 1e-12))
        return {"r2_price": r2[0], "r2_delta": r2[1], "r2_gamma": r2[2]}

    def score(self, n_samples: int = 10_000, seed: int = 123) -> dict:
        x, y, _ = generate_training_data(n_samples, seed)
        return self.score_xy(x, y)

    # -- persistence --------------------------------------------------------
    def save(self, path):
        if self.params is None:
            raise ModelError("cannot save an unfitted surrogate")
        path = pathlib.Path(path)
        path.mkdir(parents=True, exist_ok=True)
        arrays = flatten_params(self.params)
        arrays["x_mean"] = self._x_mean
        arrays["x_scale"] = self._x_scale
        arrays["y_mean"] = self._y_mean
        arrays["y_scale"] = self._y_scale
        arrays["q_resid"] = self._q_resid
        np.savez(path / "arrays.npz", **arrays)
        (path / "meta.json").write_text(json.dumps({
            "hidden_layers": list(self.hidden_layers), "seed": self.seed,
            "param_ranges": {k: list(v) for k, v in self.param_ranges.items()},
            "calibration_quantile": self.calibration_quantile}))

    def export_onnx(self, path, atol: float = 2e-4) -> dict:
        """Emit the fitted surrogate as a real ``.onnx`` artifact: the
        whole standardized pipeline ``(x-μ)/σ -> MLP -> ·y_scale + y_mean``
        in-graph, parity-checked against ``_forward`` at export time
        (reference ONNX deployment of the ML surrogate:
        ``src/optimization/onnx_exporter.py:67``). Output heads are the
        INTERNAL targets ``[log(price/K + eps), delta, gamma·K]`` — the
        same raw heads ``predict`` post-processes."""
        if self.params is None:
            raise ModelError("cannot export an unfitted surrogate")
        from ..optimize.onnx_emit import OnnxLiteRuntime, export_mlp_onnx

        manifest = export_mlp_onnx(
            self.params, path,
            mean=np.asarray(self._x_mean, np.float32),
            scale=np.asarray(self._x_scale, np.float32),
            layernorm=True,
            out_scale=np.asarray(self._y_scale, np.float32),
            out_mean=np.asarray(self._y_mean, np.float32),
            metadata={"model": type(self).__name__,
                      "heads": ["log_price_over_strike", "delta",
                                "gamma_times_strike"],
                      "features": list(SURROGATE_FEATURES)},
            doc="MonteCarloMLSurrogate raw heads (scalers folded in)")
        p = sample_contracts(64, self.seed + 7, self.param_ranges)
        x = engineer_surrogate_features(p)
        err = float(np.max(np.abs(
            self._forward(x) - OnnxLiteRuntime(path).predict(x))))
        if err > atol:
            raise ModelError(f"surrogate onnx export failed parity: "
                             f"max|err|={err:.3e} > {atol}")
        manifest["roundtrip_max_abs_err"] = err
        return manifest

    def load(self, path):
        path = pathlib.Path(path)
        meta = json.loads((path / "meta.json").read_text())
        arrays = dict(np.load(path / "arrays.npz"))
        self._x_mean = arrays.pop("x_mean")
        self._x_scale = arrays.pop("x_scale")
        self._y_mean = arrays.pop("y_mean", np.zeros(self.N_OUTPUTS, np.float32))
        self._y_scale = arrays.pop("y_scale", np.ones(self.N_OUTPUTS, np.float32))
        self._q_resid = arrays.pop("q_resid", np.zeros(self.N_OUTPUTS, np.float32))
        self.hidden_layers = tuple(int(h) for h in meta["hidden_layers"])
        self.param_ranges = {k: tuple(v) for k, v in meta.get(
            "param_ranges", {k: list(v) for k, v in PARAM_RANGES.items()}).items()}
        self.calibration_quantile = meta.get("calibration_quantile", 0.9)
        self.params = unflatten_params(arrays)
        return self


def _train_multi(params, x, y, key, *, epochs, batch_size, learning_rate):
    """Multi-output MSE training loop (one jitted scan per epoch)."""
    import optax

    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n = x.shape[0]
    batch_size = min(batch_size, n)
    n_batches = max(1, n // batch_size)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(learning_rate))
    opt_state = opt.init(params)

    @jax.jit
    def epoch_fn(p, s, ek):
        perm = jax.random.permutation(ek, n)
        xs, ys = x[perm], y[perm]

        def body(carry, i):
            p, s = carry
            xb = jax.lax.dynamic_slice_in_dim(xs, i * batch_size, batch_size)
            yb = jax.lax.dynamic_slice_in_dim(ys, i * batch_size, batch_size)
            loss, g = jax.value_and_grad(
                lambda pp: jnp.mean((apply_mlp(pp, xb) - yb) ** 2))(p)
            u, s = opt.update(g, s, p)
            return (optax.apply_updates(p, u), s), loss

        (p, s), losses = jax.lax.scan(body, (p, s), jnp.arange(n_batches))
        return p, s, losses.mean()

    history = {"loss": []}
    for e in range(epochs):
        params, opt_state, loss = epoch_fn(params, opt_state, jax.random.fold_in(key, e))
        history["loss"].append(float(loss))
    return params, history
