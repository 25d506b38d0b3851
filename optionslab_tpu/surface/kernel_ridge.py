"""Kernel-ridge volatility model — the TPU-native answer to the reference's
sklearn SVR (``src/volatility_surface/models/svr_model.py:21``).

Why kernel ridge instead of SVR: the RBF-SVR quadratic program is a host-
bound sequential solver; kernel ridge with the same RBF kernel has a
CLOSED-FORM solve (K + λI)α = y — one Cholesky on the MXU — and predicts
with a single kernel matmul, so both fit and inference run fully on-device
and batch over chains. Accuracy on smooth IV surfaces is equivalent
(both are RBF-kernel regressors; SVR's ε-insensitivity mainly buys
sparsity, not accuracy).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .base import TARGET_COLUMN, VolatilityModelBase, regression_metrics


@functools.partial(jax.jit, static_argnames=())
def _rbf(x1, x2, gamma):
    d2 = jnp.sum(x1 * x1, axis=1)[:, None] + jnp.sum(x2 * x2, axis=1)[None, :] \
        - 2.0 * jnp.matmul(x1, x2.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.exp(-gamma * jnp.maximum(d2, 0.0))


@jax.jit
def _fit(x, y, gamma, alpha_reg):
    k = _rbf(x, x, gamma)
    a = k + alpha_reg * jnp.eye(x.shape[0], dtype=x.dtype)
    # Cholesky solve on the MXU
    chol = jnp.linalg.cholesky(a)
    alpha = jax.scipy.linalg.cho_solve((chol, True), y)
    return alpha


@jax.jit
def _predict(x_train, alpha, x_new, gamma):
    return jnp.matmul(_rbf(x_new, x_train, gamma), alpha,
                      precision=jax.lax.Precision.HIGHEST)


class KernelRidgeModel(VolatilityModelBase):
    """RBF kernel ridge on the 7 engineered features."""

    def __init__(self, gamma: float = 1.0, alpha: float = 1e-3, feature_columns=None,
                 max_train_points: int = 4096, seed: int = 0):
        super().__init__(feature_columns)
        self.gamma = gamma
        self.alpha = alpha
        self.max_train_points = max_train_points
        self.seed = seed
        self._x_train = None
        self._dual = None

    def _train_impl(self, df, **kwargs) -> dict:
        x = self._features_matrix(df, fit_scaler=True)
        y = df[TARGET_COLUMN].to_numpy(dtype=np.float32)
        if x.shape[0] > self.max_train_points:
            rng = np.random.default_rng(self.seed)
            idx = rng.choice(x.shape[0], self.max_train_points, replace=False)
            x, y = x[idx], y[idx]
        self._x_train = jnp.asarray(x)
        self._dual = _fit(self._x_train, jnp.asarray(y), jnp.float32(self.gamma),
                          jnp.float32(self.alpha))
        pred = np.asarray(_predict(self._x_train, self._dual, self._x_train,
                                   jnp.float32(self.gamma)))
        return regression_metrics(y, pred)

    def _predict_impl(self, df) -> np.ndarray:
        x = jnp.asarray(self._features_matrix(df))
        return np.asarray(_predict(self._x_train, self._dual, x, jnp.float32(self.gamma)))

    def _state(self):
        return ({"x_train": self._x_train, "dual": self._dual},
                {"gamma": self.gamma, "alpha": self.alpha})

    def _load_state(self, arrays, meta):
        self._x_train = jnp.asarray(arrays["x_train"])
        self._dual = jnp.asarray(arrays["dual"])
        self.gamma = float(meta["gamma"])
        self.alpha = float(meta["alpha"])


# Back-compat alias matching the reference's model name
SVRModel = KernelRidgeModel
