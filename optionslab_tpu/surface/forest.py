"""Tree-ensemble volatility models.

Reference capabilities covered (SURVEY.md §2.4):
  - ``random_forest.py:20`` — sklearn RandomForestRegressor(100 trees, d10)
  - ``xgboost_model.py:30`` — XGBRegressor with early stopping

Trees are host-side sequential algorithms with no TPU-native win in
training; the reference itself uses sklearn. Here RandomForest wraps
sklearn directly, and the gradient-boosting slot uses sklearn's
HistGradientBoostingRegressor (the same histogram algorithm family as
XGBoost/LightGBM; xgboost is not in this environment). PREDICTION for
both can be exported to a pure-JAX form via the benchmark's unified
wrapper when needed; persistence uses the base-class npz layout.
"""

from __future__ import annotations

import io
import pickle

import numpy as np

from ..utils.config import SKLEARN_AVAILABLE
from ..utils.exceptions import DependencyError
from .base import TARGET_COLUMN, VolatilityModelBase, regression_metrics


def _require_sklearn():
    if not SKLEARN_AVAILABLE:
        raise DependencyError("scikit-learn is required for tree-ensemble models")


class _SklearnVolModel(VolatilityModelBase):
    """Shared plumbing for sklearn-estimator-backed models."""

    def _make_estimator(self):  # pragma: no cover - overridden
        raise NotImplementedError

    def _train_impl(self, df, **kwargs) -> dict:
        _require_sklearn()
        x = self._features_matrix(df, fit_scaler=True)
        y = df[TARGET_COLUMN].to_numpy(dtype=np.float64)
        self.estimator = self._make_estimator()
        self.estimator.fit(x, y)
        return regression_metrics(y, self.estimator.predict(x))

    def _predict_impl(self, df) -> np.ndarray:
        return np.asarray(self.estimator.predict(self._features_matrix(df)))

    def _state(self):
        buf = io.BytesIO()
        pickle.dump(self.estimator, buf)
        payload = np.frombuffer(buf.getvalue(), dtype=np.uint8)
        return {"estimator_pickle": payload}, {"params": self.get_params()}

    def _load_state(self, arrays, meta):
        self.estimator = pickle.loads(arrays["estimator_pickle"].tobytes())

    def get_params(self) -> dict:
        return {}


class RandomForestVolatilityModel(_SklearnVolModel):
    """Reference: ``random_forest.py:20`` (100 trees, depth 10)."""

    def __init__(self, n_estimators: int = 100, max_depth: int = 10, seed: int = 0,
                 feature_columns=None):
        super().__init__(feature_columns)
        self.n_estimators = n_estimators
        self.max_depth = max_depth
        self.seed = seed

    def _make_estimator(self):
        from sklearn.ensemble import RandomForestRegressor

        return RandomForestRegressor(
            n_estimators=self.n_estimators, max_depth=self.max_depth,
            random_state=self.seed, n_jobs=-1,
        )

    def get_params(self):
        return {"n_estimators": self.n_estimators, "max_depth": self.max_depth}

    def feature_importances(self) -> dict:
        return dict(zip(self.feature_columns, self.estimator.feature_importances_))


class GradientBoostingVolatilityModel(_SklearnVolModel):
    """XGBoost-slot model (reference: ``xgboost_model.py:30``) on sklearn's
    histogram gradient booster with early stopping."""

    def __init__(self, max_iter: int = 300, learning_rate: float = 0.08,
                 max_depth: int = 6, early_stopping: bool = True, seed: int = 0,
                 feature_columns=None):
        super().__init__(feature_columns)
        self.max_iter = max_iter
        self.learning_rate = learning_rate
        self.max_depth = max_depth
        self.early_stopping = early_stopping
        self.seed = seed

    def _make_estimator(self):
        from sklearn.ensemble import HistGradientBoostingRegressor

        return HistGradientBoostingRegressor(
            max_iter=self.max_iter, learning_rate=self.learning_rate,
            max_depth=self.max_depth, early_stopping=self.early_stopping,
            random_state=self.seed,
        )

    def get_params(self):
        return {"max_iter": self.max_iter, "learning_rate": self.learning_rate,
                "max_depth": self.max_depth}


# alias for reference-name parity
XGBVolatilityModel = GradientBoostingVolatilityModel
