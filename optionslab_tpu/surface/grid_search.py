"""Hyperparameter grid search + nested CV for surface models.

Reference capabilities covered (SURVEY.md §2.4, ``src/volatility_surface/
utils/grid_search.py``): ``tune_model`` over a param grid (``:51``) and
``nested_cross_validate`` (``:163``) for VolatilityModelBase subclasses.
"""

from __future__ import annotations

import itertools

import numpy as np

from ..utils.logging import get_logger
from .base import TARGET_COLUMN, regression_metrics

logger = get_logger(__name__)


def _param_combos(grid: dict):
    keys = list(grid)
    for combo in itertools.product(*(grid[k] for k in keys)):
        yield dict(zip(keys, combo))


def _kfold_indices(n: int, k: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    idx = rng.permutation(n)
    folds = np.array_split(idx, k)
    for i in range(k):
        val = folds[i]
        train = np.concatenate([folds[j] for j in range(k) if j != i])
        yield train, val


def tune_model(model_cls, df, param_grid: dict, n_folds: int = 3, metric: str = "rmse",
               seed: int = 0, **fixed_kwargs):
    """Exhaustive grid search with k-fold CV. Returns
    (best_params, best_score, results list)."""
    results = []
    n = len(df)
    best_params, best_score = None, float("inf")
    for params in _param_combos(param_grid):
        scores = []
        for train_idx, val_idx in _kfold_indices(n, n_folds, seed):
            model = model_cls(**{**fixed_kwargs, **params})
            model.train(df.iloc[train_idx].reset_index(drop=True))
            m = model.evaluate(df.iloc[val_idx].reset_index(drop=True))
            scores.append(m[metric])
        mean_score = float(np.mean(scores))
        results.append({"params": params, metric: mean_score, "scores": scores})
        logger.info("grid point %s -> %s=%.6f", params, metric, mean_score)
        if mean_score < best_score:
            best_score, best_params = mean_score, params
    return best_params, best_score, results


def nested_cross_validate(model_cls, df, param_grid: dict, outer_folds: int = 3,
                          inner_folds: int = 2, metric: str = "rmse", seed: int = 0,
                          **fixed_kwargs):
    """Unbiased generalization estimate: inner grid search per outer fold."""
    n = len(df)
    outer_scores = []
    for train_idx, test_idx in _kfold_indices(n, outer_folds, seed):
        inner_df = df.iloc[train_idx].reset_index(drop=True)
        best_params, _, _ = tune_model(model_cls, inner_df, param_grid,
                                       n_folds=inner_folds, metric=metric,
                                       seed=seed + 1, **fixed_kwargs)
        model = model_cls(**{**fixed_kwargs, **best_params})
        model.train(inner_df)
        pred = model.predict_volatility(df.iloc[test_idx].reset_index(drop=True))
        m = regression_metrics(df.iloc[test_idx][TARGET_COLUMN].to_numpy(), pred)
        outer_scores.append({"params": best_params, **m})
    return outer_scores
