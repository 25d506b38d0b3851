"""Objective factories for hyperparameter studies.

Reference capabilities covered (SURVEY.md §2.7, ``src/optimization/
objectives.py:31-297``): objective factories with CV + pruning hooks for
the tree model, generic estimators, and the MLP; metric dispatch.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from ..utils.exceptions import ValidationError
from .reproducibility import seeded_kfold
from .search import TrialPruned

METRICS = {
    "rmse": lambda y, p: float(np.sqrt(np.mean((p - y) ** 2))),
    "mae": lambda y, p: float(np.mean(np.abs(p - y))),
    "mape": lambda y, p: float(np.mean(np.abs(p - y) / np.maximum(np.abs(y), 1e-12))),
}


def get_metric(name: str) -> Callable:
    if name not in METRICS:
        raise ValidationError(f"unknown metric {name!r}; choose {list(METRICS)}")
    return METRICS[name]


def make_surface_model_objective(model_cls, space, df, n_folds: int = 3,
                                 metric: str = "rmse", prune: bool = True,
                                 **fixed_kwargs) -> Callable:
    """CV objective over any VolatilityModelBase subclass; reports per-fold
    scores for the pruner."""
    score = get_metric(metric)
    target = df["implied_volatility"].to_numpy()

    def objective(trial, trial_seed) -> float:
        params = space.suggest(trial)
        space.validate(params)
        fold_scores = []
        for fold, (tr_idx, va_idx) in enumerate(seeded_kfold(len(df), n_folds, trial_seed)):
            model = model_cls(**{**fixed_kwargs, **params, "seed": int(trial_seed % 2**31)})
            model.train(df.iloc[tr_idx].reset_index(drop=True))
            pred = model.predict_volatility(df.iloc[va_idx].reset_index(drop=True))
            fold_scores.append(score(target[va_idx], pred))
            trial.report(float(np.mean(fold_scores)), fold)
            if prune and trial.should_prune():
                raise TrialPruned()
        return float(np.mean(fold_scores))

    return objective


def make_surrogate_objective(space, n_train: int = 20_000, n_eval: int = 5_000) -> Callable:
    """Objective for the MC ML surrogate: price-head RMSE on held-out
    contracts (reference: ``objectives.py:31`` LightGBM factory)."""
    from ..models.surrogate import MonteCarloMLSurrogate, generate_training_data

    x_eval, y_eval, _ = generate_training_data(n_eval, seed=987)

    def objective(trial, trial_seed) -> float:
        params = space.suggest(trial)
        space.validate(params)
        model = MonteCarloMLSurrogate(seed=int(trial_seed % 2**31), **params)
        model.fit(n_samples=n_train)
        pred = model._forward(x_eval)
        return float(np.sqrt(np.mean((pred[:, 0] - y_eval[:, 0]) ** 2)))

    return objective


def make_calibration_objective(pricer_builder, market_prices, batch) -> Callable:
    """Hyper-objective around a model calibration (e.g. Heston learning-rate
    / n_steps tuning): value = final calibration loss."""

    def objective(trial, trial_seed) -> float:
        lr = trial.suggest_float("learning_rate", 1e-3, 0.2, log=True)
        n_steps = trial.suggest_int("n_steps", 50, 500, log=True)
        _, loss = pricer_builder(market_prices, batch, learning_rate=lr, n_steps=n_steps)
        return float(loss)

    return objective
