"""Glue: one-call optimizers + the optimize-and-export pipeline.

Reference capabilities covered (SURVEY.md §2.7, ``src/optimization/
model_wrappers.py:25-294``): ``create_monte_carlo_ml_optimizer``,
``create_mlp_optimizer``, and the end-to-end ``optimize_and_export_onnx``
pipeline (here: optimize → retrain best → jax.export → validate).
"""

from __future__ import annotations

from .export import ExportValidator, InferenceEngine, ModelExporter, export_surface_model
from .objectives import make_surface_model_objective, make_surrogate_objective
from .search import StudyManager
from .spaces import MLPSearchSpace, SurrogateSearchSpace


def create_mlp_optimizer(df, study_name: str = "mlp_study",
                         storage: str = "sqlite:///optionslab_studies.db",
                         n_folds: int = 2, epochs: int = 60, **study_kwargs):
    """(StudyManager, objective) tuned for the MLP surface model."""
    from ..surface.mlp import MLPModel

    space = MLPSearchSpace()
    objective = make_surface_model_objective(MLPModel, space, df, n_folds=n_folds,
                                             epochs=epochs)
    manager = StudyManager(study_name, storage, **study_kwargs)
    return manager, objective


def create_surrogate_optimizer(study_name: str = "surrogate_study",
                               storage: str = "sqlite:///optionslab_studies.db",
                               n_train: int = 10_000, **study_kwargs):
    space = SurrogateSearchSpace()
    objective = make_surrogate_objective(space, n_train=n_train)
    manager = StudyManager(study_name, storage, **study_kwargs)
    return manager, objective


def optimize_and_export(df, export_path, n_trials: int = 10,
                        study_name: str = "mlp_export_study",
                        storage: str = "sqlite:///optionslab_studies.db",
                        final_epochs: int = 300, emit_onnx: bool = False):
    """End-to-end: search MLP hyperparameters → retrain the best config on
    the full data → export the artifact → parity-validate it
    (reference: ``model_wrappers.py:236`` optimize_and_export_onnx).

    ``emit_onnx=True`` additionally writes a real ``.onnx`` twin of the
    StableHLO artifact (``onnx_emit.export_surface_model_onnx``), parity-
    checked at export time — the reference flow's literal output format."""
    from ..surface.mlp import MLPModel

    manager, objective = create_mlp_optimizer(df, study_name, storage)
    result = manager.optimize(objective, n_trials=n_trials)
    best = dict(result.best_params)
    width = best.pop("width", 64)
    depth = best.pop("n_layers", 2)
    best["hidden_layers"] = tuple([width] * depth)
    model = MLPModel(epochs=final_epochs, **{
        k: v for k, v in best.items()
        if k in ("hidden_layers", "dropout_rate", "learning_rate", "batch_size")})
    metrics = model.train(df)
    export_result = export_surface_model(model, export_path)
    out = {
        "study": result,
        "final_metrics": metrics,
        "export": export_result,
        "model": model,
    }
    if emit_onnx:
        from .onnx_emit import export_surface_model_onnx

        onnx_path = str(export_path)
        onnx_path = (onnx_path[:-len(".hlo")] if onnx_path.endswith(".hlo")
                     else onnx_path) + ".onnx"
        out["onnx"] = export_surface_model_onnx(model, onnx_path)
    return out


__all__ = [
    "create_mlp_optimizer",
    "create_surrogate_optimizer",
    "optimize_and_export",
    "ModelExporter",
    "InferenceEngine",
    "ExportValidator",
]
