"""Model export / deployment: serialized StableHLO + validation + inference.

Reference capabilities covered (SURVEY.md §2.7):
  - ``src/optimization/onnx_exporter.py:45-452`` — model export with a JSON
    metadata sidecar and export-time validation;
  - ``onnx_runtime.py:32-322`` — inference engine with input validation
    against metadata, chunked batch predict, latency benchmark (p50/p95);
  - ``onnx_validator.py:92-326`` — native-vs-exported parity harness across
    batch sizes with abs/rel tolerances.

TPU-first design: the interchange format is **jax.export serialized
StableHLO** — the XLA-native equivalent of ONNX: a self-contained compiled
artifact loadable without the model class, runnable on CPU/GPU/TPU. The
exporter wraps any jittable ``fn(x)``; the validator compares the
round-tripped artifact against the live function exactly as the reference
compares ONNX vs native.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
import time
from typing import Callable, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

from ..utils.exceptions import ModelError, ValidationError


@dataclasses.dataclass
class ExportResult:
    path: str
    n_bytes: int
    input_shape: tuple
    input_dtype: str
    metadata: dict


class ModelExporter:
    """Serialize a jittable function (e.g. a trained model's forward)."""

    @staticmethod
    def export(fn: Callable, example_input, path, metadata: dict | None = None,
               batch_polymorphic: bool = True) -> ExportResult:
        path = pathlib.Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        x = jnp.asarray(example_input)
        if batch_polymorphic and x.ndim >= 1:
            # symbolic leading axis: one artifact serves every batch size
            shape_spec = jax_export.symbolic_shape("b")[0:1]
            args = jax.ShapeDtypeStruct((shape_spec[0], *x.shape[1:]), x.dtype)
            exported = jax_export.export(jax.jit(fn))(args)
        else:
            exported = jax_export.export(jax.jit(fn))(x)
        data = exported.serialize()
        path.write_bytes(data)
        meta = {
            "format": "jax.export/stablehlo",
            "input_shape": list(x.shape),
            "input_dtype": str(x.dtype),
            "batch_polymorphic": batch_polymorphic,
            "created": time.time(),
            **(metadata or {}),
        }
        (path.with_suffix(path.suffix + ".json")).write_text(json.dumps(meta, default=float))
        return ExportResult(str(path), len(data), tuple(x.shape), str(x.dtype), meta)


class InferenceEngine:
    """Load + run an exported artifact with input validation and a latency
    benchmark (reference: ONNXInferenceEngine)."""

    def __init__(self, path):
        path = pathlib.Path(path)
        if not path.exists():
            raise ModelError(f"exported model not found: {path}")
        self._exported = jax_export.deserialize(path.read_bytes())
        meta_path = path.with_suffix(path.suffix + ".json")
        self.metadata = json.loads(meta_path.read_text()) if meta_path.exists() else {}

    def _validate_input(self, x):
        x = jnp.asarray(x)
        want_dtype = self.metadata.get("input_dtype")
        if want_dtype and str(x.dtype) != want_dtype:
            raise ValidationError(f"input dtype {x.dtype} != exported {want_dtype}")
        want_shape = self.metadata.get("input_shape")
        if want_shape and not self.metadata.get("batch_polymorphic", False):
            if list(x.shape) != list(want_shape):
                raise ValidationError(f"input shape {x.shape} != exported {want_shape}")
        elif want_shape and list(x.shape[1:]) != list(want_shape)[1:]:
            raise ValidationError(
                f"feature shape {x.shape[1:]} != exported {tuple(want_shape[1:])}")
        return x

    def predict(self, x):
        return np.asarray(self._exported.call(self._validate_input(x)))

    def predict_batch(self, x, chunk_size: int = 8192):
        """Chunked prediction for huge inputs (reference: ``:198``)."""
        x = np.asarray(x)
        outs = [self.predict(x[i:i + chunk_size]) for i in range(0, len(x), chunk_size)]
        return np.concatenate(outs, axis=0)

    def benchmark(self, x, iters: int = 50) -> dict:
        """Latency stats (reference: ``onnx_runtime.py:272``)."""
        x = self._validate_input(x)
        jax.block_until_ready(self._exported.call(x))
        samples = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(self._exported.call(x))
            samples.append((time.perf_counter() - t0) * 1e3)
        samples.sort()
        n = len(samples)
        return {"mean_ms": sum(samples) / n, "p50_ms": samples[n // 2],
                "p95_ms": samples[min(n - 1, int(0.95 * n))], "iters": n}


@dataclasses.dataclass
class ValidationReport:
    passed: bool
    max_abs_error: float
    mean_abs_error: float
    max_rel_error: float
    batch_sizes: list

    def summary(self) -> str:
        status = "PASSED" if self.passed else "FAILED"
        return (f"export validation {status}: max|err|={self.max_abs_error:.3e} "
                f"mean|err|={self.mean_abs_error:.3e} max rel={self.max_rel_error:.3e} "
                f"batches={self.batch_sizes}")


class ExportValidator:
    """Native-vs-exported parity harness (reference: ONNXValidator)."""

    def __init__(self, atol: float = 1e-5, rtol: float = 1e-4):
        self.atol = atol
        self.rtol = rtol

    def validate(self, fn: Callable, engine: InferenceEngine, inputs) -> ValidationReport:
        return self.validate_batch_sizes(fn, engine, [np.asarray(inputs)])

    def validate_batch_sizes(self, fn: Callable, engine: InferenceEngine,
                             input_batches: Sequence) -> ValidationReport:
        max_abs = mean_abs = max_rel = 0.0
        sizes = []
        for x in input_batches:
            x = np.asarray(x)
            sizes.append(len(x))
            native = np.asarray(fn(jnp.asarray(x)))
            restored = engine.predict(x)
            err = np.abs(native - restored)
            rel = err / np.maximum(np.abs(native), 1e-12)
            max_abs = max(max_abs, float(err.max()))
            mean_abs = max(mean_abs, float(err.mean()))
            max_rel = max(max_rel, float(rel.max()))
        passed = max_abs <= self.atol or max_rel <= self.rtol
        return ValidationReport(passed, max_abs, mean_abs, max_rel, sizes)


def export_surface_model(model, path, example_df=None) -> ExportResult:
    """Convenience: export a trained JAX surface model's forward (any input
    preprocessing folded into the graph) + parity-check it.

    Models may define ``export_forward() -> fn`` taking the RAW feature
    matrix (n, n_features); otherwise the default scaler+MLP pipeline is
    exported."""
    if getattr(model, "params", None) is None:
        raise ModelError("model must be trained before export")

    if hasattr(model, "export_forward"):
        fn = model.export_forward()
    else:
        from ..surface.nn_core import apply_mlp

        mean = jnp.asarray(model.scaler.mean_, jnp.float32)
        scale = jnp.asarray(model.scaler.scale_, jnp.float32)
        params = model.params
        # export the forward the model actually predicts with (the
        # surface nets default to layernorm=False since round 4)
        layernorm = bool(getattr(model, "layernorm", True))

        def fn(x):
            return apply_mlp(params, (x - mean) / scale,
                             layernorm=layernorm)

    example = jnp.zeros((4, len(model.feature_columns)), jnp.float32)
    result = ModelExporter.export(fn, example, path,
                                  metadata={"model": type(model).__name__,
                                            "features": model.feature_columns})
    report = ExportValidator().validate(fn, InferenceEngine(path),
                                        np.random.default_rng(0).normal(size=(16, example.shape[1])).astype(np.float32))
    if not report.passed:
        raise ModelError(f"export failed validation: {report.summary()}")
    return result
