"""Real .onnx emission (optimize/onnx_emit.py): wire-format round-trip,
parity of the emitted graph vs the live JAX forward, surface-model façade.

Reference capability: ``src/optimization/onnx_exporter.py:67`` (actual ONNX
protobuf artifacts) — here emitted WITHOUT the onnx package via a hand-rolled
protobuf writer, and validated by the in-module pure-NumPy lite runtime."""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optionslab_tpu.optimize.onnx_emit import (
    OnnxLiteRuntime,
    _parse_tensor,
    _tensor_proto,
    export_mlp_onnx,
    export_surface_model_onnx,
)
from optionslab_tpu.surface.nn_core import apply_mlp, init_mlp
from optionslab_tpu.utils.exceptions import ModelError, ValidationError


def _params(sizes, seed=0):
    return init_mlp(jax.random.PRNGKey(seed), sizes)


def _np_params(params):
    return [{k: np.asarray(v) for k, v in p.items()} for p in params]


class TestWireFormat:
    def test_tensor_roundtrip_matrix(self):
        arr = np.arange(12, dtype=np.float32).reshape(3, 4) / 7.0
        name, back = _parse_tensor(_tensor_proto("w", arr))
        assert name == "w"
        np.testing.assert_array_equal(back, arr)

    def test_tensor_roundtrip_scalar_and_vector(self):
        for arr in (np.float32(0.5), np.asarray([1.0, -2.0, 3.5], np.float32)):
            _, back = _parse_tensor(_tensor_proto("t", np.asarray(arr)))
            np.testing.assert_array_equal(back, np.asarray(arr))


class TestMLPParity:
    def test_plain_gelu(self, tmp_path):
        params = _params([5, 16, 8, 1])
        path = tmp_path / "m.onnx"
        export_mlp_onnx(params, path, layernorm=False)
        x = np.random.default_rng(1).normal(size=(32, 5)).astype(np.float32)
        native = np.asarray(apply_mlp(params, jnp.asarray(x), layernorm=False))
        out = OnnxLiteRuntime(path).predict(x)
        np.testing.assert_allclose(out, native, atol=3e-5, rtol=1e-4)

    def test_layernorm(self, tmp_path):
        params = _params([4, 12, 1], seed=3)
        path = tmp_path / "ln.onnx"
        export_mlp_onnx(params, path, layernorm=True)
        x = np.random.default_rng(2).normal(size=(9, 4)).astype(np.float32)
        native = np.asarray(apply_mlp(params, jnp.asarray(x), layernorm=True))
        out = OnnxLiteRuntime(path).predict(x)
        np.testing.assert_allclose(out, native, atol=3e-5, rtol=1e-4)

    def test_scaler_folded(self, tmp_path):
        params = _params([3, 8, 2], seed=7)
        mean = np.asarray([1.0, -2.0, 0.5], np.float32)
        scale = np.asarray([2.0, 0.5, 3.0], np.float32)
        path = tmp_path / "s.onnx"
        export_mlp_onnx(params, path, mean=mean, scale=scale, layernorm=False)
        x = np.random.default_rng(3).normal(size=(6, 3)).astype(np.float32)
        native = np.asarray(apply_mlp(params, jnp.asarray((x - mean) / scale),
                                      layernorm=False))
        out = OnnxLiteRuntime(path).predict(x)
        np.testing.assert_allclose(out, native, atol=3e-5, rtol=1e-4)

    @pytest.mark.parametrize("act,fn", [
        ("tanh", jnp.tanh),
        ("relu", jax.nn.relu),
    ])
    def test_alternative_activations(self, tmp_path, act, fn):
        params = _params([3, 6, 1], seed=11)
        path = tmp_path / f"{act}.onnx"
        export_mlp_onnx(params, path, layernorm=False, activation=act)
        x = np.random.default_rng(4).normal(size=(5, 3)).astype(np.float32)
        native = np.asarray(apply_mlp(params, jnp.asarray(x),
                                      layernorm=False, activation=fn))
        out = OnnxLiteRuntime(path).predict(x)
        np.testing.assert_allclose(out, native, atol=3e-5, rtol=1e-4)

    def test_unsupported_activation_raises(self, tmp_path):
        with pytest.raises(ValidationError):
            export_mlp_onnx(_params([2, 3, 1]), tmp_path / "x.onnx",
                            activation="swish")

    def test_empty_params_raise(self, tmp_path):
        with pytest.raises(ValidationError):
            export_mlp_onnx([], tmp_path / "e.onnx")


class TestArtifact:
    def test_manifest_and_sidecar(self, tmp_path):
        path = tmp_path / "m.onnx"
        manifest = export_mlp_onnx(_params([4, 6, 1]), path, layernorm=False,
                                   metadata={"model": "MLPModel",
                                             "features": ["a", "b", "c", "d"]})
        assert manifest["format"] == "onnx"
        assert manifest["opset"] == 17
        assert manifest["input_shape"] == [None, 4]
        assert manifest["output_shape"] == [None, 1]
        assert manifest["n_bytes"] == path.stat().st_size > 0
        sidecar = json.loads((tmp_path / "m.onnx.json").read_text())
        assert sidecar["model"] == "MLPModel"

    def test_metadata_props_parse_back(self, tmp_path):
        path = tmp_path / "m.onnx"
        export_mlp_onnx(_params([2, 3, 1]), path, layernorm=False,
                        metadata={"model": "X"})
        rt = OnnxLiteRuntime(path)
        assert rt.metadata["model"] == "X"
        assert rt.metadata["format"] == "onnx"
        assert rt.input_names == ["x"]
        assert rt.output_names == ["y"]

    def test_missing_file_raises(self, tmp_path):
        with pytest.raises(ModelError):
            OnnxLiteRuntime(tmp_path / "nope.onnx")

    def test_onnx_package_checker_if_available(self, tmp_path):
        onnx = pytest.importorskip("onnx")
        path = tmp_path / "m.onnx"
        export_mlp_onnx(_params([3, 4, 1]), path, layernorm=True)
        model = onnx.load(str(path))
        onnx.checker.check_model(model)
        assert model.graph.input[0].name == "x"


class TestSurfaceFacade:
    @pytest.mark.slow
    def test_surface_model_roundtrip(self, tmp_path):
        from optionslab_tpu.data.synthetic import generate_synthetic_chain
        from optionslab_tpu.surface import MLPModel, engineer_features

        df = engineer_features(generate_synthetic_chain(n_rows=120, seed=5))
        model = MLPModel(hidden_layers=(16,), epochs=30, seed=1)
        model.train(df)
        manifest = export_surface_model_onnx(model, tmp_path / "mlp.onnx")
        assert manifest["roundtrip_max_abs_err"] <= 2e-5
        x = model._features_matrix(df.head(10))
        raw = model.scaler.inverse_transform(x).astype(np.float32)
        out = OnnxLiteRuntime(tmp_path / "mlp.onnx").predict(raw)
        np.testing.assert_allclose(
            out.ravel(), model.predict_volatility(df.head(10)),
            rtol=1e-4, atol=2e-5)

    def test_untrained_raises(self, tmp_path):
        from optionslab_tpu.surface import MLPModel

        with pytest.raises(ModelError):
            export_surface_model_onnx(MLPModel(), tmp_path / "x.onnx")

    @pytest.mark.slow
    def test_surrogate_export_onnx(self, tmp_path):
        """The MC surrogate (layernorm + output affine) exports too: the
        raw-heads pipeline matches _forward through the lite runtime."""
        from optionslab_tpu.models.surrogate import (
            MonteCarloMLSurrogate, engineer_surrogate_features,
            sample_contracts)

        s = MonteCarloMLSurrogate(hidden_layers=(32,), epochs=40, seed=0)
        s.fit(n_samples=3000)
        manifest = s.export_onnx(tmp_path / "surrogate.onnx")
        assert manifest["layernorm"] and manifest["output_affine"]
        # the live forward runs on the session device; cross-backend f32
        # matmul/rsqrt differences dominate the bound
        assert manifest["roundtrip_max_abs_err"] <= 2e-4
        p = sample_contracts(32, 99)
        x = engineer_surrogate_features(p)
        np.testing.assert_allclose(
            OnnxLiteRuntime(tmp_path / "surrogate.onnx").predict(x),
            s._forward(x), atol=1e-4, rtol=1e-3)

    def test_surrogate_unfitted_export_raises(self, tmp_path):
        from optionslab_tpu.models.surrogate import MonteCarloMLSurrogate

        with pytest.raises(ModelError):
            MonteCarloMLSurrogate().export_onnx(tmp_path / "x.onnx")

    @pytest.mark.slow
    def test_cli_export_subcommand(self, tmp_path, capsys):
        from optionslab_tpu.cli import main

        out = tmp_path / "m.hlo"
        rc = main(["export", "--source", "synthetic", "--n-rows", "100",
                   "--epochs", "30", "--onnx", "--out", str(out)])
        assert rc == 0
        payload = json.loads(capsys.readouterr().out)
        assert payload["export"]["path"] == str(out)
        assert payload["onnx"]["roundtrip_max_abs_err"] <= 2e-5
        assert (tmp_path / "m.onnx").exists()

    @pytest.mark.slow
    def test_optimize_and_export_emits_onnx(self, tmp_path):
        """The reference's optimize_and_export_onnx flow ends in a real
        .onnx artifact (model_wrappers.py:236); emit_onnx=True mirrors it."""
        from optionslab_tpu.data.synthetic import generate_synthetic_chain
        from optionslab_tpu.optimize import optimize_and_export
        from optionslab_tpu.surface import engineer_features

        df = engineer_features(generate_synthetic_chain(n_rows=100, seed=9))
        out = optimize_and_export(
            df, tmp_path / "best.hlo", n_trials=2,
            study_name="onnx_e2e",
            storage=f"sqlite:///{tmp_path}/studies.db",
            final_epochs=30, emit_onnx=True)
        onnx_path = tmp_path / "best.onnx"
        assert onnx_path.exists()
        assert out["onnx"]["roundtrip_max_abs_err"] <= 2e-5
        x = np.random.default_rng(0).normal(
            size=(4, len(out["model"].feature_columns))).astype(np.float32)
        iv = OnnxLiteRuntime(onnx_path).predict(x)
        assert iv.shape == (4, 1) and np.all(np.isfinite(iv))
