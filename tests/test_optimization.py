"""Optimization subsystem tests (SURVEY.md §4 item 10: study lifecycle,
SQLite persistence, resume, pruning, deterministic trial seeds; export
parity harness)."""

import numpy as np
import pytest

from optionslab_tpu.optimize import (
    ExportValidator,
    InferenceEngine,
    KernelRidgeSearchSpace,
    MedianPruner,
    MLPSearchSpace,
    ModelExporter,
    SobolSampler,
    StudyManager,
    TrialPruned,
    compute_data_hash,
    export_surface_model,
    get_trial_seed,
    seeded_kfold,
    set_global_seed,
)
from optionslab_tpu.utils.exceptions import ModelError, ValidationError


def _db(tmp_path, name="studies.db"):
    return f"sqlite:///{tmp_path / name}"


class TestTrialSeeds:
    def test_deterministic(self):
        assert get_trial_seed(42, 7, "s") == get_trial_seed(42, 7, "s")

    def test_distinct_across_trials_and_studies(self):
        seeds = {get_trial_seed(42, i, "a") for i in range(100)}
        assert len(seeds) == 100
        assert get_trial_seed(42, 0, "a") != get_trial_seed(42, 0, "b")

    def test_data_hash(self):
        a = np.arange(10)
        assert compute_data_hash(a) == compute_data_hash(a.copy())
        assert compute_data_hash(a) != compute_data_hash(a + 1)

    @pytest.mark.slow
    def test_set_global_seed_reproducible(self):
        set_global_seed(7)
        a = np.random.rand(3)
        set_global_seed(7)
        b = np.random.rand(3)
        np.testing.assert_array_equal(a, b)


class TestStudyLifecycle:
    def test_sqlite_file_created_and_best_found(self, tmp_path):
        mgr = StudyManager("quadratic", _db(tmp_path))

        def objective(trial, seed):
            x = trial.suggest_float("x", -5.0, 5.0)
            return (x - 2.0) ** 2

        result = mgr.optimize(objective, n_trials=40)
        assert (tmp_path / "studies.db").exists()
        assert result.n_complete == 40
        assert abs(result.best_params["x"] - 2.0) < 1.0
        assert result.best_value < 1.0

    def test_resume_accumulates_trials(self, tmp_path):
        url = _db(tmp_path)

        def objective(trial, seed):
            return trial.suggest_float("x", 0.0, 1.0)

        m1 = StudyManager("resume_me", url)
        m1.optimize(objective, n_trials=5)
        m2 = StudyManager("resume_me", url, load_if_exists=True)
        assert m2.resumed
        assert len(m2.trials) == 5
        result = m2.optimize(objective, n_trials=5)
        assert result.n_trials == 10

    def test_load_if_exists_false_raises(self, tmp_path):
        url = _db(tmp_path)
        StudyManager("dup", url)
        with pytest.raises(ValidationError):
            StudyManager("dup", url, load_if_exists=False)

    def test_failed_trials_counted_not_fatal(self, tmp_path):
        mgr = StudyManager("flaky", _db(tmp_path))

        def objective(trial, seed):
            x = trial.suggest_float("x", 0.0, 1.0)
            if x < 0.5:
                raise RuntimeError("numerical explosion")
            return x

        result = mgr.optimize(objective, n_trials=20)
        assert result.n_failed > 0
        assert result.n_complete + result.n_failed == 20
        assert result.best_value is not None

    def test_pruning(self, tmp_path):
        mgr = StudyManager("pruned", _db(tmp_path),
                           pruner=MedianPruner(n_warmup_trials=3, n_warmup_steps=0))

        def objective(trial, seed):
            x = trial.suggest_float("x", 0.0, 1.0)
            for step in range(3):
                trial.report(x, step)
                if trial.should_prune():
                    raise TrialPruned()
            return x

        result = mgr.optimize(objective, n_trials=30)
        assert result.n_pruned > 0
        assert result.n_complete + result.n_pruned == 30

    def test_metadata_and_json_export(self, tmp_path):
        mgr = StudyManager("meta", _db(tmp_path))
        result = mgr.optimize(lambda t, s: t.suggest_float("x", 0, 1), n_trials=3)
        payload = result.to_json(tmp_path / "result.json")
        assert (tmp_path / "result.json").exists()
        assert "jax" in result.metadata
        assert "best_params" in payload

    def test_maximize_direction(self, tmp_path):
        mgr = StudyManager("maxi", _db(tmp_path), direction="maximize")
        result = mgr.optimize(lambda t, s: t.suggest_float("x", 0.0, 1.0), n_trials=30)
        assert result.best_value > 0.8

    def test_sobol_sampler_coverage(self):
        s = SobolSampler(seed=1)
        draws = [s.draw(i, "x") for i in range(64)]
        # low-discrepancy: all 8 octiles hit with 64 points
        hist, _ = np.histogram(draws, bins=8, range=(0, 1))
        assert (hist > 0).all()


class TestTPESampler:
    """VERDICT r4 #6: TPE-grade adaptive sampling behind the sampler=
    knob (reference: src/optimization/study_manager.py:176 TPESampler)."""

    @staticmethod
    def _basin(trial, seed):
        # narrow 2-D basin: space-filling needs ~1/r^2 points to land
        # near the optimum; an adaptive sampler concentrates there
        x = trial.suggest_float("x", 0.0, 1.0)
        y = trial.suggest_float("y", 0.0, 1.0)
        return (x - 0.73) ** 2 + (y - 0.31) ** 2

    def test_beats_sobol_same_budget(self, tmp_path):
        """Seeded study, same objective, same trial budget: the TPE best
        loss is at least as good as Sobol's (deterministic — both
        samplers derive every decision from the seed)."""
        r_sobol = StudyManager("b_sobol", _db(tmp_path),
                               sampler="sobol").optimize(self._basin,
                                                         n_trials=40)
        r_tpe = StudyManager("b_tpe", _db(tmp_path),
                             sampler="tpe").optimize(self._basin,
                                                     n_trials=40)
        assert r_tpe.best_value <= r_sobol.best_value
        # and it actually exploits: the last 10 TPE trials cluster near
        # the basin far more often than chance
        tpe_mgr = StudyManager("b_tpe", _db(tmp_path), sampler="tpe")
        tail = tpe_mgr.trials[-10:]
        near = sum(1 for t in tail
                   if abs(t.params["x"] - 0.73) < 0.2
                   and abs(t.params["y"] - 0.31) < 0.2)
        assert near >= 5, [t.params for t in tail]

    def test_fewer_trials_to_target(self, tmp_path):
        """The headline claim: TPE reaches a target loss in fewer trials
        than Sobol on the same seeded objective."""
        target = 5e-3

        def first_hit(name, sampler):
            mgr = StudyManager(name, _db(tmp_path), sampler=sampler)
            mgr.optimize(self._basin, n_trials=60)
            for t in mgr.trials:
                if t.value is not None and t.value <= target:
                    return t.number
            return 10_000
        assert first_hit("fh_tpe", "tpe") < first_hit("fh_sobol", "sobol")

    def test_unit_coords_survive_resume(self, tmp_path):
        url = _db(tmp_path)
        m1 = StudyManager("tpe_resume", url, sampler="tpe")
        m1.optimize(self._basin, n_trials=12)
        m2 = StudyManager("tpe_resume", url, sampler="tpe")
        assert len(m2.trials) == 12
        assert all(set(t.unit) == {"x", "y"} for t in m2.trials)
        # resumed history is past n_startup, so the very next draw is
        # adaptive (differs from the fresh-study Sobol fallback draw)
        from optionslab_tpu.optimize import TPESampler
        fresh = TPESampler(seed=42)
        assert m2.sampler.draw(12, "x") != fresh._fallback.draw(12, "x")

    def test_unknown_sampler_name_raises(self, tmp_path):
        with pytest.raises(ValidationError):
            StudyManager("bad", _db(tmp_path), sampler="gp-ucb")


class TestSpaces:
    def test_mlp_space_suggest_and_validate(self, tmp_path):
        mgr = StudyManager("space", _db(tmp_path))
        space = MLPSearchSpace()

        def objective(trial, seed):
            params = space.suggest(trial)
            space.validate(params)
            return params["learning_rate"]

        result = mgr.optimize(objective, n_trials=5)
        assert result.n_complete == 5

    def test_invalid_params_raise(self):
        with pytest.raises(ValidationError):
            MLPSearchSpace().validate({"hidden_layers": (), "dropout_rate": 0.1})
        with pytest.raises(ValidationError):
            KernelRidgeSearchSpace().validate({"gamma": -1.0, "alpha": 1e-3})

    def test_defaults_are_valid(self):
        for space in (MLPSearchSpace(), KernelRidgeSearchSpace()):
            space.validate(space.get_default_params())


class TestKFold:
    def test_partition(self):
        folds = list(seeded_kfold(100, 5, seed=1))
        assert len(folds) == 5
        all_val = np.concatenate([v for _, v in folds])
        assert sorted(all_val) == list(range(100))

    def test_deterministic(self):
        a = [v.tolist() for _, v in seeded_kfold(50, 3, seed=9)]
        b = [v.tolist() for _, v in seeded_kfold(50, 3, seed=9)]
        assert a == b


class TestExport:
    def test_roundtrip_and_validation(self, tmp_path):
        import jax.numpy as jnp

        def fn(x):
            return jnp.tanh(x @ jnp.ones((4, 2), jnp.float32)) * 3.0

        example = np.zeros((8, 4), np.float32)
        res = ModelExporter.export(fn, example, tmp_path / "m.hlo")
        assert res.n_bytes > 0
        engine = InferenceEngine(tmp_path / "m.hlo")
        x = np.random.default_rng(0).normal(size=(16, 4)).astype(np.float32)
        report = ExportValidator().validate_batch_sizes(fn, engine, [x, x[:3]])
        assert report.passed, report.summary()
        bench = engine.benchmark(x, iters=5)
        assert bench["p50_ms"] > 0

    def test_batch_polymorphism(self, tmp_path):
        import jax.numpy as jnp

        fn = lambda x: x.sum(axis=1)
        ModelExporter.export(fn, np.zeros((2, 3), np.float32), tmp_path / "p.hlo")
        engine = InferenceEngine(tmp_path / "p.hlo")
        assert engine.predict(np.ones((7, 3), np.float32)).shape == (7,)

    def test_input_validation(self, tmp_path):
        fn = lambda x: x * 2
        ModelExporter.export(fn, np.zeros((2, 3), np.float32), tmp_path / "v.hlo")
        engine = InferenceEngine(tmp_path / "v.hlo")
        with pytest.raises(ValidationError):
            engine.predict(np.ones((2, 5), np.float32))
        with pytest.raises(ValidationError):
            engine.predict(np.ones((2, 3), np.float64))

    @pytest.mark.slow
    def test_surface_model_export(self, tmp_path):
        from optionslab_tpu.data.synthetic import generate_synthetic_chain
        from optionslab_tpu.surface import MLPModel, engineer_features

        df = engineer_features(generate_synthetic_chain(n_rows=120, seed=5))
        model = MLPModel(hidden_layers=(16,), epochs=30, seed=1)
        model.train(df)
        res = export_surface_model(model, tmp_path / "mlp.hlo")
        engine = InferenceEngine(tmp_path / "mlp.hlo")
        x = model._features_matrix(df.head(10))
        raw = model.scaler.inverse_transform(x).astype(np.float32)
        out = engine.predict(raw)
        np.testing.assert_allclose(out.ravel(), model.predict_volatility(df.head(10)),
                                   rtol=1e-4, atol=1e-5)

    def test_untrained_export_raises(self, tmp_path):
        from optionslab_tpu.surface import MLPModel

        with pytest.raises(ModelError):
            export_surface_model(MLPModel(), tmp_path / "x.hlo")
