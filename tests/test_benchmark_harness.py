"""Benchmark harness tests (reference: tests/test_vol_surface_benchmark.py
pattern — synthetic smiles, metric sanity, best-model pick)."""

import numpy as np
import pytest

from optionslab_tpu.benchmarks import VolSurfaceBenchmark, compute_epp, surface_epp
from optionslab_tpu.data.synthetic import generate_synthetic_smile, generate_synthetic_surface


@pytest.fixture(scope="module")
def smile():
    k, vols = generate_synthetic_smile(n_strikes=21, maturity=0.5, noise=0.002, seed=3)
    return k, vols


class TestEPP:
    def test_zero_for_arb_free(self):
        k = np.linspace(-0.4, 0.4, 41)
        w = 0.04 + 0.02 * k**2
        assert compute_epp(k, w, 0.5) == 0.0

    def test_positive_for_violating_smile(self):
        k = np.linspace(-0.4, 0.4, 41)
        w = 0.04 + 2.5 * np.abs(k)  # Roger-Lee violating wings
        assert compute_epp(k, w, 0.5) > 0.0

    def test_surface_epp(self):
        k, t, iv = generate_synthetic_surface(21, 4)
        assert surface_epp(k, t, iv) >= 0.0


class TestHarness:
    @pytest.mark.slow
    def test_parametric_models_run(self, smile):
        k, vols = smile
        bench = VolSurfaceBenchmark(models=["svi", "kernel_ridge"])
        bench.run(k, vols, maturity=0.5, n_trials=2)
        df = bench.to_dataframe()
        assert set(df.model) == {"svi", "kernel_ridge"}
        assert (df.rmse_bps < 500).all()  # both fit a clean smile well
        assert (df.convergence_pct == 100.0).all()
        assert (df.calibration_ms > 0).all()

    def test_best_model_and_truth_fn(self, smile):
        k, vols = smile
        from optionslab_tpu.data.synthetic import synthetic_iv

        bench = VolSurfaceBenchmark(models=["svi", "random_forest"])
        bench.run(k, vols, maturity=0.5, n_trials=1,
                  truth_fn=lambda kk: synthetic_iv(kk, 0.5))
        best = bench.best_model()
        assert best in ("svi", "random_forest")
        df = bench.to_dataframe()
        # SVI should be nearly arbitrage-free on a clean smile
        assert float(df[df.model == "svi"].arb_free_pct.iloc[0]) > 95.0

    def test_unknown_model_raises(self):
        with pytest.raises(ValueError):
            VolSurfaceBenchmark(models=["lstm"])

    def test_stability_cv_present_for_parametric(self, smile):
        k, vols = smile
        bench = VolSurfaceBenchmark(models=["svi"]).run(k, vols, 0.5, n_trials=3)
        entry = bench.entries[0]
        assert entry.stability.param_cv >= 0.0
