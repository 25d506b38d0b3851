"""Chain snapshot -> SVI/SSVI surface calibration + plot artifacts.

Reference flow: the dashboard vol-surface page
(``streamlit_app/pages/13_Volatility_Surface.py``) — load chain, backfill
IVs, fit per-expiry smiles, report arbitrage.
"""
import json

import numpy as np
import pytest

from optionslab_tpu.cli import main as cli_main
from optionslab_tpu.data.loader import load_option_data
from optionslab_tpu.surface.chain_calibration import (calibrate_chain,
                                                      chain_smile_data)


@pytest.fixture(scope="module")
def chain():
    return load_option_data("synthetic", n_rows=500, seed=3)


@pytest.fixture(scope="module")
def result(chain):
    return calibrate_chain(chain, n_expiry_bins=4, n_steps=500)


class TestCalibrateChain:
    def test_slices_fit_to_noise_level(self, result):
        # synthetic chain has 0.4 vol pts of noise; every slice should fit
        # to within ~2x of it
        assert len(result.svi_params) == 4
        assert np.all(result.svi_rmse_vol < 0.009)

    def test_ssvi_global_fit(self, result):
        # one (rho, eta, gamma) across all expiries: coarser than slices
        # but still close
        assert result.ssvi_rmse_vol < 0.02
        assert -1 < float(np.asarray(result.ssvi.rho)) < 1

    def test_arbitrage_report(self, result):
        rep = result.report
        assert rep["arbitrage_free"]
        assert all(rep["butterfly_free"])
        assert rep["calendar_violation_rate"] == 0.0
        assert rep["theta_monotone"]
        assert rep["ssvi_butterfly_condition"] <= 2.0 + 1e-6

    def test_thetas_increase_with_maturity(self, result):
        assert np.all(np.diff(result.expiries) > 0)
        assert np.all(np.diff(result.thetas) > 0)

    @pytest.mark.slow
    def test_from_prices_backfill_matches_direct(self, chain):
        # drop the IV column; calibration must recover it from prices
        df = chain.df.drop(columns=["implied_volatility"])
        res = calibrate_chain(df, n_expiry_bins=3, n_steps=400,
                              from_prices=True)
        assert np.all(res.svi_rmse_vol < 0.012)

    def test_to_dict_is_json_serializable(self, result):
        d = json.loads(json.dumps(result.to_dict()))
        assert len(d["svi_params"]) == 4
        assert set(d["svi_params"][0]) == {"a", "b", "rho", "m", "sigma"}

    def test_smile_data_payload(self, chain, result):
        d = chain_smile_data(chain, result, 0)
        assert len(d["k_market"]) == result.n_quotes[0]
        assert len(d["k_fit"]) == len(d["iv_fit"]) == 101
        assert np.all(d["iv_fit"] > 0)

    def test_too_few_quotes_raises(self, chain):
        from optionslab_tpu.utils.exceptions import ValidationError

        with pytest.raises(ValidationError):
            calibrate_chain(chain.df.iloc[:3], n_expiry_bins=2)


class TestLocalVolPipeline:
    """chain -> SVI surface -> Dupire local vol: must reprice vanillas."""

    @pytest.fixture(scope="class")
    def pipeline(self):
        from optionslab_tpu.surface.chain_calibration import (
            local_vol_from_chain, svi_surface_iv_fn)

        ds = load_option_data("synthetic", n_rows=800, seed=5, noise=0.001)
        lv, res = local_vol_from_chain(ds, n_expiry_bins=5, n_steps=600)
        return lv, res, svi_surface_iv_fn(res)

    def test_iv_fn_matches_slices_at_expiries(self, pipeline):
        _, res, iv_fn = pipeline
        for i in (0, len(res.expiries) - 1):
            t = float(res.expiries[i])
            got = float(iv_fn(0.05, t))
            want = float(res.svi_vol(0.05, i))
            assert abs(got - want) < 1e-6

    def test_pde_reprices_vanillas(self, pipeline):
        from optionslab_tpu.models.black_scholes import bs_price

        lv, res, iv_fn = pipeline
        for K, T in [(100.0, 1.0), (90.0, 0.5), (110.0, 1.5)]:
            k = float(np.log(K / (res.spot * np.exp(res.rate * T))))
            bs = float(bs_price(res.spot, K, T, res.rate,
                                float(iv_fn(k, T)), 1.0))
            pde = float(lv.price(res.spot, K, T))
            assert abs(pde / bs - 1.0) < 4e-3

    def test_mc_consistent_with_smile(self, pipeline):
        from optionslab_tpu.models import local_vol_mc_price
        from optionslab_tpu.models.black_scholes import bs_price

        lv, res, iv_fn = pipeline
        K, T = 100.0, 1.0
        k = float(np.log(K / (res.spot * np.exp(res.rate * T))))
        bs = float(bs_price(res.spot, K, T, res.rate, float(iv_fn(k, T)), 1.0))
        p, se = local_vol_mc_price(lv, K, T, cp=1.0, n_paths=100_000,
                                   n_steps=100)
        assert abs(float(p) - bs) < 3 * float(se) + 0.02

    def test_short_end_extrapolation_positive_dwdt(self, pipeline):
        # before the first expiry w scales with T: local variance defined
        _, res, iv_fn = pipeline
        t0 = float(res.expiries[0])
        assert float(iv_fn(0.0, 0.3 * t0)) > 0.05


class TestPlotting:
    @pytest.fixture(autouse=True)
    def _needs_matplotlib(self):
        pytest.importorskip("matplotlib")

    def test_smile_fits_png(self, chain, result, tmp_path):
        from optionslab_tpu.utils.plotting import plot_smile_fits

        out = tmp_path / "smiles.png"
        fig = plot_smile_fits(chain, result, path=str(out))
        assert out.stat().st_size > 10_000
        assert len(fig.axes) >= 4

    def test_ssvi_surface_png(self, result, tmp_path):
        from optionslab_tpu.utils.plotting import plot_ssvi_surface

        out = tmp_path / "ssvi.png"
        plot_ssvi_surface(result, path=str(out))
        assert out.stat().st_size > 10_000

    def test_boundary_png(self, tmp_path):
        from optionslab_tpu.utils.plotting import plot_exercise_boundary

        out = tmp_path / "bdry.png"
        plot_exercise_boundary(n_paths=8_192, n_dates=20, path=str(out))
        assert out.stat().st_size > 10_000


class TestModelCalibration:
    @pytest.mark.slow
    def test_heston_fits_the_synthetic_surface(self, chain):
        from optionslab_tpu.surface.chain_calibration import (
            calibrate_model_to_chain)

        r = calibrate_model_to_chain(chain, "heston", n_steps=600)
        assert r["iv_rmse"] < 0.012
        assert 0 < r["params"]["v0"] < 0.5
        assert -1 < r["params"]["rho"] < 1

    @pytest.mark.slow
    def test_bates_fits(self, chain):
        from optionslab_tpu.surface.chain_calibration import (
            calibrate_model_to_chain)

        r = calibrate_model_to_chain(chain, "bates", n_steps=600)
        assert r["iv_rmse"] < 0.015
        assert r["params"]["lam"] >= 0

    @pytest.mark.slow
    def test_heston_mc_kernel_path(self, chain):
        """heston-mc routes the fit through the fused chain kernel
        (in-kernel 5-param gradients); off-TPU it runs the interpreter
        with the counter-hash sampler. Loose bounds — the point is the
        full chain → kernel-calibration wiring, the tight parameter
        recovery is test_heston_pallas.py's job."""
        from optionslab_tpu.surface.chain_calibration import (
            calibrate_model_to_chain)

        r = calibrate_model_to_chain(chain, "heston-mc", n_steps=30,
                                     mc_paths=131_072, mc_max_dt=0.25)
        assert r["n_quotes"] <= 12  # thinned for the kernel launch
        assert 0.0 < r["params"]["v0"] < 0.5
        assert -1.0 < r["params"]["rho"] < 1.0
        assert np.isfinite(r["loss"])
        assert r["iv_rmse"] < 0.2  # 30 Adam steps: sanity, not convergence

    def test_unknown_model_raises(self, chain):
        from optionslab_tpu.surface.chain_calibration import (
            calibrate_model_to_chain)
        from optionslab_tpu.utils.exceptions import ValidationError

        with pytest.raises(ValidationError):
            calibrate_model_to_chain(chain, "sabr2")

    @pytest.mark.slow
    def test_cli_calibrate_heston(self, capsys):
        cli_main(["calibrate", "--model", "heston", "--n-rows", "300",
                  "--steps", "400"])
        out = json.loads(capsys.readouterr().out)
        assert out["model"] == "heston"
        assert out["iv_rmse"] < 0.02


class TestCLI:
    @pytest.mark.slow
    def test_calibrate_command(self, capsys):
        cli_main(["calibrate", "--n-rows", "300", "--bins", "3",
                  "--steps", "300"])
        out = json.loads(capsys.readouterr().out)
        assert len(out["svi_params"]) == 3
        assert out["report"]["total_quotes_used"] == 300

    @pytest.mark.slow
    def test_plot_command(self, capsys, tmp_path):
        pytest.importorskip("matplotlib")
        out_png = str(tmp_path / "s.png")
        cli_main(["plot", "--what", "smiles", "--out", out_png,
                  "--n-rows", "300", "--bins", "3", "--steps", "300"])
        out = json.loads(capsys.readouterr().out)
        assert out["written"] == out_png
        import os
        assert os.path.getsize(out_png) > 10_000


class TestHTMLReport:
    @pytest.fixture(autouse=True)
    def _needs_matplotlib(self):
        pytest.importorskip("matplotlib")

    @pytest.mark.slow
    def test_build_report_end_to_end(self, chain, tmp_path):
        from optionslab_tpu.utils.report import build_report

        out = tmp_path / "report.html"
        summary = build_report(chain, out_path=str(out), n_expiry_bins=4,
                               n_steps=300, essvi=True,
                               include_boundary=True, include_xva=True)
        text = out.read_text()
        # self-contained: inline PNGs, every section rendered
        assert text.count("data:image/png;base64,") >= 3
        for section in ("Smile calibration", "Surface", "no-arbitrage",
                        "Interactive explorer", "exercise boundary", "Risk",
                        "CVA"):
            assert section in text, section
        assert set(summary["sections"]) == {"smiles", "surface", "arbitrage",
                                            "interactive", "boundary",
                                            "risk", "xva"}
        # the explorer embeds the calibrated SVI params + evaluator JS
        assert "var SMILE = {" in text and "function sviW" in text
        assert "smile-svg" in text and "drawSmile(0)" in text
        assert summary["arbitrage_free"] in (True, False)
        assert out.stat().st_size > 100_000  # real figures inside

    def test_build_report_minimal(self, chain, tmp_path):
        from optionslab_tpu.utils.report import build_report

        out = tmp_path / "mini.html"
        summary = build_report(chain, out_path=str(out), n_expiry_bins=4,
                               n_steps=200, essvi=False,
                               include_boundary=False, include_xva=False)
        assert summary["sections"] == ["smiles", "surface", "arbitrage",
                                       "interactive", "risk"]
        assert summary["essvi_rmse_vol"] is None
        assert out.stat().st_size > 30_000
