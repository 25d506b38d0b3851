"""Real-vendor-format chains, end-to-end.

Committed fixtures under ``tests/data/`` carry the EXACT layouts of a
CBOE ``quotedata`` CSV (two header lines + side-by-side calls/puts, real
column names) and an OptionMetrics ``opprcd`` file (strikes ×1000,
cp_flag C/P, YYYYMMDD dates, best_bid/best_offer) — quotes generated
once from a Heston smile (v0=0.032, kappa=1.8, theta=0.045, sigma=0.45,
rho=-0.65, S=5123.41, r=0.043) with realistic spreads, volumes and
zero-bid wing junk the filters must drop.

The workflow proved here is the reference dashboard's
(``streamlit_app/pages/13_Volatility_Surface.py`` +
``src/data/data_loader.py:509-531``): load → vendor standardization →
liquidity/moneyness filters → IV backfill from mids → SSVI calibration +
arbitrage report → Dupire local vol → reprice HELD-OUT quotes within
spread-scale tolerance.
"""

import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")
CBOE = os.path.join(DATA, "cboe_spx_quotedata.csv")
OM = os.path.join(DATA, "optionmetrics_opprcd_sample.csv")
SPOT, RATE = 5123.41, 0.043


@pytest.fixture(scope="module")
def cboe_chain():
    from optionslab_tpu.data.loader import load_option_data

    return load_option_data("cboe", path=CBOE, rate=RATE)


class TestCBOEStandardization:
    def test_header_spot_and_canonical_columns(self, cboe_chain):
        df = cboe_chain.df
        assert float(df["underlying_price"].iloc[0]) == pytest.approx(SPOT)
        for c in ("strike_price", "time_to_maturity", "option_type",
                  "option_price", "bid", "ask", "implied_volatility",
                  "volume", "open_interest"):
            assert c in df.columns, c
        # side-by-side rows unpivoted: calls + puts, equal counts
        assert (df["option_type"] == "call").sum() == \
            (df["option_type"] == "put").sum() == 132

    def test_ttm_from_header_date(self, cboe_chain):
        # May 15 2026 from an Apr 17 2026 header = 28 calendar days
        t = np.sort(cboe_chain.df["time_to_maturity"].unique())
        assert t[0] == pytest.approx(28 / 365.0, abs=1e-9)
        assert t[-1] == pytest.approx((426) / 365.0, abs=2 / 365.0)

    def test_filters_drop_zero_bid_wings(self, cboe_chain):
        filtered = cboe_chain.filter_liquidity(max_spread_pct=0.5)
        assert 0 < len(filtered) < len(cboe_chain)
        mid = (filtered.df["bid"] + filtered.df["ask"]) / 2
        assert (filtered.df["bid"] > 0).all()
        assert ((filtered.df["ask"] - filtered.df["bid"]) / mid <= 0.5).all()

    def test_backfilled_iv_matches_vendor_iv(self, cboe_chain):
        """Our vectorized Newton on the mids must agree with the vendor IV
        column on liquid quotes (both derive from the same mids here)."""
        ch = cboe_chain.filter_liquidity(max_spread_pct=0.10)
        vendor = np.asarray(ch.df["implied_volatility"], float)
        ch2 = OptionChainDatasetNoIV(ch)
        back = np.asarray(ch2.backfill_implied_vol().df["implied_volatility"],
                          float)
        # mids sit half-spread off the model price => IV differs by
        # half-spread/vega; 10% spread caps that well under 2 vol points
        assert np.nanmedian(np.abs(back - vendor[:len(back)])) < 0.02


def OptionChainDatasetNoIV(ch):
    """Copy of the chain with the vendor IV column dropped (forces the
    backfill path)."""
    from optionslab_tpu.data.loader import OptionChainDataset

    return OptionChainDataset(
        ch.df.drop(columns=["implied_volatility"]).reset_index(drop=True))


class TestOptionMetricsStandardization:
    def test_strike_scaling_and_flags(self):
        from optionslab_tpu.data.loader import load_option_data

        ch = load_option_data("optionmetrics", path=OM, spot=SPOT, rate=RATE)
        df = ch.df
        # strikes arrive x1000 and must come back in dollars
        assert df["strike_price"].between(3500, 6500).all()
        assert set(df["option_type"].unique()) == {"call", "put"}
        assert df["time_to_maturity"].min() > 0.05
        assert float(df["risk_free_rate"].iloc[0]) == pytest.approx(RATE)
        assert float(df["underlying_price"].iloc[0]) == pytest.approx(SPOT)

    def test_spot_is_required(self):
        from optionslab_tpu.data.loader import load_option_data
        from optionslab_tpu.utils.exceptions import DataError

        with pytest.raises(DataError):
            load_option_data("optionmetrics", path=OM, rate=RATE)


class TestEndToEndCalibration:
    @pytest.fixture(scope="class")
    def calibrated(self, cboe_chain):
        from optionslab_tpu.surface.chain_calibration import calibrate_chain

        ch = (cboe_chain.filter_liquidity(max_spread_pct=0.5)
              .filter_moneyness(0.85, 1.2))
        # hold out every 7th liquid quote BEFORE calibration
        df = ch.df.reset_index(drop=True)
        held = df.iloc[::7].reset_index(drop=True)
        used = df.drop(df.index[::7]).reset_index(drop=True)
        from optionslab_tpu.data.loader import OptionChainDataset

        res = calibrate_chain(OptionChainDataset(used), n_expiry_bins=6,
                              from_prices=True, n_steps=400, essvi=True)
        return res, held, used

    def test_essvi_beats_ssvi_on_the_vendor_chain(self, calibrated):
        """Per-expiry rho/psi must fit the real-format chain at least as
        well as the global power law, and stay arbitrage-free."""
        res, _, _ = calibrated
        assert res.essvi is not None
        assert res.essvi_rmse_vol <= res.ssvi_rmse_vol + 1e-4
        assert res.report["essvi_arbitrage_free"], res.report

    def test_ssvi_fit_quality_and_arbitrage(self, calibrated):
        res, _, _ = calibrated
        assert res.ssvi_rmse_vol < 0.01, res.ssvi_rmse_vol  # < 1 vol point
        # the generating Heston surface is arbitrage-free; the fitted
        # surface must not introduce butterfly or calendar violations
        assert res.report["arbitrage_free"]
        assert res.report["ssvi_butterfly_free"]
        assert res.report["calendar_violation_rate"] == 0.0

    def test_heldout_vanillas_reprice_within_spread(self, calibrated):
        """Calibrated-surface vols at HELD-OUT quotes vs their vendor IVs
        — the out-of-sample test a consumer cares about."""
        from optionslab_tpu.surface.chain_calibration import \
            svi_surface_iv_fn

        res, held, _ = calibrated
        iv_fn = svi_surface_iv_fn(res)
        k = np.log(np.asarray(held["strike_price"], float)
                   / (SPOT * np.exp(RATE * np.asarray(
                       held["time_to_maturity"], float))))
        fitted = np.asarray(iv_fn(
            np.asarray(k, np.float32),
            np.asarray(held["time_to_maturity"], np.float32)))
        vendor = np.asarray(held["implied_volatility"], float)
        err = np.abs(fitted - vendor)
        assert np.median(err) < 0.008, np.median(err)
        assert np.quantile(err, 0.9) < 0.02, np.quantile(err, 0.9)

    @pytest.mark.slow
    def test_dupire_lv_repricing_heldout(self, calibrated):
        """chain → SSVI → Dupire local vol → PDE reprice of held-out
        quotes: the full consistent-smile pipeline on real-format data."""
        from optionslab_tpu.surface.chain_calibration import \
            local_vol_from_chain

        res, held, used = calibrated
        dupire, _ = local_vol_from_chain(None, result=res)
        sel = held.iloc[:6]
        for _, q in sel.iterrows():
            mid = float(q["option_price"])
            half = 0.5 * (float(q["ask"]) - float(q["bid"]))
            px = float(dupire.price(SPOT, float(q["strike_price"]),
                                    float(q["time_to_maturity"]),
                                    option_type=q["option_type"]))
            # PDE + SSVI-fit tolerance: within 3 half-spreads + 20 bps of
            # spot-scale (these are ~5000-point index options)
            assert abs(px - mid) < 3.0 * half + 2e-3 * SPOT, \
                (q["strike_price"], q["time_to_maturity"], px, mid, half)


class TestCLIVendorSources:
    @pytest.mark.slow
    def test_cli_calibrate_cboe(self, capsys, tmp_path):
        import json

        from optionslab_tpu.cli import main

        main(["calibrate", "--source", "cboe", "--path", CBOE,
              "--chain-rate", str(RATE), "--from-prices", "--steps", "150"])
        out = json.loads(capsys.readouterr().out)
        assert out["report"]["total_quotes_used"] > 100
        assert out["ssvi_rmse_vol"] < 0.02
