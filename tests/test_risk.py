"""Risk layer tests (SURVEY.md §4 + reference tests/test_var.py patterns)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optionslab_tpu.models.black_scholes import bs_price
from optionslab_tpu.risk import (
    ExpectedShortfall,
    OptionsPortfolio,
    Position,
    SensitivityAnalysis,
    StressScenario,
    StressTester,
    VaRAnalyzer,
    delta_normal_var,
    historical_es,
    historical_var,
    parametric_es,
    parametric_var,
)
from optionslab_tpu.utils.exceptions import ValidationError

RNG = np.random.default_rng(0)


class TestVaR:
    def test_historical_matches_quantile(self):
        pnl = RNG.normal(0.0, 1.0, 100_000)
        var = float(historical_var(pnl, 0.95))
        assert abs(var - 1.645) < 0.05
        es = float(historical_es(pnl, 0.95))
        assert es > var  # ES beyond VaR

    def test_parametric_normal(self):
        var = float(parametric_var(0.0, 1.0, 0.95))
        assert abs(var - 1.6449) < 1e-3
        es = float(parametric_es(0.0, 1.0, 0.95))
        assert abs(es - 2.0627) < 1e-3  # φ(z)/(1-α) for α=0.95

    def test_var_increases_with_confidence(self):
        pnl = RNG.normal(0.0, 1.0, 50_000)
        assert float(historical_var(pnl, 0.99)) > float(historical_var(pnl, 0.95))

    def test_monte_carlo_close_to_lognormal_closed_form(self):
        a = VaRAnalyzer(confidence=0.95, horizon=1.0, seed=1)
        mc = a.monte_carlo(100.0, 0.05, 0.2, n_paths=400_000)
        cf = a.parametric_lognormal(100.0, 0.05, 0.2)
        assert abs(mc - cf) < 0.5

    def test_delta_normal_portfolio(self):
        cov = np.array([[0.04, 0.01], [0.01, 0.09]]) / 252.0
        var = float(delta_normal_var([1e6, -5e5], cov, 0.99, 1.0))
        assert var > 0
        # diversification: |combined| < sum of standalone
        v1 = float(delta_normal_var([1e6, 0.0], cov, 0.99))
        v2 = float(delta_normal_var([0.0, -5e5], cov, 0.99))
        assert var < v1 + v2

    def test_option_var_full_revaluation(self):
        a = VaRAnalyzer(confidence=0.99, seed=2)

        def pricer(spots):
            return bs_price(spots, 100.0, 0.5, 0.03, 0.25, 1.0, 0.0)

        var = a.option_portfolio(pricer, 100.0, 0.05, 0.25, n_paths=100_000)
        assert 0.0 < var < 10.0  # a single long call's 1d 99% loss

    def test_invalid_confidence_raises(self):
        with pytest.raises(ValidationError):
            historical_var(np.zeros(10), confidence=0.3)
        with pytest.raises(ValidationError):
            VaRAnalyzer(confidence=1.5)

    def test_stress_table(self):
        a = VaRAnalyzer()
        table = a.stress_table(10.0, [0.0, 0.5, 1.0])
        assert table[0.0] == 10.0 and table[1.0] == 20.0


class TestES:
    def test_static_api(self):
        pnl = RNG.normal(0.0, 2.0, 50_000)
        assert ExpectedShortfall.historical(pnl, 0.95) > 0
        assert abs(ExpectedShortfall.parametric(0.0, 1.0, 0.95) - 2.0627) < 1e-3
        mc = ExpectedShortfall.monte_carlo(100.0, 0.05, 0.2, 0.95, 1.0, 100_000)
        assert mc > 0


class TestStress:
    def _market(self):
        import pandas as pd

        return pd.DataFrame({
            "underlying_price": [100.0, 100.0, 95.0],
            "strike_price": [95.0, 105.0, 100.0],
            "time_to_maturity": [0.5, 0.5, 1.0],
            "risk_free_rate": [0.03] * 3,
            "historical_volatility": [0.2, 0.25, 0.3],
        })

    @staticmethod
    def _price(df):
        return np.asarray(bs_price(
            df["underlying_price"].to_numpy(), df["strike_price"].to_numpy(),
            df["time_to_maturity"].to_numpy(), df["risk_free_rate"].to_numpy(),
            df["historical_volatility"].to_numpy(), 1.0, 0.0))

    def test_scenarios_report(self):
        tester = StressTester(self._price)
        report = tester.run_scenarios(self._market(), [
            StressScenario("crash", "underlying_price", -0.2),
            StressScenario("vol spike", "historical_volatility", 0.5),
            StressScenario("rate +100bp", "risk_free_rate", 0.01, relative=False),
        ])
        assert len(report) == 3
        crash = report[report.scenario == "crash"].iloc[0]
        assert crash.total_pnl < 0  # long calls lose in a crash
        spike = report[report.scenario == "vol spike"].iloc[0]
        assert spike.total_pnl > 0  # long calls gain on vol
        assert {"total_pnl", "mean_pnl", "median_pnl", "worst_pnl", "es95"} <= set(report.columns)

    def test_unknown_field_raises(self):
        with pytest.raises(ValidationError):
            StressScenario("bad", "skew", 0.1).apply(self._market())


class TestSensitivity:
    def test_fd_delta_matches_bs(self):
        import pandas as pd

        df = pd.DataFrame({
            "underlying_price": [100.0],
            "strike_price": [100.0],
            "time_to_maturity": [1.0],
            "risk_free_rate": [0.05],
            "historical_volatility": [0.2],
        })
        sens = SensitivityAnalysis(TestStress._price)
        out = sens.compute_all(df, h=0.001)
        assert abs(out["delta"][0] - 0.6368) < 1e-3
        assert abs(out["gamma"][0] - 0.01876) < 1e-3
        assert abs(out["vega"][0] - 37.52) < 0.1


class TestPortfolio:
    def _book(self):
        p = OptionsPortfolio()
        p.add_position(Position(10, 100.0, 100.0, 1.0, 0.05, 0.2, "call", underlying="AAA"))
        p.add_position(Position(-5, 100.0, 110.0, 0.5, 0.05, 0.25, "call", underlying="AAA"))
        p.add_position(Position(20, 50.0, 50.0, 2.0, 0.03, 0.3, "put", underlying="BBB"))
        return p

    @pytest.mark.slow
    def test_aggregate_greeks(self):
        agg = self._book().aggregate_greeks()
        assert set(agg) >= {"price", "delta", "gamma", "vega", "theta", "rho"}
        assert agg["gamma"] != 0.0

    @pytest.mark.slow
    def test_attribution_sums_to_total(self):
        book = self._book()
        agg = book.aggregate_greeks()
        by_und = book.greeks_by_underlying()
        assert abs(sum(by_und["delta"].values()) - agg["delta"]) < 1e-6
        assert set(by_und["delta"]) == {"AAA", "BBB"}

    def test_report_and_hedge(self):
        book = self._book()
        rep = book.position_report()
        assert len(rep) == 3
        hedge = book.delta_hedge_ratio()
        assert hedge == pytest.approx(-book.aggregate_greeks()["delta"])

    def test_scenario_grid(self):
        book = self._book()
        grid = book.scenario_pnl(np.array([-0.1, 0.0, 0.1]), np.array([-0.2, 0.0, 0.2]))
        assert grid.shape == (3, 3)
        assert abs(grid[1, 1]) < 1e-4  # no shift, no P&L

    def test_vega_buckets(self):
        buckets = self._book().vega_buckets()
        total = sum(buckets.values())
        agg = self._book().aggregate_greeks()["vega"]
        assert abs(total - agg) < 1e-5

    def test_empty_portfolio_raises(self):
        with pytest.raises(ValidationError):
            OptionsPortfolio().aggregate_greeks()


class TestComponentAllocation:
    def test_component_es_sums_and_matches_total(self):
        import numpy as np

        from optionslab_tpu.risk import component_es, historical_es

        rng = np.random.default_rng(0)
        x = rng.normal(0.0, [1.0, 2.0, 0.5], size=(20000, 3))
        out = component_es(x, confidence=0.95)
        total_direct = float(historical_es(x.sum(axis=1), 0.95))
        assert float(out["total_es"]) == pytest.approx(total_direct,
                                                       rel=0.02)
        assert float(jnp.sum(out["components"])) == pytest.approx(
            float(out["total_es"]), rel=1e-6)
        # the sigma=2 component dominates the tail
        comps = np.asarray(out["components"])
        assert comps[1] > comps[0] > comps[2]

    def test_component_var_sums_and_hedge_is_negative(self):
        import numpy as np

        from optionslab_tpu.risk import component_var

        rng = np.random.default_rng(1)
        a = rng.normal(0.0, 1.0, 20000)
        x = np.stack([a, -0.5 * a, rng.normal(0.0, 0.3, 20000)], axis=1)
        out = component_var(x, confidence=0.99, window=200)
        comps = np.asarray(out["components"])
        assert float(jnp.sum(out["components"])) == pytest.approx(
            float(out["total_var"]), rel=1e-6)
        # the -0.5a column hedges the portfolio -> negative allocation
        assert comps[1] < 0 < comps[0]

    def test_validation(self):
        from optionslab_tpu.risk import component_var
        from optionslab_tpu.utils.exceptions import ValidationError

        with pytest.raises(ValidationError):
            component_var(jnp.zeros(10))
