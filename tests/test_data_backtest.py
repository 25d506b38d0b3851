"""Data layer + backtest engine tests."""

import numpy as np
import pandas as pd
import pytest

from optionslab_tpu.backtest import BacktestEngine, realized_vol, run_delta_hedge_backtest
from optionslab_tpu.data import (
    MarketDataClient,
    OptionChainDataset,
    OptionChainLoader,
    RateLimiter,
    TTLCache,
    load_option_data,
    retry_with_backoff,
    standardize_columns,
)
from optionslab_tpu.utils.exceptions import DataError, DependencyError


class TestStandardize:
    def test_vendor_aliases(self):
        df = pd.DataFrame({
            "Spot": [100.0], "Strike": [95.0], "TTM": [0.5], "Rate": [0.03],
            "IV": [0.2], "Type": ["C"],
        })
        out = standardize_columns(df)
        assert {"underlying_price", "strike_price", "time_to_maturity",
                "risk_free_rate", "implied_volatility", "option_type"} <= set(out.columns)
        assert out["option_type"].iloc[0] == "call"

    def test_missing_required_raises(self):
        with pytest.raises(DataError):
            OptionChainDataset(pd.DataFrame({"strike_price": [100.0]}))


class TestChainDataset:
    def _chain(self):
        return OptionChainLoader.from_synthetic(n_rows=300, seed=1)

    def test_synthetic_loader(self):
        ds = self._chain()
        assert len(ds) == 300

    def test_moneyness_filter(self):
        ds = self._chain().filter_moneyness(0.9, 1.1)
        m = ds.df["underlying_price"] / ds.df["strike_price"]
        assert m.between(0.9, 1.1).all()
        assert 0 < len(ds) < 300

    def test_maturity_filter(self):
        ds = self._chain().filter_maturity(0.25, 1.0)
        assert ds.df["time_to_maturity"].between(0.25, 1.0).all()

    def test_iv_backfill_roundtrip(self):
        ds = self._chain()
        truth = ds.df["implied_volatility"].to_numpy()
        stripped = OptionChainDataset(ds.df.drop(columns=["implied_volatility"]))
        back = stripped.backfill_implied_vol(drop_failed=False)
        merged = back.df["implied_volatility"].to_numpy()
        ok = np.isfinite(merged)
        # vectorized inversion recovers the generating vols row-for-row
        assert ok.mean() > 0.95
        np.testing.assert_allclose(merged[ok], truth[ok], atol=2e-3)

    def test_to_model_input_has_features(self):
        df = self._chain().with_log_moneyness().to_model_input()
        for c in ("moneyness", "log_moneyness", "ttm_squared", "volatility_skew"):
            assert c in df.columns

    def test_load_option_data_dispatch(self):
        ds = load_option_data("synthetic", n_rows=50)
        assert len(ds) == 50
        with pytest.raises(DataError):
            load_option_data("bloomberg")

    def test_yfinance_gated(self):
        with pytest.raises(DependencyError):
            OptionChainLoader.from_yfinance("SPY")


class TestCacheRetry:
    def test_ttl_cache_expiry(self):
        now = [0.0]
        cache = TTLCache(ttl=10.0, clock=lambda: now[0])
        cache.put("k", 1)
        assert cache.get("k") == 1
        now[0] = 11.0
        assert cache.get("k") is None

    def test_rate_limiter_spaces_calls(self):
        now = [0.0]
        slept = []
        rl = RateLimiter(0.5, clock=lambda: now[0], sleep=lambda s: slept.append(s))
        rl.wait()
        rl.wait()  # immediate second call must sleep ~0.5
        assert slept and abs(slept[0] - 0.5) < 1e-9

    def test_retry_backoff_then_success(self):
        calls = {"n": 0}

        @retry_with_backoff(retries=3, base_delay=0.0, sleep=lambda s: None)
        def flaky():
            calls["n"] += 1
            if calls["n"] < 3:
                raise RuntimeError("boom")
            return 42

        assert flaky() == 42
        assert flaky.failure_count == 2

    def test_retry_exhaustion_raises(self):
        @retry_with_backoff(retries=2, base_delay=0.0, sleep=lambda s: None)
        def always_fails():
            raise RuntimeError("nope")

        with pytest.raises(DataError):
            always_fails()

    def test_client_fetch_uses_cache(self):
        client = MarketDataClient(ttl=100.0)
        calls = {"n": 0}

        def fetch():
            calls["n"] += 1
            return calls["n"]

        assert client.fetch("x", fetch) == 1
        assert client.fetch("x", fetch) == 1  # cached
        assert calls["n"] == 1


class TestBacktest:
    def _gbm_series(self, sigma=0.2, n=253, seed=0, mu=0.05):
        rng = np.random.default_rng(seed)
        dt = 1.0 / 252.0
        z = rng.standard_normal(n - 1)
        log_p = np.cumsum((mu - sigma**2 / 2) * dt + sigma * np.sqrt(dt) * z)
        return 100.0 * np.exp(np.concatenate([[0.0], log_p]))

    def test_hedged_pnl_small_when_vol_correct(self):
        # hedging at the true vol: per-path P&L is theta/gamma noise, small
        # relative to the premium
        prices = self._gbm_series(sigma=0.2, seed=3)
        res = BacktestEngine(rate=0.05).run_delta_hedge(
            prices, strike=100.0, maturity=1.0, sigma=0.2)
        assert abs(res.total_pnl) < 0.6 * res.option_premium
        assert res.daily_pnl.shape == (252,)
        assert res.n_rebalances == 252

    def test_selling_underpriced_vol_loses(self):
        # realized vol 0.4 but hedge/sell at 0.2 -> short gamma loses
        prices = self._gbm_series(sigma=0.4, seed=5)
        res = BacktestEngine(rate=0.05).run_delta_hedge(
            prices, strike=100.0, maturity=1.0, sigma=0.2)
        assert res.total_pnl < 0

    def test_selling_overpriced_vol_wins(self):
        prices = self._gbm_series(sigma=0.1, seed=7)
        res = BacktestEngine(rate=0.05).run_delta_hedge(
            prices, strike=100.0, maturity=1.0, sigma=0.35)
        assert res.total_pnl > 0

    def test_weekly_rebalance_and_stats(self):
        prices = self._gbm_series(seed=11)
        res = run_delta_hedge_backtest(prices, strike=100.0, maturity=1.0,
                                       sigma=0.2, rebalance_every=5)
        assert res.n_rebalances == int(np.ceil(252 / 5))
        assert 0.0 <= res.win_rate <= 1.0
        assert res.max_drawdown >= 0.0

    def test_sweep_grid(self):
        prices = self._gbm_series(seed=13, n=60)
        grid = BacktestEngine(rate=0.03).run_delta_hedge_sweep(
            prices, strikes=[95.0, 100.0, 105.0], sigmas=[0.15, 0.25],
            maturity=60 / 252.0)
        assert grid.shape == (3, 2)

    def test_bad_series_raises(self):
        with pytest.raises(DataError):
            BacktestEngine().run_delta_hedge(np.array([100.0, -5.0] * 10))
        with pytest.raises(DataError):
            BacktestEngine().run_delta_hedge(np.array([100.0]))

    def test_realized_vol_recovers_truth(self):
        prices = self._gbm_series(sigma=0.3, n=2000, seed=17)
        rv = realized_vol(prices, window=252)
        assert abs(np.nanmean(rv[500:]) - 0.3) < 0.05
