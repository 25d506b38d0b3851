"""Certified multi-asset Bermudan max-call bracket.

Oracles: the published Broadie–Glasserman / Andersen–Broadie 2-asset
benchmark values (T=3, 9 dates, r=5%, q=10%, sigma=20%, rho=0:
8.075 / 13.902 / 21.345 at S0=90/100/110); d=1 with q=0 collapses to
the European call (early exercise never optimal); the lower bound
dominates the European max-call on the same dynamics.
"""

import jax
import numpy as np
import pytest

from optionslab_tpu.models.black_scholes import bs_price
from optionslab_tpu.models.multi_asset_american import max_call_bracket
from optionslab_tpu.utils.exceptions import ValidationError

BG = {90.0: 8.075, 100.0: 13.902, 110.0: 21.345}
KW = dict(maturity=3.0, rate=0.05, dividend=0.10, n_dates=9)


class TestBenchmark:
    def test_bg_atm_point_smoke(self):
        b = max_call_bracket([100.0, 100.0], 100.0, vols=[0.2, 0.2],
                             n_fit=50_000, n_lower=100_000, n_outer=1024,
                             n_inner=256, seed=0, **KW)
        true = BG[100.0]
        assert b["lower"] - 3 * b["lower_se"] <= true <= b["upper"] + 3 * b["upper_se"]
        assert b["width"] < 0.1, b
        assert b["upper"] >= b["lower"] - 3 * (b["lower_se"] + b["upper_se"])

    @pytest.mark.slow
    def test_bg_table_all_moneyness(self):
        for s0, true in BG.items():
            b = max_call_bracket([s0, s0], 100.0, vols=[0.2, 0.2],
                                 n_fit=100_000, n_lower=200_000,
                                 n_outer=2048, n_inner=512, seed=1, **KW)
            lo = b["lower"] - 3 * b["lower_se"]
            hi = b["upper"] + 3 * b["upper_se"]
            assert lo <= true <= hi, (s0, b, true)
            assert b["width"] < 0.05, (s0, b)


class TestReductions:
    def test_single_asset_no_dividend_is_european(self):
        # q=0 call: never exercise early -> bracket pins the BS price
        b = max_call_bracket([100.0], 100.0, maturity=1.0, rate=0.05,
                             vols=[0.2], dividend=0.0, n_dates=6,
                             n_fit=50_000, n_lower=100_000, n_outer=1024,
                             n_inner=256, seed=2)
        euro = float(bs_price(100.0, 100.0, 1.0, 0.05, 0.2, 1.0, 0.0))
        assert b["lower"] - 3 * b["lower_se"] <= euro <= b["upper"] + 3 * b["upper_se"]

    def test_lower_dominates_european_max_call(self):
        from optionslab_tpu.models.multi_asset import rainbow_price

        b = max_call_bracket([100.0, 100.0], 100.0, vols=[0.2, 0.2],
                             n_fit=50_000, n_lower=100_000, n_outer=512,
                             n_inner=128, seed=3, **KW)
        euro, se = rainbow_price([100.0, 100.0], 100.0, 3.0, 0.05,
                                 [0.2, 0.2], np.eye(2),
                                 jax.random.PRNGKey(9), dividends=0.10,
                                 n_paths=200_000, return_stderr=True)
        assert b["lower"] > float(euro) - 3 * (b["lower_se"] + float(se))
        # with q=10% the early-exercise premium is large and must show
        assert b["lower"] > float(euro) + 1.0

    def test_correlation_lowers_the_max_call(self):
        # higher correlation -> less dispersion in the max -> lower value
        vals = []
        for rho in (0.0, 0.6):
            b = max_call_bracket([100.0, 100.0], 100.0, vols=[0.2, 0.2],
                                 corr=[[1.0, rho], [rho, 1.0]],
                                 n_fit=30_000, n_lower=50_000, n_outer=512,
                                 n_inner=128, seed=4, **KW)
            vals.append(0.5 * (b["lower"] + b["upper"]))
        assert vals[1] < vals[0] - 1.0


class TestValidation:
    def test_bad_inputs(self):
        with pytest.raises(ValidationError):
            max_call_bracket([100.0, 100.0], 100.0, maturity=-1.0, rate=0.05,
                             vols=[0.2, 0.2])
        with pytest.raises(ValidationError):
            max_call_bracket([100.0, 100.0], 100.0, maturity=1.0, rate=0.05,
                             vols=[0.2, 0.2], corr=[[1.0]])


class TestMinPut:
    def test_d1_min_put_overlaps_the_certified_gbm_bermudan(self):
        """Cross-machinery oracle: the d=1 'min-put' IS the standard
        Bermudan put — its bracket must overlap the independent
        grid-engine certificate on the same date grid."""
        from optionslab_tpu.models import american_price_interval
        from optionslab_tpu.models.multi_asset_american import \
            max_call_bracket

        b = max_call_bracket([100.0], 100.0, maturity=1.0, rate=0.05,
                             vols=[0.2], dividend=0.0, n_dates=9,
                             kind="min_put", n_fit=50_000, n_lower=100_000,
                             n_outer=1024, n_inner=256, seed=5)
        ref = american_price_interval(100.0, 100.0, 1.0, 0.05, 0.2, cp=-1.0,
                                      n_dates=9, method="grid", n_grid=512,
                                      n_lower=50_000, n_outer=50_000)
        lo = max(b["lower"] - 3 * b["lower_se"], ref["lower"] - 3 * ref["lower_se"])
        hi = min(b["upper"] + 3 * b["upper_se"], ref["upper"] + 3 * ref["upper_se"])
        assert lo <= hi, (b, ref)
        assert b["width"] < 0.05

    def test_min_put_worth_more_than_single_puts(self):
        from optionslab_tpu.models.multi_asset_american import \
            max_call_bracket

        two = max_call_bracket([100.0, 100.0], 100.0, maturity=1.0,
                               rate=0.05, vols=[0.2, 0.2], dividend=0.0,
                               n_dates=9, kind="min_put", n_fit=30_000,
                               n_lower=50_000, n_outer=512, n_inner=128,
                               seed=6)
        one = max_call_bracket([100.0], 100.0, maturity=1.0, rate=0.05,
                               vols=[0.2], dividend=0.0, n_dates=9,
                               kind="min_put", n_fit=30_000,
                               n_lower=50_000, n_outer=512, n_inner=128,
                               seed=6)
        # min of two assets is stochastically smaller -> dearer put
        assert two["lower"] > one["upper"] + 1.0

    def test_unknown_kind_raises(self):
        from optionslab_tpu.models.multi_asset_american import \
            max_call_bracket

        with pytest.raises(ValidationError):
            max_call_bracket([100.0], 100.0, maturity=1.0, rate=0.05,
                             vols=[0.2], kind="nope")
