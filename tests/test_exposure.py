"""Exposure profiles (EE/EPE/PFE) and CVA/DVA against exact oracles.

Oracles:
  - a LONG option's discounted EE equals its time-0 BS value at EVERY
    grid date (martingale pricing: V_t >= 0 so (V_t)^+ = V_t and
    E[df V_t] = V_0);
  - the forward's PFE is the lognormal quantile mapped through its
    monotone value function (closed form);
  - flat-hazard CVA of a long option is (1-R) V_0 (1 - e^{-lambda T});
  - perfect netting (long + short of the same contract) has zero
    exposure; gross (non-netted) does not.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import norm

from optionslab_tpu.models.black_scholes import bs_price
from optionslab_tpu.risk.exposure import cva_dva, exposure_profile, xva_report
from optionslab_tpu.risk.portfolio import OptionsPortfolio, Position

S, K, T, R, SIG = 100.0, 100.0, 1.0, 0.05, 0.2


def _call(qty=1.0, strike=K, maturity=T):
    return Position(quantity=qty, spot=S, strike=strike, maturity=maturity,
                    rate=R, vol=SIG, option_type="call")


class TestMartingaleOracle:
    def test_long_call_discounted_ee_is_flat_at_v0(self):
        prof = exposure_profile([_call()], n_dates=12, n_paths=131072, seed=0)
        v0 = float(bs_price(S, K, T, R, SIG, 1.0, 0.0))
        # every date's discounted EE = V0 within MC noise (~0.03 at 131k)
        np.testing.assert_allclose(prof.ee_discounted, v0, rtol=0.02)
        # ENE of a long option is zero (up to float roundoff at tau -> 0)
        assert float(np.max(prof.ene)) < 1e-6

    def test_undiscounted_ee_grows_at_the_short_rate(self):
        prof = exposure_profile([_call()], n_dates=8, n_paths=131072, seed=1)
        v0 = float(bs_price(S, K, T, R, SIG, 1.0, 0.0))
        expect = v0 * np.exp(R * prof.dates)
        np.testing.assert_allclose(prof.ee, expect, rtol=0.02)


class TestForwardPFE:
    def test_forward_pfe_matches_lognormal_quantile(self):
        fwd = Position(quantity=1.0, spot=S, strike=K, maturity=T, rate=R,
                       vol=SIG, option_type="forward")
        q = 0.95
        prof = exposure_profile([fwd], n_dates=10, n_paths=262144, seed=2,
                                quantile=q)
        zq = norm.ppf(q)
        for j, t in enumerate(prof.dates):
            tau = T - t
            s_q = S * np.exp((R - 0.5 * SIG**2) * t + SIG * np.sqrt(t) * zq)
            v_q = max(s_q - K * np.exp(-R * tau), 0.0)
            assert abs(prof.pfe[j] - v_q) < max(0.04 * v_q, 0.25), (t, v_q)

    def test_forward_has_two_sided_exposure(self):
        fwd = Position(quantity=1.0, spot=S, strike=K, maturity=T, rate=R,
                       vol=SIG, option_type="forward")
        prof = exposure_profile([fwd], n_dates=10, n_paths=65536, seed=3)
        assert prof.ene[-1] > 0.5
        assert prof.ee[-1] > 0.5


class TestCVA:
    def test_flat_hazard_cva_closed_form(self):
        lam, rec = 0.03, 0.4
        prof = exposure_profile([_call()], n_dates=48, n_paths=131072, seed=4)
        adj = cva_dva(prof, hazard_rate=lam, recovery=rec)
        v0 = float(bs_price(S, K, T, R, SIG, 1.0, 0.0))
        exact = (1.0 - rec) * v0 * (1.0 - np.exp(-lam * T))
        assert abs(adj["cva"] - exact) < 0.03 * exact, (adj["cva"], exact)

    def test_dva_and_bcva(self):
        # strike AT THE FORWARD: V_0 = 0, and put-call parity makes
        # EE*(t) - ENE*(t) = E[df V_t] = 0 EXACTLY on the same paths,
        # so CVA == DVA under equal hazards up to the shared MC noise
        k_fwd = S * np.exp(R * T)
        fwd = Position(quantity=1.0, spot=S, strike=k_fwd, maturity=T,
                       rate=R, vol=SIG, option_type="forward")
        prof = exposure_profile([fwd], n_dates=16, n_paths=65536, seed=5)
        np.testing.assert_allclose(prof.ee_discounted, prof.ene_discounted,
                                   rtol=0.05)
        adj = cva_dva(prof, hazard_rate=0.02, own_hazard_rate=0.02)
        assert adj["dva"] == pytest.approx(adj["cva"], rel=0.05)
        assert adj["bcva"] == pytest.approx(adj["cva"] - adj["dva"])


class TestNettingAndCollateral:
    def test_perfect_netting_kills_exposure(self):
        book = [_call(qty=1.0), _call(qty=-1.0)]
        prof = exposure_profile(book, n_dates=6, n_paths=16384, seed=6)
        assert float(np.max(prof.ee)) < 1e-5
        gross = exposure_profile(book, n_dates=6, n_paths=16384, seed=6,
                                 netting=False)
        assert float(np.min(gross.ee)) > 1.0  # the long leg alone

    def test_zero_threshold_collateral_kills_long_option_exposure(self):
        prof = exposure_profile([_call()], n_dates=6, n_paths=16384, seed=7,
                                collateral_threshold=0.0, mpor=0.0)
        assert float(np.max(prof.ee)) < 1e-5

    def test_mpor_leaves_gap_risk(self):
        prof = exposure_profile([_call()], n_dates=12, n_paths=32768, seed=8,
                                collateral_threshold=0.0, mpor=2.0 / 12.0)
        # collateral lags -> residual exposure, but far below uncollateralized
        un = exposure_profile([_call()], n_dates=12, n_paths=32768, seed=8)
        assert 0.01 < prof.epe < 0.5 * un.epe

    def test_threshold_monotone(self):
        e0 = exposure_profile([_call()], n_dates=6, n_paths=16384, seed=9,
                              collateral_threshold=2.0).epe
        e1 = exposure_profile([_call()], n_dates=6, n_paths=16384, seed=9,
                              collateral_threshold=8.0).epe
        un = exposure_profile([_call()], n_dates=6, n_paths=16384, seed=9).epe
        assert e0 < e1 < un


class TestFacade:
    def test_xva_report_and_portfolio_input(self):
        book = OptionsPortfolio()
        book.add_position(_call(qty=2.0))
        book.add_position(Position(quantity=-1.0, spot=S, strike=110.0,
                                   maturity=0.5, rate=R, vol=0.25,
                                   option_type="put"))
        rep = xva_report(book, hazard_rate=0.02, n_dates=8, n_paths=8192)
        assert rep["cva"] > 0
        assert len(rep["ee"]) == 8
        assert rep["max_pfe"] >= max(rep["ee"])

    def test_validation(self):
        from optionslab_tpu.utils.exceptions import ValidationError

        with pytest.raises(ValidationError):
            exposure_profile([])
        with pytest.raises(ValidationError):
            exposure_profile([_call()], quantile=1.5)


class TestMultiUnderlying:
    def _pair(self, corr):
        a = Position(quantity=1.0, spot=S, strike=K, maturity=T, rate=R,
                     vol=SIG, option_type="call", underlying="A")
        b = Position(quantity=-1.0, spot=S, strike=K, maturity=T, rate=R,
                     vol=SIG, option_type="call", underlying="B")
        return exposure_profile([a, b], n_dates=8, n_paths=32768, seed=11,
                                corr=corr)

    def test_perfect_correlation_nets_away(self):
        prof = self._pair([[1.0, 0.999999], [0.999999, 1.0]])
        assert prof.epe < 0.05

    def test_independent_underlyings_leave_exposure(self):
        prof = self._pair([[1.0, 0.0], [0.0, 1.0]])
        assert prof.epe > 1.0
        # and default corr (identity) matches explicit identity
        prof_default = self._pair(None)
        np.testing.assert_allclose(prof.ee, prof_default.ee, rtol=1e-6)

    def test_exposure_decreases_with_correlation(self):
        epes = [self._pair([[1.0, c], [c, 1.0]]).epe
                for c in (0.0, 0.5, 0.9)]
        assert epes[0] > epes[1] > epes[2]

    def test_bad_corr_shapes_raise(self):
        from optionslab_tpu.utils.exceptions import ValidationError

        with pytest.raises(ValidationError):
            self._pair([[1.0]])
        with pytest.raises(ValidationError):
            self._pair([[1.0, 2.0], [2.0, 1.0]])  # not PSD

    def test_each_underlying_uses_its_own_spot_and_vol(self):
        # deep-ITM call on a high-spot underlying dominates the netting set
        hi = Position(quantity=1.0, spot=200.0, strike=100.0, maturity=1.0,
                      rate=R, vol=0.1, option_type="call", underlying="HI")
        lo = Position(quantity=1.0, spot=50.0, strike=100.0, maturity=1.0,
                      rate=R, vol=0.1, option_type="call", underlying="LO")
        prof = exposure_profile([hi, lo], n_dates=6, n_paths=16384, seed=12)
        from optionslab_tpu.models.black_scholes import bs_price

        v0 = (float(bs_price(200.0, 100.0, 1.0, R, 0.1, 1.0, 0.0))
              + float(bs_price(50.0, 100.0, 1.0, R, 0.1, 1.0, 0.0)))
        np.testing.assert_allclose(prof.ee_discounted, v0, rtol=0.03)


class TestCVAAllocation:
    def _book(self):
        a = _call(qty=2.0)
        b = Position(quantity=-1.0, spot=S, strike=110.0, maturity=0.8,
                     rate=R, vol=SIG, option_type="call")
        c = Position(quantity=1.0, spot=S, strike=90.0, maturity=0.5,
                     rate=R, vol=SIG, option_type="put")
        return [a, b, c]

    def test_euler_allocations_sum_exactly(self):
        from optionslab_tpu.risk import cva_allocation

        out = cva_allocation(self._book(), 0.02, method="euler",
                             n_dates=10, n_paths=16384, seed=1)
        assert abs(sum(out["allocations"]) - out["total_cva"]) < 1e-8
        assert out["total_cva"] > 0

    def test_euler_total_matches_profile_cva(self):
        from optionslab_tpu.risk import cva_allocation

        book = self._book()
        out = cva_allocation(book, 0.02, method="euler", n_dates=10,
                             n_paths=16384, seed=1)
        prof = exposure_profile(book, n_dates=10, n_paths=16384, seed=1)
        ref = cva_dva(prof, 0.02)["cva"]
        assert out["total_cva"] == pytest.approx(ref, rel=1e-5)

    def test_hedge_trade_gets_negative_allocation(self):
        from optionslab_tpu.risk import cva_allocation

        # short call partially hedges the long call -> negative marginal CVA
        book = [_call(qty=1.0), _call(qty=-0.5)]
        out = cva_allocation(book, 0.02, method="euler", n_dates=8,
                             n_paths=16384, seed=2)
        assert out["allocations"][0] > 0 > out["allocations"][1]

    def test_incremental_view(self):
        from optionslab_tpu.risk import cva_allocation

        book = [_call(qty=1.0), _call(qty=-0.5)]
        out = cva_allocation(book, 0.02, method="incremental", n_dates=8,
                             n_paths=16384, seed=2)
        # tearing up the hedge RAISES CVA -> its incremental value is < 0
        assert out["allocations"][1] < 0
        # single-trade incremental == its standalone CVA == the total of
        # the remaining book complement identity
        solo = cva_allocation([_call()], 0.02, method="incremental",
                              n_dates=8, n_paths=16384, seed=3)
        assert solo["allocations"][0] == pytest.approx(solo["total_cva"])

    def test_validation(self):
        from optionslab_tpu.risk import cva_allocation
        from optionslab_tpu.utils.exceptions import ValidationError

        with pytest.raises(ValidationError):
            cva_allocation([], 0.02)
        with pytest.raises(ValidationError):
            cva_allocation([_call()], 0.02, method="nope")


class TestCVAGreeks:
    def test_long_call_cva_greeks_match_scaled_bs(self):
        """EE*(t) = V0 for a long option, so CVA = (1-R) V0 (1-e^{-lam T})
        and every market sensitivity is the BS Greek times that scale."""
        from optionslab_tpu.models.black_scholes import bs_greeks
        from optionslab_tpu.risk import cva_greeks

        lam, rec = 0.03, 0.4
        g = cva_greeks([_call()], lam, rec, n_dates=16, n_paths=131072,
                       seed=0)
        scale = (1.0 - rec) * (1.0 - np.exp(-lam * T))
        bs = bs_greeks(S, K, T, R, SIG, 1.0, 0.0)
        v0 = float(bs_price(S, K, T, R, SIG, 1.0, 0.0))
        assert g["cva"] == pytest.approx(scale * v0, rel=0.02)
        assert g["cva_delta"]["UND"] == pytest.approx(
            scale * float(bs["delta"]), rel=0.03)
        assert g["cva_vega"]["UND"] == pytest.approx(
            scale * float(bs["vega"]), rel=0.05)
        # dCVA/dlambda = (1-R) V0 T e^{-lam T}
        assert g["cva_hazard_sens"] == pytest.approx(
            0.6 * v0 * T * np.exp(-lam * T), rel=0.03)

    def test_cva_rho_via_crn_fd(self):
        from optionslab_tpu.risk import cva_greeks

        g = cva_greeks([_call()], 0.03, n_dates=12, n_paths=32768, seed=1)
        h = 1e-3
        up = cva_greeks([_call()], 0.03, n_dates=12, n_paths=32768, seed=1,
                        rate=R + h)["cva"]
        dn = cva_greeks([_call()], 0.03, n_dates=12, n_paths=32768, seed=1,
                        rate=R - h)["cva"]
        assert g["cva_rho"] == pytest.approx((up - dn) / (2 * h), abs=0.05)

    def test_hedged_book_has_reduced_cva_delta(self):
        from optionslab_tpu.risk import cva_greeks

        g_naked = cva_greeks([_call()], 0.02, n_dates=8, n_paths=16384,
                             seed=2)
        # a short forward hedges the delta but keeps CVA positive
        fwd = Position(quantity=-0.6, spot=S, strike=S * np.exp(R * T),
                       maturity=T, rate=R, vol=SIG, option_type="forward")
        g_hedged = cva_greeks([_call(), fwd], 0.02, n_dates=8,
                              n_paths=16384, seed=2)
        assert abs(g_hedged["cva_delta"]["UND"]) < abs(
            g_naked["cva_delta"]["UND"])


class TestHestonExposure:
    """Stochastic-vol exposure: martingale oracle, GBM limit, netting."""

    def _params(self, **kw):
        from optionslab_tpu.models.heston import HestonParams

        return HestonParams.make(**kw)

    def test_long_call_martingale_under_heston(self):
        from optionslab_tpu.models.heston import heston_price
        from optionslab_tpu.risk.exposure_heston import \
            heston_exposure_profile
        from optionslab_tpu.types import ContractBatch

        p = self._params()
        prof = heston_exposure_profile([_call()], p, n_dates=12, n_sub=4,
                                       n_paths=32768, seed=0)
        v0 = float(heston_price(
            ContractBatch.make(S, K, T, R, SIG, "call"), p))
        np.testing.assert_allclose(prof.ee_discounted, v0, rtol=0.025)
        assert float(np.max(prof.ene)) < 1e-5
        assert np.all(prof.pfe >= prof.ee - 1e-6)

    def test_sigma_v_zero_limit_matches_gbm_engine(self):
        from optionslab_tpu.risk.exposure_heston import \
            heston_exposure_profile

        # v0 = theta, sigma_v ~ 0: variance pinned at 0.04 -> GBM sigma=0.2.
        # rho=0 keeps the QE martingale-correction terms (k0, k1 carry
        # rho/sigma) from blowing up into f32 cancellation at tiny sigma_v
        p = self._params(v0=0.04, theta=0.04, sigma=1e-3, kappa=2.0,
                         rho=0.0)
        hp = heston_exposure_profile([_call()], p, n_dates=8, n_sub=4,
                                     n_paths=32768, seed=1)
        gp = exposure_profile([_call()], n_dates=8, n_paths=32768, seed=2)
        np.testing.assert_allclose(hp.ee, gp.ee, rtol=0.03)
        np.testing.assert_allclose(hp.pfe, gp.pfe, rtol=0.03)

    def test_perfect_netting_and_gross(self):
        from optionslab_tpu.risk.exposure_heston import \
            heston_exposure_profile

        p = self._params()
        book = [_call(qty=1.0), _call(qty=-1.0)]
        net = heston_exposure_profile(book, p, n_dates=6, n_paths=8192)
        assert float(np.max(net.ee)) < 1e-4
        gross = heston_exposure_profile(book, p, n_dates=6, n_paths=8192,
                                        netting=False)
        assert float(np.min(gross.ee)) > 1.0

    def test_cva_closed_form_under_heston(self):
        from optionslab_tpu.models.heston import heston_price
        from optionslab_tpu.risk.exposure_heston import \
            heston_exposure_profile
        from optionslab_tpu.types import ContractBatch

        p = self._params()
        prof = heston_exposure_profile([_call()], p, n_dates=24, n_sub=2,
                                       n_paths=32768, seed=3)
        adj = cva_dva(prof, hazard_rate=0.03, recovery=0.4)
        v0 = float(heston_price(
            ContractBatch.make(S, K, T, R, SIG, "call"), p))
        exact = 0.6 * v0 * (1.0 - np.exp(-0.03))
        assert adj["cva"] == pytest.approx(exact, rel=0.05)

    def test_validation(self):
        from optionslab_tpu.risk.exposure_heston import \
            heston_exposure_profile
        from optionslab_tpu.utils.exceptions import ValidationError

        p = self._params()
        with pytest.raises(ValidationError):
            heston_exposure_profile([], p)
        with pytest.raises(ValidationError):
            a = _call()
            b = Position(1.0, 100.0, 100.0, 1.0, R, SIG, "call",
                         underlying="OTHER")
            heston_exposure_profile([a, b], p)


class TestWrongWayRisk:
    def test_beta_zero_is_exactly_the_plain_estimator(self):
        from optionslab_tpu.risk import cva_wwr

        out = cva_wwr([_call()], 0.03, wwr_beta=0.0, n_dates=12,
                      n_paths=16384, seed=0)
        assert out["wwr_ratio"] == pytest.approx(1.0, abs=1e-6)
        # and the beta=0 number sits near the profile-based CVA
        prof = exposure_profile([_call()], n_dates=12, n_paths=16384,
                                seed=0)
        ref = cva_dva(prof, 0.03)["cva"]
        assert out["cva_beta0"] == pytest.approx(ref, rel=0.05)

    def test_put_book_is_wrong_way_call_book_is_right_way(self):
        from optionslab_tpu.risk import cva_wwr

        put = Position(quantity=1.0, spot=S, strike=K, maturity=T, rate=R,
                       vol=SIG, option_type="put")
        w_put = cva_wwr([put], 0.03, wwr_beta=3.0, n_dates=12,
                        n_paths=32768, seed=1)
        w_call = cva_wwr([_call()], 0.03, wwr_beta=3.0, n_dates=12,
                         n_paths=32768, seed=1)
        # put exposure peaks where S is low = where default intensity
        # peaks -> CVA amplified; call exposure is anti-correlated
        assert w_put["wwr_ratio"] > 1.1
        assert w_call["wwr_ratio"] < 0.9

    def test_wwr_monotone_in_beta(self):
        from optionslab_tpu.risk import cva_wwr

        put = Position(quantity=1.0, spot=S, strike=K, maturity=T, rate=R,
                       vol=SIG, option_type="put")
        ratios = [cva_wwr([put], 0.03, wwr_beta=b, n_dates=8,
                          n_paths=16384, seed=2)["wwr_ratio"]
                  for b in (0.0, 2.0, 5.0)]
        assert ratios[0] < ratios[1] < ratios[2]


class TestBaselMetrics:
    def test_effective_ee_and_eepe(self):
        # a short-dated deal rolls off: EE drops, effective EE must not
        short = _call(maturity=0.4)
        prof = exposure_profile([short], horizon=1.0, n_dates=10,
                                n_paths=16384, seed=3)
        eff = prof.effective_ee
        assert np.all(np.diff(eff) >= -1e-9)
        assert np.all(eff >= prof.ee - 1e-9)
        assert eff[-1] == pytest.approx(prof.ee.max())
        assert prof.eepe >= float(np.mean(prof.ee)) - 1e-9
        d = prof.to_dict()
        assert "eepe" in d and len(d["effective_ee"]) == 10


class TestAMCExposure:
    """Regression (Longstaff-Schwartz) revaluation exposure for
    path-dependent trades, out-of-sample split."""

    def _cf_vanilla(self):
        from optionslab_tpu.risk.exposure import exposure_profile
        from optionslab_tpu.risk.portfolio import Position
        return exposure_profile(
            [Position(quantity=1.0, strike=100.0, maturity=1.0, vol=0.2,
                      option_type="call", spot=100.0, rate=0.05)],
            horizon=1.0, n_dates=12, n_paths=65536, rate=0.05)

    def test_vanilla_reproduces_closed_form_engine(self):
        from optionslab_tpu.risk import ExoticPosition, amc_exposure_profile
        amc = amc_exposure_profile(
            [ExoticPosition(kind="vanilla", strike=100.0, maturity=1.0,
                            vol=0.2)],
            spot=100.0, rate=0.05, n_paths=65536, n_dates=12)
        cf = self._cf_vanilla()
        np.testing.assert_allclose(amc.ee, cf.ee, rtol=0.04)
        np.testing.assert_allclose(amc.pfe, cf.pfe, rtol=0.06)

    def test_asian_martingale_oracle(self):
        """long-option E[df V-hat] == V0 at EVERY date (out-of-sample
        split keeps the positive-part bias at basis-residual scale)."""
        from optionslab_tpu.models.exotics import asian_price
        from optionslab_tpu.risk import ExoticPosition, amc_exposure_profile
        amc = amc_exposure_profile(
            [ExoticPosition(kind="asian_arith", strike=100.0, maturity=1.0,
                            vol=0.2)],
            spot=100.0, rate=0.05, n_paths=131072, n_dates=12, n_sub=8)
        v0 = float(asian_price(100.0, 100.0, 1.0, 0.05, 0.2,
                               jax.random.PRNGKey(9), n_paths=200_000,
                               n_steps=96))
        assert np.abs(amc.ee_discounted - v0).max() < 0.04 * v0

    def test_barrier_in_out_parity_of_profiles(self):
        """knock-in + knock-out EE == vanilla EE at every date (the hit
        state routes each path to exactly one of the two marks)."""
        from optionslab_tpu.risk import ExoticPosition, amc_exposure_profile
        amc = amc_exposure_profile(
            [ExoticPosition(kind="barrier_up-and-in", strike=100.0,
                            barrier=120.0, maturity=1.0, vol=0.2),
             ExoticPosition(kind="barrier_up-and-out", strike=100.0,
                            barrier=120.0, maturity=1.0, vol=0.2)],
            spot=100.0, rate=0.05, n_paths=65536, n_dates=12)
        cf = self._cf_vanilla()
        np.testing.assert_allclose(amc.ee, cf.ee, rtol=0.05)

    def test_netting_and_cva_compose(self):
        """a short vanilla nets against a long barrier; the result feeds
        cva_dva unchanged."""
        from optionslab_tpu.risk import (ExoticPosition,
                                         amc_exposure_profile, cva_dva)
        amc = amc_exposure_profile(
            [ExoticPosition(kind="barrier_up-and-out", strike=100.0,
                            barrier=140.0, maturity=1.0, vol=0.2),
             ExoticPosition(kind="vanilla", quantity=-1.0, strike=100.0,
                            maturity=1.0, vol=0.2)],
            spot=100.0, rate=0.05, n_paths=32768, n_dates=8)
        # far barrier: the pair nearly cancels -> EE well below the
        # standalone vanilla's
        assert amc.ee.max() < 3.0
        out = cva_dva(amc, hazard_rate=0.02)
        assert 0.0 <= out["cva"] < 1.0

    def test_validation(self):
        from optionslab_tpu.risk import ExoticPosition, amc_exposure_profile
        from optionslab_tpu.utils.exceptions import ValidationError
        with pytest.raises(ValidationError):
            amc_exposure_profile([])
        with pytest.raises(ValidationError):
            amc_exposure_profile([ExoticPosition(kind="rainbow")])
        with pytest.raises(ValidationError):
            amc_exposure_profile(
                [ExoticPosition(kind="barrier_up-and-out", barrier=0.0)])
        with pytest.raises(ValidationError):
            amc_exposure_profile([ExoticPosition()], n_paths=12345)


class TestHestonAMCExposure:
    """Smile-consistent AMC: the regression state gains the instantaneous
    variance; knocked-in vanillas mark by a second regression."""
    def _hp(self):
        from optionslab_tpu.models.heston import HestonParams
        return HestonParams.make(0.04, 2.0, 0.04, 0.3, -0.7)

    def test_vanilla_matches_cf_table_engine(self):
        from optionslab_tpu.risk import ExoticPosition, amc_exposure_profile
        from optionslab_tpu.risk.exposure_heston import (
            heston_exposure_profile)
        amc = amc_exposure_profile(
            [ExoticPosition(kind="vanilla", strike=100.0, maturity=1.0)],
            spot=100.0, rate=0.05, n_paths=65536, n_dates=12,
            heston_params=self._hp())
        cf = heston_exposure_profile(
            [Position(quantity=1.0, strike=100.0, maturity=1.0, vol=0.2,
                      option_type="call", spot=100.0, rate=0.05)],
            self._hp(), horizon=1.0, n_dates=12, n_paths=65536, rate=0.05,
            spot=100.0)
        np.testing.assert_allclose(amc.ee, cf.ee, rtol=0.04)

    @pytest.mark.slow
    def test_asian_martingale_under_heston(self):
        from optionslab_tpu.models.heston_exotics import heston_exotic_price
        from optionslab_tpu.risk import ExoticPosition, amc_exposure_profile
        amc = amc_exposure_profile(
            [ExoticPosition(kind="asian_arith", strike=100.0,
                            maturity=1.0)],
            spot=100.0, rate=0.05, n_paths=131072, n_dates=12, n_sub=8,
            heston_params=self._hp())
        v0 = float(heston_exotic_price(
            "asian_arith", 100.0, 100.0, 1.0, 0.05, self._hp(),
            jax.random.PRNGKey(4), scheme="qe", n_paths=200_000,
            n_steps=96))
        assert np.abs(amc.ee_discounted - v0).max() < 0.04 * v0

    def test_barrier_in_out_parity_under_heston(self):
        from optionslab_tpu.risk import ExoticPosition, amc_exposure_profile
        from optionslab_tpu.risk.exposure_heston import (
            heston_exposure_profile)
        amc = amc_exposure_profile(
            [ExoticPosition(kind="barrier_up-and-in", strike=100.0,
                            barrier=120.0, maturity=1.0),
             ExoticPosition(kind="barrier_up-and-out", strike=100.0,
                            barrier=120.0, maturity=1.0)],
            spot=100.0, rate=0.05, n_paths=65536, n_dates=12,
            heston_params=self._hp())
        cf = heston_exposure_profile(
            [Position(quantity=1.0, strike=100.0, maturity=1.0, vol=0.2,
                      option_type="call", spot=100.0, rate=0.05)],
            self._hp(), horizon=1.0, n_dates=12, n_paths=65536, rate=0.05,
            spot=100.0)
        np.testing.assert_allclose(amc.ee, cf.ee, rtol=0.06)


class TestFVA:
    def test_fva_closed_form_for_long_option(self):
        """long option: EE*(t) == V0 for all t (martingale), ENE == 0, so
        FVA == s * V0 * T exactly up to profile noise."""
        from optionslab_tpu.models.black_scholes import bs_price as _bs
        prof = exposure_profile(
            [Position(quantity=1.0, strike=100.0, maturity=1.0, vol=0.2,
                      option_type="call", spot=100.0, rate=0.05)],
            horizon=1.0, n_dates=12, n_paths=65536, rate=0.05)
        out = cva_dva(prof, hazard_rate=0.02, funding_spread=0.01)
        v0 = float(_bs(100.0, 100.0, 1.0, 0.05, 0.2, 1.0, 0.0))
        assert out["fba"] == pytest.approx(0.0, abs=1e-6)
        assert out["fva"] == pytest.approx(0.01 * v0 * 1.0, rel=0.02)
        assert out["fca"] == out["fva"]

    def test_fva_sign_flips_with_position(self):
        prof = exposure_profile(
            [Position(quantity=-1.0, strike=100.0, maturity=1.0, vol=0.2,
                      option_type="call", spot=100.0, rate=0.05)],
            horizon=1.0, n_dates=12, n_paths=65536, rate=0.05)
        out = cva_dva(prof, hazard_rate=0.02, funding_spread=0.01)
        assert out["fva"] < 0  # pure benefit: we always owe them

    def test_negative_spread_rejected(self):
        prof = exposure_profile(
            [Position(quantity=1.0, strike=100.0, maturity=1.0, vol=0.2,
                      option_type="call", spot=100.0, rate=0.05)],
            horizon=1.0, n_dates=6, n_paths=16384, rate=0.05)
        from optionslab_tpu.utils.exceptions import ValidationError
        with pytest.raises(ValidationError):
            cva_dva(prof, hazard_rate=0.02, funding_spread=-0.01)


class TestBatesAndSLVAMCExposure:
    """The payoff x dynamics matrix's last exposure cells: AMC exposure
    under jumps (Bates) and under the frozen-leverage Euler-SLV law."""

    def test_bates_lam_zero_is_bitwise_heston(self):
        from optionslab_tpu.models.bates import BatesParams
        from optionslab_tpu.models.heston import HestonParams
        from optionslab_tpu.risk import ExoticPosition, amc_exposure_profile

        book = [ExoticPosition(kind="asian_arith", strike=100.0,
                               maturity=1.0)]
        hp = HestonParams.make(0.04, 2.0, 0.04, 0.3, -0.7)
        bp = BatesParams.make(0.04, 2.0, 0.04, 0.3, -0.7, lam=0.0,
                              mu_j=-0.1, sigma_j=0.15)
        a = amc_exposure_profile(book, spot=100.0, rate=0.05,
                                 n_paths=16384, n_dates=6, n_sub=4,
                                 heston_params=hp)
        b = amc_exposure_profile(book, spot=100.0, rate=0.05,
                                 n_paths=16384, n_dates=6, n_sub=4,
                                 heston_params=bp)
        # poisson(0) == 0 always and jump keys ride a disjoint fold_in
        # branch: lam=0 must reproduce the Heston profile EXACTLY
        np.testing.assert_array_equal(a.ee, b.ee)
        np.testing.assert_array_equal(a.pfe, b.pfe)

    def test_bates_martingale_oracle_and_jump_widening(self):
        """E[df V-hat] == V0 under jumps, and negative jumps WIDEN the
        put book's PFE vs pure Heston at matched diffusion."""
        from optionslab_tpu.models.bates import BatesParams, bates_mc_price
        from optionslab_tpu.models.heston import HestonParams
        from optionslab_tpu.risk import ExoticPosition, amc_exposure_profile
        from optionslab_tpu.types import ContractBatch

        bp = BatesParams.make(0.04, 2.0, 0.04, 0.3, -0.7, lam=0.8,
                              mu_j=-0.12, sigma_j=0.15)
        book = [ExoticPosition(kind="vanilla", strike=100.0, maturity=1.0,
                               option_type="put")]
        amc = amc_exposure_profile(book, spot=100.0, rate=0.05,
                                   n_paths=65536, n_dates=8, n_sub=4,
                                   heston_params=bp)
        batch = ContractBatch.make(100.0, 100.0, 1.0, 0.05, 0.2, "put")
        v0 = float(np.asarray(bates_mc_price(
            batch, bp, jax.random.PRNGKey(3), n_paths=200_000,
            n_steps=64)).ravel()[0])
        assert np.abs(amc.ee_discounted - v0).max() < 0.06 * v0
        hp = HestonParams.make(0.04, 2.0, 0.04, 0.3, -0.7)
        ref = amc_exposure_profile(book, spot=100.0, rate=0.05,
                                   n_paths=65536, n_dates=8, n_sub=4,
                                   heston_params=hp)
        assert amc.pfe[-1] > ref.pfe[-1]

    def test_slv_flat_mixing0_matches_gbm_profile(self):
        """Flat surface + mixing->0: the frozen-leverage law IS exact
        constant-vol log-Euler, so the SLV profile must match the GBM
        AMC profile statistically."""
        from types import SimpleNamespace

        from optionslab_tpu.models.heston import HestonParams
        from optionslab_tpu.models.local_vol import LocalVolSurface
        from optionslab_tpu.risk import ExoticPosition, amc_exposure_profile

        flat = LocalVolSurface(jnp.linspace(-3.0, 3.0, 11),
                               jnp.linspace(0.01, 2.0, 9),
                               jnp.full((9, 11), 0.2), 100.0, 0.05)
        dup = SimpleNamespace(surface=flat, spot=100.0, rate=0.05,
                              dividend=0.0)
        hp = HestonParams.make(0.04, 2.0, 0.04, 0.5, -0.7)
        book = [ExoticPosition(kind="asian_arith", strike=100.0,
                               maturity=1.0, vol=0.2)]
        slv = amc_exposure_profile(book, spot=100.0, rate=0.05,
                                   n_paths=65536, n_dates=8, n_sub=4,
                                   heston_params=hp, dupire=dup,
                                   mixing=0.0)
        gbm = amc_exposure_profile(book, spot=100.0, rate=0.05,
                                   n_paths=65536, n_dates=8, n_sub=4)
        np.testing.assert_allclose(slv.ee, gbm.ee, rtol=0.06, atol=0.05)

    def test_slv_martingale_oracle_full_mixing(self):
        """E[df V-hat] == V0 under the smile + full vol-of-vol, V0 from
        the independent SLV particle engine."""
        from optionslab_tpu.models.heston import HestonParams
        from optionslab_tpu.models.local_vol import (DupireLocalVol,
                                                     sample_smile_iv_fn)
        from optionslab_tpu.models.slv import slv_exotic_price
        from optionslab_tpu.risk import ExoticPosition, amc_exposure_profile

        dup = DupireLocalVol(sample_smile_iv_fn(), 100.0, 0.05)
        hp = HestonParams.make(0.04, 2.0, 0.04, 0.5, -0.7)
        book = [ExoticPosition(kind="asian_arith", strike=100.0,
                               maturity=1.0)]
        amc = amc_exposure_profile(book, spot=100.0, rate=0.05,
                                   n_paths=65536, n_dates=8, n_sub=4,
                                   heston_params=hp, dupire=dup,
                                   mixing=1.0)
        v0, se = slv_exotic_price(
            "asian_arith", 100.0, 100.0, 1.0, 0.05, hp,
            jax.random.PRNGKey(11), dup.surface.k_grid, dup.surface.t_grid,
            dup.surface.grid, mixing=1.0, n_paths=131_072, n_steps=32,
            return_stderr=True)
        assert np.abs(amc.ee_discounted - float(v0)).max() \
            < 0.05 * float(v0) + 3 * float(se)

    def test_slv_requires_heston_params(self):
        from optionslab_tpu.risk import ExoticPosition, amc_exposure_profile
        from optionslab_tpu.utils.exceptions import ValidationError

        with pytest.raises(ValidationError):
            amc_exposure_profile(
                [ExoticPosition(kind="vanilla")], dupire=object())


class TestRBergomiAMCExposure:
    """The matrix's LAST exposure cell: AMC exposure under the exact
    (non-Markovian) rough-Bergomi law. The regression state is
    (S, v, m) with m = E[V~_next | F_t] from the causal Volterra
    factorization — the same feature set the certified rough American
    bracket uses."""

    def _rough(self):
        from optionslab_tpu.models.rbergomi import RBergomiParams
        return RBergomiParams(hurst=0.1, eta=1.9, rho=-0.9, xi0=0.04)

    def test_eta_zero_matches_gbm_profile(self):
        """eta -> 0: the rough law IS GBM at vol = sqrt(xi0), so the
        profile must match the plain-GBM AMC branch statistically."""
        from optionslab_tpu.models.rbergomi import RBergomiParams
        from optionslab_tpu.risk import ExoticPosition, amc_exposure_profile

        book = [ExoticPosition(kind="asian_arith", strike=100.0,
                               maturity=1.0, vol=0.2)]
        rb = amc_exposure_profile(
            book, spot=100.0, rate=0.05, n_paths=32768, n_dates=8, n_sub=4,
            rbergomi_params=RBergomiParams(hurst=0.1, eta=1e-6, rho=-0.9,
                                           xi0=0.04))
        gbm = amc_exposure_profile(book, spot=100.0, rate=0.05,
                                   n_paths=32768, n_dates=8, n_sub=4)
        np.testing.assert_allclose(rb.ee, gbm.ee, rtol=0.06, atol=0.05)

    def test_rough_martingale_oracle(self):
        """E[df V-hat] == V0 at full roughness, V0 from the independent
        European engine at the SAME step count (both integrate the exact
        variance law with left-point log-Euler, so matching n_steps
        isolates the AMC regression error from discretization bias)."""
        from optionslab_tpu.models.rbergomi import rbergomi_price
        from optionslab_tpu.risk import ExoticPosition, amc_exposure_profile

        book = [ExoticPosition(kind="vanilla", strike=100.0, maturity=1.0,
                               option_type="put")]
        amc = amc_exposure_profile(book, spot=100.0, rate=0.05,
                                   n_paths=65536, n_dates=8, n_sub=4,
                                   rbergomi_params=self._rough())
        pr, se = rbergomi_price(100.0, 100.0, 1.0, 0.05, self._rough(),
                                jax.random.PRNGKey(7), option_type="put",
                                n_paths=131072, n_steps=32)
        v0 = float(np.asarray(pr).ravel()[0])
        assert np.abs(amc.ee_discounted - v0).max() \
            < 0.05 * v0 + 3 * float(np.asarray(se).ravel()[0])

    def test_rough_widens_short_dated_put_tail_vs_flat(self):
        """At matched total variance, rough vol-of-vol (eta=1.9) fattens
        the left tail: the OTM put book's early-date PFE exceeds the
        eta->0 profile's. (The heavy-tail direction for a PUT under
        rho<0 is unambiguous, unlike symmetric-collar cliquets.)"""
        from optionslab_tpu.models.rbergomi import RBergomiParams
        from optionslab_tpu.risk import ExoticPosition, amc_exposure_profile

        book = [ExoticPosition(kind="vanilla", strike=80.0, maturity=0.5,
                               option_type="put", vol=0.2)]
        rough = amc_exposure_profile(book, spot=100.0, rate=0.02,
                                     n_paths=65536, n_dates=6, n_sub=4,
                                     rbergomi_params=self._rough(),
                                     quantile=0.99)
        flat = amc_exposure_profile(
            book, spot=100.0, rate=0.02, n_paths=65536, n_dates=6, n_sub=4,
            rbergomi_params=RBergomiParams(hurst=0.1, eta=1e-6, rho=-0.9,
                                           xi0=0.04), quantile=0.99)
        assert rough.pfe[1] > flat.pfe[1]

    def test_rbergomi_exclusive_with_other_dynamics(self):
        from optionslab_tpu.models.heston import HestonParams
        from optionslab_tpu.risk import ExoticPosition, amc_exposure_profile
        from optionslab_tpu.utils.exceptions import ValidationError

        with pytest.raises(ValidationError):
            amc_exposure_profile(
                [ExoticPosition(kind="vanilla")],
                rbergomi_params=self._rough(),
                heston_params=HestonParams.make(0.04, 2.0, 0.04, 0.3, -0.7))


class TestHighVolRegression:
    """Round-5: at vol ~0.9 the raw polynomial feature columns span
    orders of magnitude and the f32 Gram matrix went singular — NaN
    EPE/PFE. The per-date column-RMS normalization (solve in normalized
    space, evaluate with the SAME scales) keeps every date finite."""

    def test_high_vol_profile_finite_and_monotone(self):
        from optionslab_tpu.risk import ExoticPosition, amc_exposure_profile

        book = [ExoticPosition(kind="vanilla", quantity=1.0, strike=100.0,
                               maturity=1.0, option_type="call", vol=0.2)]
        epes = []
        for v in (0.2, 0.5, 0.9):
            prof = amc_exposure_profile(book, spot=100.0, rate=0.03,
                                        vol=v, n_dates=6, n_paths=8192,
                                        seed=0)
            assert np.isfinite(prof.epe), v
            assert np.all(np.isfinite(np.asarray(prof.ee))), v
            assert np.all(np.isfinite(np.asarray(prof.pfe))), v
            epes.append(float(prof.epe))
        # exposure of a long call grows with dynamics vol
        assert epes[0] < epes[1] < epes[2]
