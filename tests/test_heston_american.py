"""Certified American-under-Heston bracket: LSM lower + AB nested dual.

Oracles:
 - frozen-variance degeneration (sigma→0, v0=theta): Heston IS BS, so the
   bracket must contain the 1-D American PDE/binomial value;
 - the Douglas-ADI Heston-American must sit inside
   [lower − 3se, continuous_upper + 3se];
 - ordering sanity: European Lewis < lower, upper bounded.
"""

import numpy as np
import pytest

import jax

from optionslab_tpu.models.heston import HestonParams, heston_price
from optionslab_tpu.models.heston_american import (fit_heston_lsm,
                                                   heston_ab_upper,
                                                   heston_american_bracket,
                                                   heston_lsm_lower)
from optionslab_tpu.types import ContractBatch
from optionslab_tpu.utils.exceptions import ValidationError

S, K, T, R = 100.0, 100.0, 1.0, 0.05
PAR = HestonParams.make(v0=0.04, kappa=2.0, theta=0.04, sigma=0.3, rho=-0.7)


class TestBracketSmall:
    """Tiny sizes: machinery correctness, not tightness."""

    @pytest.fixture(scope="class")
    def small(self):
        return heston_american_bracket(S, K, T, R, PAR, n_dates=8, n_sub=2,
                                       n_fit=20_000, n_lower=40_000,
                                       n_outer=64, n_inner=64, seed=1)

    def test_ordering(self, small):
        b = small
        eu = float(heston_price(
            ContractBatch.make(S, K, T, R, 0.2, "put"), PAR))
        # Bermudan-8 put beats European, and the bracket orders correctly
        assert b["lower"] > eu - 3 * b["lower_se"] - 0.02
        assert b["upper"] + 3 * b["upper_se"] >= \
            b["lower"] - 3 * b["lower_se"], b
        # AB duals at these sizes are loose but must not explode
        assert b["width"] < 0.5, b

    def test_pad_is_interest_on_strike(self, small):
        assert small["pad"] == pytest.approx(
            K * (1.0 - np.exp(-R * T / small["n_dates"])))
        assert small["continuous_upper"] == pytest.approx(
            small["upper"] + small["pad"])

    def test_calls_without_dividends_rejected(self):
        with pytest.raises(ValidationError):
            fit_heston_lsm(S, K, T, R, PAR, jax.random.PRNGKey(0), cp=1.0)

    def test_surface_fit_is_sane_everywhere(self):
        """The ALL-path ridge surface must be bounded and monotone-ish in
        spot (the ITM-only policy fit is hugely collinear by construction
        — this guards the dual's surface against that failure mode)."""
        import jax.numpy as jnp

        from optionslab_tpu.models.heston_american import _surface_value

        _, sur = fit_heston_lsm(S, K, T, R, PAR, jax.random.PRNGKey(5),
                                n_dates=8, n_sub=1, n_paths=30_000)
        grid = jnp.linspace(60.0, 140.0, 17)
        vals = np.asarray(_surface_value(sur, 4, grid,
                                         jnp.full_like(grid, 0.04),
                                         K, -1.0, 8))
        assert np.all(vals >= 0.0) and np.all(vals <= K)
        assert vals[0] == pytest.approx(40.0, abs=1.0)  # deep ITM ~ intrinsic
        assert np.all(np.diff(vals) < 1.0)  # decreasing put value (noise slack)


class TestFrozenVarianceIsBS:
    """sigma→0 with v0=theta freezes v at 0.04: the Bermudan bracket must
    contain the 1-D BS Bermudan value (CRR with matching date count is
    the oracle via the 1-D grid engine)."""

    @pytest.mark.slow
    def test_bracket_contains_bs_american(self):
        frozen = HestonParams.make(v0=0.04, kappa=2.0, theta=0.04,
                                   sigma=1e-3, rho=0.0)
        b = heston_american_bracket(S, K, T, R, frozen, n_dates=10, n_sub=2,
                                    n_fit=40_000, n_lower=80_000,
                                    n_outer=96, n_inner=96, seed=2)
        from optionslab_tpu.models.fdm import fdm_price

        # continuous BS American (PDE); Bermudan-10 is slightly below it
        bs_am = float(fdm_price(ContractBatch.make(S, K, T, R, 0.2, "put"),
                                american=True))
        assert b["lower"] - 3 * b["lower_se"] < bs_am
        assert b["continuous_upper"] + 3 * b["upper_se"] > bs_am, (b, bs_am)


class TestAdiSurfaceBracket:
    """method='adi': Bermudan-ADI continuation slices drive the policy,
    the dual martingale AND the lower bound's control variate — certified
    width collapses to ~1e-3 from 2048 outer paths (round-3 tightening
    of the round-2 'within 0.08' check)."""

    @pytest.fixture(scope="class")
    def adi(self):
        return heston_american_bracket(S, K, T, R, PAR, n_dates=16, n_sub=2,
                                       n_outer=2048, n_inner=1024,
                                       method="adi", n_x=161, n_v=81,
                                       steps_per_date=6, seed=4)

    def test_width_below_a_cent(self, adi):
        assert adi["width"] < 0.01, adi
        # noise can make the realized width slightly negative, but never
        # beyond the quoted stderrs
        assert adi["width"] > -3 * (adi["lower_se"] + adi["upper_se"]), adi
        assert adi["lower_se"] < 0.005 and adi["upper_se"] < 0.005, adi

    @pytest.mark.slow
    def test_overlaps_lsm_bracket(self, adi):
        lsm = heston_american_bracket(S, K, T, R, PAR, n_dates=16, n_sub=2,
                                      n_fit=30_000, n_lower=60_000,
                                      n_outer=256, n_inner=256, seed=5)
        assert lsm["lower"] - 3 * lsm["lower_se"] \
            < adi["upper"] + 3 * adi["upper_se"]
        assert adi["lower"] - 3 * adi["lower_se"] \
            < lsm["upper"] + 3 * lsm["upper_se"], (adi, lsm)

    def test_certifies_the_pde_itself(self, adi):
        """The bracket is an INDEPENDENT MC certificate: the coarse
        161x81 Bermudan-ADI readout must sit within its own grid error
        (~0.02) of the certified interval — and the interval, not the
        PDE, is the truth."""
        assert abs(adi["adi_bermudan"] - adi["lower"]) < 0.03, adi

    def test_calls_rejected(self):
        with pytest.raises(ValidationError):
            heston_american_bracket(S, K, T, R, PAR, cp=1.0, method="adi")

    def test_bad_method_rejected(self):
        with pytest.raises(ValidationError):
            heston_american_bracket(S, K, T, R, PAR, method="nope")

    @pytest.mark.slow
    def test_euro_cv_cuts_lsm_stderr(self):
        """use_cv=True (Lewis-centered European control variate) must
        agree with the plain estimator and reduce its stderr."""
        plain = heston_american_bracket(S, K, T, R, PAR, n_dates=8, n_sub=2,
                                        n_fit=20_000, n_lower=100_000,
                                        n_outer=64, n_inner=64, seed=6)
        cv = heston_american_bracket(S, K, T, R, PAR, n_dates=8, n_sub=2,
                                     n_fit=20_000, n_lower=100_000,
                                     n_outer=64, n_inner=64, seed=6,
                                     use_cv=True)
        assert abs(cv["lower"] - plain["lower"]) \
            < 3 * (cv["lower_se"] + plain["lower_se"])
        assert cv["lower_se"] < plain["lower_se"], (cv, plain)


@pytest.mark.slow
class TestBracketCertification:
    """Production-size bracket: must pin the ADI Heston-American inside a
    tight certified interval (round-2 gap: 'within 0.08' → certified)."""

    @pytest.fixture(scope="class")
    def bracket(self):
        return heston_american_bracket(S, K, T, R, PAR, n_dates=25, n_sub=2,
                                       n_fit=150_000, n_lower=400_000,
                                       n_outer=2048, n_inner=1024, seed=3)

    def test_width_is_tight(self, bracket):
        # Bermudan bracket width at these sizes: a few cents (surface-fit
        # quality bounds the dual gap; measured ~0.05-0.07)
        assert bracket["width"] < 0.10, bracket
        assert bracket["upper_se"] < 0.02 and bracket["lower_se"] < 0.02

    def test_contains_adi_value(self, bracket):
        from optionslab_tpu.models.heston_fdm import heston_fdm_price

        adi = float(heston_fdm_price(S, K, T, R, PAR, option_type="put",
                                     american=True, n_x=301, n_v=121,
                                     n_t=300))
        lo = bracket["lower"] - 3 * bracket["lower_se"]
        hi = bracket["continuous_upper"] + 3 * bracket["upper_se"]
        assert lo < adi < hi, (bracket, adi)


class TestBatesBracket:
    """Certified American bracket under jumps (LSM+dual on the shared
    QE+compound-Poisson transition law)."""

    KW = dict(n_dates=12, n_sub=2, n_fit=30_000, n_lower=40_000,
              n_outer=192, n_inner=384, use_cv=True)

    @pytest.mark.slow
    def test_lam_zero_identical_to_heston(self):
        """Poisson(0) consumes keys on disjoint fold_in branches, so the
        diffusion draws are untouched — lam=0 must match Heston to the
        digit, not just statistically."""
        from optionslab_tpu.models.bates import BatesParams
        from optionslab_tpu.models.heston import HestonParams
        hp = HestonParams.make(0.04, 2.0, 0.04, 0.3, -0.7)
        b0 = BatesParams.make(0.04, 2.0, 0.04, 0.3, -0.7, lam=0.0,
                              mu_j=-0.1, sigma_j=0.15)
        rh = heston_american_bracket(100.0, 100.0, 1.0, 0.05, hp, **self.KW)
        r0 = heston_american_bracket(100.0, 100.0, 1.0, 0.05, b0, **self.KW)
        assert rh["lower"] == pytest.approx(r0["lower"], abs=1e-6)
        assert rh["upper"] == pytest.approx(r0["upper"], abs=1e-6)

    def test_jumps_raise_put_value_with_valid_bracket(self):
        from optionslab_tpu.models.bates import BatesParams
        from optionslab_tpu.models.heston import HestonParams
        hp = HestonParams.make(0.04, 2.0, 0.04, 0.3, -0.7)
        bj = BatesParams.make(0.04, 2.0, 0.04, 0.3, -0.7, lam=0.5,
                              mu_j=-0.1, sigma_j=0.15)
        rh = heston_american_bracket(100.0, 100.0, 1.0, 0.05, hp, **self.KW)
        rj = heston_american_bracket(100.0, 100.0, 1.0, 0.05, bj, **self.KW)
        assert rj["lower"] > rh["upper"]  # negative jumps add put value
        assert rj["upper"] + 3 * rj["upper_se"] \
            >= rj["lower"] - 3 * rj["lower_se"]
        # the American exceeds the European (CF) under the same dynamics
        from optionslab_tpu.models.bates import bates_price
        from optionslab_tpu.types import ContractBatch
        euro = float(bates_price(
            ContractBatch.make(100.0, 100.0, 1.0, 0.05, 0.2, "put"), bj))
        assert rj["upper"] + 3 * rj["upper_se"] > euro

    def test_adi_rejected_for_bates(self):
        from optionslab_tpu.models.bates import BatesParams
        bj = BatesParams.make(0.04, 2.0, 0.04, 0.3, -0.7, lam=0.5,
                              mu_j=-0.1, sigma_j=0.15)
        with pytest.raises(ValidationError):
            heston_american_bracket(100.0, 100.0, 1.0, 0.05, bj,
                                    method="adi")
