"""American LSM policy + dual-bound bracket (models/american.py).

Oracles: CRR binomial American (in-repo lattice), Black–Scholes European
(no-dividend call never exercises early), and a Monte Carlo check that the
closed-form conditional expectation of the piecewise dual value matches
brute-force sampling.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from optionslab_tpu.models import american as am
from optionslab_tpu.models.binomial import binomial_price
from optionslab_tpu.models.black_scholes import bs_price
from optionslab_tpu.types import ContractBatch

S, K, T, R, SIG = 100.0, 100.0, 1.0, 0.05, 0.2


@pytest.fixture(scope="module")
def put_interval():
    return am.american_price_interval(S, K, T, R, SIG, cp=-1.0, seed=0,
                                      n_fit=60_000, n_lower=60_000,
                                      n_outer=20_000, n_dates=50, basis=3,
                                      method="closed_form")


class TestBracket:
    def test_ordering_and_width(self, put_interval):
        out = put_interval
        assert float(out["lower"]) <= float(out["upper"])
        assert float(out["width"]) < 0.5  # closed-form dual is tight-ish on CPU sizes
        assert float(out["upper_se"]) < 0.01

    def test_contains_binomial_american(self, put_interval):
        """True Bermudan-50 ≤ American; the bracket must sit consistently:
        lower ≤ CRR American + noise, upper ≥ Bermudan (≈ CRR − O(1/n))."""
        crr = float(binomial_price(ContractBatch.make(S, K, T, R, SIG, "put"),
                                   american=True, n_steps=2001))
        out = put_interval
        lo = float(out["lower"]) - 3 * float(out["lower_se"])
        hi = float(out["upper"]) + 3 * float(out["upper_se"])
        assert lo <= crr <= hi + 0.02  # Bermudan-50 < American by ~0.01
        # and the bracket is in the right neighborhood entirely
        assert 5.9 < lo and hi < 6.6

    def test_lower_above_european(self, put_interval):
        euro = float(bs_price(S, K, T, R, SIG, -1.0, 0.0))
        assert float(put_interval["lower"]) > euro  # early-exercise premium

    def test_call_no_dividend_is_european(self):
        out = am.american_price_interval(S, K, T, R, SIG, cp=1.0, seed=1,
                                         n_fit=40_000, n_lower=40_000,
                                         n_outer=8_000, n_dates=20, basis=3,
                                         method="closed_form")
        euro = float(bs_price(S, K, T, R, SIG, 1.0, 0.0))
        assert abs(float(out["lower"]) - euro) < 4 * float(out["lower_se"]) + 0.01
        assert float(out["upper"]) >= euro - 0.01

    @pytest.mark.slow
    def test_payoff_feature_basis_beats_plain_polys(self):
        """The h-feature must not hurt: lower bound at least as high as the
        baseline scan-engine LSM (same budget) within noise."""
        from optionslab_tpu.models.exotics import american_lsm_price

        base = float(american_lsm_price(S, K, T, R, SIG, jax.random.PRNGKey(3),
                                        cp=-1.0, n_paths=100_000, n_dates=50))
        pol = am.fit_lsm_policy(S, K, T, R, SIG, jax.random.PRNGKey(4), cp=-1.0,
                                n_paths=100_000, n_dates=50, basis=3)
        lower, se = am.lsm_lower_bound(pol, jax.random.PRNGKey(5), 100_000)
        assert float(lower) > base - 4 * float(se) - 0.02


class TestDualInternals:
    @pytest.mark.slow
    def test_expect_piecewise_matches_mc(self):
        pol = am.fit_lsm_policy(S, K, T, R, SIG, jax.random.PRNGKey(0), cp=-1.0,
                                n_paths=50_000, n_dates=50, basis=3)
        coefs = pol.vcoefs.astype(jnp.float64)
        pcoefs = pol.coefs.astype(jnp.float64)
        n_dates, basis = 50, 3
        dt = T / n_dates
        mu = (R - 0.5 * SIG**2) * dt
        sig = SIG * np.sqrt(dt)
        bounds = am._solve_boundaries(pcoefs, K, -1.0, basis, n_dates)
        rng = np.random.default_rng(1)
        kidx = 25
        for s in (80.0, 100.0, 120.0):
            z = rng.standard_normal(2_000_000)
            snext = jnp.asarray(s * np.exp(mu + sig * z))
            v_mc = float(np.mean(np.asarray(am._piecewise_value(
                snext, bounds[kidx], coefs[kidx], K, -1.0, basis))))
            v_cf = float(am._expect_piecewise(
                jnp.asarray(s, jnp.float64), bounds[kidx], coefs[kidx], K,
                -1.0, basis, mu, sig))
            assert abs(v_mc - v_cf) < 5e-3, (s, v_mc, v_cf)

    def test_boundary_monotone_toward_strike(self):
        """Put exercise boundary rises toward K as maturity approaches."""
        pol = am.fit_lsm_policy(S, K, T, R, SIG, jax.random.PRNGKey(0), cp=-1.0,
                                n_paths=100_000, n_dates=50, basis=3)
        b = np.asarray(am._solve_boundaries(pol.coefs.astype(jnp.float64), K,
                                            -1.0, 3, 50))
        assert b[-1] == pytest.approx(K, rel=5e-3)  # terminal: exercise any ITM
        # (grid resolution near K is ~0.15 on the 2048-node geometric grid)
        assert 70.0 < b[20] < 100.0
        # loose monotonicity on the trustworthy late half
        late = b[30:]
        assert np.all(np.diff(late) > -2.0)

    @pytest.mark.slow
    def test_grid_bracket_pins_bermudan(self):
        """The grid engine's certified bracket is machine-tight: width
        ~2e-5 around the Bermudan-50 value (≈6.07864 by grid-Richardson),
        with both bounds sharing the telescoping-BS martingale."""
        out = am.american_price_interval(S, K, T, R, SIG, cp=-1.0, seed=0,
                                         n_outer=8192, n_dates=50,
                                         n_grid=1024, method="grid")
        lo, hi = float(out["lower"]), float(out["upper"])
        assert lo <= hi
        assert float(out["width"]) < 2e-4
        assert abs(lo - 6.07864) < 3e-4  # pins the true Bermudan-50
        assert float(out["upper_se"]) < 2e-4
        # induction estimate carries the convex-interp upward bias; the
        # DUAL is what certifies
        assert float(out["estimate"]) >= hi - 1e-6

    def test_grid_single_date_is_european(self):
        """n_dates=1 collapses to European: the telescoping-BS martingale
        replicates the payoff exactly, so the bracket has zero width at
        the BS price."""
        euro = float(bs_price(S, K, T, R, SIG, -1.0, 0.0))
        out = am.american_price_interval(S, K, T, R, SIG, cp=-1.0, seed=0,
                                         n_outer=2048, n_dates=1,
                                         n_grid=512, method="grid")
        assert abs(float(out["lower"]) - euro) < 1e-6
        assert abs(float(out["upper"]) - euro) < 1e-6

    @pytest.mark.slow
    def test_continuous_interval_contains_crr(self):
        """American-continuous certificate: Bermudan bracket + rigorous
        rK·dt pad must contain the CRR@2001 binomial price (small sizes
        here: wider but still correct)."""
        crr = float(binomial_price(ContractBatch.make(S, K, T, R, SIG, "put"),
                                   american=True, n_steps=2001))
        out = am.american_continuous_interval(S, K, T, R, SIG, cp=-1.0, seed=0,
                                              n_outer=2048, n_dates=100,
                                              n_grid=2048)
        lo = float(out["lower"]) - 3 * float(out["lower_se"])
        hi = float(out["upper"]) + 3 * float(out["upper_se"])
        assert lo <= crr <= hi, (lo, crr, hi)
        assert float(out["pad"]) == pytest.approx(R * K * T / 100)

    @pytest.mark.slow
    def test_continuous_interval_call_no_dividend(self):
        euro = float(bs_price(S, K, T, R, SIG, 1.0, 0.0))
        out = am.american_continuous_interval(S, K, T, R, SIG, cp=1.0, seed=0,
                                              n_outer=2048, n_dates=50,
                                              n_grid=1024)
        assert float(out["pad"]) == 0.0
        assert float(out["lower"]) - 3 * float(out["lower_se"]) <= euro
        assert euro <= float(out["upper"]) + 3 * float(out["upper_se"]) + 1e-4

    @pytest.mark.slow
    def test_grid_greeks_match_binomial_oracle(self):
        """American Greeks from the grid surface (the reference admits 'No
        American option Greeks') vs the CRR@2001 node-capture lattice."""
        from optionslab_tpu.models.american import american_grid_greeks
        from optionslab_tpu.models.binomial import binomial_greeks

        g = american_grid_greeks(S, K, T, R, SIG, cp=-1.0, n_dates=200,
                                 n_grid=1024)
        bg = binomial_greeks(ContractBatch.make(S, K, T, R, SIG, "put"),
                             american=True, n_steps=2001)
        assert abs(g["delta"] - float(bg["delta"])) < 2e-3
        assert abs(g["gamma"] - float(bg["gamma"])) < 2e-4
        assert abs(g["theta"] - float(bg["theta"])) < 2e-2
        assert abs(g["vega"] - float(bg["vega"])) < 0.2
        assert abs(g["rho"] - float(bg["rho"])) < 0.2
        # price: Richardson-extrapolated Bermudan-200 ≈ Am − 0.59/200
        assert abs(g["price"] - (6.09040 - 0.59 / 200)) < 2e-3

    @pytest.mark.slow
    def test_nested_ab_also_upper(self):
        pol = am.fit_lsm_policy(S, K, T, R, SIG, jax.random.PRNGKey(0), cp=-1.0,
                                n_paths=50_000, n_dates=20, basis=3)
        lower, lse = am.lsm_lower_bound(pol, jax.random.PRNGKey(1), 50_000)
        upper, use = am.ab_upper_bound(pol, jax.random.PRNGKey(2),
                                       n_outer=256, n_inner=64)
        assert float(upper) + 3 * float(use) >= float(lower) - 3 * float(lse)


class TestMartingaleCVLower:
    """Round-3 queue item: the dual's deterministic value-surface
    martingale doubles as a control variate for the LSM lower bound
    (optional stopping keeps it unbiased) — same machinery as the
    Heston/LV American brackets."""

    def test_cv_lower_unbiased_and_tighter(self):
        pol = am.fit_lsm_policy(S, K, T, R, SIG, jax.random.PRNGKey(7),
                                cp=-1.0, n_paths=60_000, n_dates=50, basis=3)
        k = jax.random.PRNGKey(8)
        lo_cv, se_cv = am.lsm_lower_bound(pol, k, 60_000, use_cv=True)
        lo_pl, se_pl = am.lsm_lower_bound(pol, k, 60_000, use_cv=False)
        # same policy value (unbiasedness): agree within combined noise
        tol = 4 * float(jnp.hypot(se_cv, se_pl))
        assert abs(float(lo_cv) - float(lo_pl)) < tol
        # the point of the CV: stderr collapses by ~an order of magnitude
        assert float(se_cv) < 0.25 * float(se_pl), (float(se_cv),
                                                    float(se_pl))

    def test_cv_lower_stays_below_dual_upper(self):
        pol = am.fit_lsm_policy(S, K, T, R, SIG, jax.random.PRNGKey(9),
                                cp=-1.0, n_paths=60_000, n_dates=50, basis=3)
        lo, se_lo = am.lsm_lower_bound(pol, jax.random.PRNGKey(10), 60_000)
        up, se_up = am.dual_upper_bound(pol, jax.random.PRNGKey(11), 60_000)
        assert float(lo) - 3 * float(se_lo) < float(up) + 3 * float(se_up)
