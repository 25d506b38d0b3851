"""Multi-asset exotics vs their exact closed-form oracles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from optionslab_tpu.models import multi_asset as ma
from optionslab_tpu.models.black_scholes import bs_price
from optionslab_tpu.utils.exceptions import ValidationError

KEY = jax.random.PRNGKey(0)
CORR2 = np.array([[1.0, 0.5], [0.5, 1.0]], np.float32)
CORR3 = np.array([[1.0, 0.3, 0.2], [0.3, 1.0, 0.4], [0.2, 0.4, 1.0]], np.float32)


class TestOracles:
    def test_spread_matches_margrabe_at_zero_strike(self):
        p, se = ma.spread_price(100.0, 95.0, 0.0, 1.0, 0.05, 0.25, 0.2, 0.5,
                                KEY, n_paths=400_000, return_stderr=True)
        exact = float(ma.margrabe_price(100.0, 95.0, 1.0, 0.25, 0.2, 0.5))
        assert abs(float(p) - exact) < 4 * float(se) + 1e-3

    def test_margrabe_rate_invariance(self):
        """Exchange-option value has no rate dependence; the MC price must
        agree across rates (same seed → CRN)."""
        p1 = float(ma.spread_price(100.0, 100.0, 0.0, 1.0, 0.01, 0.3, 0.2,
                                   -0.3, KEY, n_paths=200_000))
        p2 = float(ma.spread_price(100.0, 100.0, 0.0, 1.0, 0.10, 0.3, 0.2,
                                   -0.3, KEY, n_paths=200_000))
        assert abs(p1 - p2) < 0.05

    def test_geometric_basket_matches_closed_form(self):
        w = np.array([0.5, 0.3, 0.2], np.float32)
        spots = np.array([100.0, 90.0, 110.0], np.float32)
        vols = np.array([0.2, 0.25, 0.3], np.float32)
        p, se = ma.basket_price(spots, w, 100.0, 1.0, 0.05, vols, CORR3, KEY,
                                n_paths=400_000, kind="geometric",
                                return_stderr=True)
        cf = float(ma.geometric_basket_closed_form(spots, w, 100.0, 1.0, 0.05,
                                                   vols, CORR3))
        assert abs(float(p) - cf) < 4 * float(se) + 1e-3

    def test_kirk_close_to_mc_spread(self):
        p, se = ma.spread_price(100.0, 95.0, 5.0, 1.0, 0.05, 0.25, 0.2, 0.5,
                                KEY, n_paths=400_000, return_stderr=True)
        kirk = float(ma.kirk_spread_approx(100.0, 95.0, 5.0, 1.0, 0.05, 0.25,
                                           0.2, 0.5))
        assert abs(float(p) - kirk) < 0.05  # Kirk is approximate

    def test_degenerate_single_asset_reduces_to_bs(self):
        """Weight-1 basket of one asset (d=2 with zero weight) = vanilla."""
        w = np.array([1.0, 0.0], np.float32)
        spots = np.array([100.0, 50.0], np.float32)
        vols = np.array([0.2, 0.4], np.float32)
        p, se = ma.basket_price(spots, w, 100.0, 1.0, 0.05, vols, CORR2, KEY,
                                n_paths=400_000, return_stderr=True)
        exact = float(bs_price(100.0, 100.0, 1.0, 0.05, 0.2, 1.0, 0.0))
        assert abs(float(p) - exact) < 4 * float(se) + 1e-3


class TestStructure:
    def test_rainbow_ordering(self):
        spots = np.array([100.0, 100.0], np.float32)
        vols = np.array([0.2, 0.2], np.float32)
        best, _ = ma.rainbow_price(spots, 100.0, 1.0, 0.05, vols, CORR2, KEY,
                                   n_paths=100_000, flavor="best_of",
                                   return_stderr=True)
        worst, _ = ma.rainbow_price(spots, 100.0, 1.0, 0.05, vols, CORR2, KEY,
                                    n_paths=100_000, flavor="worst_of",
                                    return_stderr=True)
        single = float(bs_price(100.0, 100.0, 1.0, 0.05, 0.2, 1.0, 0.0))
        assert float(worst) < single < float(best)

    def test_perfect_correlation_collapses(self):
        """rho=1, equal vols: best-of = worst-of = vanilla."""
        corr = np.array([[1.0, 1.0], [1.0, 1.0]], np.float32)
        spots = np.array([100.0, 100.0], np.float32)
        vols = np.array([0.2, 0.2], np.float32)
        best = float(ma.rainbow_price(spots, 100.0, 1.0, 0.05, vols, corr, KEY,
                                      n_paths=200_000, flavor="best_of"))
        worst = float(ma.rainbow_price(spots, 100.0, 1.0, 0.05, vols, corr, KEY,
                                       n_paths=200_000, flavor="worst_of"))
        assert abs(best - worst) < 2e-2  # PSD jitter floor (1e-6 on corr)

    def test_basket_asian_below_terminal_basket(self):
        w = np.array([0.5, 0.5], np.float32)
        spots = np.array([100.0, 100.0], np.float32)
        vols = np.array([0.2, 0.3], np.float32)
        asian = float(ma.basket_asian_price(spots, w, 100.0, 1.0, 0.05, vols,
                                            CORR2, KEY, n_paths=100_000,
                                            n_steps=16))
        term = float(ma.basket_price(spots, w, 100.0, 1.0, 0.05, vols, CORR2,
                                     KEY, n_paths=100_000))
        assert 0.0 < asian < term  # averaging reduces effective vol

    def test_ad_greeks(self):
        w = np.array([0.6, 0.4], np.float32)
        spots = np.array([100.0, 95.0], np.float32)
        vols = np.array([0.2, 0.25], np.float32)

        def f(s, v):
            return ma.basket_price(s, w, 100.0, 1.0, 0.05, v, CORR2, KEY,
                                   n_paths=100_000)

        g = ma.multi_asset_greeks(f, spots, vols)
        assert g["delta"].shape == (2,)
        assert float(g["delta"][0]) > float(g["delta"][1]) > 0  # weights order
        assert np.all(np.asarray(g["vega"]) > 0)
        # pathwise delta vs closed-form geometric-analog sanity: in (0, w_i)
        assert 0 < float(g["delta"][0]) < 0.61

    def test_validation(self):
        with pytest.raises(ValidationError):
            ma.basket_price(np.ones(2, np.float32), np.ones(2, np.float32),
                            100.0, 1.0, 0.05, np.full(2, 0.2, np.float32),
                            np.eye(3, dtype=np.float32), KEY, n_paths=1000)
        with pytest.raises(ValidationError):
            ma.rainbow_price(np.ones(2, np.float32), 100.0, 1.0, 0.05,
                             np.full(2, 0.2, np.float32), CORR2, KEY,
                             n_paths=1000, flavor="median_of")
