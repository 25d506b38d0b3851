"""Stochastic local vol: Gyongy reprice, limit cases, mixing sensitivity.

Oracles (all independent of the particle engine):
 1. Gyongy lemma — the calibrated SLV reprices European vanillas to the
    Dupire PDE across strikes at full vol-of-vol (eta = 1), even though
    the dynamics are completely different from pure LV;
 2. mixing -> 0 collapses to the pure local-vol MC engine
    (``models/local_vol._lv_mc``), and the calibrated leverage rows
    converge to sigma_LV / sqrt(v_t) with v_t deterministic;
 3. a flat surface reprices flat-vol Black-Scholes (Gyongy again, with a
    closed-form oracle);
 4. vanillas are mixing-INVARIANT while forward-smile exotics move — the
    defining property of the model.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optionslab_tpu.models.black_scholes import bs_price
from optionslab_tpu.models.heston import HestonParams
from optionslab_tpu.models.local_vol import (DupireLocalVol,
                                             LocalVolSurface,
                                             local_vol_mc_price,
                                             sample_smile_iv_fn)
from optionslab_tpu.models.slv import (SLV_KINDS, SLVModel,
                                       slv_calibrate_leverage,
                                       slv_exotic_price)
from optionslab_tpu.utils.exceptions import ValidationError

SPOT, RATE, T = 100.0, 0.03, 1.0
PAR = HestonParams.make(0.04, 2.0, 0.04, 0.5, -0.7)
KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def dupire():
    return DupireLocalVol(sample_smile_iv_fn(), SPOT, RATE)


class TestGyongyReprice:
    @pytest.mark.parametrize("strike", [90.0, 100.0, 110.0])
    def test_european_matches_dupire_pde(self, dupire, strike):
        slv = SLVModel(dupire, PAR, mixing=1.0)
        p, se = slv.price("european", strike, T, KEY, n_paths=131_072,
                          n_steps=64, return_stderr=True)
        pde = dupire.price(SPOT, strike, T)
        # 5 se + a small allowance for Euler/binning bias
        assert abs(float(p) - float(pde)) < 5 * float(se) + 0.03

    def test_flat_surface_reprices_bs(self):
        flat = LocalVolSurface(jnp.linspace(-3.0, 3.0, 11),
                               jnp.linspace(0.01, 2.0, 9),
                               jnp.full((9, 11), 0.2), SPOT, RATE)
        p, se = slv_exotic_price(
            "european", SPOT, 100.0, T, RATE, PAR, KEY,
            flat.k_grid, flat.t_grid, flat.grid, return_stderr=True)
        oracle = bs_price(SPOT, 100.0, T, RATE, 0.2)
        assert abs(float(p) - float(oracle)) < 4 * float(se) + 0.01


class TestMixingZeroLimit:
    def test_matches_pure_lv_mc(self, dupire):
        slv = SLVModel(dupire, PAR, mixing=0.0)
        p, se = slv.price("european", 100.0, T, KEY, return_stderr=True)
        plv, selv = local_vol_mc_price(dupire, 100.0, T)
        tol = 4 * float(jnp.sqrt(se**2 + selv**2)) + 0.02
        assert abs(float(p) - float(plv)) < tol

    def test_leverage_rows_are_sigma_lv_over_sqrt_v(self, dupire):
        # v0 = theta and eta = 0 make v_t == theta deterministically, so
        # the calibrated leverage must be exactly sigma_LV / sqrt(theta).
        x_rows, l_rows = slv_calibrate_leverage(
            SPOT, T, RATE, PAR, KEY, dupire.surface.k_grid,
            dupire.surface.t_grid, dupire.surface.grid, mixing=0.0,
            n_paths=32_768, n_steps=32)
        i = 16
        t_now = i * T / 32
        s_row = SPOT * jnp.exp(x_rows[i])
        expected = dupire.surface(s_row, t_now) / jnp.sqrt(PAR.theta)
        got = l_rows[i]
        # interior bins (tails can be count-starved)
        sl = slice(5, 27)
        np.testing.assert_allclose(np.asarray(got[sl]),
                                   np.asarray(expected[sl]), rtol=5e-3)


class TestMixingSensitivity:
    def test_exotics_move_vanillas_do_not(self, dupire):
        prices, ses = {}, {}
        for mix in (0.0, 1.0):
            slv = SLVModel(dupire, PAR, mixing=mix)
            prices[mix], ses[mix] = slv.price(
                "barrier_up-and-out", 100.0, T, KEY, barrier=120.0,
                return_stderr=True)
        joint = float(jnp.sqrt(ses[0.0]**2 + ses[1.0]**2))
        # the forward-smile exotic moves by many stderrs...
        assert abs(float(prices[1.0]) - float(prices[0.0])) > 10 * joint
        # ...while the European is mixing-invariant (Gyongy: both ends
        # reprice the same vanilla surface)
        v0, s0 = SLVModel(dupire, PAR, 0.0).price(
            "european", 100.0, T, KEY, return_stderr=True)
        v1, s1 = SLVModel(dupire, PAR, 1.0).price(
            "european", 100.0, T, KEY, return_stderr=True)
        tol = 4 * float(jnp.sqrt(s0**2 + s1**2)) + 0.03
        assert abs(float(v1) - float(v0)) < tol


class TestStructuredKinds:
    """Cliquet/autocall under SLV. Oracles: the mixing -> 0 + flat-
    surface + v0 = theta limit makes the leverage EXACTLY 1 and the
    variance constant, so prices must match the GBM structured engines
    at sigma = sqrt(theta); and the forward-smile products must MOVE
    with mixing while (TestMixingSensitivity) vanillas do not."""

    def _flat(self):
        return LocalVolSurface(jnp.linspace(-3.0, 3.0, 11),
                               jnp.linspace(0.01, 2.0, 9),
                               jnp.full((9, 11), 0.2), SPOT, RATE)

    def test_cliquet_gbm_limit(self):
        from optionslab_tpu.models.exotics import cliquet_price
        from optionslab_tpu.models.slv import slv_cliquet_price

        flat = self._flat()
        p, se = slv_cliquet_price(
            SPOT, T, RATE, PAR, KEY, flat.k_grid, flat.t_grid, flat.grid,
            mixing=0.0, n_periods=4, n_paths=65_536, n_steps=32,
            return_stderr=True)
        pg, sg = cliquet_price(SPOT, T, RATE, 0.2, jax.random.PRNGKey(9),
                               n_periods=4, n_paths=65_536, n_steps=32,
                               return_stderr=True)
        tol = 5 * float(jnp.sqrt(se**2 + sg**2)) + 0.02
        assert abs(float(p) - float(pg)) < tol, (float(p), float(pg))

    def test_autocall_gbm_limit(self):
        from optionslab_tpu.models.exotics import autocallable_price
        from optionslab_tpu.models.slv import slv_autocall_price

        flat = self._flat()
        p, se = slv_autocall_price(
            SPOT, T, RATE, PAR, KEY, flat.k_grid, flat.t_grid, flat.grid,
            mixing=0.0, n_obs=4, n_paths=65_536, n_steps=32,
            return_stderr=True)
        pg, sg = autocallable_price(SPOT, T, RATE, 0.2,
                                    jax.random.PRNGKey(9), n_obs=4,
                                    n_paths=65_536, n_steps=32,
                                    return_stderr=True)
        tol = 5 * float(jnp.sqrt(se**2 + sg**2)) + 0.05
        assert abs(float(p) - float(pg)) < tol, (float(p), float(pg))

    def test_cliquet_sees_the_forward_smile(self, dupire):
        slv0 = SLVModel(dupire, PAR, mixing=0.0)
        slv1 = SLVModel(dupire, PAR, mixing=1.0)
        p0, s0 = slv0.cliquet(T, KEY, n_periods=4, n_paths=65_536,
                              n_steps=32, return_stderr=True)
        p1, s1 = slv1.cliquet(T, KEY, n_periods=4, n_paths=65_536,
                              n_steps=32, return_stderr=True)
        joint = float(jnp.sqrt(s0**2 + s1**2))
        assert abs(float(p1) - float(p0)) > 5 * joint

    def test_autocall_facade(self, dupire):
        slv = SLVModel(dupire, PAR, mixing=0.7)
        p = slv.autocall(T, KEY, n_obs=4, n_paths=32_768, n_steps=32)
        assert 50.0 < float(p) < 120.0

    def test_bad_periods_raise(self, dupire):
        from optionslab_tpu.models.slv import slv_cliquet_price

        with pytest.raises(ValidationError):
            slv_cliquet_price(SPOT, T, RATE, PAR, KEY,
                              dupire.surface.k_grid, dupire.surface.t_grid,
                              dupire.surface.grid, n_periods=7,
                              n_steps=32)

    def test_pure_lv_wrappers_flat_match_gbm(self):
        """The public pure-LV structured pricers (SLV engine pinned at
        mixing=0) reproduce the GBM engines on a flat surface."""
        from optionslab_tpu.models import (local_vol_autocall_price,
                                           local_vol_cliquet_price)
        from optionslab_tpu.models.exotics import (autocallable_price,
                                                   cliquet_price)

        dup = DupireLocalVol(lambda k, t: 0.2 + 0.0 * k + 0.0 * t,
                             SPOT, RATE)
        p, se = local_vol_cliquet_price(dup, T, n_periods=4,
                                        n_paths=65_536, n_steps=32,
                                        return_stderr=True)
        pg, sg = cliquet_price(SPOT, T, RATE, 0.2, jax.random.PRNGKey(9),
                               n_periods=4, n_paths=65_536, n_steps=32,
                               return_stderr=True)
        assert abs(float(p) - float(pg)) < \
            5 * float(jnp.sqrt(se**2 + sg**2)) + 0.02
        pa, sa = local_vol_autocall_price(dup, T, n_obs=4, n_paths=65_536,
                                          n_steps=32, return_stderr=True)
        pga, sga = autocallable_price(SPOT, T, RATE, 0.2,
                                      jax.random.PRNGKey(9), n_obs=4,
                                      n_paths=65_536, n_steps=32,
                                      return_stderr=True)
        assert abs(float(pa) - float(pga)) < \
            5 * float(jnp.sqrt(sa**2 + sga**2)) + 0.05


class TestVolSwapAndRangeAccrual:
    """The round-4 cells: vol swaps (the convexity discount MOVES with
    mixing while K_var stays smile-pinned — the model's point) and range
    accrual (a strip of corridor digitals, Gyongy-pinned on vanillas)."""

    def test_flat_mixing0_both_strikes_exact(self):
        from optionslab_tpu.models import slv_swap_strikes

        flat = LocalVolSurface(jnp.linspace(-3.0, 3.0, 11),
                               jnp.linspace(0.01, 2.0, 9),
                               jnp.full((9, 11), 0.2), SPOT, RATE)
        kv, sv, kvol, svol = slv_swap_strikes(
            SPOT, T, RATE, PAR, KEY, flat.k_grid, flat.t_grid, flat.grid,
            mixing=0.0, n_paths=16_384, n_steps=32)
        # mixing 0 + flat surface: integrated variance is deterministic
        assert abs(float(kv) - 0.04) < 3e-3
        assert abs(float(kvol) - 0.2) < 8e-3
        assert float(svol) < 5e-3

    def test_vol_swap_moves_with_mixing_kvar_pinned(self):
        from optionslab_tpu.models import slv_swap_strikes

        iv_fn = sample_smile_iv_fn(base_vol=0.2, skew=-0.06, smile=0.03)
        dup = DupireLocalVol(iv_fn, SPOT, RATE, k_range=(-2.5, 2.5),
                             n_k=201)
        g = (dup.surface.k_grid, dup.surface.t_grid, dup.surface.grid)
        kv0, sv0, kvol0, svol0 = slv_swap_strikes(
            SPOT, T, RATE, PAR, KEY, *g, mixing=0.0, n_paths=65_536,
            n_steps=64)
        kv1, sv1, kvol1, svol1 = slv_swap_strikes(
            SPOT, T, RATE, PAR, KEY, *g, mixing=1.0, n_paths=65_536,
            n_steps=64)
        # K_var: log-contract functional => Gyongy-pinned across mixing
        assert abs(float(kv1) - float(kv0)) < \
            5 * math.hypot(float(sv0), float(sv1)) + 2e-3
        # Jensen: K_vol <= sqrt(K_var) always
        assert float(kvol1) <= math.sqrt(float(kv1)) + 1e-4
        # the convexity discount GROWS with vol-of-vol: K_vol falls with
        # mixing by far more than noise while K_var does not move
        assert float(kvol0) - float(kvol1) > \
            5 * math.hypot(float(svol0), float(svol1)), \
            (float(kvol0), float(kvol1))

    def test_range_accrual_scan_flat_mixing0_matches_closed_form(self):
        from optionslab_tpu.models import slv_range_accrual_price
        from optionslab_tpu.models.exotics import range_accrual_closed_form

        flat = LocalVolSurface(jnp.linspace(-3.0, 3.0, 11),
                               jnp.linspace(0.01, 2.0, 9),
                               jnp.full((9, 11), 0.2), SPOT, RATE)
        p, se = slv_range_accrual_price(
            SPOT, 90.0, 112.0, T, RATE, PAR, KEY, flat.k_grid, flat.t_grid,
            flat.grid, mixing=0.0, n_paths=65_536, n_steps=32,
            return_stderr=True)
        cf = float(range_accrual_closed_form(SPOT, 90.0, 112.0, T, RATE,
                                             0.2, notional=100.0,
                                             n_steps=32))
        assert abs(float(p) - cf) < 5 * float(se) + 0.5, (float(p), cf)

    def test_range_accrual_band_sanity(self, dupire):
        """Value is positive, bounded by the discounted notional, and a
        wider corridor is worth MORE on the same paths (same key)."""
        from optionslab_tpu.models import slv_range_accrual_price

        g = (dupire.surface.k_grid, dupire.surface.t_grid,
             dupire.surface.grid)
        narrow = float(slv_range_accrual_price(
            SPOT, 95.0, 105.0, T, RATE, PAR, KEY, *g, n_paths=16_384,
            n_steps=32))
        wide = float(slv_range_accrual_price(
            SPOT, 85.0, 120.0, T, RATE, PAR, KEY, *g, n_paths=16_384,
            n_steps=32))
        df_n = 100.0 * math.exp(-RATE * T)
        assert 0.0 < narrow < wide < df_n


class TestAPI:
    def test_bad_kind_raises(self, dupire):
        slv = SLVModel(dupire, PAR)
        with pytest.raises(ValidationError):
            slv.price("nope", 100.0, T, KEY)

    def test_bad_surface_raises(self):
        with pytest.raises(ValidationError):
            SLVModel(object(), PAR)

    def test_return_leverage_shapes(self, dupire):
        (p, se), (x_rows, l_rows) = slv_exotic_price(
            "asian_arith", SPOT, 100.0, T, RATE, PAR, KEY,
            dupire.surface.k_grid, dupire.surface.t_grid,
            dupire.surface.grid, n_paths=16_384, n_steps=16, n_bins=21,
            return_stderr=True, return_leverage=True)
        assert x_rows.shape == (16, 21) and l_rows.shape == (16, 21)
        assert np.isfinite(float(p)) and np.isfinite(float(se))
        assert bool(jnp.all(jnp.isfinite(l_rows)))
        assert bool(jnp.all(l_rows >= 0.0))

    def test_all_kinds_finite(self, dupire):
        slv = SLVModel(dupire, PAR, mixing=0.7)
        for kind in SLV_KINDS:
            if "double" in kind:
                b = (80.0, 120.0)
            else:
                b = 120.0 if "up" in kind else (80.0 if "down" in kind
                                                else 0.0)
            p = slv.price(kind, 100.0, T, KEY, barrier=b,
                          n_paths=16_384, n_steps=16)
            assert np.isfinite(float(p)), kind


class TestVarianceSwap:
    """K_var under SLV via the log contract. Gyongy invariance: vanillas
    (hence the log contract) reprice the smile at EVERY mixing, so the
    strike must match pure LV and be mixing-invariant."""

    def test_flat_surface_recovers_sigma_squared(self):
        from optionslab_tpu.models import slv_variance_swap

        flat = LocalVolSurface(jnp.linspace(-3.0, 3.0, 11),
                               jnp.linspace(0.01, 2.0, 9),
                               jnp.full((9, 11), 0.2), SPOT, RATE)
        kv, se = slv_variance_swap(SPOT, T, RATE, PAR, KEY, flat.k_grid,
                                   flat.t_grid, flat.grid, mixing=1.0,
                                   n_paths=65_536, n_steps=64,
                                   return_stderr=True)
        assert abs(float(kv) - 0.04) < 4 * float(se) + 1e-3

    def test_mixing_invariant_and_matches_pure_lv(self):
        from optionslab_tpu.models import (local_vol_variance_swap,
                                           slv_variance_swap)

        iv_fn = sample_smile_iv_fn(base_vol=0.2, skew=-0.06, smile=0.03)
        dup = DupireLocalVol(iv_fn, SPOT, RATE, k_range=(-2.5, 2.5),
                             n_k=201)
        g = (dup.surface.k_grid, dup.surface.t_grid, dup.surface.grid)
        k0, s0 = slv_variance_swap(SPOT, T, RATE, PAR, KEY, *g,
                                   mixing=0.0, n_paths=65_536, n_steps=64,
                                   return_stderr=True)
        k1, s1 = slv_variance_swap(SPOT, T, RATE, PAR, KEY, *g,
                                   mixing=1.0, n_paths=65_536, n_steps=64,
                                   return_stderr=True)
        assert abs(float(k1) - float(k0)) < \
            5 * float(jnp.sqrt(s0**2 + s1**2)) + 2e-3
        klv, selv = local_vol_variance_swap(dup, T, n_paths=65_536,
                                            n_steps=64)
        assert abs(float(k0) - float(klv)) < \
            5 * float(jnp.sqrt(s0**2 + selv**2)) + 1e-3
