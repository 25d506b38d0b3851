"""Forward-start options under Heston/Bates (semi-analytic vs MC).

Beyond the reference (no forward-start support). The share-measure CIR
MGF is the delicate part — the rho != 0 MC comparisons exercise it.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from optionslab_tpu.models.bates import BatesParams
from optionslab_tpu.models.forward_start import (forward_smile_iv,
                                                 forward_start_mc_price,
                                                 forward_start_price)
from optionslab_tpu.models.heston import HestonParams, heston_price
from optionslab_tpu.types import ContractBatch

F = jnp.float64


@pytest.fixture(scope="module")
def hparams():
    return HestonParams.make(v0=0.04, kappa=2.0, theta=0.05, sigma=0.3,
                             rho=-0.7, dtype=F)


class TestForwardStart:
    def test_t1_zero_degenerates_to_vanilla(self, hparams):
        v_fs = float(forward_start_price(100.0, 1.0, 1e-6, 1.0, 0.05,
                                         hparams))
        v_van = float(heston_price(
            ContractBatch.make(100.0, 100.0, 1.0, 0.05, 0.2, "call", dtype=F),
            hparams))
        assert abs(v_fs - v_van) < 1e-4

    def test_t1_exactly_zero_is_finite_vanilla(self, hparams):
        # t1 == 0.0 exactly used to hit the 0/0 in the share-measure CIR
        # MGF (1 - e^{-kappa* t1} in a denominator) and return NaN
        v_fs = float(forward_start_price(100.0, 1.0, 0.0, 1.0, 0.05,
                                         hparams))
        v_van = float(heston_price(
            ContractBatch.make(100.0, 100.0, 1.0, 0.05, 0.2, "call", dtype=F),
            hparams))
        assert np.isfinite(v_fs)
        assert abs(v_fs - v_van) < 1e-4

    @pytest.mark.parametrize("k", [0.9, 1.0, 1.1])
    def test_matches_mc_with_correlation(self, hparams, k):
        sa = float(forward_start_price(100.0, k, 0.5, 1.5, 0.05, hparams))
        mc, se = forward_start_mc_price(100.0, k, 0.5, 1.5, 0.05, hparams,
                                        jax.random.PRNGKey(0),
                                        n_paths=200_000, n_steps=300)
        assert abs(sa - float(mc)) < 3.5 * float(se) + 0.01

    def test_negative_share_measure_kappa_matches_mc(self):
        """kappa* = kappa − rho·sigma < 0 (rho·sigma > kappa) is a valid
        regime where 1 − e^{−kappa* t1} is legitimately NEGATIVE; a
        one-sided clamp here once silently degenerated the MGF and
        mispriced by ~30 sigma (round-3 review catch)."""
        hp = HestonParams.make(v0=0.04, kappa=0.5, theta=0.8, sigma=0.8,
                               rho=0.8, dtype=F)
        sa = float(forward_start_price(100.0, 1.0, 1.0, 2.0, 0.05, hp))
        mc, se = forward_start_mc_price(100.0, 1.0, 1.0, 2.0, 0.05, hp,
                                        jax.random.PRNGKey(2),
                                        n_paths=200_000, n_steps=300)
        assert abs(sa - float(mc)) < 3.5 * float(se) + 0.05, \
            (sa, float(mc), float(se))

    @pytest.mark.slow
    def test_bates_jumps_match_mc(self):
        pb = BatesParams.make(v0=0.04, kappa=2.0, theta=0.05, sigma=0.3,
                              rho=-0.7, lam=0.5, mu_j=-0.1, sigma_j=0.15,
                              dtype=F)
        sa = float(forward_start_price(100.0, 1.0, 0.5, 1.5, 0.05, pb))
        mc, se = forward_start_mc_price(100.0, 1.0, 0.5, 1.5, 0.05, pb,
                                        jax.random.PRNGKey(1),
                                        n_paths=200_000, n_steps=300)
        assert abs(sa - float(mc)) < 3.5 * float(se) + 0.01

    def test_put_call_parity(self, hparams):
        # S_T1(R-k)^+ - S_T1(k-R)^+ = S_T1(R - k):
        # E-value = S0 e^{-qT2} - k S0 e^{-qT1} e^{-r tau}
        c = float(forward_start_price(100.0, 1.0, 0.5, 1.5, 0.05, hparams,
                                      option_type=1.0))
        p = float(forward_start_price(100.0, 1.0, 0.5, 1.5, 0.05, hparams,
                                      option_type=-1.0))
        rhs = 100.0 - 100.0 * np.exp(-0.05 * 1.0)
        assert abs((c - p) - rhs) < 1e-8

    def test_homogeneity_in_spot(self, hparams):
        v1 = float(forward_start_price(100.0, 1.05, 0.5, 1.5, 0.05, hparams))
        v2 = float(forward_start_price(200.0, 1.05, 0.5, 1.5, 0.05, hparams))
        assert abs(v2 - 2.0 * v1) < 1e-9

    def test_gradient_flows(self, hparams):
        g = jax.grad(lambda s: forward_start_price(s, 1.0, 0.5, 1.5, 0.05,
                                                   hparams))(jnp.asarray(100.0, F))
        # homogeneous of degree 1 in spot: dV/dS = V/S
        v = float(forward_start_price(100.0, 1.0, 0.5, 1.5, 0.05, hparams))
        assert abs(float(g) - v / 100.0) < 1e-9

    def test_forward_smile_shape(self, hparams):
        ks = np.array([0.85, 0.95, 1.0, 1.05, 1.15])
        iv = np.asarray(forward_smile_iv(ks, 0.5, 1.5, hparams, rate=0.05))
        assert np.all(np.isfinite(iv)) and np.all(iv > 0.05)
        # negative rho: downside forward vols higher than upside
        assert iv[0] > iv[-1]

    def test_forward_smile_flatter_than_spot_smile_atm_level(self, hparams):
        # sanity: forward ATM vol near sqrt(expected variance over [T1,T2])
        iv = float(np.asarray(forward_smile_iv(np.array([1.0]), 1.0, 2.0,
                                               hparams))[0])
        from optionslab_tpu.models.var_swap import heston_expected_variance
        import dataclasses
        # E[v] average over [1, 2] starting from the T1 share-measure mean is
        # close to theta for kappa=2; loose band
        assert 0.8 * np.sqrt(0.05) < iv < 1.1 * np.sqrt(0.05)
