"""Heston / SABR / jump-diffusion tests: limits, oracles, calibration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optionslab_tpu.models.black_scholes import bs_price
from optionslab_tpu.models.heston import (
    HestonParams,
    HestonPricer,
    calibrate_heston,
    heston_mc_price,
    heston_price,
    heston_price_cos,
    heston_simulate_paths,
)
from optionslab_tpu.models.jump_diffusion import (
    KouJumpDiffusion,
    MertonJumpDiffusion,
    merton_mc_price,
    merton_price,
)
from optionslab_tpu.models.sabr import (
    SABRModel,
    SABRParams,
    calibrate_sabr,
    sabr_implied_vol,
)
from optionslab_tpu.types import ContractBatch
from optionslab_tpu.utils.exceptions import ValidationError

F = jnp.float64
KEY = jax.random.PRNGKey(0)


def _batch(S=100.0, K=100.0, T=1.0, r=0.05, sig=0.2, cp="call", q=0.0, dtype=F):
    return ContractBatch.make(S, K, T, r, sig, cp, q, dtype=dtype)


class TestHeston:
    def test_zero_volofvol_reduces_to_bs(self):
        par = HestonParams.make(v0=0.04, kappa=2.0, theta=0.04, sigma=1e-4, rho=0.0, dtype=F)
        p = float(heston_price(_batch(), par))
        assert abs(p - 10.450583572185565) < 1e-4

    def test_literature_value(self):
        # Albrecher et al. "little trap" test set
        par = HestonParams.make(v0=0.0175, kappa=1.5768, theta=0.0398,
                                sigma=0.5751, rho=-0.5711, dtype=F)
        p = float(heston_price(_batch(r=0.0), par, n_nodes=192, u_max=300.0))
        assert abs(p - 5.7851) < 2e-3

    def test_mc_matches_analytic(self):
        par32 = HestonParams.make(0.0175, 1.5768, 0.0398, 0.5751, -0.5711)
        par64 = HestonParams.make(0.0175, 1.5768, 0.0398, 0.5751, -0.5711, dtype=F)
        pa = float(heston_price(_batch(r=0.0), par64, n_nodes=192, u_max=300.0))
        pmc = float(heston_mc_price(_batch(r=0.0, dtype=jnp.float32), par32, KEY,
                                    n_paths=100_000, n_steps=100))
        assert abs(pa - pmc) < 0.08

    def test_put_call_parity(self):
        par = HestonParams.make(dtype=F)
        c = float(heston_price(_batch(cp="call"), par))
        p = float(heston_price(_batch(cp="put"), par))
        assert abs((c - p) - (100 - 100 * np.exp(-0.05))) < 1e-6

    def test_qe_scheme_matches_analytic(self):
        par = HestonParams.make(0.0175, 1.5768, 0.0398, 0.5751, -0.5711)
        par64 = HestonParams.make(0.0175, 1.5768, 0.0398, 0.5751, -0.5711,
                                  dtype=F)
        pa = float(heston_price(_batch(r=0.0), par64, n_nodes=192,
                                u_max=300.0))
        pmc = float(heston_mc_price(_batch(r=0.0, dtype=jnp.float32), par,
                                    KEY, n_paths=200_000, n_steps=32,
                                    scheme="qe"))
        assert abs(pa - pmc) < 0.06

    def test_qe_crushes_euler_bias_when_feller_violated(self):
        # 2*kappa*theta = 0.04 << sigma^2 = 1: full-truncation Euler at 8
        # steps is ~+2.0 biased; Andersen QE samples the (near-exact)
        # variance transition and stays within MC noise
        import logging

        logging.disable(logging.WARNING)  # intentional Feller violation
        try:
            par = HestonParams.make(v0=0.04, kappa=0.5, theta=0.04,
                                    sigma=1.0, rho=-0.9)
            par64 = HestonParams.make(v0=0.04, kappa=0.5, theta=0.04,
                                      sigma=1.0, rho=-0.9, dtype=F)
            b32 = _batch(r=0.02, dtype=jnp.float32)
            exact = float(heston_price(_batch(r=0.02), par64))
            eu = np.mean([float(heston_mc_price(
                b32, par, jax.random.PRNGKey(s), n_paths=200_000, n_steps=8))
                for s in range(3)])
            qe = np.mean([float(heston_mc_price(
                b32, par, jax.random.PRNGKey(s), n_paths=200_000, n_steps=8,
                scheme="qe")) for s in range(3)])
            assert abs(eu - exact) > 1.0      # Euler is badly biased here
            assert abs(qe - exact) < 0.08     # QE is not
        finally:
            logging.disable(logging.NOTSET)

    def test_unknown_scheme_raises(self):
        from optionslab_tpu.utils.exceptions import ValidationError

        with pytest.raises(ValidationError):
            heston_mc_price(_batch(dtype=jnp.float32), HestonParams.make(),
                            KEY, n_paths=1000, n_steps=4, scheme="milstein")

    def test_paths_shape(self):
        par = HestonParams.make()
        spots, variances = heston_simulate_paths(100.0, par, 0.05, 0.0, 1.0, KEY,
                                                 n_paths=64, n_steps=50)
        assert spots.shape == (64, 51)
        assert variances.shape == (64, 51)
        assert bool(jnp.all(variances >= 0))

    def test_validation(self):
        with pytest.raises(ValidationError):
            HestonPricer(v0=-0.1)
        with pytest.raises(ValidationError):
            HestonPricer(rho=1.5)

    @pytest.mark.parametrize("pvals", [
        (0.04, 2.0, 0.04, 0.3, -0.7),   # textbook
        (0.09, 1.0, 0.09, 0.9, -0.9),   # extreme rho / vol-of-vol
        (0.04, 0.5, 0.06, 0.5, 0.9),    # positive rho
        (0.02, 3.0, 0.02, 0.6, -0.5),   # Feller-violating, thin v0
    ])
    def test_cos_cross_checks_lewis(self, pvals):
        """Two INDEPENDENT semi-analytic engines (Lewis integral vs COS
        expansion) must agree across strikes/maturities/types — including
        extreme-rho and Feller-violating corners."""
        par = HestonParams.make(*pvals, dtype=F)
        strikes = jnp.asarray([60.0, 80.0, 100.0, 120.0, 160.0], F)
        for t in (0.1, 1.0, 5.0):
            for cp in ("call", "put"):
                b = ContractBatch.make(100.0, strikes, t, 0.03, 0.2, cp,
                                       dividend=0.01, dtype=F)
                lew = np.asarray(heston_price(b, par, n_nodes=1024, u_max=3000.0))
                cos = np.asarray(heston_price_cos(b, par))
                np.testing.assert_allclose(cos, lew, atol=2e-4)

    def test_cos_zero_volofvol_reduces_to_bs(self):
        par = HestonParams.make(v0=0.04, kappa=2.0, theta=0.04, sigma=1e-4,
                                rho=0.0, dtype=F)
        p = float(heston_price_cos(_batch(), par))
        assert abs(p - 10.450583572185565) < 1e-4

    def test_cos_greeks_via_ad(self):
        par = HestonParams.make(dtype=F)

        def price_of(s):
            return heston_price_cos(
                ContractBatch.make(s, 100.0, 1.0, 0.05, 0.2, "call", dtype=F), par)

        delta = float(jax.grad(price_of)(jnp.asarray(100.0, F)))
        eps = 0.05
        fd = (float(price_of(jnp.asarray(100 + eps, F)))
              - float(price_of(jnp.asarray(100 - eps, F)))) / (2 * eps)
        assert abs(delta - fd) < 1e-4
        assert 0.3 < delta < 0.9

    @pytest.mark.slow
    def test_calibration_recovers_params(self):
        true = HestonParams.make(v0=0.05, kappa=1.8, theta=0.05, sigma=0.4, rho=-0.6)
        strikes = jnp.asarray([80.0, 90.0, 100.0, 110.0, 120.0], jnp.float32)
        mats = jnp.asarray([0.25, 0.5, 1.0], jnp.float32)
        b = ContractBatch.make(100.0, strikes[None, :], mats[:, None], 0.03, 0.2, "call",
                               dtype=jnp.float32)
        market = heston_price(b, true)
        fit, loss = calibrate_heston(market, b, n_steps=400)
        refit = heston_price(b, fit)
        rel = np.abs(np.asarray(refit - market)) / np.asarray(market)
        assert loss < 1e-4
        assert rel.max() < 0.05


class TestSABR:
    def test_atm_formula(self):
        m = SABRModel(alpha=0.2, beta=0.5, rho=-0.3, nu=0.4)
        atm = float(m.atm_vol(100.0, 1.0))
        a, b, rho, nu = 0.2, 0.5, -0.3, 0.4
        fmid = 100.0 ** (1 - b)
        expect = a / fmid * (1 + 1.0 * ((1 - b) ** 2 / 24 * a * a / fmid**2
                                        + 0.25 * rho * b * nu * a / fmid
                                        + (2 - 3 * rho**2) / 24 * nu * nu))
        assert abs(atm - expect) < 1e-7

    def test_atm_continuity(self):
        m = SABRModel()
        v0 = float(m.implied_vol(100.0, 100.0, 1.0))
        v1 = float(m.implied_vol(100.0, 100.0 + 1e-5, 1.0))
        assert abs(v0 - v1) < 1e-5

    def test_beta_one_flat_when_nu_zero(self):
        par = SABRParams.make(alpha=0.25, beta=1.0, rho=0.0, nu=1e-8, dtype=F)
        ks = jnp.asarray([80.0, 100.0, 125.0], F)
        vols = np.asarray(sabr_implied_vol(100.0, ks, 1.0, par))
        np.testing.assert_allclose(vols, 0.25, atol=1e-4)

    def test_smile_shape(self):
        m = SABRModel(alpha=2.0, beta=1.0, rho=-0.4, nu=0.6)  # beta=1: alpha is vol
        ks = np.linspace(70, 130, 13)
        smile = np.asarray(m.smile(100.0, ks, 1.0))
        assert smile.min() > 0
        # negative rho: downside vols higher
        assert smile[0] > smile[-1]

    def test_calibration_roundtrip(self):
        true = SABRParams.make(0.3, 0.5, -0.4, 0.5, dtype=F)
        ks = np.array([70.0, 85.0, 100.0, 115.0, 130.0])
        vols = sabr_implied_vol(100.0, jnp.asarray(ks), 1.0, true)
        fit, loss = calibrate_sabr(100.0, ks, 1.0, vols, beta=0.5, n_steps=600)
        assert loss < 1e-8
        assert abs(float(fit.rho) - (-0.4)) < 0.05

    def test_validation(self):
        with pytest.raises(ValidationError):
            SABRModel(alpha=-0.1)
        with pytest.raises(ValidationError):
            SABRModel(beta=1.5)


class TestJumpDiffusion:
    def test_series_matches_mc(self):
        m = MertonJumpDiffusion(lam=1.0, mu_j=-0.1, sigma_j=0.15)
        ps = float(m.price(100.0, 100.0, 1.0, 0.05, 0.2))
        pmc = float(m.price_monte_carlo(100.0, 100.0, 1.0, 0.05, 0.2,
                                        n_paths=400_000, seed=2))
        assert abs(ps - pmc) < 0.05

    def test_zero_intensity_is_bs(self):
        m = MertonJumpDiffusion(lam=0.0, mu_j=0.0, sigma_j=1e-4)
        p = float(m.price(100.0, 100.0, 1.0, 0.05, 0.2))
        assert abs(p - 10.450583572185565) < 1e-4

    def test_jump_risk_raises_price(self):
        base = MertonJumpDiffusion(lam=0.0, mu_j=0.0, sigma_j=1e-4)
        jumpy = MertonJumpDiffusion(lam=2.0, mu_j=-0.05, sigma_j=0.2)
        assert float(jumpy.price(100.0, 100.0, 1.0, 0.05, 0.2)) > float(
            base.price(100.0, 100.0, 1.0, 0.05, 0.2)
        )

    def test_kou_kappa_and_mc(self):
        k = KouJumpDiffusion(lam=1.0, p_up=0.4, eta1=10.0, eta2=5.0)
        assert abs(k.kappa - (0.4 * 10 / 9 + 0.6 * 5 / 6 - 1)) < 1e-10
        p = float(k.price_monte_carlo(100.0, 100.0, 1.0, 0.05, 0.2,
                                      n_paths=100_000, seed=3))
        assert 10.0 < p < 20.0

    def test_merton_put_call_parity(self):
        m = MertonJumpDiffusion(lam=0.7, mu_j=-0.08, sigma_j=0.18)
        c = float(m.price(100.0, 100.0, 1.0, 0.05, 0.2))
        p = float(m.price(100.0, 100.0, 1.0, 0.05, 0.2, option_type="put"))
        assert abs((c - p) - (100 - 100 * np.exp(-0.05))) < 5e-3

    def test_validation(self):
        with pytest.raises(ValidationError):
            MertonJumpDiffusion(lam=-1.0)
        with pytest.raises(ValidationError):
            KouJumpDiffusion(eta1=0.5)

    def test_path_simulator(self):
        m = MertonJumpDiffusion(lam=1.0, mu_j=-0.1, sigma_j=0.15)
        path = m.simulate_path(100.0, 1.0, 0.05, 0.2, n_steps=100)
        assert path.shape == (101,)
        assert float(path[0]) == 100.0
        assert bool(jnp.all(path > 0))
