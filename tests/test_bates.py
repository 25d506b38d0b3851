"""Bates SVJ model: reductions to Heston and Merton, engine cross-checks,
MC, calibration, AD Greeks.

Beyond the reference (it has Heston and Merton separately, no SVJ).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from optionslab_tpu.models.bates import (BatesParams, BatesPricer,
                                         bates_mc_price, bates_price,
                                         bates_price_cos, calibrate_bates)
from optionslab_tpu.models.heston import HestonParams, heston_price
from optionslab_tpu.models.jump_diffusion import merton_price
from optionslab_tpu.types import ContractBatch
from optionslab_tpu.utils.exceptions import ValidationError

F = jnp.float64


@pytest.fixture(scope="module")
def batch():
    return ContractBatch.make(spot=100.0, strike=np.array([80.0, 100.0, 120.0]),
                              maturity=1.0, rate=0.05, vol=0.2,
                              option_type="call", dtype=F)


class TestReductions:
    def test_zero_intensity_is_exactly_heston(self, batch):
        pb = BatesParams.make(lam=0.0, dtype=F)
        ph = HestonParams.make(dtype=F)
        np.testing.assert_allclose(np.asarray(bates_price(batch, pb)),
                                   np.asarray(heston_price(batch, ph)),
                                   rtol=0, atol=1e-12)

    def test_frozen_variance_is_merton(self, batch):
        # v0 = theta with tiny vol-of-vol freezes v at theta: Bates ==
        # Merton with sigma = sqrt(theta)
        pm = BatesParams.make(v0=0.04, kappa=2.0, theta=0.04, sigma=1e-3,
                              rho=0.0, lam=0.5, mu_j=-0.1, sigma_j=0.15,
                              dtype=F)
        bm = np.asarray(merton_price(batch, 0.5, -0.1, 0.15))
        np.testing.assert_allclose(np.asarray(bates_price(batch, pm)), bm,
                                   atol=1e-4)

    def test_jumps_add_value_otm(self, batch):
        # OTM options gain from jump risk (martingale-preserving comp.)
        pj = BatesParams.make(lam=1.0, mu_j=-0.1, sigma_j=0.2, dtype=F)
        p0 = BatesParams.make(lam=0.0, dtype=F)
        with_j = np.asarray(bates_price(batch, pj))
        without = np.asarray(bates_price(batch, p0))
        assert with_j[2] > without[2]  # 120-strike call


class TestEngines:
    def test_lewis_vs_cos(self, batch):
        p = BatesParams.make(dtype=F)
        lw = np.asarray(bates_price(batch, p))
        cs = np.asarray(bates_price_cos(batch, p))
        np.testing.assert_allclose(lw, cs, atol=5e-6)

    def test_put_call_parity(self):
        p = BatesParams.make(dtype=F)
        c = ContractBatch.make(100.0, 100.0, 1.0, 0.05, 0.2, "call", dtype=F)
        q = ContractBatch.make(100.0, 100.0, 1.0, 0.05, 0.2, "put", dtype=F)
        lhs = float(bates_price(c, p)) - float(bates_price(q, p))
        rhs = 100.0 - 100.0 * np.exp(-0.05)
        assert abs(lhs - rhs) < 1e-10

    @pytest.mark.slow
    def test_mc_matches_semianalytic(self, batch):
        p = BatesParams.make(dtype=F)
        mc = np.asarray(bates_mc_price(batch, p, jax.random.PRNGKey(0),
                                       n_paths=200_000, n_steps=200))
        lw = np.asarray(bates_price(batch, p))
        # 200k paths: stderr ~ 0.03-0.04 plus O(dt) Euler bias
        np.testing.assert_allclose(mc, lw, atol=0.12)

    def test_expiring_contract_prices_intrinsic(self):
        p = BatesParams.make(dtype=F)
        b = ContractBatch.make(110.0, 100.0, 0.0, 0.05, 0.2, "call", dtype=F)
        assert abs(float(bates_price(b, p)) - 10.0) < 1e-10
        assert abs(float(bates_price_cos(b, p)) - 10.0) < 1e-10

    def test_gradients_flow_through_lewis(self, batch):
        p = BatesParams.make(dtype=F)

        def price_atm(lam):
            pp = BatesParams(v0=p.v0, kappa=p.kappa, theta=p.theta,
                             sigma=p.sigma, rho=p.rho, lam=lam, mu_j=p.mu_j,
                             sigma_j=p.sigma_j)
            return bates_price(batch, pp)[1]

        g = float(jax.grad(price_atm)(jnp.asarray(0.5, F)))
        # FD check
        eps = 1e-5
        fd = (float(price_atm(jnp.asarray(0.5 + eps, F)))
              - float(price_atm(jnp.asarray(0.5 - eps, F)))) / (2 * eps)
        assert abs(g - fd) < 1e-6


class TestUnifiedGreeksAdapter:
    @pytest.mark.slow
    def test_delta_vega_through_adapter(self):
        from optionslab_tpu.greeks import bates_price_fn, greeks_from_fn

        p = BatesParams.make(dtype=F)
        g = greeks_from_fn(bates_price_fn(p, cp=1.0), 100.0, 100.0, 1.0,
                           0.05, 0.2, 0.0)
        assert 0.4 < float(g["delta"]) < 0.9
        assert float(g["vega"]) > 0
        # delta must exceed the no-jump Heston delta... just check finite set
        for k in ("theta", "rho", "gamma"):
            assert np.isfinite(float(g[k]))


class TestCalibration:
    @pytest.mark.slow
    def test_recovers_prices(self, batch):
        true = BatesParams.make(v0=0.05, kappa=1.5, theta=0.05, sigma=0.4,
                                rho=-0.6, lam=0.8, mu_j=-0.08, sigma_j=0.12,
                                dtype=F)
        target = np.asarray(bates_price(batch, true))
        fitted, loss = calibrate_bates(target, batch, n_steps=800)
        assert loss < 1e-4
        refit = np.asarray(bates_price(batch, fitted))
        np.testing.assert_allclose(refit, target, rtol=0.02)


class TestPricerFacade:
    def test_engines_agree(self):
        pr = BatesPricer()
        a = float(pr.price_european(100.0, 100.0, 1.0, 0.05))
        b = float(pr.price_european(100.0, 100.0, 1.0, 0.05, engine="cos"))
        assert abs(a - b) < 1e-4
        assert 5.0 < a < 20.0

    def test_invalid_engine_raises(self):
        with pytest.raises(ValidationError):
            BatesPricer().price_european(100.0, 100.0, 1.0, 0.05,
                                         engine="fft")

    def test_invalid_params_raise(self):
        with pytest.raises(ValidationError):
            BatesPricer(lam=-1.0)
