"""Variance Gamma + NIG Lévy models: BS limits, exact-subordination MC,
parity, AD. Beyond the reference (its jump models stop at Merton/Kou)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from optionslab_tpu.models.black_scholes import bs_price
from optionslab_tpu.models.levy import (NIGParams, VGParams, nig_mc_price,
                                        nig_price, vg_mc_price, vg_price)
from optionslab_tpu.types import ContractBatch
from optionslab_tpu.utils.exceptions import ValidationError

F = jnp.float64


@pytest.fixture(scope="module")
def batch():
    return ContractBatch.make(100.0, np.array([80.0, 100.0, 120.0]), 1.0,
                              0.05, 0.2, "call", dtype=F)


@pytest.fixture(scope="module")
def bs_ref():
    return np.asarray(bs_price(100.0, np.array([80.0, 100.0, 120.0]), 1.0,
                               0.05, 0.2, 1.0))


class TestBSLimits:
    def test_vg_small_nu_is_bs(self, batch, bs_ref):
        p = VGParams.make(sigma=0.2, nu=1e-5, theta=0.0, dtype=F)
        np.testing.assert_allclose(np.asarray(vg_price(batch, p)), bs_ref,
                                   atol=1e-4)

    def test_nig_large_alpha_is_bs(self, batch, bs_ref):
        # var = delta/alpha = 0.04 with beta = 0
        p = NIGParams.make(alpha=1000.0, beta=0.0, delta=40.0, dtype=F)
        np.testing.assert_allclose(np.asarray(nig_price(batch, p)), bs_ref,
                                   atol=1e-4)


class TestMCCrossChecks:
    def test_vg_mc(self, batch):
        p = VGParams.make(dtype=F)
        lw = np.asarray(vg_price(batch, p))
        m, se = vg_mc_price(batch, p, jax.random.PRNGKey(0), n_paths=400_000)
        assert np.all(np.abs(lw - np.asarray(m)) < 4 * np.asarray(se) + 1e-3)

    def test_nig_mc(self, batch):
        p = NIGParams.make(dtype=F)
        lw = np.asarray(nig_price(batch, p))
        m, se = nig_mc_price(batch, p, jax.random.PRNGKey(3), n_paths=400_000)
        assert np.all(np.abs(lw - np.asarray(m)) < 4 * np.asarray(se) + 1e-3)


class TestIdentities:
    def test_vg_put_call_parity(self):
        p = VGParams.make(dtype=F)
        c = ContractBatch.make(100.0, 100.0, 1.0, 0.05, 0.2, "call", dtype=F)
        q = ContractBatch.make(100.0, 100.0, 1.0, 0.05, 0.2, "put", dtype=F)
        lhs = float(vg_price(c, p)) - float(vg_price(q, p))
        assert abs(lhs - (100.0 - 100.0 * np.exp(-0.05))) < 1e-10

    def test_quadrature_converged(self, batch):
        p = NIGParams.make(dtype=F)
        a = np.asarray(nig_price(batch, p, n_nodes=256, u_max=400.0))
        b = np.asarray(nig_price(batch, p, n_nodes=512, u_max=800.0))
        np.testing.assert_allclose(a, b, atol=1e-7)

    def test_negative_skew_raises_otm_put_iv(self):
        # theta < 0 (VG) fattens the left tail: OTM put worth more than BS
        # at the ATM-matched vol
        from optionslab_tpu.models.iv import implied_vol

        p = VGParams.make(sigma=0.2, nu=0.3, theta=-0.2, dtype=F)
        atm = ContractBatch.make(100.0, 100.0, 1.0, 0.05, 0.2, "call", dtype=F)
        otm_put = ContractBatch.make(100.0, 80.0, 1.0, 0.05, 0.2, "put", dtype=F)
        iv_atm = float(implied_vol(float(vg_price(atm, p)), 100.0, 100.0,
                                   1.0, 0.05, 1.0))
        iv_put = float(implied_vol(float(vg_price(otm_put, p)), 100.0, 80.0,
                                   1.0, 0.05, -1.0))
        assert iv_put > iv_atm + 0.01

    def test_ad_delta(self, batch):
        p = VGParams.make(dtype=F)

        def price_atm(s):
            bb = ContractBatch.make(s, 100.0, 1.0, 0.05, 0.2, "call", dtype=F)
            return vg_price(bb, p)

        g = float(jax.grad(price_atm)(jnp.asarray(100.0, F)))
        eps = 1e-4
        fd = (float(price_atm(jnp.asarray(100.0 + eps, F)))
              - float(price_atm(jnp.asarray(100.0 - eps, F)))) / (2 * eps)
        assert abs(g - fd) < 1e-6
        assert 0.4 < g < 0.9


class TestValidation:
    def test_vg_martingale_condition(self):
        with pytest.raises(ValidationError):
            VGParams.make(sigma=0.5, nu=3.0, theta=0.5).validate()

    def test_nig_constraints(self):
        with pytest.raises(ValidationError):
            NIGParams.make(alpha=2.0, beta=2.5, delta=0.3).validate()
