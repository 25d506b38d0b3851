"""Heston 2-D ADI PDE solver: Lewis-engine parity, frozen-variance
reduction to the 1-D BS engine, and an independent Heston-LSM Monte Carlo
lower bound for the American put. Beyond the reference (1-D BS FDM only).
"""
import numpy as np
import pytest
import jax

from optionslab_tpu.models.fdm import fdm_price
from optionslab_tpu.models.heston import (HestonParams, heston_price,
                                          heston_simulate_paths)
from optionslab_tpu.models.heston_fdm import heston_fdm_price
from optionslab_tpu.types import ContractBatch


@pytest.fixture(scope="module")
def params():
    return HestonParams.make(v0=0.04, kappa=2.0, theta=0.05, sigma=0.3,
                             rho=-0.7)


class TestEuropean:
    @pytest.mark.parametrize("strike", [90.0, 100.0, 110.0])
    def test_matches_lewis_engine(self, params, strike):
        lw = float(heston_price(
            ContractBatch.make(100.0, strike, 1.0, 0.05, 0.2, "call"),
            params))
        pde = float(heston_fdm_price(100.0, strike, 1.0, 0.05, params,
                                     option_type="call"))
        assert abs(pde / lw - 1.0) < 2e-3

    def test_put_matches_lewis(self, params):
        lw = float(heston_price(
            ContractBatch.make(100.0, 100.0, 1.0, 0.05, 0.2, "put"), params))
        pde = float(heston_fdm_price(100.0, 100.0, 1.0, 0.05, params,
                                     option_type="put"))
        assert abs(pde / lw - 1.0) < 2e-3

    def test_expiry_is_intrinsic(self, params):
        assert heston_fdm_price(110.0, 100.0, 0.0, 0.05, params) == 10.0


class TestFrozenVarianceReduction:
    """sigma -> 0 with v0 = theta freezes v: must match the 1-D BS engine."""

    @pytest.fixture(scope="class")
    def frozen(self):
        return HestonParams.make(v0=0.04, kappa=2.0, theta=0.04, sigma=1e-3,
                                 rho=0.0)

    def test_european_put(self, frozen):
        bs1d = float(fdm_price(
            ContractBatch.make(100.0, 100.0, 1.0, 0.05, 0.2, "put"),
            american=False))
        adi = float(heston_fdm_price(100.0, 100.0, 1.0, 0.05, frozen,
                                     option_type="put"))
        assert abs(adi - bs1d) < 0.02

    def test_american_put(self, frozen):
        bs1d = float(fdm_price(
            ContractBatch.make(100.0, 100.0, 1.0, 0.05, 0.2, "put"),
            american=True))
        adi = float(heston_fdm_price(100.0, 100.0, 1.0, 0.05, frozen,
                                     option_type="put", american=True))
        assert abs(adi - bs1d) < 0.02


def _heston_lsm_put(spot, strike, maturity, rate, params, key,
                    n_paths=100_000, n_dates=50):
    """Independent LSM lower bound for the American put under Heston,
    regressing on (1, S, S^2, v, S*v, payoff)."""
    s, v = heston_simulate_paths(spot, params, rate, 0.0, maturity, key,
                                 n_paths=n_paths, n_steps=n_dates)
    s, v = np.asarray(s, np.float64), np.asarray(v, np.float64)
    dt = maturity / n_dates
    disc = np.exp(-rate * dt)
    cash = np.maximum(strike - s[:, -1], 0.0)
    for i in range(n_dates - 1, 0, -1):
        cash *= disc
        ex = np.maximum(strike - s[:, i], 0.0)
        itm = ex > 0
        if itm.sum() > 50:
            si, vi = s[itm, i] / strike, v[itm, i]
            basis = np.stack([np.ones(itm.sum()), si, si * si, vi, si * vi,
                              ex[itm] / strike], axis=1)
            coef, *_ = np.linalg.lstsq(basis, cash[itm], rcond=None)
            cont = basis @ coef
            ex_now = ex[itm] > cont
            idx = np.where(itm)[0][ex_now]
            cash[idx] = ex[idx]
    return float(np.mean(cash) * disc), float(np.std(cash) / np.sqrt(n_paths))


class TestAmericanHeston:
    def test_american_above_european(self, params):
        eu = float(heston_fdm_price(100.0, 100.0, 1.0, 0.05, params,
                                    option_type="put"))
        am = float(heston_fdm_price(100.0, 100.0, 1.0, 0.05, params,
                                    option_type="put", american=True))
        assert am > eu + 0.05
        assert am >= 0.0  # and above intrinsic at the money
        assert am >= 100.0 - 100.0

    def test_against_lsm_lower_bound(self, params):
        am = float(heston_fdm_price(100.0, 100.0, 1.0, 0.05, params,
                                    option_type="put", american=True,
                                    n_x=301, n_v=121, n_t=300))
        lsm, se = _heston_lsm_put(100.0, 100.0, 1.0, 0.05, params,
                                  jax.random.PRNGKey(0))
        # LSM is a (slightly low-biased) lower bound: PDE must sit at or
        # above it, and within a tight band
        assert am > lsm - 3 * se - 0.01
        assert abs(am - lsm) < 0.08

    def test_deep_itm_equals_intrinsic(self, params):
        am = float(heston_fdm_price(60.0, 100.0, 1.0, 0.05, params,
                                    option_type="put", american=True))
        assert abs(am - 40.0) < 0.05

    def test_ad_delta_through_the_adi_scan(self, params):
        # the whole Douglas scheme (scan + batched Thomas solves) is
        # AD-compatible: delta by jax.grad matches central FD
        import jax.numpy as jnp

        def price(s):
            return heston_fdm_price(s, 100.0, 1.0, 0.05, params,
                                    option_type="put", american=True,
                                    n_x=151, n_v=61, n_t=100)

        g = float(jax.grad(price)(jnp.float32(100.0)))
        eps = 0.5
        fd = (float(price(jnp.float32(100.5)))
              - float(price(jnp.float32(99.5)))) / (2 * eps)
        assert -1.0 < g < 0.0
        assert abs(g - fd) < 0.02

    def test_call_no_dividend_no_premium(self, params):
        # American call on a non-dividend payer is European
        eu = float(heston_fdm_price(100.0, 100.0, 1.0, 0.05, params,
                                    option_type="call"))
        am = float(heston_fdm_price(100.0, 100.0, 1.0, 0.05, params,
                                    option_type="call", american=True))
        assert abs(am - eu) < 0.02
