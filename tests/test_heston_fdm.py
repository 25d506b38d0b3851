"""Heston 2-D ADI PDE solver: Lewis-engine parity, frozen-variance
reduction to the 1-D BS engine, and an independent Heston-LSM Monte Carlo
lower bound for the American put. Beyond the reference (1-D BS FDM only).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

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

    @pytest.mark.slow
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


class TestFdmGreeksLadder:
    """heston_fdm_greeks: full ladder through the 2-D ADI solve.

    European oracle: AD of the Lewis CF engine — every entry must agree
    to ~1% (the sinh-stretched v-grid is what makes d_sigma/d_rho
    converge; the old uniform 5*vbar cap biased d_sigma by ~13%).
    American oracle: CRN central differences of the solver itself.
    """

    @pytest.fixture(scope="class")
    def params(self):
        return HestonParams.make()

    @pytest.fixture(scope="class")
    def euro(self, params):
        from optionslab_tpu.models import heston_fdm_greeks

        return heston_fdm_greeks(100.0, 100.0, 1.0, 0.05, params,
                                 option_type="put", n_x=151, n_v=81,
                                 n_t=100)

    def test_european_ladder_matches_lewis_ad(self, euro, params):
        import dataclasses

        def lewis(s, v0, kap, th, sig, rho, r, t):
            pp = dataclasses.replace(params, v0=v0, kappa=kap, theta=th,
                                     sigma=sig, rho=rho)
            return heston_price(
                ContractBatch.make(s, 100.0, t, r, 0.2, "put"), pp)

        args = (100.0, 0.04, 2.0, 0.04, 0.3, -0.7, 0.05, 1.0)
        gr = jax.grad(lewis, argnums=tuple(range(8)))(
            *(jnp.float32(a) for a in args))
        ref = dict(zip(["delta", "vega_v0", "d_kappa", "d_theta",
                        "d_sigma", "d_rho", "rho_rate", "theta_cal"],
                       (float(x) for x in gr)))
        ref["theta_cal"] = -ref["theta_cal"]
        for k, rv in ref.items():
            tol = 0.015 * max(abs(rv), 1.0)
            assert abs(euro[k] - rv) < tol, (k, euro[k], rv)

    def test_gamma_vomma_vs_lewis_ad(self, euro, params):
        def lewis_s(s):
            return heston_price(
                ContractBatch.make(s, 100.0, 1.0, 0.05, 0.2, "put"), params)

        gam = float(jax.grad(jax.grad(lewis_s))(jnp.float32(100.0)))
        assert abs(euro["gamma"] - gam) < 0.05 * abs(gam), (euro["gamma"], gam)

    @pytest.mark.slow
    def test_american_delta_vs_crn_fd(self, params):
        from optionslab_tpu.models import heston_fdm_greeks

        g = heston_fdm_greeks(100.0, 100.0, 1.0, 0.05, params,
                              option_type="put", american=True,
                              n_x=151, n_v=81, n_t=100)

        def price(s):
            return float(heston_fdm_price(s, 100.0, 1.0, 0.05, params,
                                          option_type="put", american=True,
                                          n_x=151, n_v=81, n_t=100))

        fd = (price(100.5) - price(99.5)) / 1.0
        assert abs(g["delta"] - fd) < 0.01, (g["delta"], fd)
        # American put: negative calendar theta, positive vega
        assert g["theta_cal"] < 0 and g["vega_v0"] > 0 and g["gamma"] > 0

    @pytest.mark.slow
    def test_american_sigma_sensitivity_vs_crn_fd(self, params):
        import dataclasses

        from optionslab_tpu.models import heston_fdm_greeks

        g = heston_fdm_greeks(100.0, 100.0, 1.0, 0.05, params,
                              option_type="put", american=True,
                              n_x=151, n_v=81, n_t=100)
        h = 0.01

        def price(sig):
            return float(heston_fdm_price(
                100.0, 100.0, 1.0, 0.05,
                dataclasses.replace(params, sigma=jnp.float32(sig)),
                option_type="put", american=True, n_x=151, n_v=81, n_t=100))

        fd = (price(0.3 + h) - price(0.3 - h)) / (2 * h)
        assert abs(g["d_sigma"] - fd) < 0.03 + 0.03 * abs(fd), \
            (g["d_sigma"], fd)

    def test_zero_maturity_rejected(self, params):
        from optionslab_tpu.models import heston_fdm_greeks
        from optionslab_tpu.utils.exceptions import ValidationError

        with pytest.raises(ValidationError):
            heston_fdm_greeks(100.0, 100.0, 0.0, 0.05, params)
