"""Monte Carlo engine tests.

Mirrors the reference strategy (SURVEY.md §4): MC within tolerance of BS
(``tests/test_monte_carlo.py:119-141``), determinism (``:153-158``), stderr
sanity (``:160-168``), greeks signs (``:170-201``), invalid-input raising
(``:106-118``), backend equivalence (XLA vs QMC here), monotonicity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optionslab_tpu.models.black_scholes import bs_greeks, bs_price
from optionslab_tpu.models.monte_carlo import (
    MCConfig,
    MCMethod,
    MonteCarloPricer,
    draw_normals,
    gbm_paths,
    gbm_terminal,
    mc_greeks,
    mc_greeks_smoothed,
    mc_price,
    mc_price_control_variate,
    mc_price_result,
)
from optionslab_tpu.types import ContractBatch
from optionslab_tpu.utils.exceptions import ValidationError

KEY = jax.random.PRNGKey(7)
ATM = dict(S=100.0, K=100.0, T=1.0, r=0.05, sigma=0.2)


def _batch(dtype=jnp.float64, option_type="call", **kw):
    p = {**ATM, **kw}
    return ContractBatch.make(
        p["S"], p["K"], p["T"], p["r"], p["sigma"], option_type, p.get("q", 0.0), dtype=dtype
    )


class TestPriceAccuracy:
    @pytest.mark.parametrize("option_type", ["call", "put"])
    def test_within_3_stderr_of_bs(self, option_type):
        cfg = MCConfig(n_paths=100_000, dtype=jnp.float64)
        b = _batch(option_type=option_type)
        res = mc_price_result(b, KEY, cfg)
        exact = float(bs_price(b.spot, b.strike, b.maturity, b.rate, b.vol, b.cp, b.dividend))
        assert abs(float(res.price) - exact) < 3.0 * float(res.std_error)
        assert float(res.std_error) < 0.2

    def test_multi_step_matches_single_step_distribution(self):
        # terminal GBM is exact at any step count — prices agree within MC error
        b = _batch()
        p1 = float(mc_price(b, KEY, MCConfig(n_paths=200_000, n_steps=1, dtype=jnp.float64)))
        p2 = float(mc_price(b, KEY, MCConfig(n_paths=200_000, n_steps=8, dtype=jnp.float64)))
        assert abs(p1 - p2) < 0.25

    def test_qmc_beats_pseudo_at_same_n(self):
        b = _batch()
        exact = 10.450583572185565
        n = 16_384
        err_q = abs(float(mc_price(b, KEY, MCConfig(n_paths=n, method=MCMethod.QMC, dtype=jnp.float64))) - exact)
        errs_p = [
            abs(float(mc_price(b, jax.random.PRNGKey(s), MCConfig(n_paths=n, dtype=jnp.float64))) - exact)
            for s in range(5)
        ]
        assert err_q < np.median(errs_p) + 0.05

    def test_control_variate_reduces_stderr(self):
        b = _batch()
        cfg = MCConfig(n_paths=50_000, antithetic=False, dtype=jnp.float64)
        plain = mc_price_result(b, KEY, cfg)
        cv = mc_price_control_variate(b, KEY, cfg)
        assert float(cv.std_error) < 0.5 * float(plain.std_error)
        assert abs(float(cv.price) - 10.450583572185565) < 3 * float(cv.std_error) + 1e-6

    def test_expired_contract_returns_intrinsic(self):
        b = _batch(S=120.0, T=0.0)
        assert float(mc_price(b, KEY, MCConfig(n_paths=1000, dtype=jnp.float64))) == pytest.approx(20.0)

    def test_batch_book_prices_monotone_in_spot(self):
        spots = jnp.linspace(80.0, 120.0, 9, dtype=jnp.float64)
        b = ContractBatch.make(spots, 100.0, 1.0, 0.05, 0.2, "call", dtype=jnp.float64)
        p = mc_price(b, KEY, MCConfig(n_paths=100_000, dtype=jnp.float64))
        assert p.shape == (9,)
        assert bool(jnp.all(jnp.diff(p) > 0))

    def test_higher_vol_higher_price(self):
        b_lo = _batch(sigma=0.1)
        b_hi = _batch(sigma=0.4)
        cfg = MCConfig(n_paths=100_000, dtype=jnp.float64)
        assert float(mc_price(b_hi, KEY, cfg)) > float(mc_price(b_lo, KEY, cfg))


class TestDeterminism:
    def test_same_key_same_price(self):
        b = _batch()
        cfg = MCConfig(n_paths=10_000, dtype=jnp.float64)
        p1 = float(mc_price(b, jax.random.PRNGKey(3), cfg))
        p2 = float(mc_price(b, jax.random.PRNGKey(3), cfg))
        assert p1 == p2

    def test_different_key_different_price(self):
        b = _batch()
        cfg = MCConfig(n_paths=10_000, dtype=jnp.float64)
        assert float(mc_price(b, jax.random.PRNGKey(1), cfg)) != float(
            mc_price(b, jax.random.PRNGKey(2), cfg)
        )


class TestStdError:
    def test_stderr_scales_inverse_sqrt_n(self):
        b = _batch()
        se1 = float(mc_price_result(b, KEY, MCConfig(n_paths=4_000, antithetic=False, dtype=jnp.float64)).std_error)
        se2 = float(mc_price_result(b, KEY, MCConfig(n_paths=64_000, antithetic=False, dtype=jnp.float64)).std_error)
        assert se2 == pytest.approx(se1 / 4.0, rel=0.35)

    def test_antithetic_reduces_stderr(self):
        b = _batch()
        se_anti = float(mc_price_result(b, KEY, MCConfig(n_paths=50_000, antithetic=True, dtype=jnp.float64)).std_error)
        se_plain = float(mc_price_result(b, KEY, MCConfig(n_paths=50_000, antithetic=False, dtype=jnp.float64)).std_error)
        assert se_anti < se_plain

    def test_confidence_interval(self):
        b = _batch()
        res = mc_price_result(b, KEY, MCConfig(n_paths=50_000, dtype=jnp.float64))
        lo, hi = res.confidence_interval()
        assert float(lo) < 10.450583572185565 < float(hi) or float(res.std_error) < 0.1


class TestGreeks:
    def test_pathwise_greeks_match_bs(self):
        b = _batch()
        g = mc_greeks(b, KEY, MCConfig(n_paths=200_000, dtype=jnp.float64))
        exact = bs_greeks(b.spot, b.strike, b.maturity, b.rate, b.vol, b.cp, b.dividend)
        assert abs(float(g["delta"]) - float(exact["delta"])) < 0.01
        assert abs(float(g["vega"]) - float(exact["vega"])) < 0.5
        assert abs(float(g["rho"]) - float(exact["rho"])) < 0.5
        assert abs(float(g["theta"]) - float(exact["theta"])) < 0.2
        assert abs(float(g["gamma"]) - float(exact["gamma"])) < 0.002

    def test_put_greeks(self):
        b = _batch(option_type="put")
        g = mc_greeks(b, KEY, MCConfig(n_paths=200_000, dtype=jnp.float64))
        exact = bs_greeks(b.spot, b.strike, b.maturity, b.rate, b.vol, b.cp, b.dividend)
        assert abs(float(g["delta"]) - float(exact["delta"])) < 0.01
        assert abs(float(g["gamma"]) - float(exact["gamma"])) < 0.002

    def test_smoothed_gamma_close(self):
        b = _batch()
        g = mc_greeks_smoothed(b, KEY, MCConfig(n_paths=100_000, dtype=jnp.float64), width=0.5)
        exact = bs_greeks(b.spot, b.strike, b.maturity, b.rate, b.vol, b.cp, b.dividend)
        assert abs(float(g["gamma"]) - float(exact["gamma"])) < 0.004

    def test_batched_greeks_shapes(self):
        spots = jnp.asarray([90.0, 100.0, 110.0], jnp.float64)
        b = ContractBatch.make(spots, 100.0, 1.0, 0.05, 0.2, "call", dtype=jnp.float64)
        g = mc_greeks(b, KEY, MCConfig(n_paths=50_000, dtype=jnp.float64))
        for k in ("delta", "gamma", "vega"):
            assert g[k].shape == (3,)
        # deltas increase with spot for calls
        assert bool(jnp.all(jnp.diff(g["delta"]) > 0))


class TestPaths:
    def test_full_paths_shape_and_start(self):
        b = _batch()
        z = draw_normals(KEY, MCConfig(n_paths=64, n_steps=12, dtype=jnp.float64))
        paths = gbm_paths(b.broadcast(), z)
        assert paths.shape == (64, 13)
        np.testing.assert_allclose(np.asarray(paths[:, 0]), 100.0)

    def test_terminal_consistent_with_paths(self):
        b = _batch()
        z = draw_normals(KEY, MCConfig(n_paths=1000, n_steps=4, dtype=jnp.float64))
        term = gbm_terminal(b.broadcast(), z)
        paths = gbm_paths(b.broadcast(), z)
        np.testing.assert_allclose(np.asarray(term), np.asarray(paths[:, -1]), rtol=1e-10)


class TestValidationAndAPI:
    def test_bad_config_raises(self):
        with pytest.raises(ValidationError):
            mc_price_result(_batch(), KEY, MCConfig(n_paths=0))
        with pytest.raises(ValidationError):
            mc_price_result(_batch(), KEY, MCConfig(n_paths=101, antithetic=True))
        with pytest.raises(ValidationError):
            mc_price_result(_batch(), KEY, MCConfig(n_paths=100, n_steps=0))

    def test_object_pricer_protocol(self):
        pricer = MonteCarloPricer(n_paths=50_000, seed=11, dtype=jnp.float64)
        p = pricer.price(100.0, 100.0, 1.0, 0.05, 0.2, "call")
        assert abs(float(p) - 10.45) < 0.5
        d, gmm = pricer.delta_gamma(100.0, 100.0, 1.0, 0.05, 0.2, "call")
        assert 0.5 < float(d) < 0.75
        assert 0.0 < float(gmm) < 0.05
        res = pricer.price(100.0, 100.0, 1.0, 0.05, 0.2, "put", return_result=True)
        assert float(res.std_error) > 0

    def test_object_pricer_batch(self):
        pricer = MonteCarloPricer(n_paths=20_000, dtype=jnp.float64)
        p = pricer.price_batch([90.0, 100.0, 110.0], 100.0, 1.0, 0.05, 0.2, "call")
        assert p.shape == (3,)
