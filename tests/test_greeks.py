"""Unified Greeks engine: AD vs closed form vs FD oracle across pricers."""

import jax.numpy as jnp
import numpy as np
import pytest

from optionslab_tpu.greeks import (
    bs_price_fn,
    compute_greeks_unified,
    fdm_price_fn,
    greeks_fd,
    greeks_from_fn,
    greeks_heston,
    heston_price_fn,
    merton_price_fn,
)
from optionslab_tpu.models.black_scholes import BlackScholesPricer, bs_greeks
from optionslab_tpu.models.heston import HestonParams

F = jnp.float64
ARGS = tuple(jnp.asarray(v, F) for v in (100.0, 100.0, 1.0, 0.05, 0.2, 0.0))


class TestADEngine:
    def test_bs_all_orders_match_closed_form(self):
        g = greeks_from_fn(bs_price_fn(1.0), *ARGS, second_order=True)
        ex = bs_greeks(*ARGS[:5], 1.0, ARGS[5])
        for k in ("price", "delta", "gamma", "vega", "theta", "rho", "vanna", "vomma", "charm"):
            np.testing.assert_allclose(float(g[k]), float(ex[k]), rtol=1e-6, err_msg=k)

    @pytest.mark.slow
    def test_batched_second_order_diagonal(self):
        S = jnp.asarray([90.0, 100.0, 110.0], F)
        g = greeks_from_fn(bs_price_fn(1.0), S, *ARGS[1:], second_order=True)
        ex = bs_greeks(S, *ARGS[1:5], 1.0, ARGS[5])
        np.testing.assert_allclose(np.asarray(g["gamma"]), np.asarray(ex["gamma"]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g["vanna"]), np.asarray(ex["vanna"]), rtol=1e-6)

    def test_ad_matches_fd_oracle(self):
        ad = greeks_from_fn(bs_price_fn(-1.0), *ARGS, second_order=True)
        fd = greeks_fd(bs_price_fn(-1.0), *ARGS)
        for k in ("delta", "gamma", "vega", "rho", "theta"):
            assert abs(float(ad[k]) - float(fd[k])) < 5e-3 * max(1.0, abs(float(fd[k]))), k


class TestModelAdapters:
    def test_heston_greeks_sane(self):
        params = HestonParams.make(dtype=F)
        g = greeks_heston(params, *ARGS[:5], "call")
        assert 0.4 < float(g["delta"]) < 0.9
        assert float(g["vega"]) > 0
        assert float(g["theta"]) < 0

    def test_heston_ad_matches_fd(self):
        params = HestonParams.make(dtype=F)
        fn = heston_price_fn(params, 1.0)
        ad = greeks_from_fn(fn, *ARGS, second_order=False)
        fd = greeks_fd(fn, *ARGS)
        assert abs(float(ad["delta"]) - float(fd["delta"])) < 1e-3
        assert abs(float(ad["vega"]) - float(fd["vega"])) < 0.5

    def test_fdm_greeks_match_bs(self):
        fn = fdm_price_fn(1.0, n_space=201, n_time=100)
        g = greeks_from_fn(fn, *ARGS, second_order=False)
        ex = bs_greeks(*ARGS[:5], 1.0, ARGS[5])
        assert abs(float(g["delta"]) - float(ex["delta"])) < 5e-3
        assert abs(float(g["vega"]) - float(ex["vega"])) < 0.5

    @pytest.mark.slow
    def test_merton_greeks(self):
        fn = merton_price_fn(0.5, -0.1, 0.15, 1.0)
        g = greeks_from_fn(fn, *ARGS, second_order=True)
        assert 0.3 < float(g["delta"]) < 1.0
        assert float(g["gamma"]) > 0


class TestObjectProtocol:
    def test_object_pricer_via_unified(self):
        g = compute_greeks_unified(BlackScholesPricer(), 100.0, 100.0, 1.0, 0.05, 0.2, "call")
        ex = bs_greeks(*ARGS[:5], 1.0, ARGS[5])
        assert abs(float(g["delta"]) - float(ex["delta"])) < 1e-5

    def test_put_option_type_string(self):
        g = compute_greeks_unified(BlackScholesPricer(), 100.0, 100.0, 1.0, 0.05, 0.2, "put")
        assert float(g["delta"]) < 0

    def test_callable_price_fn(self):
        g = compute_greeks_unified(bs_price_fn(1.0), *ARGS[:5], "call", ARGS[5])
        assert abs(float(g["delta"]) - 0.6368306511756191) < 1e-6
