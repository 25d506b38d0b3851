"""Black–Scholes golden values, parity, and AD-vs-closed-form Greeks.

Mirrors the reference test strategy (SURVEY.md §4): golden values from
``tests/test_black_scholes.py:6-14`` and put-call parity from
``tests/test_parity.py:7-26``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optionslab_tpu.models.black_scholes import (
    bs_greeks,
    bs_greeks_ad,
    bs_price,
    bs_vega,
    greeks,
    price,
)
from optionslab_tpu.types import ContractBatch

F64 = jnp.float64


def _args64(S=100.0, K=100.0, T=1.0, r=0.05, sig=0.2, q=0.0):
    return tuple(jnp.asarray(x, dtype=F64) for x in (S, K, T, r, sig, q))


class TestGoldenValues:
    def test_atm_call(self):
        S, K, T, r, sig, q = _args64()
        p = bs_price(S, K, T, r, sig, 1.0, q)
        assert abs(float(p) - 10.450583572185565) < 1e-10

    def test_atm_put(self):
        S, K, T, r, sig, q = _args64()
        p = bs_price(S, K, T, r, sig, -1.0, q)
        assert abs(float(p) - 5.573526022256971) < 1e-10

    def test_with_dividend(self):
        S, K, T, r, sig, q = _args64(q=0.03)
        c = float(bs_price(S, K, T, r, sig, 1.0, q))
        p = float(bs_price(S, K, T, r, sig, -1.0, q))
        # parity with dividends: C - P = S e^{-qT} - K e^{-rT}
        assert abs((c - p) - (100 * np.exp(-0.03) - 100 * np.exp(-0.05))) < 1e-12

    def test_expired_is_intrinsic(self):
        S, K, T, r, sig, q = _args64(S=110.0, T=0.0)
        assert float(bs_price(S, K, T, r, sig, 1.0, q)) == pytest.approx(10.0)
        S, K, T, r, sig, q = _args64(S=90.0, T=0.0)
        assert float(bs_price(S, K, T, r, sig, 1.0, q)) == pytest.approx(0.0)

    def test_zero_vol_is_discounted_forward_intrinsic(self):
        S, K, T, r, sig, q = _args64(sig=0.0)
        expect = 100.0 - 100.0 * np.exp(-0.05)
        assert float(bs_price(S, K, T, r, sig, 1.0, q)) == pytest.approx(expect, abs=1e-12)


class TestParity:
    @pytest.mark.parametrize("S", [80.0, 100.0, 125.0])
    @pytest.mark.parametrize("q", [0.0, 0.02])
    def test_put_call_parity(self, S, q):
        _, K, T, r, sig, _ = _args64()
        S = jnp.asarray(S, F64)
        q = jnp.asarray(q, F64)
        c = bs_price(S, K, T, r, sig, 1.0, q)
        p = bs_price(S, K, T, r, sig, -1.0, q)
        lhs = float(c - p)
        rhs = float(S * jnp.exp(-q * T) - K * jnp.exp(-r * T))
        assert abs(lhs - rhs) < 1e-10


class TestGreeks:
    def test_closed_form_matches_ad(self):
        S = jnp.asarray([80.0, 95.0, 100.0, 110.0, 130.0], F64)
        K, T, r, sig, q = (jnp.asarray(x, F64) for x in (100.0, 0.7, 0.04, 0.25, 0.01))
        for cp in (1.0, -1.0):
            cf = bs_greeks(S, K, T, r, sig, cp, q)
            ad = bs_greeks_ad(S, K, T, r, sig, cp, q)
            for k in ("delta", "gamma", "vega", "theta", "rho", "dual_delta"):
                np.testing.assert_allclose(cf[k], ad[k], rtol=1e-8, atol=1e-10, err_msg=k)

    def test_second_order_vs_fd(self):
        S, K, T, r, sig, q = _args64(S=105.0, sig=0.3)
        cf = bs_greeks(S, K, T, r, sig, 1.0, q)
        h = 1e-5
        # vanna = d2P/dS dsigma
        fd_vanna = (
            float(bs_price(S + h, K, T, r, sig + h, 1.0, q))
            - float(bs_price(S + h, K, T, r, sig - h, 1.0, q))
            - float(bs_price(S - h, K, T, r, sig + h, 1.0, q))
            + float(bs_price(S - h, K, T, r, sig - h, 1.0, q))
        ) / (4 * h * h)
        assert abs(float(cf["vanna"]) - fd_vanna) < 1e-4
        # vomma = d2P/dsigma^2
        fd_vomma = (
            float(bs_price(S, K, T, r, sig + h, 1.0, q))
            - 2 * float(bs_price(S, K, T, r, sig, 1.0, q))
            + float(bs_price(S, K, T, r, sig - h, 1.0, q))
        ) / (h * h)
        assert abs(float(cf["vomma"]) - fd_vomma) < 1e-3

    def test_sign_conventions(self):
        S, K, T, r, sig, q = _args64()
        g_call = bs_greeks(S, K, T, r, sig, 1.0, q)
        g_put = bs_greeks(S, K, T, r, sig, -1.0, q)
        assert 0 < float(g_call["delta"]) < 1
        assert -1 < float(g_put["delta"]) < 0
        assert float(g_call["gamma"]) > 0
        assert float(g_call["vega"]) > 0
        assert float(g_call["theta"]) < 0
        assert float(g_call["rho"]) > 0
        assert float(g_put["rho"]) < 0

    def test_vega_helper(self):
        S, K, T, r, sig, q = _args64()
        v = bs_vega(S, K, T, r, sig, q)
        ad = jax.grad(lambda s: bs_price(S, K, T, r, s, 1.0, q))(sig)
        assert abs(float(v) - float(ad)) < 1e-10


class TestBatchProtocol:
    def test_mixed_book_one_launch(self):
        batch = ContractBatch.make(
            spot=[100.0, 100.0, 90.0],
            strike=[100.0, 100.0, 100.0],
            maturity=[1.0, 1.0, 0.5],
            rate=0.05,
            vol=0.2,
            option_type=[1, -1, 1],
            dtype=F64,
        )
        p = price(batch)
        assert p.shape == (3,)
        assert abs(float(p[0]) - 10.450583572185565) < 1e-10
        assert abs(float(p[1]) - 5.573526022256971) < 1e-10
        g = greeks(batch)
        assert g["delta"].shape == (3,)

    def test_jit_and_vmap_compose(self):
        batch = ContractBatch.make(
            spot=jnp.linspace(80.0, 120.0, 16, dtype=F64),
            strike=100.0, maturity=1.0, rate=0.05, vol=0.2, dtype=F64,
        )
        p1 = jax.jit(price)(batch)
        p2 = price(batch.broadcast())
        np.testing.assert_allclose(p1, p2, rtol=1e-12)
        assert bool(jnp.all(jnp.diff(p1) > 0))  # call price increasing in S
