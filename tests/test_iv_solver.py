"""IV solver coverage matrix (SURVEY.md §4 item 6, reference
``tests/test_iv_solver.py:37-234``): round-trips across moneyness × type,
edge cases, vectorized NaN behavior, surface, arbitrage raising."""

import jax.numpy as jnp
import numpy as np
import pytest

from optionslab_tpu.models.black_scholes import bs_price
from optionslab_tpu.models.iv import (
    implied_vol,
    implied_volatility,
    iv_surface_from_prices,
)
from optionslab_tpu.utils.exceptions import ArbitrageViolationError

F = jnp.float64


def _roundtrip(S, K, T, r, sigma, cp, q=0.0, tol=1e-6):
    args = [jnp.asarray(x, F) for x in (S, K, T, r, sigma)]
    price = bs_price(*args, cp, jnp.asarray(q, F))
    iv = implied_vol(price, args[0], args[1], args[2], args[3], cp, jnp.asarray(q, F))
    assert abs(float(iv) - sigma) < tol, f"iv={float(iv)} truth={sigma}"


class TestRoundTrips:
    @pytest.mark.parametrize("cp", [1.0, -1.0])
    @pytest.mark.parametrize("K", [80.0, 100.0, 120.0])
    def test_moneyness_matrix(self, cp, K):
        _roundtrip(100.0, K, 1.0, 0.05, 0.25, cp)

    def test_short_maturity(self):
        _roundtrip(100.0, 100.0, 0.01, 0.05, 0.3, 1.0)

    def test_high_vol(self):
        _roundtrip(100.0, 100.0, 1.0, 0.05, 1.5, 1.0)

    def test_low_vol(self):
        _roundtrip(100.0, 100.0, 1.0, 0.05, 0.02, 1.0, tol=1e-5)

    def test_with_dividends(self):
        _roundtrip(100.0, 110.0, 0.5, 0.03, 0.4, -1.0, q=0.02)

    def test_deep_otm(self):
        _roundtrip(100.0, 200.0, 1.0, 0.05, 0.35, 1.0, tol=1e-5)


class TestVectorized:
    def test_batch_with_nan_for_invalid(self):
        prices = jnp.asarray([10.45, 200.0, 0.0], F)  # valid, above bound, below bound
        iv = np.asarray(implied_vol(prices, 100.0, 100.0, 1.0, 0.05))
        assert abs(iv[0] - 0.2) < 1e-3
        assert np.isnan(iv[1])
        assert np.isnan(iv[2])

    def test_surface(self):
        strikes = jnp.asarray([80.0, 100.0, 120.0], F)
        mats = jnp.asarray([0.25, 1.0], F)
        sig = jnp.asarray(0.3, F)
        prices = bs_price(100.0, strikes[None, :], mats[:, None], 0.05, sig, 1.0, 0.0)
        surf = iv_surface_from_prices(prices, 100.0, strikes, mats, 0.05)
        assert surf.shape == (2, 3)
        np.testing.assert_allclose(np.asarray(surf), 0.3, atol=1e-6)


class TestErrors:
    def test_below_intrinsic_raises(self):
        with pytest.raises(ArbitrageViolationError):
            implied_volatility(0.001, 100.0, 60.0, 1.0, 0.05, "call")

    def test_above_spot_raises(self):
        with pytest.raises(ArbitrageViolationError):
            implied_volatility(150.0, 100.0, 100.0, 1.0, 0.05, "call")
