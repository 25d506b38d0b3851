"""Cross-model consistency fuzz: every European pricer must satisfy
put-call parity and no-arbitrage bounds over a random parameter sweep, and
the model family must agree with each other in their common limits."""

import jax.numpy as jnp
import numpy as np
import pytest

from optionslab_tpu.models import (
    HestonParams,
    binomial_price,
    bs_price,
    fdm_price,
    heston_price,
    merton_price,
    validate_pricer,
)
from optionslab_tpu.types import ContractBatch

F = jnp.float64


def _batchify(price_fn):
    def fn(S, K, T, r, sig, cp, q):
        b = ContractBatch.make(S, K, T, r, sig, 1, q, dtype=F)
        b = ContractBatch(b.spot, b.strike, b.maturity, b.rate, b.vol, b.dividend,
                          jnp.broadcast_to(jnp.asarray(cp, F), b.spot.shape))
        return price_fn(b)

    return fn


class TestParityAndBoundsSweep:
    def test_black_scholes(self):
        assert validate_pricer(lambda S, K, T, r, s, cp, q: bs_price(S, K, T, r, s, cp, q))["passed"]

    def test_binomial(self):
        rep = validate_pricer(
            _batchify(lambda b: binomial_price(b, n_steps=256, richardson=True)),
            n_points=16, atol_parity=2e-2, atol_bounds=1e-6)
        assert rep["passed"], rep

    def test_fdm(self):
        rep = validate_pricer(
            _batchify(lambda b: fdm_price(b, n_space=201, n_time=100)),
            n_points=12, atol_parity=5e-3, atol_bounds=1e-3)
        assert rep["passed"], rep

    def test_merton(self):
        rep = validate_pricer(
            _batchify(lambda b: merton_price(b, 0.5, -0.08, 0.15)),
            n_points=24, atol_parity=5e-3)
        assert rep["passed"], rep

    def test_heston(self):
        params = HestonParams.make(dtype=F)
        rep = validate_pricer(
            _batchify(lambda b: heston_price(b, params)),
            n_points=16, atol_parity=5e-3)
        assert rep["passed"], rep


class TestModelAgreementInCommonLimits:
    """All engines price the SAME contract when their extra risk factors
    vanish — the strongest cross-implementation consistency check."""

    def test_five_engines_agree_atm(self):
        b = ContractBatch.make(100.0, 100.0, 1.0, 0.05, 0.2, "call", dtype=F)
        exact = float(bs_price(100.0, 100.0, 1.0, 0.05, 0.2, 1.0, 0.0))
        candidates = {
            "binomial": float(binomial_price(b, n_steps=1000, richardson=True)),
            "fdm": float(fdm_price(b, n_space=401, n_time=400)),
            "merton(lam=0)": float(merton_price(b, 0.0, 0.0, 1e-4)),
            "heston(volvol~0)": float(heston_price(
                b, HestonParams.make(v0=0.04, kappa=2.0, theta=0.04,
                                     sigma=1e-4, rho=0.0, dtype=F))),
        }
        for name, value in candidates.items():
            assert abs(value - exact) < 5e-3, (name, value, exact)

    def test_moneyness_sweep_agreement(self):
        spots = jnp.asarray([70.0, 85.0, 100.0, 115.0, 130.0], F)
        b = ContractBatch.make(spots, 100.0, 0.5, 0.03, 0.3, "put", dtype=F)
        exact = np.asarray(bs_price(spots, 100.0, 0.5, 0.03, 0.3, -1.0, 0.0))
        tree = np.asarray(binomial_price(b, n_steps=500, richardson=True))
        pde = np.asarray(fdm_price(b, n_space=301, n_time=200))
        np.testing.assert_allclose(tree, exact, atol=3e-3)
        np.testing.assert_allclose(pde, exact, atol=2e-2)
