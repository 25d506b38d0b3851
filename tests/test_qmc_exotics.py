"""Brownian-bridge QMC exotics: construction correctness + convergence edge."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optionslab_tpu.models.exotics import asian_price, geometric_asian_closed_form
from optionslab_tpu.models.qmc_exotics import (
    brownian_bridge_paths,
    qmc_asian_price,
    qmc_barrier_price,
    qmc_lookback_price,
)
from optionslab_tpu.utils.exceptions import ValidationError


class TestBridge:
    def test_covariance_structure(self):
        z = jax.random.normal(jax.random.PRNGKey(0), (100_000, 16))
        w = np.asarray(brownian_bridge_paths(z, 2.0))
        times = np.linspace(0, 2.0, 17)
        # Var(W_t) = t and Cov(W_s, W_t) = min(s, t)
        np.testing.assert_allclose(w.var(axis=0)[1:], times[1:], rtol=0.03)
        cov = float(np.mean(w[:, 4] * w[:, 16]))
        assert abs(cov - times[4]) < 0.02

    def test_starts_at_zero(self):
        z = jax.random.normal(jax.random.PRNGKey(1), (64, 8))
        w = np.asarray(brownian_bridge_paths(z, 1.0))
        np.testing.assert_array_equal(w[:, 0], 0.0)

    def test_non_power_of_two_steps(self):
        z = jax.random.normal(jax.random.PRNGKey(2), (50_000, 12))
        w = np.asarray(brownian_bridge_paths(z, 1.0))
        assert w.shape == (50_000, 13)
        np.testing.assert_allclose(w.var(axis=0)[-1], 1.0, rtol=0.03)


class TestQMCExotics:
    @pytest.mark.slow
    def test_geometric_asian_beats_prng_and_matches_closed_form(self):
        cf = float(geometric_asian_closed_form(100.0, 100.0, 1.0, 0.05, 0.2, 1.0, 0.0, 64))
        errs_q, errs_p = [], []
        for s in range(3):
            key = jax.random.PRNGKey(s)
            pq = float(qmc_asian_price(100.0, 100.0, 1.0, 0.05, 0.2, key, 1.0, 0.0,
                                       16_384, 64, "geometric"))
            pp = float(asian_price(100.0, 100.0, 1.0, 0.05, 0.2, key, 1.0, 0.0,
                                   16_384, 64, "geometric"))
            errs_q.append(abs(pq - cf))
            errs_p.append(abs(pp - cf))
        assert np.mean(errs_q) < 0.005  # essentially exact at 16k paths
        assert np.mean(errs_q) * 5 < np.mean(errs_p)  # QMC edge

    @pytest.mark.slow
    def test_arithmetic_asian_consistent_with_scan_engine(self):
        key = jax.random.PRNGKey(0)
        pq = float(qmc_asian_price(100.0, 100.0, 1.0, 0.05, 0.2, key, 1.0, 0.0,
                                   32_768, 64, "arithmetic"))
        ps, se = asian_price(100.0, 100.0, 1.0, 0.05, 0.2, key, 1.0, 0.0,
                             200_000, 64, "arithmetic", True)
        assert abs(pq - float(ps)) < 3 * float(se) + 0.01

    @pytest.mark.slow
    def test_lookback_and_barrier_sane(self):
        key = jax.random.PRNGKey(1)
        lb = float(qmc_lookback_price(100.0, 100.0, 1.0, 0.05, 0.2, key, 1.0,
                                      n_paths=16_384, n_steps=32))
        assert lb > 10.45  # above European
        ko = float(qmc_barrier_price(100.0, 100.0, 120.0, 1.0, 0.05, 0.2, key, 1.0,
                                     n_paths=16_384, n_steps=32))
        ki = float(qmc_barrier_price(100.0, 100.0, 120.0, 1.0, 0.05, 0.2, key, 1.0,
                                     n_paths=16_384, n_steps=32,
                                     barrier_type="up-and-in"))
        assert abs((ko + ki) - 10.4506) < 0.1  # same-path partition of European

    def test_step_cap_raises(self):
        with pytest.raises(ValidationError):
            qmc_asian_price(100.0, 100.0, 1.0, 0.05, 0.2, jax.random.PRNGKey(0),
                            n_paths=1024, n_steps=128)
