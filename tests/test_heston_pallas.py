"""Heston Pallas kernel: CPU-verifiable (hash sampler) numerics + Greeks.

Oracles: the scan MC engine (independent sampler), the Lewis semi-analytic
engine, and AD of the Lewis engine for delta/rho.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from optionslab_tpu.models.heston import HestonParams, heston_price
from optionslab_tpu.ops.heston_pallas import (pallas_heston_greeks,
                                              pallas_heston_price)
from optionslab_tpu.types import ContractBatch

PAR = HestonParams.make(0.04, 2.0, 0.04, 0.3, -0.7)
S, K, T, R = 100.0, 100.0, 1.0, 0.05
N_STEPS = 25


@pytest.fixture(scope="module")
def kernel_out():
    return pallas_heston_greeks(S, K, T, R, PAR, 1.0, n_paths=1,
                                n_steps=N_STEPS, seed=0, sampler="hash")


class TestKernel:
    def test_price_matches_lewis_within_discretization(self, kernel_out):
        """Euler at 25 steps has O(dt) bias ~ a few cents; the kernel price
        must sit near the semi-analytic value within bias + 5 stderr."""
        par64 = HestonParams.make(0.04, 2.0, 0.04, 0.3, -0.7, dtype=jnp.float64)
        exact = float(heston_price(
            ContractBatch.make(S, K, T, R, 0.2, "call", dtype=jnp.float64), par64))
        se = float(kernel_out["std_error"])
        assert abs(float(kernel_out["price"]) - exact) < 5 * se + 0.05

    def test_price_matches_scan_engine(self, kernel_out):
        from optionslab_tpu.models.heston import heston_mc_price

        par32 = HestonParams.make(0.04, 2.0, 0.04, 0.3, -0.7)
        scan = float(heston_mc_price(
            ContractBatch.make(S, K, T, R, 0.2, "call"), par32,
            jax.random.PRNGKey(3), n_paths=200_000, n_steps=N_STEPS))
        se = float(kernel_out["std_error"])
        assert abs(float(kernel_out["price"]) - scan) < 5 * se + 0.05

    def test_delta_rho_match_lewis_ad(self, kernel_out):
        """Pathwise delta/rho from the single extra kernel moment vs AD of
        the Lewis integral (continuous-limit truth; Euler bias ~cents)."""
        par64 = HestonParams.make(0.04, 2.0, 0.04, 0.3, -0.7, dtype=jnp.float64)

        def price_of(s, r):
            return heston_price(
                ContractBatch.make(s, K, T, r, 0.2, "call", dtype=jnp.float64),
                par64)

        dS, dr = jax.grad(lambda s, r: jnp.sum(price_of(s, r)),
                          argnums=(0, 1))(jnp.float64(S), jnp.float64(R))
        assert abs(float(kernel_out["delta"]) - float(dS)) < 0.01
        assert abs(float(kernel_out["rho"]) - float(dr)) < 0.6

    def test_put_parity_consistency(self):
        call = pallas_heston_greeks(S, K, T, R, PAR, 1.0, n_paths=1,
                                    n_steps=N_STEPS, seed=0, sampler="hash")
        put = pallas_heston_greeks(S, K, T, R, PAR, -1.0, n_paths=1,
                                   n_steps=N_STEPS, seed=0, sampler="hash")
        # same paths (same seed) ⇒ the parity residual is the Euler drift
        # bias E[S_T] − S·e^{rT} = O(dt), not MC noise (~0.02 at 25 steps)
        lhs = float(call["price"]) - float(put["price"])
        rhs = S - K * np.exp(-R * T)
        assert abs(lhs - rhs) < 0.05
        # delta parity: call − put = df·E[S_T]/S = 1 + same O(dt) bias
        assert abs((float(call["delta"]) - float(put["delta"])) - 1.0) < 5e-3

    def test_price_wrapper_consistent(self, kernel_out):
        p, se, n = pallas_heston_price(S, K, T, R, PAR, 1.0, n_paths=1,
                                       n_steps=N_STEPS, seed=0, sampler="hash")
        assert float(p) == float(kernel_out["price"])
        assert n == kernel_out["paths"]

    def test_vega_v0_matches_lewis_ad(self, kernel_out):
        """In-kernel forward sensitivity (∂x/∂v0, ∂v/∂v0 carried through the
        Euler recursion) vs AD of the Lewis integral w.r.t. v0."""
        def price_of_v0(v0):
            par = HestonParams.make(v0, 2.0, 0.04, 0.3, -0.7,
                                    dtype=jnp.float64)
            return jnp.sum(heston_price(
                ContractBatch.make(S, K, T, R, 0.2, "call",
                                   dtype=jnp.float64), par))

        dv0 = float(jax.grad(price_of_v0)(jnp.float64(0.04)))
        kv = float(kernel_out["vega_v0"])
        assert abs(kv - dv0) < 0.06 * abs(dv0) + 1.0, (kv, dv0)
        # chain rule to spot-vol vega
        np.testing.assert_allclose(float(kernel_out["vega"]),
                                   2.0 * np.sqrt(PAR.v0) * kv, rtol=1e-6)

    def test_sharded_matches_unsharded(self):
        from optionslab_tpu.parallel import make_mesh, sharded_heston_greeks

        mesh = make_mesh(4)
        out_s = sharded_heston_greeks(S, K, T, R, PAR, mesh, n_paths=1,
                                      n_steps=5, seed=0, sampler="hash")
        out_u = pallas_heston_greeks(S, K, T, R, PAR, 1.0,
                                     n_paths=out_s["paths"], n_steps=5,
                                     seed=0, sampler="hash")
        assert out_u["paths"] == out_s["paths"]
        for k in ("price", "delta", "rho", "vega_v0"):
            np.testing.assert_allclose(float(out_s[k]), float(out_u[k]),
                                       rtol=3e-5, err_msg=k)

    def test_hash_deterministic_seed_sensitive(self):
        p0, _, _ = pallas_heston_price(S, K, T, R, PAR, n_paths=1, n_steps=5,
                                       seed=3, sampler="hash")
        p1, _, _ = pallas_heston_price(S, K, T, R, PAR, n_paths=1, n_steps=5,
                                       seed=3, sampler="hash")
        p2, _, _ = pallas_heston_price(S, K, T, R, PAR, n_paths=1, n_steps=5,
                                       seed=4, sampler="hash")
        assert float(p0) == float(p1) != float(p2)
