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

    def test_sharded_full_ladder_matches_unsharded(self):
        """ladder=True under shard_map: all 9 moment tiles psum over the
        mesh; every calibration-gradient entry matches the single-device
        launch on the identical global path set."""
        from optionslab_tpu.parallel import make_mesh, sharded_heston_greeks

        mesh = make_mesh(4)
        out_s = sharded_heston_greeks(S, K, T, R, PAR, mesh, n_paths=1,
                                      n_steps=4, seed=0, sampler="hash",
                                      ladder=True)
        out_u = pallas_heston_greeks(S, K, T, R, PAR, 1.0,
                                     n_paths=out_s["paths"], n_steps=4,
                                     seed=0, sampler="hash", ladder=True)
        assert out_u["paths"] == out_s["paths"]
        for k in ("price", "delta", "rho", "vega_v0", "d_kappa", "d_theta",
                  "d_sigma", "d_rho", "theta"):
            np.testing.assert_allclose(float(out_s[k]), float(out_u[k]),
                                       rtol=2e-4, err_msg=k)

    def test_sharded_qe_scheme_matches_unsharded(self):
        from optionslab_tpu.parallel import make_mesh, sharded_heston_greeks
        from optionslab_tpu.utils.exceptions import ValidationError

        mesh = make_mesh(4)
        out_s = sharded_heston_greeks(S, K, T, R, PAR, mesh, n_paths=1,
                                      n_steps=4, seed=0, sampler="hash",
                                      vega=False, scheme="qe")
        p_u, se_u, n_u = pallas_heston_price(S, K, T, R, PAR,
                                             n_paths=out_s["paths"],
                                             n_steps=4, seed=0,
                                             sampler="hash", scheme="qe")
        assert n_u == out_s["paths"]
        np.testing.assert_allclose(float(out_s["price"]), float(p_u),
                                   rtol=3e-5)
        # the CRN-bump QE ladder shards too: parity with unsharded
        out_l = sharded_heston_greeks(S, K, T, R, PAR, mesh, n_paths=1,
                                      n_steps=4, seed=0, sampler="hash",
                                      scheme="qe", ladder=True)
        out_lu = pallas_heston_greeks(S, K, T, R, PAR,
                                      n_paths=out_l["paths"], n_steps=4,
                                      seed=0, sampler="hash", scheme="qe",
                                      ladder=True)
        for k in ("price", "delta"):
            np.testing.assert_allclose(float(out_l[k]), float(out_lu[k]),
                                       rtol=3e-4, err_msg=k)
        # FD entries divide an f32 moment difference by h ~ 1e-3·param,
        # amplifying psum-association noise ~1/h: tolerance scales with
        # price·eps/h, not with the entry itself
        for k in ("d_theta", "d_sigma", "theta"):
            assert abs(float(out_l[k]) - float(out_lu[k])) < 0.1, k

    @pytest.mark.slow
    def test_full_ladder_matches_lewis_ad(self):
        """Round-3: ladder=True carries forward sensitivities for EVERY
        Heston parameter + maturity. Oracle: AD of the Lewis integral in
        f64 (continuous truth; Euler bias at 64 steps ~ cents)."""
        out = pallas_heston_greeks(S, K, T, R, PAR, n_paths=2 * 131072,
                                   n_steps=64, seed=0, sampler="hash",
                                   ladder=True)

        def lewis(v0, kap, th, sig, rho, t, r):
            p = HestonParams(v0=jnp.float64(v0), kappa=jnp.float64(kap),
                             theta=jnp.float64(th), sigma=jnp.float64(sig),
                             rho=jnp.float64(rho))
            return jnp.sum(heston_price(
                ContractBatch.make(S, K, t, r, 0.2, "call",
                                   dtype=jnp.float64), p))

        args = tuple(jnp.float64(v) for v in (0.04, 2.0, 0.04, 0.3, -0.7,
                                              T, R))
        g = [float(jax.grad(lewis, i)(*args)) for i in range(7)]
        # (kernel key, lewis grad, absolute tolerance ~ LR/pathwise noise
        # at 262k paths + Euler-64 bias, from deterministic seed-0 runs)
        checks = [("vega_v0", g[0], 0.8), ("d_kappa", g[1], 0.03),
                  ("d_theta", g[2], 1.2), ("d_sigma", g[3], 0.12),
                  ("d_rho", g[4], 0.08), ("theta", -g[5], 0.15),
                  ("rho", g[6], 0.6)]
        for key, exact, atol in checks:
            assert abs(float(out[key]) - exact) < atol, \
                (key, float(out[key]), exact)

    def test_qe_kernel_unbiased_at_coarse_steps(self):
        """The QE kernel at 16 steps must sit within MC noise of the
        semi-analytic price where Euler at 16 steps is visibly biased
        (mirrors the XLA engine's qe-vs-euler bias test)."""
        par64 = HestonParams.make(0.04, 2.0, 0.04, 0.3, -0.7,
                                  dtype=jnp.float64)
        exact = float(heston_price(
            ContractBatch.make(S, K, T, R, 0.2, "call", dtype=jnp.float64),
            par64))
        pq, seq, _ = pallas_heston_price(S, K, T, R, PAR, n_paths=131072,
                                         n_steps=16, seed=0, sampler="hash",
                                         scheme="qe")
        assert abs(float(pq) - exact) < 4 * float(seq) + 0.01, \
            (float(pq), exact, float(seq))

    def test_qe_matches_xla_qe_engine(self):
        from optionslab_tpu.models.heston import heston_mc_price

        pq, seq, _ = pallas_heston_price(S, K, T, R, PAR, n_paths=131072,
                                         n_steps=16, seed=0, sampler="hash",
                                         scheme="qe")
        px = float(heston_mc_price(
            ContractBatch.make(S, K, T, R, 0.2, "call"), PAR,
            jax.random.PRNGKey(3), n_paths=200_000, n_steps=16,
            scheme="qe"))
        assert abs(float(pq) - px) < 5 * float(seq) + 0.05

    @pytest.mark.slow
    def test_chain_ladder_prices_and_grads_match_lewis(self):
        """One launch prices a multi-expiry chain AND returns each quote's
        full (v0,kappa,theta,sigma,rho) gradient; oracle = per-quote Lewis
        price + AD gradient."""
        from optionslab_tpu.ops.heston_pallas import pallas_heston_chain_ladder

        strikes = [95.0, 105.0, 100.0]
        mats = [0.5, 0.5, 1.0]
        cps = [-1.0, 1.0, 1.0]
        prices, ses, grads = pallas_heston_chain_ladder(
            strikes, mats, cps, S, R, PAR, n_paths=131072, max_dt=1.0 / 16,
            sampler="hash")

        def lewis_q(pv, k, t, cp):
            p = HestonParams(v0=pv[0], kappa=pv[1], theta=pv[2],
                             sigma=pv[3], rho=pv[4])
            return heston_price(ContractBatch.make(
                S, k, t, R, 0.2, "call" if cp > 0 else "put"), p)

        pv0 = jnp.asarray([0.04, 2.0, 0.04, 0.3, -0.7], jnp.float32)
        for q in range(3):
            ex = float(lewis_q(pv0, strikes[q], mats[q], cps[q]))
            gex = np.asarray(jax.grad(lewis_q)(pv0, strikes[q], mats[q],
                                               cps[q]))
            # price: MC noise + Euler bias at dt=1/16
            assert abs(float(prices[q]) - ex) < 5 * float(ses[q]) + 0.06, q
            gk = np.asarray(grads[q])
            # per-param: relative where the grad is large, absolute floor
            # sized to pathwise noise at 131k paths (deterministic seed 0);
            # (manual check: assert_allclose rejects array-valued atol)
            tol = np.maximum(0.12, 0.03 * np.abs(gex)) + 0.12 * np.abs(gex)
            assert np.all(np.abs(gk - gex) <= tol), (q, gk, gex, tol)

    def test_chain_ladder_no_recompile_across_ticks(self):
        """One compiled program serves every (pvec, seed, spot/rate) —
        over the TPU tunnel a recompile costs minutes, so a spot tick or
        a chain-delta bump must NOT create a new jit cache entry."""
        from optionslab_tpu.ops.heston_pallas import (
            _chain_ladder_pipeline, pallas_heston_chain_ladder)

        args = ([95.0, 105.0], [0.5, 0.5], [-1.0, 1.0])
        kw = dict(n_paths=4096, max_dt=0.25, sampler="hash")
        pallas_heston_chain_ladder(*args, S, R, PAR, seed=0, **kw)
        before = _chain_ladder_pipeline._cache_size()
        p0, _, _ = pallas_heston_chain_ladder(*args, S, R, PAR, seed=1, **kw)
        p1, _, _ = pallas_heston_chain_ladder(*args, S + 1.0, R + 0.001,
                                              PAR, seed=1, **kw)
        p2, _, _ = pallas_heston_chain_ladder(
            *args, S, R, HestonParams.make(v0=0.09), seed=1, **kw)
        assert _chain_ladder_pipeline._cache_size() == before
        # the traced operands actually flow: spot/rate and v0 move prices
        assert not np.allclose(np.asarray(p0), np.asarray(p1))
        assert not np.allclose(np.asarray(p0), np.asarray(p2))

    @pytest.mark.slow
    def test_chain_and_single_ladders_agree(self):
        """The chain kernel and the single-contract ladder kernel carry
        the SAME Euler pathwise-sensitivity recursions in two code paths
        — pin them against each other directly (statistical CRN-free
        comparison; guards the hand-synced duplication)."""
        from optionslab_tpu.ops.heston_pallas import pallas_heston_chain_ladder

        prices, ses, grads = pallas_heston_chain_ladder(
            [100.0], [1.0], [1.0], S, R, PAR, n_paths=131072,
            max_dt=1.0 / 32, sampler="hash")
        single = pallas_heston_greeks(S, 100.0, 1.0, R, PAR,
                                      n_paths=131072, n_steps=32, seed=7,
                                      sampler="hash", ladder=True)
        assert abs(float(prices[0]) - float(single["price"])) \
            < 5 * float(ses[0]) + 0.05
        pairs = [(0, "vega_v0", 1.5), (1, "d_kappa", 0.05),
                 (2, "d_theta", 2.0), (3, "d_sigma", 0.25),
                 (4, "d_rho", 0.15)]
        for idx, key, atol in pairs:
            assert abs(float(grads[0][idx]) - float(single[key])) < atol, \
                (key, float(grads[0][idx]), float(single[key]))

    @pytest.mark.slow
    def test_kernel_calibration_recovers_params(self):
        """calibrate_heston_mc: kernel-ladder gradients inside scan_adam
        recover the generating v0/kappa/theta from Lewis prices (sigma/rho
        are weakly identified at CPU-sized path counts — checked loosely).
        """
        from optionslab_tpu.models.heston import calibrate_heston_mc

        strikes = [90.0, 100.0, 110.0, 95.0, 105.0]
        mats = [0.5, 0.5, 0.5, 1.0, 1.0]
        cps = [-1.0, 1.0, 1.0, -1.0, 1.0]
        gen = HestonParams.make(0.04, 2.0, 0.05, 0.3, -0.7)
        market = [float(heston_price(ContractBatch.make(
            S, k, t, R, 0.2, "call" if c > 0 else "put"), gen))
            for k, t, c in zip(strikes, mats, cps)]
        fit, loss = calibrate_heston_mc(
            market, strikes, mats, cps, S, R,
            init=HestonParams.make(0.05, 1.5, 0.04, 0.4, -0.5),
            n_steps=50, learning_rate=0.06, n_paths=131072,
            max_dt=1.0 / 32, sampler="hash")
        assert loss < 5e-5, loss
        assert abs(float(fit.v0) - 0.04) < 0.004
        assert abs(float(fit.kappa) - 2.0) < 0.25
        assert abs(float(fit.theta) - 0.05) < 0.004
        assert abs(float(fit.rho) + 0.7) < 0.15
        assert abs(float(fit.sigma) - 0.3) < 0.1

    def test_hash_deterministic_seed_sensitive(self):
        p0, _, _ = pallas_heston_price(S, K, T, R, PAR, n_paths=1, n_steps=5,
                                       seed=3, sampler="hash")
        p1, _, _ = pallas_heston_price(S, K, T, R, PAR, n_paths=1, n_steps=5,
                                       seed=3, sampler="hash")
        p2, _, _ = pallas_heston_price(S, K, T, R, PAR, n_paths=1, n_steps=5,
                                       seed=4, sampler="hash")
        assert float(p0) == float(p1) != float(p2)


class TestBridgeQMC:
    """Round-3: hybrid bridge QMC over BOTH Heston streams (4 dyadic
    z-sum coordinates each on the variance and orthogonal-spot streams,
    hash residuals). With sigma_v ~ 0 and theta = v0, the Euler scheme is
    EXACT per step (v stays at v0), so Black-Scholes is an exact oracle
    and the QMC error is directly measurable."""

    DEGEN = HestonParams.make(0.04, 2.0, 0.04, 1e-6, -0.5)

    @pytest.mark.slow
    def test_degenerate_bs_qmc_well_inside_mc_noise(self):
        from optionslab_tpu.models.black_scholes import bs_price

        exact = float(bs_price(S, K, T, R, 0.2, 1.0, 0.0))
        p_q, _se_q, _ = pallas_heston_price(S, K, T, R, self.DEGEN,
                                            n_paths=1, n_steps=8, seed=0,
                                            sampler="sobol_bb")
        _p_h, se_h, _ = pallas_heston_price(S, K, T, R, self.DEGEN,
                                            n_paths=1, n_steps=8, seed=0,
                                            sampler="hash")
        err_q = abs(float(p_q) - exact)
        assert err_q < 0.5 * float(se_h), (err_q, float(se_h))

    def test_smile_point_qmc_matches_plain_mc(self):
        """Full smile params: sobol_bb and hash share the same Euler
        discretization, so they must agree within combined MC noise."""
        p_q, se_q, _ = pallas_heston_price(S, K, T, R, PAR, n_paths=1,
                                           n_steps=8, seed=0,
                                           sampler="sobol_bb")
        p_h, se_h, _ = pallas_heston_price(S, K, T, R, PAR, n_paths=1,
                                           n_steps=8, seed=1,
                                           sampler="hash")
        err = abs(float(p_q) - float(p_h))
        assert err < 5 * float(np.hypot(float(se_q), float(se_h)))

    def test_qmc_validation(self):
        from optionslab_tpu.utils.exceptions import ValidationError

        with pytest.raises(ValidationError):
            pallas_heston_price(S, K, T, R, PAR, n_paths=1, n_steps=8,
                                sampler="sobol_bb", scheme="qe")
        with pytest.raises(ValidationError):
            pallas_heston_greeks(S, K, T, R, PAR, n_paths=1, n_steps=8,
                                 sampler="sobol_bb", ladder=True)
        with pytest.raises(ValidationError):
            pallas_heston_price(S, K, T, R, PAR, n_paths=1, n_steps=1,
                                sampler="sobol_bb")


class TestQELadder:
    """Round-3: full parameter ladder on the QE scheme via in-kernel CRN
    forward bumps (the QE branch switch is not pathwise-differentiable).
    Near-unbiased at coarse steps, so Lewis-AD is a direct oracle."""

    @pytest.mark.slow
    def test_qe_ladder_matches_lewis_ad_at_coarse_steps(self):
        out = pallas_heston_greeks(S, K, T, R, PAR, n_paths=1, n_steps=16,
                                   seed=0, sampler="hash", scheme="qe",
                                   ladder=True)
        f = lambda v0, k, th, sg, rh, s, r, t: heston_price(
            ContractBatch.single(s, K, t, r, 1.0),
            HestonParams(v0=v0, kappa=k, theta=th, sigma=sg,
                         rho=rh)).ravel()[0]
        a = [jnp.float64(0.04), jnp.float64(2.0), jnp.float64(0.04),
             jnp.float64(0.3), jnp.float64(-0.7), jnp.float64(S),
             jnp.float64(R), jnp.float64(T)]
        lewis = {
            "vega_v0": float(jax.grad(f, 0)(*a)),
            "d_kappa": float(jax.grad(f, 1)(*a)),
            "d_theta": float(jax.grad(f, 2)(*a)),
            "d_sigma": float(jax.grad(f, 3)(*a)),
            "d_rho": float(jax.grad(f, 4)(*a)),
            "delta": float(jax.grad(f, 5)(*a)),
            "rho": float(jax.grad(f, 6)(*a)),
            "theta": -float(jax.grad(f, 7)(*a)),
        }
        # measured seed-0 errors at 131k paths are 2-5x inside these
        tols = {"vega_v0": 1.5, "d_kappa": 0.05, "d_theta": 2.0,
                "d_sigma": 0.05, "d_rho": 0.02, "delta": 0.01,
                "rho": 0.25, "theta": 0.05}
        for k, tol in tols.items():
            assert abs(float(out[k]) - lewis[k]) < tol, \
                (k, float(out[k]), lewis[k])

    def test_qe_ladder_smoke_and_validation(self):
        out = pallas_heston_greeks(S, K, T, R, PAR, n_paths=1, n_steps=4,
                                   seed=0, sampler="hash", scheme="qe",
                                   ladder=True)
        assert {"price", "delta", "rho", "vega", "d_kappa", "d_theta",
                "d_sigma", "d_rho", "theta"} <= out.keys()
        assert 0.3 < float(out["delta"]) < 0.9
        assert np.isfinite([float(out[k]) for k in
                            ("d_kappa", "d_theta", "d_sigma",
                             "d_rho", "theta")]).all()
        from optionslab_tpu.utils.exceptions import ValidationError

        with pytest.raises(ValidationError):
            pallas_heston_greeks(S, K, T, R, PAR, n_paths=1, n_steps=4,
                                 scheme="qe", ladder=False)
