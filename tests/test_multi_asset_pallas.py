"""Multi-asset Pallas kernel: CPU-verifiable (hash sampler) numerics.

Oracles: the geometric-basket Black formula (EXACT — a product of
lognormals is lognormal), Margrabe at K=0 (EXACT), and the XLA scan
engine in ``models/multi_asset.py`` (independent sampler, statistical
parity)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from optionslab_tpu.models.multi_asset import (basket_asian_price,
                                               basket_price,
                                               geometric_basket_closed_form,
                                               margrabe_price, rainbow_price)
from optionslab_tpu.ops.multi_asset_pallas import (pallas_multi_asset_greeks,
                                                   pallas_multi_asset_price)
from optionslab_tpu.utils.exceptions import ValidationError

SPOTS = [100.0, 95.0, 105.0]
VOLS = [0.2, 0.25, 0.3]
CORR = [[1.0, 0.5, 0.3], [0.5, 1.0, 0.4], [0.3, 0.4, 1.0]]
W = [0.4, 0.3, 0.3]
K, T, R = 100.0, 1.0, 0.05
KEY = jax.random.PRNGKey(11)
KW = dict(n_paths=1, seed=0, sampler="hash")


class TestExactOracles:
    def test_geometric_basket_matches_closed_form(self):
        p, se, n = pallas_multi_asset_price("basket_geo", SPOTS, K, T, R,
                                            VOLS, CORR, weights=W, **KW)
        exact = float(geometric_basket_closed_form(SPOTS, W, K, T, R, VOLS,
                                                   CORR))
        assert n >= 100_000
        assert abs(float(p) - exact) < 5 * float(se) + 1e-3, (float(p), exact)

    def test_spread_k0_matches_margrabe(self):
        p, se, _ = pallas_multi_asset_price(
            "spread", [100.0, 95.0], 0.0, T, R, [0.2, 0.25],
            [[1.0, 0.6], [0.6, 1.0]], **KW)
        exact = float(margrabe_price(100.0, 95.0, T, 0.2, 0.25, 0.6))
        assert abs(float(p) - exact) < 5 * float(se) + 1e-3

    def test_antithetic_consistency_two_steps(self):
        """n_steps does not bias terminal payoffs (exact increments)."""
        exact = float(geometric_basket_closed_form(SPOTS, W, K, T, R, VOLS,
                                                   CORR))
        for n_steps in (1, 4):
            p, se, _ = pallas_multi_asset_price("basket_geo", SPOTS, K, T, R,
                                                VOLS, CORR, weights=W,
                                                n_steps=n_steps, **KW)
            assert abs(float(p) - exact) < 5 * float(se) + 1e-3, n_steps


class TestScanEngineParity:
    def test_arithmetic_basket(self):
        p, se, _ = pallas_multi_asset_price("basket", SPOTS, K, T, R, VOLS,
                                            CORR, weights=W, **KW)
        ps, ses = basket_price(jnp.asarray(SPOTS), jnp.asarray(W), K, T, R,
                               jnp.asarray(VOLS), jnp.asarray(CORR), KEY,
                               n_paths=200_000, return_stderr=True)
        assert abs(float(p) - float(ps)) < 5 * np.hypot(float(se), float(ses)) + 2e-3

    @pytest.mark.parametrize("flavor", ["best_of", "worst_of"])
    def test_rainbow(self, flavor):
        kind = "rainbow_best" if flavor == "best_of" else "rainbow_worst"
        p, se, _ = pallas_multi_asset_price(kind, SPOTS, K, T, R, VOLS, CORR,
                                            **KW)
        ps, ses = rainbow_price(jnp.asarray(SPOTS), K, T, R,
                                jnp.asarray(VOLS), jnp.asarray(CORR), KEY,
                                n_paths=200_000, flavor=flavor,
                                return_stderr=True)
        assert abs(float(p) - float(ps)) < 5 * np.hypot(float(se), float(ses)) + 2e-3

    def test_basket_asian(self):
        p, se, _ = pallas_multi_asset_price("basket_asian", SPOTS, K, T, R,
                                            VOLS, CORR, weights=W, n_steps=4,
                                            **KW)
        ps, ses = basket_asian_price(jnp.asarray(SPOTS), jnp.asarray(W), K,
                                     T, R, jnp.asarray(VOLS),
                                     jnp.asarray(CORR), KEY,
                                     n_paths=100_000, n_steps=4,
                                     return_stderr=True)
        assert abs(float(p) - float(ps)) < 5 * np.hypot(float(se), float(ses)) + 2e-3


class TestLRDeltaVector:
    @pytest.mark.slow
    def test_geo_basket_delta_matches_closed_form_ad(self):
        """Exact oracle: jax.grad of the lognormal geometric-basket Black
        formula w.r.t. the spot vector."""
        from optionslab_tpu.ops.multi_asset_pallas import \
            pallas_multi_asset_greeks

        out = pallas_multi_asset_greeks("basket_geo", SPOTS, K, T, R, VOLS,
                                        CORR, weights=W, n_paths=4,
                                        sampler="hash")
        exact = jax.grad(lambda s: geometric_basket_closed_form(
            s, W, K, T, R, VOLS, CORR))(jnp.asarray(SPOTS, jnp.float32))
        np.testing.assert_allclose(np.asarray(out["delta"]),
                                   np.asarray(exact), atol=0.02)

    @pytest.mark.slow
    def test_rainbow_delta_sane(self):
        """worst_of call: every asset's delta positive; the highest-vol
        asset 105/0.3 is least often the minimum."""
        from optionslab_tpu.ops.multi_asset_pallas import \
            pallas_multi_asset_greeks

        out = pallas_multi_asset_greeks("rainbow_worst", SPOTS, 85.0, T, R,
                                        VOLS, CORR, n_paths=4,
                                        sampler="hash")
        d = np.asarray(out["delta"])
        assert (d > 0.0).all(), d
        # worst-of call at K=85: meaningfully in the money but the min of
        # three vol-0.2..0.3 assets often finishes below — total delta
        # well inside (0, 1)
        assert 0.3 < d.sum() < 1.0, d
        # pathwise AD of the scan engine as the statistical oracle
        from optionslab_tpu.models.multi_asset import (multi_asset_greeks,
                                                       rainbow_price)

        ad = multi_asset_greeks(
            lambda s, v: rainbow_price(s, 85.0, T, R, v,
                                       jnp.asarray(CORR, jnp.float32), KEY,
                                       n_paths=200_000,
                                       flavor="worst_of"),
            SPOTS, VOLS)
        np.testing.assert_allclose(d, np.asarray(ad["delta"]), atol=0.03)


class TestFullLadder:
    """Round-3: the kernel emits the FULL LR ladder (delta vector, vega
    vector, gamma matrix, theta, rho) in one pass. Oracles: AD of the
    exact geometric-basket Black formula (value, gradient, Hessian),
    Margrabe gradients (rho must vanish at K=0), and CRN finite
    differences of the price kernel itself (hash sampler => same paths).
    Tolerances are ~1.5x the measured deterministic (seed-0) errors at
    one block; LR vega/gamma noise dominates them."""

    @pytest.mark.slow
    def test_geo_basket_full_ladder_matches_closed_form_ad(self):
        from optionslab_tpu.ops.multi_asset_pallas import \
            pallas_multi_asset_greeks

        out = pallas_multi_asset_greeks("basket_geo", SPOTS, K, T, R, VOLS,
                                        CORR, weights=W, n_paths=4,
                                        sampler="hash")
        f = lambda s, v, t, r: geometric_basket_closed_form(
            s, W, K, t, r, v, CORR)
        s0 = jnp.asarray(SPOTS, jnp.float32)
        v0 = jnp.asarray(VOLS, jnp.float32)
        np.testing.assert_allclose(np.asarray(out["delta"]),
                                   np.asarray(jax.grad(f, 0)(s0, v0, T, R)),
                                   atol=0.02)
        np.testing.assert_allclose(np.asarray(out["vega"]),
                                   np.asarray(jax.grad(f, 1)(s0, v0, T, R)),
                                   atol=1.6)
        np.testing.assert_allclose(np.asarray(out["gamma"]),
                                   np.asarray(jax.hessian(f, 0)(s0, v0, T, R)),
                                   atol=1e-3)
        # gamma must come back symmetric by construction
        gm = np.asarray(out["gamma"])
        np.testing.assert_allclose(gm, gm.T, atol=0.0)
        th_exact = -float(jax.grad(f, 2)(s0, v0, jnp.float32(T), R))
        assert abs(float(out["theta"]) - th_exact) < 0.15
        rho_exact = float(jax.grad(f, 3)(s0, v0, T, jnp.float32(R)))
        assert abs(float(out["rho"]) - rho_exact) < 0.4

    @pytest.mark.slow
    def test_spread_ladder_matches_margrabe_gradients(self):
        from optionslab_tpu.ops.multi_asset_pallas import \
            pallas_multi_asset_greeks

        out = pallas_multi_asset_greeks("spread", [100.0, 95.0], 0.0, T, R,
                                        [0.2, 0.25],
                                        [[1.0, 0.6], [0.6, 1.0]], n_paths=4,
                                        sampler="hash")
        g = lambda s1, s2, v1, v2: margrabe_price(s1, s2, T, v1, v2, 0.6)
        exact_d = [float(jax.grad(g, i)(100.0, 95.0, 0.2, 0.25))
                   for i in (0, 1)]
        exact_v = [float(jax.grad(g, i)(100.0, 95.0, 0.2, 0.25))
                   for i in (2, 3)]
        np.testing.assert_allclose(np.asarray(out["delta"]), exact_d,
                                   atol=0.02)
        np.testing.assert_allclose(np.asarray(out["vega"]), exact_v, atol=2.0)
        # Margrabe is rate-independent: rho must vanish (LR noise only)
        assert abs(float(out["rho"])) < 1.0
        th_exact = -float(jax.grad(
            lambda t: margrabe_price(100.0, 95.0, t, 0.2, 0.25, 0.6))(
                jnp.float32(T)))
        assert abs(float(out["theta"]) - th_exact) < 0.2

    @pytest.mark.slow
    def test_basket_theta_rho_match_crn_fd(self):
        """CRN finite differences of the price kernel itself (same hash
        seed => identical paths; LR vs FD agree to LR noise)."""
        from optionslab_tpu.ops.multi_asset_pallas import \
            pallas_multi_asset_greeks

        h = 1e-2
        out = pallas_multi_asset_greeks("basket", SPOTS, K, T, R, VOLS, CORR,
                                        weights=W, n_paths=4, sampler="hash")
        kw = dict(weights=W, n_paths=4, sampler="hash")
        pu, _, _ = pallas_multi_asset_price("basket", SPOTS, K, T + h, R,
                                            VOLS, CORR, **kw)
        pd, _, _ = pallas_multi_asset_price("basket", SPOTS, K, T - h, R,
                                            VOLS, CORR, **kw)
        assert abs(float(out["theta"]) + (float(pu) - float(pd)) / (2 * h)) \
            < 0.15
        ru, _, _ = pallas_multi_asset_price("basket", SPOTS, K, T, R + h,
                                            VOLS, CORR, **kw)
        rd, _, _ = pallas_multi_asset_price("basket", SPOTS, K, T, R - h,
                                            VOLS, CORR, **kw)
        assert abs(float(out["rho"]) - (float(ru) - float(rd)) / (2 * h)) \
            < 0.5

    def test_basket_asian_ladder_multistep(self):
        """Path-dependent kind with n_steps>1 exercises the per-step score
        carries; oracle = CRN-FD of the kernel in sigma (bumping all vols
        equally => sum of per-asset vegas)."""
        from optionslab_tpu.ops.multi_asset_pallas import \
            pallas_multi_asset_greeks

        out = pallas_multi_asset_greeks("basket_asian", SPOTS, K, T, R, VOLS,
                                        CORR, weights=W, n_paths=4,
                                        n_steps=4, sampler="hash")
        h = 1e-3
        kw = dict(weights=W, n_paths=4, n_steps=4, sampler="hash")
        vu = [v * (1 + h) for v in VOLS]
        vd = [v * (1 - h) for v in VOLS]
        pu, _, _ = pallas_multi_asset_price("basket_asian", SPOTS, K, T, R,
                                            vu, CORR, **kw)
        pd, _, _ = pallas_multi_asset_price("basket_asian", SPOTS, K, T, R,
                                            vd, CORR, **kw)
        fd_sigma_sum = (float(pu) - float(pd)) / (2 * h)  # d/dlog-bump
        lr_sigma_sum = float(sum(v * g for v, g in
                                 zip(VOLS, np.asarray(out["vega"]))))
        # LR vega noise grows with n_steps; 4 steps at one block
        assert abs(lr_sigma_sum - fd_sigma_sum) < 0.12 * abs(fd_sigma_sum) + 1.0


class TestSharded:
    def test_sharded_matches_unsharded(self):
        from optionslab_tpu.parallel import (make_mesh,
                                             sharded_multi_asset_price)

        mesh = make_mesh(4)
        p_s, se_s, n_s = sharded_multi_asset_price(
            "basket", SPOTS, K, T, R, VOLS, CORR, mesh, weights=W,
            n_paths=1, sampler="hash")
        p_u, se_u, n_u = pallas_multi_asset_price(
            "basket", SPOTS, K, T, R, VOLS, CORR, weights=W, n_paths=n_s,
            sampler="hash", seed=0)
        assert n_u == n_s
        np.testing.assert_allclose(float(p_s), float(p_u), rtol=3e-5)

    @pytest.mark.slow
    def test_sharded_full_ladder_matches_unsharded(self):
        """The full LR ladder under shard_map: the 2+2d+d(d+1)/2+2 moment
        tiles psum over the mesh, the host combine runs once — same
        global path set => same ladder up to f32 association."""
        from optionslab_tpu.parallel import (make_mesh,
                                             sharded_multi_asset_greeks)

        mesh = make_mesh(4)
        out_s = sharded_multi_asset_greeks(
            "basket", SPOTS, K, T, R, VOLS, CORR, mesh, weights=W,
            n_paths=1, n_steps=2, sampler="hash")
        out_u = pallas_multi_asset_greeks(
            "basket", SPOTS, K, T, R, VOLS, CORR, weights=W,
            n_paths=out_s["paths"], n_steps=2, sampler="hash", seed=0)
        assert out_u["paths"] == out_s["paths"]
        for k in ("price", "theta", "rho"):
            np.testing.assert_allclose(float(out_s[k]), float(out_u[k]),
                                       rtol=5e-5, err_msg=k)
        for k in ("delta", "vega", "gamma"):
            np.testing.assert_allclose(np.asarray(out_s[k]),
                                       np.asarray(out_u[k]), rtol=5e-4,
                                       err_msg=k)


class TestValidation:
    def test_bad_kind(self):
        with pytest.raises(ValidationError):
            pallas_multi_asset_price("nope", SPOTS, K, T, R, VOLS, CORR)

    def test_spread_needs_two_assets(self):
        with pytest.raises(ValidationError):
            pallas_multi_asset_price("spread", SPOTS, K, T, R, VOLS, CORR)

    def test_too_many_assets(self):
        s5 = [100.0] * 5
        with pytest.raises(ValidationError):
            pallas_multi_asset_price("basket", s5, K, T, R, [0.2] * 5,
                                     np.eye(5))

    def test_seed_changes_estimate(self):
        a, _, _ = pallas_multi_asset_price("basket", SPOTS, K, T, R, VOLS,
                                           CORR, n_paths=1, seed=0,
                                           sampler="hash")
        b, _, _ = pallas_multi_asset_price("basket", SPOTS, K, T, R, VOLS,
                                           CORR, n_paths=1, seed=5,
                                           sampler="hash")
        assert float(a) != float(b)


class TestQMC:
    """Round-3: pure 2d-dim scrambled-Sobol terminal law (n_steps=1 —
    the exact one-step GBM increment, so the WHOLE terminal law is QMC;
    d <= 4 fits the in-kernel 8-dim direction table). Oracles: the
    geometric-basket closed form and its AD gradient."""

    def test_geo_basket_qmc_well_inside_mc_noise(self):
        exact = float(geometric_basket_closed_form(SPOTS, W, K, T, R,
                                                   VOLS, CORR))
        p_q, _se_q, _ = pallas_multi_asset_price(
            "basket_geo", SPOTS, K, T, R, VOLS, CORR, weights=W,
            n_paths=1, seed=0, sampler="sobol")
        _p_h, se_h, _ = pallas_multi_asset_price(
            "basket_geo", SPOTS, K, T, R, VOLS, CORR, weights=W,
            n_paths=1, seed=0, sampler="hash")
        err_q = abs(float(p_q) - exact)
        # QMC must land well inside one plain-MC standard error
        assert err_q < 0.5 * float(se_h), (err_q, float(se_h))

    @pytest.mark.slow
    def test_qmc_ladder_matches_closed_form_ad(self):
        out = pallas_multi_asset_greeks("basket_geo", SPOTS, K, T, R, VOLS,
                                        CORR, weights=W, n_paths=1,
                                        sampler="sobol")
        f = lambda s, v: geometric_basket_closed_form(s, W, K, T, R, v, CORR)
        s0 = jnp.asarray(SPOTS, jnp.float32)
        v0 = jnp.asarray(VOLS, jnp.float32)
        exact = float(geometric_basket_closed_form(SPOTS, W, K, T, R,
                                                   VOLS, CORR))
        # replicated-scramble QMC (8 independent nets, honest error
        # bars) trades ~2x point-set accuracy for the calibration
        assert abs(float(out["price"]) - exact) < 1.5e-2
        np.testing.assert_allclose(np.asarray(out["delta"]),
                                   np.asarray(jax.grad(f, 0)(s0, v0)),
                                   atol=0.02)
        np.testing.assert_allclose(np.asarray(out["vega"]),
                                   np.asarray(jax.grad(f, 1)(s0, v0)),
                                   atol=1.6)

    def test_sharded_qmc_matches_unsharded(self):
        from optionslab_tpu.parallel import (make_mesh,
                                             sharded_multi_asset_price)

        mesh = make_mesh(4)
        p_s, _se, n_s = sharded_multi_asset_price(
            "basket", SPOTS, K, T, R, VOLS, CORR, mesh, weights=W,
            n_paths=1, sampler="sobol")
        p_u, _se_u, n_u = pallas_multi_asset_price(
            "basket", SPOTS, K, T, R, VOLS, CORR, weights=W,
            n_paths=n_s, seed=0, sampler="sobol")
        assert n_u == n_s
        np.testing.assert_allclose(float(p_s), float(p_u), rtol=3e-5)

    def test_qmc_rejects_multistep(self):
        with pytest.raises(ValidationError):
            pallas_multi_asset_price("basket_asian", SPOTS, K, T, R, VOLS,
                                     CORR, weights=W, n_paths=1, n_steps=4,
                                     sampler="sobol")


class TestGeometricCV:
    """Round-3: geometric-basket control variate in-kernel (diff payoff
    on-chip + exact closed form host-side)."""

    def test_cv_unbiased_and_tighter(self):
        args = ("basket", SPOTS, K, T, R, VOLS, CORR)
        kw = dict(weights=W, n_paths=1, seed=0, sampler="hash")
        p_cv, se_cv, _ = pallas_multi_asset_price(*args, **kw,
                                                  control_variate=True)
        p_pl, se_pl, _ = pallas_multi_asset_price(*args, **kw)
        assert abs(float(p_cv) - float(p_pl)) < \
            4 * float(np.hypot(se_cv, se_pl))
        assert float(se_cv) < float(se_pl) / 4.0  # measured ~9x

    def test_sharded_cv_matches_unsharded(self):
        from optionslab_tpu.parallel import (make_mesh,
                                             sharded_multi_asset_price)

        mesh = make_mesh(4)
        p_s, _se, n_s = sharded_multi_asset_price(
            "basket", SPOTS, K, T, R, VOLS, CORR, mesh, weights=W,
            n_paths=1, sampler="hash", control_variate=True)
        p_u, _se_u, n_u = pallas_multi_asset_price(
            "basket", SPOTS, K, T, R, VOLS, CORR, weights=W,
            n_paths=n_s, seed=0, sampler="hash", control_variate=True)
        assert n_u == n_s
        np.testing.assert_allclose(float(p_s), float(p_u), rtol=3e-5)

    def test_cv_validation(self):
        with pytest.raises(ValidationError):
            pallas_multi_asset_price("rainbow_best", SPOTS, K, T, R, VOLS,
                                     CORR, n_paths=1, control_variate=True)
        with pytest.raises(ValidationError):
            pallas_multi_asset_greeks("basket_cv", SPOTS, K, T, R, VOLS,
                                      CORR, n_paths=1)
