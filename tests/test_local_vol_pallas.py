"""Local-vol Pallas kernel: per-step polynomial sigma(x) vs the bilinear
scan engine and Black-Scholes (flat surface is exact)."""

from types import SimpleNamespace

import numpy as np
import pytest

import jax.numpy as jnp

from optionslab_tpu.models.black_scholes import bs_price
from optionslab_tpu.models.local_vol import (DupireLocalVol, LocalVolSurface,
                                             local_vol_mc_price,
                                             sample_smile_iv_fn)
from optionslab_tpu.ops.local_vol_pallas import pallas_local_vol_price
from optionslab_tpu.utils.exceptions import ValidationError

S, R = 100.0, 0.05
KW = dict(n_paths=1, n_steps=8, sampler="hash", seed=0)


def _flat_dupire(vol=0.2):
    kg = np.linspace(-1.0, 1.0, 21)
    tg = np.linspace(0.01, 2.0, 9)
    grid = np.full((9, 21), vol)
    surf = LocalVolSurface(kg, tg, grid, S, R)
    return SimpleNamespace(surface=surf, spot=S, rate=R, dividend=0.0)


@pytest.fixture(scope="module")
def smile_dupire():
    return DupireLocalVol(sample_smile_iv_fn(), S, R)


class TestFlatSurfaceIsBS:
    def test_european_matches_bs(self):
        p, se, n, resid = pallas_local_vol_price(_flat_dupire(), 100.0, 1.0,
                                                 **KW)
        assert resid < 1e-6  # constant sigma fits exactly
        exact = float(bs_price(S, 100.0, 1.0, R, 0.2, 1.0, 0.0))
        assert abs(float(p) - exact) < 5 * float(se) + 1e-3
        assert n >= 100_000

    def test_put_and_moneyness(self):
        p, se, _, _ = pallas_local_vol_price(_flat_dupire(), 110.0, 0.5,
                                             cp=-1.0, **KW)
        exact = float(bs_price(S, 110.0, 0.5, R, 0.2, -1.0, 0.0))
        assert abs(float(p) - exact) < 5 * float(se) + 1e-3


class TestSmileSurfaceParity:
    def test_european_matches_scan_engine(self, smile_dupire):
        p, se, _, resid = pallas_local_vol_price(smile_dupire, 100.0, 1.0,
                                                 **KW)
        assert resid < 5e-3  # smooth surface: degree-6 fit is tight
        ps, ses = local_vol_mc_price(smile_dupire, 100.0, 1.0,
                                     n_paths=100_000, n_steps=8, seed=3)
        assert abs(float(p) - float(ps)) < 5 * np.hypot(float(se), float(ses)) + 5e-3

    def test_asian_matches_scan_engine(self, smile_dupire):
        p, se, _, _ = pallas_local_vol_price(smile_dupire, 100.0, 1.0,
                                             payoff="asian", **KW)
        ps, ses = local_vol_mc_price(smile_dupire, 100.0, 1.0,
                                     payoff="asian", n_paths=100_000,
                                     n_steps=8, seed=3)
        assert abs(float(p) - float(ps)) < 5 * np.hypot(float(se), float(ses)) + 5e-3

    def test_skew_direction(self, smile_dupire):
        """Negative skew: OTM puts richer than flat-ATM-vol BS."""
        atm_vol = float(smile_dupire.surface(jnp.float32(S), jnp.float32(0.5)))
        p_put, se, _, _ = pallas_local_vol_price(smile_dupire, 80.0, 1.0,
                                                 cp=-1.0, **KW)
        flat = float(bs_price(S, 80.0, 1.0, R, atm_vol, -1.0, 0.0))
        assert float(p_put) > flat - 5 * float(se)


class TestBarrierUnderLV:
    def test_in_out_parity_is_exact_per_path(self):
        """up-in + up-out = european — an identity on the SAME paths."""
        from optionslab_tpu.ops.local_vol_pallas import LocalVolKernelPricer

        pr = LocalVolKernelPricer(_flat_dupire(), 1.0, n_steps=8)
        kw = dict(barrier=115.0, n_paths=1, seed=0, sampler="hash")
        pin, _, _ = pr.price(100.0, payoff="barrier_up-and-in", **kw)
        pout, _, _ = pr.price(100.0, payoff="barrier_up-and-out", **kw)
        peur, _, _ = pr.price(100.0, n_paths=1, seed=0, sampler="hash")
        np.testing.assert_allclose(float(pin) + float(pout), float(peur),
                                   rtol=1e-5)

    def test_flat_surface_matches_gbm_barrier_kernel(self):
        """Flat local vol IS GBM: the exotic (GBM) barrier kernel is the
        oracle at the same discrete monitoring."""
        from optionslab_tpu.ops.exotic_pallas import pallas_exotic_price
        from optionslab_tpu.ops.local_vol_pallas import LocalVolKernelPricer

        pr = LocalVolKernelPricer(_flat_dupire(), 1.0, n_steps=8)
        p, se, _ = pr.price(100.0, payoff="barrier_down-and-out",
                            barrier=85.0, n_paths=1, sampler="hash")
        pg, seg, _ = pallas_exotic_price("barrier_down-and-out", S, 100.0,
                                         1.0, R, 0.2, barrier=85.0,
                                         n_paths=1, n_steps=8,
                                         sampler="hash")
        assert abs(float(p) - float(pg)) < 5 * np.hypot(float(se), float(seg)) + 1e-3

    def test_smile_barrier_differs_from_flat(self, smile_dupire):
        """The knock-out price must SEE the smile (differ from flat-vol),
        while staying below the european (optionality removed)."""
        from optionslab_tpu.ops.local_vol_pallas import LocalVolKernelPricer

        pr = LocalVolKernelPricer(smile_dupire, 1.0, n_steps=8)
        po, _, _ = pr.price(100.0, payoff="barrier_up-and-out",
                            barrier=120.0, n_paths=1, sampler="hash")
        pe, _, _ = pr.price(100.0, n_paths=1, sampler="hash")
        assert 0.0 < float(po) < float(pe)

    def test_bad_barrier_level(self):
        from optionslab_tpu.ops.local_vol_pallas import LocalVolKernelPricer

        pr = LocalVolKernelPricer(_flat_dupire(), 1.0, n_steps=4)
        with pytest.raises(ValidationError):
            pr.price(100.0, payoff="barrier_up-and-out", barrier=0.0)


class TestLookbackUnderLV:
    def test_flat_surface_matches_gbm_lookback_kernel(self):
        """Flat local vol IS GBM: the exotic kernel is the oracle at the
        same discrete monitoring count."""
        from optionslab_tpu.ops.exotic_pallas import pallas_exotic_price
        from optionslab_tpu.ops.local_vol_pallas import LocalVolKernelPricer

        pr = LocalVolKernelPricer(_flat_dupire(), 1.0, n_steps=8)
        for payoff, cp in (("lookback_float", 1.0), ("lookback_float", -1.0),
                           ("lookback_fixed", 1.0)):
            p, se, _ = pr.price(100.0, cp=cp, payoff=payoff, n_paths=1,
                                sampler="hash")
            pg, seg, _ = pallas_exotic_price(payoff, S, 100.0, 1.0, R, 0.2,
                                             cp=cp, n_paths=1, n_steps=8,
                                             sampler="hash")
            err = abs(float(p) - float(pg))
            assert err < 5 * np.hypot(float(se), float(seg)) + 2e-3, \
                (payoff, cp, float(p), float(pg))

    def test_smile_lookback_sees_the_smile(self, smile_dupire):
        """Under the skewed surface the lookback-put extremum (max) rides
        the low-vol wing: price differs from flat-ATM-vol GBM."""
        from optionslab_tpu.ops.local_vol_pallas import LocalVolKernelPricer

        pr = LocalVolKernelPricer(smile_dupire, 1.0, n_steps=8)
        p, _, _ = pr.price(100.0, payoff="lookback_fixed", n_paths=1,
                           sampler="hash")
        assert float(p) > 0.0


class TestLVGreeks:
    """Round-3: LR delta/gamma (frozen-smile / sticky-moneyness) + parallel
    surface-shift vega from the same kernel pass. Oracles: BS closed form
    on the flat surface (flat LV == BS and the frozen-smile convention
    coincides with the BS delta), CRN finite differences of the SAME
    pricer with the table frozen (realizing exactly the documented
    conventions) on the smile surface."""

    def test_flat_surface_greeks_match_bs(self):
        import jax

        from optionslab_tpu.models.black_scholes import bs_price as bsp
        from optionslab_tpu.ops.local_vol_pallas import LocalVolKernelPricer

        pr = LocalVolKernelPricer(_flat_dupire(), 1.0, n_steps=8)
        out = pr.greeks(100.0, n_paths=1, sampler="hash")
        f = lambda s, v: bsp(s, 100.0, 1.0, R, v, 1.0, 0.0)
        d = float(jax.grad(f, 0)(jnp.float32(S), jnp.float32(0.2)))
        g = float(jax.grad(jax.grad(f, 0), 0)(jnp.float32(S),
                                              jnp.float32(0.2)))
        v = float(jax.grad(f, 1)(jnp.float32(S), jnp.float32(0.2)))
        assert abs(out["delta"] - d) < 0.02, (out["delta"], d)
        assert abs(out["gamma"] - g) < 0.004, (out["gamma"], g)
        assert abs(out["vega"] - v) < 2.5, (out["vega"], v)

    @pytest.mark.parametrize("payoff", ["asian", "barrier_up-and-out",
                                        "lookback_fixed"])
    def test_smile_delta_matches_sticky_strike_fd(self, smile_dupire,
                                                  payoff):
        """Sticky-strike FD: re-fit the σ(x) table from the SAME physical
        surface at the bumped spot (Dupire dynamics — the surface stays
        fixed in S). CRN via the hash sampler."""
        from optionslab_tpu.ops.local_vol_pallas import LocalVolKernelPricer

        pr = LocalVolKernelPricer(smile_dupire, 1.0, n_steps=8)
        kw = dict(barrier=120.0) if payoff.startswith("barrier") else {}
        # lookback_fixed exactly ATM sits on the boundary-term subgradient
        # (extremum-at-t0 paths with S0 == K) — test it strictly ITM where
        # the derivative is classical
        strike = 95.0 if payoff == "lookback_fixed" else 100.0
        out = pr.greeks(strike, payoff=payoff, n_paths=1, sampler="hash",
                        **kw)
        h = 0.5
        mk = lambda s: LocalVolKernelPricer(
            SimpleNamespace(surface=smile_dupire.surface, spot=s,
                            rate=smile_dupire.rate,
                            dividend=smile_dupire.dividend), 1.0, n_steps=8)
        pu, _, _ = mk(S + h).price(strike, payoff=payoff, n_paths=1,
                                   sampler="hash", **kw)
        pd, _, _ = mk(S - h).price(strike, payoff=payoff, n_paths=1,
                                   sampler="hash", **kw)
        fd = (float(pu) - float(pd)) / (2 * h)
        assert abs(out["delta"] - fd) < 0.03, (payoff, out["delta"], fd)

    def test_smile_vega_matches_table_shift_fd(self, smile_dupire):
        import copy

        from optionslab_tpu.ops.local_vol_pallas import LocalVolKernelPricer

        pr = LocalVolKernelPricer(smile_dupire, 1.0, n_steps=8)
        out = pr.greeks(100.0, payoff="asian", n_paths=1, sampler="hash")
        eps = 2e-3
        up, dn = copy.deepcopy(pr), copy.deepcopy(pr)
        up.rows = pr.rows.copy()
        dn.rows = pr.rows.copy()
        up.rows[:, -1] += eps  # c0 of every step: sigma(x,t) + eps
        dn.rows[:, -1] -= eps
        pu, _, _ = up.price(100.0, payoff="asian", n_paths=1, sampler="hash")
        pd, _, _ = dn.price(100.0, payoff="asian", n_paths=1, sampler="hash")
        fd = (float(pu) - float(pd)) / (2 * eps)
        assert abs(out["vega"] - fd) < 0.08 * abs(fd) + 1.5, \
            (out["vega"], fd)


class TestValidation:
    def test_bad_payoff(self):
        with pytest.raises(ValidationError):
            pallas_local_vol_price(_flat_dupire(), 100.0, 1.0,
                                   payoff="lookback")

    def test_pricer_class_fits_once_prices_many(self):
        from optionslab_tpu.ops.local_vol_pallas import LocalVolKernelPricer

        pr = LocalVolKernelPricer(_flat_dupire(), 1.0, n_steps=8)
        assert pr.fit_residual < 1e-6
        for k in (90.0, 100.0, 110.0):
            p, se, _ = pr.price(k, n_paths=1, sampler="hash")
            exact = float(bs_price(S, k, 1.0, R, 0.2, 1.0, 0.0))
            assert abs(float(p) - exact) < 5 * float(se) + 1e-3


class TestSharded:
    @pytest.mark.slow
    def test_sharded_price_and_greeks_match_unsharded(self):
        """LV kernel under shard_map: global-block ownership — the sharded
        estimate equals the single-device one on the identical path set
        (up to f32 association), price AND the LR ladder."""
        from optionslab_tpu.ops.local_vol_pallas import LocalVolKernelPricer
        from optionslab_tpu.parallel import (make_mesh,
                                             sharded_local_vol_greeks,
                                             sharded_local_vol_price)

        pr = LocalVolKernelPricer(_flat_dupire(), 1.0, n_steps=4)
        mesh = make_mesh(4)
        p_s, se_s, n_s = sharded_local_vol_price(pr, 100.0, mesh, n_paths=1,
                                                 sampler="hash")
        p_u, se_u, n_u = pr.price(100.0, n_paths=n_s, sampler="hash")
        assert n_u == n_s
        np.testing.assert_allclose(float(p_s), float(p_u), rtol=3e-5)
        out_s = sharded_local_vol_greeks(pr, 100.0, mesh, n_paths=1,
                                         sampler="hash")
        out_u = pr.greeks(100.0, n_paths=out_s["paths"], sampler="hash")
        assert out_u["paths"] == out_s["paths"]
        for k in ("price", "delta", "gamma", "vega"):
            np.testing.assert_allclose(float(out_s[k]), float(out_u[k]),
                                       rtol=5e-4, err_msg=k)

    @pytest.mark.slow
    def test_sharded_lookback_boundary_terms(self):
        from optionslab_tpu.ops.local_vol_pallas import LocalVolKernelPricer
        from optionslab_tpu.parallel import (make_mesh,
                                             sharded_local_vol_greeks)

        pr = LocalVolKernelPricer(_flat_dupire(), 1.0, n_steps=4)
        mesh = make_mesh(2)
        out_s = sharded_local_vol_greeks(pr, 0.0, mesh, n_paths=1,
                                         payoff="lookback_float",
                                         sampler="hash")
        out_u = pr.greeks(0.0, n_paths=out_s["paths"],
                          payoff="lookback_float", sampler="hash")
        for k in ("price", "delta", "gamma", "vega"):
            np.testing.assert_allclose(float(out_s[k]), float(out_u[k]),
                                       rtol=5e-4, err_msg=k)


class TestBridgeQMC:
    """Round-3: the hybrid 8-level bridge QMC sampler applied under
    state-dependent sigma(x, t). The bridge reparameterizes the iid
    normals (model-independent), so the step sequence stays exact iid
    N(0,1) — parity with plain MC is the correctness check; the error
    reduction is the quality check (flat surface, where the pinned
    z-sums dominate the payoff)."""

    @pytest.mark.slow
    def test_flat_european_qmc_tighter_than_plain_mc(self):
        from optionslab_tpu.ops.local_vol_pallas import LocalVolKernelPricer

        pr = LocalVolKernelPricer(_flat_dupire(), 1.0, n_steps=8)
        exact = float(bs_price(S, 100.0, 1.0, R, 0.2, 1.0, 0.0))
        p_q, se, _ = pr.price(100.0, n_paths=1, sampler="sobol_bb")
        # QMC error must land well inside the plain-MC noise scale
        assert abs(float(p_q) - exact) < 1.5 * float(se) + 1e-3, \
            (float(p_q), exact, float(se))

    @pytest.mark.slow
    def test_smile_asian_qmc_matches_plain_mc(self, smile_dupire):
        from optionslab_tpu.ops.local_vol_pallas import LocalVolKernelPricer

        pr = LocalVolKernelPricer(smile_dupire, 1.0, n_steps=8)
        p_q, se_q, _ = pr.price(100.0, payoff="asian", n_paths=1,
                                sampler="sobol_bb")
        p_h, se_h, _ = pr.price(100.0, payoff="asian", n_paths=1,
                                sampler="hash")
        err = abs(float(p_q) - float(p_h))
        assert err < 5 * np.hypot(float(se_q), float(se_h)) + 2e-3

    def test_qmc_rejects_greeks_and_single_step(self):
        from optionslab_tpu.ops.local_vol_pallas import LocalVolKernelPricer

        pr = LocalVolKernelPricer(_flat_dupire(), 1.0, n_steps=8)
        with pytest.raises(ValidationError):
            pr.greeks(100.0, n_paths=1, sampler="sobol_bb")
        pr1 = LocalVolKernelPricer(_flat_dupire(), 1.0, n_steps=1)
        with pytest.raises(ValidationError):
            pr1.price(100.0, n_paths=1, sampler="sobol_bb")


class TestTouchAndDoubleUnderLV:
    """Digital touches and two-sided bands under the calibrated smile —
    beyond-reference (the reference's LV prices vanillas only) and new
    payoff kinds for this kernel family.  Oracles: exact complement
    identities on shared paths, the flat-surface collapse onto the GBM
    exotic kernel / scan engine, CRN-FD delta."""

    L, U = 80.0, 130.0

    def _pricer(self, dup=None, n_steps=16):
        from optionslab_tpu.ops.local_vol_pallas import LocalVolKernelPricer
        return LocalVolKernelPricer(dup or _flat_dupire(), 1.0, n_steps)

    def test_touch_complements_exact(self):
        import math
        pr = self._pricer()
        kw = dict(n_paths=1, seed=3, sampler="hash")
        one, _, _ = pr.price(100.0, 1.0, "one_touch_up", barrier=130.0, **kw)
        no, _, _ = pr.price(100.0, 1.0, "no_touch_up", barrier=130.0, **kw)
        np.testing.assert_allclose(float(one + no), math.exp(-R), atol=1e-6)
        od, _, _ = pr.price(100.0, 1.0, "one_touch_double", lower=self.L,
                            upper=self.U, **kw)
        nd, _, _ = pr.price(100.0, 1.0, "no_touch_double", lower=self.L,
                            upper=self.U, **kw)
        np.testing.assert_allclose(float(od + nd), math.exp(-R), atol=1e-6)

    def test_flat_touch_matches_gbm_kernel(self):
        import math

        from optionslab_tpu.ops.exotic_pallas import pallas_exotic_price
        pr = self._pricer()
        p, se, _ = pr.price(100.0, 1.0, "one_touch_down", barrier=85.0,
                            n_paths=1, seed=3, sampler="hash")
        g, seg, _ = pallas_exotic_price("one_touch_down", S, 100.0, 1.0, R,
                                        0.2, 1.0, 0.0, barrier=85.0,
                                        n_paths=262_144, n_steps=16,
                                        seed=7, sampler="hash")
        assert abs(float(p - g)) < 4 * math.hypot(float(se), float(seg)) + 1e-3

    def test_flat_double_matches_gbm_scan(self):
        import math

        import jax

        from optionslab_tpu.models.exotics import double_barrier_price
        pr = self._pricer()
        p, se, _ = pr.price(100.0, 1.0, "barrier_double-out", lower=self.L,
                            upper=self.U, n_paths=1, seed=3, sampler="hash")
        mc, sem = double_barrier_price(S, 100.0, self.L, self.U, 1.0, R,
                                       0.2, jax.random.PRNGKey(1), 1.0, 0.0,
                                       n_paths=262_144, n_steps=16,
                                       knock="out", return_stderr=True)
        assert abs(float(p - mc)) < 4 * math.hypot(float(se), float(sem)) + 1e-3
        # in + out == vanilla on shared kernel paths
        pin, _, _ = pr.price(100.0, 1.0, "barrier_double-in", lower=self.L,
                             upper=self.U, n_paths=1, seed=3, sampler="hash")
        van, _, _ = pr.price(100.0, 1.0, "european", n_paths=1, seed=3,
                             sampler="hash")
        np.testing.assert_allclose(float(p + pin), float(van), rtol=1e-5)

    def test_double_delta_vs_crn_fd(self):
        pr = self._pricer()
        kw = dict(n_paths=1, seed=3, sampler="hash")
        g = pr.greeks(100.0, 1.0, "barrier_double-out", lower=self.L,
                      upper=self.U, **kw)
        h = 0.5
        ups, dns = [], []
        for s_b in (S + h, S - h):
            kg = np.linspace(-1.0, 1.0, 21)
            tg = np.linspace(0.01, 2.0, 9)
            surf = LocalVolSurface(kg, tg, np.full((9, 21), 0.2), s_b, R)
            dup = SimpleNamespace(surface=surf, spot=s_b, rate=R,
                                  dividend=0.0)
            p_b, _, _ = self._pricer(dup).price(
                100.0, 1.0, "barrier_double-out", lower=self.L,
                upper=self.U, **kw)
            (ups if s_b > S else dns).append(float(p_b))
        fd = (ups[0] - dns[0]) / (2 * h)
        assert abs(g["delta"] - fd) < 0.02

    def test_validation(self):
        pr = self._pricer()
        with pytest.raises(ValidationError):
            pr.price(100.0, 1.0, "barrier_double-out", lower=self.U,
                     upper=self.L)
        with pytest.raises(ValidationError):
            pr.price(100.0, 1.0, "one_touch_up", barrier=0.0)


class TestRangeAccrualUnderLV:
    """Corridor note at LV-kernel speed. Flat surface is an EXACT oracle
    (strip of GBM corridor digitals); the smile case cross-checks the
    independent SLV particle engine at mixing -> 0. The LV pricer quotes
    UNIT notional (CLI/consumers scale)."""

    def test_flat_surface_matches_closed_form(self):
        from optionslab_tpu.models.exotics import range_accrual_closed_form
        from optionslab_tpu.ops.local_vol_pallas import LocalVolKernelPricer

        pr = LocalVolKernelPricer(_flat_dupire(), 1.0, n_steps=8)
        p, se, _ = pr.price(0.0, payoff="range_accrual", lower=90.0,
                            upper=112.0, n_paths=1, sampler="hash")
        cf = float(range_accrual_closed_form(S, 90.0, 112.0, 1.0, R, 0.2,
                                             notional=1.0, n_steps=8))
        assert abs(float(p) - cf) < 5 * float(se) + 2e-3, (float(p), cf)

    def test_smile_matches_slv_mixing_zero(self, smile_dupire):
        import jax

        from optionslab_tpu.models.heston import HestonParams
        from optionslab_tpu.models.slv import slv_range_accrual_price
        from optionslab_tpu.ops.local_vol_pallas import LocalVolKernelPricer

        pr = LocalVolKernelPricer(smile_dupire, 1.0, n_steps=16)
        p, se, _ = pr.price(0.0, payoff="range_accrual", lower=90.0,
                            upper=112.0, n_paths=1, sampler="hash")
        par = HestonParams.make(0.04, 2.0, 0.04, 0.5, -0.7)
        ps, ss = slv_range_accrual_price(
            S, 90.0, 112.0, 1.0, R, par, jax.random.PRNGKey(1),
            smile_dupire.surface.k_grid, smile_dupire.surface.t_grid,
            smile_dupire.surface.grid, mixing=0.0, n_paths=65_536,
            n_steps=16, return_stderr=True)
        # LV poly-kernel vs particle-binned SLV at mixing=0: same Dupire
        # dynamics through two independent discretizations
        diff = abs(100.0 * float(p) - float(ps))
        assert diff < 5 * float(np.hypot(100.0 * float(se), float(ss))) \
            + 0.6, (100.0 * float(p), float(ps))

    def test_lr_ladder_is_finite_and_signed(self, smile_dupire):
        from optionslab_tpu.ops.local_vol_pallas import LocalVolKernelPricer

        pr = LocalVolKernelPricer(smile_dupire, 1.0, n_steps=8)
        g = pr.greeks(0.0, payoff="range_accrual", lower=90.0, upper=112.0,
                      n_paths=200_000, sampler="hash")
        for k in ("delta", "gamma", "vega"):
            assert np.isfinite(g[k]), g
        # more vol pushes paths OUT of a corridor around spot
        assert g["vega"] < 0.0, g

    def test_band_validation(self):
        from optionslab_tpu.ops.local_vol_pallas import LocalVolKernelPricer

        pr = LocalVolKernelPricer(_flat_dupire(), 1.0, n_steps=8)
        with pytest.raises(ValidationError):
            pr.price(0.0, payoff="range_accrual", lower=110.0, upper=90.0)
