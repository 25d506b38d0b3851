"""SLV fused kernel: scan-replay parity, BS limits, CRN-FD ladder oracles.

The kernel replays the SAME particle-calibrated leverage rows as the
scan engine (``models/slv.slv_replay_price``) through its polynomial
table, so parity is tight (poly-fit bias + independent samplers only).
Greek conventions are validated by CRN finite differences of the kernel
itself realizing exactly the documented convention: sticky-strike delta
(table re-anchored from the same physical leverage at the bumped spot),
frozen-leverage v0-vega and rho (head-scalar bumps, rows untouched).
"""

import copy
import math
from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from optionslab_tpu.models.black_scholes import bs_price
from optionslab_tpu.models.heston import HestonParams
from optionslab_tpu.models.local_vol import (DupireLocalVol,
                                             LocalVolSurface,
                                             sample_smile_iv_fn)
from optionslab_tpu.models.slv import slv_calibrate_leverage, slv_replay_price
from optionslab_tpu.ops.slv_pallas import (_S_MUDT, _S_RDT, _S_V0, KINDS,
                                           SLVKernelPricer,
                                           fit_leverage_polys,
                                           pallas_slv_exotic_price)
from optionslab_tpu.utils.exceptions import ValidationError

S, R, T = 100.0, 0.03, 1.0
PAR = HestonParams.make(0.04, 2.0, 0.04, 0.5, -0.7)
N_STEPS = 8


@pytest.fixture(scope="module")
def smile_dupire():
    return DupireLocalVol(sample_smile_iv_fn(), S, R)


@pytest.fixture(scope="module")
def pricer(smile_dupire):
    return SLVKernelPricer(smile_dupire, PAR, T, mixing=1.0,
                           n_steps=N_STEPS, n_cal_paths=65_536)


def _flat_dupire(vol=0.2):
    flat = LocalVolSurface(jnp.linspace(-3.0, 3.0, 11),
                           jnp.linspace(0.01, 2.0, 9),
                           jnp.full((9, 11), vol), S, R)
    return SimpleNamespace(surface=flat, spot=S, rate=R, dividend=0.0)


def _barrier_for(kind):
    if "up" in kind:
        return 125.0
    if "down" in kind:
        return 80.0
    return 0.0


class TestScanParity:
    @pytest.mark.parametrize("kind", [
        "european", "asian_arith", "asian_geo", "lookback_float",
        "lookback_fixed", "barrier_up-and-out", "barrier_down-and-in",
        "one_touch_down", "no_touch_up"])
    def test_kind_matches_scan_replay(self, smile_dupire, pricer, kind):
        b = _barrier_for(kind)
        pk, sk, _ = pricer.price(kind, 100.0, barrier=b, n_paths=1,
                                 sampler="hash")
        # the scan replays the IDENTICAL rows (same calibration seed)
        x_rows, l_rows = slv_calibrate_leverage(
            S, T, R, PAR, jax.random.PRNGKey(0),
            smile_dupire.surface.k_grid, smile_dupire.surface.t_grid,
            smile_dupire.surface.grid, mixing=1.0, n_paths=65_536,
            n_steps=N_STEPS)
        ps, ss = slv_replay_price(
            kind, S, 100.0, T, R, PAR, jax.random.PRNGKey(5), x_rows,
            l_rows, barrier=b, n_paths=131_072, n_steps=N_STEPS,
            return_stderr=True)
        tol = 5 * float(jnp.sqrt(sk**2 + ss**2)) + 0.02
        assert abs(float(pk) - float(ps)) < tol, (kind, float(pk), float(ps))


class TestLimits:
    def test_flat_surface_reprices_bs(self):
        """Gyongy on the kernel: flat surface + calibrated leverage
        reprices flat-vol BS at full vol-of-vol mixing."""
        pr = SLVKernelPricer(_flat_dupire(), PAR, T, mixing=1.0,
                             n_steps=N_STEPS, n_cal_paths=65_536)
        assert pr.fit_residual < 0.05
        for k in (90.0, 100.0, 110.0):
            p, se, _ = pr.price("european", k, n_paths=1, sampler="hash")
            exact = float(bs_price(S, k, T, R, 0.2))
            assert abs(float(p) - exact) < 5 * float(se) + 0.05, (k, float(p))

    def test_mixing_moves_the_barrier(self, smile_dupire, pricer):
        lo = SLVKernelPricer(smile_dupire, PAR, T, mixing=0.1,
                             n_steps=N_STEPS, n_cal_paths=65_536)
        p1, s1, _ = pricer.price("barrier_up-and-out", 100.0, barrier=125.0,
                                 n_paths=1, sampler="hash")
        p0, s0, _ = lo.price("barrier_up-and-out", 100.0, barrier=125.0,
                             n_paths=1, sampler="hash")
        assert float(p1) - float(p0) > 8 * math.hypot(float(s1), float(s0))


class TestLadderOracles:
    @pytest.mark.parametrize("kind", ["asian_arith", "barrier_up-and-out",
                                      "lookback_fixed"])
    def test_sticky_strike_delta_fd(self, smile_dupire, pricer, kind):
        """CRN sticky-strike FD: the physical leverage L(S) stays fixed,
        so the bumped pricer's table is the SAME rows re-anchored at the
        bumped spot (x' = x - log(S'/S))."""
        b = _barrier_for(kind)
        # lookback_fixed exactly ATM sits on the boundary-term
        # subgradient; test strictly ITM (cf. test_local_vol_pallas)
        strike = 95.0 if kind == "lookback_fixed" else 100.0
        out = pricer.greeks(kind, strike, barrier=b, n_paths=1,
                            sampler="hash")
        x_rows, l_rows = slv_calibrate_leverage(
            S, T, R, PAR, jax.random.PRNGKey(0),
            smile_dupire.surface.k_grid, smile_dupire.surface.t_grid,
            smile_dupire.surface.grid, mixing=1.0, n_paths=65_536,
            n_steps=N_STEPS)

        def bumped(h):
            pr = copy.copy(pricer)
            pr.spot = S + h
            delta_x = math.log((S + h) / S)
            pr.rows, _ = fit_leverage_polys(
                np.asarray(x_rows) - delta_x, np.asarray(l_rows))
            pr._head = pricer._head.copy()
            pr._head[0] = S + h
            p, _, _ = pr.price(kind, strike, barrier=b, n_paths=1,
                               sampler="hash")
            return float(p)

        h = 0.5
        fd = (bumped(h) - bumped(-h)) / (2 * h)
        assert abs(out["delta"] - fd) < 0.035, (kind, out["delta"], fd)

    def test_frozen_leverage_v0_vega_fd(self, pricer):
        out = pricer.greeks("asian_arith", 100.0, n_paths=1,
                            sampler="hash")
        h = 0.004
        vals = {}
        for sgn in (+1, -1):
            pr = copy.copy(pricer)
            pr._head = pricer._head.copy()
            pr._head[_S_V0] = 0.04 + sgn * h
            pr.params = HestonParams.make(0.04 + sgn * h, 2.0, 0.04, 0.5,
                                          -0.7)
            p, _, _ = pr.price("asian_arith", 100.0, n_paths=1,
                               sampler="hash")
            vals[sgn] = float(p)
        fd = (vals[1] - vals[-1]) / (2 * h)
        assert abs(out["vega_v0"] - fd) < 0.12 * abs(fd) + 1.0, \
            (out["vega_v0"], fd)

    def test_frozen_leverage_rho_fd(self, smile_dupire):
        """Like the Heston ladder (same gated drift score), the rho
        estimator is exact when P(v+ = 0) = 0 and degrades under heavy
        Feller violation at coarse steps — so the oracle runs in the
        valid regime (sigma_v = 0.3: 2*kappa*theta = 0.16 > 0.09,
        16 steps), mirroring test_heston_exotics."""
        par = HestonParams.make(0.04, 2.0, 0.04, 0.3, -0.7)
        n_steps = 16
        base = SLVKernelPricer(smile_dupire, par, T, mixing=1.0,
                               n_steps=n_steps, n_cal_paths=65_536)
        out = base.greeks("european", 100.0, n_paths=1, sampler="hash")
        dt = T / n_steps
        h = 1e-3
        vals = {}
        for sgn in (+1, -1):
            pr = copy.copy(base)
            r = R + sgn * h
            pr.rate = r
            pr._head = base._head.copy()
            pr._head[_S_RDT] = r * dt
            pr._head[_S_MUDT] = r * dt  # zero dividend
            p, _, _ = pr.price("european", 100.0, n_paths=1, sampler="hash")
            vals[sgn] = float(p)
        fd = (vals[1] - vals[-1]) / (2 * h)
        assert abs(out["rho"] - fd) < 0.06 * abs(fd) + 0.5, (out["rho"], fd)


class TestStructuredKernel:
    """Cliquet/autocall on the replay kernel: scan parity on the same
    model, CRN-FD oracles for the structured LR ladder (frozen-fixings
    delta; the autocall DR moment completes rho)."""

    def test_cliquet_matches_scan(self, smile_dupire, pricer):
        from optionslab_tpu.models.slv import slv_cliquet_price

        pk, sk, _ = pricer.cliquet(n_periods=4, n_paths=1, sampler="hash")
        ps, ss = slv_cliquet_price(
            S, T, R, PAR, jax.random.PRNGKey(5),
            smile_dupire.surface.k_grid, smile_dupire.surface.t_grid,
            smile_dupire.surface.grid, mixing=1.0, n_periods=4,
            n_paths=65_536, n_steps=N_STEPS, return_stderr=True)
        tol = 5 * float(jnp.sqrt(sk**2 + ss**2)) + 0.05
        assert abs(float(pk) - float(ps)) < tol, (float(pk), float(ps))

    def test_autocall_matches_scan(self, smile_dupire, pricer):
        from optionslab_tpu.models.slv import slv_autocall_price

        pk, sk, _ = pricer.autocall(n_obs=4, n_paths=1, sampler="hash")
        ps, ss = slv_autocall_price(
            S, T, R, PAR, jax.random.PRNGKey(5),
            smile_dupire.surface.k_grid, smile_dupire.surface.t_grid,
            smile_dupire.surface.grid, mixing=1.0, n_obs=4,
            n_paths=65_536, n_steps=N_STEPS, return_stderr=True)
        tol = 5 * float(jnp.sqrt(sk**2 + ss**2)) + 0.1
        assert abs(float(pk) - float(ps)) < tol, (float(pk), float(ps))

    def test_range_accrual_matches_scan(self, smile_dupire, pricer):
        from optionslab_tpu.models.slv import slv_range_accrual_price

        pk, sk, _ = pricer.range_accrual(90.0, 112.0, n_paths=1,
                                         sampler="hash")
        ps, ss = slv_range_accrual_price(
            S, 90.0, 112.0, T, R, PAR, jax.random.PRNGKey(5),
            smile_dupire.surface.k_grid, smile_dupire.surface.t_grid,
            smile_dupire.surface.grid, mixing=1.0,
            n_paths=65_536, n_steps=N_STEPS, return_stderr=True)
        tol = 5 * float(jnp.sqrt(sk**2 + ss**2)) + 0.2
        assert abs(float(pk) - float(ps)) < tol, (float(pk), float(ps))

    def test_range_accrual_flat_mixing0_is_gbm_exact(self):
        """Flat surface + mixing->0: the leverage is exactly 1 and the
        log-Euler scheme is exact at constant vol, so the kernel must
        reproduce the EXACT GBM closed form (a strip of corridor
        digitals). At mixing=1 Gyongy pins the continuous-limit
        marginals, but the 8-step Euler digitals carry an O(dt)
        discretization bias (~1.0 on 56, measured) — covered by the
        kernel==scan parity test instead, which agrees at every
        mixing."""
        from optionslab_tpu.models.exotics import range_accrual_closed_form

        pr = SLVKernelPricer(_flat_dupire(), PAR, T, mixing=0.0,
                             n_steps=N_STEPS, n_cal_paths=65_536)
        p, se, _ = pr.range_accrual(90.0, 112.0, n_paths=1, sampler="hash")
        cf = float(range_accrual_closed_form(S, 90.0, 112.0, T, R, 0.2,
                                             notional=100.0,
                                             n_steps=N_STEPS))
        assert abs(float(p) - cf) < 5 * float(se) + 0.3, (float(p), cf)

    def test_range_accrual_rejects_bad_band(self, pricer):
        with pytest.raises(ValidationError):
            pricer.range_accrual(110.0, 90.0)

    def test_autocall_ladder_vs_crn_fd(self, smile_dupire):
        """rho (DR-completed) and v0-vega vs CRN-FD of the kernel in the
        gated-score valid regime (sigma_v = 0.3, 16 steps)."""
        par = HestonParams.make(0.04, 2.0, 0.04, 0.3, -0.7)
        base = SLVKernelPricer(smile_dupire, par, T, mixing=1.0,
                               n_steps=16, n_cal_paths=65_536)
        g = base.autocall(n_obs=4, n_paths=500_000, sampler="hash",
                          greeks=True)
        assert "frozen-fixings" in g["delta_convention"]

        def reprice(dr=0.0, dv=0.0):
            pr = copy.copy(base)
            pr.rate = R + dr
            pr._head = base._head.copy()
            dt = T / 16
            pr._head[_S_RDT] = (R + dr) * dt
            pr._head[_S_MUDT] = (R + dr) * dt
            pr._head[_S_V0] = 0.04 + dv
            if dv:
                pr.params = HestonParams.make(0.04 + dv, 2.0, 0.04, 0.3,
                                              -0.7)
            p, _, _ = pr.autocall(n_obs=4, n_paths=500_000,
                                  sampler="hash")
            return float(p)

        h = 1e-3
        fd_rho = (reprice(dr=h) - reprice(dr=-h)) / (2 * h)
        assert abs(g["rho"] - fd_rho) < 0.08 * abs(fd_rho) + 0.6, \
            (g["rho"], fd_rho)
        hv = 0.004
        fd_v0 = (reprice(dv=hv) - reprice(dv=-hv)) / (2 * hv)
        assert abs(g["vega_v0"] - fd_v0) < 0.12 * abs(fd_v0) + 1.0, \
            (g["vega_v0"], fd_v0)

    def test_cliquet_ladder_finite(self, pricer):
        g = pricer.cliquet(n_periods=4, n_paths=1, sampler="hash",
                           greeks=True)
        for k in ("price", "delta", "gamma", "vega_v0", "rho"):
            assert np.isfinite(float(g[k])), k

    def test_bad_period_raises(self, pricer):
        with pytest.raises(ValidationError):
            pricer.cliquet(n_periods=3)  # 8 % 3 != 0
        with pytest.raises(ValidationError):
            pricer.autocall(n_obs=5)


class TestValidation:
    def test_bad_kind(self, pricer):
        with pytest.raises(ValidationError):
            pricer.price("cliquet", 100.0)

    def test_bad_sampler(self, pricer):
        with pytest.raises(ValidationError):
            pricer.price("european", 100.0, sampler="sobol_bb")

    def test_greeks_reject_mixing_zero(self, smile_dupire):
        pr = SLVKernelPricer(smile_dupire, PAR, T, mixing=0.0,
                             n_steps=N_STEPS, n_cal_paths=32_768)
        with pytest.raises(ValidationError):
            pr.greeks("european", 100.0)

    def test_missing_barrier(self, pricer):
        with pytest.raises(ValidationError):
            pricer.price("barrier_up-and-out", 100.0, barrier=0.0)

    def test_one_shot_convenience(self, smile_dupire):
        p, se, n, resid = pallas_slv_exotic_price(
            smile_dupire, PAR, "asian_arith", 100.0, T, mixing=0.8,
            n_paths=1, n_steps=N_STEPS, sampler="hash")
        assert np.isfinite(float(p)) and float(se) > 0
        assert n >= 131_072 and resid < 0.05

    def test_kinds_tuple_matches_scan_kinds(self):
        from optionslab_tpu.models.slv import SLV_KINDS
        assert set(KINDS) == set(SLV_KINDS)


class TestDoubleKinds:
    """Two-sided bands on the replay kernel: exact complement on shared
    paths, scan-engine parity on the identical leverage law, LR ladder
    validation. New for this kernel family (CLI/HTTP previously rejected
    slv greeks on double kinds)."""

    L, U = 80.0, 130.0

    def test_touch_complement_exact(self, pricer):
        import math
        kw = dict(n_paths=1, seed=3, sampler="hash")
        one, _, _ = pricer.price("one_touch_double", 100.0, lower=self.L,
                                 upper=self.U, **kw)
        no, _, _ = pricer.price("no_touch_double", 100.0, lower=self.L,
                                upper=self.U, **kw)
        np.testing.assert_allclose(float(one + no), math.exp(-R * T),
                                   atol=1e-6)

    def test_double_out_matches_scan_replay(self, pricer, smile_dupire):
        """Replay the KERNEL's own leverage law in the scan engine
        (slv_replay_price consumes the same fitted rows semantics via
        bilinear interp of the calibration rows) — statistical parity."""
        import math

        import jax

        from optionslab_tpu.models.slv import SLVModel
        p_k, se_k, _ = pricer.price("barrier_double-out", 100.0,
                                    lower=self.L, upper=self.U,
                                    n_paths=1, seed=3, sampler="hash")
        slv = SLVModel(smile_dupire, PAR, mixing=1.0)
        p_s, se_s = slv.price("barrier_double-out", 100.0, T,
                              jax.random.PRNGKey(2),
                              barrier=(self.L, self.U), n_paths=131_072,
                              n_steps=N_STEPS, return_stderr=True)
        assert abs(float(p_k - p_s)) < 4 * math.hypot(float(se_k),
                                                      float(se_s)) + 2e-2
        # in-out parity on shared kernel paths
        p_i, _, _ = pricer.price("barrier_double-in", 100.0, lower=self.L,
                                 upper=self.U, n_paths=1, seed=3,
                                 sampler="hash")
        van, _, _ = pricer.price("european", 100.0, n_paths=1, seed=3,
                                 sampler="hash")
        np.testing.assert_allclose(float(p_k + p_i), float(van), rtol=1e-5)

    def test_greeks_run_and_validate(self, pricer):
        out = pricer.greeks("no_touch_double", 100.0, lower=self.L,
                            upper=self.U, n_paths=1, seed=3, sampler="hash")
        assert {"delta", "gamma", "vega_v0", "rho"} <= out.keys()
        assert 0 < out["price"] < 1.0
        with pytest.raises(ValidationError):
            pricer.price("barrier_double-out", 100.0, lower=self.U,
                         upper=self.L)
        with pytest.raises(ValidationError):
            pricer.price("one_touch_double", 100.0)

    def test_sharded_double_matches_unsharded(self, pricer):
        import jax
        from jax.sharding import Mesh

        from optionslab_tpu.parallel import (sharded_slv_greeks,
                                             sharded_slv_price)
        mesh = Mesh(np.array(jax.devices()[:4]), ("dp",))
        kw = dict(n_paths=1, seed=3, sampler="hash", lower=self.L,
                  upper=self.U)
        p_s, _, n_s = sharded_slv_price(pricer, "barrier_double-out",
                                        100.0, mesh, **kw)
        p_u, _, _ = pricer.price("barrier_double-out", 100.0,
                                 n_paths=int(n_s), seed=3, sampler="hash",
                                 lower=self.L, upper=self.U)
        np.testing.assert_allclose(float(p_s), float(p_u), rtol=2e-5)
        g_s = sharded_slv_greeks(pricer, "no_touch_double", 100.0, mesh,
                                 **kw)
        g_u = pricer.greeks("no_touch_double", 100.0,
                            n_paths=int(g_s["paths"]), seed=3,
                            sampler="hash", lower=self.L, upper=self.U)
        for k in ("price", "delta", "gamma", "vega_v0", "rho"):
            np.testing.assert_allclose(g_s[k], g_u[k], rtol=5e-5,
                                       atol=1e-7, err_msg=k)
