"""Exotics under Heston: scan engine vs fused kernel vs GBM-limit oracles.

Three independent cross-checks:
 1. kernel == scan engine statistically (same dynamics, independent
    samplers) for every payoff kind, both schemes;
 2. sigma_v -> 0, v0 = theta collapses Heston to GBM(sigma=sqrt(v0)) —
    prices must match the GBM exotic engines (``models/exotics.py``);
 3. the in-kernel LR Greek ladder vs CRN finite differences of the
    kernel itself (same seed/sampler: FD noise is tiny).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from optionslab_tpu.models.heston import HestonParams
from optionslab_tpu.models.heston_exotics import (
    HESTON_EXOTIC_KINDS, heston_autocall_price, heston_cliquet_price,
    heston_exotic_price)
from optionslab_tpu.ops.heston_pallas import (
    pallas_heston_autocall_price, pallas_heston_cliquet_price,
    pallas_heston_exotic_lr_greeks, pallas_heston_exotic_price)
from optionslab_tpu.utils.exceptions import ValidationError

PAR = HestonParams.make(0.04, 2.0, 0.04, 0.3, -0.7)
S, K, T, R = 100.0, 100.0, 1.0, 0.05
KEY = jax.random.PRNGKey(7)


def _barrier_for(kind):
    return 120.0 if "up" in kind else (80.0 if "down" in kind else 0.0)


class TestScanKernelParity:
    @pytest.mark.parametrize("kind", [
        "asian_arith", "asian_geo", "lookback_float", "lookback_fixed",
        "barrier_up-and-out", "barrier_up-and-in", "barrier_down-and-out",
        "barrier_down-and-in", "one_touch_up", "one_touch_down",
        "no_touch_up", "no_touch_down"])
    def test_kind_parity(self, kind):
        b = _barrier_for(kind)
        ps, ss = heston_exotic_price(kind, S, K, T, R, PAR, KEY, barrier=b,
                                     n_paths=60_000, n_steps=16,
                                     return_stderr=True)
        pk, sk, n = pallas_heston_exotic_price(
            kind, S, K, T, R, PAR, barrier=b, n_paths=60_000, n_steps=16,
            sampler="hash")
        tol = 5 * float(jnp.sqrt(ss**2 + sk**2)) + 0.01
        assert abs(float(ps) - float(pk)) < tol

    def test_qe_parity_and_coarse_step_bias(self):
        """QE scan == QE kernel; and QE at 8 steps sits within noise of
        Euler at 64 steps for the TERMINAL-only payoff (barrier far away
        => effectively vanilla, step-count independent)."""
        kw = dict(barrier=250.0, n_paths=60_000)
        ps, ss = heston_exotic_price("barrier_up-and-out", S, K, T, R, PAR,
                                     KEY, scheme="qe", n_steps=8,
                                     return_stderr=True, **kw)
        pk, sk, _ = pallas_heston_exotic_price(
            "barrier_up-and-out", S, K, T, R, PAR, scheme="qe", n_steps=8,
            sampler="hash", **kw)
        assert abs(float(ps) - float(pk)) < 5 * float(jnp.sqrt(ss**2 + sk**2))
        pe, se = heston_exotic_price("barrier_up-and-out", S, K, T, R, PAR,
                                     KEY, scheme="euler", n_steps=64,
                                     return_stderr=True, **kw)
        assert abs(float(ps) - float(pe)) < 5 * float(jnp.sqrt(ss**2 + se**2)) + 0.02

    def test_cliquet_parity(self):
        ps, ss = heston_cliquet_price(S, T, R, PAR, KEY, n_periods=4,
                                      n_paths=60_000, n_steps=16,
                                      return_stderr=True)
        pk, sk, _ = pallas_heston_cliquet_price(
            S, T, R, PAR, n_periods=4, n_paths=60_000, n_steps=16,
            sampler="hash")
        assert abs(float(ps) - float(pk)) < 5 * float(jnp.sqrt(ss**2 + sk**2)) + 0.01

    def test_autocall_parity(self):
        ps, ss = heston_autocall_price(S, T, R, PAR, KEY, n_obs=4,
                                       n_paths=60_000, n_steps=16,
                                       return_stderr=True)
        pk, sk, _ = pallas_heston_autocall_price(
            S, T, R, PAR, n_obs=4, n_paths=60_000, n_steps=16,
            sampler="hash")
        assert abs(float(ps) - float(pk)) < 5 * float(jnp.sqrt(ss**2 + sk**2)) + 0.02


class TestGBMLimit:
    """sigma_v -> 0, v0 = theta: variance path is exactly flat at v0, so the
    Heston engines must reproduce GBM(sigma=sqrt(v0)) discretely-monitored
    exotic prices (log-Euler is exact at constant vol)."""
    LIM = HestonParams.make(0.04, 2.0, 0.04, 1e-7, -0.7)
    VOL = 0.2

    def test_asian_matches_gbm_engine(self):
        from optionslab_tpu.models.exotics import asian_price
        pg, sg = asian_price(S, K, T, R, self.VOL, KEY, n_paths=120_000,
                             n_steps=16, return_stderr=True)
        ph, sh = heston_exotic_price("asian_arith", S, K, T, R, self.LIM,
                                     jax.random.PRNGKey(11), n_paths=120_000,
                                     n_steps=16, return_stderr=True)
        assert abs(float(pg) - float(ph)) < 5 * float(jnp.sqrt(sg**2 + sh**2))

    def test_barrier_matches_gbm_engine(self):
        from optionslab_tpu.models.exotics import barrier_price
        pg, sg = barrier_price(S, K, 120.0, T, R, self.VOL, KEY,
                               barrier_type="up-and-out", n_paths=120_000,
                               n_steps=16, return_stderr=True)
        ph, sh = heston_exotic_price("barrier_up-and-out", S, K, T, R,
                                     self.LIM, jax.random.PRNGKey(12),
                                     barrier=120.0, n_paths=120_000,
                                     n_steps=16, return_stderr=True)
        assert abs(float(pg) - float(ph)) < 5 * float(jnp.sqrt(sg**2 + sh**2))

    def test_kernel_lookback_matches_gbm_engine(self):
        from optionslab_tpu.models.exotics import lookback_price
        pg, sg = lookback_price(S, K, T, R, self.VOL, KEY, floating=True,
                                n_paths=120_000, n_steps=16,
                                return_stderr=True)
        ph, sh, _ = pallas_heston_exotic_price(
            "lookback_float", S, K, T, R, self.LIM, n_paths=120_000,
            n_steps=16, sampler="hash")
        assert abs(float(pg) - float(ph)) < 5 * float(jnp.sqrt(sg**2 + sh**2))


class TestLRGreeks:
    @pytest.fixture(scope="class")
    def asian_ladder(self):
        return pallas_heston_exotic_lr_greeks(
            "asian_arith", S, K, T, R, PAR, n_paths=250_000, n_steps=16,
            sampler="hash")

    def _fd(self, kind, b, h_s=0.5, h_v=0.002, h_r=0.002, n_paths=250_000):
        def price(s=S, rr=R, v0=0.04):
            p = HestonParams.make(v0, 2.0, 0.04, 0.3, -0.7)
            pk, _, _ = pallas_heston_exotic_price(
                kind, s, K, T, rr, p, barrier=b, n_paths=n_paths,
                n_steps=16, sampler="hash")
            return float(pk)
        p0 = price()
        pu, pd = price(s=S + h_s), price(s=S - h_s)
        pvu, pvd = price(v0=0.04 + h_v), price(v0=0.04 - h_v)
        pru, prd = price(rr=R + h_r), price(rr=R - h_r)
        return {"price": p0, "delta": (pu - pd) / (2 * h_s),
                "gamma": (pu - 2 * p0 + pd) / h_s**2,
                "vega_v0": (pvu - pvd) / (2 * h_v),
                "rho": (pru - prd) / (2 * h_r)}

    def test_asian_ladder_vs_crn_fd(self, asian_ladder):
        fd = self._fd("asian_arith", 0.0)
        g = asian_ladder
        assert abs(g["price"] - fd["price"]) < 1e-6  # same seed: identical
        assert abs(g["delta"] - fd["delta"]) < 0.02
        assert abs(g["gamma"] - fd["gamma"]) < 0.005
        assert abs(g["vega_v0"] - fd["vega_v0"]) < 0.05 * abs(fd["vega_v0"]) + 0.5
        assert abs(g["rho"] - fd["rho"]) < 0.05 * abs(fd["rho"]) + 0.5

    def test_vega_convention(self, asian_ladder):
        assert asian_ladder["vega"] == pytest.approx(
            2.0 * np.sqrt(0.04) * asian_ladder["vega_v0"], rel=1e-6)

    @pytest.mark.slow
    def test_barrier_ladder_vs_crn_fd(self):
        g = pallas_heston_exotic_lr_greeks(
            "barrier_up-and-out", S, K, T, R, PAR, barrier=120.0,
            n_paths=500_000, n_steps=16, sampler="hash")
        fd = self._fd("barrier_up-and-out", 120.0, n_paths=500_000)
        assert abs(g["delta"] - fd["delta"]) < 0.02
        assert abs(g["vega_v0"] - fd["vega_v0"]) < 0.06 * abs(fd["vega_v0"]) + 0.5
        assert abs(g["rho"] - fd["rho"]) < 1.0

    def test_gbm_limit_delta_matches_bs_pathwise(self):
        """In the sigma_v->0 limit the joint-density LR delta must agree
        with the GBM exotic kernel's LR delta (exact identity in
        expectation: E[pay*zo0]/srho == E[pay*zx0] when pay _|_ zv)."""
        from optionslab_tpu.ops.exotic_pallas import pallas_exotic_lr_greeks
        lim = HestonParams.make(0.04, 2.0, 0.04, 1e-7, -0.7)
        gh = pallas_heston_exotic_lr_greeks(
            "asian_arith", S, K, T, R, lim, n_paths=250_000, n_steps=16,
            sampler="hash")
        gg = pallas_exotic_lr_greeks(
            "asian_arith", S, K, T, R, 0.2, n_paths=250_000, n_steps=16,
            sampler="hash")
        assert abs(gh["delta"] - gg["delta"]) < 0.02
        assert abs(gh["price"] - gg["price"]) < 0.05


class TestValidation:
    def test_unknown_kind(self):
        with pytest.raises(ValidationError):
            heston_exotic_price("nope", S, K, T, R, PAR, KEY)
        with pytest.raises(ValidationError):
            pallas_heston_exotic_price("nope", S, K, T, R, PAR)

    def test_structured_kinds_rejected(self):
        with pytest.raises(ValidationError):
            pallas_heston_exotic_price("cliquet", S, K, T, R, PAR)
        with pytest.raises(ValidationError):
            pallas_heston_exotic_lr_greeks("autocall", S, K, T, R, PAR)

    def test_qmc_rejected_for_lr(self):
        # the PRICE path supports sobol_bb (TestBridgeQMC); LR scores
        # need iid normals and must keep rejecting it
        with pytest.raises(ValidationError):
            pallas_heston_exotic_lr_greeks("asian_arith", S, K, T, R, PAR,
                                           sampler="sobol_bb")

    def test_bad_period(self):
        with pytest.raises(ValidationError):
            heston_cliquet_price(S, T, R, PAR, KEY, n_periods=5, n_steps=16)
        with pytest.raises(ValidationError):
            pallas_heston_autocall_price(S, T, R, PAR, n_obs=5, n_steps=16)


class TestLRTheta:
    """theta from the per-step maturity score of the joint density:
    oracle is CRN-FD in T of the kernel itself (hash counters are
    step-indexed, so bumping T keeps the same normals — tight FD)."""

    def _fd_theta(self, kind, b, h=0.01, **kw):
        def pT(t):
            p, _, _ = pallas_heston_exotic_price(
                kind, S, K, t, R, PAR, barrier=b, n_paths=250_000,
                n_steps=16, sampler="hash", **kw)
            return float(p)
        return -(pT(T + h) - pT(T - h)) / (2 * h)

    def test_asian_theta(self):
        g = pallas_heston_exotic_lr_greeks("asian_arith", S, K, T, R, PAR,
                                           n_paths=500_000, n_steps=16,
                                           sampler="hash")
        # the chi^2 maturity-score term has sem ~0.04 at 500k paths
        assert abs(g["theta"] - self._fd_theta("asian_arith", 0.0)) < 0.2

    @pytest.mark.slow
    def test_barrier_theta(self):
        g = pallas_heston_exotic_lr_greeks(
            "barrier_up-and-out", S, K, T, R, PAR, barrier=120.0,
            n_paths=500_000, n_steps=16, sampler="hash")
        assert abs(g["theta"] - self._fd_theta("barrier_up-and-out", 120.0)) < 0.25


class TestStructuredLadders:
    def test_cliquet_ladder_vs_crn_fd(self):
        from optionslab_tpu.ops.heston_pallas import (
            pallas_heston_cliquet_lr_greeks, pallas_heston_cliquet_price)
        g = pallas_heston_cliquet_lr_greeks(S, T, R, PAR, n_periods=4,
                                            n_paths=250_000, n_steps=16,
                                            sampler="hash")

        def price(rr=R, v0=0.04):
            p = HestonParams.make(v0, 2.0, 0.04, 0.3, -0.7)
            pk, _, _ = pallas_heston_cliquet_price(
                S, T, rr, p, n_periods=4, n_paths=250_000, n_steps=16,
                sampler="hash")
            return float(pk)
        fd_rho = (price(rr=R + 0.002) - price(rr=R - 0.002)) / 0.004
        fd_v0 = (price(v0=0.042) - price(v0=0.038)) / 0.004
        assert abs(g["rho"] - fd_rho) < 0.08 * abs(fd_rho) + 0.3
        # the v0 score is the noisiest entry: 3-sigma-ish band
        assert abs(g["vega_v0"] - fd_v0) < 0.3 * abs(fd_v0) + 1.0
        assert "frozen-fixings" in g["delta_convention"]

    def test_autocall_ladder_vs_crn_fd(self):
        from optionslab_tpu.ops.heston_pallas import (
            pallas_heston_autocall_lr_greeks, pallas_heston_autocall_price)
        g = pallas_heston_autocall_lr_greeks(S, T, R, PAR, n_obs=4,
                                             n_paths=250_000, n_steps=16,
                                             sampler="hash")

        def price(rr=R, t=T):
            pk, _, _ = pallas_heston_autocall_price(
                S, t, rr, PAR, n_obs=4, n_paths=250_000, n_steps=16,
                sampler="hash")
            return float(pk)
        fd_rho = (price(rr=R + 0.002) - price(rr=R - 0.002)) / 0.004
        fd_theta = -(price(t=T + 0.01) - price(t=T - 0.01)) / 0.02
        # DR moment completes rho/theta for the in-kernel-discounted payoff
        assert abs(g["rho"] - fd_rho) < 0.08 * abs(fd_rho) + 0.3
        assert abs(g["theta"] - fd_theta) < 0.12 * abs(fd_theta) + 0.3
        assert g["price"] == pytest.approx(price(), abs=1e-5)

    def test_structured_reject_qmc_and_bad_period(self):
        from optionslab_tpu.ops.heston_pallas import (
            pallas_heston_autocall_lr_greeks, pallas_heston_cliquet_lr_greeks)
        with pytest.raises(ValidationError):
            pallas_heston_cliquet_lr_greeks(S, T, R, PAR, n_periods=5,
                                            n_steps=16)
        with pytest.raises(ValidationError):
            pallas_heston_autocall_lr_greeks(S, T, R, PAR, sampler="sobol_bb")


class TestBridgeQMC:
    """sobol_bb on the stochastic-vol exotic kernel: 4+4 dyadic levels
    over both streams, hash residuals, stats updated inside the replay."""

    def test_parity_with_plain_mc(self):
        ph, sh, _ = pallas_heston_exotic_price(
            "asian_arith", S, K, T, R, PAR, n_paths=131072, n_steps=16,
            sampler="hash")
        pq, _, _ = pallas_heston_exotic_price(
            "asian_arith", S, K, T, R, PAR, n_paths=131072, n_steps=16,
            sampler="sobol_bb")
        assert abs(float(ph) - float(pq)) < 6 * float(sh)

    @pytest.mark.slow
    def test_error_reduction_over_seeds(self):
        def run(sampler):
            vals = []
            for s in range(6):
                p, _, _ = pallas_heston_exotic_price(
                    "asian_arith", S, K, T, R, PAR, n_paths=131072,
                    n_steps=16, sampler=sampler, seed=s)
                vals.append(float(p))
            return np.array(vals)
        vh, vq = run("hash"), run("sobol_bb")
        # measured ~2.8x on this config; assert a conservative floor
        assert vq.std() < 0.6 * vh.std()

    def test_rejections(self):
        with pytest.raises(ValidationError):  # QE cannot be bridged
            pallas_heston_exotic_price("asian_arith", S, K, T, R, PAR,
                                       sampler="sobol_bb", scheme="qe")
        with pytest.raises(ValidationError):  # plain sobol unsupported
            pallas_heston_exotic_price("asian_arith", S, K, T, R, PAR,
                                       sampler="sobol")
        with pytest.raises(ValidationError):  # n_steps >= 2
            pallas_heston_exotic_price("asian_arith", S, K, T, R, PAR,
                                       sampler="sobol_bb", n_steps=1)


class TestBatesExotics:
    """Exotics under Bates (stochastic vol + compound-Poisson jumps):
    the scan engine accepts BatesParams transparently; the kernel
    truncates the per-step count at 3 (bias O((lam*dt)^4))."""
    from optionslab_tpu.models.bates import BatesParams
    BP = BatesParams.make(0.04, 2.0, 0.04, 0.3, -0.7, lam=0.5, mu_j=-0.1,
                          sigma_j=0.15)

    def test_vanilla_limit_matches_bates_cf(self):
        """Far up-and-out barrier == vanilla == Bates CF price."""
        from optionslab_tpu.models.bates import BatesParams, bates_price
        from optionslab_tpu.types import ContractBatch
        pb, sb = heston_exotic_price(
            "barrier_up-and-out", S, K, T, R, self.BP, KEY, barrier=1e6,
            n_paths=200_000, n_steps=64, return_stderr=True)
        bp64 = BatesParams.make(0.04, 2.0, 0.04, 0.3, -0.7, lam=0.5,
                                mu_j=-0.1, sigma_j=0.15, dtype=jnp.float64)
        exact = float(bates_price(
            ContractBatch.make(S, K, T, R, 0.2, "call", dtype=jnp.float64),
            bp64))
        assert abs(float(pb) - exact) < 4 * float(sb) + 0.05

    def test_lam_zero_is_heston(self):
        from optionslab_tpu.models.bates import BatesParams
        b0 = BatesParams.make(0.04, 2.0, 0.04, 0.3, -0.7, lam=0.0,
                              mu_j=-0.1, sigma_j=0.15)
        pa, sa = heston_exotic_price("asian_arith", S, K, T, R, b0, KEY,
                                     n_paths=100_000, n_steps=16,
                                     return_stderr=True)
        ph, sh = heston_exotic_price("asian_arith", S, K, T, R, PAR,
                                     jax.random.PRNGKey(2), n_paths=100_000,
                                     n_steps=16, return_stderr=True)
        assert abs(float(pa) - float(ph)) < 5 * float(jnp.sqrt(sa**2 + sh**2))

    @pytest.mark.parametrize("kind,b,cp", [
        ("asian_arith", 0.0, 1.0), ("barrier_down-and-in", 80.0, -1.0),
        ("one_touch_down", 80.0, 1.0)])
    def test_kernel_scan_parity(self, kind, b, cp):
        ps, ss = heston_exotic_price(kind, S, K, T, R, self.BP, KEY, cp=cp,
                                     barrier=b, n_paths=80_000, n_steps=16,
                                     return_stderr=True)
        pk, sk, _ = pallas_heston_exotic_price(
            kind, S, K, T, R, self.BP, cp=cp, barrier=b, n_paths=80_000,
            n_steps=16, sampler="hash")
        tol = 5 * float(jnp.sqrt(ss**2 + sk**2)) + 0.01
        assert abs(float(ps) - float(pk)) < tol

    def test_qe_with_jumps_parity(self):
        ps, ss = heston_exotic_price("asian_arith", S, K, T, R, self.BP, KEY,
                                     scheme="qe", n_paths=80_000, n_steps=16,
                                     return_stderr=True)
        pk, sk, _ = pallas_heston_exotic_price(
            "asian_arith", S, K, T, R, self.BP, scheme="qe", n_paths=80_000,
            n_steps=16, sampler="hash")
        assert abs(float(ps) - float(pk)) < 5 * float(jnp.sqrt(ss**2 + sk**2)) + 0.01

    def test_jumps_fatten_left_tail(self):
        """Down-and-in put must be worth MORE under negative-mean jumps."""
        pj, _, _ = pallas_heston_exotic_price(
            "barrier_down-and-in", S, K, T, R, self.BP, cp=-1.0,
            barrier=80.0, n_paths=100_000, n_steps=16, sampler="hash")
        pn, _, _ = pallas_heston_exotic_price(
            "barrier_down-and-in", S, K, T, R, PAR, cp=-1.0, barrier=80.0,
            n_paths=100_000, n_steps=16, sampler="hash")
        assert float(pj) > float(pn) + 0.5

    def test_lr_ladder_under_bates(self):
        g = pallas_heston_exotic_lr_greeks(
            "asian_arith", S, K, T, R, self.BP, n_paths=250_000, n_steps=16,
            sampler="hash")

        def price(s=S, rr=R):
            p, _, _ = pallas_heston_exotic_price(
                "asian_arith", s, K, T, rr, self.BP, n_paths=250_000,
                n_steps=16, sampler="hash")
            return float(p)
        fd_d = (price(s=S + 0.5) - price(s=S - 0.5)) / 1.0
        fd_r = (price(rr=R + 0.002) - price(rr=R - 0.002)) / 0.004
        assert abs(g["delta"] - fd_d) < 0.02
        assert abs(g["rho"] - fd_r) < 0.05 * abs(fd_r) + 0.6

    def test_autocall_under_bates(self):
        from optionslab_tpu.ops.heston_pallas import (
            pallas_heston_autocall_price)
        ps, ss = heston_autocall_price(S, T, R, self.BP, KEY, n_obs=4,
                                       n_paths=80_000, n_steps=16,
                                       return_stderr=True)
        pk, sk, _ = pallas_heston_autocall_price(
            S, T, R, self.BP, n_obs=4, n_paths=80_000, n_steps=16,
            sampler="hash")
        assert abs(float(ps) - float(pk)) < 5 * float(jnp.sqrt(ss**2 + sk**2)) + 0.02
        # jumps must cheapen the autocall (knock-in more likely)
        ph, _, _ = pallas_heston_autocall_price(
            S, T, R, PAR, n_obs=4, n_paths=80_000, n_steps=16,
            sampler="hash")
        assert float(pk) < float(ph)


class TestRangeAccrualUnderSV:
    S, L, U, T, R = 100.0, 90.0, 110.0, 1.0, 0.05

    def test_scan_kernel_parity_and_gbm_limit(self):
        from optionslab_tpu.models.exotics import range_accrual_closed_form
        from optionslab_tpu.models.heston_exotics import (
            heston_range_accrual_price)
        from optionslab_tpu.ops.heston_pallas import (
            pallas_heston_range_accrual_price)
        ps, ss = heston_range_accrual_price(
            self.S, self.L, self.U, self.T, self.R, PAR, KEY,
            n_paths=80_000, n_steps=16, return_stderr=True)
        pk, sk, _ = pallas_heston_range_accrual_price(
            self.S, self.L, self.U, self.T, self.R, PAR, n_paths=80_000,
            n_steps=16, sampler="hash")
        assert abs(float(ps) - float(pk)) < 5 * float(
            jnp.sqrt(ss**2 + sk**2))
        lim = HestonParams.make(0.04, 2.0, 0.04, 1e-7, -0.7)
        cf = float(range_accrual_closed_form(self.S, self.L, self.U, self.T,
                                             self.R, 0.2, n_steps=16))
        pl, sl, _ = pallas_heston_range_accrual_price(
            self.S, self.L, self.U, self.T, self.R, lim, n_paths=200_000,
            n_steps=16, sampler="hash")
        assert abs(float(pl) - cf) < 4 * float(sl) + 0.05

    def test_jumps_reduce_accrual(self):
        """Negative-mean jumps kick paths out of the corridor."""
        from optionslab_tpu.models.bates import BatesParams
        from optionslab_tpu.ops.heston_pallas import (
            pallas_heston_range_accrual_price)
        bp = BatesParams.make(0.04, 2.0, 0.04, 0.3, -0.7, lam=0.5,
                              mu_j=-0.1, sigma_j=0.15)
        pj, _, _ = pallas_heston_range_accrual_price(
            self.S, self.L, self.U, self.T, self.R, bp, n_paths=80_000,
            n_steps=16, sampler="hash")
        ph, _, _ = pallas_heston_range_accrual_price(
            self.S, self.L, self.U, self.T, self.R, PAR, n_paths=80_000,
            n_steps=16, sampler="hash")
        assert float(pj) < float(ph) - 1.0

    def test_lr_delta_vs_crn_fd(self):
        from optionslab_tpu.ops.heston_pallas import (
            pallas_heston_range_accrual_lr_greeks,
            pallas_heston_range_accrual_price)
        g = pallas_heston_range_accrual_lr_greeks(
            self.S, self.L, self.U, self.T, self.R, PAR, n_paths=400_000,
            n_steps=16, sampler="hash")

        def price(s):
            p, _, _ = pallas_heston_range_accrual_price(
                s, self.L, self.U, self.T, self.R, PAR, n_paths=400_000,
                n_steps=16, sampler="hash")
            return float(p)
        fd = (price(self.S + 0.5) - price(self.S - 0.5)) / 1.0
        assert abs(g["delta"] - fd) < 0.025


class TestHestonContractBooks:
    """Round-5 contract-book launches under ONE Heston/Bates dynamics:
    N same-kind contracts interleave the row axis of one kernel launch —
    reference analog ``MonteCarloPricerUni.price_batch``
    (``src/pricing_models/monte_carlo_unified.py:562``)."""

    STRIKES = [90.0, 100.0, 110.0]

    def _tol(self, a, b, nsig=5.0):
        return nsig * float(np.hypot(float(a), float(b))) + 1e-3

    def test_asian_book_matches_singles(self):
        from optionslab_tpu.ops.heston_pallas import (
            pallas_heston_exotic_book_price, pallas_heston_exotic_price)

        bp, bse, _ = pallas_heston_exotic_book_price(
            "asian_arith", S, self.STRIKES, T, R, PAR, n_paths=30_000,
            n_steps=6, sampler="hash", seed=3)
        for i, k in enumerate(self.STRIKES):
            sp, sse, _ = pallas_heston_exotic_price(
                "asian_arith", S, k, T, R, PAR, n_paths=1, n_steps=6,
                sampler="hash", seed=11)
            assert abs(float(bp[i]) - float(sp)) < self._tol(bse[i], sse), k
        assert float(bp[0]) > float(bp[1]) > float(bp[2])

    def test_qe_barrier_book_mixed_levels(self):
        from optionslab_tpu.ops.heston_pallas import (
            pallas_heston_exotic_book_price, pallas_heston_exotic_price)

        ks, bs = [95.0, 105.0], [125.0, 135.0]
        bp, bse, _ = pallas_heston_exotic_book_price(
            "barrier_up-and-out", S, ks, T, R, PAR, barriers=bs,
            n_paths=30_000, n_steps=6, sampler="hash", seed=5, scheme="qe")
        for i, (k, b) in enumerate(zip(ks, bs)):
            sp, sse, _ = pallas_heston_exotic_price(
                "barrier_up-and-out", S, k, T, R, PAR, barrier=b,
                n_paths=1, n_steps=6, sampler="hash", seed=12, scheme="qe")
            assert abs(float(bp[i]) - float(sp)) < self._tol(bse[i], sse)

    def test_single_contract_barrier_book_carries_levels(self):
        """Regression: nc_pad == 1 books take the kernel's SCALAR path
        (book operand dropped in _launch_exotic) — the barrier/band must
        also ride the scalar params or the contract silently prices as
        immediately knocked (price 0 with ~0 stderr)."""
        from optionslab_tpu.ops.heston_pallas import (
            pallas_heston_exotic_book_price, pallas_heston_exotic_price)

        for kind, kw_b, kw_s in (
            ("barrier_up-and-out", dict(barriers=[125.0]),
             dict(barrier=125.0)),
            ("barrier_double-out", dict(lowers=[80.0], uppers=[125.0]),
             dict(lower=80.0, upper=125.0)),
        ):
            bp, bse, nb = pallas_heston_exotic_book_price(
                kind, S, [K], T, R, PAR, n_paths=1, n_steps=6,
                sampler="hash", seed=31, **kw_b)
            sp, sse, ns = pallas_heston_exotic_price(
                kind, S, K, T, R, PAR, n_paths=1, n_steps=6,
                sampler="hash", seed=31, **kw_s)
            assert nb == ns
            assert float(sp) > 0.0, kind
            np.testing.assert_allclose(float(bp[0]), float(sp), rtol=1e-6,
                                       err_msg=kind)
            np.testing.assert_allclose(float(bse[0]), float(sse),
                                       rtol=1e-5, err_msg=kind)

    def test_single_contract_touch_book_lr_carries_barrier(self):
        from optionslab_tpu.ops.heston_pallas import (
            pallas_heston_exotic_book_lr_greeks,
            pallas_heston_exotic_lr_greeks)

        g = pallas_heston_exotic_book_lr_greeks(
            "one_touch_up", S, [K], T, R, PAR, barriers=[120.0],
            n_paths=1, n_steps=6, sampler="hash", seed=37)
        gs = pallas_heston_exotic_lr_greeks(
            "one_touch_up", S, K, T, R, PAR, barrier=120.0, n_paths=1,
            n_steps=6, sampler="hash", seed=37)
        assert 0.0 < float(gs["price"]) < float(np.exp(-R * T))
        for key in ("price", "delta", "vega_v0", "rho", "theta"):
            np.testing.assert_allclose(float(g[key][0]), float(gs[key]),
                                       rtol=2e-5, atol=1e-7, err_msg=key)

    def test_lr_book_ladder(self):
        from optionslab_tpu.ops.heston_pallas import (
            pallas_heston_exotic_book_lr_greeks,
            pallas_heston_exotic_lr_greeks)

        g = pallas_heston_exotic_book_lr_greeks(
            "asian_arith", S, self.STRIKES, T, R, PAR, n_paths=30_000,
            n_steps=6, sampler="hash", seed=7)
        gs = pallas_heston_exotic_lr_greeks(
            "asian_arith", S, K, T, R, PAR, n_paths=131_072, n_steps=6,
            sampler="hash", seed=13)
        assert abs(float(g["delta"][1]) - float(gs["delta"])) < 0.1
        d = np.asarray(g["delta"])
        assert d[0] > d[1] > d[2]
        assert np.all(np.asarray(g["std_error"]) > 0.0)

    def test_book_validation(self):
        from optionslab_tpu.ops.heston_pallas import (
            pallas_heston_exotic_book_price)

        with pytest.raises(ValidationError):  # structured kind
            pallas_heston_exotic_book_price("cliquet", S, [100.0], T, R,
                                            PAR)
        with pytest.raises(ValidationError):  # QMC rides the row axis
            pallas_heston_exotic_book_price("asian_arith", S, [100.0], T,
                                            R, PAR, sampler="sobol_bb")
        with pytest.raises(ValidationError):  # missing barriers
            pallas_heston_exotic_book_price("one_touch_up", S,
                                            [100.0, 100.0], T, R, PAR)
        with pytest.raises(ValidationError):  # band per contract
            pallas_heston_exotic_book_price(
                "barrier_double-out", S, [100.0], T, R, PAR,
                lowers=[120.0], uppers=[90.0])
