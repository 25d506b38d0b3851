"""End-to-end numeric validation of the fused exotic Pallas kernels.

Runs on the CPU TPU-interpreter with the ``hash`` sampler (counter-based
murmur3 normals from pure int32 ops — the hardware-PRNG path is stubbed to
zeros off-TPU). Oracles:

  * scan engine (`models/exotics.py`) — independent sampler, statistical
    parity within combined stderr;
  * discrete geometric-Asian closed form — EXACT price oracle, and via
    ``jax.grad`` an exact Greek oracle for the in-kernel pathwise ladder;
  * lookback homogeneity: the floating lookback price is homogeneous of
    degree 1 in spot, so delta ≡ price / spot.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from optionslab_tpu.models import exotics as ex
from optionslab_tpu.ops.exotic_pallas import (
    GREEK_KINDS,
    pallas_autocall_price,
    pallas_cliquet_price,
    pallas_exotic_greeks,
    pallas_exotic_price,
)
from optionslab_tpu.utils.exceptions import ValidationError

S, K, T, R, SIG = 100.0, 100.0, 1.0, 0.05, 0.2
N_STEPS = 8
KEY = jax.random.PRNGKey(7)


def tol(se_a, se_b, nsig=5.0, floor=1e-3):
    return nsig * float(np.hypot(float(se_a), float(se_b))) + floor


class TestPriceParityVsScan:
    @pytest.mark.parametrize("kind,cp", [
        ("asian_arith", 1.0), ("asian_arith", -1.0), ("asian_geo", 1.0),
        ("lookback_float", 1.0), ("lookback_float", -1.0),
        ("lookback_fixed", 1.0), ("lookback_fixed", -1.0),
    ])
    def test_asian_lookback(self, kind, cp):
        p, se, _ = pallas_exotic_price(kind, S, K, T, R, SIG, cp,
                                       n_paths=1, n_steps=N_STEPS, sampler="hash")
        if kind.startswith("asian"):
            avg = "arithmetic" if kind == "asian_arith" else "geometric"
            ps, ses = ex.asian_price(S, K, T, R, SIG, KEY, cp, 0.0, 200_000,
                                     N_STEPS, avg, return_stderr=True)
        else:
            ps, ses = ex.lookback_price(S, K, T, R, SIG, KEY, cp, 0.0, 200_000,
                                        N_STEPS, kind == "lookback_float",
                                        return_stderr=True)
        assert abs(float(p) - float(ps)) < tol(se, ses), (float(p), float(ps))

    @pytest.mark.parametrize("btype", ["up-and-out", "up-and-in",
                                       "down-and-out", "down-and-in"])
    def test_barrier(self, btype):
        barrier = 120.0 if btype.startswith("up") else 85.0
        p, se, _ = pallas_exotic_price(f"barrier_{btype}", S, K, T, R, SIG, 1.0,
                                       barrier=barrier, n_paths=1,
                                       n_steps=N_STEPS, sampler="hash")
        ps, ses = ex.barrier_price(S, K, barrier, T, R, SIG, KEY, 1.0, 0.0,
                                   200_000, N_STEPS, btype, return_stderr=True)
        assert abs(float(p) - float(ps)) < tol(se, ses), (float(p), float(ps))

    def test_cliquet(self):
        p, se, _ = pallas_cliquet_price(S, T, R, SIG, n_periods=4,
                                        n_steps=N_STEPS, n_paths=1, sampler="hash")
        ps, ses = ex.cliquet_price(S, T, R, SIG, KEY, n_periods=4,
                                   n_steps=N_STEPS, n_paths=200_000,
                                   return_stderr=True)
        assert abs(float(p) - float(ps)) < tol(se, ses), (float(p), float(ps))

    def test_autocall(self):
        kw = dict(notional=100.0, autocall_barrier=1.0, coupon_barrier=0.8,
                  ki_barrier=0.7, coupon_rate=0.08, n_obs=4)
        p, se, _ = pallas_autocall_price(S, T, R, SIG, 0.0, n_steps=N_STEPS,
                                         n_paths=1, sampler="hash", **kw)
        ps, ses = ex.autocallable_price(S, T, R, SIG, KEY, 0.0, n_steps=N_STEPS,
                                        n_paths=200_000, return_stderr=True, **kw)
        assert abs(float(p) - float(ps)) < tol(se, ses), (float(p), float(ps))

    def test_geo_closed_form_oracle(self):
        p, se, _ = pallas_exotic_price("asian_geo", S, K, T, R, SIG, 1.0,
                                       n_paths=1, n_steps=N_STEPS, sampler="hash")
        cf = float(ex.geometric_asian_closed_form(S, K, T, R, SIG, 1.0, 0.0, N_STEPS))
        assert abs(float(p) - cf) < 5.0 * float(se) + 1e-3

    def test_hash_sampler_deterministic(self):
        p0, _, _ = pallas_exotic_price("asian_arith", S, K, T, R, SIG,
                                       n_paths=1, n_steps=4, seed=3, sampler="hash")
        p1, _, _ = pallas_exotic_price("asian_arith", S, K, T, R, SIG,
                                       n_paths=1, n_steps=4, seed=3, sampler="hash")
        p2, _, _ = pallas_exotic_price("asian_arith", S, K, T, R, SIG,
                                       n_paths=1, n_steps=4, seed=4, sampler="hash")
        assert float(p0) == float(p1)
        assert float(p0) != float(p2)


class TestKernelGreeks:
    def test_geo_greeks_vs_closed_form_ad(self):
        """Exact oracle: jax.grad of the discrete geometric closed form."""
        g = pallas_exotic_greeks("asian_geo", S, K, T, R, SIG, 1.0,
                                 n_paths=1, n_steps=N_STEPS, sampler="hash")

        def cf(s, sig, r, t):
            return ex.geometric_asian_closed_form(s, K, t, r, sig, 1.0, 0.0, N_STEPS)

        price, grads = jax.value_and_grad(cf, argnums=(0, 1, 2, 3))(
            jnp.float64(S), jnp.float64(SIG), jnp.float64(R), jnp.float64(T))
        se = float(g["std_error"])
        assert abs(float(g["price"]) - float(price)) < 5 * se + 1e-3
        assert abs(float(g["delta"]) - float(grads[0])) < 0.01
        assert abs(float(g["vega"]) - float(grads[1])) < 0.6
        assert abs(float(g["rho"]) - float(grads[2])) < 0.6
        assert abs(float(g["theta"]) - (-float(grads[3]))) < 0.3

    @pytest.mark.parametrize("kind,cp", [
        ("asian_arith", 1.0), ("asian_arith", -1.0),
        ("lookback_fixed", 1.0), ("lookback_float", 1.0),
    ])
    def test_greeks_vs_scan_ad(self, kind, cp):
        """Statistical parity with the scan engine's AD ladder.

        lookback_fixed uses K=105 ≠ S0: with K = S0 the extremum (seeded at
        S0) has a probability ATOM exactly at the payoff kink, where delta
        is genuinely ill-defined (left/right derivatives differ).
        """
        k = 105.0 if kind == "lookback_fixed" else K
        g = pallas_exotic_greeks(kind, S, k, T, R, SIG, cp,
                                 n_paths=1, n_steps=N_STEPS, sampler="hash")
        if kind == "asian_arith":
            fn = lambda s, v, r, t: ex.asian_price(s, k, t, r, v, KEY, cp, 0.0,
                                                   200_000, N_STEPS, "arithmetic")
        else:
            fn = lambda s, v, r, t: ex.lookback_price(s, k, t, r, v, KEY, cp, 0.0,
                                                      200_000, N_STEPS,
                                                      kind == "lookback_float")
        ad = ex.exotic_greeks(fn, S, SIG, R, T)
        assert abs(float(g["price"]) - float(ad["price"])) < tol(
            g["std_error"], 0.03)
        assert abs(float(g["delta"]) - float(ad["delta"])) < 0.02
        assert abs(float(g["vega"]) - float(ad["vega"])) < 1.2
        assert abs(float(g["rho"]) - float(ad["rho"])) < 1.2
        assert abs(float(g["theta"]) - float(ad["theta"])) < 0.6

    def test_lookback_float_homogeneity(self):
        """price(λS) = λ·price(S) ⇒ delta = price/spot (exact identity)."""
        g = pallas_exotic_greeks("lookback_float", S, K, T, R, SIG, 1.0,
                                 n_paths=1, n_steps=N_STEPS, sampler="hash")
        np.testing.assert_allclose(float(g["delta"]), float(g["price"]) / S,
                                   rtol=1e-5)

    def test_unsupported_kind_raises(self):
        with pytest.raises(ValidationError):
            pallas_exotic_greeks("barrier_up-and-out", S, K, T, R, SIG)
        with pytest.raises(ValidationError):
            pallas_exotic_price("cliquet", S, K, T, R, SIG)
        with pytest.raises(ValidationError):
            pallas_exotic_price("nope", S, K, T, R, SIG)
        assert set(GREEK_KINDS) <= set(
            ("asian_arith", "asian_geo", "lookback_float", "lookback_fixed"))


class TestBridgeQMC:
    """Hybrid bridge QMC: Sobol terminal+midpoint coordinates, conditional
    residual fill-in. Oracle: the exact discrete geometric-Asian closed
    form (the QMC estimate must be much closer than plain MC at the same
    path budget)."""

    def test_geo_asian_error_beats_plain_mc(self):
        cf = float(ex.geometric_asian_closed_form(S, K, T, R, SIG, 1.0, 0.0,
                                                  N_STEPS))
        errs_mc, errs_qmc = [], []
        for seed in (0, 1, 2):
            pm, _, _ = pallas_exotic_price("asian_geo", S, K, T, R, SIG,
                                           n_paths=1, n_steps=N_STEPS,
                                           seed=seed, sampler="hash")
            pq, _, _ = pallas_exotic_price("asian_geo", S, K, T, R, SIG,
                                           n_paths=1, n_steps=N_STEPS,
                                           seed=seed, sampler="sobol_bb_hash")
            errs_mc.append(abs(float(pm) - cf))
            errs_qmc.append(abs(float(pq) - cf))
        # round-3: EIGHT bridge coordinates in-kernel — order-of-magnitude
        # error reduction (measured ~24x rms at one block)
        assert max(errs_qmc) < 0.25 * (sum(errs_mc) / 3) + 2e-4, \
            (errs_qmc, errs_mc)
        assert max(errs_qmc) < 2e-3

    @pytest.mark.slow
    def test_terminal_marginal_exact_vanilla(self):
        """A never-hit barrier is a European call: the bridge construction
        must reproduce the exact terminal lognormal."""
        from optionslab_tpu.models.black_scholes import bs_price

        p, se, _ = pallas_exotic_price("barrier_up-and-out", S, K, T, R, SIG,
                                       barrier=1e6, n_paths=1,
                                       n_steps=N_STEPS,
                                       sampler="sobol_bb_hash")
        exact = float(bs_price(S, K, T, R, SIG, 1.0, 0.0))
        assert abs(float(p) - exact) < 5e-3

    @pytest.mark.slow
    def test_arith_asian_parity_with_scan(self):
        p, se, _ = pallas_exotic_price("asian_arith", S, K, T, R, SIG,
                                       n_paths=1, n_steps=N_STEPS,
                                       sampler="sobol_bb_hash")
        ps, ses = ex.asian_price(S, K, T, R, SIG, KEY, 1.0, 0.0, 200_000,
                                 N_STEPS, "arithmetic", return_stderr=True)
        assert abs(float(p) - float(ps)) < tol(se, ses)

    def test_replication_stderr_is_calibrated(self):
        """The quoted QMC error bar must track the TRUE seed-to-seed
        dispersion. The kernel runs 8 independently-scrambled Sobol
        replicates (one per row-group) and reports their replication
        stderr — the old sqrt(Var/n) formula was wrong in both
        directions under QMC (documented 'indicative only')."""
        cf = float(ex.geometric_asian_closed_form(S, K, T, R, SIG, 1.0, 0.0,
                                                  N_STEPS))
        prices, ses = [], []
        for seed in range(6):
            p, se, _ = pallas_exotic_price("asian_geo", S, K, T, R, SIG,
                                           n_paths=1, n_steps=N_STEPS,
                                           seed=seed,
                                           sampler="sobol_bb_hash")
            prices.append(float(p))
            ses.append(float(se))
        err = np.asarray(prices) - cf
        rms = float(np.sqrt(np.mean(err**2)))
        med_se = float(np.median(ses))
        # calibrated: the error bar within 3x of the realized dispersion
        # in EITHER direction (6-seed rms itself carries ~50% noise)
        assert 0.33 * rms < med_se < 3.0 * rms + 1e-6, (rms, ses)
        # and the estimator is unbiased at QMC scale
        assert abs(float(err.mean())) < 4.0 * med_se, (err, med_se)

    def test_replicates_are_independent_nets(self):
        """Different row-groups must see genuinely different scrambles:
        replicate means at one seed should scatter at QMC scale, not
        coincide (a shared scramble would collapse them)."""
        from optionslab_tpu.ops import exotic_pallas as ep

        pr, t = ep._base_params(S, K, T, R, SIG, 0.0, 0.0, N_STEPS)
        pay, pay2 = ep._launch(
            jnp.asarray([0, 0], jnp.int32), jnp.asarray(pr, jnp.float32),
            kind="asian_geo", n_steps=N_STEPS, n_blocks=1, cp=1.0,
            sampler="sobol_bb_hash")
        n = ep.PATHS_PER_BLOCK
        rep = np.asarray(pay).reshape(ep.ROWS // 8, 8, -1).sum(
            axis=(0, 2)) * (8.0 / n)
        assert len(np.unique(np.round(rep, 10))) == 8
        spread = rep.std(ddof=1)
        assert 1e-6 < spread < 0.05, rep

    def test_qmc_needs_two_steps(self):
        with pytest.raises(ValidationError):
            pallas_exotic_price("asian_arith", S, K, T, R, SIG, n_paths=1,
                                n_steps=1, sampler="sobol_bb_hash")

    def test_lr_greeks_reject_qmc(self):
        from optionslab_tpu.ops.exotic_pallas import pallas_exotic_lr_greeks

        with pytest.raises(ValidationError):
            pallas_exotic_lr_greeks("barrier_up-and-out", S, K, T, R, SIG,
                                    sampler="sobol_bb")
        with pytest.raises(ValidationError):
            pallas_exotic_greeks("asian_arith", S, K, T, R, SIG,
                                 sampler="sobol_bb")


class TestLRGreeks:
    """Likelihood-ratio Greeks: payoff-agnostic, so barriers/cliquets/
    autocalls get kernel-speed Greeks despite zero pathwise derivatives."""

    def test_far_barrier_equals_vanilla_bs_greeks(self):
        """An up-and-out with an unreachable barrier IS a European call —
        LR delta/gamma/vega/rho must match Black-Scholes closed form."""
        from optionslab_tpu.models.black_scholes import bs_greeks
        from optionslab_tpu.ops.exotic_pallas import pallas_exotic_lr_greeks

        out = pallas_exotic_lr_greeks("barrier_up-and-out", S, K, T, R, SIG,
                                      barrier=1e6, n_paths=4,
                                      n_steps=N_STEPS, sampler="hash")
        exbs = bs_greeks(S, K, T, R, SIG, 1.0, 0.0)
        assert abs(float(out["price"]) - float(exbs["price"])) < 0.08
        assert abs(float(out["delta"]) - float(exbs["delta"])) < 0.02
        assert abs(float(out["gamma"]) - float(exbs["gamma"])) < 0.01
        assert abs(float(out["vega"]) - float(exbs["vega"])) < 2.0
        assert abs(float(out["rho"]) - float(exbs["rho"])) < 2.0
        assert abs(float(out["theta"]) - float(exbs["theta"])) < 1.0

    def test_asian_lr_agrees_with_pathwise_kernel(self):
        """Two independent Greek methods on the SAME kernel paths."""
        from optionslab_tpu.ops.exotic_pallas import pallas_exotic_lr_greeks

        lr = pallas_exotic_lr_greeks("asian_arith", S, K, T, R, SIG,
                                     n_paths=4, n_steps=N_STEPS,
                                     sampler="hash")
        pw = pallas_exotic_greeks("asian_arith", S, K, T, R, SIG,
                                  n_paths=4 * 512 // 256, n_steps=N_STEPS,
                                  sampler="hash")
        assert abs(float(lr["delta"]) - float(pw["delta"])) < 0.03
        assert abs(float(lr["vega"]) - float(pw["vega"])) < 2.5
        assert abs(float(lr["rho"]) - float(pw["rho"])) < 2.5

    def test_live_barrier_delta_vs_crn_fd(self):
        """Knocked up-and-out: LR delta vs central same-seed FD with a
        bump wide enough to smooth the discontinuity."""
        from optionslab_tpu.ops.exotic_pallas import pallas_exotic_lr_greeks

        kw = dict(n_paths=4, n_steps=N_STEPS, sampler="hash", seed=0)
        barrier = 120.0
        out = pallas_exotic_lr_greeks("barrier_up-and-out", S, K, T, R, SIG,
                                      barrier=barrier, **kw)
        h = 1.0
        pu, _, _ = pallas_exotic_price("barrier_up-and-out", S + h, K, T, R,
                                       SIG, barrier=barrier, **kw)
        pd, _, _ = pallas_exotic_price("barrier_up-and-out", S - h, K, T, R,
                                       SIG, barrier=barrier, **kw)
        fd = (float(pu) - float(pd)) / (2 * h)
        assert abs(float(out["delta"]) - fd) < 0.05, (float(out["delta"]), fd)
        # knocked-out calls near the barrier have NEGATIVE vega
        assert float(out["vega"]) < 0.0
        # LR theta vs same-seed FD in maturity (fixed n_steps = the
        # discrete contract; the score_T identity realizes exactly that)
        ht = 0.02
        tu, _, _ = pallas_exotic_price("barrier_up-and-out", S, K, T + ht, R,
                                       SIG, barrier=barrier, **kw)
        td, _, _ = pallas_exotic_price("barrier_up-and-out", S, K, T - ht, R,
                                       SIG, barrier=barrier, **kw)
        fd_theta = -(float(tu) - float(td)) / (2 * ht)
        assert abs(float(out["theta"]) - fd_theta) < \
            0.1 * abs(fd_theta) + 0.3, (float(out["theta"]), fd_theta)

    def test_cliquet_lr_greeks(self):
        """The cliquet payoff references only RETURNS, so re-striking FD in
        spot is ~0 (scale invariance) while LR delta is the frozen-fixing
        hedge delta. Vol/rate never appear in the payoff explicitly, so
        CRN FD in sigma/r IS a valid oracle for LR vega/rho."""
        from optionslab_tpu.ops.exotic_pallas import (pallas_cliquet_lr_greeks,
                                                      pallas_cliquet_price)

        kw = dict(local_floor=-0.03, local_cap=0.03, n_periods=4, n_steps=8,
                  n_paths=4, sampler="hash", seed=0)
        out = pallas_cliquet_lr_greeks(S, T, R, SIG, **kw)
        assert float(out["price"]) == pytest.approx(
            float(pallas_cliquet_price(S, T, R, SIG, **kw)[0]))
        # re-struck FD total derivative = 0 by scale invariance
        pu, _, _ = pallas_cliquet_price(S + 1.0, T, R, SIG, **kw)
        pd, _, _ = pallas_cliquet_price(S - 1.0, T, R, SIG, **kw)
        assert abs(float(pu) - float(pd)) / 2.0 < 5e-3
        # LR vega / rho vs same-seed central FD
        h = 0.01
        vu, _, _ = pallas_cliquet_price(S, T, R, SIG + h, **kw)
        vd, _, _ = pallas_cliquet_price(S, T, R, SIG - h, **kw)
        fd_vega = (float(vu) - float(vd)) / (2 * h)
        assert abs(float(out["vega"]) - fd_vega) < 0.08 * abs(fd_vega) + 0.5
        ru, _, _ = pallas_cliquet_price(S, T, R + h, SIG, **kw)
        rd, _, _ = pallas_cliquet_price(S, T, R - h, SIG, **kw)
        fd_rho = (float(ru) - float(rd)) / (2 * h)
        assert abs(float(out["rho"]) - fd_rho) < 0.08 * abs(fd_rho) + 0.5
        # theta vs same-seed FD in maturity (fixed period count)
        ht = 0.02
        tu, _, _ = pallas_cliquet_price(S, T + ht, R, SIG, **kw)
        td, _, _ = pallas_cliquet_price(S, T - ht, R, SIG, **kw)
        fd_theta = -(float(tu) - float(td)) / (2 * ht)
        assert abs(float(out["theta"]) - fd_theta) < \
            0.1 * abs(fd_theta) + 0.5, (float(out["theta"]), fd_theta)

    def test_autocall_lr_greeks(self):
        """Autocall barriers/loss are spot-relative (frozen at inception):
        LR delta is the hedge delta with those frozen. Vega has a valid
        same-seed FD oracle (sigma enters only the path law)."""
        from optionslab_tpu.ops.exotic_pallas import (
            pallas_autocall_lr_greeks, pallas_autocall_price)

        kw = dict(n_obs=4, n_steps=8, n_paths=4, sampler="hash", seed=0)
        out = pallas_autocall_lr_greeks(S, T, R, SIG, **kw)
        h = 0.01
        vu, _, _ = pallas_autocall_price(S, T, R, SIG + h, **kw)
        vd, _, _ = pallas_autocall_price(S, T, R, SIG - h, **kw)
        fd_vega = (float(vu) - float(vd)) / (2 * h)
        assert abs(float(out["vega"]) - fd_vega) < 0.08 * abs(fd_vega) + 1.0
        # round-3: rho IS returned now — the in-kernel DR moment carries
        # the explicit coupon-discount derivative; oracle = same-seed FD
        ru, _, _ = pallas_autocall_price(S, T, R + h, SIG, **kw)
        rd, _, _ = pallas_autocall_price(S, T, R - h, SIG, **kw)
        fd_rho = (float(ru) - float(rd)) / (2 * h)
        assert abs(float(out["rho"]) - fd_rho) < 0.08 * abs(fd_rho) + 1.0, \
            (float(out["rho"]), fd_rho)
        # theta: DR moment also completes the discount T-dependence
        ht = 0.02
        tu, _, _ = pallas_autocall_price(S, T + ht, R, SIG, **kw)
        td, _, _ = pallas_autocall_price(S, T - ht, R, SIG, **kw)
        fd_theta = -(float(tu) - float(td)) / (2 * ht)
        assert abs(float(out["theta"]) - fd_theta) < \
            0.1 * abs(fd_theta) + 0.6, (float(out["theta"]), fd_theta)
        # long the note, short a down-and-in put => positive hedge delta
        assert float(out["delta"]) > 0.0
        # re-struck FD is ~0 (everything spot-relative): LR delta is NOT
        # the re-struck derivative
        pu, _, _ = pallas_autocall_price(S + 1.0, T, R, SIG, **kw)
        pd, _, _ = pallas_autocall_price(S - 1.0, T, R, SIG, **kw)
        assert abs(float(pu) - float(pd)) / 2.0 < 5e-3

    def test_structured_kinds_rejected_by_generic_wrapper(self):
        from optionslab_tpu.ops.exotic_pallas import pallas_exotic_lr_greeks

        with pytest.raises(ValidationError):
            pallas_exotic_lr_greeks("cliquet", S, K, T, R, SIG)
        with pytest.raises(ValidationError):
            pallas_exotic_lr_greeks("nope", S, K, T, R, SIG)


class TestDataclassEngines:
    def test_cliquet_engine_kwarg(self):
        o = ex.CliquetOption(S, T, R, SIG, n_periods=4, n_steps=8, n_paths=1,
                             engine="pallas")
        # dataclass routes to the kernel; sampler defaults to prng which the
        # interpreter stubs — only check it runs and returns a finite scalar
        # via the hash-sampler direct call above. Here: scan default works.
        o_scan = ex.CliquetOption(S, T, R, SIG, n_periods=4, n_steps=8,
                                  n_paths=10_000)
        assert np.isfinite(float(o_scan.price()))
        assert o.engine == "pallas"


class TestGeometricControlVariate:
    """Round-3: Kemna–Vorst geometric CV in-kernel — the difference
    payoff is integrated on-chip and the exact discrete geometric
    closed form is added back host-side."""

    def test_cv_unbiased_and_much_tighter(self):
        from optionslab_tpu.ops.exotic_pallas import pallas_exotic_price

        p_cv, se_cv, _ = pallas_exotic_price(
            "asian_arith", S, K, T, R, SIG, n_paths=1, n_steps=16,
            sampler="hash", control_variate=True)
        p_pl, se_pl, _ = pallas_exotic_price(
            "asian_arith", S, K, T, R, SIG, n_paths=1, n_steps=16,
            sampler="hash")
        assert abs(float(p_cv) - float(p_pl)) < \
            4 * float(np.hypot(se_cv, se_pl))
        # measured ratio ~24x at 16 steps; demand at least 8x
        assert float(se_cv) < float(se_pl) / 8.0

    def test_cv_put_and_scan_parity(self):
        from optionslab_tpu.ops.exotic_pallas import pallas_exotic_price

        p_cv, se_cv, _ = pallas_exotic_price(
            "asian_arith", S, K, T, R, SIG, cp=-1.0, n_paths=1, n_steps=16,
            sampler="hash", control_variate=True)
        scan = float(ex.asian_price(S, K, T, R, SIG, jax.random.PRNGKey(9),
                                    cp=-1.0, n_paths=200_000, n_steps=16))
        assert abs(float(p_cv) - scan) < 4e-2  # scan-engine MC noise scale

    def test_cv_validation(self):
        from optionslab_tpu.ops.exotic_pallas import (pallas_exotic_lr_greeks,
                                                      pallas_exotic_price)

        with pytest.raises(ValidationError):
            pallas_exotic_price("asian_geo", S, K, T, R, SIG, n_paths=1,
                                control_variate=True)
        with pytest.raises(ValidationError):
            pallas_exotic_lr_greeks("asian_arith_cv", S, K, T, R, SIG,
                                    n_paths=1)


class TestTouchKinds:
    """Digital barriers (one-touch / no-touch, cash at expiry).

    Oracles: the EXACT complement identity one + no = df on the same
    seed; the reflection-principle closed form with the
    Broadie-Glasserman-Kou discrete-monitoring correction; boundary
    cases (barrier at spot / unreachable); LR delta vs CRN-FD."""

    @staticmethod
    def _touch_cf(spot, barrier, maturity, rate, vol, up=True):
        """Continuous-monitoring P(hit) * df (cash at expiry)."""
        from scipy.stats import norm

        b = np.log(barrier / spot)
        mu = rate - 0.5 * vol * vol
        sq = vol * np.sqrt(maturity)
        if up:
            p = (norm.cdf((-b + mu * maturity) / sq)
                 + np.exp(2.0 * mu * b / vol**2)
                 * norm.cdf((-b - mu * maturity) / sq))
        else:
            p = (norm.cdf((b - mu * maturity) / sq)
                 + np.exp(2.0 * mu * b / vol**2)
                 * norm.cdf((b + mu * maturity) / sq))
        return np.exp(-rate * maturity) * p

    def test_complement_identity_exact(self):
        for kind_up, kind_no, barrier in [("one_touch_up", "no_touch_up", 115.0),
                                          ("one_touch_down", "no_touch_down", 90.0)]:
            p1, _, _ = pallas_exotic_price(kind_up, S, K, T, R, SIG,
                                           barrier=barrier, n_paths=1,
                                           n_steps=N_STEPS, sampler="hash")
            p0, _, _ = pallas_exotic_price(kind_no, S, K, T, R, SIG,
                                           barrier=barrier, n_paths=1,
                                           n_steps=N_STEPS, sampler="hash")
            df = np.exp(-R * T)
            assert abs(float(p1) + float(p0) - df) < 1e-6

    @pytest.mark.parametrize("up,barrier", [(True, 115.0), (False, 87.0)])
    def test_closed_form_with_bgk_correction(self, up, barrier):
        n_steps = 32
        kind = "one_touch_up" if up else "one_touch_down"
        p, se, _ = pallas_exotic_price(kind, S, K, T, R, SIG,
                                       barrier=barrier, n_paths=1,
                                       n_steps=n_steps, sampler="hash")
        beta = 0.5826
        shift = np.exp((beta if up else -beta) * SIG * np.sqrt(T / n_steps))
        cf = self._touch_cf(S, barrier * shift, T, R, SIG, up)
        assert abs(float(p) - cf) < 5 * float(se) + 0.012, (float(p), cf)

    def test_boundary_cases(self):
        # barrier at spot: hit at t=0 -> one-touch pays df with certainty
        p, _, _ = pallas_exotic_price("one_touch_up", S, K, T, R, SIG,
                                      barrier=S, n_paths=1, n_steps=4,
                                      sampler="hash")
        assert abs(float(p) - np.exp(-R * T)) < 1e-6
        # unreachable barrier
        p, _, _ = pallas_exotic_price("one_touch_up", S, K, T, R, SIG,
                                      barrier=400.0, n_paths=1, n_steps=4,
                                      sampler="hash")
        assert float(p) < 1e-5

    def test_monotone_in_barrier(self):
        ps = [float(pallas_exotic_price("one_touch_up", S, K, T, R, SIG,
                                        barrier=b, n_paths=1, n_steps=8,
                                        sampler="hash")[0])
              for b in (105.0, 115.0, 130.0)]
        assert ps[0] > ps[1] > ps[2]

    def test_lr_delta_matches_crn_fd(self):
        from optionslab_tpu.ops.exotic_pallas import pallas_exotic_lr_greeks

        kw = dict(barrier=115.0, n_paths=1, n_steps=8, seed=3,
                  sampler="hash")
        g = pallas_exotic_lr_greeks("one_touch_up", S, K, T, R, SIG, **kw)
        h = 0.5
        up, _, _ = pallas_exotic_price("one_touch_up", S + h, K, T, R, SIG,
                                       **kw)
        dn, _, _ = pallas_exotic_price("one_touch_up", S - h, K, T, R, SIG,
                                       **kw)
        fd = (float(up) - float(dn)) / (2 * h)
        # CRN FD of the hit indicator is itself noisy at O(flip fraction);
        # bound by the combined scale of both estimators at one block
        assert abs(float(g["delta"]) - fd) < 5e-3, (float(g["delta"]), fd)


class TestRangeAccrual:
    """Corridor note: one of the rare exactly-priceable path-dependent
    payoffs (sum of digital pairs) — closed form is the oracle for the
    kernel, the scan engine AND the full LR ladder (via AD)."""
    S, L, U, T, R, V = 100.0, 90.0, 110.0, 1.0, 0.05, 0.2

    def _cf(self, s=None, r=None, v=None, t=None):
        from optionslab_tpu.models.exotics import range_accrual_closed_form
        return range_accrual_closed_form(
            self.S if s is None else s, self.L, self.U,
            self.T if t is None else t, self.R if r is None else r,
            self.V if v is None else v, n_steps=16)

    def test_kernel_and_scan_match_closed_form(self):
        from optionslab_tpu.models.exotics import range_accrual_price
        from optionslab_tpu.ops.exotic_pallas import (
            pallas_range_accrual_price)
        cf = float(self._cf())
        ps, ss = range_accrual_price(self.S, self.L, self.U, self.T, self.R,
                                     self.V, jax.random.PRNGKey(0),
                                     n_paths=100_000, n_steps=16,
                                     return_stderr=True)
        pk, sk, _ = pallas_range_accrual_price(
            self.S, self.L, self.U, self.T, self.R, self.V,
            n_paths=100_000, n_steps=16, sampler="hash")
        assert abs(float(ps) - cf) < 4 * float(ss)
        assert abs(float(pk) - cf) < 4 * float(sk)

    def test_lr_ladder_vs_ad_of_closed_form(self):
        from optionslab_tpu.ops.exotic_pallas import (
            pallas_range_accrual_lr_greeks)
        g = pallas_range_accrual_lr_greeks(
            self.S, self.L, self.U, self.T, self.R, self.V,
            n_paths=500_000, n_steps=16, sampler="hash")
        d = jax.grad(lambda s: self._cf(s=s))(self.S)
        ve = jax.grad(lambda v: self._cf(v=v))(self.V)
        rh = jax.grad(lambda r: self._cf(r=r))(self.R)
        th = -jax.grad(lambda t: self._cf(t=t))(self.T)
        ga = jax.grad(jax.grad(lambda s: self._cf(s=s)))(self.S)
        assert abs(g["delta"] - float(d)) < 0.03
        assert abs(g["gamma"] - float(ga)) < 0.01
        assert abs(g["vega"] - float(ve)) < 0.05 * abs(float(ve)) + 0.5
        assert abs(g["rho"] - float(rh)) < 0.05 * abs(float(rh)) + 0.5
        assert abs(g["theta"] - float(th)) < 0.08 * abs(float(th)) + 0.5

    def test_degenerate_corridors(self):
        from optionslab_tpu.ops.exotic_pallas import (
            pallas_range_accrual_price)
        from optionslab_tpu.utils.exceptions import ValidationError
        # all-encompassing corridor accrues every step: price == df * N
        p, _, _ = pallas_range_accrual_price(
            self.S, 1e-6, 1e9, self.T, self.R, self.V, n_paths=1,
            n_steps=8, sampler="hash")
        assert float(p) == pytest.approx(100.0 * np.exp(-0.05), rel=1e-5)
        with pytest.raises(ValidationError):
            pallas_range_accrual_price(self.S, 110.0, 90.0, self.T, self.R,
                                       self.V)


class TestContractBooks:
    """Round-5 contract-book launches: N same-kind contracts (mixed
    strikes/barriers) interleave the row axis of ONE kernel launch —
    reference analog ``MonteCarloPricerUni.price_batch``
    (``src/pricing_models/monte_carlo_unified.py:562``)."""

    STRIKES = [90.0, 100.0, 110.0]

    def test_asian_book_matches_singles(self):
        from optionslab_tpu.ops.exotic_pallas import pallas_exotic_book_price

        bp, bse, _ = pallas_exotic_book_price(
            "asian_arith", S, self.STRIKES, T, R, SIG, n_paths=60_000,
            n_steps=N_STEPS, sampler="hash", seed=3)
        for i, k in enumerate(self.STRIKES):
            sp, sse, _ = pallas_exotic_price(
                "asian_arith", S, k, T, R, SIG, n_paths=1,
                n_steps=N_STEPS, sampler="hash", seed=11)
            assert abs(float(bp[i]) - float(sp)) < tol(bse[i], sse), k
        # strike monotonicity inside one launch
        assert float(bp[0]) > float(bp[1]) > float(bp[2])

    def test_barrier_book_mixed_levels(self):
        from optionslab_tpu.ops.exotic_pallas import pallas_exotic_book_price

        ks, bs = [95.0, 105.0], [120.0, 130.0]
        bp, bse, _ = pallas_exotic_book_price(
            "barrier_up-and-out", S, ks, T, R, SIG, barriers=bs,
            n_paths=60_000, n_steps=N_STEPS, sampler="hash", seed=5)
        for i, (k, b) in enumerate(zip(ks, bs)):
            sp, sse, _ = pallas_exotic_price(
                "barrier_up-and-out", S, k, T, R, SIG, barrier=b,
                n_paths=1, n_steps=N_STEPS, sampler="hash", seed=12)
            assert abs(float(bp[i]) - float(sp)) < tol(bse[i], sse), (k, b)

    def test_single_contract_book_equals_scalar_path(self):
        from optionslab_tpu.ops.exotic_pallas import pallas_exotic_book_price

        bp, bse, nb = pallas_exotic_book_price(
            "asian_arith", S, [K], T, R, SIG, n_paths=1,
            n_steps=N_STEPS, sampler="hash", seed=9)
        sp, sse, ns = pallas_exotic_price(
            "asian_arith", S, K, T, R, SIG, n_paths=1, n_steps=N_STEPS,
            sampler="hash", seed=9)
        assert nb == ns
        np.testing.assert_allclose(float(bp[0]), float(sp), rtol=1e-6)
        np.testing.assert_allclose(float(bse[0]), float(sse), rtol=1e-5)

    def test_single_contract_double_book_carries_band(self):
        """Regression: nc_pad == 1 books take the kernel's SCALAR path
        (book operand dropped) — the double band must ride the param
        vector or the contract silently prices as immediately knocked."""
        from optionslab_tpu.ops.exotic_pallas import pallas_exotic_book_price

        bp, bse, nb = pallas_exotic_book_price(
            "barrier_double-out", S, [K], T, R, SIG, lowers=[80.0],
            uppers=[125.0], n_paths=1, n_steps=N_STEPS, sampler="hash",
            seed=21)
        sp, sse, ns = pallas_exotic_price(
            "barrier_double-out", S, K, T, R, SIG, lower=80.0, upper=125.0,
            n_paths=1, n_steps=N_STEPS, sampler="hash", seed=21)
        assert nb == ns
        assert float(sp) > 0.0  # a priced corridor, not a knocked one
        np.testing.assert_allclose(float(bp[0]), float(sp), rtol=1e-6)
        np.testing.assert_allclose(float(bse[0]), float(sse), rtol=1e-5)

    def test_single_contract_double_book_lr_carries_band(self):
        from optionslab_tpu.ops.exotic_pallas import (
            pallas_exotic_book_lr_greeks, pallas_exotic_lr_greeks)

        g = pallas_exotic_book_lr_greeks(
            "barrier_double-out", S, [K], T, R, SIG, lowers=[80.0],
            uppers=[125.0], n_paths=1, n_steps=N_STEPS, sampler="hash",
            seed=23)
        gs = pallas_exotic_lr_greeks(
            "barrier_double-out", S, K, T, R, SIG, lower=80.0, upper=125.0,
            n_paths=1, n_steps=N_STEPS, sampler="hash", seed=23)
        assert float(gs["price"]) > 0.0
        for key in ("price", "delta", "gamma", "vega", "rho", "theta"):
            np.testing.assert_allclose(float(g[key][0]), float(gs[key]),
                                       rtol=2e-5, atol=1e-7, err_msg=key)

    def test_lr_book_ladder(self):
        from optionslab_tpu.ops.exotic_pallas import (
            pallas_exotic_book_lr_greeks, pallas_exotic_lr_greeks)

        g = pallas_exotic_book_lr_greeks(
            "asian_arith", S, self.STRIKES, T, R, SIG, n_paths=60_000,
            n_steps=N_STEPS, sampler="hash", seed=7)
        gs = pallas_exotic_lr_greeks(
            "asian_arith", S, K, T, R, SIG, n_paths=260_000,
            n_steps=N_STEPS, sampler="hash", seed=13)
        assert abs(float(g["delta"][1]) - float(gs["delta"])) < 0.08
        # deltas decrease in strike inside one launch
        d = np.asarray(g["delta"])
        assert d[0] > d[1] > d[2]
        assert np.all(np.asarray(g["std_error"]) > 0.0)

    def test_book_validation(self):
        from optionslab_tpu.ops.exotic_pallas import pallas_exotic_book_price

        with pytest.raises(ValidationError):  # structured kind
            pallas_exotic_book_price("autocall", S, [100.0], T, R, SIG)
        with pytest.raises(ValidationError):  # QMC rides the row axis
            pallas_exotic_book_price("asian_arith", S, [100.0], T, R, SIG,
                                     sampler="sobol_bb_hash")
        with pytest.raises(ValidationError):  # missing barrier levels
            pallas_exotic_book_price("barrier_up-and-out", S,
                                     [95.0, 105.0], T, R, SIG)
        with pytest.raises(ValidationError):  # length mismatch
            pallas_exotic_book_price("barrier_up-and-out", S,
                                     [95.0, 105.0], T, R, SIG,
                                     barriers=[120.0])
        with pytest.raises(ValidationError):  # empty book
            pallas_exotic_book_price("asian_arith", S, [], T, R, SIG)
