"""Rough Bergomi: exact Volterra law, BS limit, forward-variance
martingale, and the rough ATM-skew power law. Beyond the reference."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from optionslab_tpu.models.black_scholes import bs_price
from optionslab_tpu.models.rbergomi import (RBergomiParams, _volterra_chol,
                                            rbergomi_price,
                                            rbergomi_smile_iv,
                                            rbergomi_variance_grid)
from optionslab_tpu.utils.exceptions import ValidationError


class TestVolterraLaw:
    @pytest.mark.slow
    def test_variance_of_volterra_is_t2h(self):
        n, h = 128, 0.1
        L = jnp.asarray(_volterra_chol(n, h, 1.0))
        z = jax.random.normal(jax.random.PRNGKey(1), (200_000, 2 * n),
                              jnp.float32)
        vw = z @ L.T
        tg = np.linspace(1.0 / n, 1.0, n)
        var = np.asarray(vw[:, :n].var(axis=0))
        assert np.abs(var / tg ** (2 * h) - 1.0).max() < 0.03

    def test_brownian_block_is_brownian(self):
        n = 64
        L = jnp.asarray(_volterra_chol(n, 0.2, 1.0))
        z = jax.random.normal(jax.random.PRNGKey(2), (100_000, 2 * n),
                              jnp.float32)
        w = np.asarray((z @ L.T)[:, n:])
        tg = np.linspace(1.0 / n, 1.0, n)
        assert np.abs(w.var(axis=0) / tg - 1.0).max() < 0.05

    @pytest.mark.slow
    def test_forward_variance_is_martingale(self):
        # E[v_t] = xi0 for every t by lognormal construction
        p = RBergomiParams(hurst=0.1, eta=1.9, rho=-0.9, xi0=0.04)
        n = 128
        L = jnp.asarray(_volterra_chol(n, p.hurst, 1.0))
        z = jax.random.normal(jax.random.PRNGKey(3), (250_000, 2 * n),
                              jnp.float32)
        z = jnp.concatenate([z, -z], axis=0)
        vt = (z @ L.T)[:, :n]
        tg = jnp.linspace(1.0 / n, 1.0, n)
        v = rbergomi_variance_grid(p, vt, tg[None, :])
        assert np.abs(np.asarray(v.mean(axis=0)) / p.xi0 - 1.0).max() < 0.04


class TestPricing:
    def test_eta_zero_is_black_scholes(self):
        p = RBergomiParams(hurst=0.1, eta=1e-6, rho=-0.9, xi0=0.04)
        ks = np.array([90.0, 100.0, 110.0])
        pr, se = rbergomi_price(100.0, ks, 1.0, 0.05, p,
                                jax.random.PRNGKey(0), n_paths=100_000,
                                n_steps=128)
        bsv = np.asarray(bs_price(100.0, ks, 1.0, 0.05, 0.2, 1.0))
        assert np.all(np.abs(np.asarray(pr) - bsv) < 3 * np.asarray(se) + 0.01)

    @pytest.mark.slow
    def test_martingale_forward(self):
        # deep-ITM call ~ forward parity: C - P = S - K e^{-rT}
        p = RBergomiParams(hurst=0.15, eta=1.5, rho=-0.7, xi0=0.04)
        c, _ = rbergomi_price(100.0, np.array([100.0]), 1.0, 0.05, p,
                              jax.random.PRNGKey(4), n_paths=200_000,
                              n_steps=128)
        q, _ = rbergomi_price(100.0, np.array([100.0]), 1.0, 0.05, p,
                              jax.random.PRNGKey(4), n_paths=200_000,
                              n_steps=128, option_type="put")
        lhs = float(c[0]) - float(q[0])
        rhs = 100.0 - 100.0 * np.exp(-0.05)
        assert abs(lhs - rhs) < 0.05

    @pytest.mark.slow
    def test_rough_skew_power_law(self):
        # psi(tau) ~ tau^{H - 1/2}: ratio of ATM skews at tau = 0.25 vs 1.0
        # should be ~ 4^{1/2 - H}
        p = RBergomiParams(hurst=0.1, eta=1.9, rho=-0.9, xi0=0.0552)
        ks = np.array([-0.03, 0.03])
        skew = {}
        for t in (0.25, 1.0):
            iv = rbergomi_smile_iv(ks, t, p, jax.random.PRNGKey(7),
                                   n_paths=200_000, n_steps=128)
            skew[t] = (iv[1] - iv[0]) / 0.06
        assert skew[0.25] < skew[1.0] < 0  # negative, steeper short-dated
        ratio = skew[0.25] / skew[1.0]
        predicted = 4.0 ** (0.5 - p.hurst)
        assert abs(ratio / predicted - 1.0) < 0.15

    @pytest.mark.slow
    def test_smile_is_negatively_skewed(self):
        p = RBergomiParams(hurst=0.1, eta=1.9, rho=-0.9, xi0=0.04)
        iv = rbergomi_smile_iv(np.array([-0.1, 0.0, 0.1]), 0.5, p,
                               jax.random.PRNGKey(8), n_paths=100_000,
                               n_steps=128)
        assert iv[0] > iv[1] > iv[2]


class TestValidation:
    def test_bad_hurst_raises(self):
        with pytest.raises(ValidationError):
            rbergomi_price(100.0, 100.0, 1.0, 0.05,
                           RBergomiParams(hurst=0.8),
                           jax.random.PRNGKey(0), n_paths=1000, n_steps=16)

    def test_odd_paths_raise(self):
        with pytest.raises(ValidationError):
            rbergomi_price(100.0, 100.0, 1.0, 0.05, RBergomiParams(),
                           jax.random.PRNGKey(0), n_paths=1001, n_steps=16)


class TestGreeks:
    """Pathwise-AD Greeks: BS limit is exact; rough parameters match CRN
    finite differences of rbergomi_price on the same key."""

    def test_eta_zero_limit_matches_bs_greeks(self):
        from optionslab_tpu.models.black_scholes import bs_greeks
        from optionslab_tpu.models.rbergomi import rbergomi_greeks

        p = RBergomiParams(hurst=0.1, eta=1e-6, rho=-0.5, xi0=0.04)
        g = rbergomi_greeks(100.0, 100.0, 1.0, 0.05, p,
                            jax.random.PRNGKey(0), n_paths=100_000,
                            n_steps=64)
        bs = bs_greeks(100.0, 100.0, 1.0, 0.05, 0.2, 1.0, 0.0)
        assert abs(g["delta"] - float(bs["delta"])) < 0.01
        assert abs(g["gamma"] - float(bs["gamma"])) < 0.003
        assert abs(g["vega"] - float(bs["vega"])) < 1.5
        assert abs(g["rho_rate"] - float(bs["rho"])) < 1.0
        # spot/vol correlation is inert when vol is deterministic; the
        # PATHWISE functional still depends on rho (which Brownian drives
        # the spot), so the AD estimate is pure MC noise around zero
        assert abs(g["corr_sens"]) < 0.25

    @pytest.mark.slow
    def test_rough_greeks_match_crn_fd(self):
        from optionslab_tpu.models.rbergomi import rbergomi_greeks

        p = RBergomiParams(hurst=0.12, eta=1.5, rho=-0.7, xi0=0.05)
        key = jax.random.PRNGKey(5)
        kw = dict(n_paths=150_000, n_steps=64)
        g = rbergomi_greeks(100.0, 100.0, 1.0, 0.05, p, key, **kw)

        def price_at(**over):
            pp = RBergomiParams(hurst=p.hurst, eta=over.get("eta", p.eta),
                                rho=over.get("rho", p.rho),
                                xi0=over.get("xi0", p.xi0))
            pr, _ = rbergomi_price(over.get("spot", 100.0),
                                   np.array([100.0]), 1.0,
                                   over.get("rate", 0.05), pp, key, **kw)
            return float(pr[0])

        h = 1e-3
        fd = {
            "delta": (price_at(spot=100.0 * (1 + h)) - price_at(spot=100.0 * (1 - h))) / (200.0 * h),
            "vega_xi0": (price_at(xi0=p.xi0 * (1 + h)) - price_at(xi0=p.xi0 * (1 - h))) / (2 * p.xi0 * h),
            "vega_eta": (price_at(eta=p.eta * (1 + h)) - price_at(eta=p.eta * (1 - h))) / (2 * p.eta * h),
            "corr_sens": (price_at(rho=p.rho + h) - price_at(rho=p.rho - h)) / (2 * h),
            "rho_rate": (price_at(rate=0.05 + h) - price_at(rate=0.05 - h)) / (2 * h),
        }
        for name, v in fd.items():
            tol = max(0.02 * abs(v), 0.05)
            assert abs(g[name] - v) < tol, (name, g[name], v)


class TestForwardVarianceCurve:
    """xi0(t) term structure: exact BS limit at eta -> 0 with the
    time-averaged variance, flat-curve equivalence, variance-swap
    bootstrap identities."""

    def test_flat_curve_equals_flat_params(self):
        p = RBergomiParams(hurst=0.12, eta=1.5, rho=-0.7, xi0=0.05)
        k = jax.random.PRNGKey(3)
        a, _ = rbergomi_price(100.0, np.array([100.0]), 1.0, 0.05, p, k,
                              n_paths=50_000, n_steps=64)
        b, _ = rbergomi_price(100.0, np.array([100.0]), 1.0, 0.05, p, k,
                              n_paths=50_000, n_steps=64,
                              xi_curve=lambda t: 0.05)
        assert abs(float(a[0]) - float(b[0])) < 1e-5

    def test_eta_zero_curve_is_bs_at_average_variance(self):
        # xi0(t) = 0.02 + 0.04 t: int_0^1 xi0 = 0.04 => sigma_eff = 0.2
        p = RBergomiParams(hurst=0.1, eta=1e-6, rho=-0.5, xi0=0.99)
        pr, se = rbergomi_price(100.0, np.array([90.0, 100.0, 110.0]), 1.0,
                                0.05, p, jax.random.PRNGKey(4),
                                n_paths=100_000, n_steps=128,
                                xi_curve=lambda t: 0.02 + 0.04 * t)
        # left-point sampling of an increasing curve underestimates the
        # integral by ~ 0.04*dt/2; fold that into the tolerance
        bsv = np.asarray(bs_price(100.0, np.array([90.0, 100.0, 110.0]),
                                  1.0, 0.05, 0.2, 1.0))
        assert np.all(np.abs(np.asarray(pr) - bsv)
                      < 3 * np.asarray(se) + 0.03)

    def test_variance_swap_bootstrap(self):
        from optionslab_tpu.models import xi_curve_from_variance_swaps

        # quotes generated from a known piecewise forward variance
        t = np.array([0.25, 0.5, 1.0, 2.0])
        fwd_true = np.array([0.03, 0.045, 0.05, 0.06])
        tot = np.cumsum(fwd_true * np.diff(t, prepend=0.0))
        xi = xi_curve_from_variance_swaps(t, tot / t)
        # recovered forward variance is exact inside each bucket
        for tq, want in [(0.1, 0.03), (0.25, 0.03), (0.3, 0.045),
                         (0.7, 0.05), (1.5, 0.06), (5.0, 0.06)]:
            assert abs(float(xi(tq)) - want) < 1e-12, (tq, float(xi(tq)))

    def test_variance_swap_reprice_through_mc(self):
        # E[(1/T) int v dt] under the curve == the input strike
        from optionslab_tpu.models import xi_curve_from_variance_swaps
        from optionslab_tpu.models.rbergomi import (_terminal_spots,
                                                    _volterra_chol)

        t = np.array([0.5, 1.0])
        k_var = np.array([0.04, 0.0475])   # fwd: 0.04 then 0.055
        xi = xi_curve_from_variance_swaps(t, k_var)
        n = 64
        tq = np.linspace(0.0, 1.0, n, endpoint=False)
        xi_left = np.asarray(xi(tq), np.float32)
        # E[v_left(t)] = xi(t) martingale => mean total variance = K T
        p = RBergomiParams(hurst=0.1, eta=1.9, rho=-0.9, xi0=1.0)
        L = jnp.asarray(_volterra_chol(n, p.hurst, 1.0))
        z = jax.random.normal(jax.random.PRNGKey(9), (100_000, 2 * n),
                              jnp.float32)
        z = jnp.concatenate([z, -z], axis=0)
        vt = (z @ L.T)[:, :n]
        tg = jnp.linspace(1.0 / n, 1.0, n)
        expf = jnp.exp(p.eta * vt - 0.5 * p.eta**2
                       * tg[None, :] ** (2 * p.hurst))
        expf_left = jnp.concatenate(
            [jnp.ones((expf.shape[0], 1), jnp.float32), expf[:, :-1]], 1)
        v_left = xi_left[None, :] * expf_left
        realized = float(jnp.mean(jnp.mean(v_left, axis=1)))
        assert abs(realized - k_var[1]) < 0.0015

    def test_bad_curves_raise(self):
        from optionslab_tpu.models import xi_curve_from_variance_swaps

        p = RBergomiParams()
        with pytest.raises(ValidationError):
            rbergomi_price(100.0, 100.0, 1.0, 0.05, p, jax.random.PRNGKey(0),
                           n_paths=1000, n_steps=16,
                           xi_curve=np.full(8, 0.04))      # wrong length
        with pytest.raises(ValidationError):
            rbergomi_price(100.0, 100.0, 1.0, 0.05, p, jax.random.PRNGKey(0),
                           n_paths=1000, n_steps=16,
                           xi_curve=lambda t: -0.01)        # negative
        with pytest.raises(ValidationError):
            # decreasing K_var T  => negative forward variance
            xi_curve_from_variance_swaps([0.5, 1.0], [0.08, 0.03])


class TestRBergomiExotics:
    """Path-dependent payoffs under the exact Volterra law."""

    def test_eta_zero_matches_gbm_engines(self):
        """eta -> 0: flat variance xi0, the exact construction collapses
        to GBM(sigma = sqrt(xi0)) — Asian and barrier must match the GBM
        scan engines statistically."""
        from optionslab_tpu.models.exotics import asian_price, barrier_price
        from optionslab_tpu.models.rbergomi import (RBergomiParams,
                                                    rbergomi_exotic_price)
        par = RBergomiParams(hurst=0.1, eta=0.0, rho=-0.9, xi0=0.04)
        key = jax.random.PRNGKey(3)
        pr, sr = rbergomi_exotic_price("asian_arith", 100.0, 100.0, 1.0,
                                       0.05, par, key, n_paths=60_000,
                                       n_steps=16, return_stderr=True)
        pg, sg = asian_price(100.0, 100.0, 1.0, 0.05, 0.2,
                             jax.random.PRNGKey(4), n_paths=60_000,
                             n_steps=16, return_stderr=True)
        assert abs(float(pr) - float(pg)) < 5 * float(jnp.sqrt(sr**2 + sg**2))
        pb, sb = rbergomi_exotic_price("barrier_up-and-out", 100.0, 100.0,
                                       1.0, 0.05, par, key, barrier=120.0,
                                       n_paths=60_000, n_steps=16,
                                       return_stderr=True)
        pgb, sgb = barrier_price(100.0, 100.0, 120.0, 1.0, 0.05, 0.2,
                                 jax.random.PRNGKey(5), n_paths=60_000,
                                 n_steps=16, return_stderr=True)
        assert abs(float(pb) - float(pgb)) < 5 * float(jnp.sqrt(sb**2 + sgb**2))

    def test_touch_complement_and_terminal_consistency(self):
        """one_touch + no_touch == df exactly on shared paths; far-barrier
        up-and-out == the European pricer on the same path law."""
        from optionslab_tpu.models.rbergomi import (RBergomiParams,
                                                    rbergomi_exotic_price,
                                                    rbergomi_price)
        import numpy as np
        par = RBergomiParams()
        key = jax.random.PRNGKey(7)
        one = rbergomi_exotic_price("one_touch_up", 100.0, 0.0, 1.0, 0.05,
                                    par, key, barrier=115.0,
                                    n_paths=40_000, n_steps=32)
        no = rbergomi_exotic_price("no_touch_up", 100.0, 0.0, 1.0, 0.05,
                                   par, key, barrier=115.0,
                                   n_paths=40_000, n_steps=32)
        np.testing.assert_allclose(float(one) + float(no), np.exp(-0.05),
                                   rtol=1e-6)
        pv, sv = rbergomi_exotic_price("barrier_up-and-out", 100.0, 100.0,
                                       1.0, 0.05, par, key, barrier=1e6,
                                       n_paths=40_000, n_steps=32,
                                       return_stderr=True)
        pe, se = rbergomi_price(100.0, 100.0, 1.0, 0.05, par,
                                jax.random.PRNGKey(8), n_paths=40_000,
                                n_steps=32)
        assert abs(float(pv) - float(pe[0])) < 5 * float(
            jnp.sqrt(sv**2 + se[0]**2))

    def test_rough_skew_prices_down_touch_above_gbm(self):
        """Rough vol with rho=-0.9 fattens the lower tail vs flat-vol GBM
        at matched total variance — a one-touch-down must cost more."""
        from optionslab_tpu.models.exotics import barrier_price
        from optionslab_tpu.models.rbergomi import (RBergomiParams,
                                                    rbergomi_exotic_price)
        par = RBergomiParams(hurst=0.1, eta=1.9, rho=-0.9, xi0=0.04)
        pr = rbergomi_exotic_price("one_touch_down", 100.0, 0.0, 0.5, 0.0,
                                   par, jax.random.PRNGKey(9), barrier=80.0,
                                   n_paths=60_000, n_steps=64)
        # GBM comparator at the same total variance (sigma = sqrt(xi0))
        from optionslab_tpu.models.heston_exotics import heston_exotic_price
        from optionslab_tpu.models.heston import HestonParams
        lim = HestonParams.make(0.04, 2.0, 0.04, 1e-7, 0.0)
        pg = heston_exotic_price("one_touch_down", 100.0, 0.0, 0.5, 0.0,
                                 lim, jax.random.PRNGKey(10), barrier=80.0,
                                 n_paths=60_000, n_steps=64)
        assert float(pr) > float(pg)

    def test_validation(self):
        from optionslab_tpu.models.rbergomi import (RBergomiParams,
                                                    rbergomi_exotic_price)
        from optionslab_tpu.utils.exceptions import ValidationError
        with pytest.raises(ValidationError):
            rbergomi_exotic_price("nope", 100.0, 100.0, 1.0, 0.05,
                                  RBergomiParams(), jax.random.PRNGKey(0))
        with pytest.raises(ValidationError):
            rbergomi_exotic_price("asian_arith", 100.0, 100.0, 1.0, 0.05,
                                  RBergomiParams(), jax.random.PRNGKey(0),
                                  n_paths=12345)


class TestRBergomiStructured:
    """Cliquet / autocallable under rough volatility."""

    def test_cliquet_degenerate_collar_is_exact(self):
        """local_floor == local_cap pins every period return: the payoff
        is deterministic, price = df * notional * n_periods * c exactly."""
        from optionslab_tpu.models.rbergomi import (RBergomiParams,
                                                    rbergomi_cliquet_price)
        p = rbergomi_cliquet_price(100.0, 1.0, 0.05, RBergomiParams(),
                                   jax.random.PRNGKey(0), local_floor=0.03,
                                   local_cap=0.03, n_periods=4,
                                   n_paths=2_000, n_steps=16)
        np.testing.assert_allclose(float(p),
                                   np.exp(-0.05) * 100.0 * 4 * 0.03,
                                   rtol=1e-6)

    def test_autocall_degenerate_limits_are_exact(self):
        """autocall barrier 0 => certain call at the first observation
        (par + one coupon, discounted at t_1); unreachable barriers with
        ki = 0 => a riskless zero-coupon note at par."""
        from optionslab_tpu.models.rbergomi import (RBergomiParams,
                                                    rbergomi_autocall_price)
        par = RBergomiParams()
        key = jax.random.PRNGKey(1)
        p1 = rbergomi_autocall_price(100.0, 1.0, 0.05, par, key,
                                     autocall_barrier=0.0,
                                     coupon_barrier=0.0, coupon_rate=0.08,
                                     n_obs=4, n_paths=2_000, n_steps=16)
        t1 = 1.0 / 4
        np.testing.assert_allclose(
            float(p1), np.exp(-0.05 * t1) * 100.0 * (1.0 + 0.08 / 4),
            rtol=1e-6)
        p2 = rbergomi_autocall_price(100.0, 1.0, 0.05, par, key,
                                     autocall_barrier=1e9,
                                     coupon_barrier=1e9, ki_barrier=0.0,
                                     n_obs=4, n_paths=2_000, n_steps=16)
        np.testing.assert_allclose(float(p2), np.exp(-0.05) * 100.0,
                                   rtol=1e-6)

    def test_eta_zero_matches_gbm_engines(self):
        """eta -> 0 collapses to GBM(sigma = sqrt(xi0)); both engines
        sample the exact lognormal at the fixing dates."""
        from optionslab_tpu.models.exotics import (autocallable_price,
                                                   cliquet_price)
        from optionslab_tpu.models.rbergomi import (RBergomiParams,
                                                    rbergomi_autocall_price,
                                                    rbergomi_cliquet_price)
        par = RBergomiParams(hurst=0.1, eta=0.0, rho=-0.9, xi0=0.04)
        pr, sr = rbergomi_cliquet_price(100.0, 1.0, 0.03, par,
                                        jax.random.PRNGKey(2), n_periods=8,
                                        n_paths=60_000, n_steps=48,
                                        return_stderr=True)
        pg, sg = cliquet_price(100.0, 1.0, 0.03, 0.2, jax.random.PRNGKey(3),
                               n_periods=8, n_paths=60_000, n_steps=48,
                               return_stderr=True)
        assert abs(float(pr) - float(pg)) < 5 * float(
            jnp.sqrt(sr**2 + sg**2))
        pa, sa = rbergomi_autocall_price(100.0, 1.0, 0.03, par,
                                         jax.random.PRNGKey(4), n_obs=4,
                                         n_paths=60_000, n_steps=48,
                                         return_stderr=True)
        pga, sga = autocallable_price(100.0, 1.0, 0.03, 0.2,
                                      jax.random.PRNGKey(5), n_obs=4,
                                      n_paths=60_000, n_steps=48,
                                      return_stderr=True)
        assert abs(float(pa) - float(pga)) < 5 * float(
            jnp.sqrt(sa**2 + sga**2))

    def test_collar_monotonicity_on_shared_paths(self):
        """Same key => same paths: tightening the local cap or the global
        cap can only LOWER the price (clip is monotone), and the
        global-floor payoff dominates the unfloored one. Deterministic
        orderings, no MC tolerance."""
        from optionslab_tpu.models.rbergomi import (RBergomiParams,
                                                    rbergomi_cliquet_price)
        par = RBergomiParams(hurst=0.1, eta=1.9, rho=-0.9, xi0=0.04)
        key = jax.random.PRNGKey(6)
        kw = dict(n_periods=8, n_paths=20_000, n_steps=48)
        wide = rbergomi_cliquet_price(100.0, 1.0, 0.03, par, key,
                                      local_cap=0.08, **kw)
        tight = rbergomi_cliquet_price(100.0, 1.0, 0.03, par, key,
                                       local_cap=0.03, **kw)
        assert float(tight) < float(wide)
        capped = rbergomi_cliquet_price(100.0, 1.0, 0.03, par, key,
                                        global_cap=0.02, **kw)
        assert float(capped) <= float(tight)
        floored = rbergomi_cliquet_price(100.0, 1.0, 0.03, par, key,
                                         global_floor=-1e9, **kw)
        base = rbergomi_cliquet_price(100.0, 1.0, 0.03, par, key, **kw)
        assert float(floored) <= float(base)

    def test_validation(self):
        from optionslab_tpu.models.rbergomi import (RBergomiParams,
                                                    rbergomi_autocall_price,
                                                    rbergomi_cliquet_price)
        from optionslab_tpu.utils.exceptions import ValidationError
        with pytest.raises(ValidationError):
            rbergomi_cliquet_price(100.0, 1.0, 0.05, RBergomiParams(),
                                   jax.random.PRNGKey(0), n_periods=7,
                                   n_steps=16)
        with pytest.raises(ValidationError):
            rbergomi_autocall_price(100.0, 1.0, 0.05, RBergomiParams(),
                                    jax.random.PRNGKey(0), n_obs=5,
                                    n_steps=16)


class TestRBergomiExoticGreeks:
    def test_asian_ad_ladder_vs_crn_fd(self):
        from optionslab_tpu.models.rbergomi import (RBergomiParams,
                                                    rbergomi_exotic_greeks,
                                                    rbergomi_exotic_price)
        par = RBergomiParams()
        key = jax.random.PRNGKey(0)
        g = rbergomi_exotic_greeks("asian_arith", 100.0, 100.0, 1.0, 0.05,
                                   par, key, n_paths=60_000, n_steps=64)

        def pr(s=100.0, xi0=0.04, eta=1.9):
            p = RBergomiParams(hurst=0.1, eta=eta, rho=-0.9, xi0=xi0)
            return float(rbergomi_exotic_price(
                "asian_arith", s, 100.0, 1.0, 0.05, p, key,
                n_paths=60_000, n_steps=64))
        assert abs(g["delta"] - (pr(s=100.5) - pr(s=99.5))) < 0.01
        fd_x = (pr(xi0=0.042) - pr(xi0=0.038)) / 0.004
        assert abs(g["vega_xi0"] - fd_x) < 0.05 * abs(fd_x) + 0.3
        fd_e = (pr(eta=1.95) - pr(eta=1.85)) / 0.1
        assert abs(g["vega_eta"] - fd_e) < 0.1 * abs(fd_e) + 0.05
        assert g["vega"] == pytest.approx(
            g["vega_xi0"] * 2.0 * np.sqrt(0.04), rel=1e-6)

    def test_lookback_delta_and_rejections(self):
        from optionslab_tpu.models.rbergomi import (RBergomiParams,
                                                    rbergomi_exotic_greeks,
                                                    rbergomi_exotic_price)
        par = RBergomiParams()
        key = jax.random.PRNGKey(2)
        g = rbergomi_exotic_greeks("lookback_float", 100.0, 0.0, 1.0, 0.05,
                                   par, key, n_paths=40_000, n_steps=32)

        def pr(s):
            return float(rbergomi_exotic_price(
                "lookback_float", s, 0.0, 1.0, 0.05, par, key,
                n_paths=40_000, n_steps=32))
        assert abs(g["delta"] - (pr(100.5) - pr(99.5))) < 0.02
        with pytest.raises(ValidationError):
            rbergomi_exotic_greeks("barrier_up-and-out", 100.0, 100.0, 1.0,
                                   0.05, par, key)


class TestChainCalibration:
    """Full (H, eta, rho, xi0) calibration via the in-graph Volterra
    covariance — the piece that makes H a live, differentiable input."""

    def test_dynamic_cov_matches_host_cholesky(self):
        """The traceable covariance equals the host-side factor's
        reconstruction (same 64-node quadrature) — an exact cross-
        implementation oracle, not a statistical one."""
        from optionslab_tpu.models.rbergomi import (_volterra_chol,
                                                    _volterra_cov_dynamic)
        n, h, t = 24, 0.11, 0.9
        lhost = np.asarray(_volterra_chol(n, h, t), np.float64)
        cov_host = lhost @ lhost.T
        grid = np.linspace(t / n, t, n).astype(np.float32)
        cov_dyn = np.asarray(
            _volterra_cov_dynamic(jnp.asarray(grid), jnp.float32(h)),
            np.float64)
        assert np.max(np.abs(cov_dyn - cov_host)) < 5e-5

    def test_chain_price_matches_static_pricer(self):
        """One chain program vs the per-expiry static-H pricer (different
        keys, both exact-in-law): agreement within joint MC noise."""
        from optionslab_tpu.models.rbergomi import (RBergomiParams,
                                                    rbergomi_chain_price,
                                                    rbergomi_price)
        p = RBergomiParams(hurst=0.12, eta=1.6, rho=-0.7, xi0=0.05)
        strikes = np.array([90.0, 100.0, 110.0, 95.0, 100.0, 105.0],
                           np.float32)
        mats = np.array([0.25, 0.25, 0.25, 0.75, 0.75, 0.75], np.float32)
        cps = np.ones(6, np.float32)
        chain = np.asarray(rbergomi_chain_price(
            strikes, mats, cps, 100.0, 0.02, p, jax.random.PRNGKey(3),
            n_paths=65_536, max_dt=0.02))
        for t_e in (0.25, 0.75):
            m = mats == t_e
            ref, se = rbergomi_price(
                100.0, strikes[m], t_e, 0.02, p, jax.random.PRNGKey(9),
                n_paths=65_536, n_steps=32)
            assert np.allclose(chain[m], np.asarray(ref),
                               atol=4 * float(np.max(np.asarray(se))) + 0.02), \
                (chain[m], np.asarray(ref))

    def test_hurst_gradient_matches_fd(self):
        """dLoss/dH through the in-graph covariance + Cholesky matches
        central FD of the SAME CRN program, and its sign agrees with the
        independent static-H pricer: at (eta=1.9, rho=-0.9, xi0=0.04,
        T=0.1, K=92) the put price RISES with H (measured 0.524 -> 0.537
        over H 0.08 -> 0.12 at 262k paths; naive 'more roughness = more
        skew = dearer put' intuition is WRONG at this point)."""
        from optionslab_tpu.models.rbergomi import (_chain_grid,
                                                    _volterra_logs_dynamic)
        t_grid, idx = _chain_grid([0.1], 0.02, 4)
        tg = jnp.asarray(t_grid)
        e = idx[0.1]
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        half = 8192
        z = jax.random.normal(k1, (half, 2 * len(t_grid)), jnp.float32)
        z = jnp.concatenate([z, -z], axis=0)
        zp = jax.random.normal(k2, (half, len(t_grid)), jnp.float32)
        zp = jnp.concatenate([zp, -zp], axis=0)

        def put(h):
            x = _volterra_logs_dynamic(tg, h, jnp.float32(1.9),
                                       jnp.float32(-0.9), jnp.float32(0.04),
                                       jnp.float32(0.0), jnp.float32(0.0),
                                       z, zp)
            s_t = 100.0 * jnp.exp(x[:, e])
            return jnp.maximum(92.0 - s_t, 0.0).mean()

        g = float(jax.grad(put)(jnp.float32(0.1)))
        fd = float((put(jnp.float32(0.12)) - put(jnp.float32(0.08))) / 0.04)
        assert np.isfinite(g) and g > 0.0
        assert abs(g - fd) < 0.15 * abs(fd) + 1e-3, (g, fd)

    def test_calibration_smoke_improves_loss(self):
        """Tiny end-to-end run: the scanned Adam loop must beat the
        deliberately-wrong init on the CRN loss."""
        from optionslab_tpu.models.rbergomi import (RBergomiParams,
                                                    calibrate_rbergomi,
                                                    rbergomi_chain_price)
        true = RBergomiParams(hurst=0.1, eta=1.9, rho=-0.8, xi0=0.04)
        strikes = np.array([95.0, 100.0, 105.0, 95.0, 100.0, 105.0],
                           np.float32)
        mats = np.array([0.2, 0.2, 0.2, 0.5, 0.5, 0.5], np.float32)
        cps = np.where(strikes < 100.0, -1.0, 1.0).astype(np.float32)
        market = np.asarray(rbergomi_chain_price(
            strikes, mats, cps, 100.0, 0.0, true, jax.random.PRNGKey(7),
            n_paths=16_384, max_dt=0.1, min_seg=4))
        init = RBergomiParams(hurst=0.3, eta=1.0, rho=-0.3, xi0=0.06)
        p, loss = calibrate_rbergomi(
            market, strikes, mats, cps, 100.0, 0.0, init=init,
            n_steps=60, learning_rate=0.08, n_paths=8_192, max_dt=0.1,
            min_seg=4)
        assert np.isfinite(loss)
        assert loss < 1e-3          # relative price RMSE² well under 3%
        assert 0.0 < p.hurst < 0.5 and -1.0 < p.rho < 1.0

    @pytest.mark.slow
    def test_recovers_generating_parameters(self):
        """Synthetic-chain recovery incl. the Hurst exponent: market from
        the INDEPENDENT static-H pricer (different keys, 64-step grids),
        so agreement is model-identification, not noise-matching.
        |dH| <= 0.02 is the round-4 acceptance bar. Config notes: a
        SHORT expiry (0.08y) identifies H, inverse-variance weights keep
        noisy deep-OTM quotes from dominating the relative-error loss,
        and min_seg >= 16 fine substeps remove the left-point Euler bias
        that otherwise shifts H by -0.04 (see calibrate_rbergomi's
        docstring; measured recovery at this config: H 0.113 / rho -0.78
        / eta 1.84 / xi0 0.0452 for true 0.12/-0.75/1.8/0.045)."""
        from optionslab_tpu.models.rbergomi import (RBergomiParams,
                                                    calibrate_rbergomi,
                                                    rbergomi_price)
        true = RBergomiParams(hurst=0.12, eta=1.8, rho=-0.75, xi0=0.045)
        mats = [0.08, 0.15, 0.4, 0.8]
        rows = []
        for t_e in mats:
            sd = np.sqrt(true.xi0 * t_e)
            ks = 100.0 * np.exp(np.array([-1.2, -0.6, 0.0, 0.5, 1.0]) * sd)
            cp = np.where(ks < 100.0, -1.0, 1.0)
            pr = np.empty(len(ks))
            se = np.empty(len(ks))
            for sgn in (-1.0, 1.0):
                m = cp == sgn
                if m.any():
                    v, s = rbergomi_price(
                        100.0, ks[m], t_e, 0.01, true,
                        jax.random.PRNGKey(100 + int(t_e * 100)),
                        option_type="call" if sgn > 0 else "put",
                        n_paths=524_288, n_steps=64)
                    pr[m] = np.asarray(v)
                    se[m] = np.asarray(s)
            for k, c, v, s in zip(ks, cp, pr, se):
                rows.append((k, t_e, c, v, s))
        strikes, mts, cps, market, ses = map(np.asarray, zip(*rows))
        w = (market / np.maximum(ses, 1e-6)) ** 2
        init = RBergomiParams(hurst=0.25, eta=1.2, rho=-0.4, xi0=0.03)
        p, loss = calibrate_rbergomi(
            market, strikes, mts, cps, 100.0, 0.01, init=init,
            n_steps=400, learning_rate=0.04, n_paths=65_536, max_dt=0.02,
            min_seg=16, weights=w / w.mean())
        assert abs(p.hurst - true.hurst) <= 0.02, (p, loss)
        assert abs(p.rho - true.rho) <= 0.1, (p, loss)
        assert abs(p.eta - true.eta) <= 0.3, (p, loss)
        assert abs(p.xi0 - true.xi0) / true.xi0 <= 0.15, (p, loss)
