"""eSSVI surface: reduction to SSVI, joint calibration, no-arb report,
chain-facade integration.

Oracles: exact algebraic reduction (psi = theta*phi reproduces SSVI w),
Gatheral g(k) >= 0 on dense grids, calendar monotonicity of the fitted
surface, and fit quality vs the global-SSVI fit on a synthetic chain whose
skew term structure a single power-law phi cannot express.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from optionslab_tpu.surface.essvi import (ESSVIParams, calibrate_essvi,
                                          essvi_g, essvi_report,
                                          essvi_surface_iv_fn,
                                          essvi_total_variance)
from optionslab_tpu.surface.svi import SSVIParams, ssvi_total_variance


class TestESSVIForm:
    def test_reduces_to_ssvi_when_psi_matches_power_law(self):
        p = SSVIParams.make(rho=-0.4, eta=0.8, gamma=0.45)
        k = jnp.linspace(-0.8, 0.8, 41)
        for theta in (0.01, 0.04, 0.12):
            phi = 0.8 / theta ** 0.45
            w_ssvi = ssvi_total_variance(k, theta, p)
            w_essvi = essvi_total_variance(k, theta, -0.4, theta * phi)
            np.testing.assert_allclose(np.asarray(w_essvi),
                                       np.asarray(w_ssvi), rtol=1e-6)

    def test_atm_total_variance_is_theta(self):
        w0 = essvi_total_variance(0.0, 0.09, -0.5, 0.3)
        assert abs(float(w0) - 0.09) < 1e-7

    def test_derivative_closed_forms_match_ad(self):
        import jax

        th, rho, psi = 0.05, -0.35, 0.22
        from optionslab_tpu.surface.essvi import essvi_derivatives

        k = jnp.linspace(-0.6, 0.6, 13)
        w, wp, wpp = essvi_derivatives(k, th, rho, psi)
        f = lambda kk: essvi_total_variance(kk, th, rho, psi)
        wp_ad = jax.vmap(jax.grad(f))(k)
        wpp_ad = jax.vmap(jax.grad(jax.grad(f)))(k)
        np.testing.assert_allclose(np.asarray(wp), np.asarray(wp_ad),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(wpp), np.asarray(wpp_ad),
                                   rtol=1e-3, atol=1e-6)

    def test_validate_rejects_bad_params(self):
        from optionslab_tpu.utils.exceptions import ValidationError

        with pytest.raises(ValidationError):
            ESSVIParams.make([0.04, 0.02], [-0.3, -0.3], [0.2, 0.3]).validate()
        with pytest.raises(ValidationError):
            ESSVIParams.make([0.02, 0.04], [-1.2, -0.3], [0.2, 0.3]).validate()


def _make_term_structure_chain(seed=0, noise=0.0015):
    """Synthetic quotes whose skew DECAYS faster than any power law in
    theta: per-slice rho varies, which global SSVI cannot fit."""
    rng = np.random.default_rng(seed)
    expiries = np.array([0.1, 0.3, 0.7, 1.5])
    rhos = np.array([-0.75, -0.55, -0.3, -0.1])
    base = np.array([0.22, 0.21, 0.205, 0.2])
    ks, ws = [], []
    for t, rho, b in zip(expiries, rhos, base):
        k = np.linspace(-0.25, 0.25, 15) * np.sqrt(t) / np.sqrt(0.3)
        theta = b * b * t
        psi = 0.6 * np.sqrt(theta)
        w = np.asarray(essvi_total_variance(jnp.asarray(k, jnp.float32),
                                            theta, rho, psi))
        iv = np.sqrt(w / t) + rng.normal(0.0, noise, k.shape)
        ks.append(k)
        ws.append((iv ** 2) * t)
    return expiries, ks, ws


class TestESSVICalibration:
    def test_recovers_generating_slices_and_beats_global_ssvi(self):
        expiries, ks, ws = _make_term_structure_chain()
        p, loss = calibrate_essvi(ks, ws, n_steps=1500)
        p.validate()

        # per-quote fit error in vol points
        errs = []
        for i, (k, w, t) in enumerate(zip(ks, ws, expiries)):
            w_fit = np.asarray(essvi_total_variance(
                jnp.asarray(k, jnp.float32), p.theta[i], p.rho[i], p.psi[i]))
            errs.append(np.sqrt(w_fit / t) - np.sqrt(np.asarray(w) / t))
        rmse = float(np.sqrt(np.mean(np.concatenate(errs) ** 2)))
        assert rmse < 4e-3, f"eSSVI slice rmse {rmse}"

        # the generating rho term structure is recovered
        rho_fit = np.asarray(p.rho)
        assert rho_fit[0] < rho_fit[-1]          # skew decays with maturity
        np.testing.assert_allclose(rho_fit, [-0.75, -0.55, -0.3, -0.1],
                                   atol=0.12)

        # global SSVI (single rho) cannot track the rho term structure
        from optionslab_tpu.surface.svi import calibrate_ssvi

        thetas = np.asarray(p.theta)
        kg = np.stack([np.asarray(k, np.float64) for k in ks])
        wg = np.stack([np.asarray(w, np.float64) for w in ws])
        ps, _ = calibrate_ssvi(kg, thetas, wg, n_steps=1200)
        w_ss = np.asarray(ssvi_total_variance(
            jnp.asarray(kg, jnp.float32), jnp.asarray(thetas, jnp.float32)[:, None], ps))
        rmse_ssvi = float(np.sqrt(np.mean(
            (np.sqrt(w_ss / expiries[:, None]) - np.sqrt(wg / expiries[:, None])) ** 2)))
        assert rmse < 0.6 * rmse_ssvi, (rmse, rmse_ssvi)

    def test_fitted_surface_is_arbitrage_free(self):
        expiries, ks, ws = _make_term_structure_chain(seed=1)
        p, _ = calibrate_essvi(ks, ws, n_steps=1500)
        rep = essvi_report(p, -0.6, 0.6)
        assert rep["arbitrage_free"], rep
        assert rep["calendar_violation_rate"] == 0.0
        # theta/psi monotone by construction
        assert np.all(np.diff(np.asarray(p.theta)) > 0)
        assert np.all(np.diff(np.asarray(p.psi)) > 0)

    def test_g_detects_butterfly_violation(self):
        # psi large enough to violate the GJ bound => g < 0 somewhere
        g = np.asarray(essvi_g(jnp.linspace(-1.0, 1.0, 201),
                               0.01, -0.9, 5.0))
        assert g.min() < 0


class TestESSVISurfaceFn:
    def test_iv_fn_interpolates_and_extrapolates(self):
        expiries, ks, ws = _make_term_structure_chain()
        p, _ = calibrate_essvi(ks, ws, n_steps=800)
        iv_fn = essvi_surface_iv_fn(p, expiries)
        # at a slice maturity, matches the slice
        w_slice = float(essvi_total_variance(0.1, p.theta[1], p.rho[1], p.psi[1]))
        iv_expect = np.sqrt(w_slice / expiries[1])
        assert abs(float(iv_fn(0.1, float(expiries[1]))) - iv_expect) < 1e-5
        # before the first expiry: w proportional to T (flat vol in T)
        iv_short = float(iv_fn(0.0, 0.02))
        iv_first = float(iv_fn(0.0, float(expiries[0])))
        assert abs(iv_short - iv_first) < 1e-5
        # total variance is nondecreasing in T along k=0
        ts = np.linspace(0.05, 2.0, 25)
        w_path = np.asarray(iv_fn(0.0, jnp.asarray(ts, jnp.float32))) ** 2 * ts
        assert np.all(np.diff(w_path) > -1e-7)


class TestChainFacade:
    def test_calibrate_chain_essvi_flag(self):
        from optionslab_tpu.data.loader import load_option_data
        from optionslab_tpu.surface.chain_calibration import calibrate_chain

        chain = load_option_data("synthetic", n_rows=500, seed=3)
        res = calibrate_chain(chain, n_expiry_bins=4, n_steps=400, essvi=True)
        assert res.essvi is not None
        assert res.essvi.n_slices == len(res.expiries)
        # eSSVI (3n params) should fit at least as well as global SSVI (3)
        assert res.essvi_rmse_vol <= res.ssvi_rmse_vol * 1.05
        assert res.essvi_rmse_vol < 0.02
        assert "essvi_arbitrage_free" in res.report
        d = res.to_dict()
        assert len(d["essvi"]["rho"]) == len(res.expiries)


class TestESSVIDupireDropIn:
    @pytest.mark.slow
    def test_essvi_surface_feeds_dupire_and_reprices(self):
        """essvi_surface_iv_fn is a drop-in DupireLocalVol input: the LV
        PDE repriced vanilla matches the eSSVI slice's own BS price."""
        from optionslab_tpu.models.black_scholes import bs_price
        from optionslab_tpu.models.local_vol import DupireLocalVol

        expiries, ks, ws = _make_term_structure_chain(seed=2, noise=0.0)
        p, _ = calibrate_essvi(ks, ws, n_steps=1200)
        iv_fn = essvi_surface_iv_fn(p, expiries)
        dup = DupireLocalVol(iv_fn, spot=100.0, rate=0.02,
                             k_range=(-0.5, 0.5), t_range=(0.02, 1.5),
                             n_k=101, n_t=50)
        # local variance is finite and positive on the quoted region
        lv = np.asarray(dup.local_variance(
            jnp.linspace(-0.3, 0.3, 21), jnp.full(21, 0.7)))
        assert np.all(np.isfinite(lv)) and np.all(lv > 0)
        # reprice an ATM-forward vanilla at the third expiry
        t = float(expiries[2])
        fwd = 100.0 * np.exp(0.02 * t)
        iv_slice = float(iv_fn(0.0, t))
        want = float(bs_price(100.0, fwd, t, 0.02, iv_slice, 1.0, 0.0))
        got = float(dup.price(100.0, fwd, t))
        assert abs(got - want) < max(0.015 * want, 0.02), (got, want)
