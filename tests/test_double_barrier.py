"""Double-barrier options: exact image-series closed forms, scan MC,
fused-kernel kinds and the LR Greek ladder.

Oracles (all independent of each other):
  * EXACT in-out parity: KO + KI == Black-Scholes vanilla (closed form);
  * EXACT single-barrier limits of the image series vs the Merton
    reflection formula (computed inline);
  * complement identity one-touch + no-touch == df on SHARED paths;
  * discrete MC vs the BGK barrier-shifted continuous closed form
    (both barriers shifted outward by e^{±0.5826 σ√dt}); the residual
    is the known O(1/m) higher-order BGK term, tolerated explicitly;
  * bridge-corrected continuous MC vs the UNSHIFTED exact closed form;
  * kernel vs scan statistical parity (independent samplers);
  * LR ladder vs CRN-FD of the kernel (delta/vega) and vs AD of the
    shifted closed form (gamma — second-difference FD is too noisy).

Reference anchor: ``src/pricing_models/exotic_options.py:174`` is
single-barrier only; double barriers are a beyond-reference capability.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from optionslab_tpu.models.black_scholes import bs_price
from optionslab_tpu.models.exotics import (
    double_barrier_closed_form,
    double_barrier_price,
    double_no_touch_closed_form,
    double_touch_price,
)
from optionslab_tpu.ops.exotic_pallas import (
    exotic_kernel_ladder,
    pallas_exotic_lr_greeks,
    pallas_exotic_price,
)
from optionslab_tpu.utils.exceptions import ValidationError

S, K, T, R, Q, SIG = 100.0, 100.0, 1.0, 0.05, 0.01, 0.2
L, U = 80.0, 130.0
BETA = 0.5825971579390107  # Broadie–Glasserman–Kou constant
KEY = jax.random.PRNGKey(11)


def _bgk_band(n_steps):
    shift = BETA * SIG * math.sqrt(T / n_steps)
    return L * math.exp(-shift), U * math.exp(shift)


class TestClosedForm:
    def test_in_out_parity_exact(self):
        ko = double_barrier_closed_form(S, K, L, U, T, R, SIG, 1.0, Q, "out")
        ki = double_barrier_closed_form(S, K, L, U, T, R, SIG, 1.0, Q, "in")
        van = bs_price(S, K, T, R, SIG, 1.0, Q)
        np.testing.assert_allclose(float(ko + ki), float(van), rtol=1e-6)

    def test_single_barrier_limit_matches_merton(self):
        # L -> 0: the image series must collapse to the Merton
        # up-and-out call (reflection principle, K < B)
        ko = double_barrier_closed_form(S, K, 1e-4, U, T, R, SIG, 1.0, Q,
                                        "out", n_images=2)
        lam = (R - Q + 0.5 * SIG * SIG) / (SIG * SIG)
        sq = SIG * math.sqrt(T)

        def cdf(x):
            return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))

        x1 = (math.log(S / K) + (R - Q + 0.5 * SIG**2) * T) / sq
        x2 = (math.log(S / U) + (R - Q + 0.5 * SIG**2) * T) / sq
        y1 = (math.log(U * U / (S * K)) + (R - Q + 0.5 * SIG**2) * T) / sq
        y2 = (math.log(U / S) + (R - Q + 0.5 * SIG**2) * T) / sq
        ref = (S * math.exp(-Q * T) * (cdf(x1) - cdf(x2))
               - K * math.exp(-R * T) * (cdf(x1 - sq) - cdf(x2 - sq))
               - (U / S) ** (2 * lam) * S * math.exp(-Q * T)
               * (cdf(y1) - cdf(y2))
               + (U / S) ** (2 * lam - 2) * K * math.exp(-R * T)
               * (cdf(y1 - sq) - cdf(y2 - sq)))
        np.testing.assert_allclose(float(ko), ref, atol=5e-5)

    def test_knocked_at_start_is_zero(self):
        assert float(double_barrier_closed_form(
            S, K, S + 1.0, S + 30.0, T, R, SIG, 1.0, Q, "out")) == 0.0
        assert float(double_no_touch_closed_form(
            S, S + 1.0, S + 30.0, T, R, SIG, Q)) == 0.0

    def test_band_widens_to_vanilla(self):
        ko_wide = double_barrier_closed_form(S, K, 1e-3, 1e6, T, R, SIG,
                                             1.0, Q, "out", n_images=2)
        van = bs_price(S, K, T, R, SIG, 1.0, Q)
        np.testing.assert_allclose(float(ko_wide), float(van), rtol=1e-6)

    def test_monotone_in_band(self):
        narrow = double_barrier_closed_form(S, K, 90.0, 115.0, T, R, SIG,
                                            1.0, Q, "out")
        wide = double_barrier_closed_form(S, K, L, U, T, R, SIG, 1.0, Q,
                                          "out")
        van = bs_price(S, K, T, R, SIG, 1.0, Q)
        assert 0.0 < float(narrow) < float(wide) < float(van)

    def test_dnt_in_unit_interval_and_put_side(self):
        dnt = double_no_touch_closed_form(S, L, U, T, R, SIG, Q)
        df = math.exp(-R * T)
        assert 0.0 < float(dnt) < df
        # put KO parity too
        ko_p = double_barrier_closed_form(S, K, L, U, T, R, SIG, -1.0, Q,
                                          "out")
        ki_p = double_barrier_closed_form(S, K, L, U, T, R, SIG, -1.0, Q,
                                          "in")
        np.testing.assert_allclose(
            float(ko_p + ki_p), float(bs_price(S, K, T, R, SIG, -1.0, Q)),
            rtol=1e-6)

    def test_validation(self):
        with pytest.raises(ValidationError):
            double_barrier_closed_form(S, K, U, L, T, R, SIG)
        with pytest.raises(ValidationError):
            double_barrier_closed_form(S, K, L, U, T, R, SIG, knock="nope")


class TestScanMC:
    N, M = 200_000, 64

    def test_discrete_vs_bgk_shifted_closed_form(self):
        lsh, ush = _bgk_band(self.M)
        mc, se = double_barrier_price(S, K, L, U, T, R, SIG, KEY, 1.0, Q,
                                      n_paths=self.N, n_steps=self.M,
                                      knock="out", return_stderr=True)
        cf = double_barrier_closed_form(S, K, lsh, ush, T, R, SIG, 1.0, Q,
                                        "out")
        # BGK leaves an O(1/m) residual beyond the O(1/sqrt(m)) repair
        assert abs(float(mc - cf)) < 4 * float(se) + 0.04

    def test_continuous_bridge_vs_exact(self):
        mc, se = double_barrier_price(S, K, L, U, T, R, SIG, KEY, 1.0, Q,
                                      n_paths=self.N, n_steps=self.M,
                                      knock="out", continuous=True,
                                      return_stderr=True)
        cf = double_barrier_closed_form(S, K, L, U, T, R, SIG, 1.0, Q, "out")
        assert abs(float(mc - cf)) < 4 * float(se) + 5e-3

    def test_in_out_parity_shared_paths(self):
        ko = double_barrier_price(S, K, L, U, T, R, SIG, KEY, 1.0, Q,
                                  n_paths=50_000, n_steps=16, knock="out")
        ki = double_barrier_price(S, K, L, U, T, R, SIG, KEY, 1.0, Q,
                                  n_paths=50_000, n_steps=16, knock="in")
        # same key => same paths => KO + KI == plain European MC exactly;
        # check against BS within that MC's own noise scale
        van = bs_price(S, K, T, R, SIG, 1.0, Q)
        assert abs(float(ko + ki) - float(van)) < 0.2

    def test_touch_complement_exact(self):
        one, _ = double_touch_price(S, L, U, T, R, SIG, KEY, Q, 1.0,
                                    50_000, 16, touch="one",
                                    return_stderr=True)
        no, _ = double_touch_price(S, L, U, T, R, SIG, KEY, Q, 1.0,
                                   50_000, 16, touch="no",
                                   return_stderr=True)
        np.testing.assert_allclose(float(one + no), math.exp(-R * T),
                                   atol=1e-6)

    def test_validation(self):
        with pytest.raises(ValidationError):
            double_barrier_price(S, K, L, U, T, R, SIG, KEY, knock="x")
        with pytest.raises(ValidationError):
            double_touch_price(S, L, U, T, R, SIG, KEY, touch="x")


KW = dict(n_paths=262_144, n_steps=32, seed=3, sampler="hash")


class TestKernel:
    def test_complement_and_parity_vs_scan(self):
        ko, se_ko, _ = pallas_exotic_price("barrier_double-out", S, K, T, R,
                                           SIG, 1.0, Q, lower=L, upper=U,
                                           **KW)
        ki, _, _ = pallas_exotic_price("barrier_double-in", S, K, T, R,
                                       SIG, 1.0, Q, lower=L, upper=U, **KW)
        one, _, _ = pallas_exotic_price("one_touch_double", S, K, T, R, SIG,
                                        1.0, Q, lower=L, upper=U, **KW)
        no, se_no, _ = pallas_exotic_price("no_touch_double", S, K, T, R,
                                           SIG, 1.0, Q, lower=L, upper=U,
                                           **KW)
        # shared paths: exact complement
        np.testing.assert_allclose(float(one + no), math.exp(-R * T),
                                   atol=1e-6)
        # scan parity, independent sampler
        mc, se_mc = double_barrier_price(S, K, L, U, T, R, SIG,
                                         jax.random.PRNGKey(1), 1.0, Q,
                                         n_paths=262_144, n_steps=32,
                                         knock="out", return_stderr=True)
        assert abs(float(mc - ko)) < 4 * math.hypot(float(se_ko),
                                                    float(se_mc)) + 1e-3
        mn, se_mn = double_touch_price(S, L, U, T, R, SIG,
                                       jax.random.PRNGKey(1), Q, 1.0,
                                       262_144, 32, touch="no",
                                       return_stderr=True)
        assert abs(float(mn - no)) < 4 * math.hypot(float(se_no),
                                                    float(se_mn)) + 1e-3
        # KO + KI == vanilla on shared kernel paths (exact identity up to
        # the two launches' float association)
        van = bs_price(S, K, T, R, SIG, 1.0, Q)
        assert abs(float(ko + ki) - float(van)) < 0.15

    def test_lr_ladder_vs_crn_fd_and_cf_gamma(self):
        g = pallas_exotic_lr_greeks("barrier_double-out", S, K, T, R, SIG,
                                    1.0, Q, lower=L, upper=U, **KW)
        base, _, _ = pallas_exotic_price("barrier_double-out", S, K, T, R,
                                         SIG, 1.0, Q, lower=L, upper=U, **KW)
        np.testing.assert_allclose(float(g["price"]), float(base),
                                   rtol=1e-5)
        h = 0.5
        up, _, _ = pallas_exotic_price("barrier_double-out", S + h, K, T, R,
                                       SIG, 1.0, Q, lower=L, upper=U, **KW)
        dn, _, _ = pallas_exotic_price("barrier_double-out", S - h, K, T, R,
                                       SIG, 1.0, Q, lower=L, upper=U, **KW)
        fd_delta = float(up - dn) / (2 * h)
        assert abs(float(g["delta"]) - fd_delta) < 0.02
        hv = 0.005
        upv, _, _ = pallas_exotic_price("barrier_double-out", S, K, T, R,
                                        SIG + hv, 1.0, Q, lower=L, upper=U,
                                        **KW)
        dnv, _, _ = pallas_exotic_price("barrier_double-out", S, K, T, R,
                                        SIG - hv, 1.0, Q, lower=L, upper=U,
                                        **KW)
        fd_vega = float(upv - dnv) / (2 * hv)
        assert abs(float(g["vega"]) - fd_vega) < max(0.05 * abs(fd_vega),
                                                     0.6)
        # gamma oracle: AD of the BGK-shifted closed form
        lsh, ush = _bgk_band(KW["n_steps"])

        def f(s):
            return double_barrier_closed_form(s, K, lsh, ush, T, R, SIG,
                                              1.0, Q, "out")

        cf_gamma = float(jax.grad(jax.grad(f))(jnp.asarray(S, jnp.float64)))
        assert abs(float(g["gamma"]) - cf_gamma) < 6e-3

    def test_ladder_facade_and_validation(self):
        out = exotic_kernel_ladder("double-barrier", S, K, T, R, SIG, 1.0,
                                   Q, barrier_type="out", lower=L, upper=U,
                                   n_paths=50_000, n_steps=16, seed=3,
                                   sampler="hash")
        assert out["greek_method"] == "likelihood-ratio"
        assert out["price"] > 0
        out2 = exotic_kernel_ladder("double-touch", S, K, T, R, SIG, 1.0,
                                    Q, barrier_type="no", lower=L, upper=U,
                                    n_paths=50_000, n_steps=16, seed=3,
                                    sampler="hash")
        assert 0 < out2["price"] < math.exp(-R * T)
        with pytest.raises(ValidationError):
            pallas_exotic_price("barrier_double-out", S, K, T, R, SIG, 1.0,
                                Q, lower=U, upper=L, **KW)
        with pytest.raises(ValidationError):
            pallas_exotic_lr_greeks("one_touch_double", S, K, T, R, SIG,
                                    1.0, Q, lower=0.0, upper=0.0, **KW)


class TestStochVolDynamics:
    """Double kinds under stochastic(-local) vol: Heston scan vs fused
    kernel, LR ladder vs CRN-FD, the exact sigma_v->0 collapse onto the
    GBM engine, rough-Bergomi/SLV parity and complement identities.

    All beyond-reference: the reference prices single barriers under
    GBM only (``src/pricing_models/exotic_options.py:174``)."""

    def _par(self, sigma=0.3):
        from optionslab_tpu.models.heston import HestonParams
        return HestonParams.make(0.04, 1.5, 0.04, sigma, -0.5)

    def test_heston_scan_vs_kernel_and_parity(self):
        from optionslab_tpu.models.heston_exotics import heston_exotic_price
        from optionslab_tpu.ops.heston_pallas import (
            pallas_heston_exotic_price)

        par = self._par()
        kw = dict(n_paths=65_536, n_steps=16, seed=3, sampler="hash")
        ko, se_k, _ = pallas_heston_exotic_price(
            "barrier_double-out", S, K, T, R, par, 1.0, lower=L, upper=U,
            **kw)
        ki, _, _ = pallas_heston_exotic_price(
            "barrier_double-in", S, K, T, R, par, 1.0, lower=L, upper=U,
            **kw)
        sko, se_s = heston_exotic_price(
            "barrier_double-out", S, K, T, R, par, KEY, barrier=(L, U),
            n_paths=65_536, n_steps=16, return_stderr=True)
        ski, _ = heston_exotic_price(
            "barrier_double-in", S, K, T, R, par, KEY, barrier=(L, U),
            n_paths=65_536, n_steps=16, return_stderr=True)
        # kernel vs scan, independent samplers
        assert abs(float(ko - sko)) < 4 * math.hypot(float(se_k),
                                                     float(se_s)) + 1e-3
        # in-out parity on SHARED paths (scan): KO + KI == vanilla MC
        van, _ = heston_exotic_price(
            "barrier_double-out", S, K, T, R, par, KEY,
            barrier=(1e-6, 1e9), n_paths=65_536, n_steps=16,
            return_stderr=True)
        np.testing.assert_allclose(float(sko + ski), float(van), rtol=1e-5)
        # kernel in-out parity holds statistically too
        assert abs(float(ko + ki) - float(van)) < 0.15

    def test_heston_touch_complement_exact(self):
        from optionslab_tpu.ops.heston_pallas import (
            pallas_heston_exotic_price)

        kw = dict(n_paths=65_536, n_steps=16, seed=3, sampler="hash")
        one, _, _ = pallas_heston_exotic_price(
            "one_touch_double", S, K, T, R, self._par(), 1.0, lower=L,
            upper=U, **kw)
        no, _, _ = pallas_heston_exotic_price(
            "no_touch_double", S, K, T, R, self._par(), 1.0, lower=L,
            upper=U, **kw)
        np.testing.assert_allclose(float(one + no), math.exp(-R * T),
                                   atol=1e-6)

    def test_heston_sigma_v_to_zero_matches_gbm(self):
        """sigma_v -> 0 with v0 == theta freezes variance at v0: the
        Heston kernel must reproduce the GBM scan engine at the same
        discrete monitoring (statistical, independent samplers)."""
        from optionslab_tpu.ops.heston_pallas import (
            pallas_heston_exotic_price)

        par = self._par(sigma=1e-6)
        p_h, se_h, _ = pallas_heston_exotic_price(
            "barrier_double-out", S, K, T, R, par, 1.0, lower=L, upper=U,
            n_paths=131_072, n_steps=16, seed=5, sampler="hash")
        p_g, se_g = double_barrier_price(
            S, K, L, U, T, R, 0.2, jax.random.PRNGKey(7), 1.0, 0.0,
            n_paths=131_072, n_steps=16, knock="out", return_stderr=True)
        assert abs(float(p_h - p_g)) < 4 * math.hypot(float(se_h),
                                                      float(se_g)) + 1e-3

    def test_heston_lr_ladder_vs_crn_fd(self):
        from optionslab_tpu.ops.heston_pallas import (
            pallas_heston_exotic_lr_greeks, pallas_heston_exotic_price)

        par = self._par()
        kw = dict(n_paths=131_072, n_steps=16, seed=3, sampler="hash")
        g = pallas_heston_exotic_lr_greeks(
            "barrier_double-out", S, K, T, R, par, 1.0, lower=L, upper=U,
            **kw)
        base, _, _ = pallas_heston_exotic_price(
            "barrier_double-out", S, K, T, R, par, 1.0, lower=L, upper=U,
            **kw)
        np.testing.assert_allclose(float(g["price"]), float(base),
                                   rtol=1e-5)
        h = 0.5  # LR delta holds the ABSOLUTE band fixed under the bump
        up, _, _ = pallas_heston_exotic_price(
            "barrier_double-out", S + h, K, T, R, par, 1.0, lower=L,
            upper=U, **kw)
        dn, _, _ = pallas_heston_exotic_price(
            "barrier_double-out", S - h, K, T, R, par, 1.0, lower=L,
            upper=U, **kw)
        fd_delta = float(up - dn) / (2 * h)
        assert abs(float(g["delta"]) - fd_delta) < 0.03
        hr = 0.002
        upr, _, _ = pallas_heston_exotic_price(
            "barrier_double-out", S, K, T, R + hr, par, 1.0, lower=L,
            upper=U, **kw)
        dnr, _, _ = pallas_heston_exotic_price(
            "barrier_double-out", S, K, T, R - hr, par, 1.0, lower=L,
            upper=U, **kw)
        fd_rho = float(upr - dnr) / (2 * hr)
        assert abs(float(g["rho"]) - fd_rho) < max(0.05 * abs(fd_rho), 0.5)

    def test_rbergomi_parity_and_complement(self):
        from optionslab_tpu.models.rbergomi import (RBergomiParams,
                                                    rbergomi_exotic_price)

        par = RBergomiParams(xi0=0.04, eta=1.5, rho=-0.7, hurst=0.1)
        kw = dict(n_paths=32_768, n_steps=16, return_stderr=True)
        key = jax.random.PRNGKey(0)
        ko, _ = rbergomi_exotic_price("barrier_double-out", S, K, T, R,
                                      par, key, 1.0, barrier=(L, U), **kw)
        ki, _ = rbergomi_exotic_price("barrier_double-in", S, K, T, R,
                                      par, key, 1.0, barrier=(L, U), **kw)
        van, _ = rbergomi_exotic_price("barrier_double-out", S, K, T, R,
                                       par, key, 1.0, barrier=(1e-6, 1e9),
                                       **kw)
        np.testing.assert_allclose(float(ko + ki), float(van), rtol=1e-5)
        one, _ = rbergomi_exotic_price("one_touch_double", S, K, T, R,
                                       par, key, 1.0, barrier=(L, U), **kw)
        no, _ = rbergomi_exotic_price("no_touch_double", S, K, T, R,
                                      par, key, 1.0, barrier=(L, U), **kw)
        np.testing.assert_allclose(float(one + no), math.exp(-R * T),
                                   atol=1e-6)

    def test_slv_mixing_zero_flat_matches_gbm(self):
        from optionslab_tpu.models.heston import HestonParams
        from optionslab_tpu.models.local_vol import LocalVolSurface
        from optionslab_tpu.models.slv import slv_exotic_price

        rate = 0.03
        flat = LocalVolSurface(jnp.linspace(-3.0, 3.0, 11),
                               jnp.linspace(0.01, 2.0, 9),
                               jnp.full((9, 11), 0.2), S, rate)
        par = HestonParams.make(0.04, 2.0, 0.04, 0.5, -0.7)
        p0, se0 = slv_exotic_price(
            "barrier_double-out", S, K, T, rate, par, KEY, flat.k_grid,
            flat.t_grid, flat.grid, barrier=(L, U), mixing=0.0,
            n_paths=65_536, n_steps=16, return_stderr=True)
        mc, se_mc = double_barrier_price(
            S, K, L, U, T, rate, 0.2, jax.random.PRNGKey(1), 1.0, 0.0,
            n_paths=65_536, n_steps=16, knock="out", return_stderr=True)
        assert abs(float(p0 - mc)) < 4 * math.hypot(float(se0),
                                                    float(se_mc)) + 1e-3

    def test_validation(self):
        from optionslab_tpu.ops.heston_pallas import (
            pallas_heston_exotic_price)

        with pytest.raises(ValidationError):
            pallas_heston_exotic_price("barrier_double-out", S, K, T, R,
                                       self._par(), 1.0, lower=U, upper=L,
                                       n_paths=1, n_steps=4)
        with pytest.raises(ValidationError):
            pallas_heston_exotic_price("one_touch_double", S, K, T, R,
                                       self._par(), 1.0, n_paths=1,
                                       n_steps=4)
