"""Pay-at-hit digital touches (American binaries) and market-standard
barrier rebates.

Oracles, all independent:
  * Rubinstein-Reiner rebate-at-hit closed form vs discrete MC with the
    BGK-shifted barrier (both directions);
  * at r = 0 the at-hit and at-expiry conventions coincide EXACTLY
    (cash whenever, undiscounted) — checked on closed forms AND on
    shared kernel paths;
  * kernel vs scan statistical parity (independent samplers);
  * rebate legs are exact compositions on shared paths:
    KO + R*one-touch-at-hit == barrier_rebate_price (same key);
  * LR ladder (in-kernel discounting + DR moment) vs CRN-FD.

Beyond reference: the reference's barrier pricer has neither touches nor
rebates (``src/pricing_models/exotic_options.py:174-224``)."""

import math

import numpy as np
import pytest

import jax

from optionslab_tpu.models.exotics import (
    barrier_price,
    barrier_rebate_price,
    double_touch_price,
    one_touch_closed_form,
    one_touch_price,
)
from optionslab_tpu.ops.exotic_pallas import (
    exotic_kernel_ladder,
    pallas_exotic_lr_greeks,
    pallas_exotic_price,
)
from optionslab_tpu.utils.exceptions import ValidationError

S, K, T, R, Q, SIG = 100.0, 100.0, 1.0, 0.05, 0.01, 0.2
BETA = 0.5825971579390107
KEY = jax.random.PRNGKey(7)
KW = dict(n_paths=262_144, n_steps=32, seed=3, sampler="hash")


class TestClosedForm:
    @pytest.mark.parametrize("barrier", [120.0, 130.0, 85.0, 70.0])
    def test_r_zero_conventions_coincide(self, barrier):
        eh = float(one_touch_closed_form(S, barrier, T, 0.0, SIG, Q,
                                         pay="expiry"))
        hh = float(one_touch_closed_form(S, barrier, T, 0.0, SIG, Q,
                                         pay="hit"))
        np.testing.assert_allclose(eh, hh, atol=1e-12)

    @pytest.mark.parametrize("barrier", [120.0, 80.0])
    def test_at_hit_dominates_at_expiry(self, barrier):
        eh = float(one_touch_closed_form(S, barrier, T, R, SIG, Q,
                                         pay="expiry"))
        hh = float(one_touch_closed_form(S, barrier, T, R, SIG, Q,
                                         pay="hit"))
        assert hh >= eh - 1e-12
        assert 0.0 < eh < 1.0 and hh < 1.0

    def test_degenerate_pays_now(self):
        assert float(one_touch_closed_form(S, S, T, R, SIG, Q,
                                           pay="hit")) == 1.0
        np.testing.assert_allclose(
            float(one_touch_closed_form(S, S, T, R, SIG, Q, pay="expiry")),
            math.exp(-R * T), atol=1e-7)

    @pytest.mark.parametrize("barrier", [125.0, 80.0])
    @pytest.mark.parametrize("pay", ["expiry", "hit"])
    def test_mc_matches_bgk_shifted_closed_form(self, barrier, pay):
        n_steps = 128
        up = barrier >= S
        sh = BETA * SIG * math.sqrt(T / n_steps)
        b_sh = barrier * math.exp(sh if up else -sh)
        cf = float(one_touch_closed_form(S, b_sh, T, R, SIG, Q, pay=pay))
        mc, se = one_touch_price(S, barrier, T, R, SIG, KEY, Q,
                                 touch="one", pay=pay, n_paths=200_000,
                                 n_steps=n_steps, return_stderr=True)
        assert abs(float(mc) - cf) < 4 * float(se) + 3e-3

    def test_validation(self):
        with pytest.raises(ValidationError):
            one_touch_closed_form(S, 120.0, T, R, SIG, pay="maturity")
        with pytest.raises(ValidationError):
            one_touch_price(S, 120.0, T, R, SIG, KEY, touch="no",
                            pay="hit")
        with pytest.raises(ValidationError):
            double_touch_price(S, 80.0, 130.0, T, R, SIG, KEY, touch="no",
                               pay="hit")


class TestRebateComposition:
    def test_ko_rebate_is_ko_plus_touch_at_hit(self):
        kw = dict(n_paths=100_000, n_steps=32, return_stderr=True)
        ko, _ = barrier_price(S, K, 130.0, T, R, SIG, KEY, 1.0, Q,
                              barrier_type="up-and-out", n_paths=100_000,
                              n_steps=32, return_stderr=True)
        ot, _ = one_touch_price(S, 130.0, T, R, SIG, KEY, Q, touch="one",
                                pay="hit", **kw)
        reb, _ = barrier_rebate_price(S, K, 130.0, T, R, SIG, KEY, 1.0, Q,
                                      rebate=5.0, n_paths=100_000,
                                      n_steps=32,
                                      barrier_type="up-and-out",
                                      return_stderr=True)
        np.testing.assert_allclose(float(reb),
                                   float(ko) + 5.0 * float(ot),
                                   rtol=1e-6)

    def test_ki_rebate_is_ki_plus_no_touch(self):
        kw = dict(n_paths=100_000, n_steps=32, return_stderr=True)
        ki, _ = barrier_price(S, K, 130.0, T, R, SIG, KEY, 1.0, Q,
                              barrier_type="up-and-in", n_paths=100_000,
                              n_steps=32, return_stderr=True)
        nt, _ = one_touch_price(S, 130.0, T, R, SIG, KEY, Q, touch="no",
                                **kw)
        reb, _ = barrier_rebate_price(S, K, 130.0, T, R, SIG, KEY, 1.0, Q,
                                      rebate=5.0, n_paths=100_000,
                                      n_steps=32, barrier_type="up-and-in",
                                      return_stderr=True)
        np.testing.assert_allclose(float(reb),
                                   float(ki) + 5.0 * float(nt), rtol=1e-6)

    def test_double_hit_single_barrier_limit(self):
        kw = dict(n_paths=100_000, n_steps=32, return_stderr=True)
        dh, _ = double_touch_price(S, 1e-4, 130.0, T, R, SIG, KEY, Q,
                                   touch="one", pay="hit", **kw)
        sh, _ = one_touch_price(S, 130.0, T, R, SIG, KEY, Q, touch="one",
                                pay="hit", **kw)
        np.testing.assert_allclose(float(dh), float(sh), rtol=1e-6)


class TestKernel:
    @pytest.mark.parametrize("kind,barrier", [("one_touch_up_hit", 125.0),
                                              ("one_touch_down_hit", 80.0)])
    def test_kernel_matches_scan_and_closed_form(self, kind, barrier):
        p, se, _ = pallas_exotic_price(kind, S, K, T, R, SIG, 1.0, Q,
                                       barrier=barrier, **KW)
        mc, sem = one_touch_price(S, barrier, T, R, SIG, KEY, Q,
                                  touch="one", pay="hit",
                                  n_paths=262_144, n_steps=32,
                                  return_stderr=True)
        assert abs(float(p - mc)) < 4 * math.hypot(float(se),
                                                   float(sem)) + 1e-3
        up = barrier >= S
        sh = BETA * SIG * math.sqrt(T / KW["n_steps"])
        b_sh = barrier * math.exp(sh if up else -sh)
        cf = float(one_touch_closed_form(S, b_sh, T, R, SIG, Q, pay="hit"))
        # BGK residual is O(1/m) at 32 steps — tolerated explicitly
        assert abs(float(p) - cf) < 4 * float(se) + 6e-3

    def test_r_zero_hit_equals_expiry_on_shared_paths(self):
        ph, _, _ = pallas_exotic_price("one_touch_up_hit", S, K, T, 0.0,
                                       SIG, 1.0, Q, barrier=125.0, **KW)
        pe, _, _ = pallas_exotic_price("one_touch_up", S, K, T, 0.0, SIG,
                                       1.0, Q, barrier=125.0, **KW)
        np.testing.assert_allclose(float(ph), float(pe), atol=1e-6)

    def test_double_hit_matches_scan(self):
        pd, sed, _ = pallas_exotic_price("one_touch_double_hit", S, K, T,
                                         R, SIG, 1.0, Q, lower=80.0,
                                         upper=130.0, **KW)
        md, semd = double_touch_price(S, 80.0, 130.0, T, R, SIG, KEY, Q,
                                      touch="one", pay="hit",
                                      n_paths=262_144, n_steps=32,
                                      return_stderr=True)
        assert abs(float(pd - md)) < 4 * math.hypot(float(sed),
                                                    float(semd)) + 1e-3

    def test_lr_ladder_vs_crn_fd(self):
        g = pallas_exotic_lr_greeks("one_touch_up_hit", S, K, T, R, SIG,
                                    1.0, Q, barrier=125.0, **KW)
        base, _, _ = pallas_exotic_price("one_touch_up_hit", S, K, T, R,
                                         SIG, 1.0, Q, barrier=125.0, **KW)
        np.testing.assert_allclose(float(g["price"]), float(base),
                                   rtol=1e-5)
        h = 0.5
        up, _, _ = pallas_exotic_price("one_touch_up_hit", S + h, K, T, R,
                                       SIG, 1.0, Q, barrier=125.0, **KW)
        dn, _, _ = pallas_exotic_price("one_touch_up_hit", S - h, K, T, R,
                                       SIG, 1.0, Q, barrier=125.0, **KW)
        assert abs(float(g["delta"]) - float(up - dn) / (2 * h)) < 0.01
        hr = 0.002
        upr, _, _ = pallas_exotic_price("one_touch_up_hit", S, K, T,
                                        R + hr, SIG, 1.0, Q, barrier=125.0,
                                        **KW)
        dnr, _, _ = pallas_exotic_price("one_touch_up_hit", S, K, T,
                                        R - hr, SIG, 1.0, Q, barrier=125.0,
                                        **KW)
        fd_rho = float(upr - dnr) / (2 * hr)
        assert abs(float(g["rho"]) - fd_rho) < max(0.05 * abs(fd_rho), 0.3)
        # vs the closed-form AD oracle (BGK-shifted barrier)
        sh = BETA * SIG * math.sqrt(T / KW["n_steps"])

        def f(s):
            return one_touch_closed_form(s, 125.0 * math.exp(sh), T, R,
                                         SIG, Q, pay="hit")

        import jax.numpy as jnp
        cf_delta = float(jax.grad(f)(jnp.asarray(S, jnp.float64)))
        assert abs(float(g["delta"]) - cf_delta) < 0.01

    def test_ladder_facade_and_validation(self):
        out = exotic_kernel_ladder("one-touch", S, K, T, R, SIG, 1.0, Q,
                                   barrier=125.0, pay="hit",
                                   n_paths=50_000, n_steps=16, seed=3,
                                   sampler="hash")
        assert out["greek_method"] == "likelihood-ratio"
        assert 0 < out["price"] < 1.0
        with pytest.raises(ValidationError):
            exotic_kernel_ladder("no-touch", S, K, T, R, SIG, 1.0, Q,
                                 barrier=125.0, pay="hit", n_paths=50_000,
                                 n_steps=16, sampler="hash")


class TestStochVolDynamics:
    """Pay-at-hit one-touches under EVERY dynamics column: Heston/Bates
    (scan + fused kernel with the DR-moment LR ladder), rough Bergomi
    (path-matrix first-hit), SLV (particle scan + replay kernel) and
    Dupire local vol (kernel). Oracles: kernel vs scan parity, the exact
    r = 0 collapse onto the at-expiry kind, and the flat/limit collapses
    onto the GBM machinery already validated against closed forms."""

    def _par(self, sigma=0.3):
        from optionslab_tpu.models.heston import HestonParams
        return HestonParams.make(0.04, 1.5, 0.04, sigma, -0.5)

    def test_heston_kernel_vs_scan_and_r0(self):
        from optionslab_tpu.models.heston_exotics import heston_exotic_price
        from optionslab_tpu.ops.heston_pallas import (
            pallas_heston_exotic_price)

        par = self._par()
        kw = dict(n_paths=65_536, n_steps=16, seed=3, sampler="hash")
        p, se, _ = pallas_heston_exotic_price(
            "one_touch_up_hit", S, K, T, R, par, 1.0, barrier=125.0, **kw)
        mc, sem = heston_exotic_price(
            "one_touch_up_hit", S, K, T, R, par, KEY, barrier=125.0,
            n_paths=65_536, n_steps=16, return_stderr=True)
        assert abs(float(p - mc)) < 4 * math.hypot(float(se),
                                                   float(sem)) + 1e-3
        ph, _, _ = pallas_heston_exotic_price(
            "one_touch_up_hit", S, K, T, 0.0, par, 1.0, barrier=125.0, **kw)
        pe, _, _ = pallas_heston_exotic_price(
            "one_touch_up", S, K, T, 0.0, par, 1.0, barrier=125.0, **kw)
        np.testing.assert_allclose(float(ph), float(pe), atol=1e-6)
        # double band at hit: kernel vs scan
        pd, sed, _ = pallas_heston_exotic_price(
            "one_touch_double_hit", S, K, T, R, par, 1.0, lower=80.0,
            upper=130.0, **kw)
        md, semd = heston_exotic_price(
            "one_touch_double_hit", S, K, T, R, par, KEY,
            barrier=(80.0, 130.0), n_paths=65_536, n_steps=16,
            return_stderr=True)
        assert abs(float(pd - md)) < 4 * math.hypot(float(sed),
                                                    float(semd)) + 1e-3

    def test_heston_lr_ladder_vs_crn_fd(self):
        from optionslab_tpu.ops.heston_pallas import (
            pallas_heston_exotic_lr_greeks, pallas_heston_exotic_price)

        par = self._par()
        kw = dict(n_paths=131_072, n_steps=16, seed=3, sampler="hash")
        g = pallas_heston_exotic_lr_greeks(
            "one_touch_up_hit", S, K, T, R, par, 1.0, barrier=125.0, **kw)
        base, _, _ = pallas_heston_exotic_price(
            "one_touch_up_hit", S, K, T, R, par, 1.0, barrier=125.0, **kw)
        np.testing.assert_allclose(float(g["price"]), float(base),
                                   rtol=1e-5)
        h = 0.5
        up, _, _ = pallas_heston_exotic_price(
            "one_touch_up_hit", S + h, K, T, R, par, 1.0, barrier=125.0,
            **kw)
        dn, _, _ = pallas_heston_exotic_price(
            "one_touch_up_hit", S - h, K, T, R, par, 1.0, barrier=125.0,
            **kw)
        assert abs(float(g["delta"]) - float(up - dn) / (2 * h)) < 0.01
        hr = 0.002
        upr, _, _ = pallas_heston_exotic_price(
            "one_touch_up_hit", S, K, T, R + hr, par, 1.0, barrier=125.0,
            **kw)
        dnr, _, _ = pallas_heston_exotic_price(
            "one_touch_up_hit", S, K, T, R - hr, par, 1.0, barrier=125.0,
            **kw)
        fd_rho = float(upr - dnr) / (2 * hr)
        assert abs(float(g["rho"]) - fd_rho) < max(0.12 * abs(fd_rho), 0.4)

    def test_rbergomi_r0_identity(self):
        from optionslab_tpu.models.rbergomi import (RBergomiParams,
                                                    rbergomi_exotic_price)

        par = RBergomiParams(xi0=0.04, eta=1.5, rho=-0.7, hurst=0.1)
        kw = dict(n_paths=16_384, n_steps=16, return_stderr=True)
        rh, _ = rbergomi_exotic_price("one_touch_up_hit", S, K, T, 0.0,
                                      par, KEY, 1.0, barrier=125.0, **kw)
        re_, _ = rbergomi_exotic_price("one_touch_up", S, K, T, 0.0, par,
                                       KEY, 1.0, barrier=125.0, **kw)
        np.testing.assert_allclose(float(rh), float(re_), atol=1e-6)
        # r > 0: at-hit dominates at-expiry (same paths)
        ah, _ = rbergomi_exotic_price("one_touch_up_hit", S, K, T, R, par,
                                      KEY, 1.0, barrier=125.0, **kw)
        ae, _ = rbergomi_exotic_price("one_touch_up", S, K, T, R, par,
                                      KEY, 1.0, barrier=125.0, **kw)
        assert float(ah) >= float(ae) - 1e-7
        dh, _ = rbergomi_exotic_price("one_touch_double_hit", S, K, T, R,
                                      par, KEY, 1.0,
                                      barrier=(80.0, 130.0), **kw)
        assert 0.0 < float(dh) < 1.0

    def test_lv_and_slv_kernels(self):
        import jax.numpy as jnp
        from types import SimpleNamespace

        from optionslab_tpu.models.local_vol import LocalVolSurface
        from optionslab_tpu.ops.local_vol_pallas import LocalVolKernelPricer
        from optionslab_tpu.ops.slv_pallas import SLVKernelPricer
        from optionslab_tpu.models.local_vol import (DupireLocalVol,
                                                     sample_smile_iv_fn)

        flat = LocalVolSurface(jnp.linspace(-3.0, 3.0, 11),
                               jnp.linspace(0.01, 2.0, 9),
                               jnp.full((9, 11), 0.2), S, R)
        pr = LocalVolKernelPricer(SimpleNamespace(surface=flat, spot=S,
                                                  rate=R, dividend=0.0),
                                  T, 16)
        kw = dict(n_paths=1, seed=3, sampler="hash")
        p, se, _ = pr.price(K, 1.0, "one_touch_up_hit", barrier=125.0, **kw)
        sh = BETA * 0.2 * math.sqrt(T / 16)
        cf = float(one_touch_closed_form(S, 125.0 * math.exp(sh), T, R,
                                         0.2, 0.0, pay="hit"))
        assert abs(float(p) - cf) < 4 * float(se) + 8e-3
        g = pr.greeks(K, 1.0, "one_touch_up_hit", barrier=125.0, **kw)
        np.testing.assert_allclose(g["price"], float(p), rtol=1e-5)
        # SLV replay kernel vs the particle scan on the same smile
        dup = DupireLocalVol(sample_smile_iv_fn(), S, R)
        par = self._par()
        sp = SLVKernelPricer(dup, par, T, mixing=1.0, n_steps=16,
                             n_cal_paths=32_768)
        pk, sek, _ = sp.price("one_touch_up_hit", K, barrier=125.0, **kw)
        from optionslab_tpu.models.slv import SLVModel
        slv = SLVModel(dup, par, mixing=1.0)
        ps, ses = slv.price("one_touch_up_hit", K, T,
                            jax.random.PRNGKey(2), barrier=125.0,
                            n_paths=65_536, n_steps=16,
                            return_stderr=True)
        assert abs(float(pk - ps)) < 4 * math.hypot(float(sek),
                                                    float(ses)) + 2e-2
        gs = sp.greeks("one_touch_double_hit", K, lower=80.0, upper=130.0,
                       **kw)
        assert 0.0 < gs["price"] < 1.0 and "rho" in gs
