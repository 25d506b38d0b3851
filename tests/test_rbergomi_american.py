"""Certified American bracket under rough Bergomi.

The law is non-Markovian, so the usual state-resim dual is unavailable;
the machinery conditions on the causal Cholesky coordinates instead
(exact conditional Gaussians — see models/rbergomi_american.py). Oracles:

- eta -> 0: the discrete left-point rBergomi law IS exact constant-vol
  log-Euler, so the bracket must overlap the INDEPENDENT GBM
  grid/transition-matrix certificate at the same date grid.
- certificates' internal ordering (lower <= upper up to noise), the
  European floor, and the intrinsic floor.
- the conditional-transition construction itself: inner one-date samples
  must reproduce the unconditional date marginals (law check).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from optionslab_tpu.models.rbergomi import RBergomiParams
from optionslab_tpu.models.rbergomi_american import (
    fit_rbergomi_lsm, rbergomi_american_bracket, rbergomi_lsm_lower,
    rbergomi_dual_upper)
from optionslab_tpu.utils.exceptions import ValidationError


SPOT, STRIKE, T, RATE = 100.0, 105.0, 0.5, 0.06


class TestBracket:
    def test_eta_zero_overlaps_gbm_certificate(self):
        """At eta -> 0 the discrete law is EXACT constant-vol log-Euler
        (v_left = xi0 every step), so the Bermudan-12 value must agree
        with the GBM grid certificate at the same 12 dates."""
        from optionslab_tpu.models import american_price_interval

        p = RBergomiParams(hurst=0.3, eta=1e-6, rho=-0.5, xi0=0.04)
        br = rbergomi_american_bracket(
            SPOT, STRIKE, T, RATE, p, n_dates=12, n_sub=1,
            n_fit=30_000, n_lower=60_000, n_outer=384, n_inner=512)
        gbm = american_price_interval(SPOT, STRIKE, T, RATE, 0.2,
                                      n_dates=12, n_outer=60_000)
        lo = br["lower"] - 3 * br["lower_se"]
        up = br["upper"] + 3 * br["upper_se"]
        assert lo <= float(gbm["upper"]) + 3 * float(gbm["upper_se"]) + 1e-3
        assert up >= float(gbm["lower"]) - 3 * float(gbm["lower_se"]) - 1e-3
        assert br["width"] < 0.12, br

    def test_rough_bracket_orders_and_floors(self):
        p = RBergomiParams(hurst=0.1, eta=1.9, rho=-0.9, xi0=0.04)
        br = rbergomi_american_bracket(
            SPOT, STRIKE, T, RATE, p, n_dates=12, n_sub=2,
            n_fit=30_000, n_lower=60_000, n_outer=384, n_inner=512)
        assert br["lower"] <= br["upper"] + 3 * (br["lower_se"]
                                                 + br["upper_se"])
        # American put >= intrinsic and >= European on the same law
        assert br["upper"] + 3 * br["upper_se"] >= STRIKE - SPOT
        from optionslab_tpu.models.rbergomi import rbergomi_price

        euro, se = rbergomi_price(SPOT, np.array([STRIKE]), T, RATE, p,
                                  jax.random.PRNGKey(11),
                                  option_type="put", n_paths=100_000,
                                  n_steps=24)
        assert br["upper"] + 3 * br["upper_se"] \
            >= float(euro[0]) - 3 * float(se[0])
        assert br["width"] < 0.25, br
        assert br["continuous_upper"] == pytest.approx(
            br["upper"] + br["pad"])

    def test_rejects_calls(self):
        p = RBergomiParams()
        with pytest.raises(ValidationError):
            rbergomi_american_bracket(SPOT, STRIKE, T, RATE, p, cp=1.0)


class TestConditionalLaw:
    def test_inner_transition_reproduces_marginal(self):
        """Exactness of the conditional construction: E over outer paths
        of the conditional date-k law == the unconditional date-k law.
        Compare inner-sample moments of (log S_k, v_k) pooled across
        outer paths against a fresh unconditional simulation."""
        from optionslab_tpu.models.rbergomi_american import (
            _simulate_dates, _volterra_chol_causal)
        from jax import lax

        h, eta, rho, xi0, rate = 0.15, 1.2, -0.6, 0.04, 0.02
        n_dates, n_sub, t = 4, 2, 0.4
        n = n_dates * n_sub
        lc = jnp.asarray(_volterra_chol_causal(n, h, t))
        s_out, v_out, m_out, w_out, e_out = _simulate_dates(
            jax.random.PRNGKey(0), jnp.float32(100.0), jnp.float32(eta),
            jnp.float32(rho), jnp.float32(xi0), jnp.float32(rate),
            hurst=h, maturity=t, n_dates=n_dates, n_sub=n_sub,
            n_paths=4_096)
        # conditional one-date transition at k=3 (replicating the dual's
        # inner_states math inline)
        k = 3
        j0, j1 = (k - 1) * n_sub, k * n_sub
        dt_sub = t / n
        srho = np.sqrt(1.0 - rho**2)
        col = jnp.arange(2 * n)
        e_masked = jnp.where((col < 2 * j0)[None, :], e_out, 0.0)
        lrows = lax.dynamic_slice(lc, (2 * j0, 0), (2 * n_sub, 2 * n))
        mu = e_masked @ lrows.T
        a_blk = lax.dynamic_slice(lrows, (0, 2 * j0),
                                  (2 * n_sub, 2 * n_sub))
        q = 64
        kz, kp = jax.random.split(jax.random.PRNGKey(5))
        zeta = jax.random.normal(kz, (4_096, q, 2 * n_sub), jnp.float32)
        zp = jax.random.normal(kp, (4_096, q, n_sub), jnp.float32)
        g = mu[:, None, :] + jnp.einsum("oqf,gf->oqg", zeta, a_blk)
        vt_in, w_in = g[..., 0::2], g[..., 1::2]
        x = jnp.log(s_out[k - 1] / 100.0)[:, None]
        v_left = v_out[k - 1][:, None]
        w_prev = w_out[k - 1][:, None]
        for j in range(n_sub):
            dw = w_in[..., j] - w_prev
            dz = rho * dw + srho * np.sqrt(dt_sub) * zp[..., j]
            x = x + rate * dt_sub - 0.5 * v_left * dt_sub \
                + jnp.sqrt(v_left) * dz
            tj = dt_sub * (j0 + j + 1)
            v_left = xi0 * jnp.exp(eta * vt_in[..., j]
                                   - 0.5 * eta**2 * tj ** (2 * h))
            w_prev = w_in[..., j]
        x_pool = np.asarray(x).ravel()
        v_pool = np.asarray(v_left).ravel()
        # unconditional marginals from an independent fresh simulation
        s_ref, v_ref, _, _, _ = _simulate_dates(
            jax.random.PRNGKey(42), jnp.float32(100.0), jnp.float32(eta),
            jnp.float32(rho), jnp.float32(xi0), jnp.float32(rate),
            hurst=h, maturity=t, n_dates=n_dates, n_sub=n_sub,
            n_paths=131_072)
        x_ref = np.log(np.asarray(s_ref[k]) / 100.0)
        vr = np.asarray(v_ref[k])
        assert abs(x_pool.mean() - x_ref.mean()) < 4e-3
        assert abs(x_pool.std() - x_ref.std()) < 4e-3
        assert abs(v_pool.mean() - vr.mean()) < 3e-3
        assert abs(np.median(v_pool) - np.median(vr)) < 3e-3

    def test_m_feature_is_conditional_mean(self):
        """m_d must be the conditional mean of V~ at the next date: the
        residual (V~_next − m_d) must be uncorrelated with any function
        of the past (here: m_d itself and V~_d)."""
        from optionslab_tpu.models.rbergomi_american import (
            _simulate_dates, _volterra_chol_causal)

        h, t, n_dates, n_sub = 0.12, 0.5, 5, 2
        n = n_dates * n_sub
        lc = jnp.asarray(_volterra_chol_causal(n, h, t))
        _, _, m, _, e = _simulate_dates(
            jax.random.PRNGKey(1), jnp.float32(100.0), jnp.float32(1.5),
            jnp.float32(-0.7), jnp.float32(0.04), jnp.float32(0.0),
            hurst=h, maturity=t, n_dates=n_dates, n_sub=n_sub,
            n_paths=65_536)
        g = np.asarray(e @ lc.T)
        vt = g[:, 0::2]                 # V~ at grid steps 1..n
        d = 2
        vt_next = vt[:, (d + 1) * n_sub - 1]
        md = np.asarray(m[d])
        resid = vt_next - md
        assert abs(resid.mean()) < 6e-3
        # orthogonality to the conditioning information
        assert abs(np.corrcoef(resid, md)[0, 1]) < 0.02
        assert abs(np.corrcoef(resid, vt[:, d * n_sub - 1])[0, 1]) < 0.02
