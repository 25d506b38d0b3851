"""Certified [lower, upper] bracket for American puts under ROUGH
Bergomi — duality on a NON-MARKOVIAN law via exact conditional Gaussians.

The Heston/Bates/SLV brackets (``models/heston_american.py``,
``models/slv_american.py``) rest on a Markov transition law: the dual
martingale's conditional expectation E[V̂(X_k) | X_{k-1}] is estimated by
re-simulating one date-step from the (S, v) state. Rough Bergomi has no
finite-dimensional Markov state — v_t depends on the whole history of W.
The TPU-first resolution: simulate from the CAUSAL (time-interleaved)
Cholesky factor of the exact joint (V~, W) covariance
(``rbergomi._volterra_chol_causal``), so each path IS its iid-normal
coordinate vector e, and the conditional law of any future block given
F_{t_k} is an EXPLICIT Gaussian —

    (V~, W)_{k+1..} | F_{t_k}  ~  N(L[rows, :2k] e_past,
                                    L[rows, 2k:] L[rows, 2k:]^T).

Inner transitions for the dual are then one masked matmul (conditional
mean) plus a tiny lower-triangular fresh-block matmul — no nested path
replay, no Markov approximation in the LAW (only the value SURFACE is
approximate, which duality tolerates: any adapted surface yields a true
martingale and hence a valid upper bound).

Policy/surface regressions use (S, v, m) features where
m_k = E[V~_{t_{k+1}} | F_{t_k}] — a forward-variance summary of the
path history (the same masked-matmul readout), which captures most of
the non-Markovian memory the (S, v) pair misses.

The bracket certifies the BERMUDAN value of the DISCRETE left-point
rBergomi law on the (n_dates x n_sub)-step grid (the variance path is
exact in law at the grid; only the spot integral is left-point Euler —
same convention as every engine in ``models/rbergomi.py``), plus the
model-independent interest-on-strike pad for continuous exercise
(valid because discounted S is a Q-martingale under this law).

Beyond the reference (no rough vol, no American machinery at all);
certification pattern anchors: ``models/american.py:882`` (GBM),
``models/heston_american.py:495`` (Heston/Bates).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..utils.exceptions import ValidationError
from .rbergomi import RBergomiParams, _volterra_chol_causal

__all__ = ["fit_rbergomi_lsm", "rbergomi_lsm_lower", "rbergomi_dual_upper",
           "rbergomi_american_bracket"]

N_FEAT = 12
N_SFEAT = 16


def _features(s, v, m, ex):
    """Policy basis (ITM-only fit): polynomials in (moneyness, variance,
    forward-Volterra mean m) + the payoff kink feature."""
    one = jnp.ones_like(s)
    s2 = s * s
    return jnp.stack([one, s, s2, s2 * s, v, v * v, s * v, s2 * v, ex,
                      m, m * m, s * m], axis=-1)


def _sfeatures(s, v, m, ex):
    """Richer all-path basis for the dual's value surface."""
    one = jnp.ones_like(s)
    s2 = s * s
    return jnp.stack([one, s, s2, s2 * s, s2 * s2, v, v * v, s * v,
                      s2 * v, ex, ex * s, ex * v,
                      m, m * m, s * m, v * m], axis=-1)


def _m_readout_matrix(lc: np.ndarray, n_dates: int, n_sub: int):
    """(n_dates+1, 2n) host matrix M with m_d = M[d] @ e = the
    conditional mean E[V~_{t_{(d+1)·n_sub}} | F_{t_{d·n_sub}}]: row
    2(j_next-1) of the causal factor, columns masked to the date's past
    (< 2·d·n_sub). Row 0 (unconditional mean) and row n_dates (feature
    unused at the last date) are zero."""
    n = n_dates * n_sub
    out = np.zeros((n_dates + 1, 2 * n), np.float32)
    for d in range(1, n_dates):
        j_next = (d + 1) * n_sub
        row = lc[2 * (j_next - 1)].copy()
        row[2 * d * n_sub:] = 0.0
        out[d] = row
    return out


@functools.partial(jax.jit, static_argnames=("hurst", "maturity", "n_dates",
                                             "n_sub", "n_paths"))
def _simulate_dates(key, spot, eta, rho, xi0, rate, *, hurst, maturity,
                    n_dates, n_sub, n_paths):
    """Exact-law paths at every exercise date.

    Returns (s, v, m, w, e): s/v/m/w of shape (n_dates+1, n_paths) — spot,
    instantaneous variance, forward-Volterra feature and W level at the
    date grid — plus the iid coordinate vectors e (n_paths, 2n) the dual
    conditions on. Antithetic in e (and the orthogonal block zp)."""
    n = n_dates * n_sub
    lc = jnp.asarray(_volterra_chol_causal(n, hurst, float(maturity)))
    mmat = jnp.asarray(_m_readout_matrix(
        np.asarray(_volterra_chol_causal(n, hurst, float(maturity))),
        n_dates, n_sub))
    t_grid = jnp.linspace(maturity / n, maturity, n).astype(jnp.float32)
    dt = jnp.float32(maturity / n)
    half = n_paths // 2
    k1, k2 = jax.random.split(key)
    e = jax.random.normal(k1, (half, 2 * n), jnp.float32)
    e = jnp.concatenate([e, -e], axis=0)
    zp = jax.random.normal(k2, (half, n), jnp.float32)
    zp = jnp.concatenate([zp, -zp], axis=0)
    g = jax.lax.dot_general(e, lc, (((1,), (1,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST)
    v_tilde = g[:, 0::2]
    w_lvl = g[:, 1::2]
    dw = jnp.diff(w_lvl, axis=1, prepend=jnp.zeros((n_paths, 1), jnp.float32))
    expf = jnp.exp(eta * v_tilde
                   - 0.5 * eta**2 * t_grid[None, :] ** (2.0 * hurst))
    v_grid = xi0 * expf                                   # at t_1..t_n
    v_left = jnp.concatenate(
        [jnp.full((n_paths, 1), xi0, jnp.float32), v_grid[:, :-1]], axis=1)
    srho = jnp.sqrt(jnp.maximum(1.0 - rho**2, 0.0))
    dz = rho * dw + srho * jnp.sqrt(dt) * zp
    x = jnp.cumsum(jnp.sqrt(v_left) * dz - 0.5 * v_left * dt, axis=1) \
        + rate * t_grid[None, :]
    cols = n_sub * jnp.arange(1, n_dates + 1) - 1
    s = jnp.concatenate(
        [jnp.full((1, n_paths), spot, jnp.float32),
         (spot * jnp.exp(x[:, cols])).T], axis=0)
    v = jnp.concatenate(
        [jnp.full((1, n_paths), xi0, jnp.float32), v_grid[:, cols].T],
        axis=0)
    w = jnp.concatenate(
        [jnp.zeros((1, n_paths), jnp.float32), w_lvl[:, cols].T], axis=0)
    m = jax.lax.dot_general(mmat, e, (((1,), (1,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST)
    return s, v, m, w, e


def fit_rbergomi_lsm(spot, strike, maturity, rate, params: RBergomiParams,
                     key, cp: float = -1.0, n_dates: int = 25,
                     n_sub: int = 2, n_paths: int = 65_536):
    """Backward-induction LSM on (S, v, m) features (f64 host solves).
    Returns (policy, surface_coefs): policy = (coefs, mu, sd) with the
    per-date feature standardization FOLDED OUT — kept separate because
    folding it into the coefficients recreates huge canceling terms that
    the f32 pipeline cannot evaluate (at eta→0 the v-columns are
    collinear to ~1e-6; a plain lstsq returns O(1e7) coefficients whose
    f32 cancellation error exceeded the option value's first digit —
    measured: lower bound 6.89 vs 7.16 on the same paths)."""
    if cp > 0:
        raise ValidationError("bracket supports puts (cp=-1) only")
    params.validate()
    s, v, m, _, _ = _simulate_dates(
        key, jnp.float32(spot), jnp.float32(params.eta),
        jnp.float32(params.rho), jnp.float32(params.xi0),
        jnp.float32(rate), hurst=float(params.hurst),
        maturity=float(maturity), n_dates=n_dates, n_sub=n_sub,
        n_paths=n_paths)
    s = np.asarray(s, np.float64)
    v = np.asarray(v, np.float64)
    m = np.asarray(m, np.float64)
    k_ = float(strike)
    dt = float(maturity) / n_dates
    disc = math.exp(-float(rate) * dt)
    cash = np.maximum(cp * (s[-1] - k_), 0.0)
    coefs = np.zeros((n_dates + 1, N_FEAT))
    mus = np.zeros((n_dates + 1, N_FEAT))
    sds = np.ones((n_dates + 1, N_FEAT))
    scoefs = np.zeros((n_dates + 1, N_SFEAT))
    for d in range(n_dates - 1, 0, -1):
        cash *= disc
        ex = np.maximum(cp * (s[d] - k_), 0.0)
        sbasis = np.asarray(_sfeatures(jnp.asarray(s[d] / k_),
                                       jnp.asarray(v[d]), jnp.asarray(m[d]),
                                       jnp.asarray(ex / k_)))
        ata = sbasis.T @ sbasis + 1e-7 * len(ex) * np.eye(N_SFEAT)
        scoefs[d] = np.linalg.solve(ata, sbasis.T @ (cash / k_))
        itm = ex > 0
        if itm.sum() > 10 * N_FEAT:
            basis = np.asarray(_features(jnp.asarray(s[d, itm] / k_),
                                         jnp.asarray(v[d, itm]),
                                         jnp.asarray(m[d, itm]),
                                         jnp.asarray(ex[itm] / k_)),
                               np.float64)
            mu = basis.mean(axis=0)
            sd = np.maximum(basis.std(axis=0), 1e-12)
            mu[0], sd[0] = 0.0, 1.0                   # keep the intercept
            b = (basis - mu) / sd
            ata = b.T @ b + 1e-6 * len(b) * np.eye(N_FEAT)
            coef = np.linalg.solve(ata, b.T @ (cash[itm] / k_))
            coefs[d], mus[d], sds[d] = coef, mu, sd
            cont = b @ coef * k_
            take = ex[itm] > cont
            idx = np.where(itm)[0][take]
            cash[idx] = ex[idx]
    policy = (jnp.asarray(coefs, jnp.float32), jnp.asarray(mus, jnp.float32),
              jnp.asarray(sds, jnp.float32))
    return policy, jnp.asarray(scoefs, jnp.float32)


def _exercise_now(policy, d, s, v, m, strike, cp, n_dates):
    coefs, mus, sds = policy
    ex = jnp.maximum(cp * (s - strike), 0.0)
    feat = (_features(s / strike, v, m, ex / strike) - mus[d]) / sds[d]
    cont = (feat @ coefs[d]) * strike
    last = d >= n_dates
    return ex, (ex > 0.0) & (last | (ex > cont))


def _surface_value(scoefs, d, s, v, m, strike, cp, n_dates):
    ex = jnp.maximum(cp * (s - strike), 0.0)
    cont = jnp.clip(
        (_sfeatures(s / strike, v, m, ex / strike) @ scoefs[d]) * strike,
        0.0, strike)
    cont = jnp.where(d >= n_dates, 0.0, cont)
    return jnp.maximum(ex, cont)


@functools.partial(jax.jit, static_argnames=("hurst", "maturity", "n_dates",
                                             "n_sub", "n_paths"))
def _lower_pipeline(coefs, key, spot, strike, eta, rho, xi0, rate, cp, *,
                    hurst, maturity, n_dates, n_sub, n_paths):
    s, v, m, _, _ = _simulate_dates(key, spot, eta, rho, xi0, rate,
                                    hurst=hurst, maturity=maturity,
                                    n_dates=n_dates, n_sub=n_sub,
                                    n_paths=n_paths)
    dt = maturity / n_dates

    def body(carry, d):
        alive, cash = carry
        ex, take = _exercise_now(coefs, d, s[d], v[d], m[d], strike, cp,
                                 n_dates)
        pay_now = alive & take
        cash = jnp.where(pay_now, jnp.exp(-rate * dt * d) * ex, cash)
        return (alive & ~take, cash), None

    alive0 = jnp.ones(s.shape[1], bool)
    (_, cash), _ = lax.scan(body, (alive0, jnp.zeros(s.shape[1])),
                            jnp.arange(1, n_dates + 1))
    return cash.mean(), cash.std(ddof=1) / jnp.sqrt(1.0 * cash.shape[0])


def rbergomi_lsm_lower(coefs, key, spot, strike, maturity, rate,
                       params: RBergomiParams, cp: float = -1.0,
                       n_dates: int = 25, n_sub: int = 2,
                       n_paths: int = 131_072):
    """Out-of-sample policy value: (lower bound, stderr)."""
    m, se = _lower_pipeline(
        coefs, key, jnp.float32(spot), jnp.float32(strike),
        jnp.float32(params.eta), jnp.float32(params.rho),
        jnp.float32(params.xi0), jnp.float32(rate), float(cp),
        hurst=float(params.hurst), maturity=float(maturity),
        n_dates=n_dates, n_sub=n_sub, n_paths=n_paths)
    return float(m), float(se)


@functools.partial(jax.jit, static_argnames=("hurst", "maturity", "n_dates",
                                             "n_sub", "n_outer", "n_inner"))
def _upper_pipeline(scoefs, key, spot, strike, eta, rho, xi0, rate, cp, *,
                    hurst, maturity, n_dates, n_sub, n_outer, n_inner):
    """Value-surface dual on the exact conditional Gaussian law.

    At date k the martingale increment needs Ê[df_k·Ṽ_k | F_{t_{k-1}}].
    Inner samples of the date-k state given the outer path's past are
    drawn from the EXPLICIT conditional Gaussian: the (V~, W) block for
    grid steps j0+1..j1 = rows 2j0..2j1-1 of the causal factor — mean
    from the masked-past matmul, fresh covariance from the in-block
    lower-triangular columns. The inner estimates are conditionally
    unbiased, so E[max_k(df_k ex_k − M_k)] is a TRUE upper bound (inner
    noise only biases the max UP — the safe direction).

    Inner noise would still bias E[max_k] UP by its excursions (valid but
    LOOSE); a gradient control variate removes the linearized part at no
    rigor cost: the subtracted anchors have EXACT zero conditional mean
    — E[S_k | F_{t_{k-1}}] = S_{k-1} e^{r dt} (discounted spot is a
    Q-martingale of the scheme: W-increments are independent of the
    causal coordinates' sigma-algebra), E[v_k | F] is a conditional
    lognormal mean off the causal factor, E[m_k | F] = mu_m (linear) —
    and the coefficients (the surface gradient at the anchor point) are
    F_{t_{k-1}}-measurable, so conditional unbiasedness is preserved
    exactly."""
    n = n_dates * n_sub
    lc = jnp.asarray(_volterra_chol_causal(n, hurst, float(maturity)))
    dt_sub = jnp.float32(maturity / n)
    dt = maturity / n_dates
    srho = jnp.sqrt(jnp.maximum(1.0 - rho**2, 0.0))
    k_outer, k_dual = jax.random.split(jax.random.fold_in(key, 7))
    s_out, v_out, m_out, w_out, e_out = _simulate_dates(
        k_outer, spot, eta, rho, xi0, rate, hurst=hurst, maturity=maturity,
        n_dates=n_dates, n_sub=n_sub, n_paths=n_outer)
    half = n_inner // 2
    col_idx = jnp.arange(2 * n)

    def inner_states(k, zeta, zp_in):
        """(s, v, m) at date k for inner draws (n_outer, q, ...) given
        the outer past — exact conditional law."""
        j0 = (k - 1) * n_sub
        e_masked = jnp.where((col_idx < 2 * j0)[None, :], e_out, 0.0)
        lrows = lax.dynamic_slice(lc, (2 * j0, 0), (2 * n_sub, 2 * n))
        mu = e_masked @ lrows.T                       # (n_outer, 2 n_sub)
        a_blk = lax.dynamic_slice(lrows, (0, 2 * j0),
                                  (2 * n_sub, 2 * n_sub))
        g_fresh = mu[:, None, :] + jnp.einsum("oqf,gf->oqg", zeta, a_blk)
        vt_in = g_fresh[..., 0::2]                    # (n_outer, q, n_sub)
        w_in = g_fresh[..., 1::2]
        # m feature for the inner date-k states: V~ at grid j1 + n_sub,
        # conditional on (outer past, fresh block); row clamped at the
        # last date where the feature is unused (masked to 0 below)
        j1 = k * n_sub
        row_m = jnp.minimum(2 * (j1 + n_sub - 1), 2 * n - 2)
        lm = lax.dynamic_slice(lc, (row_m, 0), (1, 2 * n))[0]
        mu_m = e_masked @ lm                          # (n_outer,)
        a_m = lax.dynamic_slice(lm[None, :], (0, 2 * j0),
                                (1, 2 * n_sub))[0]
        m_in = mu_m[:, None] + zeta @ a_m
        m_in = jnp.where(k >= n_dates, 0.0, m_in)
        # exact conditional means of (v_k, m_k) given F_{t_{k-1}} — the
        # CV anchors (both F-measurable): v_k is lognormal in the last
        # fresh V~ coordinate, m_k is linear in it
        idx_v = 2 * (n_sub - 1)
        t_k = dt_sub * (j0 + n_sub).astype(jnp.float32)
        ev = xi0 * jnp.exp(eta * mu[:, idx_v]
                           + 0.5 * eta**2 * (jnp.sum(a_blk[idx_v] ** 2)
                                             - t_k ** (2.0 * hurst)))
        em = jnp.where(k >= n_dates, 0.0, mu_m)
        # left-point spot integral over the date's substeps
        x = jnp.log(s_out[k - 1] / spot)[:, None]
        v_left = v_out[k - 1][:, None]
        w_prev = w_out[k - 1][:, None]
        for j in range(n_sub):
            dw = w_in[..., j] - w_prev
            dz = rho * dw + srho * jnp.sqrt(dt_sub) * zp_in[..., j]
            x = x + rate * dt_sub - 0.5 * v_left * dt_sub \
                + jnp.sqrt(v_left) * dz
            t_j = dt_sub * (j0 + j + 1).astype(jnp.float32)
            v_left = xi0 * jnp.exp(eta * vt_in[..., j]
                                   - 0.5 * eta**2 * t_j ** (2.0 * hurst))
            w_prev = w_in[..., j]
        return spot * jnp.exp(x), v_left, m_in, (ev, em)

    def dual_body(carry, k):
        m_prev, best = carry
        df_k = jnp.exp(-rate * dt * k)
        vk = df_k * _surface_value(scoefs, k, s_out[k], v_out[k], m_out[k],
                                   strike, cp, n_dates)
        kz, kp = jax.random.split(jax.random.fold_in(k_dual, k))
        zeta = jax.random.normal(kz, (n_outer, half, 2 * n_sub), jnp.float32)
        zp_in = jax.random.normal(kp, (n_outer, half, n_sub), jnp.float32)
        zeta = jnp.concatenate([zeta, -zeta], axis=1)  # antithetic inner
        zp_in = jnp.concatenate([zp_in, -zp_in], axis=1)
        s_in, v_in, m_in, (ev, em) = inner_states(k, zeta, zp_in)
        es = s_out[k - 1] * jnp.exp(rate * dt)         # exact martingale
        g = jax.vmap(jax.grad(
            lambda svm: _surface_value(scoefs, k, svm[0], svm[1], svm[2],
                                       strike, cp, n_dates)))(
            jnp.stack([es, ev, em], axis=-1))          # (n_outer, 3)
        val_in = _surface_value(scoefs, k, s_in, v_in, m_in, strike, cp,
                                n_dates)
        cv = (g[:, 0:1] * (s_in - es[:, None])
              + g[:, 1:2] * (v_in - ev[:, None])
              + g[:, 2:3] * (m_in - em[:, None]))
        t2 = (val_in - cv).mean(axis=1)
        m_k = m_prev + vk - df_k * t2
        ex_k = jnp.maximum(cp * (s_out[k] - strike), 0.0)
        best = jnp.maximum(best, df_k * ex_k - m_k)
        return (m_k, best), None

    ex0 = jnp.full((n_outer,), jnp.maximum(cp * (spot - strike), 0.0),
                   jnp.float32)
    (_, best), _ = lax.scan(dual_body,
                            (jnp.zeros((n_outer,), jnp.float32), ex0),
                            jnp.arange(1, n_dates + 1))
    return best.mean(), best.std(ddof=1) / jnp.sqrt(1.0 * n_outer)


def rbergomi_dual_upper(scoefs, key, spot, strike, maturity, rate,
                        params: RBergomiParams, cp: float = -1.0,
                        n_dates: int = 25, n_sub: int = 2,
                        n_outer: int = 512, n_inner: int = 1024):
    """Value-surface dual upper bound: (upper, stderr)."""
    m, se = _upper_pipeline(
        scoefs, key, jnp.float32(spot), jnp.float32(strike),
        jnp.float32(params.eta), jnp.float32(params.rho),
        jnp.float32(params.xi0), jnp.float32(rate), float(cp),
        hurst=float(params.hurst), maturity=float(maturity),
        n_dates=n_dates, n_sub=n_sub, n_outer=n_outer, n_inner=n_inner)
    return float(m), float(se)


def rbergomi_american_bracket(spot, strike, maturity, rate,
                              params: RBergomiParams, cp: float = -1.0,
                              n_dates: int = 25, n_sub: int = 2,
                              n_fit: int = 65_536, n_lower: int = 131_072,
                              n_outer: int = 512, n_inner: int = 1024,
                              seed: int = 0) -> dict:
    """Certified Bermudan bracket under rough Bergomi + continuous pad.

    Returns {lower, lower_se, upper, upper_se, width, pad,
    continuous_upper, n_dates}: the Bermudan value of the discrete
    left-point rBergomi law lies in [lower, upper] up to MC stderrs;
    the continuous-exercise value is ≤ upper + pad with
    pad = K·(1 − e^{−r·T/n_dates}) (interest-on-strike; discounted S is
    a Q-martingale under this law, so the bound applies unchanged)."""
    if cp > 0:
        raise ValidationError("bracket supports puts (cp=-1) only")
    params.validate()
    key = jax.random.PRNGKey(seed)
    kf, kl, ku = jax.random.split(key, 3)
    pol, sur = fit_rbergomi_lsm(spot, strike, maturity, rate, params, kf,
                                cp, n_dates, n_sub, n_fit)
    lo, lo_se = rbergomi_lsm_lower(pol, kl, spot, strike, maturity, rate,
                                   params, cp, n_dates, n_sub, n_lower)
    up, up_se = rbergomi_dual_upper(sur, ku, spot, strike, maturity, rate,
                                    params, cp, n_dates, n_sub, n_outer,
                                    n_inner)
    pad = max(float(strike) * (1.0 - math.exp(-float(rate) * float(maturity)
                                              / n_dates)), 0.0)
    return {"lower": lo, "lower_se": lo_se, "upper": up, "upper_se": up_se,
            "width": up - lo, "pad": pad, "continuous_upper": up + pad,
            "n_dates": n_dates}
