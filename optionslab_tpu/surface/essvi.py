"""eSSVI — extended SSVI with per-expiry (theta, rho, psi) slices.

Beyond-reference capability (the reference stops at single-(rho, eta,
gamma) SSVI, ``src/volatility_surface/models/svi.py:173-239``): real
chains need the correlation and curvature to vary across the term
structure.  eSSVI (Hendriks & Martini 2017) keeps each slice in the SSVI
family

    w_i(k) = 1/2 ( theta_i + rho_i psi_i k
                   + sqrt((psi_i k + theta_i rho_i)^2
                          + theta_i^2 (1 - rho_i^2)) )

(psi_i = theta_i * phi(theta_i) in SSVI notation) but frees (rho_i,
psi_i) per expiry, which is exactly what a global power-law phi cannot
express.

No-arbitrage handling, TPU-first:
  - theta_i and psi_i are STRICTLY INCREASING BY CONSTRUCTION (cumulative
    softplus increments) — the two monotonicity parts of the
    Hendriks-Martini sufficient calendar conditions cost nothing.
  - per-slice butterfly: the Gatheral-Jacquier sufficient conditions in
    psi-form, psi(1+|rho|) <= 4 and psi^2 (1+|rho|) <= 4 theta, as smooth
    penalties; the EXACT g(k) >= 0 density check runs post-fit on a dense
    grid (closed-form w, w', w'').
  - calendar: smooth penalty on min_k (w_{i+1} - w_i) over a dense grid
    during the fit + exact post-fit verification.  (The HM paper's exact
    crossedness characterization reduces to a root condition; the dense
    numeric check is the honest, model-agnostic version and is what the
    report certifies.)

The WHOLE surface calibrates as ONE scanned-Adam program (all slices
jointly; scattered quotes carry a slice index) — a single device
dispatch, vs the reference's per-slice scipy loops.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.exceptions import CalibrationError, ValidationError

__all__ = ["ESSVIParams", "essvi_total_variance", "essvi_derivatives",
           "essvi_g", "calibrate_essvi", "essvi_surface_iv_fn",
           "essvi_report"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ESSVIParams:
    """Per-expiry eSSVI parameters (arrays of shape (n_expiries,))."""

    theta: jnp.ndarray   # ATM total variance per slice, increasing
    rho: jnp.ndarray     # per-slice correlation in (-1, 1)
    psi: jnp.ndarray     # per-slice skew scale psi = theta*phi, increasing

    @classmethod
    def make(cls, theta, rho, psi, dtype=jnp.float32):
        return cls(jnp.atleast_1d(jnp.asarray(theta, dtype)),
                   jnp.atleast_1d(jnp.asarray(rho, dtype)),
                   jnp.atleast_1d(jnp.asarray(psi, dtype)))

    @property
    def n_slices(self) -> int:
        return int(self.theta.shape[0])

    def validate(self):
        th = np.asarray(self.theta, np.float64)
        rho = np.asarray(self.rho, np.float64)
        psi = np.asarray(self.psi, np.float64)
        if np.any(th <= 0) or np.any(psi <= 0):
            raise ValidationError("eSSVI needs theta > 0 and psi > 0")
        if np.any(np.abs(rho) >= 1.0):
            raise ValidationError("eSSVI rho must be in (-1, 1)")
        if np.any(np.diff(th) < -1e-9):
            raise ValidationError("eSSVI theta must be non-decreasing in T")


def essvi_total_variance(k, theta, rho, psi):
    """w(k) for one slice (broadcasts over k and slice params alike)."""
    k = jnp.asarray(k)
    root = jnp.sqrt((psi * k + theta * rho) ** 2 + theta * theta * (1.0 - rho * rho))
    return 0.5 * (theta + rho * psi * k + root)


def essvi_derivatives(k, theta, rho, psi):
    """(w, w', w'') in closed form for one slice."""
    k = jnp.asarray(k)
    u = psi * k + theta * rho
    root = jnp.sqrt(u * u + theta * theta * (1.0 - rho * rho))
    w = 0.5 * (theta + rho * psi * k + root)
    wp = 0.5 * (rho * psi + psi * u / root)
    wpp = 0.5 * psi * psi * theta * theta * (1.0 - rho * rho) / (root ** 3)
    return w, wp, wpp


def essvi_g(k, theta, rho, psi):
    """Gatheral's density function g(k) >= 0 <=> butterfly-arbitrage-free."""
    k = jnp.asarray(k)
    w, wp, wpp = essvi_derivatives(k, theta, rho, psi)
    w = jnp.maximum(w, 1e-12)
    return (1.0 - k * wp / (2.0 * w)) ** 2 - 0.25 * wp * wp * (1.0 / w + 0.25) + 0.5 * wpp


def _pack(theta0, rho0, psi0):
    """Initial packed vector: increments in softplus^-1 space + arctanh rho."""
    inv_sp = lambda x: jnp.log(jnp.expm1(jnp.maximum(x, 1e-8)))
    th_inc = jnp.diff(jnp.concatenate([jnp.zeros(1), theta0]))
    ps_inc = jnp.diff(jnp.concatenate([jnp.zeros(1), psi0]))
    return jnp.concatenate([inv_sp(jnp.maximum(th_inc, 1e-6)),
                            jnp.arctanh(jnp.clip(rho0, -0.95, 0.95)),
                            inv_sp(jnp.maximum(ps_inc, 1e-6))])


def _unpack(x, n):
    theta = jnp.cumsum(jax.nn.softplus(x[:n]) + 1e-7)
    rho = jnp.tanh(x[n:2 * n]) * 0.999
    psi = jnp.cumsum(jax.nn.softplus(x[2 * n:]) + 1e-7)
    return ESSVIParams(theta=theta, rho=rho, psi=psi)


def _essvi_loss(x, k_flat, w_flat, wgt, idx, k_dense, butterfly_penalty,
                calendar_penalty):
    """Module-level joint eSSVI loss — stable identity for the
    scan_adam_cached jit cache. The slice count is static shape info
    (x has 3n entries)."""
    n = x.shape[0] // 3
    p = _unpack(x, n)
    w = essvi_total_variance(k_flat, p.theta[idx], p.rho[idx], p.psi[idx])
    fit = jnp.sum(wgt * (w - w_flat) ** 2) / n
    # Gatheral-Jacquier butterfly (psi-form) as smooth penalties
    b1 = jnp.maximum(p.psi * (1.0 + jnp.abs(p.rho)) - 4.0, 0.0)
    b2 = jnp.maximum(p.psi ** 2 * (1.0 + jnp.abs(p.rho)) - 4.0 * p.theta, 0.0)
    pen_b = jnp.mean(b1 ** 2) + jnp.mean(b2 ** 2)
    # calendar: w_{i+1}(k) >= w_i(k) on the dense grid
    w_sl = essvi_total_variance(k_dense[None, :], p.theta[:, None],
                                p.rho[:, None], p.psi[:, None])
    cross = jnp.maximum(w_sl[:-1] - w_sl[1:], 0.0) if n > 1 else jnp.zeros(())
    pen_c = jnp.mean(cross ** 2) / jnp.maximum(jnp.mean(w_flat) ** 2, 1e-12)
    return fit + butterfly_penalty * pen_b + calendar_penalty * pen_c


def calibrate_essvi(slice_log_strikes, slice_total_variances, *,
                    thetas_init=None, n_steps: int = 1500,
                    learning_rate: float = 0.02,
                    butterfly_penalty: float = 50.0,
                    calendar_penalty: float = 50.0,
                    ) -> tuple[ESSVIParams, float]:
    """Joint eSSVI fit of all expiry slices in one scanned-Adam dispatch.

    ``slice_log_strikes`` / ``slice_total_variances``: lists (one entry per
    expiry, ascending maturity) of per-quote forward log-moneyness and
    observed total variance.  Returns (params, loss).

    Per-slice fit terms are normalized by that slice's mean total variance
    squared so short-dated slices converge at the same step budget as
    long-dated ones (same trick as :func:`~.svi.calibrate_svi`).
    """
    n = len(slice_log_strikes)
    if n != len(slice_total_variances) or n == 0:
        raise ValidationError("need matching, non-empty per-slice quote lists")

    k_flat = jnp.asarray(np.concatenate(
        [np.asarray(k, np.float64) for k in slice_log_strikes]), jnp.float32)
    w_flat = jnp.asarray(np.concatenate(
        [np.asarray(w, np.float64) for w in slice_total_variances]), jnp.float32)
    idx = jnp.asarray(np.concatenate(
        [np.full(len(slice_log_strikes[i]), i) for i in range(n)]), jnp.int32)
    # per-quote weight: 1 / (mean slice w)^2 / n_quotes_in_slice, so every
    # slice contributes O(1) to the loss regardless of maturity or density
    w_mean = np.array([max(float(np.mean(w)), 1e-8)
                       for w in slice_total_variances])
    cnt = np.array([max(len(k), 1) for k in slice_log_strikes], np.float64)
    wgt = jnp.asarray((1.0 / (w_mean[np.concatenate(
        [np.full(len(slice_log_strikes[i]), i) for i in range(n)])] ** 2
        * cnt[np.concatenate(
            [np.full(len(slice_log_strikes[i]), i) for i in range(n)])])),
        jnp.float32)

    if thetas_init is None:
        # ATM w per slice: quote nearest k=0
        thetas_init = np.array([float(np.asarray(w)[np.argmin(np.abs(np.asarray(k)))])
                                for k, w in zip(slice_log_strikes, slice_total_variances)])
    th0 = jnp.asarray(np.maximum.accumulate(np.maximum(thetas_init, 1e-5)),
                      jnp.float32)
    rho0 = jnp.full((n,), -0.3, jnp.float32)
    psi0 = jnp.asarray(np.maximum.accumulate(
        np.maximum(0.5 * np.sqrt(np.maximum(thetas_init, 1e-5)), 1e-4)),
        jnp.float32)
    x0 = _pack(th0, rho0, psi0)

    lo = float(jnp.min(k_flat)) - 0.3
    hi = float(jnp.max(k_flat)) + 0.3
    k_dense = jnp.linspace(lo, hi, 101, dtype=jnp.float32)

    from ..ops.optim import scan_adam_cached

    best_x, best_loss, _ = scan_adam_cached(
        _essvi_loss, x0,
        (k_flat, w_flat, wgt, idx, k_dense,
         jnp.float32(butterfly_penalty), jnp.float32(calendar_penalty)),
        n_steps, learning_rate)
    if not np.isfinite(float(best_loss)):
        raise CalibrationError("eSSVI calibration diverged (non-finite loss)")
    return _unpack(best_x, n), float(best_loss)


def essvi_report(params: ESSVIParams, k_lo: float = -1.5, k_hi: float = 1.5,
                 n_k: int = 201) -> dict:
    """Exact post-fit no-arbitrage verification on a dense grid."""
    k = jnp.linspace(k_lo, k_hi, n_k, dtype=jnp.float32)
    g = np.asarray(essvi_g(k[None, :], params.theta[:, None],
                           params.rho[:, None], params.psi[:, None]))
    w = np.asarray(essvi_total_variance(k[None, :], params.theta[:, None],
                                        params.rho[:, None],
                                        params.psi[:, None]))
    cal_viol = (float(np.mean(np.diff(w, axis=0) < -1e-8))
                if params.n_slices > 1 else 0.0)
    bfly_free = [bool(np.all(g[i] >= -1e-7)) for i in range(params.n_slices)]
    return {
        "butterfly_free": bfly_free,
        "min_g": float(g.min()),
        "calendar_violation_rate": cal_viol,
        "theta_monotone": True,   # by construction (cumulative softplus)
        "psi_monotone": True,     # by construction
        "arbitrage_free": cal_viol == 0.0 and all(bfly_free),
    }


def essvi_surface_iv_fn(params: ESSVIParams, expiries):
    """Smooth-in-(k, T) implied-vol function from the eSSVI slices.

    Same T-interpolation contract as
    :func:`~.chain_calibration.svi_surface_iv_fn` (linear w in T between
    slices, proportional-to-T extrapolation at both ends, dw/dT > 0
    preserved) — a drop-in input for
    :class:`~..models.local_vol.DupireLocalVol`.
    """
    expiries = jnp.asarray(expiries, jnp.float32)
    t_lo, t_hi = expiries[0], expiries[-1]
    theta, rho, psi = params.theta, params.rho, params.psi

    def w_scalar(k, t):
        w_sl = essvi_total_variance(k, theta, rho, psi)
        t_c = jnp.clip(t, t_lo, t_hi)
        w_in = jnp.interp(t_c, expiries, w_sl)
        w = jnp.where(t < t_lo, w_sl[0] * t / t_lo,
                      jnp.where(t > t_hi, w_sl[-1] * t / t_hi, w_in))
        return jnp.maximum(w, 1e-10)

    def iv_fn(k, t):
        k = jnp.asarray(k, jnp.float32)
        t = jnp.asarray(t, jnp.float32)
        if k.ndim == 0 and t.ndim == 0:
            w = w_scalar(k, t)
        else:
            kb, tb = jnp.broadcast_arrays(k, t)
            w = jax.vmap(w_scalar)(kb.ravel(), tb.ravel()).reshape(kb.shape)
        return jnp.sqrt(w / jnp.maximum(jnp.asarray(t, jnp.float32), 1e-8))

    return iv_fn
