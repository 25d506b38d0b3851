"""ops + utils tests: QMC quality, tridiag vs scipy, scan_adam, timing,
checkpointing, TTL/config plumbing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from optionslab_tpu.ops.math import norm_cdf, norm_ppf, smooth_indicator, smooth_max
from optionslab_tpu.ops.optim import scan_adam
from optionslab_tpu.ops.rng import (
    MAX_SOBOL_DIM,
    halton_sequence,
    qmc_normals,
    sobol_sequence,
)
from optionslab_tpu.ops.tridiag import tridiag_solve
from optionslab_tpu.utils import Timer, benchmark_fn, get_timings, reset_timings, timed
from optionslab_tpu.utils.checkpoint import restore_pytree, save_pytree


class TestSobol:
    def test_low_discrepancy_beats_pseudo(self):
        # star-discrepancy proxy: max |empirical - uniform| CDF error in 1-D
        n = 1024
        s = np.asarray(sobol_sequence(n, 1)).ravel()
        u = np.random.default_rng(0).uniform(size=n)

        def d(x):
            xs = np.sort(x)
            return np.abs(xs - (np.arange(1, n + 1) / n)).max()

        assert d(s) < d(u) / 4  # Sobol is dramatically more uniform

    def test_dimension_pairs_cover_grid(self):
        # skipping the origin point (u=0 breaks ppf) shifts one bin by ±1
        pts = np.asarray(sobol_sequence(256, 8))
        for d in range(8):
            hist, _ = np.histogram(pts[:, d], bins=16, range=(0, 1))
            assert (np.abs(hist - 16) <= 1).all()

    def test_scrambling_changes_points_preserves_uniformity(self):
        a = np.asarray(sobol_sequence(256, 4))
        b = np.asarray(sobol_sequence(256, 4, scramble_key=jax.random.PRNGKey(1)))
        assert np.abs(a - b).max() > 0.01
        hist, _ = np.histogram(b[:, 0], bins=16, range=(0, 1))
        assert (np.abs(hist - 16) <= 1).all()

    def test_dim_cap_raises(self):
        with pytest.raises(ValueError):
            sobol_sequence(8, MAX_SOBOL_DIM + 1)

    def test_halton_and_qmc_normals(self):
        h = np.asarray(halton_sequence(512, 70))
        assert h.shape == (512, 70)
        assert 0 < h.min() and h.max() < 1
        z = np.asarray(qmc_normals(2048, 2))
        assert abs(z.mean()) < 0.02
        assert abs(z.std() - 1.0) < 0.02


class TestTridiag:
    def test_matches_dense_solve(self):
        rng = np.random.default_rng(1)
        n = 64
        lo = rng.normal(size=n)
        di = 4.0 + rng.normal(size=n)  # diagonally dominant
        up = rng.normal(size=n)
        rhs = rng.normal(size=n)
        mat = np.diag(di) + np.diag(lo[1:], -1) + np.diag(up[:-1], 1)
        expect = np.linalg.solve(mat, rhs)
        got = np.asarray(tridiag_solve(jnp.asarray(lo), jnp.asarray(di),
                                       jnp.asarray(up), jnp.asarray(rhs)))
        np.testing.assert_allclose(got, expect, rtol=1e-6, atol=1e-8)

    def test_batched(self):
        rng = np.random.default_rng(2)
        lo = rng.normal(size=(5, 32))
        di = 5.0 + rng.normal(size=(5, 32))
        up = rng.normal(size=(5, 32))
        rhs = rng.normal(size=(5, 32))
        got = np.asarray(tridiag_solve(*map(jnp.asarray, (lo, di, up, rhs))))
        for b in range(5):
            mat = np.diag(di[b]) + np.diag(lo[b][1:], -1) + np.diag(up[b][:-1], 1)
            np.testing.assert_allclose(got[b], np.linalg.solve(mat, rhs[b]),
                                       rtol=1e-5, atol=1e-7)

    def test_differentiable(self):
        def f(d):
            n = 8
            return tridiag_solve(jnp.zeros(n), d * jnp.ones(n), jnp.zeros(n),
                                 jnp.ones(n)).sum()

        g = jax.grad(f)(jnp.asarray(2.0))
        assert abs(float(g) - (-8.0 / 4.0)) < 1e-6  # d/dd [8/d] at d=2


class TestScanAdam:
    def test_minimizes_quadratic(self):
        x0 = jnp.asarray([5.0, -3.0])
        best, loss, final = scan_adam(lambda x: jnp.sum((x - 1.0) ** 2), x0,
                                      n_steps=500, learning_rate=0.1)
        assert float(loss) < 1e-4
        np.testing.assert_allclose(np.asarray(best), 1.0, atol=0.02)

    def test_best_tracking_survives_divergence(self):
        # loss that explodes when |x| large: lr too big -> diverges, but best
        # iterate is still returned finite
        x0 = jnp.asarray(0.5)
        best, loss, final = scan_adam(lambda x: jnp.exp(x * x) - 1.0, x0,
                                      n_steps=100, learning_rate=5.0, clip=None)
        assert np.isfinite(float(loss))


class TestMathOps:
    def test_norm_roundtrip(self):
        p = jnp.asarray([0.01, 0.3, 0.7, 0.99], jnp.float64)
        np.testing.assert_allclose(np.asarray(norm_cdf(norm_ppf(p))), np.asarray(p),
                                   rtol=1e-12)

    def test_smooth_ops_limit(self):
        x = jnp.asarray([-1.0, -0.01, 0.01, 1.0], jnp.float64)
        np.testing.assert_allclose(np.asarray(smooth_max(x, 1e-6)),
                                   np.maximum(np.asarray(x), 0), atol=1e-5)
        ind = np.asarray(smooth_indicator(x, 1e-6))
        np.testing.assert_allclose(ind, [0, 0, 1, 1], atol=1e-4)


class TestTimingUtils:
    def test_timed_decorator_records(self):
        reset_timings()

        @timed("unit_test_fn")
        def fn():
            return jnp.ones(8).sum()

        fn()
        fn()
        assert len(get_timings()["unit_test_fn"]) == 2

    def test_timer_context(self):
        with Timer("ctx_label") as t:
            jnp.ones(4).sum()
        assert t.ms >= 0.0

    def test_benchmark_fn_stats(self):
        stats = benchmark_fn(lambda: jnp.ones(16).sum(), warmup=1, iters=5)
        assert stats["iters"] == 5
        assert stats["p50_ms"] >= stats["min_ms"]


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        tree = {"w": jnp.arange(6.0).reshape(2, 3), "meta": {"b": jnp.ones(3)}}
        backend = save_pytree(tree, tmp_path / "ckpt")
        restored = restore_pytree(tmp_path / "ckpt", like=tree)
        assert backend in ("orbax", "npz")
        np.testing.assert_allclose(np.asarray(restored["w"]), np.asarray(tree["w"]))
        np.testing.assert_allclose(np.asarray(restored["meta"]["b"]), 1.0)
