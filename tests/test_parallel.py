"""Sharded MC over the 8-device virtual CPU mesh (SURVEY.md §2.11)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optionslab_tpu.models.monte_carlo import MCConfig, mc_price
from optionslab_tpu.parallel import make_mesh, sharded_book_price, sharded_mc_price
from optionslab_tpu.types import ContractBatch

KEY = jax.random.PRNGKey(0)


def _batch(n=None):
    if n is None:
        return ContractBatch.make(100.0, 100.0, 1.0, 0.05, 0.2, "call", dtype=jnp.float64)
    spots = jnp.linspace(80.0, 120.0, n, dtype=jnp.float64)
    return ContractBatch.make(spots, 100.0, 1.0, 0.05, 0.2, "call", dtype=jnp.float64)


class TestShardedMC:
    @pytest.mark.slow
    def test_8way_path_sharding_accuracy(self, eight_devices):
        mesh = make_mesh(8)
        cfg = MCConfig(n_paths=160_000, dtype=jnp.float64)
        res = sharded_mc_price(_batch(), KEY, cfg, mesh)
        assert abs(float(res.price) - 10.450583572185565) < 3 * float(res.std_error)

    @pytest.mark.slow
    def test_topology_invariance_bit_identical(self, eight_devices):
        """Fixed global RNG blocks + canonical-order reduction: the same
        (seed, n_paths) gives BIT-IDENTICAL prices on 1/4/8-device meshes
        (SURVEY §5's counter-based determinism requirement)."""
        cfg = MCConfig(n_paths=16_000, dtype=jnp.float64)
        p1 = sharded_mc_price(_batch(), KEY, cfg, make_mesh(1))
        p4 = sharded_mc_price(_batch(), KEY, cfg, make_mesh(4))
        p8 = sharded_mc_price(_batch(), KEY, cfg, make_mesh(8))
        assert float(p1.price) == float(p4.price) == float(p8.price)
        assert float(p1.std_error) == float(p4.std_error) == float(p8.std_error)

    @pytest.mark.slow
    def test_book_topology_invariance(self, eight_devices):
        cfg = MCConfig(n_paths=8_000, dtype=jnp.float64)
        b = _batch(6)  # not divisible by the book axis: exercises padding
        p2 = sharded_book_price(b, KEY, cfg, make_mesh(8, book=2))
        p4 = sharded_book_price(b, KEY, cfg, make_mesh(8, book=4))
        np.testing.assert_array_equal(np.asarray(p2), np.asarray(p4))

    @pytest.mark.slow
    def test_matches_single_device_engine_statistically(self, eight_devices):
        cfg = MCConfig(n_paths=160_000, dtype=jnp.float64)
        sharded = sharded_mc_price(_batch(), KEY, cfg, make_mesh(8))
        single = mc_price(_batch(), KEY, cfg)
        assert abs(float(sharded.price) - float(single)) < 6 * float(sharded.std_error)

    @pytest.mark.slow
    def test_book_and_path_2d_mesh(self, eight_devices):
        mesh = make_mesh(8, book=2)
        cfg = MCConfig(n_paths=32_000, dtype=jnp.float64)
        b = _batch(16)
        prices = sharded_book_price(b, KEY, cfg, mesh)
        assert prices.shape == (16,)
        assert bool(jnp.all(jnp.diff(prices) > 0))

    def test_jit_wrapped(self, eight_devices):
        mesh = make_mesh(8)
        cfg = MCConfig(n_paths=16_000, dtype=jnp.float64)
        fn = jax.jit(lambda b, k: sharded_mc_price(b, k, cfg, mesh).price)
        p = fn(_batch(), KEY)
        assert abs(float(p) - 10.45) < 1.0

    @pytest.mark.slow
    def test_book_result_and_greeks_parity_with_unsharded(self, eight_devices):
        """sharded_book_greeks vs the unsharded AD ladder (mc_greeks):
        different streams, so statistical parity at matched path counts."""
        from optionslab_tpu.models.black_scholes import bs_greeks
        from optionslab_tpu.models.monte_carlo import mc_greeks
        from optionslab_tpu.parallel import sharded_book_greeks

        mesh = make_mesh(8, book=2)
        cfg = MCConfig(n_paths=104_000, dtype=jnp.float64)
        b = _batch(8)
        res = sharded_book_price(b, KEY, cfg, mesh, return_result=True)
        assert res.price.shape == res.std_error.shape == (8,)
        g = sharded_book_greeks(b, KEY, cfg, mesh)
        ref = mc_greeks(b, jax.random.PRNGKey(99), cfg)
        ex = bs_greeks(b.spot, 100.0, 1.0, 0.05, 0.2, 1.0, 0.0)
        se = np.asarray(res.std_error)
        np.testing.assert_allclose(np.asarray(g["price"]), np.asarray(ex["price"]),
                                   atol=float(5 * se.max()))
        for k, tol in [("delta", 0.02), ("gamma", 0.004), ("vega", 1.2),
                       ("rho", 1.2), ("theta", 0.6), ("dual_delta", 0.02)]:
            np.testing.assert_allclose(np.asarray(g[k]), np.asarray(ex[k]),
                                       atol=tol, err_msg=k)
            np.testing.assert_allclose(np.asarray(g[k]), np.asarray(ref[k]),
                                       atol=2 * tol, err_msg=k + " vs mc_greeks")

    def test_invalid_path_split_raises(self, eight_devices):
        mesh = make_mesh(8)
        with pytest.raises(ValueError):
            sharded_mc_price(_batch(), KEY, MCConfig(n_paths=1004, dtype=jnp.float64), mesh)


class TestShardedRisk:
    def test_sharded_var_matches_global_sort(self, eight_devices):
        import numpy as np
        from jax.sharding import NamedSharding, PartitionSpec as P

        from optionslab_tpu.parallel.mesh import PATH_AXIS
        from optionslab_tpu.parallel.sharded_risk import sharded_historical_var_es
        from optionslab_tpu.risk import historical_es, historical_var

        mesh = make_mesh(8)
        rng = np.random.default_rng(3)
        pnl = rng.normal(0.0, 2.0, 80_000).astype(np.float32)
        sharded = jax.device_put(jnp.asarray(pnl), NamedSharding(mesh, P(PATH_AXIS)))
        var_s, es_s = sharded_historical_var_es(sharded, 0.95, mesh)
        # exact match with the single-device sorted estimator (tail-based
        # definition: VaR = m-th worst loss where m = ceil((1-c)·n))
        from optionslab_tpu.parallel.sharded_risk import _tail_count

        srt = np.sort(pnl)
        m = _tail_count(0.95, pnl.size)
        assert abs(float(var_s) - (-srt[m - 1])) < 1e-5
        assert abs(float(es_s) - (-srt[:m].mean())) < 1e-5
        # and statistically consistent with the quantile-based estimators
        assert abs(float(var_s) - float(historical_var(pnl, 0.95))) < 0.05
        assert abs(float(es_s) - float(historical_es(pnl, 0.95))) < 0.05

    @pytest.mark.slow
    def test_sharded_mc_var(self, eight_devices):
        from optionslab_tpu.parallel.sharded_risk import sharded_mc_var
        from optionslab_tpu.risk import lognormal_var

        mesh = make_mesh(8)
        var, es = sharded_mc_var(100.0, 0.05, 0.2, KEY, mesh, 0.95, 1.0, 400_000)
        cf = float(lognormal_var(100.0, 0.05, 0.2, 0.95, 1.0))
        assert abs(float(var) - cf) < 0.5
        assert float(es) > float(var)

    def test_indivisible_paths_raise(self, eight_devices):
        from optionslab_tpu.parallel.sharded_risk import sharded_mc_var

        mesh = make_mesh(8)
        with pytest.raises(ValueError):
            sharded_mc_var(100.0, 0.05, 0.2, KEY, mesh, n_paths=1001)
