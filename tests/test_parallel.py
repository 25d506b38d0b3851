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
    def test_8way_path_sharding_accuracy(self, eight_devices):
        mesh = make_mesh(8)
        cfg = MCConfig(n_paths=160_000, dtype=jnp.float64)
        res = sharded_mc_price(_batch(), KEY, cfg, mesh)
        assert abs(float(res.price) - 10.450583572185565) < 3 * float(res.std_error)

    def test_topology_independence_of_estimator_quality(self, eight_devices):
        # different shard counts give different streams but statistically
        # consistent prices
        cfg = MCConfig(n_paths=160_000, dtype=jnp.float64)
        p8 = sharded_mc_price(_batch(), KEY, cfg, make_mesh(8))
        p4 = sharded_mc_price(_batch(), KEY, cfg, make_mesh(4))
        assert abs(float(p8.price) - float(p4.price)) < 3 * (
            float(p8.std_error) + float(p4.std_error)
        )

    def test_matches_single_device_engine_statistically(self, eight_devices):
        cfg = MCConfig(n_paths=160_000, dtype=jnp.float64)
        sharded = sharded_mc_price(_batch(), KEY, cfg, make_mesh(8))
        single = mc_price(_batch(), KEY, cfg)
        assert abs(float(sharded.price) - float(single)) < 6 * float(sharded.std_error)

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
