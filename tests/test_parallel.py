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
