"""The fused Pallas GBM kernel under shard_map (8-device virtual CPU mesh).

The ``hash`` and ``sobol`` samplers use no hardware PRNG, so the FULL
multi-device kernel pipeline runs under the TPU-semantics interpreter
off-TPU — end-to-end numeric validation of the pod-scale path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from optionslab_tpu.models.black_scholes import bs_greeks
from optionslab_tpu.ops import gbm_pallas as gp
from optionslab_tpu.parallel import make_mesh, sharded_pallas_greeks
from optionslab_tpu.types import ContractBatch


def _batch():
    return ContractBatch.make(100.0, 100.0, 1.0, 0.05, 0.2, "call")


class TestHashSamplerSingleDevice:
    """The counter-based sampler end-to-end in the unsharded kernel."""

    def test_price_and_greeks_match_bs(self):
        out = gp.pallas_mc_price_greeks(_batch(), n_paths=1_000_000, seed=0,
                                        sampler="hash")
        ex = bs_greeks(100.0, 100.0, 1.0, 0.05, 0.2, 1.0, 0.0)
        assert abs(float(out["price"]) - float(ex["price"])) < 3.5 * float(out["std_error"]) + 1e-3
        assert abs(float(out["delta"]) - float(ex["delta"])) < 5e-3
        assert abs(float(out["vega"]) - float(ex["vega"])) < 0.3

    def test_seed_changes_estimate(self):
        p0 = float(gp.pallas_mc_price_greeks(_batch(), n_paths=200_000, seed=0,
                                             sampler="hash")["price"])
        p1 = float(gp.pallas_mc_price_greeks(_batch(), n_paths=200_000, seed=9,
                                             sampler="hash")["price"])
        assert p0 != p1


@pytest.fixture
def tiny_tiles(monkeypatch):
    """Shrink the kernel tiles (rows 256 -> 8) so the interpreted multi-
    device pipeline stays fast; all shapes change, so no jit-cache overlap
    with the full-size tests."""
    monkeypatch.setattr(gp, "TARGET_ROWS", 8)


class TestShardedPallas:
    @pytest.mark.parametrize("sampler", ["hash", "sobol"])
    @pytest.mark.slow
    def test_matches_unsharded(self, tiny_tiles, sampler):
        """Same (seed, global-block) path set => sharded == unsharded up to
        f32 summation association."""
        mesh = make_mesh(8)
        out_s = sharded_pallas_greeks(_batch(), mesh, n_paths=500_000, seed=0,
                                      sampler=sampler)
        # the sharded launch rounds blocks up to a full device grid; the
        # unsharded kernel must be given the SAME effective budget so both
        # integrate the identical (seed, global-block) path set
        n_eff = int(out_s["n_paths"])
        out_u = gp.pallas_mc_price_greeks(_batch(), n_paths=n_eff, seed=0,
                                          sampler=sampler)
        np.testing.assert_allclose(float(out_s["price"]), float(out_u["price"]),
                                   rtol=2e-5)
        np.testing.assert_allclose(float(out_s["delta"]), float(out_u["delta"]),
                                   rtol=2e-4)
        np.testing.assert_allclose(float(out_s["vega"]), float(out_u["vega"]),
                                   rtol=2e-3)

    @pytest.mark.slow
    def test_topology_invariant(self, tiny_tiles):
        """1-, 2-, 4- and 8-device meshes integrate the SAME path set.

        The per-contract budget is a whole multiple of the block size, so
        every topology runs exactly the same global blocks (smaller budgets
        round up to a full device grid and would differ legitimately)."""
        prices, deltas = [], []
        for n in (1, 2, 4, 8):
            mesh = make_mesh(n)
            out = sharded_pallas_greeks(_batch(), mesh, n_paths=524_288,
                                        seed=3, sampler="hash")
            assert int(out["n_paths"]) == 524_288
            prices.append(float(out["price"]))
            deltas.append(float(out["delta"]))
        np.testing.assert_allclose(prices, prices[0], rtol=2e-5)
        np.testing.assert_allclose(deltas, deltas[0], rtol=2e-4)

    @pytest.mark.slow
    def test_2d_mesh_and_book(self, tiny_tiles):
        """(book=2, paths=4) mesh, 3-contract book: full ladder vs BS."""
        spots = jnp.asarray([90.0, 100.0, 110.0])
        b = ContractBatch.make(spots, 100.0, 0.5, 0.03, 0.25, "put")
        mesh = make_mesh(8, book=2)
        out = sharded_pallas_greeks(b, mesh, n_paths=400_000, seed=0,
                                    sampler="sobol")
        ex = bs_greeks(spots, 100.0, 0.5, 0.03, 0.25, -1.0, 0.0)
        np.testing.assert_allclose(np.asarray(out["price"]),
                                   np.asarray(ex["price"]), atol=5e-3)
        np.testing.assert_allclose(np.asarray(out["delta"]),
                                   np.asarray(ex["delta"]), atol=2e-3)
        np.testing.assert_allclose(np.asarray(out["gamma"]),
                                   np.asarray(ex["gamma"]), atol=5e-4)

    def test_sharded_exotic_price_matches_unsharded(self):
        """Exotic kernel under shard_map: same global blocks => same
        estimate (up to f32 association)."""
        from optionslab_tpu.ops.exotic_pallas import (PATHS_PER_BLOCK,
                                                      pallas_exotic_price)
        from optionslab_tpu.parallel import sharded_exotic_price

        mesh = make_mesh(4)
        args = ("asian_arith", 100.0, 100.0, 1.0, 0.05, 0.2)
        p_s, se_s, n_s = sharded_exotic_price(*args, mesh, n_paths=1,
                                              n_steps=4, sampler="hash")
        assert n_s == 4 * PATHS_PER_BLOCK  # rounds up to the device grid
        p_u, se_u, n_u = pallas_exotic_price(*args, n_paths=n_s, n_steps=4,
                                             sampler="hash")
        assert n_u == n_s
        np.testing.assert_allclose(float(p_s), float(p_u), rtol=2e-5)
        np.testing.assert_allclose(float(se_s), float(se_u), rtol=1e-4)

    def test_sharded_double_barrier_matches_unsharded(self):
        from optionslab_tpu.ops.exotic_pallas import pallas_exotic_price
        from optionslab_tpu.parallel import sharded_exotic_price

        mesh = make_mesh(4)
        args = ("barrier_double-out", 100.0, 100.0, 1.0, 0.05, 0.2)
        kw = dict(n_steps=4, sampler="hash", lower=80.0, upper=130.0)
        p_s, se_s, n_s = sharded_exotic_price(*args, mesh, n_paths=1, **kw)
        p_u, se_u, n_u = pallas_exotic_price(*args, n_paths=n_s, **kw)
        assert n_u == n_s
        np.testing.assert_allclose(float(p_s), float(p_u), rtol=2e-5)

    def test_sharded_exotic_greeks_matches_unsharded(self):
        from optionslab_tpu.ops.exotic_pallas import (PATHS_PER_BLOCK_G,
                                                      pallas_exotic_greeks)
        from optionslab_tpu.parallel import sharded_exotic_greeks

        mesh = make_mesh(4)
        args = ("lookback_float", 100.0, 0.0, 1.0, 0.05, 0.2)
        out_s = sharded_exotic_greeks(*args, mesh, n_paths=1, n_steps=4,
                                      sampler="hash")
        out_u = pallas_exotic_greeks(*args, n_paths=out_s["paths"],
                                     n_steps=4, sampler="hash")
        assert out_u["paths"] == out_s["paths"] == 4 * PATHS_PER_BLOCK_G
        for k in ("price", "delta", "vega", "rho", "theta"):
            np.testing.assert_allclose(float(out_s[k]), float(out_u[k]),
                                       rtol=3e-5, err_msg=k)

    def test_sharded_exotic_rejects_structured_and_unknown_kinds(self):
        from optionslab_tpu.parallel import (sharded_exotic_greeks,
                                             sharded_exotic_price)
        from optionslab_tpu.utils.exceptions import ValidationError

        mesh = make_mesh(2)
        with pytest.raises(ValidationError):
            sharded_exotic_price("cliquet", 100.0, 0.0, 1.0, 0.05, 0.2, mesh)
        with pytest.raises(ValidationError):
            sharded_exotic_price("nope", 100.0, 0.0, 1.0, 0.05, 0.2, mesh)
        with pytest.raises(ValidationError):
            sharded_exotic_greeks("barrier_up-and-out", 100.0, 100.0, 1.0,
                                  0.05, 0.2, mesh)

    @pytest.mark.slow
    def test_sobol_sharded_keeps_qmc_accuracy(self, tiny_tiles):
        """Device-contiguous index ranges union to the single-device net —
        sharding must not degrade QMC accuracy."""
        mesh = make_mesh(8)
        out = sharded_pallas_greeks(_batch(), mesh, n_paths=500_000, seed=0,
                                    sampler="sobol")
        exact = float(bs_greeks(100.0, 100.0, 1.0, 0.05, 0.2, 1.0, 0.0)["price"])
        assert abs(float(out["price"]) - exact) < 5e-3


class TestShardedHestonExotic:
    """The stochastic-vol exotic kernel under shard_map."""

    def _par(self):
        from optionslab_tpu.models.heston import HestonParams
        return HestonParams.make(0.04, 2.0, 0.04, 0.3, -0.7)

    def test_price_matches_unsharded(self):
        from optionslab_tpu.ops.heston_pallas import (
            PATHS_PER_BLOCK, pallas_heston_exotic_price)
        from optionslab_tpu.parallel import sharded_heston_exotic_price

        mesh = make_mesh(4)
        args = ("asian_arith", 100.0, 100.0, 1.0, 0.05, self._par())
        p_s, se_s, n_s = sharded_heston_exotic_price(
            *args, mesh, n_paths=1, n_steps=4, sampler="hash")
        assert n_s == 4 * PATHS_PER_BLOCK
        p_u, se_u, n_u = pallas_heston_exotic_price(
            *args, n_paths=n_s, n_steps=4, sampler="hash")
        assert n_u == n_s
        np.testing.assert_allclose(float(p_s), float(p_u), rtol=2e-5)
        np.testing.assert_allclose(float(se_s), float(se_u), rtol=1e-4)

    def test_greeks_match_unsharded(self):
        from optionslab_tpu.ops.heston_pallas import (
            pallas_heston_exotic_lr_greeks)
        from optionslab_tpu.parallel import sharded_heston_exotic_greeks

        mesh = make_mesh(4)
        args = ("barrier_up-and-out", 100.0, 100.0, 1.0, 0.05, self._par())
        out_s = sharded_heston_exotic_greeks(*args, mesh, barrier=130.0,
                                             n_paths=1, n_steps=4,
                                             sampler="hash")
        out_u = pallas_heston_exotic_lr_greeks(*args, barrier=130.0,
                                               n_paths=out_s["paths"],
                                               n_steps=4, sampler="hash")
        assert out_u["paths"] == out_s["paths"]
        for k in ("price", "delta", "gamma", "vega_v0", "rho"):
            np.testing.assert_allclose(float(out_s[k]), float(out_u[k]),
                                       rtol=5e-5, atol=1e-7, err_msg=k)

    def test_double_kinds_match_unsharded(self):
        from optionslab_tpu.ops.heston_pallas import (
            pallas_heston_exotic_lr_greeks, pallas_heston_exotic_price)
        from optionslab_tpu.parallel import (sharded_heston_exotic_greeks,
                                             sharded_heston_exotic_price)

        mesh = make_mesh(4)
        args = ("barrier_double-out", 100.0, 100.0, 1.0, 0.05, self._par())
        band = dict(lower=80.0, upper=130.0)
        p_s, _, n_s = sharded_heston_exotic_price(
            *args, mesh, n_paths=1, n_steps=4, sampler="hash", **band)
        p_u, _, _ = pallas_heston_exotic_price(
            *args, n_paths=n_s, n_steps=4, sampler="hash", **band)
        np.testing.assert_allclose(float(p_s), float(p_u), rtol=2e-5)
        out_s = sharded_heston_exotic_greeks(
            "no_touch_double", 100.0, 100.0, 1.0, 0.05, self._par(), mesh,
            n_paths=1, n_steps=4, sampler="hash", **band)
        out_u = pallas_heston_exotic_lr_greeks(
            "no_touch_double", 100.0, 100.0, 1.0, 0.05, self._par(),
            n_paths=out_s["paths"], n_steps=4, sampler="hash", **band)
        for k in ("price", "delta", "gamma", "vega_v0", "rho", "theta"):
            np.testing.assert_allclose(float(out_s[k]), float(out_u[k]),
                                       rtol=5e-5, atol=1e-7, err_msg=k)

    def test_rejects_structured_and_qmc(self):
        from optionslab_tpu.parallel import (sharded_heston_exotic_greeks,
                                             sharded_heston_exotic_price)
        from optionslab_tpu.utils.exceptions import ValidationError

        mesh = make_mesh(2)
        with pytest.raises(ValidationError):
            sharded_heston_exotic_price("cliquet", 100.0, 0.0, 1.0, 0.05,
                                        self._par(), mesh)
        with pytest.raises(ValidationError):
            sharded_heston_exotic_greeks("asian_arith", 100.0, 100.0, 1.0,
                                         0.05, self._par(), mesh,
                                         sampler="sobol_bb")


class TestShardedSLV:
    """The stochastic-local-vol replay kernel under shard_map: the
    leverage table rides replicated; path blocks shard by global-block
    ownership — sharded == unsharded on the identical path set."""

    def _pricer(self, n_steps=4):
        import jax.numpy as jnp

        from optionslab_tpu.models.heston import HestonParams
        from optionslab_tpu.models.local_vol import LocalVolSurface
        from optionslab_tpu.ops.slv_pallas import SLVKernelPricer

        flat = LocalVolSurface(jnp.linspace(-3.0, 3.0, 11),
                               jnp.linspace(0.01, 2.0, 9),
                               jnp.full((9, 11), 0.2), 100.0, 0.05)
        return SLVKernelPricer(flat, HestonParams.make(0.04, 2.0, 0.04,
                                                       0.3, -0.7),
                               1.0, mixing=1.0, n_steps=n_steps,
                               n_cal_paths=16_384)

    def test_price_matches_unsharded(self):
        from optionslab_tpu.ops.slv_pallas import PATHS_PER_BLOCK
        from optionslab_tpu.parallel import sharded_slv_price

        pr = self._pricer()
        mesh = make_mesh(4)
        p_s, se_s, n_s = sharded_slv_price(pr, "asian_arith", 100.0, mesh,
                                           n_paths=1, sampler="hash")
        assert n_s == 4 * PATHS_PER_BLOCK
        p_u, se_u, n_u = pr.price("asian_arith", 100.0, n_paths=n_s,
                                  sampler="hash")
        assert n_u == n_s
        np.testing.assert_allclose(float(p_s), float(p_u), rtol=2e-5)
        np.testing.assert_allclose(float(se_s), float(se_u), rtol=1e-4)

    def test_greeks_match_unsharded(self):
        from optionslab_tpu.parallel import sharded_slv_greeks

        pr = self._pricer()
        mesh = make_mesh(4)
        out_s = sharded_slv_greeks(pr, "barrier_up-and-out", 100.0, mesh,
                                   barrier=130.0, n_paths=1, sampler="hash")
        out_u = pr.greeks("barrier_up-and-out", 100.0, barrier=130.0,
                          n_paths=out_s["paths"], sampler="hash")
        assert out_u["paths"] == out_s["paths"]
        for k in ("price", "delta", "gamma", "vega_v0", "rho"):
            np.testing.assert_allclose(float(out_s[k]), float(out_u[k]),
                                       rtol=5e-5, atol=1e-7, err_msg=k)

    def test_rejects_qmc_and_mixing_zero(self):
        from optionslab_tpu.parallel import sharded_slv_greeks, sharded_slv_price
        from optionslab_tpu.utils.exceptions import ValidationError

        pr = self._pricer()
        mesh = make_mesh(2)
        with pytest.raises(ValidationError):
            sharded_slv_price(pr, "asian_arith", 100.0, mesh,
                              sampler="sobol_bb")
        pr0 = self._pricer()
        pr0.mixing = 0.0
        with pytest.raises(ValidationError):
            sharded_slv_greeks(pr0, "asian_arith", 100.0, mesh)
