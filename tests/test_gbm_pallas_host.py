"""Host-side logic of the Pallas GBM kernel: layout prep, replica merge,
Greek combination formulas. (The in-kernel PRNG path is validated on real
TPU by bench.py / the verify drive; the CPU interpreter stubs PRNG.)"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from optionslab_tpu.models.black_scholes import bs_greeks
from optionslab_tpu.ops import gbm_pallas as gp
from optionslab_tpu.types import ContractBatch


class TestPrepare:
    @pytest.mark.parametrize("c", [1, 3, 8, 20, 1000])
    def test_layout_invariants(self, c):
        spots = jnp.linspace(80.0, 120.0, c) if c > 1 else 100.0
        b = ContractBatch.make(spots, 100.0, 1.0, 0.05, 0.2, "call")
        _, flat, params, c_out, reps, rows, pad = gp._prepare(b)
        assert c_out == c
        assert rows % gp.SUBLANES == 0
        assert rows >= c * reps
        assert pad == rows - c * reps
        for p in params:
            assert p.shape == (rows, 1)
        # replicas tile the book: row i*c + j holds contract j
        s0 = np.asarray(params[0]).ravel()
        for j in range(min(c, 5)):
            np.testing.assert_allclose(s0[j], s0[c + j] if reps > 1 else s0[j])

    def test_lanes_budget(self):
        for rows in (8, 64, 256, 1024, 4096):
            lanes = gp._lanes_for(rows)
            assert lanes % 128 == 0
            assert rows * lanes <= gp._VMEM_ELEMS_PER_BUF or lanes == 128

    def test_paths_per_launch_monotone(self):
        b = ContractBatch.make(100.0, 100.0, 1.0, 0.05, 0.2, "call")
        n1 = gp.pallas_paths_per_launch(b, 1_000)
        n2 = gp.pallas_paths_per_launch(b, 1_000_000)
        n3 = gp.pallas_paths_per_launch(b, 100_000_000)
        # one block is ~1M paths for a single contract (TARGET_ROWS tiles)
        assert n1 >= 1_000 and n2 >= 1_000_000 and n3 >= 100_000_000
        assert n1 <= n2 <= n3 and n3 > n2


class TestCombine:
    @pytest.mark.slow
    def test_greek_formulas_match_bs_with_synthetic_moments(self):
        """Feed _combine with EXACT moments computed from a large normal
        sample — the combination formulas must reproduce BS Greeks."""
        rng = np.random.default_rng(0)
        n = 4_000_000
        S, K, T, r, sig, q = 100.0, 100.0, 1.0, 0.05, 0.2, 0.0
        z = rng.standard_normal(n).astype(np.float64)
        st = S * np.exp((r - q - sig**2 / 2) * T + sig * np.sqrt(T) * z)
        pay = np.maximum(st - K, 0.0)
        ind_st = np.where(st > K, st, 0.0)

        b = ContractBatch.make(S, K, T, r, sig, "call")
        bb, flat, params, c, reps, rows, _ = gp._prepare(b)
        # distribute the sample across rows (equal chunks)
        per_row = n // rows
        outs = []
        for moments in (pay, pay**2, ind_st, ind_st * z):
            row_sums = moments[: per_row * rows].reshape(rows, per_row).sum(axis=1)
            # shape (rows, 128): put the row sum in lane 0
            arr = np.zeros((rows, 128), np.float32)
            arr[:, 0] = row_sums
            outs.append(jnp.asarray(arr))
        out = gp._combine(bb, flat, outs, c, reps, per_row, jnp.float32)
        ex = bs_greeks(S, K, T, r, sig, 1.0, q)
        assert abs(float(out["price"]) - float(ex["price"])) < 0.05
        assert abs(float(out["delta"]) - float(ex["delta"])) < 0.005
        assert abs(float(out["gamma"]) - float(ex["gamma"])) < 0.001
        assert abs(float(out["vega"]) - float(ex["vega"])) < 0.3
        assert abs(float(out["rho"]) - float(ex["rho"])) < 0.3
        assert abs(float(out["theta"]) - float(ex["theta"])) < 0.2
        assert abs(float(out["dual_delta"]) - float(ex["dual_delta"])) < 0.005
        assert float(out["std_error"]) > 0

    def test_expired_contract_override(self):
        b = ContractBatch.make(110.0, 100.0, 0.0, 0.05, 0.2, "call")
        bb, flat, params, c, reps, rows, _ = gp._prepare(b)
        outs = [jnp.zeros((rows, 128), jnp.float32)] * 4
        out = gp._combine(bb, flat, outs, c, reps, 1000, jnp.float32)
        assert float(out["price"]) == pytest.approx(10.0)
        assert float(out["std_error"]) == 0.0


class TestSobolKernelEndToEnd:
    """The Sobol sampler uses no hardware PRNG, so the FULL kernel runs
    under the CPU interpreter — end-to-end numeric validation off-TPU."""

    def test_price_and_greeks_match_bs(self):
        b = ContractBatch.make(100.0, 100.0, 1.0, 0.05, 0.2, "call")
        out = gp.pallas_mc_price_greeks(b, n_paths=1_000_000, seed=0, sampler="sobol")
        ex = bs_greeks(100.0, 100.0, 1.0, 0.05, 0.2, 1.0, 0.0)
        assert abs(float(out["price"]) - float(ex["price"])) < 5e-3
        assert abs(float(out["delta"]) - float(ex["delta"])) < 1e-3
        assert abs(float(out["gamma"]) - float(ex["gamma"])) < 1e-4
        assert abs(float(out["vega"]) - float(ex["vega"])) < 0.05
        assert abs(float(out["rho"]) - float(ex["rho"])) < 0.1
        assert abs(float(out["dual_delta"]) - float(ex["dual_delta"])) < 1e-3

    def test_put_and_book(self):
        import jax.numpy as jnp

        spots = jnp.asarray([90.0, 100.0, 110.0])
        b = ContractBatch.make(spots, 100.0, 0.5, 0.03, 0.25, "put")
        out = gp.pallas_mc_price_greeks(b, n_paths=500_000, seed=1, sampler="sobol")
        ex = bs_greeks(spots, 100.0, 0.5, 0.03, 0.25, -1.0, 0.0)
        np.testing.assert_allclose(np.asarray(out["price"]), np.asarray(ex["price"]),
                                   atol=5e-3)
        np.testing.assert_allclose(np.asarray(out["delta"]), np.asarray(ex["delta"]),
                                   atol=2e-3)

    @pytest.mark.slow
    def test_book_keeps_per_contract_qmc_accuracy(self):
        """Each contract in a book sees the full Sobol net under its own
        digital scramble — book error must stay within ~2x the
        single-contract QMC error at the same per-contract path budget
        (round-1 weakness: books saw strided subsequences)."""
        spots = np.linspace(85.0, 115.0, 8).astype(np.float32)
        book = ContractBatch.make(jnp.asarray(spots), 100.0, 1.0, 0.05, 0.2, "call")
        n_paths = 250_000
        out = gp.pallas_mc_price_greeks(book, n_paths=n_paths, seed=0, sampler="sobol")
        exact = np.asarray(bs_greeks(spots, 100.0, 1.0, 0.05, 0.2, 1.0, 0.0)["price"])
        book_err = np.max(np.abs(np.asarray(out["price"]) - exact))

        single_errs = []
        for s in spots[:3]:
            b1 = ContractBatch.make(float(s), 100.0, 1.0, 0.05, 0.2, "call")
            o1 = gp.pallas_mc_price_greeks(b1, n_paths=n_paths, seed=0, sampler="sobol")
            e1 = float(bs_greeks(float(s), 100.0, 1.0, 0.05, 0.2, 1.0, 0.0)["price"])
            single_errs.append(abs(float(o1["price"]) - e1))
        single_err = max(max(single_errs), 2e-4)  # f32 noise floor
        assert book_err <= 2.0 * single_err + 5e-4, (book_err, single_errs)

    def test_scramble_seed_changes_estimate(self):
        b = ContractBatch.make(100.0, 100.0, 1.0, 0.05, 0.2, "call")
        p0 = float(gp.pallas_mc_price_greeks(b, n_paths=500_000, seed=0, sampler="sobol")["price"])
        p1 = float(gp.pallas_mc_price_greeks(b, n_paths=500_000, seed=7, sampler="sobol")["price"])
        assert p0 != p1
        assert abs(p0 - 10.450583572185565) < 5e-3
        assert abs(p1 - 10.450583572185565) < 5e-3


class TestDifferentiablePrimal:
    """Regression: pallas_mc_price is callable DIRECTLY (round-1 bug: the
    primal body referenced an undefined `sampler`), and its custom VJP sums
    cotangents over broadcast dimensions."""

    @pytest.mark.parametrize("sampler", ["sobol", "prng"])
    def test_direct_call_matches_greeks_price(self, sampler):
        b = ContractBatch.make(100.0, 100.0, 1.0, 0.05, 0.2, "call")
        p = gp.pallas_mc_price(b, 100_000, 0, sampler)
        ref = gp.pallas_mc_price_greeks(b, n_paths=100_000, seed=0, sampler=sampler)
        np.testing.assert_allclose(np.asarray(p), np.asarray(ref["price"]), rtol=0, atol=0)

    def test_grad_matches_kernel_greeks(self):
        b = ContractBatch.make(100.0, 100.0, 1.0, 0.05, 0.2, "call")
        g = jax.grad(lambda bb: gp.pallas_mc_price(bb, 200_000, 0, "sobol"))(b)
        out = gp.pallas_mc_price_greeks(b, n_paths=200_000, seed=0, sampler="sobol")
        np.testing.assert_allclose(float(g.spot), float(out["delta"]), rtol=1e-6)
        np.testing.assert_allclose(float(g.vol), float(out["vega"]), rtol=1e-6)
        np.testing.assert_allclose(float(g.strike), float(out["dual_delta"]), rtol=1e-6)
        np.testing.assert_allclose(float(g.rate), float(out["rho"]), rtol=1e-6)
        np.testing.assert_allclose(float(g.maturity), -float(out["theta"]), rtol=1e-6)

    def test_grad_sums_over_broadcast_fields(self):
        """Scalar strike shared across a 3-contract book: d(sum price)/dK
        must be the SUM of per-contract dual-deltas, with scalar shape."""
        spots = jnp.asarray([90.0, 100.0, 110.0])
        b = ContractBatch.make(spots, 100.0, 1.0, 0.05, 0.2, "call")
        assert jnp.shape(b.strike) == ()  # premise: strike really is scalar
        g = jax.grad(lambda bb: jnp.sum(gp.pallas_mc_price(bb, 100_000, 0, "sobol")))(b)
        out = gp.pallas_mc_price_greeks(b, n_paths=100_000, seed=0, sampler="sobol")
        assert jnp.shape(g.strike) == ()
        np.testing.assert_allclose(float(g.strike), float(jnp.sum(out["dual_delta"])),
                                   rtol=1e-5)
        # per-contract field keeps its per-contract gradient
        assert g.spot.shape == (3,)
        np.testing.assert_allclose(np.asarray(g.spot), np.asarray(out["delta"]),
                                   rtol=1e-5)


class TestSobolReplicationStderr:
    """With reps % 8 == 0 (books of <= 32 contracts at TARGET_ROWS=256)
    the kernel runs 8 independently-scrambled replicates per contract
    and the quoted stderr is the randomized-QMC replication estimate —
    it must track the TRUE seed-to-seed dispersion (the plain
    sqrt(Var/n) formula is wrong in both directions under QMC)."""

    def test_stderr_is_calibrated(self):
        b = ContractBatch.make(100.0, 100.0, 1.0, 0.05, 0.2, "call")
        exact = 10.450583572185565
        prices, ses = [], []
        for seed in range(6):
            out = gp.pallas_mc_price_greeks(b, n_paths=500_000, seed=seed,
                                            sampler="sobol")
            prices.append(float(out["price"]))
            ses.append(float(out["std_error"]))
        err = np.asarray(prices) - exact
        rms = float(np.sqrt(np.mean(err**2)))
        med = float(np.median(ses))
        assert 0.3 * rms < med < 3.5 * rms + 1e-7, (rms, ses)
        assert abs(float(err.mean())) < 5 * med

    def test_price_only_path_quotes_replication_stderr_too(self):
        p, se = gp.pallas_mc_price_only(
            ContractBatch.make(100.0, 100.0, 1.0, 0.05, 0.2, "call"),
            n_paths=500_000, seed=0, sampler="sobol")
        # QMC error scale: orders of magnitude below the MC sqrt(Var/n)
        # (~1.3e-2 at 500k) but strictly positive
        assert 0.0 < float(se) < 5e-3
