"""Binomial + FDM tests (SURVEY.md §4 patterns: golden values, parity,
American>=European, Greeks vs BS)."""

import jax.numpy as jnp
import numpy as np
import pytest

from optionslab_tpu.models.binomial import BinomialTree, binomial_greeks, binomial_price
from optionslab_tpu.models.black_scholes import bs_greeks, bs_price
from optionslab_tpu.models.fdm import (
    CrankNicolsonSolver,
    ExplicitFDMSolver,
    explicit_fdm_stable_steps,
    fdm_price,
)
from optionslab_tpu.types import ContractBatch
from optionslab_tpu.utils.exceptions import ValidationError

F = jnp.float64
ATM = (100.0, 100.0, 1.0, 0.05, 0.2)
BS_CALL = 10.450583572185565
BS_PUT = 5.573526022256971


def _batch(option_type="call", **kw):
    S, K, T, r, sig = ATM
    p = dict(S=S, K=K, T=T, r=r, sig=sig, q=0.0)
    p.update(kw)
    return ContractBatch.make(p["S"], p["K"], p["T"], p["r"], p["sig"], option_type, p["q"], dtype=F)


class TestBinomial:
    def test_european_converges_to_bs(self):
        p = float(binomial_price(_batch(), n_steps=2000))
        assert abs(p - BS_CALL) < 5e-3

    def test_put_call_parity(self):
        c = float(binomial_price(_batch("call"), n_steps=500))
        p = float(binomial_price(_batch("put"), n_steps=500))
        assert abs((c - p) - (100 - 100 * np.exp(-0.05))) < 2e-2

    def test_american_put_geq_european(self):
        am = float(binomial_price(_batch("put"), american=True, n_steps=500))
        eu = float(binomial_price(_batch("put"), american=False, n_steps=500))
        assert am >= eu
        assert am - eu > 0.1  # early exercise premium is material here

    def test_american_call_no_dividend_equals_european(self):
        am = float(binomial_price(_batch("call"), american=True, n_steps=500))
        eu = float(binomial_price(_batch("call"), american=False, n_steps=500))
        assert abs(am - eu) < 1e-6

    @pytest.mark.slow
    def test_greeks_vs_bs(self):
        g = binomial_greeks(_batch(), n_steps=1000)
        ex = bs_greeks(*[jnp.asarray(v, F) for v in ATM], 1.0, 0.0)
        assert abs(float(g["delta"]) - float(ex["delta"])) < 1e-3
        assert abs(float(g["gamma"]) - float(ex["gamma"])) < 1e-3
        assert abs(float(g["vega"]) - float(ex["vega"])) < 0.1
        assert abs(float(g["rho"]) - float(ex["rho"])) < 0.1
        assert abs(float(g["theta"]) - float(ex["theta"])) < 0.05

    def test_batched_book(self):
        spots = jnp.linspace(80.0, 120.0, 5, dtype=F)
        b = ContractBatch.make(spots, 100.0, 1.0, 0.05, 0.2, "call", dtype=F)
        p = binomial_price(b, n_steps=200)
        assert p.shape == (5,)
        assert bool(jnp.all(jnp.diff(p) > 0))

    def test_object_adapter_and_validation(self):
        tree = BinomialTree(n_steps=100)
        assert abs(float(tree.price(*ATM)) - BS_CALL) < 0.05
        with pytest.raises(ValidationError):
            BinomialTree(n_steps=2)

    def test_expired(self):
        assert float(binomial_price(_batch(T=0.0, S=111.0), n_steps=100)) == pytest.approx(11.0)


class TestFDM:
    def test_cn_call_put(self):
        assert abs(float(fdm_price(_batch("call"), 401, 400)) - BS_CALL) < 5e-3
        assert abs(float(fdm_price(_batch("put"), 401, 400)) - BS_PUT) < 5e-3

    def test_cn_american_put_matches_binomial(self):
        cn = float(fdm_price(_batch("put"), 401, 400, american=True))
        bi = float(binomial_price(_batch("put"), american=True, n_steps=1000))
        assert abs(cn - bi) < 2e-2

    def test_policy_iteration_beats_projection(self):
        """Howard LCP solve + kink-mid grid vs the reference-style
        first-order projection, against the converged American put value
        (CRR Richardson limit ≈ 6.09040; CRR@2001 itself carries +7e-4
        discretization bias, measured in-repo)."""
        true_val = 6.09040
        pol = float(fdm_price(_batch("put"), 201, 200, american=True,
                              american_method="policy"))
        proj = float(fdm_price(_batch("put"), 201, 200, american=True,
                               american_method="projection"))
        assert abs(pol - true_val) < 2.5e-3
        assert abs(pol - true_val) < abs(proj - true_val)
        fine = float(fdm_price(_batch("put"), 801, 800, american=True,
                               american_method="policy"))
        assert abs(fine - true_val) < 4e-4

    def test_implicit_scheme(self):
        p = float(fdm_price(_batch(), 401, 400, scheme="implicit"))
        assert abs(p - BS_CALL) < 2e-2

    def test_explicit_stable(self):
        n = explicit_fdm_stable_steps(0.2, 1.0, 201)
        solver = ExplicitFDMSolver(n_space=201, n_time=max(n, 1000))
        p = float(solver.price(*ATM))
        assert abs(p - BS_CALL) < 5e-2

    def test_bad_scheme_raises(self):
        with pytest.raises(ValidationError):
            fdm_price(_batch(), 401, 10, scheme="magic")
        with pytest.raises(ValidationError):
            fdm_price(_batch(), 400, 10)  # even n_space

    def test_moneyness_sweep(self):
        spots = jnp.asarray([70.0, 100.0, 130.0], F)
        b = ContractBatch.make(spots, 100.0, 1.0, 0.05, 0.2, "call", dtype=F)
        p = np.asarray(fdm_price(b, 401, 200))
        exact = np.asarray(bs_price(spots, 100.0, 1.0, 0.05, 0.2, 1.0, 0.0))
        np.testing.assert_allclose(p, exact, atol=2e-2)

    def test_solver_object(self):
        cn = CrankNicolsonSolver(n_space=201, n_time=100)
        assert abs(float(cn.price(*ATM)) - BS_CALL) < 0.05


class TestLocalVol:
    def test_flat_surface_reproduces_bs(self):
        import jax.numpy as jnp

        from optionslab_tpu.models.local_vol import DupireLocalVol, local_vol_mc_price

        flat = lambda k, t: jnp.asarray(0.2) + 0.0 * k + 0.0 * t
        lv = DupireLocalVol(flat, 100.0, 0.05)
        # PDE pricer
        assert abs(float(lv.price(100.0, 100.0, 1.0)) - BS_CALL) < 2e-2
        # MC pricer
        p, se = local_vol_mc_price(lv, 100.0, 1.0, n_paths=200_000)
        assert abs(float(p) - BS_CALL) < 3 * float(se) + 5e-3

    @pytest.mark.slow
    def test_smile_consistency_mc_reprices_vanillas(self):
        """The Dupire round-trip: IV surface → local vol → MC → must return
        the input smile's BS prices (the fundamental consistency property)."""
        import jax.numpy as jnp

        from optionslab_tpu.models.local_vol import (
            DupireLocalVol,
            local_vol_mc_price,
            sample_smile_iv_fn,
        )

        smile = sample_smile_iv_fn()
        lv = DupireLocalVol(smile, 100.0, 0.05)
        for strike in (90.0, 100.0, 110.0):
            k = float(jnp.log(strike / (100.0 * np.exp(0.05))))
            iv = float(smile(jnp.asarray(k), jnp.asarray(1.0)))
            target = float(bs_price(100.0, strike, 1.0, 0.05, iv, 1.0, 0.0))
            p, se = local_vol_mc_price(lv, strike, 1.0, n_paths=200_000, n_steps=150)
            assert abs(float(p) - target) < 3 * float(se) + 2e-2, strike

    def test_asian_under_local_vol(self):
        from optionslab_tpu.models.local_vol import (
            DupireLocalVol,
            local_vol_mc_price,
            sample_smile_iv_fn,
        )

        lv = DupireLocalVol(sample_smile_iv_fn(), 100.0, 0.05)
        p_asian, _ = local_vol_mc_price(lv, 100.0, 1.0, payoff="asian", n_paths=100_000)
        p_euro, _ = local_vol_mc_price(lv, 100.0, 1.0, n_paths=100_000)
        assert 0 < float(p_asian) < float(p_euro)

    def test_bad_payoff_raises(self):
        import jax.numpy as jnp

        from optionslab_tpu.models.local_vol import DupireLocalVol, local_vol_mc_price
        from optionslab_tpu.utils.exceptions import ValidationError

        flat = lambda k, t: jnp.asarray(0.2) + 0.0 * k + 0.0 * t
        lv = DupireLocalVol(flat, 100.0, 0.05, n_k=21, n_t=6)
        with pytest.raises(ValidationError):
            local_vol_mc_price(lv, 100.0, 1.0, payoff="rainbow")


class TestLeisenReimer:
    def test_lr_converges_500x_faster_than_crr(self):
        lr = float(binomial_price(_batch(), n_steps=101, method="leisen-reimer"))
        crr = float(binomial_price(_batch(), n_steps=101))
        assert abs(lr - BS_CALL) < 1e-4
        assert abs(lr - BS_CALL) * 50 < abs(crr - BS_CALL)

    def test_lr_american_put(self):
        lr = float(binomial_price(_batch("put"), american=True, n_steps=201,
                                  method="leisen-reimer"))
        crr = float(binomial_price(_batch("put"), american=True, n_steps=2001))
        assert abs(lr - crr) < 5e-3

    def test_lr_greeks_match_bs(self):
        g = binomial_greeks(_batch(), n_steps=201, method="leisen-reimer")
        ex = bs_greeks(*[jnp.asarray(v, F) for v in ATM], 1.0, 0.0)
        assert abs(float(g["delta"]) - float(ex["delta"])) < 1e-3
        assert abs(float(g["vega"]) - float(ex["vega"])) < 0.05

    def test_object_api_rounds_to_odd(self):
        tree = BinomialTree(n_steps=100, method="leisen-reimer")
        assert tree.n_steps == 101
        assert abs(float(tree.price(*ATM)) - BS_CALL) < 1e-3
        with pytest.raises(ValidationError):
            BinomialTree(method="trinomial")
