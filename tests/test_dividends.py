"""Discrete cash dividends: PDE jump condition + exact MC.

Oracles: zero dividends reduce to the vanilla engines; EXACT dividend
put-call parity C - P = S0 - PV(divs) - K e^{-rT} for both engines;
PDE == MC within MC noise; American call early exercise appears exactly
when a large dividend makes it optimal (Merton: never without one).
"""

import numpy as np
import pytest

from optionslab_tpu.models.black_scholes import bs_price
from optionslab_tpu.models.dividends import (dividend_parity_gap,
                                             fdm_price_discrete_dividends,
                                             mc_price_discrete_dividends)
from optionslab_tpu.utils.exceptions import ValidationError

S, K, T, R, SIG = 100.0, 100.0, 1.0, 0.05, 0.2
DIVS = [(0.3, 2.0), (0.8, 2.5)]


class TestReductions:
    def test_no_dividends_matches_bs(self):
        for cp in (1.0, -1.0):
            got = fdm_price_discrete_dividends(S, K, T, R, SIG, [], cp=cp,
                                               n_space=301, n_time=200)
            want = float(bs_price(S, K, T, R, SIG, cp, 0.0))
            assert abs(got - want) < 0.01, (cp, got, want)

    def test_no_dividends_mc_matches_bs(self):
        p, se = mc_price_discrete_dividends(S, K, T, R, SIG, [],
                                            n_paths=262_144)
        want = float(bs_price(S, K, T, R, SIG, 1.0, 0.0))
        assert abs(p - want) < 3 * se + 1e-3

    def test_dividends_lower_the_call_raise_the_put(self):
        c = fdm_price_discrete_dividends(S, K, T, R, SIG, DIVS, cp=1.0)
        p = fdm_price_discrete_dividends(S, K, T, R, SIG, DIVS, cp=-1.0)
        c0 = float(bs_price(S, K, T, R, SIG, 1.0, 0.0))
        p0 = float(bs_price(S, K, T, R, SIG, -1.0, 0.0))
        assert c < c0 - 1.0
        assert p > p0 + 1.0


class TestParityOracle:
    def test_pde_parity_exact(self):
        c = fdm_price_discrete_dividends(S, K, T, R, SIG, DIVS, cp=1.0)
        p = fdm_price_discrete_dividends(S, K, T, R, SIG, DIVS, cp=-1.0)
        gap = dividend_parity_gap(c, p, S, K, T, R, DIVS)
        assert gap < 0.02, gap

    def test_mc_parity_exact(self):
        c, se_c = mc_price_discrete_dividends(S, K, T, R, SIG, DIVS, cp=1.0,
                                              n_paths=262_144, seed=1)
        p, se_p = mc_price_discrete_dividends(S, K, T, R, SIG, DIVS, cp=-1.0,
                                              n_paths=262_144, seed=1)
        gap = dividend_parity_gap(c, p, S, K, T, R, DIVS)
        # same paths cancel the optionality, but C - P = df·mean(S_T) - K df
        # still carries the (antithetic-damped) MC error of mean(S_T):
        # ~0.004 at 262k paths. Bound by that scale, not float precision.
        assert gap < 0.012, gap

    def test_pde_matches_mc(self):
        for cp in (1.0, -1.0):
            pde = fdm_price_discrete_dividends(S, K, T, R, SIG, DIVS, cp=cp,
                                               n_space=401, n_time=400)
            mc, se = mc_price_discrete_dividends(S, K, T, R, SIG, DIVS,
                                                 cp=cp, n_paths=524_288,
                                                 seed=2)
            assert abs(pde - mc) < 3 * se + 0.03, (cp, pde, mc, se)


class TestAmerican:
    def test_american_call_no_dividends_equals_european(self):
        am = fdm_price_discrete_dividends(S, K, T, R, SIG, [], cp=1.0,
                                          american=True)
        eu = fdm_price_discrete_dividends(S, K, T, R, SIG, [], cp=1.0)
        assert abs(am - eu) < 0.01  # Merton: never exercise early

    def test_big_dividend_makes_american_call_worth_more(self):
        big = [(0.5, 8.0)]
        am = fdm_price_discrete_dividends(S, K, T, R, SIG, big, cp=1.0,
                                          american=True)
        eu = fdm_price_discrete_dividends(S, K, T, R, SIG, big, cp=1.0)
        assert am > eu + 0.1, (am, eu)
        # and the premium is bounded by the no-dividend call (exercise
        # just before the ex-date forfeits remaining optionality)
        c0 = float(bs_price(S, K, T, R, SIG, 1.0, 0.0))
        assert am < c0 + 0.05

    def test_american_put_dominates_european(self):
        am = fdm_price_discrete_dividends(S, K, T, R, SIG, DIVS, cp=-1.0,
                                          american=True)
        eu = fdm_price_discrete_dividends(S, K, T, R, SIG, DIVS, cp=-1.0)
        assert am > eu
        # dividends DELAY put exercise -> premium below no-div American
        from optionslab_tpu.models.binomial import binomial_price
        from optionslab_tpu.types import ContractBatch

        bat = ContractBatch.make(S, K, T, R, SIG, "put")
        am_nodiv = float(binomial_price(bat, n_steps=2001, american=True))
        assert am - eu < am_nodiv - float(bs_price(S, K, T, R, SIG, -1.0, 0.0))


class TestValidation:
    def test_bad_inputs(self):
        with pytest.raises(ValidationError):
            fdm_price_discrete_dividends(S, K, T, R, SIG, [(1.5, 1.0)])
        with pytest.raises(ValidationError):
            fdm_price_discrete_dividends(S, K, T, R, SIG, [(0.5, -1.0)])
        with pytest.raises(ValidationError):
            mc_price_discrete_dividends(S, K, T, R, SIG, DIVS, n_paths=3)
        with pytest.raises(ValidationError):
            # two dividends inside one time step
            fdm_price_discrete_dividends(S, K, T, R, SIG,
                                         [(0.5, 1.0), (0.5001, 1.0)],
                                         n_time=100)
