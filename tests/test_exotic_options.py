"""Exotic option tests mirroring the reference's parity-property strategy
(SURVEY.md §4 item 2, reference ``tests/test_exotic_options.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optionslab_tpu.models.binomial import binomial_price
from optionslab_tpu.models.black_scholes import bs_price
from optionslab_tpu.models.exotics import (
    AmericanOptionLSM,
    AsianOption,
    AutocallableNote,
    BarrierOption,
    CliquetOption,
    LookbackOption,
    geometric_asian_closed_form,
)
from optionslab_tpu.types import ContractBatch
from optionslab_tpu.utils.exceptions import ValidationError

EURO_CALL = 10.450583572185565
ATM = (100.0, 100.0, 1.0, 0.05, 0.2)


class TestAsian:
    def test_asian_below_european(self):
        p = float(AsianOption(*ATM, n_paths=100_000).price())
        assert p < EURO_CALL

    def test_geometric_mc_vs_closed_form(self):
        opt = AsianOption(*ATM, averaging="geometric", n_paths=200_000, n_steps=64)
        p, se = opt.price(return_stderr=True)
        cf = float(geometric_asian_closed_form(*ATM, 1.0, 0.0, 64))
        assert abs(float(p) - cf) < max(3 * float(se), 0.05)

    def test_geometric_below_arithmetic(self):
        pg = float(AsianOption(*ATM, averaging="geometric", n_paths=100_000, seed=1).price())
        pa = float(AsianOption(*ATM, averaging="arithmetic", n_paths=100_000, seed=1).price())
        assert pg < pa  # AM-GM

    def test_determinism(self):
        p1 = float(AsianOption(*ATM, seed=7, n_paths=20_000).price())
        p2 = float(AsianOption(*ATM, seed=7, n_paths=20_000).price())
        assert p1 == p2

    def test_bad_averaging_raises(self):
        with pytest.raises(ValidationError):
            AsianOption(*ATM, averaging="harmonic", n_paths=1000).price()


class TestBarrier:
    def test_in_plus_out_equals_european(self):
        common = dict(n_paths=200_000, n_steps=64, seed=5)
        ki = float(BarrierOption(100.0, 100.0, 120.0, 1.0, 0.05, 0.2,
                                 barrier_type="up-and-in", **common).price())
        ko = float(BarrierOption(100.0, 100.0, 120.0, 1.0, 0.05, 0.2,
                                 barrier_type="up-and-out", **common).price())
        # same seed → KI+KO is the same-path European estimate
        assert abs((ki + ko) - EURO_CALL) < 0.15

    def test_knockout_below_european(self):
        ko = float(BarrierOption(100.0, 100.0, 130.0, 1.0, 0.05, 0.2,
                                 barrier_type="up-and-out", n_paths=100_000).price())
        assert ko < EURO_CALL

    def test_far_barrier_is_european(self):
        ko = float(BarrierOption(100.0, 100.0, 1000.0, 1.0, 0.05, 0.2,
                                 barrier_type="up-and-out", n_paths=100_000).price())
        assert abs(ko - EURO_CALL) < 0.2

    def test_down_and_out_put(self):
        p = float(BarrierOption(100.0, 100.0, 70.0, 1.0, 0.05, 0.2, "put",
                                barrier_type="down-and-out", n_paths=100_000).price())
        euro_put = float(bs_price(100.0, 100.0, 1.0, 0.05, 0.2, -1.0, 0.0))
        assert 0 < p < euro_put

    def test_rebate(self):
        no_reb = float(BarrierOption(100.0, 100.0, 110.0, 1.0, 0.05, 0.2,
                                     barrier_type="up-and-out", n_paths=50_000, seed=2).price())
        reb = float(BarrierOption(100.0, 100.0, 110.0, 1.0, 0.05, 0.2,
                                  barrier_type="up-and-out", rebate=5.0,
                                  n_paths=50_000, seed=2).price())
        assert reb > no_reb

    def test_bad_type_raises(self):
        with pytest.raises(ValidationError):
            BarrierOption(100.0, 100.0, 120.0, 1.0, 0.05, 0.2,
                          barrier_type="sideways-and-out", n_paths=1000).price()


class TestLookback:
    def test_floating_call_above_european(self):
        p = float(LookbackOption(*ATM, n_paths=100_000).price())
        assert p > EURO_CALL

    def test_fixed_call_geq_european(self):
        p = float(LookbackOption(*ATM, floating=False, n_paths=100_000).price())
        assert p >= EURO_CALL - 0.1  # max >= terminal

    def test_floating_put(self):
        p = float(LookbackOption(100.0, 100.0, 1.0, 0.05, 0.2, "put",
                                 n_paths=100_000).price())
        euro_put = float(bs_price(100.0, 100.0, 1.0, 0.05, 0.2, -1.0, 0.0))
        assert p > euro_put


class TestAmericanLSM:
    def test_put_above_european_below_binomial_plus_3se(self):
        opt = AmericanOptionLSM(100.0, 100.0, 1.0, 0.05, 0.2, n_paths=200_000, n_dates=50)
        p, se = opt.price(return_stderr=True)
        euro_put = float(bs_price(100.0, 100.0, 1.0, 0.05, 0.2, -1.0, 0.0))
        tree = float(binomial_price(
            ContractBatch.make(100.0, 100.0, 1.0, 0.05, 0.2, "put", dtype=jnp.float64),
            american=True, n_steps=1000))
        assert float(p) > euro_put  # early-exercise premium captured
        assert float(p) < tree + 3 * float(se)  # LSM is low-biased

    def test_american_call_no_div_close_to_european(self):
        opt = AmericanOptionLSM(100.0, 100.0, 1.0, 0.05, 0.2, option_type="call",
                                n_paths=100_000, n_dates=25)
        p = float(opt.price())
        assert abs(p - EURO_CALL) / EURO_CALL < 0.1

    def test_exercise_boundary_shape(self):
        opt = AmericanOptionLSM(100.0, 100.0, 1.0, 0.05, 0.2, n_paths=20_000, n_dates=20)
        bd = np.asarray(opt.exercise_boundary())
        assert bd.shape == (19,)
        finite = bd[np.isfinite(bd)]
        assert finite.size > 0 and np.all(finite < 100.0)  # put boundary below strike


class TestStructured:
    def test_autocallable_bounds(self):
        p = float(AutocallableNote(100.0, 1.0, 0.03, 0.25, n_paths=50_000).price())
        assert 50.0 < p < 100.0 * (1 + 0.08)

    def test_autocallable_higher_vol_lower_price(self):
        lo = float(AutocallableNote(100.0, 1.0, 0.03, 0.15, n_paths=50_000, seed=1).price())
        hi = float(AutocallableNote(100.0, 1.0, 0.03, 0.45, n_paths=50_000, seed=1).price())
        assert hi < lo  # short downside put dominates

    def test_cliquet_bounds(self):
        cl = CliquetOption(100.0, 1.0, 0.03, 0.25, local_floor=-0.05, local_cap=0.05,
                           global_floor=0.0, n_periods=12, n_paths=50_000)
        p = float(cl.price())
        # payoff in [global_floor, 12*local_cap] => price in [0, notional*0.6]
        assert 0.0 <= p <= 100.0 * 0.60

    def test_cliquet_global_floor_binds(self):
        floored = float(CliquetOption(100.0, 1.0, 0.03, 0.25, global_floor=0.1,
                                      n_paths=50_000, seed=2).price())
        unfloored = float(CliquetOption(100.0, 1.0, 0.03, 0.25, global_floor=0.0,
                                        n_paths=50_000, seed=2).price())
        assert floored > unfloored


class TestContinuousBarrier:
    @staticmethod
    def _uo_call_closed_form(S, K, B, T, r, sig):
        """Merton/Haug continuous up-and-out call (K < B)."""
        from scipy.stats import norm as nd

        mu = (r - sig**2 / 2) / sig**2
        srt = sig * np.sqrt(T)
        x2 = np.log(S / B) / srt + (1 + mu) * srt
        y1 = np.log(B * B / (S * K)) / srt + (1 + mu) * srt
        y2 = np.log(B / S) / srt + (1 + mu) * srt
        d1 = (np.log(S / K) + (r + sig**2 / 2) * T) / srt
        vanilla = S * nd.cdf(d1) - K * np.exp(-r * T) * nd.cdf(d1 - srt)
        Bt = S * nd.cdf(x2) - K * np.exp(-r * T) * nd.cdf(x2 - srt)
        C = S * (B / S) ** (2 * (mu + 1)) * nd.cdf(-y1) \
            - K * np.exp(-r * T) * (B / S) ** (2 * mu) * nd.cdf(-(y1 - srt))
        D = S * (B / S) ** (2 * (mu + 1)) * nd.cdf(-y2) \
            - K * np.exp(-r * T) * (B / S) ** (2 * mu) * nd.cdf(-(y2 - srt))
        up_and_in = Bt - C + D
        return vanilla - up_and_in

    def test_bridge_removes_discrete_bias(self):
        cf = self._uo_call_closed_form(100.0, 100.0, 120.0, 1.0, 0.05, 0.2)
        opt = BarrierOption(100.0, 100.0, 120.0, 1.0, 0.05, 0.2,
                            barrier_type="up-and-out", n_paths=300_000,
                            n_steps=32, continuous=True)
        p, se = opt.price(return_stderr=True)
        assert abs(float(p) - cf) < 3 * float(se) + 5e-3
        # discrete monitoring at 32 steps is badly biased upward vs continuous
        disc = BarrierOption(100.0, 100.0, 120.0, 1.0, 0.05, 0.2,
                             barrier_type="up-and-out", n_paths=300_000,
                             n_steps=32).price()
        assert float(disc) - cf > 0.1

    def test_bridge_knock_in_out_parity(self):
        common = dict(n_paths=200_000, n_steps=32, seed=4, continuous=True)
        ki = float(BarrierOption(100.0, 100.0, 125.0, 1.0, 0.05, 0.2,
                                 barrier_type="up-and-in", **common).price())
        ko = float(BarrierOption(100.0, 100.0, 125.0, 1.0, 0.05, 0.2,
                                 barrier_type="up-and-out", **common).price())
        assert abs((ki + ko) - EURO_CALL) < 0.15
