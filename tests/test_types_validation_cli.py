"""ContractBatch pytree, pricing-validation module, and CLI smoke tests."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optionslab_tpu.cli import main as cli_main
from optionslab_tpu.models.black_scholes import bs_greeks, bs_price
from optionslab_tpu.models.validation import (
    check_greeks_consistency,
    check_price_bounds,
    check_put_call_parity,
    check_smile_butterfly,
    mc_convergence_study,
    validate_pricer,
)
from optionslab_tpu.types import ContractBatch
from optionslab_tpu.utils.exceptions import ValidationError

F = jnp.float64


class TestContractBatch:
    def test_broadcast_and_shape(self):
        b = ContractBatch.make([90.0, 100.0, 110.0], 100.0, 1.0, 0.05, 0.2, "call")
        assert b.shape == (3,)
        bb = b.broadcast()
        assert bb.strike.shape == (3,)

    def test_mixed_option_types(self):
        b = ContractBatch.make(100.0, 100.0, 1.0, 0.05, 0.2, ["call", "put", "call"])
        np.testing.assert_array_equal(np.asarray(b.cp), [1.0, -1.0, 1.0])

    def test_is_pytree(self):
        b = ContractBatch.make(100.0, 100.0, 1.0, 0.05, 0.2, "put")
        leaves = jax.tree.leaves(b)
        assert len(leaves) == 7
        b2 = jax.tree.map(lambda x: x * 2, b)
        assert float(b2.spot) == 200.0

    def test_replace_and_astype(self):
        b = ContractBatch.make(100.0, 100.0, 1.0, 0.05, 0.2, "call")
        b2 = b.replace(vol=0.3)
        assert float(b2.vol) == pytest.approx(0.3)
        b3 = b.astype(jnp.float64)
        assert b3.spot.dtype == jnp.float64

    def test_intrinsic_with_path_axis(self):
        b = ContractBatch.make([100.0, 90.0], 100.0, 1.0, 0.05, 0.2, ["call", "put"])
        paths = jnp.asarray([[95.0, 105.0], [95.0, 105.0]])  # (2 contracts, 2 paths)
        pay = b.intrinsic(paths)
        np.testing.assert_allclose(np.asarray(pay), [[0.0, 5.0], [5.0, 0.0]])

    def test_forward_and_discount(self):
        b = ContractBatch.make(100.0, 100.0, 1.0, 0.05, 0.2, "call", 0.02, dtype=F)
        assert float(b.forward()) == pytest.approx(100.0 * np.exp(0.03))
        assert float(b.discount()) == pytest.approx(np.exp(-0.05))

    def test_unknown_type_raises(self):
        with pytest.raises(ValidationError):
            ContractBatch.make(100.0, 100.0, 1.0, 0.05, 0.2, "straddle")


class TestValidationModule:
    def test_parity_pass_and_fail(self):
        S, K, T, r = (jnp.asarray(x, F) for x in (100.0, 100.0, 1.0, 0.05))
        c = bs_price(S, K, T, r, jnp.asarray(0.2, F), 1.0, 0.0)
        p = bs_price(S, K, T, r, jnp.asarray(0.2, F), -1.0, 0.0)
        assert check_put_call_parity(c, p, S, K, T, r)["passed"]
        assert not check_put_call_parity(c + 0.01, p, S, K, T, r)["passed"]

    def test_bounds(self):
        rep = check_price_bounds(10.45, 100.0, 100.0, 1.0, 0.05, 1.0)
        assert rep["passed"]
        rep2 = check_price_bounds(150.0, 100.0, 100.0, 1.0, 0.05, 1.0)
        assert not rep2["passed"]

    def test_greeks_consistency(self):
        g = bs_greeks(100.0, 100.0, 1.0, 0.05, 0.2, 1.0, 0.0)
        assert check_greeks_consistency(g, cp=1.0)["passed"]
        bad = dict(g)
        bad["gamma"] = -abs(np.asarray(g["gamma"]))
        rep = check_greeks_consistency(bad, cp=1.0)
        assert not rep["passed"] and "negative gamma" in rep["issues"]

    def test_smile_butterfly(self):
        k = np.linspace(-0.4, 0.4, 21)
        assert check_smile_butterfly(k, 0.04 + 0.02 * k**2)["passed"]
        assert not check_smile_butterfly(k, 0.04 + 2.5 * np.abs(k))["passed"]

    def test_mc_convergence(self):
        rep = mc_convergence_study(path_counts=(1_000, 8_000, 64_000))
        assert rep["converged"], rep

    def test_validate_pricer_bs(self):
        rep = validate_pricer(lambda S, K, T, r, s, cp, q: bs_price(S, K, T, r, s, cp, q))
        assert rep["passed"]


class TestCLI:
    def test_price_json(self, capsys):
        cli_main(["price", "--model", "bs"])
        out = json.loads(capsys.readouterr().out)
        assert abs(out["price"] - 10.4506) < 1e-3

    def test_greeks_json(self, capsys):
        cli_main(["greeks"])
        out = json.loads(capsys.readouterr().out)
        assert 0.5 < out["delta"] < 0.75

    def test_iv_json(self, capsys):
        cli_main(["iv", "--price", "10.4506"])
        out = json.loads(capsys.readouterr().out)
        assert abs(out["implied_vol"] - 0.2) < 1e-3

    def test_var_json(self, capsys):
        cli_main(["var", "--value", "100"])
        out = json.loads(capsys.readouterr().out)
        assert out["parametric_var"] > 0

    def test_unknown_command_exits(self):
        with pytest.raises(SystemExit):
            cli_main(["teleport"])

    def test_xva_rbergomi_model_routes_to_amc(self, capsys):
        """--model rbergomi implies the AMC engine (vanilla kind) and
        prices the exposure on the exact rough law."""
        cli_main(["xva", "--model", "rbergomi", "--option-type", "put",
                  "--paths", "8192", "--dates", "4"])
        out = json.loads(capsys.readouterr().out)
        assert out["engine"] == "amc" and out["model"] == "rbergomi"
        assert 0.0 < out["epe"] < 20.0 and out["cva"] > 0.0

    @pytest.mark.slow
    def test_american_heston_bracket(self, capsys):
        """--model heston routes to the ADI-surface certified bracket."""
        cli_main(["american", "--type", "put", "--model", "heston",
                  "--n-dates", "6"])
        out = json.loads(capsys.readouterr().out)
        assert out["method"] == "adi"
        assert out["lower"] - 3 * out["lower_se"] \
            <= out["upper"] + 3 * out["upper_se"]
        assert out["width"] < 0.05, out

    def test_book_subcommand(self, capsys):
        """`book` quotes a same-kind contract book in one launch; strike
        monotonicity holds inside the launch."""
        cli_main(["book", "--kind", "asian", "--strikes", "90", "100",
                  "110", "--n-paths", "20000", "--n-steps", "16"])
        out = json.loads(capsys.readouterr().out)
        assert out["kind"] == "asian_arith" and out["n_contracts"] == 3
        p = out["price"]
        assert p[0] > p[1] > p[2] > 0 and len(out["std_error"]) == 3

    def test_book_heston_greeks(self, capsys):
        cli_main(["book", "--kind", "barrier", "--model", "heston",
                  "--strikes", "95", "105", "--barriers", "125", "135",
                  "--greeks", "--n-paths", "20000", "--n-steps", "8"])
        out = json.loads(capsys.readouterr().out)
        assert out["greek_method"] == "likelihood-ratio"
        assert len(out["delta"]) == 2 and all(x > 0 for x in out["price"])

    def test_exotic_greeks_barrier_lr(self, capsys):
        """--greeks routes barriers to the in-kernel LR ladder (hash
        sampler auto-selected off-TPU)."""
        cli_main(["exotic", "--kind", "barrier", "--greeks", "--n-paths",
                  "1", "--n-steps", "4"])
        out = json.loads(capsys.readouterr().out)
        assert out["greek_method"] == "likelihood-ratio"
        assert {"price", "delta", "gamma", "vega", "rho"} <= out.keys()
        assert out["paths"] >= 1

    def test_exotic_greeks_asian_pathwise(self, capsys):
        cli_main(["exotic", "--kind", "asian", "--greeks", "--n-paths", "1",
                  "--n-steps", "4"])
        out = json.loads(capsys.readouterr().out)
        assert out["greek_method"] == "pathwise"
        assert 0.0 < out["delta"] < 1.0

    def test_exotic_slv_routes(self, capsys):
        """--model slv calibrates the Dupire leverage on-the-fly and
        prices under Heston-x-leverage dynamics."""
        cli_main(["exotic", "--kind", "asian", "--model", "slv",
                  "--mixing", "0.5", "--n-paths", "16384", "--n-steps",
                  "8"])
        out = json.loads(capsys.readouterr().out)
        assert out["dynamics"] == "heston-x-dupire-leverage"
        assert out["mixing"] == 0.5
        assert 0.0 < out["price"] < 10.45
        with pytest.raises(SystemExit):
            cli_main(["exotic", "--kind", "american", "--model", "slv"])

    def test_exotic_slv_kernel_greeks(self, capsys):
        """--model slv --greeks routes to the fused replay kernel's
        one-pass LR ladder."""
        cli_main(["exotic", "--kind", "barrier", "--model", "slv",
                  "--greeks", "--n-paths", "1", "--n-steps", "4"])
        out = json.loads(capsys.readouterr().out)
        assert out["greek_method"] == "lr-joint-density"
        assert {"delta", "gamma", "vega_v0", "rho",
                "delta_convention"} <= out.keys()
        assert "sticky-strike" in out["delta_convention"]

    def test_exotic_pay_at_hit_and_rebate(self, capsys):
        """one-touch --pay hit (American binary) and barrier --rebate."""
        cli_main(["exotic", "--kind", "one-touch", "--barrier", "125",
                  "--pay", "hit", "--n-paths", "1", "--n-steps", "8"])
        hit = json.loads(capsys.readouterr().out)
        assert hit["kind"] == "one_touch_up_hit"
        cli_main(["exotic", "--kind", "one-touch", "--barrier", "125",
                  "--n-paths", "1", "--n-steps", "8"])
        exp = json.loads(capsys.readouterr().out)
        assert hit["price"] > exp["price"]  # cash earlier under r > 0
        cli_main(["exotic", "--kind", "barrier", "--barrier", "130",
                  "--rebate", "5", "--n-paths", "1", "--n-steps", "8"])
        reb = json.loads(capsys.readouterr().out)
        assert reb["rebate_pays"] == "at first hit"
        with pytest.raises(SystemExit):
            cli_main(["exotic", "--kind", "no-touch", "--pay", "hit"])

    def test_exotic_lv_routes(self, capsys):
        """--model lv: the Dupire local-vol kernel over the facade,
        price and the sticky-strike LR ladder."""
        cli_main(["exotic", "--kind", "double-touch", "--model", "lv",
                  "--touch", "no", "--lower", "80", "--upper", "130",
                  "--n-paths", "1", "--n-steps", "8"])
        out = json.loads(capsys.readouterr().out)
        assert out["kind"] == "no_touch_double"
        assert out["dynamics"] == "dupire-local-vol"
        assert 0.0 < out["price"] < 1.0
        cli_main(["exotic", "--kind", "barrier", "--model", "lv",
                  "--barrier", "130", "--greeks", "--n-paths", "1",
                  "--n-steps", "8"])
        out = json.loads(capsys.readouterr().out)
        assert out["greek_method"] == "lr-sticky-strike"
        assert {"delta", "gamma", "vega", "fit_residual"} <= out.keys()
        # structured kinds route under pure LV (round-3 feature: the SLV
        # engine at mixing=0). 8 periods x local cap 0.05 on notional 100
        # with global floor 0 => discounted payoff in (0, 40).
        cli_main(["exotic", "--kind", "cliquet", "--model", "lv",
                  "--n-paths", "512", "--n-steps", "8"])
        out = json.loads(capsys.readouterr().out)
        assert out["dynamics"] == "dupire-local-vol"
        assert out["engine"] == "slv-scan-mixing0"
        assert 0.0 < out["price"] < 40.0

    def test_exotic_slv_double_greeks(self, capsys):
        """slv double kinds now reach the replay-kernel LR ladder."""
        cli_main(["exotic", "--kind", "double-barrier", "--model", "slv",
                  "--knock", "out", "--lower", "80", "--upper", "130",
                  "--greeks", "--n-paths", "1", "--n-steps", "4"])
        out = json.loads(capsys.readouterr().out)
        assert out["kind"] == "barrier_double-out"
        assert out["greek_method"] == "lr-joint-density"
        assert {"delta", "gamma", "vega_v0", "rho"} <= out.keys()

    def test_exotic_double_kinds(self, capsys):
        """double-barrier/double-touch route across every dynamics."""
        cli_main(["exotic", "--kind", "double-barrier", "--model",
                  "heston", "--knock", "out", "--lower", "80", "--upper",
                  "130", "--n-paths", "1", "--n-steps", "4"])
        out = json.loads(capsys.readouterr().out)
        assert out["kind"] == "barrier_double-out"
        assert 0.0 < out["price"] < 10.45
        cli_main(["exotic", "--kind", "double-touch", "--model", "heston",
                  "--touch", "no", "--lower", "80", "--upper", "130",
                  "--greeks", "--n-paths", "1", "--n-steps", "4"])
        out = json.loads(capsys.readouterr().out)
        assert out["kind"] == "no_touch_double"
        assert out["greek_method"] == "lr-joint-density"
        assert {"delta", "gamma", "theta", "rho"} <= out.keys()

    @pytest.mark.slow
    def test_american_slv_bracket(self, capsys):
        """--model slv routes to the certified SLV LSM+dual bracket."""
        cli_main(["american", "--type", "put", "--model", "slv",
                  "--mixing", "0.5", "--n-dates", "4"])
        out = json.loads(capsys.readouterr().out)
        assert out["lower"] <= out["upper"] + 3 * (out["lower_se"]
                                                   + out["upper_se"])
        assert out["mixing"] == 0.5

    def test_exotic_range_accrual_lv_slv(self, capsys):
        """range-accrual routes to the LV and SLV kernels (notional-100
        convention on the wire, matching the GBM/Heston routes)."""
        cli_main(["exotic", "--kind", "range-accrual", "--model", "lv",
                  "--lower", "90", "--upper", "112",
                  "--n-paths", "1", "--n-steps", "8"])
        out = json.loads(capsys.readouterr().out)
        assert out["kind"] == "range_accrual" and out["engine"] == "kernel"
        assert 0.0 < out["price"] < 100.0
        cli_main(["exotic", "--kind", "range-accrual", "--model", "slv",
                  "--lower", "90", "--upper", "112",
                  "--n-paths", "1", "--n-steps", "8"])
        out = json.loads(capsys.readouterr().out)
        assert out["model"] == "slv" and 0.0 < out["price"] < 100.0

    @pytest.mark.slow
    def test_american_rbergomi_bracket(self, capsys):
        """--model rbergomi routes to the non-Markovian causal-factor
        dual bracket."""
        cli_main(["american", "--type", "put", "--model", "rbergomi",
                  "--hurst", "0.15", "--n-dates", "4"])
        out = json.loads(capsys.readouterr().out)
        assert out["lower"] <= out["upper"] + 3 * (out["lower_se"]
                                                   + out["upper_se"])
        assert out["continuous_upper"] == pytest.approx(
            out["upper"] + out["pad"])

    def test_american_rbergomi_call_rejected(self):
        with pytest.raises(SystemExit):
            cli_main(["american", "--type", "call", "--model", "rbergomi"])

    def test_exotic_slv_structured(self, capsys):
        """cliquet/autocallable under slv route to the replay kernel."""
        cli_main(["exotic", "--kind", "autocallable", "--model", "slv",
                  "--n-paths", "1", "--n-steps", "4", "--n-obs", "2"])
        out = json.loads(capsys.readouterr().out)
        assert out["engine"] == "kernel" and 50.0 < out["price"] < 120.0
        cli_main(["exotic", "--kind", "cliquet", "--model", "slv",
                  "--greeks", "--n-paths", "1", "--n-steps", "4",
                  "--n-periods", "2"])
        out = json.loads(capsys.readouterr().out)
        assert out["greek_method"] == "lr-joint-density"
        assert "frozen-fixings" in out["delta_convention"]


class TestCLIBasketKernel:
    """--engine kernel routes to the fused multi-asset Pallas kernel,
    with --sampler sobol (pure terminal QMC) and the --greeks ladder."""

    def test_kernel_geometric_sobol_matches_closed_form(self, capsys):
        cli_main(["basket", "--kind", "geometric", "--engine", "kernel",
                  "--sampler", "sobol", "--n-paths", "1"])
        out = json.loads(capsys.readouterr().out)
        assert out["engine"] == "kernel" and "stderr_note" in out
        # replicated-scramble QMC (8 independent nets per launch, honest
        # error bars) trades ~2x point-set accuracy for the calibration
        assert abs(out["price"] - out["closed_form"]) < 1.5e-2

    def test_kernel_greeks_ladder_shapes(self, capsys):
        cli_main(["basket", "--engine", "kernel", "--sampler", "hash",
                  "--greeks", "--n-paths", "1"])
        out = json.loads(capsys.readouterr().out)
        assert len(out["delta"]) == 3 and len(out["gamma"]) == 3
        assert {"vega", "theta", "rho", "price"} <= out.keys()

    def test_xla_engine_rejects_kernel_flags(self):
        with pytest.raises(SystemExit):
            cli_main(["basket", "--greeks"])


class TestCLIHestonGreeks:
    def test_heston_qe_ladder_json(self, capsys):
        cli_main(["greeks", "--model", "heston-qe", "--n-paths", "1",
                  "--n-steps", "4"])
        out = json.loads(capsys.readouterr().out)
        assert out["greek_method"] == "crn-bump-fd"
        assert {"delta", "vega", "d_kappa", "d_theta", "d_sigma", "d_rho",
                "theta", "rho"} <= out.keys()
        assert 0.3 < out["delta"] < 0.9

    def test_heston_euler_ladder_json(self, capsys):
        cli_main(["greeks", "--model", "heston", "--n-paths", "1",
                  "--n-steps", "4"])
        out = json.loads(capsys.readouterr().out)
        assert out["greek_method"] == "pathwise-in-scheme"
        assert "d_sigma" in out
