"""HTTP pricing server: endpoint behavior over a real socket."""

import http.client
import json

import pytest

from optionslab_tpu.server import PricingServer


@pytest.fixture(scope="module")
def server():
    s = PricingServer(port=0, warm=True).start()  # port 0 = ephemeral
    yield s
    s.stop()


def _post(server, path, body):
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=60)
    conn.request("POST", path, json.dumps(body), {"Content-Type": "application/json"})
    resp = conn.getresponse()
    payload = json.loads(resp.read())
    conn.close()
    return resp.status, payload


def _get(server, path):
    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=60)
    conn.request("GET", path)
    resp = conn.getresponse()
    payload = json.loads(resp.read())
    conn.close()
    return resp.status, payload


class TestServer:
    def test_health(self, server):
        status, body = _get(server, "/health")
        assert status == 200 and body["status"] == "ok"

    def test_price_default_bs(self, server):
        status, body = _post(server, "/price", {})
        assert status == 200
        assert abs(body["price"] - 10.4506) < 1e-3

    def test_price_binomial_american(self, server):
        status, body = _post(server, "/price", {
            "model": "binomial", "american": True, "option_type": "put",
            "n_steps": 200})
        assert status == 200
        assert 6.0 < body["price"] < 6.2

    def test_greeks(self, server):
        status, body = _post(server, "/greeks", {"vol": 0.25})
        assert status == 200
        assert 0.5 < body["delta"] < 0.75
        assert body["gamma"] > 0

    def test_iv_roundtrip(self, server):
        status, body = _post(server, "/iv", {"price": 10.4506})
        assert status == 200
        assert abs(body["implied_vol"] - 0.2) < 1e-3

    def test_batch_price(self, server):
        status, body = _post(server, "/batch/price", {
            "spot": [90.0, 100.0, 110.0], "model": "bs"})
        assert status == 200
        prices = body["price"]
        assert len(prices) == 3 and prices[0] < prices[1] < prices[2]

    def test_price_bates_and_levy(self, server):
        for model in ("bates", "vg", "nig"):
            status, body = _post(server, "/price", {"model": model})
            assert status == 200
            assert 5.0 < body["price"] < 30.0, model

    def test_varswap_endpoint(self, server):
        status, body = _post(server, "/varswap", {"maturity": 1.0})
        assert status == 200
        assert 0.01 < body["variance_strike"] < 0.2
        assert body["vol_strike"] < body["variance_strike"] ** 0.5  # Jensen

    def test_varswap_slv_over_wire(self, server):
        status, body = _post(server, "/varswap", {
            "maturity": 1.0, "model": "slv", "mixing": 1.0,
            "n_paths": 16384, "n_steps": 32})
        assert status == 200 and body["model"] == "slv"
        assert 0.01 < body["variance_strike"] < 0.2
        # Jensen + a genuine convexity discount under full vol-of-vol
        assert body["vol_strike"] < body["variance_strike"] ** 0.5
        assert body["vol_stderr"] > 0.0

    @pytest.mark.slow
    def test_calibrate_endpoint(self, server):
        import numpy as np

        rng = np.random.default_rng(0)
        n = 120
        k = rng.uniform(-0.3, 0.3, n)
        t = rng.uniform(0.1, 1.5, n)
        iv = 0.2 - 0.1 * k + 0.15 * k * k + 0.02 * np.sqrt(t)
        status, body = _post(server, "/calibrate", {
            "underlying_price": [100.0] * n,
            "strike_price": (100.0 * np.exp(-k)).tolist(),
            "time_to_maturity": t.tolist(),
            "implied_volatility": iv.tolist(),
            "risk_free_rate": 0.03,
            "n_expiry_bins": 3, "n_steps": 300,
        })
        assert status == 200
        assert len(body["svi_params"]) == 3
        assert all(r < 0.02 for r in body["svi_rmse_vol"])

    def test_unknown_endpoint_404(self, server):
        status, body = _post(server, "/teleport", {})
        assert status == 404 and "endpoints" in body

    def test_bad_body_400(self, server):
        status, body = _post(server, "/price", {"model": "quantum"})
        assert status == 400 and "error" in body

    def test_iv_arbitrage_violation_400(self, server):
        status, body = _post(server, "/iv", {"price": 1e-9, "strike": 50.0})
        assert status == 400 and "ArbitrageViolation" in body["error"]

    def test_concurrent_requests(self, server):
        import threading

        results = []

        def hit():
            results.append(_post(server, "/price", {})[0])

        threads = [threading.Thread(target=hit) for _ in range(8)]
        [t.start() for t in threads]
        [t.join() for t in threads]
        assert results == [200] * 8


class TestAmericanEndpoint:
    def test_bs_bracket(self, server):
        status, body = _post(server, "/american", {
            "option_type": "put", "n_dates": 8, "n_fit": 4000,
            "n_lower": 4000, "n_outer": 2000, "n_inner": 16,
            "n_grid": 256})
        assert status == 200
        assert body["lower"] <= body["upper"]
        # American put at S=K=100, T=1, r=5%, vol=20% ≈ 6.08; a coarse
        # 8-date Bermudan bracket must still contain its neighborhood.
        lo = body["lower"] - 3 * body["lower_se"]
        hi = body["upper"] + 3 * body["upper_se"]
        assert lo < 6.3 and hi > 5.7
        assert body["width"] == pytest.approx(body["upper"] - body["lower"])

    def test_lv_bracket(self, server):
        status, body = _post(server, "/american", {
            "model": "lv", "option_type": "put", "n_dates": 4,
            "n_outer": 512, "n_inner": 64})
        assert status == 200
        assert body["lower"] <= body["continuous_upper"]
        assert 4.0 < body["lv_bermudan"] < 8.0


class TestAmericanModelValidation:
    def test_unknown_model_400(self, server):
        status, body = _post(server, "/american", {"model": "nope"})
        assert status == 400 and "error" in body


class TestSLVAmericanEndpoint:
    @pytest.mark.slow
    def test_slv_bracket_over_wire(self, server):
        status, body = _post(server, "/american", {
            "model": "slv", "option_type": "put", "mixing": 0.5,
            "n_dates": 4, "n_fit": 20000, "n_lower": 20000,
            "n_outer": 128, "n_inner": 128})
        assert status == 200
        assert body["lower"] <= body["upper"] + 3 * (body["lower_se"]
                                                     + body["upper_se"])
        assert body["mixing"] == 0.5


class TestRBergomiAmericanEndpoint:
    def test_rbergomi_bracket_over_wire(self, server):
        status, body = _post(server, "/american", {
            "model": "rbergomi", "option_type": "put",
            "rbergomi_params": {"hurst": 0.15, "eta": 1.5, "rho": -0.6,
                                "xi0": 0.04},
            "n_dates": 4, "n_fit": 8000, "n_lower": 8000,
            "n_outer": 96, "n_inner": 64})
        assert status == 200
        assert body["lower"] <= body["upper"] + 3 * (body["lower_se"]
                                                     + body["upper_se"])
        assert body["continuous_upper"] == pytest.approx(
            body["upper"] + body["pad"])

    def test_rbergomi_call_rejected_400(self, server):
        status, body = _post(server, "/american", {
            "model": "rbergomi", "option_type": "call"})
        assert status == 400 and "error" in body


class TestExoticEndpoint:
    def test_asian(self, server):
        status, body = _post(server, "/exotic", {"kind": "asian", "n_paths": 20000})
        assert status == 200 and 0 < body["price"] < 10.45

    def test_continuous_barrier(self, server):
        status, body = _post(server, "/exotic", {
            "kind": "barrier", "barrier": 120.0, "continuous": True,
            "n_paths": 20000})
        assert status == 200 and 0 < body["price"] < 10.45

    def test_unknown_kind_400(self, server):
        status, body = _post(server, "/exotic", {"kind": "rainbow"})
        assert status == 400

    def test_double_barrier(self, server):
        status, body = _post(server, "/exotic", {
            "kind": "double-barrier", "lower": 80.0, "upper": 130.0,
            "n_paths": 20000, "n_steps": 16})
        assert status == 200 and body["kind"] == "barrier_double-out"
        assert 0 < body["price"] < 10.45
        assert 0 < body["closed_form_continuous"] < 10.45

    def test_double_touch_complement(self, server):
        import math

        one = _post(server, "/exotic", {
            "kind": "double-touch", "touch": "one", "lower": 80.0,
            "upper": 130.0, "n_paths": 20000, "n_steps": 16})[1]
        no = _post(server, "/exotic", {
            "kind": "double-touch", "touch": "no", "lower": 80.0,
            "upper": 130.0, "n_paths": 20000, "n_steps": 16})[1]
        # same seed => shared paths => exact complement
        assert abs(one["price"] + no["price"] - math.exp(-0.05)) < 1e-5

    def test_double_barrier_greeks_route(self, server):
        status, body = _post(server, "/exotic", {
            "kind": "double-barrier", "knock": "out", "lower": 80.0,
            "upper": 130.0, "greeks": True, "n_paths": 1, "n_steps": 4})
        assert status == 200
        assert body["greek_method"] == "likelihood-ratio"
        assert {"delta", "gamma", "vega", "rho", "theta"} <= body.keys()

    def test_kernel_greeks_route(self, server):
        status, body = _post(server, "/exotic", {
            "kind": "barrier", "barrier": 120.0, "greeks": True,
            "n_paths": 1, "n_steps": 4})
        assert status == 200
        assert body["greek_method"] == "likelihood-ratio"
        assert {"delta", "gamma", "vega", "rho"} <= body.keys()

    def test_kernel_greeks_geometric_asian_routed(self, server):
        status, body = _post(server, "/exotic", {
            "kind": "asian", "averaging": "geometric", "greeks": True,
            "n_paths": 1, "n_steps": 4})
        assert status == 200 and body["greek_method"] == "pathwise"

    def test_kernel_greeks_unsupported_kind_is_400(self, server):
        """Regression: used to raise SystemExit through the handler and
        drop the connection without an HTTP response."""
        status, body = _post(server, "/exotic", {
            "kind": "american", "greeks": True, "n_paths": 1})
        assert status == 400
        assert "error" in body


class TestBookEndpoint:
    """/book/exotic: a same-kind contract book in ONE kernel launch
    (reference analog MonteCarloPricerUni.price_batch)."""

    def test_asian_book(self, server):
        status, body = _post(server, "/book/exotic", {
            "kind": "asian", "strikes": [90.0, 100.0, 110.0],
            "n_paths": 20000, "n_steps": 16})
        assert status == 200 and body["kind"] == "asian_arith"
        p = body["price"]
        assert len(p) == 3 and p[0] > p[1] > p[2] > 0
        assert len(body["std_error"]) == 3

    def test_barrier_book_heston_greeks(self, server):
        status, body = _post(server, "/book/exotic", {
            "kind": "barrier", "strikes": [95.0, 105.0],
            "barriers": [125.0, 135.0], "model": "heston",
            "greeks": True, "n_paths": 20000, "n_steps": 8})
        assert status == 200
        assert body["greek_method"] == "likelihood-ratio"
        for key in ("price", "delta", "vega_v0", "rho", "theta"):
            assert len(body[key]) == 2, key
        assert all(x > 0 for x in body["price"])

    def test_book_validation_400(self, server):
        status, body = _post(server, "/book/exotic", {
            "kind": "barrier", "strikes": [95.0, 105.0]})  # missing barriers
        assert status == 400
        status, body = _post(server, "/book/exotic", {
            "kind": "cliquet", "strikes": [100.0]})  # not a book kind
        assert status == 400
        status, body = _post(server, "/book/exotic", {
            "kind": "asian", "strikes": [100.0], "model": "slv"})
        assert status == 400


class TestBasketEndpoint:
    def test_geo_basket_sobol_matches_closed_form(self, server):
        from optionslab_tpu.models.multi_asset import \
            geometric_basket_closed_form

        status, out = _post(server, "/basket", {
            "kind": "basket_geo", "spots": [100.0, 95.0], "vols": [0.2, 0.25],
            "rho": 0.4, "strike": 95.0, "sampler": "sobol", "n_paths": 1})
        assert status == 200 and "stderr_note" in out
        cf = float(geometric_basket_closed_form(
            [100.0, 95.0], [0.5, 0.5], 95.0, 1.0, 0.05, [0.2, 0.25],
            [[1.0, 0.4], [0.4, 1.0]]))
        assert abs(out["price"] - cf) < 5e-3

    def test_greeks_ladder_over_the_wire(self, server):
        status, out = _post(server, "/basket", {
            "greeks": True, "sampler": "hash", "n_paths": 1})
        assert status == 200
        assert len(out["delta"]) == 3 and len(out["gamma"]) == 3
        assert {"vega", "theta", "rho", "price"} <= out.keys()

    def test_bad_kind_400(self, server):
        status, out = _post(server, "/basket", {"kind": "teleport"})
        assert status == 400 and "error" in out


class TestMetricsEndpoint:
    def test_metrics_after_requests(self, server):
        _post(server, "/price", {"model": "bs"})
        _post(server, "/price", {"model": "bs"})
        status, out = _get(server, "/metrics")
        assert status == 200
        assert "/price" in out
        m = out["/price"]
        assert m["count"] >= 2 and m["p50_ms"] > 0 and m["p95_ms"] >= m["p50_ms"]


class TestControlVariateOverWire:
    def test_asian_cv(self, server):
        status, out = _post(server, "/exotic", {
            "kind": "asian", "control_variate": True, "n_paths": 1,
            "n_steps": 16})
        assert status == 200 and out["control_variate"] == "geometric"
        # 16-fixing arithmetic Asian at the defaults (S=K=100, T=1,
        # r=5%, sigma=20%): 6.058 — the fixing count defines the contract
        assert abs(out["price"] - 6.058) < 0.02
        assert out["std_error"] < 5e-3

    def test_basket_cv(self, server):
        status, out = _post(server, "/basket", {
            "kind": "basket", "control_variate": True, "n_paths": 1,
            "sampler": "hash"})
        assert status == 200 and out["control_variate"] == "geometric"
        assert out["std_error"] < 2e-2


class TestXVAEndpoint:
    def test_long_call_cva_over_the_wire(self, server):
        status, body = _post(server, "/xva", {
            "positions": [{"quantity": 1.0, "strike": 100.0,
                           "maturity": 1.0, "option_type": "call"}],
            "spot": 100.0, "rate": 0.05, "vol": 0.2,
            "hazard": 0.03, "recovery": 0.4,
            "dates": 8, "paths": 16384})
        assert status == 200
        import numpy as np

        # martingale oracle: discounted EE == V0 at every date
        v0 = 10.4506
        ee = np.asarray(body["ee_discounted"])
        assert np.all(np.abs(ee - v0) < 0.05 * v0)
        exact = 0.6 * v0 * (1.0 - np.exp(-0.03))
        assert abs(body["cva"] - exact) < 0.1 * exact

    def test_collateralized_exposure_drops(self, server):
        base = {"positions": [{"quantity": 1.0}], "dates": 6,
                "paths": 8192}
        _, un = _post(server, "/xva", base)
        _, coll = _post(server, "/xva",
                        {**base, "collateral_threshold": 0.0})
        assert coll["epe"] < 1e-5 < un["epe"]


class TestTouchEndpoint:
    def test_one_touch_complement_over_the_wire(self, server):
        import numpy as np

        base = {"spot": 100.0, "maturity": 1.0, "rate": 0.05, "vol": 0.2,
                "barrier": 115.0, "n_paths": 1, "n_steps": 8}
        _, one = _post(server, "/exotic", {**base, "kind": "one-touch"})
        _, no = _post(server, "/exotic", {**base, "kind": "no-touch"})
        assert abs(one["price"] + no["price"] - np.exp(-0.05)) < 1e-5
        assert one["kind"] == "one_touch_up"


class TestPayAtHitAndRebate:
    def test_one_touch_at_hit_over_wire(self, server):
        base = {"spot": 100.0, "maturity": 1.0, "rate": 0.05, "vol": 0.2,
                "barrier": 125.0, "n_paths": 1, "n_steps": 8}
        _, hit = _post(server, "/exotic", {**base, "kind": "one-touch",
                                           "pay": "hit"})
        _, exp = _post(server, "/exotic", {**base, "kind": "one-touch"})
        assert hit["kind"] == "one_touch_up_hit"
        assert hit["pays"] == "unit cash at the first hit"
        # cash earlier under r > 0: at-hit strictly dominates at-expiry
        assert hit["price"] > exp["price"]
        status, body = _post(server, "/exotic", {
            **base, "kind": "no-touch", "pay": "hit"})
        assert status == 400

    def test_barrier_rebate_over_wire(self, server):
        base = {"spot": 100.0, "maturity": 1.0, "rate": 0.05, "vol": 0.2,
                "barrier": 130.0, "barrier_type": "up-and-out",
                "n_paths": 1, "n_steps": 8}
        _, plain = _post(server, "/exotic", {
            **base, "kind": "barrier", "n_paths": 20000})
        status, reb = _post(server, "/exotic", {
            **base, "kind": "barrier", "rebate": 5.0})
        assert status == 200 and reb["rebate_pays"] == "at first hit"
        assert reb["price"] > plain["price"]
        status, dreb = _post(server, "/exotic", {
            "kind": "double-barrier", "knock": "out", "lower": 80.0,
            "upper": 130.0, "rebate": 2.0, "n_paths": 1, "n_steps": 8})
        assert status == 200 and dreb["rebate"] == 2.0

    def test_touch_ladder_at_hit_over_wire(self, server):
        status, g = _post(server, "/exotic", {
            "kind": "one-touch", "barrier": 125.0, "pay": "hit",
            "greeks": True, "n_paths": 1, "n_steps": 8})
        assert status == 200
        assert g["greek_method"] == "likelihood-ratio"
        assert {"delta", "gamma", "rho", "theta"} <= g.keys()


class TestHestonExoticEndpoint:
    def test_asian_under_heston(self, server):
        status, body = _post(server, "/exotic", {
            "kind": "asian", "model": "heston", "n_paths": 1, "n_steps": 4})
        assert status == 200 and body["dynamics"] == "heston"
        assert 0 < body["price"] < 10.45 and body["scheme"] == "euler"

    def test_autocall_qe(self, server):
        status, body = _post(server, "/exotic", {
            "kind": "autocallable", "model": "heston-qe", "n_paths": 1,
            "n_steps": 4})
        assert status == 200 and body["scheme"] == "qe"
        assert 80.0 < body["price"] < 120.0

    def test_lr_ladder_over_wire(self, server):
        status, body = _post(server, "/exotic", {
            "kind": "barrier", "model": "heston", "greeks": True,
            "barrier": 130.0, "n_paths": 1, "n_steps": 4})
        assert status == 200
        assert body["greek_method"] == "lr-joint-density"
        assert {"delta", "gamma", "vega_v0", "rho"} <= body.keys()

    def test_qe_greeks_400(self, server):
        status, body = _post(server, "/exotic", {
            "kind": "asian", "model": "heston-qe", "greeks": True,
            "n_paths": 1, "n_steps": 4})
        assert status == 400 and "error" in body

    def test_unsupported_kind_400(self, server):
        status, body = _post(server, "/exotic", {
            "kind": "american", "model": "heston", "n_paths": 1})
        assert status == 400

    def test_autocall_ladder_over_wire(self, server):
        status, body = _post(server, "/exotic", {
            "kind": "autocallable", "model": "heston", "greeks": True,
            "n_paths": 1, "n_steps": 4, "n_obs": 4})
        assert status == 200
        assert {"vega_v0", "rho", "theta", "delta_convention"} <= body.keys()
        assert "frozen-fixings" in body["delta_convention"]

    def test_double_kinds_over_wire(self, server):
        import numpy as np

        base = {"model": "heston", "lower": 80.0, "upper": 130.0,
                "n_paths": 1, "n_steps": 4}
        status, ko = _post(server, "/exotic", {
            **base, "kind": "double-barrier", "knock": "out"})
        assert status == 200 and ko["kind"] == "barrier_double-out"
        assert 0 < ko["price"] < 10.45
        _, one = _post(server, "/exotic", {
            **base, "kind": "double-touch", "touch": "one"})
        _, no = _post(server, "/exotic", {
            **base, "kind": "double-touch", "touch": "no"})
        assert one["kind"] == "one_touch_double"
        assert abs(one["price"] + no["price"] - np.exp(-0.05)) < 1e-5
        status, g = _post(server, "/exotic", {
            **base, "kind": "double-barrier", "knock": "out",
            "greeks": True})
        assert status == 200 and g["greek_method"] == "lr-joint-density"
        assert {"delta", "gamma", "theta"} <= g.keys()
        # rbergomi + slv + lv routes, incl. the slv/lv double LR ladders
        status, rb = _post(server, "/exotic", {
            **base, "kind": "double-barrier", "model": "rbergomi",
            "n_paths": 20000, "n_steps": 8})
        assert status == 200 and rb["dynamics"] == "rough-bergomi"
        status, body = _post(server, "/exotic", {
            **base, "kind": "double-touch", "model": "slv", "greeks": True,
            "n_steps": 8})
        assert status == 200 and body["kind"] == "no_touch_double"
        assert "sticky-strike" in body["delta_convention"]
        status, body = _post(server, "/exotic", {
            **base, "kind": "double-barrier", "model": "lv", "greeks": True,
            "n_steps": 8})
        assert status == 200 and body["greek_method"] == "lr-sticky-strike"
        assert {"delta", "gamma", "vega"} <= body.keys()

    def test_lv_exotic_over_wire(self, server):
        import numpy as np

        base = {"model": "lv", "n_paths": 1, "n_steps": 8}
        status, body = _post(server, "/exotic", {**base, "kind": "asian"})
        assert status == 200 and body["dynamics"] == "dupire-local-vol"
        assert 0 < body["price"] < 10.45 and body["fit_residual"] < 0.05
        _, one = _post(server, "/exotic", {
            **base, "kind": "one-touch", "barrier": 130.0})
        _, no = _post(server, "/exotic", {
            **base, "kind": "no-touch", "barrier": 130.0})
        assert one["kind"] == "one_touch_up"
        assert abs(one["price"] + no["price"] - np.exp(-0.05)) < 1e-5
        status, body = _post(server, "/exotic", {
            **base, "kind": "american"})
        assert status == 400

    def test_bates_exotic_over_wire(self, server):
        base = {"kind": "barrier", "barrier": 80.0, "option_type": "put",
                "barrier_type": "down-and-in", "n_paths": 20000,
                "n_steps": 8}
        _, bj = _post(server, "/exotic", {**base, "model": "bates",
                                          "lam": 0.5, "mu_j": -0.1,
                                          "sigma_j": 0.15})
        _, bh = _post(server, "/exotic", {**base, "model": "heston"})
        assert bj["dynamics"] == "bates" and bh["dynamics"] == "heston"
        assert bj["price"] > bh["price"]  # jumps fatten the left tail

    def test_rbergomi_exotic_over_wire(self, server):
        status, body = _post(server, "/exotic", {
            "kind": "asian", "model": "rbergomi", "n_paths": 20000,
            "n_steps": 8})
        assert status == 200 and body["dynamics"] == "rough-bergomi"
        assert 0 < body["price"] < 10.45
        # structured kinds route under rough vol too (round-3 feature):
        # 8 periods x local cap 0.05 on notional 100, global floor 0
        # => discounted payoff in (0, 40)
        status, body = _post(server, "/exotic", {
            "kind": "cliquet", "model": "rbergomi", "n_paths": 2000,
            "n_steps": 16, "n_periods": 8})
        assert status == 200 and body["dynamics"] == "rough-bergomi"
        assert 0.0 < body["price"] < 40.0
        assert body["std_error"] > 0.0

    def test_slv_exotic_over_wire(self, server):
        base = {"kind": "barrier", "barrier": 120.0, "model": "slv",
                "n_paths": 20000, "n_steps": 16}
        status, b1 = _post(server, "/exotic", {**base, "mixing": 1.0})
        assert status == 200
        assert b1["dynamics"] == "heston-x-dupire-leverage"
        assert b1["mixing"] == 1.0 and 0 < b1["price"] < 10.45
        _, b0 = _post(server, "/exotic", {**base, "mixing": 0.0})
        # full vol-of-vol prices the UO barrier above pure local vol
        assert b1["price"] > b0["price"]
        status, body = _post(server, "/exotic", {
            "kind": "american", "model": "slv", "n_paths": 2000})
        assert status == 400

    def test_slv_kernel_greeks_over_wire(self, server):
        status, body = _post(server, "/exotic", {
            "kind": "asian", "model": "slv", "greeks": True, "mixing": 0.8,
            "n_paths": 1, "n_steps": 4})
        assert status == 200
        assert body["greek_method"] == "lr-joint-density"
        assert {"delta", "gamma", "vega_v0", "rho"} <= body.keys()
        assert 0.0 < body["delta"] < 1.0

    def test_slv_structured_over_wire(self, server):
        status, body = _post(server, "/exotic", {
            "kind": "autocallable", "model": "slv", "n_paths": 1,
            "n_steps": 4, "n_obs": 2})
        assert status == 200
        assert body["engine"] == "kernel" and 50.0 < body["price"] < 120.0
        status, body = _post(server, "/exotic", {
            "kind": "cliquet", "model": "slv", "greeks": True,
            "n_paths": 1, "n_steps": 4, "n_periods": 2})
        assert status == 200
        assert "frozen-fixings" in body["delta_convention"]


class TestRangeAccrualRoutes:
    def test_slv_range_accrual_over_wire(self, server):
        status, body = _post(server, "/exotic", {
            "kind": "range-accrual", "model": "slv", "lower": 90.0,
            "upper": 112.0, "n_paths": 1, "n_steps": 8})
        assert status == 200 and body["engine"] == "kernel"
        assert 0.0 < body["price"] < 100.0

    def test_lv_range_accrual_over_wire(self, server):
        status, body = _post(server, "/exotic", {
            "kind": "range-accrual", "model": "lv", "lower": 90.0,
            "upper": 112.0, "n_paths": 1, "n_steps": 8})
        assert status == 200 and body["kind"] == "range_accrual"
        assert 0.0 < body["price"] < 100.0
        # bad band -> 400
        status, _ = _post(server, "/exotic", {
            "kind": "range-accrual", "model": "lv", "lower": 112.0,
            "upper": 90.0, "n_paths": 1, "n_steps": 8})
        assert status == 400


class TestBatesAmericanEndpoint:
    def test_bates_bracket_over_wire(self, server):
        status, body = _post(server, "/american", {
            "model": "bates", "option_type": "put", "n_dates": 8,
            "n_fit": 20000, "n_lower": 20000, "n_outer": 128,
            "n_inner": 128,
            "bates_params": {"lam": 0.5, "mu_j": -0.1, "sigma_j": 0.15}})
        assert status == 200
        assert body["lower"] <= body["upper"] + 0.05
        assert body["method"] == "lsm"
        # negative jumps: put must exceed the pure-Heston ATM value band
        assert body["lower"] > 6.2


class TestAMCXVAEndpoint:
    def test_exotic_position_routes_to_amc(self, server):
        status, body = _post(server, "/xva", {
            "positions": [{"kind": "barrier_up-and-out", "barrier": 120.0},
                          {"kind": "vanilla", "quantity": -0.2}],
            "paths": 16384, "dates": 8})
        assert status == 200 and body["engine"] == "amc"
        assert 0 < body["epe"] < 5.0 and body["cva"] >= 0.0

    def test_rbergomi_exposure_model_over_the_wire(self, server):
        """model=rbergomi: the AMC profile rides the exact rough law; a
        long put's discounted EE is flat at its rough V0 (martingale)."""
        import numpy as np

        status, body = _post(server, "/xva", {
            "positions": [{"kind": "vanilla", "option_type": "put"}],
            "model": "rbergomi",
            "rbergomi_params": {"hurst": 0.1, "eta": 1.9, "rho": -0.9,
                                "xi0": 0.04},
            "paths": 16384, "dates": 6})
        assert status == 200 and body["model"] == "rbergomi"
        ee = np.asarray(body["ee"])
        assert 0 < body["epe"] < 20.0 and ee.shape == (6,)

    def test_unknown_xva_model_is_400(self, server):
        status, body = _post(server, "/xva", {
            "positions": [{"kind": "vanilla"}], "model": "garch"})
        assert status == 400 and "error" in body
        # ... and with no "kind" either — a dynamics choice must never
        # silently fall through to the closed-form BS engine
        status, body = _post(server, "/xva", {
            "positions": [{"option_type": "put"}], "model": "garch"})
        assert status == 400 and "error" in body

    def test_model_without_kind_routes_to_amc(self, server):
        status, body = _post(server, "/xva", {
            "positions": [{"option_type": "put"}], "model": "heston",
            "paths": 8192, "dates": 4})
        assert status == 200 and body["engine"] == "amc"
        assert body["model"] == "heston" and body["epe"] > 0

    def test_position_vol_honored_without_top_level_vol(self, server):
        """No top-level \"vol\": the AMC engine's GBM dynamics must run
        at the position's vol (the pre-model-knob behavior), not the
        body default."""
        lo = _post(server, "/xva", {
            "positions": [{"kind": "vanilla", "vol": 0.1}],
            "paths": 8192, "dates": 4})[1]
        hi = _post(server, "/xva", {
            "positions": [{"kind": "vanilla", "vol": 0.4}],
            "paths": 8192, "dates": 4})[1]
        assert hi["epe"] > 1.5 * lo["epe"]
