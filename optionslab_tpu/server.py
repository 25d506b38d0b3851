"""HTTP pricing server — the production-serving face of the framework.

The reference's user surface is a Streamlit dashboard (SURVEY.md §2.10);
for production deployment the equivalent capability is a JSON API over the
same façade. Endpoints (all POST, JSON body, JSON response):

  /price   {"model": "bs|binomial|heston|merton", contract fields...}
  /greeks  {contract fields...}                      → full BS Greek ladder
  /mc      {"n_paths": N, "method": "pallas|xla", contract fields...}
  /iv      {"price": P, contract fields...}
  /exotic  {"kind": "asian|barrier|lookback|american|cliquet|...",
            "model": "bs|heston[-qe]|bates[-qe]"}  → heston/bates:
            stochastic-vol (+jumps) kernel ("greeks": joint-density LR
            ladder)
  /american {"model": "bs|heston|bates|lv|slv|rbergomi",
             "option_type": "put", ...}
            → certified [lower, upper] bracket
  /basket  {"kind": "basket|basket_geo|rainbow_*|spread|basket_asian",
            "spots": [...], "vols": [...], "corr"|"rho", "greeks": bool,
            "sampler": "prng|hash|sobol"} → multi-asset kernel (full
            per-asset LR ladder with greeks=true)
  /batch/price {"model": "bs", "spot": [...], ...}   → batched pricing
  /health  (GET)
  /metrics (GET) → per-endpoint request-latency count/p50/p95/max (ms)

Design: stdlib ThreadingHTTPServer (no extra deps); all numerics go through
the jitted façade so a request costs one device dispatch; the first request
per shape pays the compile (pre-warmed for the common scalar shapes at
startup).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from .utils.logging import get_logger

logger = get_logger(__name__)

_DEFAULTS = {"spot": 100.0, "strike": 100.0, "maturity": 1.0, "rate": 0.05,
             "vol": 0.2, "dividend": 0.0, "option_type": "call"}


def _contract(body: dict):
    p = {**_DEFAULTS, **body}
    cp = 1.0 if str(p["option_type"]).lower().startswith("c") else -1.0
    return p, cp


def _to_jsonable(x):
    arr = np.asarray(x)
    return arr.item() if arr.ndim == 0 else arr.tolist()


def handle_price(body: dict) -> dict:
    from .models import HestonParams, MertonJumpDiffusion, binomial_price, bs_price, heston_price
    from .types import ContractBatch

    p, cp = _contract(body)
    model = body.get("model", "bs")
    batch = ContractBatch.make(p["spot"], p["strike"], p["maturity"], p["rate"],
                               p["vol"], p["option_type"], p["dividend"])
    if model == "bs":
        out = bs_price(p["spot"], p["strike"], p["maturity"], p["rate"], p["vol"],
                       cp, p["dividend"])
    elif model == "binomial":
        out = binomial_price(batch, american=bool(body.get("american", False)),
                             n_steps=int(body.get("n_steps", 512)))
    elif model == "heston":
        out = heston_price(batch, HestonParams.make(**body.get("heston_params", {})))
    elif model == "bates":
        from .models import BatesParams, bates_price

        out = bates_price(batch, BatesParams.make(**body.get("bates_params", {})))
    elif model == "vg":
        from .models import VGParams, vg_price

        out = vg_price(batch, VGParams.make(**body.get("vg_params", {})))
    elif model == "nig":
        from .models import NIGParams, nig_price

        out = nig_price(batch, NIGParams.make(**body.get("nig_params", {})))
    elif model == "merton":
        jd = body.get("merton_params", {})
        out = MertonJumpDiffusion(**jd).price(p["spot"], p["strike"], p["maturity"],
                                              p["rate"], p["vol"], p["option_type"],
                                              p["dividend"])
    else:
        raise ValueError(f"unknown model {model!r}")
    return {"model": model, "price": _to_jsonable(out)}


def handle_greeks(body: dict) -> dict:
    from .models import bs_greeks

    p, cp = _contract(body)
    g = bs_greeks(p["spot"], p["strike"], p["maturity"], p["rate"], p["vol"], cp,
                  p["dividend"])
    return {k: _to_jsonable(v) for k, v in g.items()}


def handle_mc(body: dict) -> dict:
    from .types import ContractBatch

    p, cp = _contract(body)
    n_paths = int(body.get("n_paths", 1_000_000))
    seed = int(body.get("seed", 0))
    batch = ContractBatch.make(p["spot"], p["strike"], p["maturity"], p["rate"],
                               p["vol"], p["option_type"], p["dividend"])
    if body.get("method", "pallas") == "pallas":
        from .ops.gbm_pallas import pallas_mc_price_greeks

        out = pallas_mc_price_greeks(batch, n_paths=n_paths, seed=seed)
        return {k: _to_jsonable(v) for k, v in out.items()}
    import jax

    from .models import MCConfig, mc_greeks, mc_price_result

    cfg = MCConfig(n_paths=n_paths)
    res = mc_price_result(batch, jax.random.PRNGKey(seed), cfg)
    g = mc_greeks(batch, jax.random.PRNGKey(seed), cfg)
    return {"price": _to_jsonable(res.price), "std_error": _to_jsonable(res.std_error),
            **{k: _to_jsonable(v) for k, v in g.items() if k != "price"}}


def handle_exotic(body: dict) -> dict:
    from .models import (
        AmericanOptionLSM,
        AsianOption,
        BarrierOption,
        CliquetOption,
        LookbackOption,
    )

    p, _ = _contract(body)
    kind = body.get("kind", "asian")
    n_paths = int(body.get("n_paths", 100_000))
    if str(body.get("model", "bs")).startswith(("heston", "bates")):
        return _exotic_heston(body, p, kind, n_paths)
    if body.get("model") == "rbergomi":
        return _exotic_rbergomi(body, p, kind, n_paths)
    if body.get("model") == "slv":
        return _exotic_slv(body, p, kind, n_paths)
    if body.get("model") == "lv":
        return _exotic_lv(body, p, kind, n_paths)
    if body.get("greeks"):
        # fused-kernel ladders: pathwise (asian/lookback) or likelihood-
        # ratio (barrier/cliquet/autocall); ValidationError → 400
        from .ops.exotic_pallas import exotic_kernel_ladder

        cp = 1.0 if p["option_type"].startswith("c") else -1.0
        btype = body.get("barrier_type", "up-and-out")
        if kind == "double-barrier":
            btype = body.get("knock", "out")
        elif kind == "double-touch":
            btype = body.get("touch", "no")
        return exotic_kernel_ladder(
            kind, p["spot"], p["strike"], p["maturity"], p["rate"],
            p["vol"], cp, p["dividend"],
            barrier=float(body.get("barrier", 120.0)),
            barrier_type=btype,
            lower=float(body.get("lower", 0.0)),
            upper=float(body.get("upper", 0.0)),
            averaging=body.get("averaging", "arithmetic"),
            floating=bool(body.get("floating", True)),
            pay=str(body.get("pay", "expiry")),
            n_paths=n_paths, n_steps=int(body.get("n_steps", 64)),
            seed=int(body.get("seed", 0)))
    common = (p["spot"], p["strike"], p["maturity"], p["rate"], p["vol"])
    if kind in ("double-barrier", "double-touch"):
        import jax

        from .models.exotics import (double_barrier_closed_form,
                                     double_no_touch_closed_form)
        from .ops.exotic_pallas import pallas_exotic_price

        lower = float(body.get("lower", 90.0))
        upper = float(body.get("upper", 110.0))
        cp = 1.0 if p["option_type"].startswith("c") else -1.0
        sampler = "prng" if jax.default_backend() == "tpu" else "hash"
        pay = str(body.get("pay", "expiry"))
        rebate = float(body.get("rebate", 0.0))
        if kind == "double-barrier":
            knock = body.get("knock", "out")
            kname = f"barrier_double-{knock}"
            cf = double_barrier_closed_form(
                p["spot"], p["strike"], lower, upper, p["maturity"],
                p["rate"], p["vol"], cp, p["dividend"], knock=knock)
        else:
            import math

            touch = body.get("touch", "no")
            if pay == "hit" and touch != "one":
                raise ValueError("a no-touch pays at expiry by definition")
            kname = ("one_touch_double_hit" if pay == "hit"
                     else f"{touch}_touch_double")
            dnt = double_no_touch_closed_form(
                p["spot"], lower, upper, p["maturity"], p["rate"], p["vol"],
                p["dividend"])
            cf = (dnt if touch == "no"
                  else math.exp(-p["rate"] * p["maturity"]) - float(dnt))
            if pay == "hit":
                cf = None
        kw = dict(n_paths=n_paths, n_steps=int(body.get("n_steps", 64)),
                  seed=int(body.get("seed", 0)), sampler=sampler)
        pr, se, n = pallas_exotic_price(
            kname, *common, cp, p["dividend"], lower=lower, upper=upper,
            **kw)
        extra = {}
        if kind == "double-barrier" and rebate:
            leg_kind = ("one_touch_double_hit" if kname.endswith("out")
                        else "no_touch_double")
            leg, se_l, _ = pallas_exotic_price(
                leg_kind, *common, cp, p["dividend"], lower=lower,
                upper=upper, **kw)
            pr = float(pr) + rebate * float(leg)
            se = float(np.hypot(float(se), rebate * float(se_l)))
            extra = {"rebate": rebate,
                     "rebate_pays": ("at first hit" if kname.endswith("out")
                                     else "at expiry if never knocked in")}
        return {"kind": kname, "price": _to_jsonable(pr),
                "std_error": _to_jsonable(se), "paths": int(n),
                "band": [lower, upper], **extra,
                "closed_form_continuous": (None if cf is None
                                           else _to_jsonable(cf))}
    if kind in ("one-touch", "no-touch"):
        import jax

        from .ops.exotic_pallas import pallas_exotic_price

        barrier = float(body.get("barrier", 120.0))
        pay = str(body.get("pay", "expiry"))
        if pay == "hit" and kind == "no-touch":
            raise ValueError("a no-touch pays at expiry by definition")
        side = "up" if barrier >= p["spot"] else "down"
        kname = f"{kind.replace('-', '_')}_{side}"
        if pay == "hit":
            kname += "_hit"
        sampler = "prng" if jax.default_backend() == "tpu" else "hash"
        pr, se, n = pallas_exotic_price(
            kname, *common, barrier=barrier, n_paths=n_paths,
            n_steps=int(body.get("n_steps", 64)),
            seed=int(body.get("seed", 0)), sampler=sampler)
        return {"kind": kname,
                "price": _to_jsonable(pr), "std_error": _to_jsonable(se),
                "paths": int(n),
                "pays": ("unit cash at the first hit" if pay == "hit"
                         else "unit cash at expiry")}
    if kind == "barrier" and float(body.get("rebate", 0.0)):
        import jax

        from .ops.exotic_pallas import pallas_exotic_price

        cp = 1.0 if p["option_type"].startswith("c") else -1.0
        barrier = float(body.get("barrier", 120.0))
        btype = body.get("barrier_type", "up-and-out")
        rebate = float(body.get("rebate"))
        sampler = "prng" if jax.default_backend() == "tpu" else "hash"
        kw = dict(barrier=barrier, n_paths=n_paths,
                  n_steps=int(body.get("n_steps", 64)),
                  seed=int(body.get("seed", 0)), sampler=sampler)
        pr, se, n = pallas_exotic_price(f"barrier_{btype}", *common, cp,
                                        p["dividend"], **kw)
        side = "up" if barrier >= p["spot"] else "down"
        out_leg = btype.endswith("out")
        leg_kind = (f"one_touch_{side}_hit" if out_leg
                    else f"no_touch_{side}")
        leg, se_l, _ = pallas_exotic_price(leg_kind, *common, cp,
                                           p["dividend"], **kw)
        return {"kind": f"barrier_{btype}",
                "price": float(pr) + rebate * float(leg),
                "std_error": float(np.hypot(float(se),
                                            rebate * float(se_l))),
                "paths": int(n), "rebate": rebate,
                "rebate_pays": ("at first hit" if out_leg
                                else "at expiry if never knocked in")}
    if kind == "asian" and body.get("control_variate"):
        import jax

        from .ops.exotic_pallas import pallas_exotic_price

        cp = 1.0 if p["option_type"].startswith("c") else -1.0
        sampler = "prng" if jax.default_backend() == "tpu" else "hash"
        pr, se, n = pallas_exotic_price(
            "asian_arith", *common, cp, p["dividend"], n_paths=n_paths,
            n_steps=int(body.get("n_steps", 64)),
            seed=int(body.get("seed", 0)), sampler=sampler,
            control_variate=True)
        return {"kind": kind, "price": _to_jsonable(pr),
                "std_error": _to_jsonable(se), "paths": int(n),
                "control_variate": "geometric"}
    if kind == "asian":
        opt = AsianOption(*common, option_type=p["option_type"], n_paths=n_paths,
                          averaging=body.get("averaging", "arithmetic"))
    elif kind == "barrier":
        opt = BarrierOption(p["spot"], p["strike"], float(body.get("barrier", 120.0)),
                            p["maturity"], p["rate"], p["vol"],
                            option_type=p["option_type"],
                            barrier_type=body.get("barrier_type", "up-and-out"),
                            continuous=bool(body.get("continuous", False)),
                            n_paths=n_paths)
    elif kind == "lookback":
        opt = LookbackOption(*common, option_type=p["option_type"], n_paths=n_paths,
                             floating=bool(body.get("floating", True)))
    elif kind == "american":
        opt = AmericanOptionLSM(*common, option_type=p["option_type"], n_paths=n_paths)
    elif kind == "cliquet":
        opt = CliquetOption(p["spot"], p["maturity"], p["rate"], p["vol"],
                            n_paths=n_paths)
    else:
        raise ValueError(f"unknown exotic kind {kind!r}")
    price, se = opt.price(return_stderr=True)
    return {"kind": kind, "price": _to_jsonable(price), "std_error": _to_jsonable(se)}


def _exotic_heston(body: dict, p: dict, kind: str, n_paths: int) -> dict:
    """model=heston[-qe] | bates[-qe]: exotics under stochastic vol
    (optionally + compound-Poisson jumps) at kernel speed (mirrors CLI
    ``exotic --model heston|bates``). Dynamics params come from the body
    (v0/kappa/theta/sigma_v/rho_sv + lam/mu_j/sigma_j for bates);
    greeks=true adds the one-pass joint-density LR ladder (Euler)."""
    import jax

    from .models import BatesParams, HestonParams
    from .ops.heston_pallas import (pallas_heston_autocall_lr_greeks,
                                    pallas_heston_autocall_price,
                                    pallas_heston_cliquet_lr_greeks,
                                    pallas_heston_cliquet_price,
                                    pallas_heston_exotic_lr_greeks,
                                    pallas_heston_exotic_price)

    model = str(body.get("model"))
    heston_args = (float(body.get("v0", 0.04)),
                   float(body.get("kappa", 2.0)),
                   float(body.get("theta", 0.04)),
                   float(body.get("sigma_v", 0.3)),
                   float(body.get("rho_sv", -0.7)))
    if model.startswith("bates"):
        par = BatesParams.make(*heston_args,
                               lam=float(body.get("lam", 0.5)),
                               mu_j=float(body.get("mu_j", -0.1)),
                               sigma_j=float(body.get("sigma_j", 0.15)))
    else:
        par = HestonParams.make(*heston_args)
    scheme = "qe" if model.endswith("-qe") else "euler"
    sampler = "prng" if jax.default_backend() == "tpu" else "hash"
    cp = 1.0 if p["option_type"].startswith("c") else -1.0
    kw = dict(n_paths=n_paths, n_steps=int(body.get("n_steps", 64)),
              seed=int(body.get("seed", 0)), sampler=sampler)
    base = {"model": model, "scheme": scheme,
            "dynamics": "bates" if model.startswith("bates") else "heston"}
    greeks = bool(body.get("greeks"))
    if greeks and scheme != "euler":
        raise ValueError("greeks under heston use the Euler LR ladder; "
                         "drop -qe")
    if kind in ("autocallable", "cliquet"):
        if kind == "autocallable":
            skw = dict(n_obs=int(body.get("n_obs", 4)),
                       coupon_rate=float(body.get("coupon_rate", 0.08)))
        else:
            skw = dict(n_periods=int(body.get("n_periods", 4)),
                       local_floor=float(body.get("local_floor", -0.05)),
                       local_cap=float(body.get("local_cap", 0.05)))
        if greeks:
            fn = (pallas_heston_autocall_lr_greeks if kind == "autocallable"
                  else pallas_heston_cliquet_lr_greeks)
            out = fn(p["spot"], p["maturity"], p["rate"], par, **skw, **kw)
            res = {k: _to_jsonable(v) for k, v in out.items()}
            res.update(base, kind=kind, greek_method="lr-joint-density",
                       vega_convention="2*sqrt(v0)*vega_v0")
            return res
        fn = (pallas_heston_autocall_price if kind == "autocallable"
              else pallas_heston_cliquet_price)
        pr, se, n = fn(p["spot"], p["maturity"], p["rate"], par,
                       scheme=scheme, **skw, **kw)
        return {**base, "kind": kind, "price": _to_jsonable(pr),
                "std_error": _to_jsonable(se), "paths": int(n)}
    barrier = float(body.get("barrier", 120.0))
    band = {}
    if kind in ("one-touch", "no-touch"):
        if str(body.get("pay", "expiry")) == "hit" and kind == "no-touch":
            raise ValueError("a no-touch pays at expiry by definition")
        side = "up" if barrier >= p["spot"] else "down"
        kname = f"{kind.replace('-', '_')}_{side}"
        if str(body.get("pay", "expiry")) == "hit":
            kname += "_hit"
    elif kind == "double-barrier":
        kname = f"barrier_double-{body.get('knock', 'out')}"
        band = dict(lower=float(body.get("lower", 90.0)),
                    upper=float(body.get("upper", 110.0)))
    elif kind == "double-touch":
        if str(body.get("pay", "expiry")) == "hit":
            if body.get("touch", "no") != "one":
                raise ValueError(
                    "a no-touch pays at expiry by definition")
            kname = "one_touch_double_hit"
        else:
            kname = f"{body.get('touch', 'no')}_touch_double"
        band = dict(lower=float(body.get("lower", 90.0)),
                    upper=float(body.get("upper", 110.0)))
    elif kind == "asian":
        kname = "asian_arith"
    elif kind == "lookback":
        kname = "lookback_float"
    elif kind == "barrier":
        kname = f"barrier_{body.get('barrier_type', 'up-and-out')}"
    else:
        raise ValueError(f"model={model} supports asian/barrier/lookback/"
                         f"one-touch/no-touch/double-barrier/double-touch/"
                         f"autocallable/cliquet, not {kind!r}")
    if greeks:
        out = pallas_heston_exotic_lr_greeks(
            kname, p["spot"], p["strike"], p["maturity"], p["rate"], par,
            cp, barrier=barrier, **band, **kw)
        res = {k: _to_jsonable(v) for k, v in out.items()}
        res.update(base, kind=kname, greek_method="lr-joint-density",
                   vega_convention="2*sqrt(v0)*vega_v0")
        return res
    pr, se, n = pallas_heston_exotic_price(
        kname, p["spot"], p["strike"], p["maturity"], p["rate"], par, cp,
        barrier=barrier, scheme=scheme, **band, **kw)
    return {**base, "kind": kname, "price": _to_jsonable(pr),
            "std_error": _to_jsonable(se), "paths": int(n)}


def _exotic_rbergomi(body: dict, p: dict, kind: str, n_paths: int) -> dict:
    """model=rbergomi: exotics under rough volatility (exact Volterra
    law; mirrors CLI ``exotic --model rbergomi``)."""
    import jax

    from .models import RBergomiParams, rbergomi_exotic_price

    par = RBergomiParams(hurst=float(body.get("hurst", 0.1)),
                         eta=float(body.get("eta", 1.9)),
                         rho=float(body.get("rho_sv", -0.9)),
                         xi0=float(body.get("xi0", 0.04)))
    cp = 1.0 if p["option_type"].startswith("c") else -1.0
    barrier = float(body.get("barrier", 120.0))
    if kind in ("autocallable", "cliquet"):
        from .models import rbergomi_autocall_price, rbergomi_cliquet_price

        key = jax.random.PRNGKey(int(body.get("seed", 0)))
        n_steps = int(body.get("n_steps", 64))
        if kind == "autocallable":
            pr, se = rbergomi_autocall_price(
                p["spot"], p["maturity"], p["rate"], par, key,
                n_obs=int(body.get("n_obs", 4)), n_paths=n_paths,
                n_steps=n_steps, return_stderr=True)
        else:
            pr, se = rbergomi_cliquet_price(
                p["spot"], p["maturity"], p["rate"], par, key,
                n_periods=int(body.get("n_periods", 8)), n_paths=n_paths,
                n_steps=n_steps, return_stderr=True)
        return {"model": "rbergomi", "dynamics": "rough-bergomi",
                "kind": kind, "price": _to_jsonable(pr),
                "std_error": _to_jsonable(se)}
    kind_map = {"asian": "asian_arith", "lookback": "lookback_float",
                "barrier": f"barrier_{body.get('barrier_type', 'up-and-out')}"}
    if kind in ("one-touch", "no-touch"):
        if str(body.get("pay", "expiry")) == "hit" and kind == "no-touch":
            raise ValueError("a no-touch pays at expiry by definition")
        side = "up" if barrier >= p["spot"] else "down"
        kname = f"{kind.replace('-', '_')}_{side}"
        if str(body.get("pay", "expiry")) == "hit":
            kname += "_hit"
    elif kind == "double-barrier":
        kname = f"barrier_double-{body.get('knock', 'out')}"
        barrier = (float(body.get("lower", 90.0)),
                   float(body.get("upper", 110.0)))
    elif kind == "double-touch":
        if str(body.get("pay", "expiry")) == "hit":
            if body.get("touch", "no") != "one":
                raise ValueError(
                    "a no-touch pays at expiry by definition")
            kname = "one_touch_double_hit"
        else:
            kname = f"{body.get('touch', 'no')}_touch_double"
        barrier = (float(body.get("lower", 90.0)),
                   float(body.get("upper", 110.0)))
    elif kind in kind_map:
        kname = kind_map[kind]
    else:
        raise ValueError("model=rbergomi supports asian/barrier/lookback/"
                         "one-touch/no-touch/double-barrier/double-touch/"
                         f"cliquet/autocallable, not {kind!r}")
    pr, se = rbergomi_exotic_price(
        kname, p["spot"], p["strike"], p["maturity"], p["rate"], par,
        jax.random.PRNGKey(int(body.get("seed", 0))), cp, barrier=barrier,
        n_paths=n_paths, n_steps=int(body.get("n_steps", 64)),
        return_stderr=True)
    return {"model": "rbergomi", "dynamics": "rough-bergomi", "kind": kname,
            "price": _to_jsonable(pr), "std_error": _to_jsonable(se)}


def _exotic_lv(body: dict, p: dict, kind: str, n_paths: int) -> dict:
    """model=lv: smile-consistent exotics under the calibrated Dupire
    local vol on the fused kernel (mirrors CLI ``exotic --model lv``).
    ``greeks=true`` adds the one-pass LR ladder (sticky-strike
    delta/gamma, parallel-shift vega)."""
    import jax

    from .models.local_vol import DupireLocalVol, sample_smile_iv_fn
    from .ops.local_vol_pallas import LocalVolKernelPricer

    cp = 1.0 if p["option_type"].startswith("c") else -1.0
    barrier = float(body.get("barrier", 120.0))
    if kind in ("autocallable", "cliquet"):
        # pure-LV structured kinds: the SLV engine at mixing=0 (exact)
        from .models import (local_vol_autocall_price,
                             local_vol_cliquet_price)

        dup = DupireLocalVol(
            sample_smile_iv_fn(base_vol=float(body.get("vol", 0.2))),
            p["spot"], p["rate"])
        n_steps = int(body.get("n_steps", 64))
        if kind == "autocallable":
            pr, se = local_vol_autocall_price(
                dup, p["maturity"], n_obs=int(body.get("n_obs", 4)),
                n_paths=n_paths, n_steps=n_steps,
                seed=int(body.get("seed", 0)), return_stderr=True)
        else:
            pr, se = local_vol_cliquet_price(
                dup, p["maturity"],
                n_periods=int(body.get("n_periods", 8)),
                n_paths=n_paths, n_steps=n_steps,
                seed=int(body.get("seed", 0)), return_stderr=True)
        return {"model": "lv", "dynamics": "dupire-local-vol",
                "kind": kind, "engine": "slv-scan-mixing0",
                "price": _to_jsonable(pr), "std_error": _to_jsonable(se)}
    band = {}
    kind_map = {"asian": "asian", "lookback": "lookback_float",
                "european": "european",
                "barrier": f"barrier_{body.get('barrier_type', 'up-and-out')}"}
    if kind in ("one-touch", "no-touch"):
        if str(body.get("pay", "expiry")) == "hit" and kind == "no-touch":
            raise ValueError("a no-touch pays at expiry by definition")
        side = "up" if barrier >= p["spot"] else "down"
        kname = f"{kind.replace('-', '_')}_{side}"
        if str(body.get("pay", "expiry")) == "hit":
            kname += "_hit"
    elif kind == "double-barrier":
        kname = f"barrier_double-{body.get('knock', 'out')}"
        band = dict(lower=float(body.get("lower", 90.0)),
                    upper=float(body.get("upper", 110.0)))
    elif kind == "double-touch":
        if str(body.get("pay", "expiry")) == "hit":
            if body.get("touch", "no") != "one":
                raise ValueError(
                    "a no-touch pays at expiry by definition")
            kname = "one_touch_double_hit"
        else:
            kname = f"{body.get('touch', 'no')}_touch_double"
        band = dict(lower=float(body.get("lower", 90.0)),
                    upper=float(body.get("upper", 110.0)))
    elif kind == "range-accrual":
        kname = "range_accrual"
        band = dict(lower=float(body.get("lower", 90.0)),
                    upper=float(body.get("upper", 110.0)))
    elif kind in kind_map:
        kname = kind_map[kind]
    else:
        raise ValueError("model=lv supports european/asian/barrier/"
                         "lookback/one-touch/no-touch/double-barrier/"
                         f"double-touch/range-accrual, not {kind!r}")
    dup = DupireLocalVol(sample_smile_iv_fn(base_vol=p["vol"]),
                         p["spot"], p["rate"])
    sampler = "prng" if jax.default_backend() == "tpu" else "hash"
    pricer = LocalVolKernelPricer(dup, p["maturity"],
                                  n_steps=int(body.get("n_steps", 64)))
    base = {"model": "lv", "dynamics": "dupire-local-vol", "kind": kname,
            "engine": "kernel"}
    # the LV pricer quotes range accrual on UNIT notional; the wire
    # convention is notional 100 (matches the GBM/Heston routes)
    scale = (float(body.get("notional", 100.0))
             if kname == "range_accrual" else 1.0)
    if body.get("greeks"):
        out = pricer.greeks(p["strike"], cp=cp, payoff=kname,
                            barrier=barrier, n_paths=n_paths,
                            seed=int(body.get("seed", 0)), sampler=sampler,
                            **band)
        res = {k: _to_jsonable(scale * v if isinstance(v, (int, float))
                               or getattr(v, "ndim", None) == 0 else v)
               for k, v in out.items()}
        res.update(base, greek_method="lr-sticky-strike",
                   vega_convention="parallel surface shift")
        return res
    pr, se, n = pricer.price(p["strike"], cp=cp, payoff=kname,
                             barrier=barrier, n_paths=n_paths,
                             seed=int(body.get("seed", 0)), sampler=sampler,
                             **band)
    return {**base, "price": _to_jsonable(scale * pr),
            "std_error": _to_jsonable(scale * se),
            "paths": int(n), "fit_residual": float(pricer.fit_residual)}


def _exotic_slv(body: dict, p: dict, kind: str, n_paths: int) -> dict:
    """model=slv: stochastic local vol — Heston dynamics x Dupire leverage
    calibrated in the same jitted scan (mirrors CLI ``exotic --model
    slv``). ``mixing`` in [0, 1] marks exotics between pure local vol and
    full Heston vol-of-vol; vanillas reprice the smile at every value."""
    import jax

    from .models import HestonParams, SLVModel
    from .models.local_vol import DupireLocalVol, sample_smile_iv_fn

    dup = DupireLocalVol(sample_smile_iv_fn(base_vol=p["vol"]),
                         p["spot"], p["rate"])
    par = HestonParams.make(float(body.get("v0", 0.04)),
                            float(body.get("kappa", 2.0)),
                            float(body.get("theta", 0.04)),
                            float(body.get("sigma_v", 0.5)),
                            float(body.get("rho_sv", -0.7)))
    mixing = float(body.get("mixing", 1.0))
    if kind in ("autocallable", "cliquet", "range-accrual"):
        # structured kinds: replay kernel (price or frozen-fixings ladder)
        from .ops.slv_pallas import SLVKernelPricer

        sampler = "prng" if jax.default_backend() == "tpu" else "hash"
        pricer = SLVKernelPricer(dup, par, p["maturity"], mixing=mixing,
                                 n_steps=int(body.get("n_steps", 64)))
        if kind == "range-accrual":
            kw = dict(lower=float(body.get("lower", 90.0)),
                      upper=float(body.get("upper", 110.0)),
                      notional=float(body.get("notional", 100.0)))
            fn = pricer.range_accrual
        elif kind == "autocallable":
            kw = dict(n_obs=int(body.get("n_obs", 4)))
            fn = pricer.autocall
        else:
            kw = dict(n_periods=int(body.get("n_periods", 8)))
            fn = pricer.cliquet
        base = {"model": "slv", "dynamics": "heston-x-dupire-leverage",
                "kind": kind, "mixing": mixing, "engine": "kernel"}
        if body.get("greeks"):
            out = fn(**kw, n_paths=n_paths,
                     seed=int(body.get("seed", 0)), sampler=sampler,
                     greeks=True)
            res = {k: _to_jsonable(v) if not isinstance(v, (str, int))
                   else v for k, v in out.items()}
            res.update(base, greek_method="lr-joint-density")
            return res
        pr, se, n = fn(**kw, n_paths=n_paths,
                       seed=int(body.get("seed", 0)), sampler=sampler)
        return {**base, "price": _to_jsonable(pr),
                "std_error": _to_jsonable(se), "paths": int(n)}
    slv = SLVModel(dup, par, mixing=mixing)
    cp = 1.0 if p["option_type"].startswith("c") else -1.0
    barrier = float(body.get("barrier", 120.0))
    kind_map = {"asian": "asian_arith", "lookback": "lookback_float",
                "barrier": f"barrier_{body.get('barrier_type', 'up-and-out')}"}
    if kind in ("one-touch", "no-touch"):
        if str(body.get("pay", "expiry")) == "hit" and kind == "no-touch":
            raise ValueError("a no-touch pays at expiry by definition")
        side = "up" if barrier >= p["spot"] else "down"
        kname = f"{kind.replace('-', '_')}_{side}"
        if str(body.get("pay", "expiry")) == "hit":
            kname += "_hit"
    elif kind == "double-barrier":
        kname = f"barrier_double-{body.get('knock', 'out')}"
        barrier = (float(body.get("lower", 90.0)),
                   float(body.get("upper", 110.0)))
    elif kind == "double-touch":
        if str(body.get("pay", "expiry")) == "hit":
            if body.get("touch", "no") != "one":
                raise ValueError(
                    "a no-touch pays at expiry by definition")
            kname = "one_touch_double_hit"
        else:
            kname = f"{body.get('touch', 'no')}_touch_double"
        barrier = (float(body.get("lower", 90.0)),
                   float(body.get("upper", 110.0)))
    elif kind in kind_map:
        kname = kind_map[kind]
    else:
        raise ValueError("model=slv supports asian/barrier/lookback/"
                         "one-touch/no-touch/double-barrier/double-touch/"
                         f"range-accrual/cliquet/autocallable, not {kind!r}")
    if body.get("greeks"):
        from .ops.slv_pallas import SLVKernelPricer

        sampler = "prng" if jax.default_backend() == "tpu" else "hash"
        pricer = SLVKernelPricer(dup, par, p["maturity"], mixing=mixing,
                                 n_steps=int(body.get("n_steps", 64)))
        if "double" in kname:
            band = dict(lower=barrier[0], upper=barrier[1])
            barrier = 0.0
        else:
            band = {}
        out = pricer.greeks(kname, p["strike"], cp=cp, barrier=barrier,
                            n_paths=n_paths,
                            seed=int(body.get("seed", 0)), sampler=sampler,
                            **band)
        res = {k: _to_jsonable(v) if not isinstance(v, (str, int)) else v
               for k, v in out.items()}
        res.update(model="slv", dynamics="heston-x-dupire-leverage",
                   kind=kname, mixing=mixing,
                   greek_method="lr-joint-density")
        return res
    pr, se = slv.price(kname, p["strike"], p["maturity"],
                       jax.random.PRNGKey(int(body.get("seed", 0))), cp=cp,
                       barrier=barrier, n_paths=n_paths,
                       n_steps=int(body.get("n_steps", 64)),
                       return_stderr=True)
    return {"model": "slv", "dynamics": "heston-x-dupire-leverage",
            "kind": kname, "price": _to_jsonable(pr),
            "std_error": _to_jsonable(se), "mixing": mixing}


def handle_basket(body: dict) -> dict:
    """Multi-asset kernel over the wire: price (any kind) or the full
    per-asset LR ladder (``greeks=true``). ``sampler="sobol"`` gives the
    pure 2d-dim QMC terminal law (terminal kinds; stderr indicative)."""
    from .ops.multi_asset_pallas import (KINDS, pallas_multi_asset_greeks,
                                         pallas_multi_asset_price)
    from .utils.exceptions import ValidationError

    spots = [float(x) for x in body.get("spots", [100.0, 95.0, 105.0])]
    vols = [float(x) for x in body.get("vols", [0.2, 0.25, 0.3])]
    d = len(spots)
    corr = body.get("corr")
    if corr is None:
        rho = float(body.get("rho", 0.4))
        corr = np.full((d, d), rho)
        np.fill_diagonal(corr, 1.0)
    weights = body.get("weights")
    kind = str(body.get("kind", "basket"))
    if kind not in KINDS:
        raise ValidationError(f"unknown kind {kind!r}; choose {KINDS}")
    cp = 1.0 if str(body.get("option_type", "call")).lower().startswith("c") \
        else -1.0
    kw = dict(weights=weights, cp=cp,
              n_paths=min(int(body.get("n_paths", 500_000)), 4_000_000),
              n_steps=int(body.get("n_steps", 1)),
              seed=int(body.get("seed", 0)),
              sampler=str(body.get("sampler", "prng")))
    args = (kind, spots, float(body.get("strike", 100.0)),
            float(body.get("maturity", 1.0)), float(body.get("rate", 0.05)),
            vols, corr)
    if body.get("greeks"):
        out = {k: _to_jsonable(v)
               for k, v in pallas_multi_asset_greeks(*args, **kw).items()}
    else:
        p, se, n = pallas_multi_asset_price(
            *args, **kw, control_variate=bool(body.get("control_variate")))
        out = {"price": float(p), "std_error": float(se), "paths": int(n)}
        if body.get("control_variate"):
            out["control_variate"] = "geometric"
    out.update(kind=kind, sampler=kw["sampler"])
    if kw["sampler"] == "sobol":
        out["stderr_note"] = ("QMC: std_error uses the plain-MC formula "
                              "and is indicative only")
    return out


def handle_iv(body: dict) -> dict:
    from .models import implied_volatility

    p, _ = _contract(body)
    iv = implied_volatility(float(body["price"]), p["spot"], p["strike"],
                            p["maturity"], p["rate"], p["option_type"], p["dividend"])
    return {"implied_vol": _to_jsonable(iv)}


def handle_varswap(body: dict) -> dict:
    """Fair variance/vol-swap strikes. Default: Heston closed forms.
    ``model="slv"`` instead returns BOTH strikes from one SLV particle
    simulation on the sample smile at ``mixing`` — K_var is
    Gyongy-pinned across mixing while the vol-swap convexity discount
    moves with it (the spread desks use SLV to mark)."""
    from .models import heston_expected_variance, heston_vol_swap_strike
    from .models.heston import HestonParams

    p = HestonParams.make(**body.get("heston_params", {}))
    t = float(body.get("maturity", 1.0))
    if str(body.get("model", "heston")).lower() == "slv":
        import jax

        from .models import slv_swap_strikes
        from .models.local_vol import DupireLocalVol, sample_smile_iv_fn

        dup = DupireLocalVol(
            sample_smile_iv_fn(base_vol=float(body.get("vol", 0.2)),
                               skew=-0.06, smile=0.03),
            float(body.get("spot", 100.0)), float(body.get("rate", 0.03)),
            k_range=(-2.5, 2.5), n_k=201)
        kv, sv, kvol, svol = slv_swap_strikes(
            dup.spot, t, dup.rate, p,
            jax.random.PRNGKey(int(body.get("seed", 0))),
            dup.surface.k_grid, dup.surface.t_grid, dup.surface.grid,
            mixing=float(body.get("mixing", 1.0)),
            n_paths=min(int(body.get("n_paths", 65_536)), 1_000_000),
            n_steps=min(int(body.get("n_steps", 64)), 256))
        return {"model": "slv", "mixing": float(body.get("mixing", 1.0)),
                "variance_strike": _to_jsonable(kv),
                "variance_stderr": _to_jsonable(sv),
                "vol_strike": _to_jsonable(kvol),
                "vol_stderr": _to_jsonable(svol)}
    return {
        "variance_strike": _to_jsonable(heston_expected_variance(p, t)),
        "vol_strike": _to_jsonable(heston_vol_swap_strike(p, t)),
    }


def handle_calibrate(body: dict) -> dict:
    """Calibrate SVI/SSVI to a quote snapshot passed inline as columns."""
    import pandas as pd

    from .surface.chain_calibration import calibrate_chain

    df = pd.DataFrame({k: body[k] for k in
                       ("underlying_price", "strike_price",
                        "time_to_maturity", "implied_volatility")
                       if k in body})
    if "risk_free_rate" in body:
        df["risk_free_rate"] = body["risk_free_rate"]
    res = calibrate_chain(df,
                          n_expiry_bins=int(body.get("n_expiry_bins", 4)),
                          n_steps=int(body.get("n_steps", 400)))
    return res.to_dict()


def handle_american(body: dict) -> dict:
    """Certified American-put bracket: {"model":
    "bs|heston|bates|lv|slv|rbergomi", contract fields, optional n_dates /
    heston_params / bates_params / rbergomi_params / smile params}.
    Returns the bracket dict ({lower, upper, width, ...}); bates
    certifies via LSM+dual on the jump-augmented QE law; rbergomi via
    exact conditional Gaussians on the causal Volterra factorization
    (non-Markovian dual)."""
    p, cp = _contract(body)
    model = str(body.get("model", "bs")).lower()
    n_dates = int(body.get("n_dates", 25))
    # Optional MC/grid size overrides (capped — this is a demo server).
    sizes = {k: min(int(body[k]), 1_000_000)
             for k in ("n_fit", "n_lower", "n_outer", "n_inner", "n_grid")
             if k in body}
    if model in ("heston", "bates"):
        from .models.heston import HestonParams
        from .models.heston_american import heston_american_bracket

        kw = {k: v for k, v in sizes.items() if k != "n_grid"}
        if model == "bates":
            from .models.bates import BatesParams

            par = BatesParams.make(**body.get("bates_params", {}))
            # the ADI grid is diffusion-only: jumps certify via LSM+dual
            kw.update(method="lsm", use_cv=True)
        else:
            par = HestonParams.make(**body.get("heston_params", {}))
            kw.update(method="adi")
        out = heston_american_bracket(
            p["spot"], p["strike"], p["maturity"], p["rate"], par, cp=cp,
            n_dates=min(n_dates, 50), **kw)
    elif model == "lv":
        from .models import local_vol_american_bracket
        from .models.local_vol import DupireLocalVol, sample_smile_iv_fn

        dup = DupireLocalVol(sample_smile_iv_fn(base_vol=p["vol"]),
                             p["spot"], p["rate"])
        kw = {k: v for k, v in sizes.items() if k in ("n_outer", "n_inner")}
        out = local_vol_american_bracket(dup, p["strike"], p["maturity"],
                                         cp=cp, n_dates=min(n_dates, 50),
                                         **kw)
    elif model == "slv":
        from .models import HestonParams
        from .models.local_vol import DupireLocalVol, sample_smile_iv_fn
        from .models.slv_american import slv_american_bracket

        dup = DupireLocalVol(sample_smile_iv_fn(base_vol=p["vol"]),
                             p["spot"], p["rate"])
        par = HestonParams.make(**body.get("heston_params", {}))
        kw = {k: v for k, v in sizes.items() if k != "n_grid"}
        out = slv_american_bracket(
            dup, par, p["strike"], p["maturity"], cp=cp,
            mixing=float(body.get("mixing", 1.0)),
            n_dates=min(n_dates, 50), **kw)
    elif model == "rbergomi":
        from .models.rbergomi import RBergomiParams
        from .models.rbergomi_american import rbergomi_american_bracket

        par = RBergomiParams(**body.get("rbergomi_params", {}))
        kw = {k: v for k, v in sizes.items() if k != "n_grid"}
        out = rbergomi_american_bracket(
            p["spot"], p["strike"], p["maturity"], p["rate"], par, cp=cp,
            n_dates=min(n_dates, 50), **kw)
    elif model == "bs":
        from .models import american_price_interval

        out = american_price_interval(p["spot"], p["strike"], p["maturity"],
                                      p["rate"], p["vol"], cp=cp,
                                      n_dates=n_dates, method="grid",
                                      **sizes)
    else:
        raise ValueError(f"unknown american model {model!r}; choose "
                         "bs|heston|bates|lv|slv|rbergomi")
    return {k: _to_jsonable(v) for k, v in out.items()}


def handle_book(body: dict) -> dict:
    """Same-kind contract BOOK in one kernel launch (``/book/exotic``):
    {"kind": "asian|lookback|barrier|one-touch|no-touch|double-barrier|
    double-touch", "strikes": [...], "barriers"/"lowers"/"uppers": [...],
    "model": "bs|heston|bates" (+ v0/kappa/theta/sigma_v/rho_sv and
    lam/mu_j/sigma_j for bates), "greeks": true for the per-contract LR
    ladder}. N contracts interleave the kernel row axis — one dispatch
    instead of N (reference analog ``MonteCarloPricerUni.price_batch``,
    ``src/pricing_models/monte_carlo_unified.py:562``)."""
    from .models.books import exotic_book_quote

    model = str(body.get("model", "bs"))
    params = None
    if model in ("heston", "bates"):
        from .models import BatesParams, HestonParams

        heston_args = (float(body.get("v0", 0.04)),
                       float(body.get("kappa", 2.0)),
                       float(body.get("theta", 0.04)),
                       float(body.get("sigma_v", 0.3)),
                       float(body.get("rho_sv", -0.7)))
        if model == "bates":
            params = BatesParams.make(*heston_args,
                                      lam=float(body.get("lam", 0.5)),
                                      mu_j=float(body.get("mu_j", -0.1)),
                                      sigma_j=float(body.get("sigma_j", 0.15)))
        else:
            params = HestonParams.make(*heston_args)
    strikes = [float(s) for s in body.get("strikes", [100.0])]

    def lst(name):
        v = body.get(name)
        return [float(x) for x in v] if v else None

    return exotic_book_quote(
        str(body.get("kind", "asian")), float(body.get("spot", 100.0)),
        strikes, float(body.get("maturity", 1.0)),
        float(body.get("rate", 0.05)), vol=float(body.get("vol", 0.2)),
        model=model, params=params,
        cp=1.0 if str(body.get("type", "call")).startswith("c") else -1.0,
        dividend=float(body.get("dividend", 0.0)),
        barriers=lst("barriers"), lowers=lst("lowers"),
        uppers=lst("uppers"), greeks=bool(body.get("greeks", False)),
        n_paths=int(body.get("n_paths", 200_000)),
        n_steps=int(body.get("n_steps", 64)),
        seed=int(body.get("seed", 0)),
        scheme=str(body.get("scheme", "euler")),
        barrier_type=str(body.get("barrier_type", "up-and-out")),
        averaging=str(body.get("averaging", "arithmetic")),
        floating=bool(body.get("floating", True)),
        knock=str(body.get("knock", "out")),
        touch=str(body.get("touch", "no")),
        direction=str(body.get("direction", "up")))


def handle_xva(body: dict) -> dict:
    """Counterparty exposure + CVA for a netting set: {"positions":
    [{quantity, strike, maturity, option_type}, ...], "spot", "rate",
    "vol", optional hazard/recovery/own_hazard/quantile/dates/paths/
    collateral_threshold/mpor}. Sizes are capped (demo server).

    Any position with a "kind" routes through the AMC engine; there
    "model": "bs|heston|bates|slv|rbergomi" selects the exposure
    dynamics ("heston_params"/"bates_params"/"rbergomi_params"/"mixing"
    override the defaults — same conventions as /american; an override
    dict the chosen model cannot consume is a 400, not a silent drop).
    Vol precedence on the AMC path: per-position "vol" wins; a top-level
    "vol" pins the BS dynamics only when NO position carries its own."""
    from .risk import Position, xva_report

    spot = float(body.get("spot", 100.0))
    rate = float(body.get("rate", 0.05))
    vol = float(body.get("vol", 0.2))
    specs = body.get("positions") or [{}]
    model = str(body.get("model", "bs")).lower()
    if any("kind" in s_ for s_ in specs) or model != "bs":
        # any path-dependent position — or any non-BS dynamics choice —
        # routes the WHOLE set through the AMC (regression-revaluation)
        # engine; kind="vanilla" mixes in / is the default
        from .risk import (ExoticPosition, amc_dynamics_kwargs,
                           amc_exposure_profile, cva_dva)

        book = [ExoticPosition(kind=str(s_.get("kind", "vanilla")),
                               quantity=float(s_.get("quantity", 1.0)),
                               strike=float(s_.get("strike", 100.0)),
                               maturity=float(s_.get("maturity", 1.0)),
                               option_type=str(s_.get("option_type",
                                                      "call")),
                               barrier=float(s_.get("barrier", 0.0)),
                               vol=float(s_.get("vol", vol)))
                for s_ in specs]
        dyn = amc_dynamics_kwargs(
            model, spot=spot, rate=rate, vol=vol,
            heston_params=body.get("heston_params"),
            bates_params=body.get("bates_params"),
            rbergomi_params=body.get("rbergomi_params"),
            mixing=body.get("mixing", 1.0))
        prof = amc_exposure_profile(
            book, spot=spot, rate=rate,
            # a top-level "vol" pins the BS dynamics ONLY when no
            # position carries its own vol; a book with per-position
            # vols keeps the engine default (first position's vol), so
            # clients that habitually send both see no shift
            vol=(float(body["vol"])
                 if "vol" in body and not any("vol" in s_ for s_ in specs)
                 else None),
            n_dates=min(int(body.get("dates", 24)), 120),
            n_paths=min(int(body.get("paths", 65536)), 524_288),
            quantile=float(body.get("quantile", 0.95)),
            seed=int(body.get("seed", 0)), **dyn)
        out = cva_dva(prof, hazard_rate=float(body.get("hazard", 0.02)),
                      recovery=float(body.get("recovery", 0.4)))
        return {"engine": "amc", "model": model,
                "dates": [float(t) for t in prof.dates],
                "ee": [float(x) for x in prof.ee],
                "pfe": [float(x) for x in prof.pfe],
                "epe": prof.epe, "max_pfe": prof.max_pfe,
                **{k: _to_jsonable(v) for k, v in out.items()}}
    book = [Position(quantity=float(s.get("quantity", 1.0)), spot=spot,
                     strike=float(s.get("strike", 100.0)),
                     maturity=float(s.get("maturity", 1.0)), rate=rate,
                     vol=float(s.get("vol", vol)),
                     option_type=str(s.get("option_type", "call")))
            for s in specs]
    thr = body.get("collateral_threshold")
    out = xva_report(
        book, hazard_rate=float(body.get("hazard", 0.02)),
        recovery=float(body.get("recovery", 0.4)),
        funding_spread=(float(body["funding_spread"])
                        if "funding_spread" in body else None),
        own_hazard_rate=(float(body["own_hazard"]) if "own_hazard" in body
                         else None),
        n_dates=min(int(body.get("dates", 24)), 120),
        n_paths=min(int(body.get("paths", 65536)), 1_048_576),
        quantile=float(body.get("quantile", 0.95)),
        collateral_threshold=None if thr is None else float(thr),
        mpor=float(body.get("mpor", 0.0)), seed=int(body.get("seed", 0)))
    return {k: _to_jsonable(v) for k, v in out.items()}


ROUTES = {
    "/price": handle_price,
    "/greeks": handle_greeks,
    "/mc": handle_mc,
    "/iv": handle_iv,
    "/exotic": handle_exotic,
    "/varswap": handle_varswap,
    "/calibrate": handle_calibrate,
    "/american": handle_american,
    "/basket": handle_basket,
    "/xva": handle_xva,
    "/batch/price": handle_price,  # same handler — fields may be lists
    "/book/exotic": handle_book,
}


class _Handler(BaseHTTPRequestHandler):
    def _send(self, code: int, payload: dict):
        data = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):  # noqa: N802
        if self.path == "/health":
            import jax

            self._send(200, {"status": "ok", "backend": jax.default_backend(),
                             "devices": [str(d) for d in jax.devices()]})
        elif self.path == "/metrics":
            from .utils.timing import get_timings

            out = {}
            for label, ms in get_timings().items():
                if not label.startswith("http:"):
                    continue
                s = sorted(ms)
                n = len(s)
                out[label[5:]] = {
                    "count": n,
                    "p50_ms": round(s[n // 2], 3),
                    "p95_ms": round(s[min(n - 1, int(0.95 * n))], 3),
                    "max_ms": round(s[-1], 3),
                }
            self._send(200, out)
        else:
            self._send(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):  # noqa: N802
        handler = ROUTES.get(self.path)
        if handler is None:
            self._send(404, {"error": f"unknown endpoint {self.path}",
                             "endpoints": sorted(ROUTES)})
            return
        from .utils.timing import Timer

        try:
            length = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(length) or b"{}")
            with Timer(f"http:{self.path}"):
                payload = handler(body)
            self._send(200, payload)
        except Exception as e:
            self._send(400, {"error": f"{type(e).__name__}: {e}"})

    def log_message(self, fmt, *args):
        logger.info("%s %s", self.address_string(), fmt % args)


class PricingServer:
    """Embeddable server: ``PricingServer(port).start()`` / ``.stop()``."""

    def __init__(self, port: int = 8777, host: str = "127.0.0.1", warm: bool = True):
        self.httpd = ThreadingHTTPServer((host, port), _Handler)
        self.port = self.httpd.server_address[1]
        self._thread = None
        if warm:
            self.warmup()

    @staticmethod
    def warmup():
        """Compile the common scalar shapes before serving."""
        try:
            handle_price({"model": "bs"})
            handle_greeks({})
        except Exception as e:  # pragma: no cover
            logger.warning("warmup failed: %s", e)

    def start(self):
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()
        logger.info("pricing server on port %d", self.port)
        return self

    def stop(self):
        self.httpd.shutdown()
        if self._thread:
            self._thread.join(timeout=5)

    def serve_forever(self):  # pragma: no cover - blocking entry
        logger.info("pricing server on port %d (blocking)", self.port)
        self.httpd.serve_forever()


def main(argv=None):  # pragma: no cover - CLI entry
    import argparse

    ap = argparse.ArgumentParser(description="optionslab_tpu pricing server")
    ap.add_argument("--port", type=int, default=8777)
    ap.add_argument("--host", default="127.0.0.1")
    args = ap.parse_args(argv)
    PricingServer(args.port, args.host).serve_forever()


if __name__ == "__main__":  # pragma: no cover
    main()
