"""Benchmark entry point — prints ONE JSON line for the driver.

Headline metric (BASELINE.json): paths/sec/chip for GBM Monte Carlo option
pricing WITH the full Greek ladder (price, stderr, delta, gamma, vega, rho,
theta) computed in the same pass, on the fused Pallas kernel.

Baseline anchor: the reference's vectorized NumPy MC does 100k paths in
~3.0 ms on CPU (BASELINE.md) ≈ 3.33e7 paths/s — price only, no Greeks.

Deadline-safe design (round 5 — the round-4 driver run timed out at
rc=124 and lost EVERY number):

* The headline runs first and an insurance copy of its JSON line goes to
  stderr (and ``BENCH_headline.json``) IMMEDIATELY — a later timeout can
  no longer erase the headline.
* Extras run as named sections in priority order under a wall-clock
  budget (env ``BENCH_BUDGET_S`` / ``--budget``, default 1320 s).  The
  deadline is checked BEFORE each section; on exhaustion the remaining
  sections are skipped with a ``budget_exhausted_after`` marker and the
  final line still prints.
* Each section's metrics are flushed to ``BENCH_extras.json`` as soon as
  it completes, so even a hard kill mid-section loses at most that one
  section; the next run reuses the file.
* ``--only sec1,sec2`` reruns just those sections and merges everything
  else from ``BENCH_extras.json`` (``--list`` shows section names) — a
  round that changes one kernel family re-captures that family alone.
* The persistent XLA compile cache is enabled for the TPU backend
  (``.jax_cache_tpu/``), so re-runs skip the 5–15 min tunnel compiles.
  (It is the XLA:CPU cache that segfaults on this VM — see CLAUDE.md;
  disable with ``OPTIONSLAB_BENCH_NO_CACHE=1`` if the TPU path ever
  misbehaves.)
"""

import argparse
import json
import math
import os
import sys
import time

EXTRAS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_extras.json")
HEADLINE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_headline.json")

# TPU v5e VPU: 8x128 f32 ALUs at ~0.94 GHz ≈ 9.6e11 elementwise ops/s;
# a transcendental costs ~4-8 ALU passes (midpoint 6 used throughout).
VPU_OPS_PER_SEC = 8 * 128 * 0.94e9

SECTIONS = []  # (name, fn) in priority order — registered below


def section(name):
    def reg(fn):
        SECTIONS.append((name, fn))
        return fn
    return reg


def _load_extras_file():
    try:
        with open(EXTRAS_PATH) as f:
            d = json.load(f)
        if isinstance(d, dict) and isinstance(d.get("sections"), dict):
            return d
    except (OSError, ValueError):
        pass
    return {"sections": {}}


def _flush_section(store, name, metrics, wall_s, backend):
    store["sections"][name] = {
        "metrics": metrics, "wall_s": round(wall_s, 1), "backend": backend,
    }
    tmp = EXTRAS_PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(store, f, indent=1, sort_keys=True)
    os.replace(tmp, EXTRAS_PATH)


# ---------------------------------------------------------------------------
# extras sections — each returns a flat dict of metric keys. ``ctx`` carries
# the shared imports/state set up by main(). Section bodies are the round-3/4
# measurements unchanged; only the orchestration around them is new.
# ---------------------------------------------------------------------------

def _rate3(fn, *args, **kwargs):
    """Median-free 3-iteration rate helper: warmup already done by caller."""
    import jax
    t0 = time.perf_counter()
    for i in range(3):
        out = fn(i, *args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / 3


@section("asian")
def _sec_asian(ctx):
    import jax
    from optionslab_tpu.ops.exotic_pallas import pallas_exotic_price

    p, _, n_e = pallas_exotic_price("asian_arith", 100.0, 100.0, 1.0, 0.05,
                                    0.2, n_paths=4_000_000, n_steps=252,
                                    seed=0)
    jax.block_until_ready(p)
    dt = _rate3(lambda i: pallas_exotic_price(
        "asian_arith", 100.0, 100.0, 1.0, 0.05, 0.2, n_paths=4_000_000,
        n_steps=252, seed=10 + i)[0])
    return {"asian_path_steps_per_sec": round(n_e * 252 / dt, 1)}


@section("exotic_greeks")
def _sec_exotic_greeks(ctx):
    import jax
    from optionslab_tpu.ops.exotic_pallas import pallas_exotic_greeks

    g = pallas_exotic_greeks("asian_arith", 100.0, 100.0, 1.0, 0.05, 0.2,
                             n_paths=8_000_000, n_steps=252, seed=0)
    jax.block_until_ready(g["price"])
    t0 = time.perf_counter()
    for i in range(3):
        g = pallas_exotic_greeks("asian_arith", 100.0, 100.0, 1.0, 0.05, 0.2,
                                 n_paths=8_000_000, n_steps=252, seed=20 + i)
        jax.block_until_ready(g["price"])
    dt = (time.perf_counter() - t0) / 3
    return {"exotic_greeks_path_steps_per_sec": round(g["paths"] * 252 / dt, 1),
            "exotic_greeks_delta": round(float(g["delta"]), 5)}


@section("heston")
def _sec_heston(ctx):
    import jax
    from optionslab_tpu.models.heston import HestonParams
    from optionslab_tpu.ops.heston_pallas import pallas_heston_price

    # large workload: amortizes the ~25-30 ms dispatch overhead that
    # dominated the old 4Mx100 size (kernel rate is ~2.4e10 at scale)
    hp, _, n_h = pallas_heston_price(100.0, 100.0, 1.0, 0.05,
                                     HestonParams.make(),
                                     n_paths=8_388_608, n_steps=252, seed=0)
    jax.block_until_ready(hp)
    dt = _rate3(lambda i: pallas_heston_price(
        100.0, 100.0, 1.0, 0.05, HestonParams.make(),
        n_paths=8_388_608, n_steps=252, seed=1 + i)[0])
    return {"heston_path_steps_per_sec": round(n_h * 252 / dt, 1)}


@section("heston_vega_ladder")
def _sec_heston_ladder(ctx):
    import jax
    from optionslab_tpu.models.heston import HestonParams
    from optionslab_tpu.ops.heston_pallas import pallas_heston_greeks

    hg = pallas_heston_greeks(100.0, 100.0, 1.0, 0.05, HestonParams.make(),
                              n_paths=8_388_608, n_steps=252, seed=0)
    jax.block_until_ready(hg["price"])
    t0 = time.perf_counter()
    for i in range(3):
        hg = pallas_heston_greeks(100.0, 100.0, 1.0, 0.05,
                                  HestonParams.make(), n_paths=8_388_608,
                                  n_steps=252, seed=1 + i)
        jax.block_until_ready(hg["price"])
    dt = (time.perf_counter() - t0) / 3
    return {"heston_vega_ladder_path_steps_per_sec":
            round(hg["paths"] * 252 / dt, 1)}


@section("barrier_lr")
def _sec_barrier_lr(ctx):
    import jax
    from optionslab_tpu.ops.exotic_pallas import pallas_exotic_lr_greeks

    g = pallas_exotic_lr_greeks("barrier_up-and-out", 100.0, 100.0, 1.0,
                                0.05, 0.2, barrier=120.0,
                                n_paths=16_000_000, n_steps=64, seed=0)
    jax.block_until_ready(g["price"])
    t0 = time.perf_counter()
    for i in range(3):
        g = pallas_exotic_lr_greeks("barrier_up-and-out", 100.0, 100.0,
                                    1.0, 0.05, 0.2, barrier=120.0,
                                    n_paths=16_000_000, n_steps=64,
                                    seed=30 + i)
        jax.block_until_ready(g["price"])
    dt = (time.perf_counter() - t0) / 3
    return {"barrier_lr_greeks_path_steps_per_sec":
            round(g["paths"] * 64 / dt, 1)}


@section("heston_exotic")
def _sec_heston_exotic(ctx):
    import jax
    from optionslab_tpu.models.heston import HestonParams
    from optionslab_tpu.ops.heston_pallas import pallas_heston_exotic_price

    hx, _, n_hx = pallas_heston_exotic_price(
        "asian_arith", 100.0, 100.0, 1.0, 0.05, HestonParams.make(),
        n_paths=8_388_608, n_steps=64, seed=0)
    jax.block_until_ready(hx)
    dt = _rate3(lambda i: pallas_heston_exotic_price(
        "asian_arith", 100.0, 100.0, 1.0, 0.05, HestonParams.make(),
        n_paths=8_388_608, n_steps=64, seed=50 + i)[0])
    return {"heston_exotic_path_steps_per_sec": round(n_hx * 64 / dt, 1)}


@section("heston_exotic_ladder")
def _sec_heston_exotic_ladder(ctx):
    import jax
    from optionslab_tpu.models.heston import HestonParams
    from optionslab_tpu.ops.heston_pallas import pallas_heston_exotic_lr_greeks

    hxg = pallas_heston_exotic_lr_greeks(
        "barrier_up-and-out", 100.0, 100.0, 1.0, 0.05, HestonParams.make(),
        barrier=120.0, n_paths=8_388_608, n_steps=64, seed=0)
    jax.block_until_ready(hxg["price"])
    t0 = time.perf_counter()
    for i in range(3):
        hxg = pallas_heston_exotic_lr_greeks(
            "barrier_up-and-out", 100.0, 100.0, 1.0, 0.05,
            HestonParams.make(), barrier=120.0, n_paths=8_388_608,
            n_steps=64, seed=60 + i)
        jax.block_until_ready(hxg["price"])
    dt = (time.perf_counter() - t0) / 3
    return {"heston_exotic_ladder_path_steps_per_sec":
            round(hxg["paths"] * 64 / dt, 1)}


@section("exotic_book")
def _sec_exotic_book(ctx):
    """8-contract mixed-strike Asian book in ONE launch (round-5: the
    contract axis interleaves kernel rows) vs 8 single dispatches —
    reference analog ``MonteCarloPricerUni.price_batch``."""
    import jax
    import numpy as np
    from optionslab_tpu.ops.exotic_pallas import (pallas_exotic_book_price,
                                                  pallas_exotic_price)

    strikes = [80.0, 85.0, 90.0, 95.0, 100.0, 105.0, 110.0, 115.0]
    args = (100.0, 1.0, 0.05, 0.2)

    def book(i):
        return pallas_exotic_book_price(
            "asian_arith", args[0], strikes, args[1], args[2], args[3],
            n_paths=1_000_000, n_steps=64, seed=20 + i)

    bp, bse, _ = book(0)
    jax.block_until_ready(bp)
    dt_book = _rate3(lambda i: book(1 + i)[0])

    # warm the single-contract program first so the speedup compares
    # steady-state dispatches, not one compile against a warm book
    jax.block_until_ready(pallas_exotic_price(
        "asian_arith", args[0], strikes[0], args[1], args[2], args[3],
        n_paths=1_000_000, n_steps=64, seed=39)[0])
    t0 = time.perf_counter()
    singles = [pallas_exotic_price("asian_arith", args[0], k, args[1],
                                   args[2], args[3], n_paths=1_000_000,
                                   n_steps=64, seed=40)
               for k in strikes]
    jax.block_until_ready(singles[-1][0])
    dt_singles = time.perf_counter() - t0
    # parity: each book price within 5 sigma of its single-call sibling
    devs = [abs(float(bp[i]) - float(p)) / max(
        float(np.hypot(float(bse[i]), float(se))), 1e-9)
        for i, (p, se, _) in enumerate(singles)]
    return {
        "exotic_book8_1m_ms": round(dt_book * 1e3, 2),
        "exotic_book8_vs_8_singles_speedup": round(dt_singles / dt_book, 2),
        "exotic_book8_max_dev_sigma": round(max(devs), 2),
    }


@section("heston_book")
def _sec_heston_book(ctx):
    """8-contract mixed-strike Asian book under ONE Heston dynamics in
    ONE launch (round-5 contract axis for the heston exotic kernel)."""
    import jax
    from optionslab_tpu.models.heston import HestonParams
    from optionslab_tpu.ops.heston_pallas import (
        pallas_heston_exotic_book_price)

    strikes = [80.0, 85.0, 90.0, 95.0, 100.0, 105.0, 110.0, 115.0]

    def book(i):
        return pallas_heston_exotic_book_price(
            "asian_arith", 100.0, strikes, 1.0, 0.05, HestonParams.make(),
            n_paths=1_000_000, n_steps=64, seed=70 + i)

    bp, _, n_c = book(0)
    jax.block_until_ready(bp)
    dt = _rate3(lambda i: book(1 + i)[0])
    return {
        "heston_book8_1m_ms": round(dt * 1e3, 2),
        "heston_book8_path_steps_per_sec": round(8 * n_c * 64 / dt, 1),
    }


@section("local_vol")
def _sec_local_vol(ctx):
    import jax
    from optionslab_tpu.models.local_vol import (DupireLocalVol,
                                                 sample_smile_iv_fn)
    from optionslab_tpu.ops.local_vol_pallas import LocalVolKernelPricer

    pr = LocalVolKernelPricer(DupireLocalVol(sample_smile_iv_fn(), 100.0,
                                             0.05), 1.0, n_steps=100)
    lp, _, n_lv = pr.price(100.0, n_paths=8_000_000, seed=0)
    jax.block_until_ready(lp)
    dt = _rate3(lambda i: pr.price(100.0, n_paths=8_000_000,
                                   seed=40 + i)[0])
    return {"local_vol_path_steps_per_sec": round(n_lv * 100 / dt, 1)}


@section("slv")
def _sec_slv(ctx):
    import jax
    from optionslab_tpu.models.heston import HestonParams
    from optionslab_tpu.models.local_vol import (DupireLocalVol,
                                                 sample_smile_iv_fn)
    from optionslab_tpu.ops.slv_pallas import SLVKernelPricer

    slvp = SLVKernelPricer(
        DupireLocalVol(sample_smile_iv_fn(), 100.0, 0.05),
        HestonParams.make(0.04, 2.0, 0.04, 0.5, -0.7), 1.0,
        mixing=1.0, n_steps=64)
    sp, _, n_slv = slvp.price("barrier_up-and-out", 100.0, barrier=125.0,
                              n_paths=8_000_000, seed=0)
    jax.block_until_ready(sp)
    dt = _rate3(lambda i: slvp.price("barrier_up-and-out", 100.0,
                                     barrier=125.0, n_paths=8_000_000,
                                     seed=80 + i)[0])
    return {"slv_path_steps_per_sec": round(n_slv * 64 / dt, 1)}


@section("rbergomi")
def _sec_rbergomi(ctx):
    # rough Bergomi EXACT-Volterra simulation rate. The O(n_steps^2)
    # covariance matmul is deliberate TPU design: it rides the MXU (one
    # (paths, 2n)x(2n, 2n) contraction), where n^2 MXU flops beat
    # n log n VPU shuffles at these n — and the variance path is exact
    # in law, no hybrid-scheme bias.
    import jax
    import jax.numpy as jnp
    from optionslab_tpu.models.rbergomi import RBergomiParams, rbergomi_price

    import numpy as np

    rb = RBergomiParams(hurst=0.1, eta=1.9, rho=-0.9, xi0=0.04)
    rb_paths, rb_steps = 1_048_576, 64
    ks = np.array([100.0], np.float32)  # host operand: no eager-RPC per call
    rbp, _ = rbergomi_price(100.0, ks, 1.0, 0.05, rb,
                            jax.random.PRNGKey(0), n_paths=rb_paths,
                            n_steps=rb_steps)
    jax.block_until_ready(rbp)
    keys = [jax.random.PRNGKey(1 + i) for i in range(3)]  # pre-built: key
    # creation is itself an eager device op on the axon backend
    dt = _rate3(lambda i: rbergomi_price(
        100.0, ks, 1.0, 0.05, rb,
        keys[i], n_paths=rb_paths, n_steps=rb_steps)[0])
    rate = round(rb_paths * rb_steps / dt, 1)
    # MXU-bound: 2·(2n)² f32 FLOPs per path through the covariance factor
    rb_flops = rate / rb_steps * 2.0 * (2 * rb_steps) ** 2
    return {"rbergomi_exact_path_steps_per_sec": rate,
            "rbergomi_mxu_roofline_pct": round(100.0 * rb_flops / 4.9e13, 1)}


@section("multi_asset")
def _sec_multi_asset(ctx):
    import jax
    from optionslab_tpu.ops.multi_asset_pallas import pallas_multi_asset_price

    ma_args = (["basket_asian", [100.0, 95.0, 105.0], 100.0, 1.0, 0.05,
                [0.2, 0.25, 0.3],
                [[1.0, 0.5, 0.3], [0.5, 1.0, 0.4], [0.3, 0.4, 1.0]]])
    mp, _, n_ma = pallas_multi_asset_price(*ma_args, weights=[0.4, 0.3, 0.3],
                                           n_paths=4_000_000, n_steps=252,
                                           seed=0)
    jax.block_until_ready(mp)
    dt = _rate3(lambda i: pallas_multi_asset_price(
        *ma_args, weights=[0.4, 0.3, 0.3], n_paths=4_000_000, n_steps=252,
        seed=50 + i)[0])
    return {"basket_asian_3asset_asset_steps_per_sec":
            round(n_ma * 252 * 3 / dt, 1)}


@section("multi_asset_ladder")
def _sec_multi_asset_ladder(ctx):
    import jax
    from optionslab_tpu.ops.multi_asset_pallas import pallas_multi_asset_greeks

    ma_args = (["basket_asian", [100.0, 95.0, 105.0], 100.0, 1.0, 0.05,
                [0.2, 0.25, 0.3],
                [[1.0, 0.5, 0.3], [0.5, 1.0, 0.4], [0.3, 0.4, 1.0]]])
    mg = pallas_multi_asset_greeks(*ma_args, weights=[0.4, 0.3, 0.3],
                                   n_paths=4_000_000, n_steps=64, seed=0)
    jax.block_until_ready(mg["price"])
    t0 = time.perf_counter()
    for i in range(3):
        mg = pallas_multi_asset_greeks(*ma_args, weights=[0.4, 0.3, 0.3],
                                       n_paths=4_000_000, n_steps=64,
                                       seed=60 + i)
        jax.block_until_ready(mg["price"])
    dt = (time.perf_counter() - t0) / 3
    return {"basket_asian_full_ladder_asset_steps_per_sec":
            round(mg["paths"] * 64 * 3 / dt, 1)}


@section("heston_chain")
def _sec_heston_chain(ctx):
    # whole-chain Heston pricing + full calibration gradient (5 quotes x
    # 5 params) in ONE kernel launch
    import jax
    from optionslab_tpu.models.heston import HestonParams
    from optionslab_tpu.ops.heston_pallas import pallas_heston_chain_ladder

    ch_args = ([90.0, 100.0, 110.0, 95.0, 105.0], [0.5, 0.5, 0.5, 1.0, 1.0],
               [-1.0, 1.0, 1.0, -1.0, 1.0], 100.0, 0.05, HestonParams.make())
    pr_c, _, _ = pallas_heston_chain_ladder(*ch_args, n_paths=2_000_000,
                                            max_dt=1.0 / 64, seed=0)
    jax.block_until_ready(pr_c)
    dt = _rate3(lambda i: pallas_heston_chain_ladder(
        *ch_args, n_paths=2_000_000, max_dt=1.0 / 64, seed=70 + i)[0])
    return {"heston_chain5_price_plus_grad25_ms": round(dt * 1e3, 1)}


@section("heston_american")
def _sec_heston_american(ctx):
    # certified American-under-Heston bracket (ADI-surface dual +
    # martingale control variate) — sub-cent width
    from optionslab_tpu.models.heston import HestonParams
    from optionslab_tpu.models.heston_american import heston_american_bracket

    hb = heston_american_bracket(100.0, 100.0, 1.0, 0.05,
                                 HestonParams.make(), n_dates=16, n_sub=2,
                                 n_outer=2048, n_inner=1024, method="adi",
                                 n_x=161, n_v=81, steps_per_date=6, seed=0)
    return {"heston_american_certified_width": round(hb["width"], 6),
            "heston_american_bracket_se": round(
                max(hb["lower_se"], hb["upper_se"]), 6)}


@section("qmc")
def _sec_qmc(ctx):
    import jax
    import jax.numpy as jnp
    from optionslab_tpu.models.black_scholes import bs_price
    from optionslab_tpu.models.exotics import geometric_asian_closed_form
    from optionslab_tpu.ops.exotic_pallas import pallas_exotic_price
    from optionslab_tpu.ops.gbm_pallas import pallas_mc_price_greeks
    from optionslab_tpu.types import ContractBatch

    out = {}
    q = pallas_mc_price_greeks(ctx["batch"], n_paths=16_000_000, seed=0,
                               sampler="sobol")
    out["qmc_16m_price_abs_err"] = round(
        abs(float(q["price"]) - ctx["exact"]), 8)

    # 8-level in-kernel bridge QMC on a path-dependent payoff — honest
    # rms error ratio vs plain MC at 4M paths (seeds 0-4)
    cf_ga = float(geometric_asian_closed_form(100.0, 100.0, 1.0, 0.05, 0.2,
                                              1.0, 0.0, 64))
    e_mc, e_q = [], []
    for sd in range(5):
        pm, _, _ = pallas_exotic_price("asian_geo", 100.0, 100.0, 1.0, 0.05,
                                       0.2, n_paths=4_000_000, n_steps=64,
                                       seed=sd)
        pq8, _, _ = pallas_exotic_price("asian_geo", 100.0, 100.0, 1.0, 0.05,
                                        0.2, n_paths=4_000_000, n_steps=64,
                                        seed=sd, sampler="sobol_bb")
        e_mc.append((float(pm) - cf_ga) ** 2)
        e_q.append((float(pq8) - cf_ga) ** 2)
    out["bridge_qmc8_err_ratio_4m"] = round(
        math.sqrt(sum(e_mc) / max(sum(e_q), 1e-30)), 1)

    # per-contract scrambled nets: book QMC error stays at QMC scale
    spots_q = jnp.linspace(85.0, 115.0, 8)
    bq = ContractBatch.make(spots_q, 100.0, 1.0, 0.05, 0.2, "call")
    qb = pallas_mc_price_greeks(bq, n_paths=2_000_000, seed=0,
                                sampler="sobol")
    exact_b = bs_price(spots_q, 100.0, 1.0, 0.05, 0.2, 1.0, 0.0)
    out["qmc_book8_2m_max_abs_err"] = round(
        float(jnp.max(jnp.abs(qb["price"] - exact_b))), 8)
    return out


@section("svi_batch")
def _sec_svi_batch(ctx):
    # a WHOLE SURFACE of SVI slice calibrations in ONE device program
    # (vmapped scanned Adam, ops/optim.scan_adam_batched)
    from bench_surface import section_batched_slices

    sb = section_batched_slices(64)
    return {"svi_64_slices_one_launch_ms": sb["one_launch_ms"],
            "svi_64_slices_median_truth_rmse_bps": sb["median_truth_rmse_bps"]}


# ---- per-family roofline accounting (derived, costs nothing) -------------
# transcendental tile-ops PER PATH-STEP by construction of each kernel (one
# Box–Muller pair = log+sqrt+cos+sin = 4 transc serves 4 antithetic
# branch-paths ⇒ 1.0/path-step/draw-pair):
#   exotic (GBM):   1 draw + shared exp         ≈ 1.75
#   local-vol:      1 draw + no lookups (poly)  ≈ 1.25
#   heston euler:   2 draws (z_v, z_x) + √v     ≈ 3.0
#   slv:            heston + leverage Horner    ≈ 3.0
#   multi-asset:    d draw-pairs/step (d=3)     ≈ 3.0 per ASSET-step: 1.0
#     (the bench rate is asset-steps/s)
#   rbergomi:       MXU-bound (covariance matmul) — reported vs f32 MXU
_TRANSC_PER_STEP = {
    "asian_path_steps_per_sec": 1.75,
    "exotic_greeks_path_steps_per_sec": 1.75,
    "barrier_lr_greeks_path_steps_per_sec": 1.75,
    "heston_path_steps_per_sec": 3.0,
    "heston_vega_ladder_path_steps_per_sec": 3.0,
    "heston_exotic_path_steps_per_sec": 3.0,
    "heston_exotic_ladder_path_steps_per_sec": 3.0,
    "heston_book8_path_steps_per_sec": 3.0,
    "local_vol_path_steps_per_sec": 1.25,
    "slv_path_steps_per_sec": 3.0,
    "basket_asian_3asset_asset_steps_per_sec": 1.0,
    "basket_asian_full_ladder_asset_steps_per_sec": 1.0,
}

_BOUND_NOTE = (
    "price-only GBM-family kernels are transcendental-bound (roofline_pct "
    "is the meaningful ceiling fraction); the full-ladder variants carry "
    "18-28 VMEM accumulator tiles per step and are carry/VMEM-bandwidth "
    "bound; the Heston families additionally carry the serial (x, v) "
    "variance recursion (per-step sqrt/max dependency chain that cannot "
    "overlap the draws) and the exotic variants 1-4 running payoff stats "
    "x 4 branches — their lower roofline_pct states those bounds, not "
    "waste")


def _rooflines(extras):
    out = {}
    for key_r, k_t in _TRANSC_PER_STEP.items():
        if key_r in extras:
            out[key_r.replace("_per_sec", "") + "_roofline_pct"] = round(
                100.0 * extras[key_r] * k_t * 6.0 / VPU_OPS_PER_SEC, 1)
    out["ladder_kernels_bound_note"] = _BOUND_NOTE
    return out


# ---------------------------------------------------------------------------


def run_headline(ctx):
    """The driver-tracked metric: fused GBM kernel, price + full Greek
    ladder, 1e9 paths/launch. Returns the result dict (sans extras)."""
    import jax
    import jax.numpy as jnp
    from optionslab_tpu.ops.gbm_pallas import (pallas_mc_price_greeks,
                                               pallas_mc_price_only,
                                               pallas_paths_per_launch)
    from optionslab_tpu.types import ContractBatch

    on_tpu, smp = ctx["on_tpu"], ctx["smp"]
    # throughput case: single contract, large path count amortizes dispatch.
    # The CPU fallback runs the kernel under the (slow) TPU interpreter —
    # keep it small; the record is a degraded-mode marker, not a perf claim.
    n_paths = 1_000_000_000 if on_tpu else 131_072
    batch = ContractBatch.make(100.0, 100.0, 1.0, 0.05, 0.2, "call")
    ctx["batch"] = batch

    out = jax.block_until_ready(
        pallas_mc_price_greeks(batch, n_paths=n_paths, seed=0, sampler=smp))
    price = float(out["price"])
    stderr = float(out["std_error"])
    exact = 10.450583572185565
    ctx["exact"] = exact
    ok = abs(price - exact) < max(5.0 * stderr, 5e-3 * exact)

    iters = 10 if on_tpu else 2
    t0 = time.perf_counter()
    for i in range(iters):
        res = pallas_mc_price_greeks(batch, n_paths=n_paths, seed=100 + i,
                                     sampler=smp)
    jax.block_until_ready(res)
    dt = (time.perf_counter() - t0) / iters
    actual = pallas_paths_per_launch(batch, n_paths)
    paths_per_sec = actual / dt

    # literal price-only sibling: Greek accumulators compiled OUT — the
    # apples-to-apples (price vs price) rate against the CPU baseline
    jax.block_until_ready(
        pallas_mc_price_only(batch, n_paths=n_paths, seed=0, sampler=smp))
    t0 = time.perf_counter()
    for i in range(iters):  # noqa: B007 — timed loop
        res_po = pallas_mc_price_only(batch, n_paths=n_paths, seed=100 + i,
                                      sampler=smp)
    jax.block_until_ready(res_po)
    dt_po = (time.perf_counter() - t0) / iters
    price_only_paths_per_sec = actual / dt_po

    # roofline: the workload is VPU/transcendental-bound. Per path the
    # kernel evaluates 7/4 transcendental tile-ops (log+sqrt+cos+sin per
    # 4-branch draw, 2 exp + ~1 divide shared by the 4 branches — matches
    # the kernel's CostEstimate of 7 per (row, lane) element).
    transc_per_sec = paths_per_sec * 7.0 / 4.0
    roofline_frac = transc_per_sec * 6.0 / VPU_OPS_PER_SEC  # midpoint cost 6

    # secondary: 1k-contract book, 1M paths each, full Greeks — latency
    n_book = 1024 if on_tpu else 64
    spots = jnp.linspace(50.0, 150.0, n_book)
    book = ContractBatch.make(spots, 100.0, 1.0, 0.05, 0.2, "call")
    book_paths = 1_000_000 if on_tpu else 8_192
    book_iters = 5 if on_tpu else 1
    jax.block_until_ready(pallas_mc_price_greeks(book, n_paths=book_paths,
                                                 seed=0, sampler=smp))
    t0 = time.perf_counter()
    for i in range(book_iters):
        res = pallas_mc_price_greeks(book, n_paths=book_paths, seed=200 + i,
                                     sampler=smp)
    jax.block_until_ready(res)
    book_ms = (time.perf_counter() - t0) / book_iters * 1e3

    baseline = 3.33e7  # reference CPU anchor, price only
    return {
        "metric": "pallas_gbm_mc_paths_per_sec_with_full_greeks",
        "value": round(paths_per_sec, 1),
        "unit": "paths/s/chip",
        # apples-to-apples: the PRICE-ONLY kernel rate vs the price-only
        # CPU anchor (the with-Greeks rate is within noise of it — the
        # ladder rides the same pass for free; both rates in detail)
        "vs_baseline": round(price_only_paths_per_sec / baseline, 2),
        "detail": {
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "n_paths_per_call": actual,
            "ms_per_call": round(dt * 1e3, 3),
            "price_check_ok": bool(ok),
            "price": round(price, 5),
            "price_exact_bs": exact,
            "stderr": round(stderr, 6),
            "price_only_paths_per_sec": round(price_only_paths_per_sec, 1),
            "greeks_ladder_overhead_pct": round(100.0 * (dt / dt_po - 1.0), 2),
            "transcendentals_per_sec": round(transc_per_sec, 1),
            "roofline_note": (
                "VPU/transcendental-bound: 7/4 transcendental evals/path "
                "(log+sqrt+cos+sin per 4-branch draw + 2 exp + 1 div shared "
                "by 4 branches); at ~6 ALU passes/transcendental this is "
                f"{round(100 * roofline_frac, 1)}% of the 8x128x0.94GHz VPU "
                "issue ceiling"),
            "baseline_note": ("reference CPU anchor is PRICE-ONLY "
                              "(BASELINE.md: 100k paths in ~3.0 ms, NumPy); "
                              "vs_baseline divides the literal price-only "
                              "kernel rate by it"),
            "book_%dx%dk_full_greeks_ms" % (n_book,
                                            max(book_paths // 1000, 1)):
                round(book_ms, 2),
        },
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description="optionslab_tpu benchmark")
    ap.add_argument("--only", default=None,
                    help="comma-separated section names to (re)run; all "
                         "other sections merge from BENCH_extras.json")
    ap.add_argument("--skip", default=None,
                    help="comma-separated section names to skip this run "
                         "(still merged from BENCH_extras.json if present)")
    ap.add_argument("--budget", type=float,
                    default=float(os.environ.get("BENCH_BUDGET_S", 1320)),
                    help="wall-clock budget in seconds (checked before "
                         "each extras section)")
    ap.add_argument("--list", action="store_true",
                    help="list section names and exit")
    args = ap.parse_args(argv)
    if args.list:
        for name, _ in SECTIONS:
            print(name)
        return 0
    t_start = time.perf_counter()

    import jax

    # If the TPU tunnel is unreachable, fall back to CPU rather than crash:
    # an honest (clearly labeled) CPU line beats a missing bench record.
    try:
        backend = jax.default_backend()
    except RuntimeError as e:
        print(f"# TPU backend unavailable ({e}); falling back to CPU",
              file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
        backend = jax.default_backend()
    on_tpu = backend == "tpu"

    # persistent compile cache: TPU only (the XLA:CPU AOT cache segfaults
    # on this VM — CLAUDE.md); cuts tunnel recompiles from minutes to ms
    if on_tpu and not os.environ.get("OPTIONSLAB_BENCH_NO_CACHE"):
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(
                              os.path.abspath(__file__)), ".jax_cache_tpu"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    # hardware PRNG on chip; counter-hash off-TPU (the interpreter stubs
    # the pltpu PRNG with zeros, which would corrupt the price check)
    ctx = {"on_tpu": on_tpu, "smp": "prng" if on_tpu else "hash"}

    result = run_headline(ctx)
    # insurance: the headline can no longer be lost to a timeout — one
    # copy to stderr (driver tails capture it) and one to a repo file.
    print(json.dumps(result), file=sys.stderr, flush=True)
    try:
        with open(HEADLINE_PATH, "w") as f:
            json.dump(result, f, indent=1)
    except OSError:
        pass

    store = _load_extras_file()
    only = set(args.only.split(",")) if args.only else None
    skip = set(args.skip.split(",")) if args.skip else set()
    known = {n for n, _ in SECTIONS}
    for group in (only or set()) | skip:
        if group not in known:
            print(f"# unknown section {group!r}; known: {sorted(known)}",
                  file=sys.stderr)
            return 2

    extras = {}
    if not on_tpu:
        # TPU-only extras: chip-scale path counts would take hours on the
        # interpret-mode CPU fallback; keep the headline honest and reuse
        # any previously-captured TPU sections.
        extras["secondary_skipped"] = "CPU fallback (TPU tunnel unavailable)"
    section_status = {}
    for name, fn in SECTIONS:
        cached = store["sections"].get(name)
        fresh = on_tpu and (only is None or name in only) and name not in skip
        if fresh and time.perf_counter() - t_start > args.budget:
            extras.setdefault("budget_exhausted_after",
                              round(time.perf_counter() - t_start, 1))
            fresh = False
            section_status[name] = "skipped:budget"
        if fresh:
            t0 = time.perf_counter()
            try:
                metrics = fn(ctx)
            except Exception as e:  # noqa: BLE001 — sections best-effort
                extras[f"{name}_error"] = f"{type(e).__name__}: {e}"
                section_status[name] = "error"
                continue
            _flush_section(store, name, metrics, time.perf_counter() - t0,
                           backend)
            extras.update(metrics)
            section_status[name] = "fresh"
        elif cached:
            extras.update(cached["metrics"])
            section_status[name] = "cached"
        else:
            section_status[name] = "missing"
    extras.update(_rooflines(extras))
    if any(v != "fresh" for v in section_status.values()):
        extras["sections_status"] = section_status

    result["detail"].update(extras)
    result["detail"]["bench_wall_s"] = round(time.perf_counter() - t_start, 1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
