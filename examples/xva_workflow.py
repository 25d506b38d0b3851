"""XVA workflow: exposure profiles, CVA/DVA, per-trade attribution,
AD CVA Greeks, and the certified multi-asset Bermudan bracket.

Run: python examples/xva_workflow.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo checkout; `pip install -e .` makes this a no-op

import numpy as np

from optionslab_tpu.risk import (Position, cva_allocation, cva_dva,
                                 cva_greeks, exposure_profile)


def main():
    # a two-underlying netting set vs one counterparty
    book = [
        Position(2.0, 100.0, 100.0, 2.0, 0.04, 0.22, "call", underlying="SPX"),
        Position(-1.0, 100.0, 110.0, 1.0, 0.04, 0.25, "call", underlying="SPX"),
        Position(1.0, 100.0, np.exp(0.04) * 100.0, 1.0, 0.04, 0.30,
                 "forward", underlying="NDX"),
    ]
    corr = [[1.0, 0.8], [0.8, 1.0]]

    # --- exposure profile: EE / PFE / EPE -------------------------------
    prof = exposure_profile(book, corr=corr, n_dates=24, n_paths=65536)
    print("EPE:", round(prof.epe, 4), " max PFE(95%):", round(prof.max_pfe, 4))
    print("EE(t):", np.round(prof.ee[::6], 3))

    # --- CVA / DVA / BCVA ------------------------------------------------
    adj = cva_dva(prof, hazard_rate=0.02, recovery=0.4, own_hazard_rate=0.01)
    print("CVA:", round(adj["cva"], 5), " DVA:", round(adj["dva"], 5),
          " BCVA:", round(adj["bcva"], 5))

    # --- collateral: threshold + margin period of risk -------------------
    coll = exposure_profile(book, corr=corr, n_dates=24, n_paths=65536,
                            collateral_threshold=5.0, mpor=2.0 / 12.0)
    print("EPE collateralized (H=5, MPoR=2m):", round(coll.epe, 4))

    # --- per-trade attribution (Euler sums EXACTLY to the total) ---------
    alloc = cva_allocation(book, 0.02, corr=corr, n_dates=16,
                           n_paths=32768)
    for trade, a in zip(alloc["trades"], alloc["allocations"]):
        print(f"  {trade:45s} -> CVA {a:+.5f}")
    print("sum == total:", round(sum(alloc["allocations"]), 6),
          "==", round(alloc["total_cva"], 6))

    # --- CVA Greeks by AD through the whole simulation -------------------
    g = cva_greeks(book, 0.02, corr=corr, n_dates=16, n_paths=32768)
    print("CVA delta:", {k: round(v, 5) for k, v in g["cva_delta"].items()})
    print("CVA vega :", {k: round(v, 5) for k, v in g["cva_vega"].items()})
    print("CVA rho  :", round(g["cva_rho"], 5),
          " dCVA/dlambda:", round(g["cva_hazard_sens"], 5))

    # --- AMC exposure: the barrier trade marks by REGRESSION -------------
    # (path-dependent value has no closed form at future dates; the AMC
    # engine regresses the discounted cashflow on the (S, state) basis,
    # out-of-sample, and knocked-in trades mark as the exact vanilla)
    from optionslab_tpu.risk import (AMC_KINDS, ExoticPosition,
                                     amc_exposure_profile)

    amc_book = [
        ExoticPosition(kind="barrier_up-and-out", strike=100.0,
                       barrier=130.0, maturity=1.0, vol=0.2),
        ExoticPosition(kind="asian_arith", strike=100.0, maturity=1.0,
                       vol=0.2),
        ExoticPosition(kind="vanilla", quantity=-0.5, strike=100.0,
                       maturity=1.0, vol=0.2),
    ]
    aprof = amc_exposure_profile(amc_book, spot=100.0, rate=0.05,
                                 n_dates=12, n_paths=32768)
    acva = cva_dva(aprof, hazard_rate=0.02)
    print("AMC netting set (UO barrier + asian - 0.5 vanilla):")
    print("  EPE:", round(aprof.epe, 4), " max PFE:",
          round(aprof.max_pfe, 4), " CVA:", round(acva["cva"], 5))

    # --- smile-/roughness-consistent exposure: the SAME AMC engine under
    # any supported dynamics (here: exact rough Bergomi — the regression
    # state gains (v, m), m = E[V~_next | F_t]; see also heston/bates/slv)
    from optionslab_tpu.models.rbergomi import RBergomiParams

    rprof = amc_exposure_profile(
        [ExoticPosition(kind="vanilla", strike=100.0, maturity=1.0,
                        option_type="put")],
        spot=100.0, rate=0.05, n_dates=8, n_sub=4, n_paths=32768,
        rbergomi_params=RBergomiParams(hurst=0.1, eta=1.9, rho=-0.9,
                                       xi0=0.04))
    print("rough-Bergomi put exposure: EPE:", round(rprof.epe, 4),
          " max PFE:", round(rprof.max_pfe, 4))

    # --- certified multi-asset Bermudan bracket (Broadie-Glasserman) -----
    from optionslab_tpu.models import max_call_bracket

    b = max_call_bracket([100.0, 100.0], 100.0, 3.0, 0.05, [0.2, 0.2],
                         dividend=0.10, n_dates=9, n_fit=50_000,
                         n_lower=100_000, n_outer=1024, n_inner=256)
    print(f"Bermudan max-call in [{b['lower']:.4f}, {b['upper']:.4f}]"
          f" (width {b['width']:.4f}; literature value 13.902)")


if __name__ == "__main__":
    main()
