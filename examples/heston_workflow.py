"""Stochastic-vol desk workflow: semi-analytic pricing, kernel MC with
schemes + QMC, the full calibration-gradient ladder, kernel-speed chain
calibration, and the certified American-under-Heston bracket.

Run: python examples/heston_workflow.py
(Sizes are demo-small so it finishes in ~a minute on CPU; on TPU raise
n_paths freely — the kernels integrate millions of paths per launch.)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo checkout; `pip install -e .` makes this a no-op

import jax
import jax.numpy as jnp
import numpy as np

from optionslab_tpu.models.heston import (HestonParams, calibrate_heston,
                                          heston_price)
from optionslab_tpu.types import ContractBatch

PAR = HestonParams.make(v0=0.04, kappa=2.0, theta=0.04, sigma=0.3, rho=-0.7)
S, K, T, R = 100.0, 100.0, 1.0, 0.05


def main():
    # --- semi-analytic (Lewis integral on fixed Gauss-Legendre) ---
    lewis = float(np.asarray(heston_price(
        ContractBatch.single(S, K, T, R, 1.0), PAR)).ravel()[0])
    print(f"Lewis CF price           {lewis:.4f}")

    # --- fused kernel MC: Euler vs Andersen-QE at coarse steps ---
    from optionslab_tpu.ops.heston_pallas import (pallas_heston_greeks,
                                                  pallas_heston_price)

    for scheme in ("euler", "qe"):
        p, se, n = pallas_heston_price(S, K, T, R, PAR, n_paths=200_000,
                                       n_steps=16, sampler="hash",
                                       scheme=scheme)
        print(f"kernel {scheme:5s} 16 steps    {float(p):.4f} ± "
              f"{float(se):.4f}  ({n} paths)")

    # --- bridge QMC over both Brownian streams (Euler price path) ---
    pq, _, _ = pallas_heston_price(S, K, T, R, PAR, n_paths=200_000,
                                   n_steps=16, sampler="sobol_bb")
    print(f"kernel euler + bridgeQMC {float(pq):.4f} (stderr indicative)")

    # --- full calibration-gradient ladder in ONE kernel pass ---
    # Euler ladder: exact pathwise sensitivities of the scheme;
    # QE ladder: CRN forward bumps (near-unbiased at coarse steps)
    out = pallas_heston_greeks(S, K, T, R, PAR, n_paths=200_000, n_steps=16,
                               sampler="hash", scheme="qe", ladder=True)
    print("QE ladder: " + "  ".join(
        f"{k} {float(out[k]):+.3f}"
        for k in ("delta", "vega", "d_kappa", "d_theta", "d_sigma",
                  "d_rho", "theta")))

    # --- calibrate to a synthetic chain (Lewis-AD path) ---
    chain = ContractBatch.make(S, jnp.asarray([90.0, 100.0, 110.0]),
                               jnp.asarray([0.5, 1.0, 1.0]), R, 0.2,
                               ["call", "call", "put"])
    target = heston_price(chain, PAR).ravel()
    fit, loss = calibrate_heston(target, chain, n_steps=120)
    print(f"Lewis-AD calibration     v0 {float(fit.v0):.4f} "
          f"theta {float(fit.theta):.4f} loss {float(loss):.2e}")
    # kernel-speed MC calibration of the same chain (custom-VJP kernel
    # gradients; see models.heston.calibrate_heston_mc / CLI
    # `calibrate --model heston-mc` for the full chain facade)

    # --- certified American bracket under Heston ---
    from optionslab_tpu.models.heston_american import heston_american_bracket

    br = heston_american_bracket(S, K, 0.5, R, PAR, cp=-1.0, method="adi",
                                 n_outer=2_000, n_x=151, n_v=51,
                                 n_dates=20, n_lower=50_000)
    print(f"American put bracket     [{float(br['lower']):.4f}, "
          f"{float(br['upper']):.4f}]  width "
          f"{float(br['upper'] - br['lower']):.2e}")


if __name__ == "__main__":
    main()
