"""Chain -> calibrated dynamics -> smile-consistent exotics, end to end.

The workflow a structuring desk runs daily: take an option chain, fit a
stochastic-vol model to it, then price and risk the path-dependent book
UNDER THE CALIBRATED DYNAMICS — the smile-consistent autocall/cliquet
marks a flat-vol model cannot produce.

Run:  PYTHONPATH=. python examples/exotics_workflow.py
(CPU-safe: kernel paths use the counter-based hash sampler off-TPU.)
"""

import jax

jax.config.update("jax_platforms", "cpu") if jax.default_backend() not in (
    "tpu",) else None

import numpy as np


def main():
    # --- 1. load a chain and fit Heston to it ----------------------------
    from optionslab_tpu.data import load_option_data
    from optionslab_tpu.models import HestonParams
    from optionslab_tpu.surface.chain_calibration import (
        calibrate_model_to_chain)

    chain = load_option_data("synthetic", n_rows=400, seed=3)
    fit = calibrate_model_to_chain(chain, "heston", n_steps=400)
    pd = fit["params"]
    par = HestonParams.make(pd["v0"], pd["kappa"], pd["theta"],
                            pd["sigma"], pd["rho"])
    print(f"calibrated Heston: v0={pd['v0']:.4f} kappa={pd['kappa']:.2f} "
          f"theta={pd['theta']:.4f} sigma={pd['sigma']:.3f} "
          f"rho={pd['rho']:.3f} (IV RMSE {fit['iv_rmse']:.4f})")

    # --- 2. price the structured book under the calibrated smile ---------
    import jax as _jax

    from optionslab_tpu.ops.heston_pallas import (
        pallas_heston_autocall_lr_greeks, pallas_heston_autocall_price,
        pallas_heston_exotic_price)

    sampler = "prng" if _jax.default_backend() == "tpu" else "hash"
    spot, rate = 100.0, 0.03
    p_ac, se_ac, _ = pallas_heston_autocall_price(
        spot, 1.0, rate, par, n_obs=4, n_paths=200_000, n_steps=64,
        sampler=sampler)
    print(f"autocall (calibrated Heston, Euler): {float(p_ac):.4f} "
          f"+- {float(se_ac):.4f}")
    p_qe, se_qe, _ = pallas_heston_autocall_price(
        spot, 1.0, rate, par, n_obs=4, n_paths=200_000, n_steps=16,
        scheme="qe", sampler=sampler)
    print(f"autocall (Andersen-QE, 16 coarse steps): {float(p_qe):.4f} "
          f"+- {float(se_qe):.4f}")

    # --- 3. the one-pass LR ladder: the desk's risk in one launch --------
    g = pallas_heston_autocall_lr_greeks(
        spot, 1.0, rate, par, n_obs=4, n_paths=200_000, n_steps=64,
        sampler=sampler)
    print("autocall ladder:",
          {k: round(float(v), 4) for k, v in g.items()
           if not isinstance(v, str)})
    print("  (", g["delta_convention"], ")")

    # --- 4. barrier reprice: smile-consistent vs flat-vol ----------------
    p_h, _, _ = pallas_heston_exotic_price(
        "barrier_down-and-in", spot, 100.0, 1.0, rate, par, cp=-1.0,
        barrier=80.0, n_paths=200_000, n_steps=64, sampler=sampler)
    from optionslab_tpu.models import heston_expected_variance
    from optionslab_tpu.ops.exotic_pallas import pallas_exotic_price

    # flat comparator at MATCHED total variance — the gap below is pure
    # skew/smile, not a vol-level artifact
    flat_vol = float(np.sqrt(float(heston_expected_variance(par, 1.0))))
    p_g, _, _ = pallas_exotic_price(
        "barrier_down-and-in", spot, 100.0, 1.0, rate, flat_vol, -1.0,
        barrier=80.0, n_paths=200_000, n_steps=64, sampler=sampler)
    print(f"down-and-in put: calibrated-Heston {float(p_h):.4f} vs "
          f"flat-vol GBM {float(p_g):.4f} at the same total variance "
          f"({flat_vol:.3f}) — the calibrated dynamics reshape the "
          f"knock-in tail (here the rising v0<theta term structure "
          f"defers variance past the barrier window, outweighing the "
          f"skew's tail loading)")


if __name__ == "__main__":
    main()
