"""Chain -> Dupire surface + Heston fit -> SLV exotics across mixing.

The stochastic-local-vol workflow an exotics desk runs: calibrate BOTH a
local-vol surface (reprices every vanilla) and a Heston model (right
forward-smile dynamics) to the same chain, combine them with a
particle-calibrated leverage, then mark the forward-smile book across
the vol-of-vol ``mixing`` — vanillas stay pinned to the market smile at
EVERY mixing (Gyongy), while cliquet-like and barrier products move.
That spread IS the model risk a desk charges for.

Run:  PYTHONPATH=. python examples/slv_workflow.py
(CPU-safe: the kernel path uses the counter-based hash sampler off-TPU.)
"""

import jax

jax.config.update("jax_platforms", "cpu") if jax.default_backend() not in (
    "tpu",) else None


def main():
    # --- 1. one chain, two calibrations -----------------------------------
    from optionslab_tpu.data import load_option_data
    from optionslab_tpu.models import HestonParams
    from optionslab_tpu.surface.chain_calibration import (
        calibrate_model_to_chain, local_vol_from_chain)

    chain = load_option_data("synthetic", n_rows=400, seed=3)
    dupire, cal = local_vol_from_chain(chain, n_steps=300)
    fit = calibrate_model_to_chain(chain, "heston", n_steps=300)
    pd = fit["params"]
    par = HestonParams.make(pd["v0"], pd["kappa"], pd["theta"],
                            pd["sigma"], pd["rho"])
    print(f"Dupire surface: spot={dupire.spot:.2f} rate={dupire.rate:.4f}")
    print(f"Heston fit: v0={pd['v0']:.4f} kappa={pd['kappa']:.2f} "
          f"theta={pd['theta']:.4f} sigma={pd['sigma']:.3f} "
          f"rho={pd['rho']:.3f} (IV RMSE {fit['iv_rmse']:.4f})")

    # --- 2. vanillas are mixing-invariant; exotics move -------------------
    from optionslab_tpu.models import SLVModel

    key = jax.random.PRNGKey(0)
    spot = dupire.spot
    strike, maturity = round(spot), 1.0
    barrier = round(1.22 * spot)
    print(f"\n{'mixing':>7} {'european':>9} {'UO barrier':>10} "
          f"{'lookback':>9}  (K={strike}, B={barrier}, T={maturity})")
    for mixing in (0.0, 0.5, 1.0):
        slv = SLVModel(dupire, par, mixing=mixing)
        row = []
        for kind in ("european", "barrier_up-and-out", "lookback_float"):
            p = slv.price(kind, strike, maturity, key, barrier=barrier,
                          n_paths=65_536, n_steps=32)
            row.append(float(p))
        print(f"{mixing:>7.1f} {row[0]:>9.4f} {row[1]:>10.4f} {row[2]:>9.4f}")
    print("^ the european column is (statistically) constant — Gyongy; "
          "the barrier column is the knob the desk marks")

    # --- 3. the same model at kernel speed, with the LR ladder ------------
    from optionslab_tpu.ops.slv_pallas import SLVKernelPricer

    sampler = "prng" if jax.default_backend() == "tpu" else "hash"
    pricer = SLVKernelPricer(dupire, par, maturity, mixing=0.8, n_steps=32)
    print(f"\nkernel replay (mixing=0.8, leverage poly fit residual "
          f"{pricer.fit_residual:.4f}):")
    out = pricer.greeks("barrier_up-and-out", strike, barrier=barrier,
                        n_paths=1_000_000, sampler=sampler)
    print("  UO barrier ladder: "
          + "  ".join(f"{k}={out[k]:.4f}" for k in
                      ("price", "delta", "gamma", "vega_v0", "rho")))
    print(f"  conventions: {out['delta_convention']}; "
          f"{out['vega_convention']}")


if __name__ == "__main__":
    main()
