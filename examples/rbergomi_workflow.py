"""Rough volatility end-to-end: calibrate (H, eta, rho, xi0) to a chain,
price exotics on the exact Volterra law, certify an American bracket.

Rough Bergomi is the model whose short-expiry ATM skew follows the
market's tau^(H-1/2) power law. The workflow:

1. calibrate ALL FOUR parameters — including the Hurst exponent, which
   is usually frozen because it reshapes the Volterra covariance; here
   the covariance quadrature lives INSIDE the differentiated graph, so
   dLoss/dH flows through the Cholesky into the MC smile;
2. price path-dependent exotics on the exact (no hybrid-scheme bias)
   Volterra paths;
3. certify an American put bracket on the NON-MARKOVIAN law via the
   causal Cholesky factorization (exact conditional Gaussians — no
   nested replay, no Markov approximation).

Run:  PYTHONPATH=. python examples/rbergomi_workflow.py
(CPU-safe; sizes are kept small — scale n_paths up on a TPU.)
"""

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu") if jax.default_backend() not in (
    "tpu",) else None


def main():
    from optionslab_tpu.models import (RBergomiParams, calibrate_rbergomi,
                                       rbergomi_american_bracket,
                                       rbergomi_chain_price,
                                       rbergomi_exotic_price)

    # --- 1. synthetic market chain from a known rough model ---------------
    true = RBergomiParams(hurst=0.10, eta=1.9, rho=-0.8, xi0=0.04)
    strikes = np.array([95.0, 100.0, 105.0, 95.0, 100.0, 105.0], np.float32)
    mats = np.array([0.15, 0.15, 0.15, 0.5, 0.5, 0.5], np.float32)
    cps = np.where(strikes < 100.0, -1.0, 1.0).astype(np.float32)
    market = np.asarray(rbergomi_chain_price(
        strikes, mats, cps, 100.0, 0.01, true, jax.random.PRNGKey(7),
        n_paths=32_768, max_dt=0.05))
    print("market chain:", np.round(market, 3))

    # --- 2. full 4-parameter calibration (H is a live input) --------------
    fit, loss = calibrate_rbergomi(
        market, strikes, mats, cps, 100.0, 0.01,
        init=RBergomiParams(hurst=0.25, eta=1.2, rho=-0.4, xi0=0.03),
        n_steps=150, n_paths=16_384, max_dt=0.05)
    print(f"calibrated: H={fit.hurst:.3f} eta={fit.eta:.2f} "
          f"rho={fit.rho:.2f} xi0={fit.xi0:.4f}  (loss {loss:.2e}; "
          f"true H={true.hurst})")

    # --- 3. exotics on the exact Volterra law ------------------------------
    asian, se = rbergomi_exotic_price(
        "asian_arith", 100.0, 100.0, 0.5, 0.01, fit,
        jax.random.PRNGKey(1), n_paths=32_768, n_steps=32,
        return_stderr=True)
    print(f"asian under rough vol: {float(asian):.4f} ± {float(se):.4f}")

    # --- 4. certified American bracket on the non-Markovian law -----------
    br = rbergomi_american_bracket(100.0, 105.0, 0.5, 0.04, fit,
                                   n_dates=12, n_sub=1, n_fit=16_384,
                                   n_lower=32_768, n_outer=256,
                                   n_inner=256)
    print(f"American put bracket: [{br['lower']:.4f}, {br['upper']:.4f}] "
          f"width {br['width']:.4f} (+{br['pad']:.4f} continuous pad)")


if __name__ == "__main__":
    main()
