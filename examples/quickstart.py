"""Quickstart: pricing, Greeks, implied vol, and the fused kernels.

Run: python examples/quickstart.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo checkout; `pip install -e .` makes this a no-op

import jax
import jax.numpy as jnp

import optionslab_tpu as ol


def main():
    print("devices:", jax.devices())

    # --- closed form ---
    price = ol.bs_price(100.0, 100.0, 1.0, 0.05, 0.2)
    greeks = ol.bs_greeks(100.0, 100.0, 1.0, 0.05, 0.2)
    print(f"BS call {float(price):.4f}  delta {float(greeks['delta']):.4f}")

    # --- a whole book in one launch ---
    book = ol.ContractBatch.make(
        spot=jnp.linspace(80.0, 120.0, 1000), strike=100.0, maturity=1.0,
        rate=0.05, vol=0.2, option_type="call")
    prices = ol.mc_price(book, jax.random.PRNGKey(0), ol.MCConfig(n_paths=100_000))
    print("book prices:", prices[:3], "...", prices[-1])

    # --- fused Pallas kernel: price + stderr + full Greek ladder ---
    from optionslab_tpu.ops.gbm_pallas import pallas_mc_price_greeks

    out = pallas_mc_price_greeks(book, n_paths=1_000_000, seed=0)
    print(f"kernel: price[500] {float(out['price'][500]):.4f} "
          f"gamma[500] {float(out['gamma'][500]):.5f}")
    # QMC variant: ~100x lower error per path for single contracts
    single = ol.ContractBatch.make(100.0, 100.0, 1.0, 0.05, 0.2, "call")
    qmc = pallas_mc_price_greeks(single, n_paths=1_000_000, sampler="sobol")
    print(f"QMC price {float(qmc['price']):.6f} (exact 10.450584)")

    # --- implied vol round trip ---
    iv = ol.implied_volatility(float(price), 100.0, 100.0, 1.0, 0.05)
    print(f"implied vol {float(iv):.4f}")

    # --- American via lattice and LSM ---
    tree = ol.BinomialTree(n_steps=512, american=True)
    print(f"american put (lattice) {float(tree.price(100, 100, 1, 0.05, 0.2, 'put')):.4f}")
    lsm = ol.models.AmericanOptionLSM(100, 100, 1, 0.05, 0.2, n_paths=100_000)
    print(f"american put (LSM)     {float(lsm.price()):.4f}")


if __name__ == "__main__":
    main()
