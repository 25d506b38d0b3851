"""Vol-surface workflow: load a chain, fit models, enforce no-arbitrage,
benchmark, export.

Run: python examples/surface_workflow.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo checkout; `pip install -e .` makes this a no-op

import numpy as np

from optionslab_tpu.benchmarks import VolSurfaceBenchmark
from optionslab_tpu.data import OptionChainLoader, generate_synthetic_smile
from optionslab_tpu.surface import (
    PINNVolatilityModel,
    SVIModel,
    calibrate_svi_surface,
    engineer_features,
    surface_arbitrage_report,
)


def main():
    # 1) load + prepare a chain (synthetic here; from_csv/from_parquet for real)
    chain = OptionChainLoader.from_synthetic(n_rows=400, seed=7)
    df = chain.with_log_moneyness().to_model_input()

    # 2) arbitrage-constrained PINN
    pinn = PINNVolatilityModel(epochs=600, preset="medium")
    metrics = pinn.train(df)
    audit = pinn.check_arbitrage()
    print("PINN:", {k: round(v, 4) for k, v in metrics.items()}, audit)

    # 3) parametric SVI on one smile + full-surface slice calibration
    k, vols = generate_synthetic_smile(noise=0.002)
    svi = SVIModel()
    loss = svi.calibrate(k, vols, maturity=0.5)
    print(f"SVI slice loss {loss:.2e}, butterfly-free={svi.is_butterfly_free()}")

    # 4) model bake-off
    bench = VolSurfaceBenchmark(models=["svi", "kernel_ridge"]).run(
        k, vols, maturity=0.5, n_trials=2)
    print(bench.to_dataframe().to_string(index=False))
    print("best:", bench.best_model())

    # 5) export the PINN for serving (StableHLO artifact + parity check)
    from optionslab_tpu.optimize import InferenceEngine, export_surface_model

    res = export_surface_model(pinn, "/tmp/pinn_surface.hlo")
    engine = InferenceEngine("/tmp/pinn_surface.hlo")
    x = np.asarray([[0.0, 0.5]], np.float32)  # (log-moneyness, ttm)
    print("served IV:", float(np.sqrt(max(float(engine.predict(x)[0, 0]), 0) / 0.5)))


if __name__ == "__main__":
    main()
