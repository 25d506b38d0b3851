"""optionslab_tpu — a TPU-native derivatives analytics framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
Diegotistical/OptionsLab: option pricing (Black–Scholes, binomial, Monte
Carlo, Heston, SABR, jump diffusion, FDM, Dupire local vol), AD-first
Greeks, implied vol, exotics, volatility surfaces with no-arbitrage
constraints, risk (VaR/ES/stress/portfolio), backtesting, hyperparameter
search, StableHLO deployment, and a benchmark harness — all built for TPU:
one batched contract pytree, fused XLA launches, Pallas kernels for the hot
paths, and ``shard_map`` scaling over device meshes.

Subpackages
-----------
``models``     pricers + validation (L1/L2 of the reference layer map)
``greeks``     unified AD-first Greeks engine (L3)
``surface``    volatility-surface models + arbitrage tooling (L4a)
``risk``       VaR/ES/stress/sensitivity/portfolio (L4b)
``backtest``   delta-hedge backtesting (L4c)
``optimize``   hyperparameter search, reproducibility, export (L5a)
``data``       chain loaders, synthetic generators, market data (L5b)
``benchmarks`` vol-surface benchmark harness + EPP (L5c)
``parallel``   device-mesh sharding for multi-chip runs
``ops``        Pallas kernels and numerical primitives
"""

from . import (
    backtest,
    benchmarks,
    data,
    greeks,
    models,
    ops,
    optimize,
    parallel,
    risk,
    surface,
    utils,
)
from .models import (
    BinomialTree,
    BlackScholesPricer,
    CrankNicolsonSolver,
    DupireLocalVol,
    HestonPricer,
    KouJumpDiffusion,
    MCConfig,
    MCMethod,
    MCResult,
    MertonJumpDiffusion,
    MonteCarloMLSurrogate,
    MonteCarloPricer,
    SABRModel,
    bs_greeks,
    bs_greeks_ad,
    bs_price,
    bs_vega,
    implied_volatility,
    mc_greeks,
    mc_price,
    mc_price_control_variate,
    mc_price_result,
)
from .types import ContractBatch
from .utils import setup_logging

__version__ = "0.1.0"

__all__ = [
    "ContractBatch",
    "setup_logging",
    # submodules
    "models", "greeks", "surface", "risk", "backtest", "optimize", "data",
    "benchmarks", "parallel", "ops", "utils",
    # headline API
    "bs_price", "bs_vega", "bs_greeks", "bs_greeks_ad", "BlackScholesPricer",
    "MCConfig", "MCMethod", "MCResult", "MonteCarloPricer", "mc_price",
    "mc_price_result", "mc_price_control_variate", "mc_greeks",
    "BinomialTree", "CrankNicolsonSolver", "HestonPricer", "SABRModel",
    "MertonJumpDiffusion", "KouJumpDiffusion", "DupireLocalVol",
    "MonteCarloMLSurrogate", "implied_volatility",
]
