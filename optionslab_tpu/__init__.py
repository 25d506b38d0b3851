"""optionslab_tpu — a TPU-native derivatives analytics framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
Diegotistical/OptionsLab: option pricing (Black–Scholes, binomial, Monte
Carlo, Heston, SABR, jump diffusion, FDM, local vol), AD-first Greeks,
implied vol, exotics, volatility surfaces with no-arbitrage constraints,
risk (VaR/ES/stress/portfolio), backtesting, and deployment tooling —
all built for TPU: one batched contract pytree, fused XLA launches, Pallas
kernels for the hot paths, and `shard_map` scaling over device meshes.
"""

from .types import ContractBatch
from .utils import setup_logging
from .models.black_scholes import (
    BlackScholesPricer,
    bs_greeks,
    bs_greeks_ad,
    bs_price,
    bs_vega,
)
from .models.monte_carlo import (
    MCConfig,
    MCMethod,
    MCResult,
    MonteCarloPricer,
    mc_greeks,
    mc_price,
    mc_price_control_variate,
    mc_price_result,
)

__version__ = "0.1.0"

__all__ = [
    "ContractBatch",
    "setup_logging",
    "bs_price",
    "bs_vega",
    "bs_greeks",
    "bs_greeks_ad",
    "BlackScholesPricer",
    "MCConfig",
    "MCMethod",
    "MCResult",
    "MonteCarloPricer",
    "mc_price",
    "mc_price_result",
    "mc_price_control_variate",
    "mc_greeks",
]
