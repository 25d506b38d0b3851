from .math import (
    d1_d2,
    norm_cdf,
    norm_pdf,
    norm_ppf,
    safe_div,
    safe_sqrt,
    smooth_indicator,
    smooth_max,
)
from .optim import scan_adam
from .rng import (
    MAX_SOBOL_DIM,
    antithetic_normals,
    halton_sequence,
    qmc_normals,
    sobol_sequence,
)
from .tridiag import tridiag_solve

# Pallas kernels are imported lazily by their users (they pull in
# jax.experimental.pallas); reach them via:
#   from optionslab_tpu.ops.gbm_pallas import pallas_mc_price_greeks
#   from optionslab_tpu.ops.exotic_pallas import pallas_exotic_price

__all__ = [
    "norm_cdf", "norm_pdf", "norm_ppf", "d1_d2", "safe_div", "safe_sqrt",
    "smooth_max", "smooth_indicator",
    "scan_adam",
    "sobol_sequence", "halton_sequence", "qmc_normals", "antithetic_normals",
    "MAX_SOBOL_DIM",
    "tridiag_solve",
]
