"""Pricing-model façade — the counterpart of the reference's 40-symbol
``src/pricing_models/__init__.py:70-112`` public API."""

from .binomial import BinomialTree, binomial_greeks, binomial_price
from .black_scholes import (
    BlackScholesPricer,
    bs_greeks,
    bs_greeks_ad,
    bs_price,
    bs_vega,
)
from .american import (
    GridValue,
    LSMPolicy,
    ab_upper_bound,
    american_continuous_interval,
    american_grid_greeks,
    american_price_interval,
    dual_upper_bound,
    fit_lsm_policy,
    grid_value_surface,
    lsm_lower_bound,
)
from .exotics import (
    AmericanOptionLSM,
    range_accrual_closed_form,
    range_accrual_price,
    AsianOption,
    AutocallableNote,
    BarrierOption,
    CliquetOption,
    LookbackOption,
    american_lsm_price,
    asian_price,
    autocallable_price,
    barrier_price,
    cliquet_price,
    double_barrier_closed_form,
    double_barrier_price,
    double_no_touch_closed_form,
    double_touch_price,
    one_touch_closed_form,
    one_touch_price,
    barrier_rebate_price,
    exotic_greeks,
    geometric_asian_closed_form,
    lookback_price,
    lsm_exercise_boundary,
    price_american_lsm,
    price_asian_option,
    price_barrier_option,
    price_lookback_option,
)
from .fdm import (
    CrankNicolsonSolver,
    ExplicitFDMSolver,
    explicit_fdm_price,
    explicit_fdm_stable_steps,
    fdm_price,
)
from .multi_asset_american import (
    fit_max_call_lsm,
    max_call_bracket,
    max_call_lower,
    max_call_upper,
)
from .dividends import (
    dividend_parity_gap,
    fdm_price_discrete_dividends,
    mc_price_discrete_dividends,
)
from .rbergomi import (
    calibrate_rbergomi,
    rbergomi_chain_price,
    RBERGOMI_EXOTIC_KINDS,
    rbergomi_autocall_price,
    rbergomi_cliquet_price,
    rbergomi_exotic_greeks,
    rbergomi_exotic_price,
    RBergomiParams,
    rbergomi_greeks,
    rbergomi_price,
    rbergomi_smile_iv,
    xi_curve_from_variance_swaps,
)
from .rbergomi_american import rbergomi_american_bracket
from .levy import (
    NIGParams,
    VGParams,
    nig_mc_price,
    nig_price,
    vg_mc_price,
    vg_price,
)
from .forward_start import (
    forward_smile_iv,
    forward_start_mc_price,
    forward_start_price,
)
from .bates import (
    BatesParams,
    BatesPricer,
    bates_mc_price,
    bates_price,
    bates_price_cos,
    calibrate_bates,
)
from .var_swap import (
    bates_variance_swap_strike,
    heston_expected_variance,
    heston_integrated_variance_laplace,
    heston_variance_of_variance,
    heston_variance_swap_strike,
    heston_vol_swap_strike,
    heston_vol_swap_strike_brockhaus_long,
    variance_swap_strike_from_iv,
    variance_swap_strike_replication,
    vix_style_index,
)
from .heston_exotics import (
    HESTON_EXOTIC_KINDS,
    heston_autocall_price,
    heston_cliquet_price,
    heston_exotic_price,
    heston_range_accrual_price,
)
from .heston_fdm import heston_fdm_greeks, heston_fdm_price
from .slv import (
    SLV_KINDS,
    SLVModel,
    slv_autocall_price,
    slv_calibrate_leverage,
    slv_cliquet_price,
    slv_exotic_price,
    slv_range_accrual_price,
    slv_replay_price,
    slv_swap_strikes,
    slv_variance_swap,
)
from .local_vol_american import local_vol_american_bracket, lv_bermudan_slices
from .slv_american import fit_slv_lsm, slv_american_bracket
from .heston_american import (
    fit_heston_lsm,
    heston_ab_upper,
    heston_american_bracket,
    heston_lsm_lower,
)
from .heston import (
    HestonParams,
    HestonPricer,
    calibrate_heston,
    calibrate_heston_mc,
    heston_mc_price,
    heston_price,
    heston_price_cos,
    heston_simulate_paths,
)
from .iv import (
    implied_vol,
    implied_volatility,
    implied_volatility_vectorized,
    iv_surface_from_prices,
)
from .jump_diffusion import (
    KouJumpDiffusion,
    MertonJumpDiffusion,
    kou_mc_price,
    merton_mc_price,
    merton_price,
)
from .local_vol import (DupireLocalVol, LocalVolSurface,
                        local_vol_autocall_price, local_vol_cliquet_price,
                        local_vol_mc_price, local_vol_swap_strikes,
                        local_vol_variance_swap,
                        local_vol_vol_swap_strike, sample_smile_iv_fn)
from .qmc_exotics import (
    brownian_bridge_paths,
    qmc_asian_price,
    qmc_barrier_price,
    qmc_lookback_price,
)
from .monte_carlo import (
    MCConfig,
    MCMethod,
    MCResult,
    MonteCarloPricer,
    draw_normals,
    gbm_paths,
    gbm_terminal,
    mc_greeks,
    mc_greeks_smoothed,
    mc_price,
    mc_price_control_variate,
    mc_price_result,
)
from .sabr import SABRModel, SABRParams, calibrate_sabr, sabr_implied_vol, sabr_price
from .multi_asset import (
    basket_asian_price,
    basket_price,
    geometric_basket_closed_form,
    kirk_spread_approx,
    margrabe_price,
    multi_asset_greeks,
    multi_asset_terminal,
    rainbow_price,
    spread_price,
)
from .surrogate import (WIDE_PARAM_RANGES, MonteCarloMLSurrogate,
                        generate_training_data)
# Reference-name aliases: OptionsLab users should find the symbols they know
# (src/pricing_models/__init__.py exports these names).
from .black_scholes import bs_price as black_scholes  # noqa: F401
from .monte_carlo import MonteCarloPricer as MonteCarloPricerUni  # noqa: F401
from .validation import (
    check_greeks_consistency,
    check_price_bounds,
    check_put_call_parity,
    check_smile_butterfly,
    mc_convergence_study,
    validate_pricer,
)

__all__ = [
    "LSMPolicy", "fit_lsm_policy", "lsm_lower_bound", "ab_upper_bound",
    "dual_upper_bound", "american_price_interval",
    "GridValue", "grid_value_surface", "american_continuous_interval",
    "american_grid_greeks",
    "basket_price", "basket_asian_price", "rainbow_price", "spread_price",
    "margrabe_price", "geometric_basket_closed_form", "kirk_spread_approx",
    "multi_asset_greeks", "multi_asset_terminal",
    # Black-Scholes
    "bs_price", "bs_vega", "bs_greeks", "bs_greeks_ad", "BlackScholesPricer",
    # Monte Carlo
    "MCConfig", "MCMethod", "MCResult", "MonteCarloPricer", "mc_price",
    "mc_price_result", "mc_price_control_variate", "mc_greeks",
    "mc_greeks_smoothed", "draw_normals", "gbm_terminal", "gbm_paths",
    # lattice / PDE
    "BinomialTree", "binomial_price", "binomial_greeks",
    "CrankNicolsonSolver", "ExplicitFDMSolver", "fdm_price",
    "explicit_fdm_price", "explicit_fdm_stable_steps",
    # IV
    "implied_vol", "implied_volatility", "implied_volatility_vectorized",
    "iv_surface_from_prices",
    # stochastic / jump models
    "HestonPricer", "HestonParams", "heston_price", "heston_price_cos", "heston_mc_price",
    "heston_simulate_paths", "calibrate_heston", "calibrate_heston_mc",
    "heston_fdm_price", "heston_fdm_greeks", "heston_american_bracket", "fit_heston_lsm",
    "local_vol_american_bracket", "lv_bermudan_slices",
    "slv_american_bracket", "fit_slv_lsm",
    "heston_lsm_lower", "heston_ab_upper",
    "HESTON_EXOTIC_KINDS", "heston_exotic_price", "heston_cliquet_price",
    "heston_autocall_price", "heston_range_accrual_price",
    "SLV_KINDS", "SLVModel", "slv_exotic_price", "slv_calibrate_leverage",
    "slv_replay_price", "slv_cliquet_price", "slv_autocall_price",
    "slv_variance_swap", "slv_swap_strikes", "slv_range_accrual_price",
    "range_accrual_price", "range_accrual_closed_form",
    "double_barrier_price", "double_barrier_closed_form",
    "double_touch_price", "double_no_touch_closed_form",
    "one_touch_closed_form", "one_touch_price", "barrier_rebate_price",
    "BatesParams", "BatesPricer", "bates_price", "bates_price_cos",
    "bates_mc_price", "calibrate_bates",
    "forward_start_price", "forward_start_mc_price", "forward_smile_iv",
    "VGParams", "NIGParams", "vg_price", "nig_price", "vg_mc_price",
    "nig_mc_price",
    "RBergomiParams", "rbergomi_price", "rbergomi_greeks", "rbergomi_smile_iv",
    "rbergomi_chain_price", "calibrate_rbergomi",
    "RBERGOMI_EXOTIC_KINDS", "rbergomi_exotic_price",
    "rbergomi_exotic_greeks", "rbergomi_cliquet_price",
    "rbergomi_autocall_price", "rbergomi_american_bracket",
    "xi_curve_from_variance_swaps",
    "fdm_price_discrete_dividends", "mc_price_discrete_dividends",
    "dividend_parity_gap",
    "max_call_bracket", "max_call_lower", "max_call_upper",
    "fit_max_call_lsm",
    "variance_swap_strike_replication", "variance_swap_strike_from_iv",
    "vix_style_index", "heston_integrated_variance_laplace",
    "heston_expected_variance", "heston_variance_of_variance",
    "heston_variance_swap_strike", "heston_vol_swap_strike",
    "heston_vol_swap_strike_brockhaus_long", "bates_variance_swap_strike",
    "SABRModel", "SABRParams", "sabr_implied_vol", "sabr_price", "calibrate_sabr",
    "MertonJumpDiffusion", "KouJumpDiffusion", "merton_price",
    "merton_mc_price", "kou_mc_price",
    # local vol
    "DupireLocalVol", "LocalVolSurface", "local_vol_mc_price",
    "local_vol_swap_strikes",
    "local_vol_variance_swap", "local_vol_vol_swap_strike",
    "local_vol_cliquet_price", "local_vol_autocall_price",
    "sample_smile_iv_fn",
    # exotics
    "AsianOption", "BarrierOption", "LookbackOption", "AmericanOptionLSM",
    "AutocallableNote", "CliquetOption", "asian_price", "barrier_price",
    "lookback_price", "american_lsm_price", "autocallable_price",
    "cliquet_price", "exotic_greeks", "geometric_asian_closed_form", "lsm_exercise_boundary",
    "price_asian_option", "price_barrier_option", "price_american_lsm",
    "price_lookback_option",
    # QMC exotics (Brownian-bridge Sobol)
    "qmc_asian_price", "qmc_barrier_price", "qmc_lookback_price",
    "brownian_bridge_paths",
    # surrogate
    "MonteCarloMLSurrogate", "generate_training_data",
    # reference-name aliases
    "black_scholes", "MonteCarloPricerUni",
    # validation
    "check_put_call_parity", "check_price_bounds", "check_greeks_consistency",
    "check_smile_butterfly", "mc_convergence_study", "validate_pricer",
]
