from .tree import compute_greeks
from .unified import (
    PricerProtocol,
    bs_price_fn,
    compute_greeks_unified,
    fdm_price_fn,
    greeks_batch,
    greeks_fd,
    greeks_fdm,
    greeks_from_fn,
    greeks_heston,
    greeks_sabr,
    heston_price_fn,
    bates_price_fn,
    merton_price_fn,
    sabr_price_fn,
)

__all__ = [
    "compute_greeks",
    "PricerProtocol",
    "greeks_from_fn",
    "greeks_batch",
    "greeks_fd",
    "compute_greeks_unified",
    "bs_price_fn",
    "heston_price_fn",
    "sabr_price_fn",
    "fdm_price_fn",
    "merton_price_fn", "bates_price_fn",
    "greeks_heston",
    "greeks_sabr",
    "greeks_fdm",
]
