"""Tree-Greeks entry point matching the reference's ``compute_greeks``.

Reference capability (SURVEY.md §2.3, ``src/greeks/greeks.py:35-154``):
price/Δ/Γ analytic from one lattice solve; vega/theta/rho/vanna/charm/vomma
via finite-difference re-pricing (7 extra tree solves).

TPU-native: the lattice Greeks come from ``models.binomial.binomial_greeks``
(one solve: node captures + AD), and the second-order cross Greeks come
from the unified AD engine differentiating through the scan — zero FD
re-pricing.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.binomial import binomial_greeks, binomial_price
from ..types import ContractBatch
from ..utils.validation import check_option_type
from .unified import greeks_from_fn


def compute_greeks(S, K, T, r, sigma, option_type="call", q=0.0,
                   american: bool = False, n_steps: int = 512,
                   second_order: bool = False) -> dict:
    """Full Greek ladder from the CRR lattice.

    ``second_order=True`` adds vanna/charm/vomma via AD through the lattice
    (replaces the reference's 4-point cross FD at ``unified_greeks.py:339``).
    """
    cp = float(check_option_type(option_type))
    batch = ContractBatch.make(S, K, T, r, sigma, option_type, q)
    out = dict(binomial_greeks(batch, american=american, n_steps=n_steps))
    if second_order:
        def price_fn(s, k, t, r_, sig, q_):
            b = ContractBatch(
                jnp.asarray(s), jnp.asarray(k), jnp.asarray(t), jnp.asarray(r_),
                jnp.asarray(sig), jnp.asarray(q_),
                jnp.broadcast_to(jnp.asarray(cp, jnp.result_type(s)), jnp.shape(s)),
            )
            return binomial_price(b, american=american, n_steps=n_steps)

        ad = greeks_from_fn(price_fn, batch.spot, batch.strike, batch.maturity,
                            batch.rate, batch.vol, batch.dividend, second_order=True)
        for k_ in ("vanna", "charm", "vomma"):
            out[k_] = ad[k_]
    return out
