"""Contract-book façade: one kernel launch quotes a same-kind book.

Reference capability: ``MonteCarloPricerUni.price_batch``
(``src/pricing_models/monte_carlo_unified.py:562``) — there a Python loop
prices contracts one by one; here N contracts (mixed strikes / barriers /
bands) interleave the row axis of ONE fused Pallas launch, under GBM
(``model="bs"``) or Heston/Bates (``model="heston"|"bates"``) dynamics.
Over the TPU tunnel each dispatch costs ~0.5–3 s, so a book launch is the
difference between interactive and not. This module is the ONE façade →
kernel mapping shared by the CLI ``book`` subcommand and the HTTP
``/book/exotic`` route (same discipline as ``risk.amc_dynamics_kwargs``).
"""

from __future__ import annotations

from ..utils.exceptions import ValidationError

FACADE_BOOK_KINDS = ("asian", "lookback", "barrier", "one-touch",
                     "no-touch", "double-barrier", "double-touch")


def facade_kernel_kind(kind: str, *, barrier_type: str = "up-and-out",
                       averaging: str = "arithmetic", floating: bool = True,
                       knock: str = "out", touch: str = "no",
                       direction: str = "up") -> str:
    """Map the façade kind names (CLI/HTTP vocabulary) to kernel payoff
    kinds — same vocabulary as ``ops.exotic_pallas.exotic_kernel_ladder``."""
    if kind == "asian":
        return "asian_arith" if averaging.startswith("arith") else "asian_geo"
    if kind == "lookback":
        return "lookback_float" if floating else "lookback_fixed"
    if kind == "barrier":
        if barrier_type not in ("up-and-out", "up-and-in", "down-and-out",
                                "down-and-in"):
            raise ValidationError(f"unknown barrier_type {barrier_type!r}")
        return f"barrier_{barrier_type}"
    if kind in ("one-touch", "no-touch"):
        if direction not in ("up", "down"):
            raise ValidationError("touch direction must be up|down")
        return f"{'one' if kind.startswith('one') else 'no'}_touch_{direction}"
    if kind in ("double-barrier", "double_barrier"):
        return f"barrier_double-{'in' if knock == 'in' else 'out'}"
    if kind in ("double-touch", "double_touch"):
        return "one_touch_double" if touch == "one" else "no_touch_double"
    raise ValidationError(
        f"book kinds are {FACADE_BOOK_KINDS}: got {kind!r}")


def exotic_book_quote(kind: str, spot, strikes, maturity, rate,
                      vol: float = 0.2, model: str = "bs", params=None,
                      cp: float = 1.0, dividend: float = 0.0,
                      barriers=None, lowers=None, uppers=None,
                      greeks: bool = False, n_paths: int = 200_000,
                      n_steps: int = 64, seed: int = 0,
                      sampler: str | None = None, scheme: str = "euler",
                      barrier_type: str = "up-and-out",
                      averaging: str = "arithmetic", floating: bool = True,
                      knock: str = "out", touch: str = "no",
                      direction: str = "up") -> dict:
    """Quote a same-kind contract book in ONE kernel launch.

    ``model="bs"`` runs the GBM exotic kernel at ``vol``; ``model=
    "heston"|"bates"`` runs the stochastic-vol exotic kernel with
    ``params`` (a ``HestonParams``/``BatesParams``). ``greeks=True``
    returns the per-contract LR Greek ladder instead of price-only
    (Euler scheme under Heston). ``n_paths`` is PER CONTRACT. Every
    returned metric is a list with one entry per contract."""
    import jax

    if sampler is None:
        sampler = "prng" if jax.default_backend() == "tpu" else "hash"
    k = facade_kernel_kind(kind, barrier_type=barrier_type,
                           averaging=averaging, floating=floating,
                           knock=knock, touch=touch, direction=direction)
    kw = dict(cp=cp, dividend=dividend, barriers=barriers, lowers=lowers,
              uppers=uppers, n_paths=n_paths, n_steps=n_steps, seed=seed,
              sampler=sampler)
    if model == "bs":
        from ..ops.exotic_pallas import (pallas_exotic_book_lr_greeks,
                                         pallas_exotic_book_price)

        if greeks:
            out = dict(pallas_exotic_book_lr_greeks(
                k, spot, strikes, maturity, rate, vol, **kw))
        else:
            prices, ses, n = pallas_exotic_book_price(
                k, spot, strikes, maturity, rate, vol, **kw)
            out = {"price": prices, "std_error": ses, "paths": n}
    elif model in ("heston", "bates"):
        if params is None:
            raise ValidationError(f"model={model!r} needs params "
                                  "(HestonParams/BatesParams)")
        from ..ops.heston_pallas import (
            pallas_heston_exotic_book_lr_greeks,
            pallas_heston_exotic_book_price)

        if greeks:
            out = dict(pallas_heston_exotic_book_lr_greeks(
                k, spot, strikes, maturity, rate, params, **kw))
        else:
            prices, ses, n = pallas_heston_exotic_book_price(
                k, spot, strikes, maturity, rate, params, scheme=scheme,
                **kw)
            out = {"price": prices, "std_error": ses, "paths": n}
    else:
        raise ValidationError(
            f"book models are bs|heston|bates: got {model!r}")
    result = {"kind": k, "model": model, "n_contracts": len(strikes),
              "strikes": [float(s) for s in strikes],
              "greek_method": "likelihood-ratio" if greeks else None}
    for key, v in out.items():
        result[key] = (int(v) if key == "paths"
                       else [float(x) for x in v])
    return result
