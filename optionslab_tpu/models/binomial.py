"""CRR binomial lattice — `lax.scan` backward induction, vmapped over books.

Reference capabilities covered (SURVEY.md §2.2 / §3.3):
  - ``src/pricing_models/binomial_tree.py:51-144`` — Numba backward
    induction, European + American, probability clamped to [0,1], price +
    delta + gamma extracted from the step-1/step-2 lattice nodes in one
    solve.
  - ``src/greeks/greeks.py:35-154`` — vega/theta/rho/vanna/charm/vomma via
    finite-difference re-pricing around the tree.

TPU-first design: the O(N²) induction is a ``lax.scan`` over a fixed-width
value vector (no dynamic shapes — node validity is positional), so one
compile serves every contract; the contract axis is ``vmap``ed, putting the
whole book's lattices on the VPU at once. First-order Greeks come from the
lattice nodes (delta/gamma/theta, as in the reference) AND from ``jax.grad``
through the scan (vega/rho and cross-Greeks) — no finite-difference
re-pricing anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..types import ContractBatch
from ..utils.config import EPS_TIME
from ..utils.exceptions import ValidationError


def _peizer_pratt(z, n):
    """Peizer–Pratt method-2 inversion used by the Leisen–Reimer tree.

    ``-expm1(-u)`` instead of ``1 - exp(-u)``: u ≈ z²/n is tiny, and the
    naive form cancels catastrophically in f32 (3e-2 price error on TPU
    where exp is a couple of ulp worse than CPU's)."""
    denom = n + 1.0 / 3.0 + 0.1 / (n + 1.0)
    u = ((z / denom) ** 2) * (n + 1.0 / 6.0)
    # explicit series for small u (TPU lowers expm1 as exp-1, which cancels)
    series = u * (1.0 - 0.5 * u + u * u / 6.0)
    inner = jnp.where(u < 1e-2, series, -jnp.expm1(-u))
    return 0.5 + jnp.sign(z) * 0.5 * jnp.sqrt(jnp.maximum(inner, 0.0))


def _exp_small(x):
    """exp(x) with a Taylor branch for |x| < 0.03.

    The per-step lattice factors exp(r·dt), exp(±σ√dt) have arguments of
    order 1e-2–1e-4; the TPU's fast exp carries ~1e-5 ABSOLUTE error there,
    which compounds n-fold through the induction (measured 2.5e-2 price
    error at 101 steps). The 5-term series is exact to <1e-9 relative in
    the branch and uses only correctly-rounded multiplies/adds.
    """
    series = 1.0 + x * (1.0 + x * (0.5 + x * (1.0 / 6.0 + x / 24.0)))
    return jnp.where(jnp.abs(x) < 0.03, series, jnp.exp(x))


def _crr_solve(spot, strike, maturity, rate, vol, dividend, cp, american: bool,
               n_steps: int, method: str = "crr"):
    """One contract's lattice. Returns (price, node captures for greeks).

    Fixed-width vectors of length n_steps+1; index j holds the node with j
    up-moves. The scan runs from step n_steps-1 down to step 0; the value
    vectors at steps 2, 1, 0 are captured for lattice greeks.

    ``method="leisen-reimer"`` uses the Peizer–Pratt lattice (odd n_steps):
    O(1/N²) convergence vs CRR's oscillating O(1/N) — ~100 steps of LR beat
    thousands of CRR steps for Europeans and Americans alike.
    """
    dtype = jnp.result_type(spot, strike, vol)
    t = jnp.maximum(maturity, EPS_TIME)
    dt = t / n_steps
    sqrt_dt = jnp.sqrt(dt)
    disc = _exp_small(-rate * dt)
    growth = _exp_small((rate - dividend) * dt)
    if method == "leisen-reimer":
        sig_sqrt_t = jnp.maximum(vol, 1e-8) * jnp.sqrt(t)
        d1 = (jnp.log(spot / strike) + (rate - dividend + 0.5 * vol * vol) * t) / sig_sqrt_t
        d2 = d1 - sig_sqrt_t
        n_f = jnp.asarray(float(n_steps), dtype)
        p = jnp.clip(_peizer_pratt(d2, n_f), 1e-9, 1.0 - 1e-9)
        p_star = jnp.clip(_peizer_pratt(d1, n_f), 1e-9, 1.0 - 1e-9)
        u = growth * p_star / p
        d = (growth - p * u) / (1.0 - p)
    else:
        u_log = vol * sqrt_dt
        u = _exp_small(u_log)
        d = _exp_small(-u_log)
        # risk-neutral up-probability, clamped (reference: binomial_tree.py:77-81)
        p = (growth - d) / jnp.maximum(u - d, 1e-12)
        p = jnp.clip(p, 0.0, 1.0)
    lu = jnp.log(u)
    ld = jnp.log(jnp.maximum(d, 1e-12))

    # Node spots by EXACT cumulative products, never exp(j·log u): on TPU
    # the transcendentals carry ~1e-5 relative error which exp(j·lu)
    # amplifies j-fold (measured 2.5e-2 price error at 101 steps); cumprod
    # multiplications are correctly rounded, growing only ~√n ulp.
    ratio = u / jnp.maximum(d, 1e-12)
    ratio_vec = jnp.concatenate([jnp.ones((1,), dtype),
                                 jnp.full((n_steps,), ratio, dtype)])
    up_over_down = jnp.cumprod(ratio_vec)  # (u/d)^j, exact mults
    d_pows = jnp.cumprod(jnp.full((n_steps,), d, dtype))  # d^(i+1)
    s_terminal = spot * d_pows[-1] * up_over_down  # S0·d^n·(u/d)^j

    v = jnp.maximum(cp * (s_terminal - strike), 0.0)
    inv_d = 1.0 / jnp.maximum(d, 1e-12)

    def step_back(carry, _):
        v, s_row = carry
        # spots one step earlier: remove one down-move from every node
        s_row = s_row * inv_d
        cont = disc * (p * jnp.roll(v, -1) + (1.0 - p) * v)
        if american:
            cont = jnp.maximum(cont, jnp.maximum(cp * (s_row - strike), 0.0))
        return (cont, s_row), None

    # scan down to step 2, then two explicit steps capturing nodes
    carry = (v, s_terminal)
    if n_steps > 2:
        carry, _ = lax.scan(step_back, carry, None, length=n_steps - 2)
    v2 = carry[0]  # values at step 2 (nodes 0..2) — or terminal if n_steps <= 2
    if n_steps >= 2:
        carry, _ = step_back(carry, None)
    v1 = carry[0]  # step 1 (nodes 0..1)
    if n_steps >= 1:
        carry, _ = step_back(carry, None)
    price = carry[0][0]
    return price, (v1, v2, (lu, ld), dt)


def _lattice_greeks(spot, v1, v2, u_log, dt, price):
    """Delta/gamma/theta from captured nodes (reference: binomial_tree.py:118-142)."""
    lu, ld = u_log  # (log-up, log-down)
    s_u = spot * jnp.exp(lu)
    s_d = spot * jnp.exp(ld)
    delta = (v1[1] - v1[0]) / jnp.maximum(s_u - s_d, 1e-12)
    s_uu = spot * jnp.exp(2 * lu)
    s_dd = spot * jnp.exp(2 * ld)
    s_ud = spot * jnp.exp(lu + ld)
    d_up = (v2[2] - v2[1]) / jnp.maximum(s_uu - s_ud, 1e-12)
    d_dn = (v2[1] - v2[0]) / jnp.maximum(s_ud - s_dd, 1e-12)
    gamma = (d_up - d_dn) / jnp.maximum(0.5 * (s_uu - s_dd), 1e-12)
    theta = (v2[1] - price) / jnp.maximum(2.0 * dt, 1e-12)
    return delta, gamma, theta


@functools.partial(jax.jit, static_argnames=("american", "n_steps", "richardson",
                                             "method"))
def binomial_price(batch: ContractBatch, american: bool = False, n_steps: int = 512,
                   richardson: bool = False, method: str = "crr") -> jnp.ndarray:
    """Whole-book lattice pricing in one launch.

    ``richardson=True`` averages the N and N+1 step lattices, cancelling
    the CRR even/odd oscillation (≈ one order of accuracy for the cost of
    a second vmapped solve — both run in the same launch).
    ``method="leisen-reimer"`` (odd ``n_steps``) converges O(1/N²).
    """
    b = batch.broadcast()

    def single(n):
        def inner(s, k, t, r, sig, q, cp):
            price, _ = _crr_solve(s, k, t, r, sig, q, cp, american, n, method)
            return price
        return inner

    flat = jax.tree.map(lambda x: x.reshape(-1), b)
    args = (flat.spot, flat.strike, flat.maturity, flat.rate, flat.vol,
            flat.dividend, flat.cp)
    prices = jax.vmap(single(n_steps))(*args)
    if richardson:
        # LR needs odd step counts: jump by 2 for its Richardson partner
        partner = n_steps + (2 if method == "leisen-reimer" else 1)
        prices = 0.5 * (prices + jax.vmap(single(partner))(*args))
    intrinsic = jnp.maximum(flat.cp * (flat.spot - flat.strike), 0.0)
    prices = jnp.where(flat.maturity <= EPS_TIME, intrinsic, prices)
    return prices.reshape(b.shape)


@functools.partial(jax.jit, static_argnames=("american", "n_steps", "method"))
def binomial_greeks(batch: ContractBatch, american: bool = False, n_steps: int = 512,
                    method: str = "crr") -> dict:
    """Price + full Greek ladder from ONE lattice per contract.

    delta/gamma/theta: lattice-analytic (node capture).
    vega/rho/dividend-rho + AD delta cross-check: one ``jax.jacrev`` through
    the scan (replaces the reference's 7 finite-difference re-solves,
    ``greeks.py:83-149``).
    """
    b = batch.broadcast()
    flat = jax.tree.map(lambda x: x.reshape(-1), b)

    def single_all(s, k, t, r, sig, q, cp):
        price, (v1, v2, u_log, dt) = _crr_solve(s, k, t, r, sig, q, cp, american,
                                                n_steps, method)
        delta, gamma, theta = _lattice_greeks(s, v1, v2, u_log, dt, price)
        return price, delta, gamma, theta

    def price_only(s, k, t, r, sig, q, cp):
        return _crr_solve(s, k, t, r, sig, q, cp, american, n_steps, method)[0]

    price, delta, gamma, theta = jax.vmap(single_all)(
        flat.spot, flat.strike, flat.maturity, flat.rate, flat.vol, flat.dividend, flat.cp
    )
    grads = jax.vmap(jax.grad(price_only, argnums=(1, 3, 4, 5)))(
        flat.spot, flat.strike, flat.maturity, flat.rate, flat.vol, flat.dividend, flat.cp
    )
    dual_delta, rho, vega, div_rho = grads
    out = {
        "price": price,
        "delta": delta,
        "gamma": gamma,
        "theta": theta,
        "vega": vega,
        "rho": rho,
        "dual_delta": dual_delta,
        "dividend_rho": div_rho,
    }
    return {k: v.reshape(b.shape) for k, v in out.items()}


class BinomialTree:
    """Object adapter mirroring the reference's ``BinomialTree``
    (``binomial_tree.py:147``): price/delta/gamma/theta/vega/rho/
    calculate_all with scalar or array inputs."""

    def __init__(self, n_steps: int = 512, american: bool = False,
                 method: str = "crr"):
        if n_steps < 3:
            raise ValidationError(f"n_steps must be >= 3, got {n_steps}")
        if method not in ("crr", "leisen-reimer"):
            raise ValidationError(f"method must be crr|leisen-reimer, got {method!r}")
        if method == "leisen-reimer" and n_steps % 2 == 0:
            n_steps += 1  # LR requires odd step counts
        self.n_steps = n_steps
        self.american = american
        self.method = method

    def _greeks(self, S, K, T, r, sigma, option_type, q):
        batch = ContractBatch.make(S, K, T, r, sigma, option_type, q)
        return binomial_greeks(batch, american=self.american, n_steps=self.n_steps,
                               method=self.method)

    def price(self, S, K, T, r, sigma, option_type="call", q=0.0):
        batch = ContractBatch.make(S, K, T, r, sigma, option_type, q)
        return binomial_price(batch, american=self.american, n_steps=self.n_steps,
                              method=self.method)

    def delta(self, S, K, T, r, sigma, option_type="call", q=0.0):
        return self._greeks(S, K, T, r, sigma, option_type, q)["delta"]

    def gamma(self, S, K, T, r, sigma, option_type="call", q=0.0):
        return self._greeks(S, K, T, r, sigma, option_type, q)["gamma"]

    def calculate_all(self, S, K, T, r, sigma, option_type="call", q=0.0):
        return self._greeks(S, K, T, r, sigma, option_type, q)
