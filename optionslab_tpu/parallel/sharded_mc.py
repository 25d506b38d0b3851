"""Multi-chip Monte Carlo: path axis sharded over ICI via ``shard_map``.

TPU-native replacement for the reference's single-host parallelism
(SURVEY.md §2.11), built on TOPOLOGY-INVARIANT counter-based randomness:

  * The global path range is decomposed into fixed blocks of
    ``PATH_BLOCK`` paths; block ``g`` always draws its normals from
    ``fold_in(key, g)`` — the same (seed, global block) produces the same
    normals on ANY mesh size.
  * Devices own contiguous global block ranges. Per-block payoff moments
    are ``all_gather``-ed into global block order and reduced in that one
    canonical order, so prices are BIT-IDENTICAL on 1-, 4- and 8-device
    meshes (asserted in ``tests/test_parallel.py``), not merely
    statistically consistent.
  * Only O(blocks) scalars per contract cross the interconnect.

``sharded_book_price`` adds the 2-D (book × paths) decomposition with
transparent padding and returns a full :class:`MCResult`;
``sharded_book_greeks`` differentiates straight through the sharded
program (``shard_map`` has transpose rules for ``all_gather``) and adds
the likelihood-ratio/pathwise gamma moment in the same pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..models.monte_carlo import MCConfig, MCResult, gbm_terminal
from ..types import ContractBatch
from ..utils.config import EPS_TIME
from .mesh import BOOK_AXIS, PATH_AXIS

PATH_BLOCK = 1000  # global RNG block: fixed regardless of topology


def _check_paths(cfg: MCConfig, n_path_devices: int) -> int:
    if cfg.antithetic and PATH_BLOCK % 2:
        raise ValueError("PATH_BLOCK must be even for antithetic sampling")
    if cfg.n_paths % (PATH_BLOCK * n_path_devices):
        raise ValueError(
            f"n_paths={cfg.n_paths} must be divisible by PATH_BLOCK*paths-axis "
            f"= {PATH_BLOCK}*{n_path_devices} (fixed global RNG blocks keep "
            "streams topology-invariant)")
    return cfg.n_paths // PATH_BLOCK


def _block_moments(batch_b: ContractBatch, key, g, cfg: MCConfig):
    """Moments of global path block ``g`` — depends only on (key, g).

    Returns (Σ payoff, Σ pair-mean, Σ pair-mean², Σ gamma-weight) where the
    antithetic PAIR means are the independent samples for the stderr, and
    the gamma weight is the mixed pathwise–likelihood-ratio integrand
    cp·1{exercise}·S_T·(z_eff/(σ√T) − 1) (Glasserman §7.3; see
    ``models/monte_carlo.mc_greeks``).
    """
    half = PATH_BLOCK // 2 if cfg.antithetic else PATH_BLOCK
    z = jax.random.normal(jax.random.fold_in(key, g), (half, cfg.n_steps),
                          dtype=cfg.dtype)
    if cfg.antithetic:
        z = jnp.concatenate([z, -z], axis=0)
    terminal = gbm_terminal(batch_b, z)
    pay = batch_b.intrinsic(terminal)
    if cfg.antithetic:
        pair = 0.5 * (pay[..., :half] + pay[..., half:])
    else:
        pair = pay
    n_steps = z.shape[-1]
    z_eff = z.sum(axis=-1) / jnp.sqrt(jnp.asarray(float(n_steps), z.dtype))
    sig_sqrt_t = batch_b.vol * jnp.sqrt(jnp.maximum(batch_b.maturity, EPS_TIME))
    ind = (batch_b.cp[..., None] * (terminal - batch_b.strike[..., None])) > 0
    gw = (batch_b.cp[..., None] * jnp.where(ind, terminal, 0.0)
          * (z_eff / sig_sqrt_t[..., None] - 1.0))
    return (pay.sum(axis=-1), pair.sum(axis=-1), (pair * pair).sum(axis=-1),
            gw.sum(axis=-1))


def _reduce_canonical(local_moms, axis_name, g_total, bpd):
    """Collect per-block moments into global block order and reduce in that
    ONE canonical order — bit-identical results on any mesh size.

    Each device scatters its blocks into a zero-padded (g_total, ...)
    buffer; ``psum`` fills every slot with exactly one nonzero contribution
    (adding zeros is exact in IEEE), and — unlike ``all_gather`` — its
    output is statically marked replicated, which the P() out_specs need.
    """
    d = jax.lax.axis_index(axis_name)

    def to_global(m):
        buf = jnp.zeros((g_total,) + m.shape[1:], m.dtype)
        buf = jax.lax.dynamic_update_slice_in_dim(buf, m, d * bpd, axis=0)
        return jnp.sum(jax.lax.psum(buf, axis_name), axis=0)

    return [to_global(m) for m in local_moms]


def _combine(batch_b: ContractBatch, moms, cfg: MCConfig):
    pay_sum, pair_sum, pair2_sum, gw_sum = moms
    n = jnp.asarray(cfg.n_paths, pay_sum.dtype)
    n_pairs = jnp.asarray(cfg.n_paths // (2 if cfg.antithetic else 1),
                          pay_sum.dtype)
    df = batch_b.discount()
    mean = pay_sum / n
    pair_mean = pair_sum / n_pairs
    var = jnp.maximum(pair2_sum / n_pairs - pair_mean * pair_mean, 0.0)
    var = var * n_pairs / jnp.maximum(n_pairs - 1.0, 1.0)  # ddof=1
    expired = batch_b.maturity <= EPS_TIME
    price = jnp.where(expired, batch_b.intrinsic(), df * mean)
    se = jnp.where(expired, 0.0, df * jnp.sqrt(var / n_pairs))
    gamma = df / jnp.maximum(batch_b.spot, 1e-30) ** 2 * (gw_sum / n)
    return price, se, gamma


def sharded_mc_price(batch: ContractBatch, key, cfg: MCConfig, mesh) -> MCResult:
    """Price with the path axis sharded over every device in ``mesh``.

    Works for any mesh containing a ``paths`` axis; the ``book`` axis (if
    >1) replicates contracts here (contract sharding is the 2-D entry
    point, :func:`sharded_book_price`).
    """
    n_dev = mesh.shape[PATH_AXIS]
    g_total = _check_paths(cfg, n_dev)
    bpd = g_total // n_dev

    def local(batch_rep: ContractBatch, key_rep):
        d = jax.lax.axis_index(PATH_AXIS)
        b = batch_rep.broadcast()
        gs = d * bpd + jnp.arange(bpd)
        moms = jax.lax.map(lambda g: _block_moments(b, key_rep, g, cfg), gs)
        price, se, _gamma = _combine(
            b, _reduce_canonical(moms, PATH_AXIS, g_total, bpd), cfg)
        return price, se

    fn = shard_map(local, mesh=mesh, in_specs=(P(), P()), out_specs=(P(), P()))
    price, se = fn(batch, key)
    return MCResult(price=price, std_error=se, n_paths=jnp.asarray(cfg.n_paths))


def _pad_book(batch: ContractBatch, n_book: int):
    """Broadcast to 1-D and edge-pad the book to a multiple of the book axis."""
    b = batch.broadcast()
    if len(b.shape) != 1:
        raise ValueError(f"sharded_book_price expects a 1-D book, got {b.shape}")
    c = b.shape[0]
    pad = (-c) % n_book
    if pad:
        b = jax.tree.map(lambda x: jnp.pad(x, (0, pad), mode="edge"), b)
    return b, c


def _book_engine(batch: ContractBatch, key, cfg: MCConfig, mesh):
    """Sharded 2-D (book × paths) moment engine → (price, se, gamma)."""
    n_dev = mesh.shape[PATH_AXIS]
    g_total = _check_paths(cfg, n_dev)
    bpd = g_total // n_dev

    def local(b: ContractBatch, key_rep):
        d = jax.lax.axis_index(PATH_AXIS)
        gs = d * bpd + jnp.arange(bpd)
        moms = jax.lax.map(lambda g: _block_moments(b, key_rep, g, cfg), gs)
        return _combine(b, _reduce_canonical(moms, PATH_AXIS, g_total, bpd), cfg)

    book_spec = ContractBatch(*([P(BOOK_AXIS)] * 7))
    fn = shard_map(local, mesh=mesh, in_specs=(book_spec, P()),
                   out_specs=(P(BOOK_AXIS), P(BOOK_AXIS), P(BOOK_AXIS)))
    return fn(batch, key)


def sharded_book_price(batch: ContractBatch, key, cfg: MCConfig, mesh,
                       return_result: bool = False):
    """Contracts sharded over ``book``, paths over ``paths`` — the full 2-D
    decomposition. Books of any length are padded transparently; path
    randomness is shared across the book (common random numbers), exactly
    as the unsharded engine does.

    Returns the price array, or a full :class:`MCResult` (price, stderr,
    n_paths) with ``return_result=True``.
    """
    padded, c = _pad_book(batch, mesh.shape[BOOK_AXIS])
    price, se, _gamma = _book_engine(padded, key, cfg, mesh)
    price, se = price[:c], se[:c]
    if return_result:
        return MCResult(price=price, std_error=se,
                        n_paths=jnp.asarray(cfg.n_paths))
    return price


def sharded_book_greeks(batch: ContractBatch, key, cfg: MCConfig, mesh) -> dict:
    """Full Greek ladder on the sharded 2-D engine, parity with
    ``models/monte_carlo.mc_greeks``: pathwise AD first-order Greeks (CRN by
    construction — randomness is a function of (key, global block) only)
    plus the LR/PW gamma computed in the same sharded pass.
    """
    padded, c = _pad_book(batch, mesh.shape[BOOK_AXIS])

    def total(b):
        price, se, gamma = _book_engine(b, key, cfg, mesh)
        return price.sum(), (price, se, gamma)

    grads, (price, se, gamma) = jax.grad(total, has_aux=True)(padded)
    take = lambda x: x[:c]
    return {
        "price": take(price),
        "std_error": take(se),
        "delta": take(grads.spot),
        "gamma": take(gamma),
        "vega": take(grads.vol),
        "rho": take(grads.rate),
        "theta": take(-grads.maturity),
        "dual_delta": take(grads.strike),
        "dividend_rho": take(grads.dividend),
    }
