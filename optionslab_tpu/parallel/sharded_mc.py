"""Multi-chip Monte Carlo: path axis sharded over ICI via ``shard_map``.

TPU-native replacement for the reference's single-host parallelism
(SURVEY.md §2.11): each device draws its own path block from a
counter-based key derived from its mesh position — the same (seed, global
path index) always produces the same normal regardless of topology — then
payoff moments (sum, sum of squares) are combined with ``psum`` over the
ICI ring. Only two scalars per contract cross the interconnect.
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


def sharded_mc_price(batch: ContractBatch, key, cfg: MCConfig, mesh) -> MCResult:
    """Price with the path axis sharded over every device in ``mesh``.

    Works for any mesh containing a ``paths`` axis; the ``book`` axis (if
    >1) replicates contracts today (contract sharding is a separate entry
    point, :func:`sharded_book_price`).
    """
    if cfg.n_paths % (mesh.shape[PATH_AXIS] * 2):
        raise ValueError(
            f"n_paths={cfg.n_paths} must be divisible by 2*paths axis size "
            f"({mesh.shape[PATH_AXIS]})"
        )
    local_cfg = MCConfig(
        n_paths=cfg.n_paths // mesh.shape[PATH_AXIS],
        n_steps=cfg.n_steps,
        antithetic=cfg.antithetic,
        method=cfg.method,
        dtype=cfg.dtype,
    )

    def local(batch_rep: ContractBatch, key_rep):
        # independent stream per path-shard: fold in the mesh position
        idx = jax.lax.axis_index(PATH_AXIS)
        local_key = jax.random.fold_in(key_rep, idx)
        z = jax.random.normal(
            local_key,
            (local_cfg.n_paths // (2 if local_cfg.antithetic else 1), local_cfg.n_steps),
            dtype=local_cfg.dtype,
        )
        if local_cfg.antithetic:
            z = jnp.concatenate([z, -z], axis=0)
        b = batch_rep.broadcast()
        pay = b.intrinsic(gbm_terminal(b, z))
        s = jax.lax.psum(pay.sum(axis=-1), PATH_AXIS)
        ss = jax.lax.psum((pay * pay).sum(axis=-1), PATH_AXIS)
        n = jnp.asarray(cfg.n_paths, pay.dtype)
        mean = s / n
        var = jnp.maximum(ss / n - mean * mean, 0.0)
        df = b.discount()
        price = jnp.where(b.maturity <= EPS_TIME, b.intrinsic(), df * mean)
        se = df * jnp.sqrt(var / n)
        return price, se

    spec_in = (P(), P())  # batch + key replicated
    spec_out = (P(), P())
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=spec_in,
        out_specs=spec_out,
    )
    price, se = fn(batch, key)
    return MCResult(price=price, std_error=se, n_paths=jnp.asarray(cfg.n_paths))


def sharded_book_price(batch: ContractBatch, key, cfg: MCConfig, mesh) -> jnp.ndarray:
    """Contracts sharded over ``book``, paths over ``paths`` — the full 2-D
    decomposition. ``batch`` fields must be 1-D with length divisible by the
    book axis size."""

    def local(b: ContractBatch, key_rep):
        pidx = jax.lax.axis_index(PATH_AXIS)
        local_key = jax.random.fold_in(key_rep, pidx)
        half = cfg.n_paths // mesh.shape[PATH_AXIS] // 2
        z = jax.random.normal(local_key, (half, cfg.n_steps), dtype=cfg.dtype)
        z = jnp.concatenate([z, -z], axis=0)
        bb = b.broadcast()
        pay = bb.intrinsic(gbm_terminal(bb, z))
        mean = jax.lax.pmean(pay.mean(axis=-1), PATH_AXIS)
        return jnp.where(bb.maturity <= EPS_TIME, bb.intrinsic(), bb.discount() * mean)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            ContractBatch(P(BOOK_AXIS), P(BOOK_AXIS), P(BOOK_AXIS), P(BOOK_AXIS), P(BOOK_AXIS), P(BOOK_AXIS), P(BOOK_AXIS)),
            P(),
        ),
        out_specs=P(BOOK_AXIS),
    )
    return fn(batch.broadcast(), key)
