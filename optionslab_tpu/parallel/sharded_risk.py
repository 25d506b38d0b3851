"""Sharded VaR/ES: tail quantiles over device-distributed P&L samples.

SURVEY.md §5's named TPU equivalent: "collectives limited to psum/pmean of
MC reductions and all_gather of per-shard quantile tails for VaR/ES".

Design: a (1-c) tail quantile only needs each shard's worst ceil((1-c)·n)
observations. Every device top-k's its LOCAL shard (O(n log k) on-device),
``all_gather`` moves only the k·n_dev tail values over ICI (not the full
sample), and the exact global quantile/tail-mean comes from the gathered
tail — bit-identical to sorting the full sample, at 1/(1-c)× less traffic.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from .mesh import PATH_AXIS


def _tail_count(confidence: float, n: int) -> int:
    """ceil((1-c)·n) with an epsilon guard against float artifacts like
    0.05·80000 = 4000.0000000000005 → 4001."""
    return max(1, int(math.ceil((1.0 - confidence) * n - 1e-9)))


def sharded_historical_var_es(pnl_sharded, confidence: float, mesh):
    """(VaR, ES) of a P&L sample sharded over the mesh's path axis.

    ``pnl_sharded``: 1-D array whose leading axis is sharded over
    ``mesh[PATH_AXIS]`` (length divisible by the axis size). Returns
    positive-loss VaR and ES, exact (same as a global sort).
    """
    n_dev = mesh.shape[PATH_AXIS]
    n_total = pnl_sharded.shape[0]
    n_local = n_total // n_dev
    m = _tail_count(confidence, n_total)
    # worst-case tail size per shard: the entire global tail could sit on one shard
    k = min(n_local, m + 1)

    def local(pnl):
        # smallest-k per shard (losses are the left tail of P&L)
        tail = -jax.lax.top_k(-pnl.reshape(-1), k)[0]  # ascending worst-k
        tails = jax.lax.all_gather(tail, PATH_AXIS)  # (n_dev, k)
        flat = tails.reshape(-1)
        worst_m = -jax.lax.top_k(-flat, m)[0]
        var = -worst_m[-1]
        es = -worst_m.mean()
        return var, es

    fn = shard_map(local, mesh=mesh, in_specs=P(PATH_AXIS), out_specs=(P(), P()),
                   check_vma=False)
    return fn(pnl_sharded)


def sharded_mc_var(value, mu, sigma, key, mesh, confidence: float = 0.95,
                   horizon: float = 1.0, n_paths: int = 1_000_000):
    """Monte Carlo VaR with simulation AND quantile both sharded: each
    device simulates its path range from a fold_in key, only tail values
    cross the interconnect."""
    n_dev = mesh.shape[PATH_AXIS]
    if n_paths % n_dev:
        raise ValueError(f"n_paths={n_paths} not divisible by {n_dev} devices")
    n_local = n_paths // n_dev
    m = _tail_count(confidence, n_paths)
    k = min(n_local, m + 1)

    def local(key_rep):
        idx = jax.lax.axis_index(PATH_AXIS)
        z = jax.random.normal(jax.random.fold_in(key_rep, idx), (n_local,))
        growth = jnp.exp((mu - 0.5 * sigma**2) * horizon
                         + sigma * jnp.sqrt(jnp.asarray(horizon)) * z)
        pnl = value * (growth - 1.0)
        tail = -jax.lax.top_k(-pnl, k)[0]
        tails = jax.lax.all_gather(tail, PATH_AXIS).reshape(-1)
        worst_m = -jax.lax.top_k(-tails, m)[0]
        return -worst_m[-1], -worst_m.mean()

    fn = shard_map(local, mesh=mesh, in_specs=P(), out_specs=(P(), P()),
                   check_vma=False)
    return fn(key)
