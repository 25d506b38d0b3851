"""Pod-scale Monte Carlo: the fused Pallas GBM kernel under ``shard_map``.

This is the multi-chip face of ``ops/gbm_pallas.py`` — the TPU-native
answer to the reference's single-node Numba ``prange`` hot loop
(``src/simulation/gbm_numba.py:75``) at pod scale. Design:

  * **Global block ownership.** A single-device launch computes path
    blocks ``[0, n)``; the sharded launch assigns each device a contiguous
    slice ``[d·bpd, (d+1)·bpd)`` and passes the offset into the kernel
    (``seed_ref[1]``). Because every sampler stream is a pure function of
    (seed, GLOBAL block id), the union of paths simulated is IDENTICAL for
    every topology — 1, 4, 8, 256 chips all integrate the same sample set
    (only the f32 summation association differs, ~1e-7 relative).
  * **Moments over ICI, not payoffs.** Each device reduces its blocks to
    four (rows, 128) accumulator tiles in VMEM; only those tiles cross the
    interconnect (one ``psum``), so the collective payload is O(contracts),
    independent of the path count.
  * **One jitted program.** prepare -> kernel -> psum -> Greek combine is
    traced as a single program per (mesh, n_paths, sampler) — one dispatch
    over the tunnel/runtime regardless of topology.

Off-TPU the kernel runs under the TPU-semantics interpreter inside
``shard_map`` — with ``sampler="hash"`` (counter-based murmur3, pure int32
ops) or ``sampler="sobol"`` the full multi-device pipeline is verified on
the 8-device virtual CPU mesh in the unit tests, bit-comparable to what
Mosaic executes on a real slice.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import exotic_pallas as _ep
from ..ops import heston_pallas as _hp
from ..ops import local_vol_pallas as _lv
from ..ops import multi_asset_pallas as _mp
from ..ops import slv_pallas as _slv
from ..ops.gbm_pallas import _combine, _lanes_for, _launch, _prepare
from ..types import ContractBatch
from ..utils.exceptions import ValidationError
from .mesh import BOOK_AXIS, PATH_AXIS


def _mesh_axes(mesh: Mesh):
    """(axis names to reduce over, total device count) for this mesh."""
    names = [n for n in (BOOK_AXIS, PATH_AXIS) if n in mesh.shape]
    if not names:  # arbitrary user mesh: reduce over every axis
        names = list(mesh.shape.keys())
    n_dev = 1
    for n in names:
        n_dev *= mesh.shape[n]
    return tuple(names), n_dev


@functools.partial(jax.jit, static_argnames=("n_paths", "sampler", "mesh"))
def _sharded_pipeline(batch: ContractBatch, seed, *, n_paths: int,
                      sampler: str, mesh: Mesh) -> dict:
    b, flat, params, c, reps, rows, _pad = _prepare(batch)
    lanes = _lanes_for(rows)
    per_block = 4 * lanes  # cos/sin × (±antithetic) per row
    names, n_dev = _mesh_axes(mesh)
    # global block count, rounded up so every device owns the same number
    n_blocks = max(1, math.ceil(n_paths / (per_block * reps)))
    n_blocks = ((n_blocks + n_dev - 1) // n_dev) * n_dev
    bpd = n_blocks // n_dev
    interpret = (False if jax.default_backend() == "tpu"
                 else pltpu.InterpretParams())

    def local(seed_s, *params_rep):
        # linear device id across every mesh axis we shard blocks over
        d = _device_linear_index(mesh, names)
        seed_vec = jnp.stack([seed_s.astype(jnp.int32), d * bpd])
        outs = _launch(seed_vec, *params_rep, n_blocks=bpd, rows=rows,
                       lanes=lanes, interpret=interpret, sampler=sampler,
                       reps=reps)
        return tuple(jax.lax.psum(o, names) for o in outs)

    # check_vma=False: pallas_call does not declare varying-mesh-axes
    # metadata for its outputs; correctness is covered by the psum (outputs
    # are reduced over every mesh axis before leaving the shard).
    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(),) + (P(),) * len(params),
                   out_specs=(P(),) * 4, check_vma=False)
    outs = fn(jnp.asarray(seed, jnp.int32), *params)
    out = _combine(b, flat, outs, c, reps, n_blocks * per_block, batch.dtype,
                   sampler=sampler)
    # actual per-contract path count (blocks round up to a full device grid)
    out["n_paths"] = jnp.asarray(n_blocks * per_block * reps, jnp.int32)
    return out


def sharded_pallas_greeks(batch: ContractBatch, mesh: Mesh,
                          n_paths: int = 1_000_000, seed: int = 0,
                          sampler: str = "prng") -> dict:
    """Price + stderr + the full first/second-order Greek ladder from the
    fused Pallas kernel, with the path-block axis sharded over every device
    of ``mesh`` (``book`` and ``paths`` axes both shard blocks; a contract
    book rides the sublane axis inside each kernel instance).

    ``n_paths`` is the per-contract GLOBAL path budget across the whole
    mesh (rounded up to whole per-device blocks). The estimate is
    topology-invariant by construction: every mesh size integrates the
    same (seed, global-block) path set — see the module docstring.

    Samplers: ``prng`` (hardware PRNG, fastest), ``sobol`` (in-kernel
    scrambled net — each device owns a contiguous index range, so the
    union is exactly the single-device net), ``hash`` (counter-based,
    CPU-verifiable). Reference anchor: ``src/simulation/gbm_numba.py:75``
    (threads), ``src/models_production/monte_carlo_unified.py:329``.
    """
    return _sharded_pipeline(batch, jnp.asarray(seed, jnp.int32),
                             n_paths=n_paths, sampler=sampler, mesh=mesh)


# ---------------------------------------------------------------------------
# Path-dependent payoffs: the fused exotic kernels under shard_map
# ---------------------------------------------------------------------------
def _device_linear_index(mesh: Mesh, names):
    d = jnp.zeros((), jnp.int32)
    for n in names:
        d = d * mesh.shape[n] + jax.lax.axis_index(n)
    return d


def _round_blocks(n_paths: int, per_block: int, n_dev: int) -> int:
    n_blocks = max(1, math.ceil(n_paths / per_block))
    return ((n_blocks + n_dev - 1) // n_dev) * n_dev


@functools.partial(jax.jit, static_argnames=("kind", "n_steps", "n_blocks",
                                             "cp", "period", "sampler", "mesh"))
def _sharded_exotic_launch(seed, params, *, kind, n_steps, n_blocks, cp,
                           period, sampler, mesh):
    names, n_dev = _mesh_axes(mesh)
    bpd = n_blocks // n_dev

    def local(seed_s, params_rep):
        d = _device_linear_index(mesh, names)
        seed_vec = jnp.stack([seed_s.astype(jnp.int32), d * bpd])
        outs = _ep._launch(seed_vec, params_rep, kind=kind, n_steps=n_steps,
                           n_blocks=bpd, cp=cp, period=period, sampler=sampler)
        return tuple(jax.lax.psum(o, names) for o in outs)

    fn = shard_map(local, mesh=mesh, in_specs=(P(), P()),
                   out_specs=(P(),) * 2, check_vma=False)
    return fn(seed, params)


def sharded_exotic_price(kind: str, spot, strike, maturity, rate, vol,
                         mesh: Mesh, cp: float = 1.0, dividend: float = 0.0,
                         barrier: float = 0.0, n_paths: int = 1_000_000,
                         n_steps: int = 64, seed: int = 0,
                         sampler: str = "prng",
                         lower: float = 0.0, upper: float = 0.0):
    """``ops/exotic_pallas.pallas_exotic_price`` with path blocks sharded
    over every device of ``mesh`` (global-block ownership — same
    topology-invariant path set as :func:`sharded_pallas_greeks`).
    Returns (price, stderr, actual_paths); ``n_paths`` is the global
    budget, rounded up to a full device grid of blocks.
    """
    if kind not in _ep.PAYOFF_KINDS:
        raise ValidationError(
            f"unknown exotic kind {kind!r}; choose {_ep.PAYOFF_KINDS}")
    if kind in ("cliquet", "autocall", "range_accrual"):
        raise ValidationError(f"use the pallas_{kind}_price wrapper (its "
                              "structured params) on a mesh-local basis")
    p, t = _ep._base_params(spot, strike, maturity, rate, vol, dividend,
                            barrier, n_steps)
    if "double" in kind:
        if not 0.0 < lower < upper:
            raise ValidationError("double kinds need 0 < lower < upper")
        p[_ep._P_A], p[_ep._P_B] = float(lower), float(upper)
    _names, n_dev = _mesh_axes(mesh)
    n_blocks = _round_blocks(n_paths, _ep.PATHS_PER_BLOCK, n_dev)
    pay, pay2 = _sharded_exotic_launch(
        jnp.asarray(seed, jnp.int32), jnp.asarray(p, jnp.float32), kind=kind,
        n_steps=n_steps, n_blocks=n_blocks, cp=float(cp), period=1,
        sampler=sampler, mesh=mesh)
    return _ep._mean_stderr(pay, pay2, n_blocks * _ep.PATHS_PER_BLOCK,
                            math.exp(-float(rate) * t), sampler)


@functools.partial(jax.jit, static_argnames=("kind", "n_steps", "n_blocks",
                                             "cp", "sampler", "mesh"))
def _sharded_exotic_greeks_pipeline(seed, params, scalars, *, kind, n_steps,
                                    n_blocks, cp, sampler, mesh):
    names, n_dev = _mesh_axes(mesh)
    bpd = n_blocks // n_dev

    def local(seed_s, params_rep, _scalars_rep):
        d = _device_linear_index(mesh, names)
        seed_vec = jnp.stack([seed_s.astype(jnp.int32), d * bpd])
        outs = _ep._launch_greeks(seed_vec, params_rep, kind=kind,
                                  n_steps=n_steps, n_blocks=bpd, cp=cp,
                                  sampler=sampler)
        return tuple(jax.lax.psum(o, names) for o in outs)

    fn = shard_map(local, mesh=mesh, in_specs=(P(), P(), P()),
                   out_specs=(P(),) * 5, check_vma=False)
    outs = fn(seed, params, scalars)
    return _ep._combine_greeks(outs, n_blocks * _ep.PATHS_PER_BLOCK_G,
                               scalars, kind, n_steps)


def sharded_exotic_greeks(kind: str, spot, strike, maturity, rate, vol,
                          mesh: Mesh, cp: float = 1.0, dividend: float = 0.0,
                          n_paths: int = 1_000_000, n_steps: int = 64,
                          seed: int = 0, sampler: str = "prng") -> dict:
    """``ops/exotic_pallas.pallas_exotic_greeks`` (price + pathwise
    delta/vega/rho/theta/dividend_rho, ONE kernel pass) sharded over
    ``mesh``: each device owns a contiguous global block range, the five
    moment tiles psum over ICI, and the ladder is combined once host-side.
    """
    if kind not in _ep.GREEK_KINDS:
        raise ValidationError(
            f"in-kernel Greeks support {_ep.GREEK_KINDS}; for {kind!r} use "
            "the scan engine's AD (models/exotics.exotic_greeks)")
    if sampler.startswith("sobol"):
        raise ValidationError("the Greeks kernel supports prng/hash only")
    p, t = _ep._base_params(spot, strike, maturity, rate, vol, dividend,
                            0.0, n_steps)
    _names, n_dev = _mesh_axes(mesh)
    n_blocks = _round_blocks(n_paths, _ep.PATHS_PER_BLOCK_G, n_dev)
    a_drift = float(rate) - float(dividend) - 0.5 * float(vol) ** 2
    scalars = jnp.asarray([float(spot), float(rate), float(vol), t, a_drift,
                           math.exp(-float(rate) * t)], jnp.float32)
    out = _sharded_exotic_greeks_pipeline(
        jnp.asarray(seed, jnp.int32), jnp.asarray(p, jnp.float32), scalars,
        kind=kind, n_steps=n_steps, n_blocks=n_blocks, cp=float(cp),
        sampler=sampler, mesh=mesh)
    out = dict(out)
    out["paths"] = n_blocks * _ep.PATHS_PER_BLOCK_G
    return out


# ---------------------------------------------------------------------------
# Multi-asset: the fused correlated-GBM kernel under shard_map
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("d", "kind", "n_steps",
                                             "n_blocks", "cp", "sampler",
                                             "lr", "mesh"))
def _sharded_ma_launch(seed, params, *, d, kind, n_steps, n_blocks, cp,
                       sampler, mesh, lr=False):
    names, n_dev = _mesh_axes(mesh)
    bpd = n_blocks // n_dev
    n_out = 2 + (2 * d + d * (d + 1) // 2 + 2 if lr else 0)

    def local(seed_s, params_rep):
        dev = _device_linear_index(mesh, names)
        seed_vec = jnp.stack([seed_s.astype(jnp.int32), dev * bpd])
        outs = _mp._launch(seed_vec, params_rep, d=d, kind=kind,
                           n_steps=n_steps, n_blocks=bpd, cp=cp,
                           sampler=sampler, lr=lr)
        return tuple(jax.lax.psum(o, names) for o in outs)

    fn = shard_map(local, mesh=mesh, in_specs=(P(), P()),
                   out_specs=(P(),) * n_out, check_vma=False)
    return fn(seed, params)


def sharded_multi_asset_price(kind: str, spots, strike, maturity, rate, vols,
                              corr, mesh: Mesh, weights=None, cp: float = 1.0,
                              dividends=0.0, n_paths: int = 1_000_000,
                              n_steps: int = 1, seed: int = 0,
                              sampler: str = "prng",
                              control_variate: bool = False):
    """``ops/multi_asset_pallas.pallas_multi_asset_price`` with path blocks
    sharded over ``mesh`` (global-block ownership, topology-invariant path
    set). Returns (price, stderr, actual_paths). ``control_variate=True``
    (basket only) applies the geometric CV — the diff moments psum, the
    exact closed form is added once host-side."""
    if control_variate:
        if kind != "basket":
            raise ValidationError("control_variate applies to the "
                                  "arithmetic basket (geometric CV)")
        kind = "basket_cv"
    if kind not in _mp.KINDS:
        raise ValidationError(f"unknown kind {kind!r}; choose {_mp.KINDS}")
    d, t, p = _mp._params_vec(spots, weights, strike, maturity, rate, vols,
                              corr, dividends, n_steps,
                              cv=kind == "basket_cv")
    if kind == "spread" and d != 2:
        raise ValidationError("spread requires exactly 2 assets")
    _names, n_dev = _mesh_axes(mesh)
    n_blocks = _round_blocks(n_paths, _mp.PATHS_PER_BLOCK, n_dev)
    pay, pay2 = _sharded_ma_launch(jnp.asarray(seed, jnp.int32), p, d=d,
                                   kind=kind, n_steps=n_steps,
                                   n_blocks=n_blocks, cp=float(cp),
                                   sampler=sampler, mesh=mesh)
    price, se, n = _ep._mean_stderr(pay, pay2,
                                    n_blocks * _mp.PATHS_PER_BLOCK,
                                    math.exp(-float(rate) * t), sampler)
    if kind == "basket_cv":
        import numpy as _np

        from ..models.multi_asset import geometric_basket_closed_form

        weights_a = (_np.asarray(weights, _np.float64).ravel()
                     if weights is not None else _np.full(d, 1.0 / d))
        price = price + geometric_basket_closed_form(
            spots, weights_a, strike, t, rate, vols, corr, cp, dividends)
    return price, se, n


def sharded_multi_asset_greeks(kind: str, spots, strike, maturity, rate,
                               vols, corr, mesh: Mesh, weights=None,
                               cp: float = 1.0, dividends=0.0,
                               n_paths: int = 1_000_000, n_steps: int = 1,
                               seed: int = 0, sampler: str = "prng") -> dict:
    """``ops/multi_asset_pallas.pallas_multi_asset_greeks`` — the FULL
    per-asset likelihood-ratio ladder (delta/vega vectors, d×d gamma
    matrix, theta, rho) — with path blocks sharded over ``mesh``. Only
    the 2+2d+d(d+1)/2+2 moment tiles cross ICI (one psum each); the
    ladder is assembled once host-side from the global moments, so the
    result is the single-device estimate for the identical path set."""
    if kind not in _mp.KINDS or kind == "basket_cv":
        raise ValidationError(f"unknown kind {kind!r}; choose {_mp.KINDS}")
    d, t, p = _mp._params_vec(spots, weights, strike, maturity, rate, vols,
                              corr, dividends, n_steps, lr=True)
    if kind == "spread" and d != 2:
        raise ValidationError("spread requires exactly 2 assets")
    _names, n_dev = _mesh_axes(mesh)
    n_blocks = _round_blocks(n_paths, _mp.PATHS_PER_BLOCK, n_dev)
    outs = _sharded_ma_launch(jnp.asarray(seed, jnp.int32), p, d=d,
                              kind=kind, n_steps=n_steps, n_blocks=n_blocks,
                              cp=float(cp), sampler=sampler, mesh=mesh,
                              lr=True)
    return _mp._combine_lr(outs, n_blocks * _mp.PATHS_PER_BLOCK, d, t, rate,
                           spots, vols, corr, n_steps)


# ---------------------------------------------------------------------------
# Stochastic vol: the fused Heston kernel under shard_map
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("n_steps", "n_blocks", "cp",
                                             "sampler", "vega", "ladder",
                                             "scheme", "mesh"))
def _sharded_heston_pipeline(seed, params, scalars, *, n_steps, n_blocks,
                             cp, sampler, vega, mesh, ladder=False,
                             scheme="euler"):
    names, n_dev = _mesh_axes(mesh)
    bpd = n_blocks // n_dev
    n_out = 9 if ladder else (3 if scheme == "qe" else (4 if vega else 3))

    def local(seed_s, params_rep, _scalars_rep):
        d = _device_linear_index(mesh, names)
        seed_vec = jnp.stack([seed_s.astype(jnp.int32), d * bpd])
        outs = _hp._launch(seed_vec, params_rep, n_steps=n_steps,
                           n_blocks=bpd, cp=cp, sampler=sampler, vega=vega,
                           ladder=ladder, scheme=scheme)
        return tuple(jax.lax.psum(o, names) for o in outs)

    fn = shard_map(local, mesh=mesh, in_specs=(P(), P(), P()),
                   out_specs=(P(),) * n_out, check_vma=False)
    outs = fn(seed, params, scalars)
    ppb = _hp.LADDER_PATHS_PER_BLOCK if ladder else _hp.PATHS_PER_BLOCK
    if scheme == "qe" and ladder:
        return _hp._combine_qe_ladder(outs, n_blocks * ppb, scalars, cp)
    return _hp._combine_moments(outs, n_blocks * ppb, scalars, cp, vega,
                                ladder=ladder, sampler=sampler)


def sharded_heston_greeks(spot, strike, maturity, rate, params, mesh: Mesh,
                          cp: float = 1.0, dividend: float = 0.0,
                          n_paths: int = 1_000_000, n_steps: int = 100,
                          seed: int = 0, sampler: str = "prng",
                          vega: bool = True, ladder: bool = False,
                          scheme: str = "euler") -> dict:
    """``ops/heston_pallas.pallas_heston_greeks`` (price + pathwise
    delta/rho + v0-vega, one kernel pass) with path blocks sharded over
    ``mesh`` via global-block ownership — the same topology-invariant
    construction as :func:`sharded_pallas_greeks`.

    ``ladder=True`` shards the FULL parameter-sensitivity variant
    (v0/kappa/theta/sigma/rho + calendar theta — 9 moment tiles psum over
    ICI); with ``scheme="qe"`` that is the CRN-bump QE ladder. Plain
    ``scheme="qe"`` shards the Andersen-QE price kernel (near-unbiased at
    coarse steps; price/delta/rho only)."""
    if scheme == "qe" and vega and not ladder:
        raise ValidationError("scheme='qe' needs ladder=True for "
                              "sensitivities (the CRN-bump kernel); plain "
                              "qe is price/delta/rho only")
    hs = []
    if scheme == "qe" and ladder:
        t, p, hs = _hp._params_vec_qe_ladder(spot, strike, maturity, rate,
                                             params, dividend, n_steps)
        hs = list(hs)
    elif scheme == "qe":
        t, p = _hp._params_vec_qe(spot, strike, maturity, rate, params,
                                  dividend, n_steps)
    else:
        t, p = _hp._params_vec(spot, strike, maturity, rate, params,
                               dividend, n_steps)
    _names, n_dev = _mesh_axes(mesh)
    ppb = _hp.LADDER_PATHS_PER_BLOCK if ladder else _hp.PATHS_PER_BLOCK
    n_blocks = _round_blocks(n_paths, ppb, n_dev)
    scalars = jnp.asarray([float(spot), t, math.exp(-float(rate) * t),
                           float(params.v0), float(rate)] + hs, jnp.float32)
    out = dict(_sharded_heston_pipeline(
        jnp.asarray(seed, jnp.int32), p, scalars, n_steps=n_steps,
        n_blocks=n_blocks, cp=float(cp), sampler=sampler,
        vega=vega and not ladder and scheme != "qe", mesh=mesh,
        ladder=ladder, scheme=scheme))
    out["paths"] = n_blocks * ppb
    return out


# ---------------------------------------------------------------------------
# Local vol: the fused Dupire-smile kernel under shard_map
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("n_steps", "n_blocks", "cp",
                                             "payoff", "sampler", "greeks",
                                             "mesh"))
def _sharded_lv_launch(seed, params, *, n_steps, n_blocks, cp, payoff,
                       sampler, greeks, mesh):
    names, n_dev = _mesh_axes(mesh)
    bpd = n_blocks // n_dev
    n_out = ((7 if payoff.startswith("lookback") else 5) if greeks else 2)

    def local(seed_s, params_rep):
        d = _device_linear_index(mesh, names)
        seed_vec = jnp.stack([seed_s.astype(jnp.int32), d * bpd])
        outs = _lv._launch(seed_vec, params_rep, n_steps=n_steps,
                           n_blocks=bpd, cp=cp, payoff=payoff,
                           sampler=sampler, greeks=greeks)
        return tuple(jax.lax.psum(o, names) for o in outs)

    fn = shard_map(local, mesh=mesh, in_specs=(P(), P()),
                   out_specs=(P(),) * n_out, check_vma=False)
    return fn(seed, params)


def sharded_local_vol_price(pricer, strike, mesh: Mesh, cp: float = 1.0,
                            payoff: str = "european", barrier: float = 0.0,
                            n_paths: int = 1_000_000, seed: int = 0,
                            sampler: str = "prng", lower: float = 0.0,
                            upper: float = 0.0):
    """``ops/local_vol_pallas.LocalVolKernelPricer.price`` — smile-
    consistent exotics on the precomputed per-step σ-polynomial table —
    with path blocks sharded over ``mesh`` (global-block ownership, same
    topology-invariant path set as every kernel family here). ``pricer``
    is a fitted :class:`~..ops.local_vol_pallas.LocalVolKernelPricer`.
    Returns (price, stderr, actual_paths)."""
    p = pricer._params(strike, payoff, barrier, lower, upper)
    _names, n_dev = _mesh_axes(mesh)
    n_blocks = _round_blocks(n_paths, _lv.PATHS_PER_BLOCK, n_dev)
    pay, pay2 = _sharded_lv_launch(
        jnp.asarray(seed, jnp.int32), jnp.asarray(p, jnp.float32),
        n_steps=pricer.n_steps, n_blocks=n_blocks, cp=float(cp),
        payoff=payoff, sampler=sampler, greeks=False, mesh=mesh)
    return _ep._mean_stderr(pay, pay2, n_blocks * _lv.PATHS_PER_BLOCK,
                            math.exp(-pricer.rate * pricer.t_total),
                            sampler)


def sharded_local_vol_greeks(pricer, strike, mesh: Mesh, cp: float = 1.0,
                             payoff: str = "european", barrier: float = 0.0,
                             n_paths: int = 1_000_000, seed: int = 0,
                             sampler: str = "prng", lower: float = 0.0,
                             upper: float = 0.0) -> dict:
    """``LocalVolKernelPricer.greeks`` (sticky-strike LR delta/gamma +
    parallel-shift vega, one kernel pass) sharded over ``mesh``: the 5
    (7 for lookbacks) moment tiles psum over ICI and the ladder is
    assembled once host-side — identical estimate to the single-device
    launch over the same global path set."""
    p = pricer._params(strike, payoff, barrier, lower, upper)
    _names, n_dev = _mesh_axes(mesh)
    n_blocks = _round_blocks(n_paths, _lv.PATHS_PER_BLOCK, n_dev)
    outs = _sharded_lv_launch(
        jnp.asarray(seed, jnp.int32), jnp.asarray(p, jnp.float32),
        n_steps=pricer.n_steps, n_blocks=n_blocks, cp=float(cp),
        payoff=payoff, sampler=sampler, greeks=True, mesh=mesh)
    return pricer._combine_greeks(outs, n_blocks * _lv.PATHS_PER_BLOCK,
                                  payoff)


# ---------------------------------------------------------------------------
# Heston exotics: the fused stochastic-vol path-dependent kernel under
# shard_map (closes the payoff x dynamics matrix at pod scale)
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("kind", "n_steps", "n_blocks",
                                             "cp", "period", "sampler",
                                             "scheme", "lr", "jumps",
                                             "mesh"))
def _sharded_heston_exotic_launch(seed, params, *, kind, n_steps, n_blocks,
                                  cp, period, sampler, scheme, lr, mesh,
                                  jumps=False):
    names, n_dev = _mesh_axes(mesh)
    bpd = n_blocks // n_dev
    n_out = ((8 if (kind == "autocall" or kind.endswith("_hit"))
              else 7) if lr else 2)

    def local(seed_s, params_rep):
        d = _device_linear_index(mesh, names)
        seed_vec = jnp.stack([seed_s.astype(jnp.int32), d * bpd])
        outs = _hp._launch_exotic(seed_vec, params_rep, kind=kind,
                                  n_steps=n_steps, n_blocks=bpd, cp=cp,
                                  period=period, sampler=sampler,
                                  scheme=scheme, lr=lr, jumps=jumps)
        return tuple(jax.lax.psum(o, names) for o in outs)

    fn = shard_map(local, mesh=mesh, in_specs=(P(), P()),
                   out_specs=(P(),) * n_out, check_vma=False)
    return fn(seed, params)


def sharded_heston_exotic_price(kind: str, spot, strike, maturity, rate,
                                params, mesh: Mesh, cp: float = 1.0,
                                dividend: float = 0.0, barrier: float = 0.0,
                                n_paths: int = 1_000_000, n_steps: int = 64,
                                seed: int = 0, sampler: str = "prng",
                                scheme: str = "euler",
                                lower: float = 0.0, upper: float = 0.0):
    """``ops/heston_pallas.pallas_heston_exotic_price`` with path blocks
    sharded over ``mesh`` (global-block ownership — the same topology-
    invariant path set as every kernel family here). Euler or Andersen-QE
    scheme. Returns (price, stderr, actual_paths)."""
    if kind not in _hp.HESTON_EXOTIC_KINDS or kind in ("cliquet", "autocall"):
        raise ValidationError(
            f"sharded heston exotics cover the non-structured kinds, got "
            f"{kind!r}")
    p, t = _hp._exotic_params(spot, strike, maturity, rate, params, dividend,
                              barrier, n_steps, scheme)
    if "double" in kind:
        _hp._set_double_band(p, spot, lower, upper)
    _names, n_dev = _mesh_axes(mesh)
    n_blocks = _round_blocks(n_paths, _hp.PATHS_PER_BLOCK, n_dev)
    pay, pay2 = _sharded_heston_exotic_launch(
        jnp.asarray(seed, jnp.int32), jnp.asarray(p, jnp.float32), kind=kind,
        n_steps=n_steps, n_blocks=n_blocks, cp=float(cp), period=1,
        sampler=sampler, scheme=scheme, lr=False, mesh=mesh,
        jumps=hasattr(params, "lam"))
    n = n_blocks * _hp.PATHS_PER_BLOCK
    df = 1.0 if kind.endswith("_hit") else math.exp(-float(rate) * t)
    return _ep._mean_stderr(pay, pay2, n, df, sampler)


def sharded_heston_exotic_greeks(kind: str, spot, strike, maturity, rate,
                                 params, mesh: Mesh, cp: float = 1.0,
                                 dividend: float = 0.0, barrier: float = 0.0,
                                 n_paths: int = 1_000_000, n_steps: int = 64,
                                 seed: int = 0,
                                 sampler: str = "prng",
                                 lower: float = 0.0,
                                 upper: float = 0.0) -> dict:
    """``pallas_heston_exotic_lr_greeks`` (price + joint-density LR
    delta/gamma/v0-vega/rho, one pass, Euler scheme) sharded over
    ``mesh``: six moment tiles psum over ICI, ladder combined once
    host-side — identical estimate to the single-device launch on the
    same global path set."""
    if kind not in _hp.HESTON_EXOTIC_KINDS or kind in ("cliquet", "autocall"):
        raise ValidationError(
            f"LR greeks cover the non-structured kinds, got {kind!r}")
    if sampler.startswith("sobol"):
        raise ValidationError("LR scores assume iid normals — use prng/hash")
    p, t = _hp._exotic_params(spot, strike, maturity, rate, params, dividend,
                              barrier, n_steps, "euler")
    if "double" in kind:
        _hp._set_double_band(p, spot, lower, upper)
    _names, n_dev = _mesh_axes(mesh)
    n_blocks = _round_blocks(n_paths, _hp.PATHS_PER_BLOCK, n_dev)
    outs = _sharded_heston_exotic_launch(
        jnp.asarray(seed, jnp.int32), jnp.asarray(p, jnp.float32), kind=kind,
        n_steps=n_steps, n_blocks=n_blocks, cp=float(cp), period=1,
        sampler=sampler, scheme="euler", lr=True, mesh=mesh,
        jumps=hasattr(params, "lam"))
    scalars = _hp._lr_scalars(spot, t, rate, params, n_steps)
    out = dict(_hp._combine_exotic_lr(outs, n_blocks * _hp.PATHS_PER_BLOCK,
                                      scalars, n_steps,
                                      discounted=kind.endswith("_hit")))
    out["paths"] = n_blocks * _hp.PATHS_PER_BLOCK
    return out


# ---------------------------------------------------------------------------
# SLV: the fused stochastic-local-vol kernel under shard_map (the particle
# calibration runs once on any device; only the replay fans out)
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("kind", "n_steps", "n_blocks",
                                             "cp", "sampler", "lr", "mesh"))
def _sharded_slv_launch(seed, params, *, kind, n_steps, n_blocks, cp,
                        sampler, lr, mesh):
    names, n_dev = _mesh_axes(mesh)
    bpd = n_blocks // n_dev
    n_out = ((9 if kind.startswith("lookback")
              else (8 if kind.endswith("_hit") else 7)) if lr else 2)

    def local(seed_s, params_rep):
        d = _device_linear_index(mesh, names)
        seed_vec = jnp.stack([seed_s.astype(jnp.int32), d * bpd])
        outs = _slv._launch(seed_vec, params_rep, kind=kind,
                            n_steps=n_steps, n_blocks=bpd, cp=cp,
                            sampler=sampler, lr=lr)
        return tuple(jax.lax.psum(o, names) for o in outs)

    fn = shard_map(local, mesh=mesh, in_specs=(P(), P()),
                   out_specs=(P(),) * n_out, check_vma=False)
    return fn(seed, params)


def sharded_slv_price(pricer, kind: str, strike, mesh: Mesh,
                      cp: float = 1.0, barrier: float = 0.0,
                      n_paths: int = 1_000_000, seed: int = 0,
                      sampler: str = "prng", lower: float = 0.0,
                      upper: float = 0.0):
    """``ops/slv_pallas.SLVKernelPricer.price`` — exotics under
    Heston-x-Dupire-leverage dynamics — with path blocks sharded over
    ``mesh`` (global-block ownership: the same topology-invariant path
    set as every kernel family here). ``pricer`` is a calibrated
    :class:`~..ops.slv_pallas.SLVKernelPricer`; the leverage table rides
    replicated in SMEM. Returns (price, stderr, actual_paths)."""
    if sampler not in ("prng", "hash"):
        raise ValidationError("SLV kernel samplers are prng|hash")
    p = pricer._params_vec(kind, strike, barrier, lower, upper)
    _names, n_dev = _mesh_axes(mesh)
    n_blocks = _round_blocks(n_paths, _slv.PATHS_PER_BLOCK, n_dev)
    pay, pay2 = _sharded_slv_launch(
        jnp.asarray(seed, jnp.int32), jnp.asarray(p, jnp.float32),
        kind=kind, n_steps=pricer.n_steps, n_blocks=n_blocks, cp=float(cp),
        sampler=sampler, lr=False, mesh=mesh)
    df = (1.0 if kind.endswith("_hit")
          else math.exp(-pricer.rate * pricer.t_total))
    return _ep._mean_stderr(pay, pay2, n_blocks * _slv.PATHS_PER_BLOCK, df)


def sharded_slv_greeks(pricer, kind: str, strike, mesh: Mesh,
                       cp: float = 1.0, barrier: float = 0.0,
                       n_paths: int = 1_000_000, seed: int = 0,
                       sampler: str = "prng", lower: float = 0.0,
                       upper: float = 0.0) -> dict:
    """``SLVKernelPricer.greeks`` (sticky-strike LR delta/gamma +
    frozen-leverage v0-vega/rho, one pass) sharded over ``mesh``: the 7
    (9 for lookbacks) moment tiles psum over ICI and the ladder is
    assembled once host-side — identical estimate to the single-device
    launch on the same global path set."""
    if sampler not in ("prng", "hash"):
        raise ValidationError("LR scores assume iid normals; SLV kernel "
                              "samplers are prng|hash")
    if pricer.mixing * float(pricer.params.sigma) < 1e-3:
        raise ValidationError("LR v0 score diverges at mixing ~ 0 — use "
                              "sharded_local_vol_greeks instead")
    p = pricer._params_vec(kind, strike, barrier, lower, upper)
    _names, n_dev = _mesh_axes(mesh)
    n_blocks = _round_blocks(n_paths, _slv.PATHS_PER_BLOCK, n_dev)
    outs = _sharded_slv_launch(
        jnp.asarray(seed, jnp.int32), jnp.asarray(p, jnp.float32),
        kind=kind, n_steps=pricer.n_steps, n_blocks=n_blocks, cp=float(cp),
        sampler=sampler, lr=True, mesh=mesh)
    return pricer._combine_lr(outs, n_blocks * _slv.PATHS_PER_BLOCK, kind)
