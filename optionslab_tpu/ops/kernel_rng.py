"""Shared in-kernel random number generation for the Pallas kernels.

Two samplers:
  * ``prng`` — the TPU hardware PRNG (`pltpu.prng_random_bits`): fastest;
    stubbed to zeros by the CPU TPU-interpreter, so off-TPU tests can't
    use it.
  * ``hash`` — counter-based murmur3-style generator built from pure
    int32 ops (logical shifts emulated portably as arithmetic-shift+mask):
    bit-identical on Mosaic and under the interpreter — the
    cross-platform-determinism / CPU-verification sampler.

Both feed Box–Muller; callers get a (z_cos, z_sin) pair per step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from ._interpret_patch import ensure_interpret_patch

# every Pallas kernel module imports this one — applying the interpreter
# deadlock fix here covers all interpret-mode (off-TPU) kernel launches
ensure_interpret_patch()

TWO_PI = 6.283185307179586
INV_2_24 = 1.0 / (1 << 24)
INV_2_25 = 1.0 / (1 << 25)


def fmix32(h):
    """murmur3 finalizer with logical shifts emulated portably on int32
    (arithmetic shift + mask == logical shift for the surviving bits)."""
    h = h ^ ((h >> 16) & jnp.int32(0x0000FFFF))
    h = h * jnp.int32(-2048144789)  # 0x85ebca6b
    h = h ^ ((h >> 13) & jnp.int32(0x0007FFFF))
    h = h * jnp.int32(-1028477387)  # 0xc2b2ae35
    h = h ^ ((h >> 16) & jnp.int32(0x0000FFFF))
    return h


def hash_uniform(counter, seed):
    """Counter-based uniform in (0,1): double murmur3 mix, 24 mantissa bits."""
    h = fmix32(counter ^ (seed * jnp.int32(-1640531535)))
    h = fmix32(h + jnp.int32(0x632BE5AB))
    bits = (h >> 8) & jnp.int32(0x00FFFFFF)
    return bits.astype(jnp.float32) * INV_2_24 + INV_2_25


def prng_uniform(shape):
    """One (0,1) uniform tile from the seeded hardware PRNG."""
    bits = (pltpu.prng_random_bits(shape) >> 8) & jnp.int32(0x00FFFFFF)
    return bits.astype(jnp.float32) * INV_2_24 + INV_2_25


def draw_uniform(sampler: str, seed, block, step, n_steps: int, shape):
    """One (0,1) uniform tile for this step, on a stream DISJOINT from
    ``draw_normals`` (hash counters are salted with a distinct constant so
    the same (block, step) never collides with the Box–Muller draws).
    Used by the Andersen-QE variance transition's exponential branch."""
    if sampler == "hash":
        rows, lanes = shape
        rid = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        cid = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        lane_id = rid * lanes + cid
        base = (block * n_steps + step) * (rows * lanes)
        return hash_uniform(base + lane_id, seed ^ jnp.int32(0x27220A95))
    return prng_uniform(shape)


def draw_normals(sampler: str, seed, block, step, n_steps: int, shape):
    """One antithetic Box–Muller draw pair (z_cos, z_sin) for this step.

    ``hash`` counters are unique per (block, step, draw, lane); callers
    using ``prng`` must have called ``pltpu.prng_seed`` per block.
    """
    if sampler == "hash":
        rows, lanes = shape
        rid = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        cid = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        lane_id = rid * lanes + cid
        base = ((block * n_steps + step) * 2) * (rows * lanes)
        u1 = hash_uniform(base + lane_id, seed)
        u2 = hash_uniform(base + rows * lanes + lane_id, seed)
    else:
        u1 = prng_uniform(shape)
        u2 = prng_uniform(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    th = TWO_PI * u2
    return r * jnp.cos(th), r * jnp.sin(th)


def draw_jump(sampler: str, seed, block, step, n_steps: int, shape):
    """(u_count, z_size) for a compound-Poisson jump step, on streams
    DISJOINT from both ``draw_normals`` and ``draw_uniform`` (distinct
    hash salts). ``u_count`` drives the inverse-CDF jump count, ``z_size``
    the N(mu_j, sigma_j^2)-sum size given the count (Bates kernels)."""
    if sampler == "hash":
        rows, lanes = shape
        rid = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        cid = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        lane_id = rid * lanes + cid
        base = ((block * n_steps + step) * 2) * (rows * lanes)
        u = hash_uniform(base + lane_id, seed ^ jnp.int32(0x11C98F2D))
        u1 = hash_uniform(base + rows * lanes + lane_id,
                          seed ^ jnp.int32(0x5BD1E995))
        u2 = hash_uniform(base + lane_id, seed ^ jnp.int32(0x5BD1E995))
    else:
        u = prng_uniform(shape)
        u1 = prng_uniform(shape)
        u2 = prng_uniform(shape)
    z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(TWO_PI * u2)
    return u, z
