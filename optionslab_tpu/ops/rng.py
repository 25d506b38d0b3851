"""RNG and quasi-random sequence generation, TPU-native.

Design (SURVEY.md §7 invariant "seeds are data"): the reference threads
integer seeds through NumPy/Numba generators (``gbm_numba.py:86`` reseeds per
path inside ``prange`` — a hack this design makes unnecessary). Here all
randomness is counter-based: ``jax.random`` threefry keys split by *global*
path-block index, so results are bit-identical regardless of how the path
axis is sharded across devices.

QMC (reference: ``src/simulation/gbm_qmc.py``) is provided as:
  * Sobol (direction numbers from the first 64 Joe–Kuo D6 dimensions,
    generated programmatically below) with optional random digit scrambling;
  * Halton with random shift for arbitrary dimension counts.
Both are pure-JAX bit manipulations — jit/vmap/shard-able.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .math import norm_ppf

# ---------------------------------------------------------------------------
# Sobol direction numbers — first 64 dimensions of the Joe–Kuo D6 table.
# Stored as (s, a, m...) per dimension; dimension 0 is the van der Corput
# sequence. This is table data (public, Joe & Kuo 2008), not reference code.
# ---------------------------------------------------------------------------
_JOE_KUO = [
    # (s, a, [m_1..m_s])
    (1, 0, [1]),
    (2, 1, [1, 3]),
    (3, 1, [1, 3, 1]),
    (3, 2, [1, 1, 1]),
    (4, 1, [1, 1, 3, 3]),
    (4, 4, [1, 3, 5, 13]),
    (5, 2, [1, 1, 5, 5, 17]),
    (5, 4, [1, 1, 5, 5, 5]),
    (5, 7, [1, 1, 7, 11, 19]),
    (5, 11, [1, 1, 5, 1, 1]),
    (5, 13, [1, 1, 1, 3, 11]),
    (5, 14, [1, 3, 5, 5, 31]),
    (6, 1, [1, 3, 3, 9, 7, 49]),
    (6, 13, [1, 1, 1, 15, 21, 21]),
    (6, 16, [1, 3, 1, 13, 27, 49]),
    (6, 19, [1, 1, 1, 15, 7, 5]),
    (6, 22, [1, 3, 1, 15, 13, 25]),
    (6, 25, [1, 1, 5, 5, 19, 61]),
    (7, 1, [1, 3, 7, 11, 23, 15, 103]),
    (7, 4, [1, 3, 7, 13, 13, 15, 69]),
    (7, 7, [1, 1, 3, 13, 7, 35, 63]),
    (7, 8, [1, 3, 5, 9, 1, 25, 53]),
    (7, 14, [1, 3, 1, 13, 9, 35, 107]),
    (7, 19, [1, 3, 1, 5, 27, 61, 31]),
    (7, 21, [1, 1, 5, 11, 19, 41, 61]),
    (7, 28, [1, 3, 5, 3, 3, 13, 69]),
    (7, 31, [1, 1, 7, 13, 1, 19, 1]),
    (7, 32, [1, 3, 7, 5, 13, 19, 59]),
    (7, 37, [1, 1, 3, 9, 25, 29, 41]),
    (7, 41, [1, 3, 5, 13, 23, 1, 55]),
    (7, 42, [1, 3, 7, 3, 13, 59, 17]),
    (7, 50, [1, 3, 1, 3, 5, 53, 69]),
    (7, 55, [1, 1, 5, 5, 23, 33, 13]),
    (7, 56, [1, 1, 7, 7, 1, 61, 123]),
    (7, 59, [1, 1, 7, 9, 13, 61, 49]),
    (7, 62, [1, 3, 3, 5, 3, 55, 33]),
    (8, 14, [1, 3, 1, 15, 31, 13, 49, 245]),
    (8, 21, [1, 3, 5, 15, 31, 59, 76, 125]),
    (8, 22, [1, 1, 7, 11, 11, 29, 51, 97]),
    (8, 38, [1, 3, 3, 13, 19, 23, 45, 41]),
    (8, 47, [1, 1, 3, 5, 13, 21, 69, 45]),
    (8, 49, [1, 3, 7, 15, 19, 49, 23, 95]),
    (8, 50, [1, 3, 7, 13, 9, 25, 23, 11]),
    (8, 52, [1, 1, 3, 13, 13, 11, 109, 63]),
    (8, 56, [1, 3, 7, 9, 21, 37, 5, 107]),
    (8, 67, [1, 1, 1, 1, 21, 33, 27, 35]),
    (8, 70, [1, 1, 1, 9, 5, 43, 87, 205]),
    (8, 84, [1, 1, 5, 5, 5, 43, 113, 187]),
    (8, 97, [1, 3, 3, 5, 17, 29, 59, 103]),
    (8, 103, [1, 1, 7, 3, 25, 17, 53, 179]),
    (8, 115, [1, 3, 1, 1, 9, 23, 57, 95]),
    (8, 122, [1, 1, 1, 13, 13, 35, 119, 245]),
    (9, 8, [1, 3, 3, 9, 3, 9, 95, 11, 311]),
    (9, 13, [1, 1, 5, 3, 29, 49, 51, 205, 175]),
    (9, 16, [1, 3, 7, 3, 21, 5, 79, 61, 277]),
    (9, 22, [1, 3, 3, 3, 9, 25, 29, 157, 33]),
    (9, 25, [1, 1, 5, 15, 11, 9, 111, 221, 411]),
    (9, 44, [1, 1, 7, 11, 3, 37, 99, 233, 219]),
    (9, 47, [1, 3, 5, 9, 7, 43, 99, 77, 311]),
    (9, 52, [1, 3, 1, 11, 27, 53, 73, 67, 461]),
    (9, 55, [1, 1, 7, 15, 25, 51, 1, 65, 53]),
    (9, 59, [1, 3, 3, 1, 25, 61, 39, 27, 365]),
    (9, 62, [1, 3, 7, 5, 7, 39, 63, 197, 181]),
    (9, 67, [1, 1, 3, 7, 27, 59, 113, 153, 129]),
]

MAX_SOBOL_DIM = len(_JOE_KUO) + 1  # +1 for the van der Corput dim 0
_SOBOL_BITS = 30


@functools.lru_cache(maxsize=1)
def _direction_matrix() -> np.ndarray:
    """(MAX_SOBOL_DIM, 30) uint32 direction numbers V[d][k]."""
    V = np.zeros((MAX_SOBOL_DIM, _SOBOL_BITS), dtype=np.uint32)
    # dimension 0: van der Corput, V[k] = 1 << (bits-1-k)
    for k in range(_SOBOL_BITS):
        V[0, k] = 1 << (_SOBOL_BITS - 1 - k)
    for d, (s, a, m) in enumerate(_JOE_KUO, start=1):
        v = np.zeros(_SOBOL_BITS, dtype=np.uint64)
        for k in range(min(s, _SOBOL_BITS)):
            v[k] = np.uint64(m[k]) << np.uint64(_SOBOL_BITS - 1 - k)
        for k in range(s, _SOBOL_BITS):
            vk = v[k - s] ^ (v[k - s] >> np.uint64(s))
            for j in range(1, s):
                if (a >> (s - 1 - j)) & 1:
                    vk ^= v[k - j]
            v[k] = vk
        V[d] = v.astype(np.uint32)
    return V


def sobol_sequence(n: int, dim: int, *, scramble_key=None, skip: int = 0, dtype=jnp.float32):
    """First ``n`` points (after ``skip``) of the ``dim``-D Sobol sequence.

    Gray-code construction as a single XLA gather+XOR-reduction: point i's
    integer coordinate is XOR of direction numbers at the set bits of
    gray(i). Optionally applies random digit scrambling (XOR by a random
    integer per dimension — a random digital shift, preserving the (t,m,s)
    net structure) keyed by ``scramble_key``.
    """
    if dim > MAX_SOBOL_DIM:
        raise ValueError(
            f"sobol_sequence supports up to {MAX_SOBOL_DIM} dims; use halton_sequence for more"
        )
    V = jnp.asarray(_direction_matrix()[:dim], dtype=jnp.uint32)  # (dim, 30)
    i = jnp.arange(skip + 1, skip + n + 1, dtype=jnp.uint32)  # skip point 0 (=origin)
    gray = i ^ (i >> 1)
    bits = (gray[:, None] >> jnp.arange(_SOBOL_BITS, dtype=jnp.uint32)[None, :]) & 1  # (n, 30)
    # XOR-accumulate V[d,k] where bit k of gray(i) is set
    masked = bits[:, None, :] * V[None, :, :]  # (n, dim, 30)
    x = masked[..., 0]
    for k in range(1, _SOBOL_BITS):
        x = x ^ masked[..., k]
    if scramble_key is not None:
        shift = jax.random.bits(scramble_key, (dim,), dtype=jnp.uint32) >> (32 - _SOBOL_BITS)
        x = x ^ shift[None, :]
    scale = jnp.asarray(1.0 / (1 << _SOBOL_BITS), dtype=dtype)
    return (x.astype(dtype) + 0.5) * scale


_PRIMES = np.array(
    [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, 67, 71,
     73, 79, 83, 89, 97, 101, 103, 107, 109, 113, 127, 131, 137, 139, 149, 151,
     157, 163, 167, 173, 179, 181, 191, 193, 197, 199, 211, 223, 227, 229, 233,
     239, 241, 251, 257, 263, 269, 271, 277, 281, 283, 293, 307, 311, 313, 317,
     331, 337, 347, 349, 353, 359, 367, 373, 379, 383, 389, 397, 401, 409, 419,
     421, 431, 433, 439, 443, 449, 457, 461, 463, 467, 479, 487, 491, 499, 503,
     509, 521, 523, 541], dtype=np.int64)


def halton_sequence(n: int, dim: int, *, shift_key=None, skip: int = 0, dtype=jnp.float32):
    """Randomized-shift Halton sequence for dims beyond the Sobol table."""
    if dim > len(_PRIMES):
        raise ValueError(f"halton_sequence supports up to {len(_PRIMES)} dims")
    idx = jnp.arange(skip + 1, skip + n + 1, dtype=jnp.int64)
    cols = []
    for d in range(dim):
        b = int(_PRIMES[d])
        i = idx
        f = jnp.zeros(n, dtype=jnp.float64 if dtype == jnp.float64 else jnp.float32)
        base_inv = 1.0 / b
        # enough digits to cover skip+n in base b
        ndigits = int(np.ceil(np.log(skip + n + 1) / np.log(b))) + 1
        for _ in range(ndigits):
            f = f + (i % b).astype(f.dtype) * base_inv
            i = i // b
            base_inv /= b
        cols.append(f)
    u = jnp.stack(cols, axis=1).astype(dtype)
    if shift_key is not None:
        shift = jax.random.uniform(shift_key, (dim,), dtype=dtype)
        u = jnp.mod(u + shift[None, :], 1.0)
    # keep strictly inside (0,1) for norm_ppf
    tiny = jnp.asarray(1e-7, dtype)
    return jnp.clip(u, tiny, 1.0 - tiny)


def qmc_normals(n: int, dim: int, *, key=None, engine: str = "sobol", skip: int = 0, dtype=jnp.float32):
    """Low-discrepancy standard normals via inverse CDF (reference:
    ``gbm_qmc.py:14`` Sobol → norm.ppf)."""
    if engine == "sobol" and dim <= MAX_SOBOL_DIM:
        u = sobol_sequence(n, dim, scramble_key=key, skip=skip, dtype=dtype)
    else:
        u = halton_sequence(n, dim, shift_key=key, skip=skip, dtype=dtype)
    tiny = jnp.asarray(2e-8, dtype)
    return norm_ppf(jnp.clip(u, tiny, 1.0 - tiny)).astype(dtype)


def antithetic_normals(key, n: int, *, dtype=jnp.float32):
    """n standard normals where the second half mirrors the first (n even)."""
    half = n // 2
    z = jax.random.normal(key, (half,), dtype=dtype)
    return jnp.concatenate([z, -z])
