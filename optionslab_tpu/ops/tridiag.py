"""Batched tridiagonal solve (Thomas algorithm) as a `lax.scan`.

TPU-native replacement for the reference's `scipy.linalg.solve_banded`
(``src/pricing_models/fdm_solver.py:158``): jit/vmap/AD-compatible, so a
whole book of PDE solves runs as one batched kernel and gradients flow
through the solver for AD Greeks.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def tridiag_solve(lower, diag, upper, rhs):
    """Solve T x = rhs where T has diagonals (lower, diag, upper).

    Shapes: all (..., n); ``lower[..., 0]`` and ``upper[..., n-1]`` are
    ignored. The leading axes batch via broadcasting. Forward elimination
    and back substitution are scans along the last axis.
    """
    n = diag.shape[-1]
    lower, diag, upper, rhs = jnp.broadcast_arrays(lower, diag, upper, rhs)

    # move the system axis to the front for scan
    def fwd(carry, inp):
        c_prev, d_prev = carry
        a, b, c, d = inp
        denom = b - a * c_prev
        denom = jnp.where(jnp.abs(denom) < 1e-30, jnp.sign(denom) * 1e-30 + 1e-30, denom)
        c_new = c / denom
        d_new = (d - a * d_prev) / denom
        return (c_new, d_new), (c_new, d_new)

    a_t = jnp.moveaxis(lower, -1, 0)
    b_t = jnp.moveaxis(diag, -1, 0)
    c_t = jnp.moveaxis(upper, -1, 0)
    d_t = jnp.moveaxis(rhs, -1, 0)
    zeros = jnp.zeros_like(b_t[0])
    (_, _), (c_prime, d_prime) = lax.scan(fwd, (zeros, zeros), (a_t, b_t, c_t, d_t))

    def back(x_next, inp):
        c_p, d_p = inp
        x = d_p - c_p * x_next
        return x, x

    _, xs_rev = lax.scan(back, zeros, (c_prime[::-1], d_prime[::-1]))
    x = xs_rev[::-1]
    del n
    return jnp.moveaxis(x, 0, -1)
