"""Device-mesh utilities.

The reference has no distributed runtime (SURVEY.md §2.11: single process,
Numba threads, optional single GPU). The TPU-native scaling story replaces
all of that with one abstraction: a ``jax.sharding.Mesh`` whose axes are

  * ``"book"``  — contracts / data parallel (each device prices a slice of
    the book, or trains on a slice of the quote batch);
  * ``"paths"`` — Monte Carlo sample parallel (each device simulates a
    disjoint path range; payoff moments combine with ``psum`` over ICI).

Both axes ride ICI on a real pod slice; on CPU (tests/dryrun) they map to
virtual host devices.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BOOK_AXIS = "book"
PATH_AXIS = "paths"


def make_mesh(n_devices: int | None = None, book: int = 1, devices=None) -> Mesh:
    """A (book, paths) mesh over the first ``n_devices`` devices.

    ``book`` devices are assigned to the contract axis, the rest to the path
    axis (``n_devices`` must be divisible by ``book``).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    if n % book:
        raise ValueError(f"n_devices={n} not divisible by book={book}")
    grid = np.asarray(devices[:n]).reshape(book, n // book)
    return Mesh(grid, (BOOK_AXIS, PATH_AXIS))


def path_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a (paths, ...) array: paths split over the path axis."""
    return NamedSharding(mesh, P(PATH_AXIS))


def book_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a (contracts, ...) array: contracts over the book axis."""
    return NamedSharding(mesh, P(BOOK_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
