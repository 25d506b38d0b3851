"""Core data types: the contract batch pytree shared by every pricer.

Design (SURVEY.md §7 invariant #1): the reference unifies everything behind a
scalar protocol ``price(S, K, T, r, sigma, option_type, q)``
(``src/greeks/unified_greeks.py:45``). The TPU-native version makes that
protocol a *pytree of arrays → array* so a whole book prices in one
``jit``/``vmap``/``pjit`` launch, and AD flows through every field.

``cp`` encodes the option type as +1.0 (call) / -1.0 (put) so call/put is a
data axis, not a Python branch — every pricer stays trace-once, fully
vectorized over mixed books.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .utils.config import DEFAULT_DTYPE
from .utils.validation import check_option_type


def _cp_array(option_type: Any, dtype) -> jnp.ndarray:
    """Normalize option_type ('call'/'put'/±1/array of ±1) to a ±1 array."""
    if isinstance(option_type, str):
        return jnp.asarray(float(check_option_type(option_type)), dtype=dtype)
    if isinstance(option_type, (list, tuple)) and option_type and isinstance(option_type[0], str):
        return jnp.asarray([float(check_option_type(t)) for t in option_type], dtype=dtype)
    return jnp.asarray(option_type, dtype=dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ContractBatch:
    """A batch of vanilla option contracts as a pytree of broadcastable arrays.

    Fields may be scalars or arrays; :meth:`broadcast` expands all to one
    common shape. ``cp`` is +1 for calls, -1 for puts.
    """

    spot: jnp.ndarray
    strike: jnp.ndarray
    maturity: jnp.ndarray
    rate: jnp.ndarray
    vol: jnp.ndarray
    dividend: jnp.ndarray
    cp: jnp.ndarray

    # -- constructors -------------------------------------------------------
    @classmethod
    def make(
        cls,
        spot,
        strike,
        maturity,
        rate,
        vol,
        option_type="call",
        dividend=0.0,
        dtype=None,
    ) -> "ContractBatch":
        dtype = dtype or DEFAULT_DTYPE
        return cls(
            spot=jnp.asarray(spot, dtype=dtype),
            strike=jnp.asarray(strike, dtype=dtype),
            maturity=jnp.asarray(maturity, dtype=dtype),
            rate=jnp.asarray(rate, dtype=dtype),
            vol=jnp.asarray(vol, dtype=dtype),
            dividend=jnp.asarray(dividend, dtype=dtype),
            cp=_cp_array(option_type, dtype),
        )

    @classmethod
    def single(cls, S, K, T, r, sigma, option_type="call", q=0.0, dtype=None):
        """One contract from scalars — the reference's scalar signature."""
        return cls.make(S, K, T, r, sigma, option_type, q, dtype)

    # -- structure ----------------------------------------------------------
    def broadcast(self) -> "ContractBatch":
        fields = [self.spot, self.strike, self.maturity, self.rate, self.vol, self.dividend, self.cp]
        shape = jnp.broadcast_shapes(*(jnp.shape(f) for f in fields))
        return ContractBatch(*(jnp.broadcast_to(f, shape) for f in fields))

    @property
    def shape(self) -> tuple:
        return jnp.broadcast_shapes(
            *(jnp.shape(f) for f in (self.spot, self.strike, self.maturity, self.rate, self.vol, self.dividend, self.cp))
        )

    @property
    def size(self) -> int:
        return int(np.prod(self.shape, dtype=np.int64)) if self.shape else 1

    @property
    def dtype(self):
        return jnp.result_type(self.spot, self.strike, self.vol)

    def astype(self, dtype) -> "ContractBatch":
        return jax.tree.map(lambda x: jnp.asarray(x, dtype=dtype), self)

    def replace(self, **kwargs) -> "ContractBatch":
        return dataclasses.replace(self, **{k: jnp.asarray(v, dtype=self.dtype) for k, v in kwargs.items()})

    # -- payoff helpers ------------------------------------------------------
    def intrinsic(self, underlying=None) -> jnp.ndarray:
        """cp * (S - K) clipped at 0; optionally against a simulated underlying.

        If ``underlying`` carries extra trailing axes (e.g. a path axis of
        shape ``batch.shape + (n_paths,)``), contract fields are unsqueezed
        on the right to align.
        """
        if underlying is None:
            return jnp.maximum(self.cp * (self.spot - self.strike), 0.0)
        cp, strike = self.cp, self.strike
        extra = jnp.ndim(underlying) - len(self.shape)
        for _ in range(max(extra, 0)):
            cp = cp[..., None]
            strike = strike[..., None]
        return jnp.maximum(cp * (underlying - strike), 0.0)

    def discount(self) -> jnp.ndarray:
        return jnp.exp(-self.rate * self.maturity)

    def forward(self) -> jnp.ndarray:
        return self.spot * jnp.exp((self.rate - self.dividend) * self.maturity)
