"""Statistics of batches of rank-one tensors, computed without densifying.

A rank-one tensor T = v₁ ⊗ v₂ ⊗ … ⊗ v_F is stored as its factor matrix; a
*batch* of them is one array with a factors dimension and a coordinates
dimension. All statistics use the product identities

    sum(T)   = ∏_f sum(v_f)          ‖T‖²_F = ∏_f ‖v_f‖²

so nothing of size Q^F is ever materialized. Everything is pure jnp (runs on
VPU, fuses under jit) and differentiable.

Capability parity: reference ``dctn/rank_one_tensor.py`` (RankOneTensorsBatch
and all its statistics, including the var/std-over-batch identities at
rank_one_tensor.py:94-110).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class RankOneTensorsBatch:
    """Batch of rank-one tensors stored as factors.

    For every combination of indices over the dims other than ``factors_dim``
    and ``coordinates_dim``, the remaining 2-D slice holds the factors of one
    rank-one tensor as its fibers.
    """

    def __init__(self, array, factors_dim: int, coordinates_dim: int):
        if factors_dim == coordinates_dim:
            raise ValueError("factors_dim must differ from coordinates_dim")
        if not (0 <= factors_dim < array.ndim and 0 <= coordinates_dim < array.ndim):
            raise ValueError("dims out of range")
        self.array = array
        self.factors_dim = factors_dim
        self.coordinates_dim = coordinates_dim

    # pytree protocol: the array is a leaf, the dims are static metadata
    def tree_flatten(self):
        return (self.array,), (self.factors_dim, self.coordinates_dim)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    @property
    def batch_shape(self) -> Tuple[int, ...]:
        return tuple(
            s
            for i, s in enumerate(self.array.shape)
            if i not in (self.factors_dim, self.coordinates_dim)
        )

    @property
    def ncoordinates(self) -> int:
        """Number of elements in ONE dense tensor of the batch."""
        return self.array.shape[self.coordinates_dim] ** self.array.shape[self.factors_dim]

    @property
    def ntensors(self) -> int:
        return math.prod(self.batch_shape)

    def _squeeze_both(self, result):
        hi = max(self.factors_dim, self.coordinates_dim)
        lo = min(self.factors_dim, self.coordinates_dim)
        return jnp.squeeze(jnp.squeeze(result, hi), lo)

    def sum_per_tensor(self):
        return self._squeeze_both(
            jnp.prod(
                jnp.sum(self.array, axis=self.coordinates_dim, keepdims=True),
                axis=self.factors_dim,
                keepdims=True,
            )
        )

    def sum_over_batch(self):
        return jnp.sum(self.sum_per_tensor())

    def mean_per_tensor(self):
        # ncoordinates is a (possibly huge, e.g. 2^16) static Python int —
        # convert to float so it never hits int32 tracing limits
        return self.sum_per_tensor() / float(self.ncoordinates)

    def mean_over_batch(self):
        return self.sum_over_batch() / float(self.ntensors * self.ncoordinates)

    def squared_fro_norm_per_tensor(self):
        return self._squeeze_both(
            jnp.prod(
                jnp.sum(self.array**2, axis=self.coordinates_dim, keepdims=True),
                axis=self.factors_dim,
                keepdims=True,
            )
        )

    def squared_fro_norm_over_batch(self):
        return jnp.sum(self.squared_fro_norm_per_tensor())

    def var_over_batch(self, unbiased: bool = True):
        """Variance over the implied dense batch via the sum/norm identities."""
        total = self.sum_over_batch()
        mean = self.mean_over_batch()
        nelement = float(self.ntensors * self.ncoordinates)
        divisor = nelement - 1.0 if unbiased else nelement
        return (
            self.squared_fro_norm_over_batch() / divisor
            - 2 * total / divisor * mean
            + nelement / divisor * mean**2
        )

    def std_over_batch(self, unbiased: bool = True):
        return self.var_over_batch(unbiased) ** 0.5
