"""SE(3) helpers over (R, T) pairs.

The filter stores poses as separate rotation matrices and translation
vectors (a pytree of arrays), never as 4x4 homogeneous matrices: all
compositions are batched 3x3 matmuls + adds, which XLA fuses well.
Replaces Sophus SE3 usage in the reference.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import so3


class SE3(NamedTuple):
    R: jnp.ndarray  # (..., 3, 3)
    T: jnp.ndarray  # (..., 3)

    def __mul__(self, other: "SE3") -> "SE3":
        return SE3(self.R @ other.R,
                   jnp.einsum("...ij,...j->...i", self.R, other.T) + self.T)

    def inverse(self) -> "SE3":
        Rt = jnp.swapaxes(self.R, -1, -2)
        return SE3(Rt, -jnp.einsum("...ij,...j->...i", Rt, self.T))

    def act(self, X):
        """Apply to points X (..., 3)."""
        return jnp.einsum("...ij,...j->...i", self.R, X) + self.T


def identity(dtype=jnp.float32) -> SE3:
    return SE3(jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype=dtype))
