"""Uniform random design (ref: crates/doe/src/random.rs:62-72)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import default_dtype
from .lhs import scale_to_xlimits


def random_normalized(key, ns: int, nx: int, dtype=None):
    dtype = dtype or default_dtype()
    return jax.random.uniform(key, (ns, nx), dtype=dtype)


class Random:
    """Object API mirroring egobox_doe::Random."""

    def __init__(self, xlimits, seed=None):
        self.xlimits = jnp.asarray(xlimits, dtype=default_dtype())
        if self.xlimits.ndim != 2 or self.xlimits.shape[1] != 2:
            raise ValueError("xlimits must have shape (nx, 2)")
        self._key = jax.random.key(0 if seed is None else seed)

    def normalized_sample(self, ns: int):
        self._key, sub = jax.random.split(self._key)
        return random_normalized(sub, ns, self.xlimits.shape[0],
                                 self.xlimits.dtype)

    def sample(self, ns: int):
        return scale_to_xlimits(self.normalized_sample(ns), self.xlimits)
