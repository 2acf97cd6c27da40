"""Pairwise distance helpers (ref: crates/doe/src/utils.rs:9-53).

The reference parallelizes these with rayon; on TPU they are single fused
XLA computations (VPU elementwise + MXU for the inner products).
"""

from __future__ import annotations

import jax.numpy as jnp


def cdist_sq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Squared L2 cross-distances, (na, nb). MXU-friendly: uses the
    ||a-b||^2 = ||a||^2 + ||b||^2 - 2 a.b expansion."""
    a2 = jnp.sum(a * a, axis=1)[:, None]
    b2 = jnp.sum(b * b, axis=1)[None, :]
    sq = a2 + b2 - 2.0 * (a @ b.T)
    return jnp.maximum(sq, 0.0)


def cdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """L2 cross-distances, (na, nb)."""
    return jnp.sqrt(cdist_sq(a, b))


def pdist_sq(x: jnp.ndarray) -> jnp.ndarray:
    """Condensed squared pairwise distances, shape (n*(n-1)/2,), row-major
    upper-triangle order (matches scipy.spatial.distance.pdist order)."""
    n = x.shape[0]
    sq = cdist_sq(x, x)
    iu = jnp.triu_indices(n, k=1)
    return sq[iu]


def pdist(x: jnp.ndarray) -> jnp.ndarray:
    """Condensed pairwise L2 distances, shape (n*(n-1)/2,)."""
    return jnp.sqrt(pdist_sq(x))


def min_pdist_sq(x: jnp.ndarray) -> jnp.ndarray:
    """Minimum pairwise squared distance (scalar), computed without
    materializing the condensed vector twice."""
    n = x.shape[0]
    sq = cdist_sq(x, x)
    big = jnp.asarray(jnp.inf, dtype=sq.dtype)
    sq = sq + jnp.where(jnp.eye(n, dtype=bool), big, 0.0)
    return jnp.min(sq)
