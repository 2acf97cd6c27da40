"""Trend (mean/regression) models: constant, linear, quadratic.

Behavioral parity with crates/gp/src/mean_models.rs (value bases; jacobians
come free via jax.jacfwd of the basis, so the reference's hand-written
jacobians are only used as test oracles).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TREND_NAMES = ("constant", "linear", "quadratic")


def trend_basis(name: str, x: jnp.ndarray) -> jnp.ndarray:
    """Regression basis F(x) for a batch ``x`` of shape (n, nx).

    - constant:  [1]                                (ref: mean_models.rs:37-53)
    - linear:    [1, x_1..x_nx]                     (ref: mean_models.rs:63-82)
    - quadratic: [1, x, {x_i x_j, j >= i}]          (ref: mean_models.rs:92-128)
    Returns (n, p).
    """
    n, nx = x.shape
    ones = jnp.ones((n, 1), dtype=x.dtype)
    if name == "constant":
        return ones
    if name == "linear":
        return jnp.concatenate([ones, x], axis=1)
    if name == "quadratic":
        parts = [ones, x]
        for k in range(nx):
            parts.append(x[:, k:] * x[:, k : k + 1])
        return jnp.concatenate(parts, axis=1)
    raise ValueError(f"unknown trend: {name}")


def n_basis(name: str, nx: int) -> int:
    if name == "constant":
        return 1
    if name == "linear":
        return 1 + nx
    if name == "quadratic":
        return 1 + nx + nx * (nx + 1) // 2
    raise ValueError(f"unknown trend: {name}")


def trend_jacobian(name: str, x1: jnp.ndarray) -> jnp.ndarray:
    """Jacobian of the basis at one point x1 (nx,) -> (p, nx)."""
    return jax.jacfwd(lambda v: trend_basis(name, v[None, :])[0])(x1)
