"""KPLS dimension reduction: PLS1 rotation weights.

The reference delegates to linfa-pls (gp/src/algorithm.rs:843-855) and uses
``rotations().0`` — the x-rotation matrix W (P^T W)^{-1} of a standardized
NIPALS PLS regression. For a single output, each NIPALS power iteration
converges in one step (w ∝ X^T y), so the whole decomposition is a short
statically-unrolled sequence of matmuls/deflations — ideal for the MXU.

On a constant-residual failure the reference returns a zero weight matrix
(algorithm.rs:848-852); we guard the same way with jnp.where.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_EPS = 1e-12


@partial(jax.jit, static_argnums=(2,))
def pls_rotations(x: jnp.ndarray, y: jnp.ndarray, n_comp: int) -> jnp.ndarray:
    """X-rotation matrix of a PLS1 regression of y (n,1) on x (n, nx).

    Returns w_star of shape (nx, n_comp): the projection used to weight
    kernel length-scales (KPLS, Bouhlel et al. 2016).
    """
    n, nx = x.shape
    xm = x.mean(axis=0)
    xs = x.std(axis=0, ddof=1)
    xs = jnp.where(xs <= 0, 1.0, xs)
    X = (x - xm) / xs
    ym = y.mean()
    ys = y.std(ddof=1)
    ys = jnp.where(ys <= 0, 1.0, ys)
    Y = ((y - ym) / ys)[:, 0]

    Ws = []
    Ps = []
    ok = jnp.asarray(True)
    for _ in range(n_comp):
        w = X.T @ Y
        nw = jnp.linalg.norm(w)
        ok = ok & (nw > _EPS)
        w = jnp.where(nw > _EPS, w / jnp.where(nw > _EPS, nw, 1.0), 0.0)
        t = X @ w
        tt = jnp.dot(t, t)
        safe_tt = jnp.where(tt > _EPS, tt, 1.0)
        p = (X.T @ t) / safe_tt
        c = jnp.dot(Y, t) / safe_tt
        X = X - t[:, None] * p[None, :]
        Y = Y - t * c
        Ws.append(w)
        Ps.append(p)

    W = jnp.stack(Ws, axis=1)  # (nx, k)
    P = jnp.stack(Ps, axis=1)
    ptw = P.T @ W  # (k, k)
    rot = jnp.linalg.solve(ptw.T, W.T).T  # W @ inv(P^T W)
    rot = jnp.where(jnp.all(jnp.isfinite(rot)) & ok, rot,
                    jnp.zeros_like(rot))
    return rot
