"""Distributed Cholesky + triangular solve over a 1-D device mesh.

The missing scale axis from ROADMAP: `reduced_likelihood_rowsharded`
distributes the O(n^2 d) Gram build, but XLA gathers the factorization onto
one device (n^3/3 flops + an (n, n) buffer in one HBM). Here the
factorization itself is distributed with `shard_map`: each device owns a
contiguous block of rows, panels are factorized left-looking, and the
trailing GEMM updates — ALL the O(n^3) work — run data-parallel on the row
shards (the multi-device upgrade of ops/block_linalg.blocked_cholesky, whose
single-device form was measured GEMM-bound on the MXU).

Communication per panel k: one psum broadcast of the owner's previous
columns (b x kb) + the b x b panel factor — sum(k) ~ n^2/2 elements total,
riding ICI. Device d idles for panels k > d (block-column layout); a
block-cyclic layout would balance this and is noted as the next refinement.
The reference has no distributed factorization at all (single-process
LAPACK potrf, crates/gp/src/algorithm.rs:988-1056).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def _axis(mesh: Mesh) -> str:
    return mesh.axis_names[0]


def cholesky_rowsharded(mesh: Mesh, r: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky of an (n, n) SPD matrix with rows sharded over the
    mesh; returns L with the same row sharding. n must be divisible by the
    mesh size. All O(n^3) trailing updates are local GEMMs on the shards."""
    n = r.shape[0]
    ax = _axis(mesh)
    n_dev = mesh.devices.size
    if n % n_dev != 0:
        raise ValueError(f"n={n} must be divisible by mesh size {n_dev}")
    b = n // n_dev
    dtype = r.dtype

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=P(ax, None),
        out_specs=P(ax, None),
    )
    def factor(r_local):  # (b, n) rows owned by this device
        idx = lax.axis_index(ax)
        l_local = jnp.zeros((b, n), dtype)
        for k in range(n_dev):
            mine = idx == k
            # left-looking update of panel k restricted to my rows:
            #   S = R[:, kb:(k+1)b] - L[:, :kb] @ L[panel k rows, :kb]^T
            if k:
                top = lax.psum(
                    jnp.where(mine, l_local[:, : k * b], 0.0), ax
                )  # (b, kb): owner's previous columns, broadcast
                a_col = r_local[:, k * b:(k + 1) * b] - l_local[
                    :, : k * b
                ] @ top.T
            else:
                a_col = r_local[:, :b]
            # the owner's rows ARE the diagonal block (contiguous sharding)
            lkk = jnp.linalg.cholesky(a_col)
            lkk = lax.psum(jnp.where(mine, jnp.tril(lkk), 0.0), ax)
            below = solve_triangular(lkk, a_col.T, lower=True).T
            piece = jnp.where(
                mine,
                jnp.tril(jnp.where(jnp.isfinite(lkk), lkk, 0.0)),
                jnp.where(idx > k, below, 0.0),
            )
            l_local = l_local.at[:, k * b:(k + 1) * b].set(piece)
        return l_local

    return factor(r)


def solve_lower_rowsharded(
    mesh: Mesh, l: jnp.ndarray, rhs: jnp.ndarray
) -> jnp.ndarray:
    """Forward substitution L X = B with L (n, n) and B (n, p) row-sharded:
    block forward-substitution where each panel's solved block is broadcast
    and eliminated from the remaining rows by local GEMMs."""
    n = l.shape[0]
    ax = _axis(mesh)
    n_dev = mesh.devices.size
    if n % n_dev != 0:
        raise ValueError(f"n={n} must be divisible by mesh size {n_dev}")
    b = n // n_dev
    p = rhs.shape[1]
    dtype = l.dtype

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(ax, None), P(ax, None)),
        out_specs=P(ax, None),
    )
    def fsolve(l_local, b_local):  # (b, n), (b, p)
        idx = lax.axis_index(ax)
        x_local = jnp.zeros((b, p), dtype)
        resid = b_local
        for k in range(n_dev):
            mine = idx == k
            # owner solves its b x b diagonal system against its residual
            diag = l_local[:, k * b:(k + 1) * b]
            xk = solve_triangular(diag, resid, lower=True)
            xk = lax.psum(jnp.where(mine, xk, 0.0), ax)  # broadcast (b, p)
            x_local = jnp.where(mine, xk, x_local)
            # eliminate from rows below: resid -= L[:, panel k] @ xk
            resid = resid - jnp.where(
                idx > k, l_local[:, k * b:(k + 1) * b] @ xk, 0.0
            )
        return x_local

    return fsolve(l, rhs)


def reduced_likelihood_distributed(
    mesh: Mesh,
    x: jnp.ndarray,  # (n, nx)
    y: jnp.ndarray,  # (n,) or (n, 1)
    theta: jnp.ndarray,
    *,
    corr: str = "squared_exponential",
    trend: str = "constant",
    nugget: float | None = None,
):
    """Fully distributed exact reduced likelihood: row-sharded Gram build
    (local O(n^2 d / D) per device), distributed Cholesky, distributed
    forward solves, and psum reductions for logdet / GLS — no step
    materializes an (n, n) buffer on a single device. This is the n >= 50k
    path (ROADMAP "shard_map'd likelihood: row-sharded Gram +
    distributed Cholesky over ICI"); behavioral parity with the
    single-device reduced_likelihood (gp/likelihood.py, itself mirroring
    crates/gp/src/algorithm.rs:988-1056).

    n must be divisible by the mesh size (pad with masked rows upstream if
    needed — here we require exact divisibility and full activity for
    simplicity of the demonstration path).
    """
    from ..gp.kernels import corr_cross
    from ..gp.trends import trend_basis

    ax = _axis(mesh)
    x = jnp.atleast_2d(x)
    dtype = x.dtype
    y = jnp.asarray(y, dtype=dtype)
    if y.ndim == 1:
        y = y[:, None]
    n = x.shape[0]
    if nugget is None:
        nugget = 100.0 * float(jnp.finfo(dtype).eps)

    # normalization (replicated scalars)
    x_mean, x_std = jnp.mean(x, axis=0), jnp.std(x, axis=0, ddof=1)
    x_std = jnp.where(x_std <= 0, 1.0, x_std)
    y_mean, y_std = jnp.mean(y, axis=0), jnp.std(y, axis=0, ddof=1)
    y_std = jnp.where(y_std <= 0, 1.0, y_std)
    x_norm = (x - x_mean) / x_std
    y_norm = (y - y_mean) / y_std

    x_sh = jax.device_put(x_norm, NamedSharding(mesh, P(ax, None)))
    x_rep = jax.device_put(x_norm, NamedSharding(mesh, P()))
    theta = jax.device_put(theta, NamedSharding(mesh, P()))

    # row-sharded regularized Gram: R = corr(x_sh, x_rep) with unit
    # diagonal + Gershgorin-scaled jitter (parity with likelihood._build_r)
    r = corr_cross(corr, x_sh, x_rep, theta, None)
    eye = jnp.eye(n, dtype=dtype)
    r = r * (1.0 - eye) + eye
    row_max = lax.stop_gradient(jnp.max(jnp.sum(jnp.abs(r), axis=1)))
    r = r + eye * (nugget * jnp.maximum(row_max, 1.0))

    l_sh = cholesky_rowsharded(mesh, r)

    fx = trend_basis(trend, x_norm)
    rhs = jnp.concatenate([fx, y_norm], axis=1)  # (n, p + 1)
    sol = solve_lower_rowsharded(mesh, l_sh, rhs)
    ft, yt = sol[:, :-1], sol[:, -1:]

    # GLS via the tiny (p, p) Gram (parity with reduced_likelihood)
    gram = ft.T @ ft
    c = jnp.linalg.cholesky(gram)
    beta = solve_triangular(
        c.T, solve_triangular(c, ft.T @ yt, lower=True), lower=False
    )
    rho = yt - ft @ beta
    sigma2 = jnp.sum(rho**2) / n

    diag = jnp.diagonal(l_sh)
    logdet = 2.0 * jnp.sum(jnp.log10(diag)) / n
    return -n * (jnp.log10(sigma2) + logdet)
