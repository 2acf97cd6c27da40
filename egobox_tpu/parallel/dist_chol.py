"""Distributed Cholesky + triangular solve over a 1-D device mesh.

The missing scale axis from ROADMAP: `reduced_likelihood_rowsharded`
distributes the O(n^2 d) Gram build, but XLA gathers the factorization onto
one device (n^3/3 flops + an (n, n) buffer in one HBM). Here the
factorization itself is distributed with `shard_map`: panels are factorized
left-looking and the trailing GEMM updates — ALL the O(n^3) work — run
data-parallel on the row shards (the multi-device upgrade of
ops/block_linalg.blocked_cholesky, whose single-device form was measured
GEMM-bound on the MXU).

Layout: BLOCK-CYCLIC row ownership. The n rows are split into ``npan``
panels of ``bp`` rows; device d owns panels d, d+D, d+2D, ... so every
device keeps participating in the trailing updates until the very last
panels (the round-2 contiguous layout idled device d for all panels k > d,
halving utilization). A matrix in "feed layout" stacks each device's owned
panels in order — ``feedperm = block_cyclic_perm(n, D, bp)`` maps feed
position -> global (elimination-order) row, and ``bp = n // D`` makes
feedperm the identity, recovering the contiguous layout (the
``*_rowsharded`` wrappers below).

Communication per panel k: one psum broadcast of the owner's previous
columns (bp x k*bp) + the bp x bp panel factor — sum(k) ~ n^2/2 elements
total, riding ICI. The reference has no distributed factorization at all
(single-process LAPACK potrf, crates/gp/src/algorithm.rs:988-1056).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def _axis(mesh: Mesh) -> str:
    return mesh.axis_names[0]


def block_cyclic_perm(n: int, n_dev: int, bp: int) -> np.ndarray:
    """feedperm (n,) with feedperm[feed_pos] = global row index: device d's
    shard (feed positions [d*n/D, (d+1)*n/D)) holds panels d, d+D, ... of
    the elimination order, each panel contiguous."""
    npan = n // bp
    order = np.arange(n).reshape(npan, bp)
    return np.concatenate(
        [order[d::n_dev].reshape(-1) for d in range(n_dev)]
    )


def pick_panel_size(n: int, n_dev: int) -> int:
    """Largest panel size bp with n % (bp * n_dev) == 0 and at least
    ~4 panels per device (so the cyclic layout actually balances); falls
    back to the contiguous bp = n // n_dev when n/D has no small factors."""
    base = n // n_dev
    for bp in range(base // 4, 0, -1):
        if base % bp == 0:
            return bp
    return base


def _check_shard(n: int, n_dev: int, bp: int) -> None:
    if n % (bp * n_dev) != 0:
        raise ValueError(
            f"n={n} must be divisible by bp*n_dev={bp}*{n_dev}"
        )


def _local_indices(n: int, n_dev: int, bp: int, idx):
    """Per-device (gpan, gidx): global panel / global row of each local
    row, from the traced device index ``idx``."""
    n_loc = n // n_dev
    jloc = jnp.arange(n_loc) // bp
    off = jnp.arange(n_loc) % bp
    gpan = jloc * n_dev + idx
    gidx = gpan * bp + off
    return gpan, gidx


def cholesky_blockcyclic(
    mesh: Mesh, r_feed: jnp.ndarray, bp: int
) -> jnp.ndarray:
    """Lower Cholesky of an SPD matrix given in block-cyclic feed layout:
    ``r_feed = R[feedperm, :]`` (rows permuted, columns in natural order).
    Returns ``L[feedperm, :]`` with the same sharding. Non-PD panels
    sanitize to zeros/NaNs that the caller's finiteness guard must catch.
    """
    n = r_feed.shape[1]
    ax = _axis(mesh)
    n_dev = mesh.devices.size
    _check_shard(n, n_dev, bp)
    npan = n // bp
    n_loc = n // n_dev
    dtype = r_feed.dtype

    @partial(shard_map, mesh=mesh, in_specs=P(ax, None),
             out_specs=P(ax, None))
    def factor(r_local):  # (n_loc, n) feed rows owned by this device
        idx = lax.axis_index(ax)
        gpan, _ = _local_indices(n, n_dev, bp, idx)
        l_local = jnp.zeros((n_loc, n), dtype)
        for k in range(npan):
            o = k % n_dev
            sl = (k // n_dev) * bp  # local offset of panel k on its owner
            mine = idx == o
            # left-looking update of panel-k columns restricted to my rows:
            #   S = R[:, cols_k] - L[:, :k*bp] @ L[panel-k rows, :k*bp]^T
            if k:
                top = lax.psum(
                    jnp.where(mine, l_local[sl:sl + bp, : k * bp], 0.0),
                    ax,
                )  # (bp, k*bp): owner's previous columns, broadcast
                a_col = (
                    r_local[:, k * bp:(k + 1) * bp]
                    - l_local[:, : k * bp] @ top.T
                )
            else:
                a_col = r_local[:, :bp]
            # the owner's local slice sl:sl+bp IS the diagonal block
            lkk = jnp.linalg.cholesky(a_col[sl:sl + bp, :])
            lkk = lax.psum(jnp.where(mine, jnp.tril(lkk), 0.0), ax)
            below = solve_triangular(lkk, a_col.T, lower=True).T
            lkk_san = jnp.tril(jnp.where(jnp.isfinite(lkk), lkk, 0.0))
            lkk_rows = jnp.zeros((n_loc, bp), dtype)
            lkk_rows = lax.dynamic_update_slice(lkk_rows, lkk_san, (sl, 0))
            piece = jnp.where(
                (gpan == k)[:, None],
                lkk_rows,
                jnp.where((gpan > k)[:, None], below, 0.0),
            )
            l_local = l_local.at[:, k * bp:(k + 1) * bp].set(piece)
        return l_local

    return factor(r_feed)


def solve_lower_blockcyclic(
    mesh: Mesh, l_feed: jnp.ndarray, rhs_feed: jnp.ndarray, bp: int
) -> jnp.ndarray:
    """Forward substitution L X = B with both L and B in block-cyclic feed
    layout; returns X in feed layout. Block forward-substitution: each
    panel's solved block is psum-broadcast and eliminated from the
    remaining rows by local GEMMs."""
    n = l_feed.shape[1]
    ax = _axis(mesh)
    n_dev = mesh.devices.size
    _check_shard(n, n_dev, bp)
    npan = n // bp
    n_loc = n // n_dev
    p = rhs_feed.shape[1]
    dtype = l_feed.dtype

    @partial(shard_map, mesh=mesh, in_specs=(P(ax, None), P(ax, None)),
             out_specs=P(ax, None))
    def fsolve(l_local, b_local):  # (n_loc, n), (n_loc, p)
        idx = lax.axis_index(ax)
        gpan, _ = _local_indices(n, n_dev, bp, idx)
        x_local = jnp.zeros((n_loc, p), dtype)
        resid = b_local
        for k in range(npan):
            o = k % n_dev
            sl = (k // n_dev) * bp
            mine = idx == o
            diag = l_local[sl:sl + bp, k * bp:(k + 1) * bp]
            xk = solve_triangular(diag, resid[sl:sl + bp, :], lower=True)
            xk = lax.psum(jnp.where(mine, xk, 0.0), ax)  # (bp, p)
            xk_rows = jnp.zeros((n_loc, p), dtype)
            xk_rows = lax.dynamic_update_slice(xk_rows, xk, (sl, 0))
            x_local = jnp.where((gpan == k)[:, None], xk_rows, x_local)
            resid = resid - jnp.where(
                (gpan > k)[:, None],
                l_local[:, k * bp:(k + 1) * bp] @ xk,
                0.0,
            )
        return x_local

    return fsolve(l_feed, rhs_feed)


def solve_upperT_blockcyclic(
    mesh: Mesh, l_feed: jnp.ndarray, rhs_feed: jnp.ndarray, bp: int
) -> jnp.ndarray:
    """Backward substitution L^T X = B with L and B in block-cyclic feed
    layout; returns X in feed layout. Panels are eliminated in REVERSE
    order: at panel k every device contributes
    L_local[:, cols_k]^T @ X_local (only already-solved rows of panels
    > k are nonzero — rows of panels < k have zero entries in column
    block k by lower-triangularity), the psum lands on the owner, which
    back-solves the bp x bp diagonal block transpose. Same O(n^2 p / D)
    per-device GEMM cost and psum traffic as the forward solve.

    This is the missing half of the distributed model realization:
    gamma = L^-T (yt - Ft beta) without materializing an (n, n) inverse
    (single-device counterpart: gp/likelihood.py gamma via two
    solve_triangular calls, itself mirroring gp/src/algorithm.rs:988-1056).
    """
    n = l_feed.shape[1]
    ax = _axis(mesh)
    n_dev = mesh.devices.size
    _check_shard(n, n_dev, bp)
    npan = n // bp
    n_loc = n // n_dev
    p = rhs_feed.shape[1]
    dtype = l_feed.dtype

    @partial(shard_map, mesh=mesh, in_specs=(P(ax, None), P(ax, None)),
             out_specs=P(ax, None))
    def bsolve(l_local, b_local):  # (n_loc, n), (n_loc, p)
        idx = lax.axis_index(ax)
        gpan, _ = _local_indices(n, n_dev, bp, idx)
        x_local = jnp.zeros((n_loc, p), dtype)
        for k in reversed(range(npan)):
            o = k % n_dev
            sl = (k // n_dev) * bp
            mine = idx == o
            colk = l_local[:, k * bp:(k + 1) * bp]  # (n_loc, bp)
            # unsolved rows (panels <= k) are still zero in x_local, so
            # the contraction needs no mask
            s = lax.psum(colk.T @ x_local, ax)  # (bp, p)
            diag = colk[sl:sl + bp, :]  # valid on the owner only
            xk = solve_triangular(
                diag.T, b_local[sl:sl + bp, :] - s, lower=False
            )
            xk = lax.psum(jnp.where(mine, xk, 0.0), ax)  # (bp, p)
            xk_rows = jnp.zeros((n_loc, p), dtype)
            xk_rows = lax.dynamic_update_slice(xk_rows, xk, (sl, 0))
            x_local = jnp.where((gpan == k)[:, None], xk_rows, x_local)
        return x_local

    return bsolve(l_feed, rhs_feed)


def tri_inverse_feed(
    mesh: Mesh, l_feed: jnp.ndarray, bp: int
) -> jnp.ndarray:
    """L^{-1} (rows in feed layout, columns natural) from L in feed layout:
    the forward solve above with an identity RHS built locally as one-hot
    rows (no replicated (n, n) identity is ever materialized)."""
    n = l_feed.shape[1]
    ax = _axis(mesh)
    n_dev = mesh.devices.size
    _check_shard(n, n_dev, bp)
    npan = n // bp
    n_loc = n // n_dev
    dtype = l_feed.dtype

    @partial(shard_map, mesh=mesh, in_specs=P(ax, None),
             out_specs=P(ax, None))
    def finv(l_local):
        idx = lax.axis_index(ax)
        gpan, gidx = _local_indices(n, n_dev, bp, idx)
        cols = jnp.arange(n)
        resid = (cols[None, :] == gidx[:, None]).astype(dtype)  # I rows
        x_local = jnp.zeros((n_loc, n), dtype)
        for k in range(npan):
            o = k % n_dev
            sl = (k // n_dev) * bp
            mine = idx == o
            diag = l_local[sl:sl + bp, k * bp:(k + 1) * bp]
            xk = solve_triangular(diag, resid[sl:sl + bp, :], lower=True)
            xk = lax.psum(jnp.where(mine, xk, 0.0), ax)
            xk_rows = jnp.zeros((n_loc, n), dtype)
            xk_rows = lax.dynamic_update_slice(xk_rows, xk, (sl, 0))
            x_local = jnp.where((gpan == k)[:, None], xk_rows, x_local)
            resid = resid - jnp.where(
                (gpan > k)[:, None],
                l_local[:, k * bp:(k + 1) * bp] @ xk,
                0.0,
            )
        return x_local

    return finv(l_feed)


def rinv_rows_feed(
    mesh: Mesh, linv_feed: jnp.ndarray, bp: int
) -> jnp.ndarray:
    """R^{-1} = L^{-T} L^{-1} with rows in feed layout, from L^{-1} in feed
    layout. Inner products run over rows (permutation-invariant): for each
    output panel k, every device contributes
    Linv_local[:, cols_k]^T @ Linv_local and the psum lands on the owner —
    all devices GEMM every panel (no idling), comm = n^2 total."""
    n = linv_feed.shape[1]
    ax = _axis(mesh)
    n_dev = mesh.devices.size
    _check_shard(n, n_dev, bp)
    npan = n // bp
    n_loc = n // n_dev
    dtype = linv_feed.dtype

    @partial(shard_map, mesh=mesh, in_specs=P(ax, None),
             out_specs=P(ax, None))
    def rinv(li_local):  # (n_loc, n) feed rows of L^-1
        idx = lax.axis_index(ax)
        gpan, _ = _local_indices(n, n_dev, bp, idx)
        out = jnp.zeros((n_loc, n), dtype)
        for k in range(npan):
            sl = (k // n_dev) * bp
            colblk = li_local[:, k * bp:(k + 1) * bp]  # (n_loc, bp)
            rows_k = lax.psum(colblk.T @ li_local, ax)  # (bp, n)
            rows_full = jnp.zeros((n_loc, n), dtype)
            rows_full = lax.dynamic_update_slice(rows_full, rows_k, (sl, 0))
            out = jnp.where((gpan == k)[:, None], rows_full, out)
        return out

    return rinv(linv_feed)


# ---------------------------------------------------------------------------
# contiguous-layout wrappers (round-2 API; bp = n // D makes feedperm the
# identity, so these accept/return natural-order matrices)


def cholesky_rowsharded(mesh: Mesh, r: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky of an (n, n) SPD matrix with contiguous row blocks
    sharded over the mesh (feedperm = identity special case)."""
    n_dev = mesh.devices.size
    return cholesky_blockcyclic(mesh, r, r.shape[0] // n_dev)


def solve_lower_rowsharded(
    mesh: Mesh, l: jnp.ndarray, rhs: jnp.ndarray
) -> jnp.ndarray:
    """Forward substitution L X = B with contiguous row sharding."""
    n_dev = mesh.devices.size
    return solve_lower_blockcyclic(mesh, l, rhs, l.shape[0] // n_dev)


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
    (local O(n^2 d / D) per device), block-cyclic distributed Cholesky,
    distributed forward solves, and psum reductions for logdet / GLS — no
    step materializes an (n, n) buffer on a single device. This is the
    n >= 50k path (ROADMAP "shard_map'd likelihood: row-sharded Gram +
    distributed Cholesky over ICI"); behavioral parity with the
    single-device reduced_likelihood (gp/likelihood.py, itself mirroring
    crates/gp/src/algorithm.rs:988-1056) INCLUDING the failure semantics:
    a non-PD Gram or ill-conditioned Ft returns -inf, not NaN.

    n must be divisible by the mesh size (pad with masked rows upstream if
    needed — here we require exact divisibility and full activity).

    For the distributed FIT (value + analytic adjoint as an L-BFGS
    objective) see parallel/dist_fit.py.
    """
    from .dist_fit import dist_likelihood_parts

    x = jnp.atleast_2d(x)
    dtype = x.dtype
    y = jnp.asarray(y, dtype=dtype)
    if y.ndim == 1:
        y = y[:, None]
    if nugget is None:
        nugget = 100.0 * float(jnp.finfo(dtype).eps)

    # normalization (replicated scalars)
    x_mean, x_std = jnp.mean(x, axis=0), jnp.std(x, axis=0, ddof=1)
    x_std = jnp.where(x_std <= 0, 1.0, x_std)
    y_mean, y_std = jnp.mean(y, axis=0), jnp.std(y, axis=0, ddof=1)
    y_std = jnp.where(y_std <= 0, 1.0, y_std)
    x_norm = (x - x_mean) / x_std
    y_norm = (y - y_mean) / y_std

    rlf, _ = dist_likelihood_parts(
        mesh, x_norm, y_norm, theta,
        corr=corr, trend=trend, nugget=float(nugget),
    )
    return rlf
