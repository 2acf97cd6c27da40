"""Blocked/recursive triangular linear algebra built from MXU matmuls.

XLA:TPU's `triangular_solve` with many right-hand sides runs far below
matmul speed (measured ~4.7 TFLOP/s at n=10k f32 on v5e vs ~50+ for GEMM):
the substitution recurrence serializes on the non-MXU path. For the GP
likelihood gradient we need the full L^-1 (to assemble R^-1 = L^-T L^-1,
gp/likelihood.py bwd; reference hot loop crates/gp/src/algorithm.rs:
879-948) — this module computes it with the classic divide-and-conquer
inverse where ALL the O(n^3) work is GEMMs:

    L = [[A, 0],     L^-1 = [[A^-1,            0   ],
         [B, C]]             [-C^-1 B A^-1,  C^-1 ]]

Only the O(n b^2) base-case diagonal blocks use `triangular_solve`.
Total flops ~ 2/3 n^3, all MXU-eligible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

#: base-case block size: small enough that XLA's triangular_solve cost is
#: negligible, large enough to bound recursion depth
_BASE_BLOCK = 512


def _split_point(n: int) -> int:
    """Split near the middle, aligned to 128 (TPU lane width)."""
    k = (n // 2 + 64) // 128 * 128
    return min(max(k, 128), n - 128)


def blocked_cholesky(
    r: jnp.ndarray,
    block: int = 1024,
    precision=jax.lax.Precision.HIGHEST,
    panel: str = "solve",
) -> jnp.ndarray:
    """Lower Cholesky via a left-looking block-column algorithm.

    All O(n^3) work is GEMMs (MXU); per panel only a b x b factorization
    (XLA chol) and one small-A triangular solve remain. The column pieces
    are accumulated as separate (rows, b) arrays and concatenated once, so
    no O(n^2) dynamic-update-slice copies occur per panel.

        for k:  S   = A[k:, kb:(k+1)b] - L[k:, :kb] @ L[k, :kb]^T
                Lkk = chol(S[:b]);  L[k+1:, k] = S[b:] @ Lkk^-T

    Replaces the reference's per-process LAPACK potrf on the n=10k hot path
    (crates/gp/src/algorithm.rs:988-1056) with an MXU-shaped factorization;
    falls back to XLA's native chol when n <= block.

    ``panel`` selects how the sub-diagonal panel applies Lkk^-T:

    - "solve": XLA ``triangular_solve`` with (rows-b) right-hand sides —
      numerically canonical, but the substitution recurrence runs far
      below matmul speed (~4.7 TFLOP/s measured; that path carries
      ~n^2 b of the ~n^3/3 total flops).
    - "inverse": explicitly invert the b x b diagonal factor (recursive
      2x2 blocking, all GEMMs — tri_inverse_lower) and apply it as one
      MXU GEMM. Error grows with cond(Lkk) like the solve's does; the
      Gershgorin-scaled jitter (gp/likelihood.py) keeps the Schur
      complements well-enough conditioned in practice.

    Measured (v5e, n=10k f32): 50 ms at b=1024 panel="solve" vs 48 ms for
    XLA's native chol — XLA's is already well blocked on TPU. The value of
    this form is that all O(n^3) work is explicit GEMMs over block
    columns: with row-sharded inputs the trailing updates distribute over
    a mesh, which the native (single-device) chol cannot do — the building
    block for the n>=50k multi-chip factorization (ROADMAP).
    """
    n = r.shape[0]
    if n <= block:
        return jnp.linalg.cholesky(r)
    nb = -(-n // block)
    n_pad = nb * block
    if n_pad != n:
        # identity-pad: chol of blkdiag(R, I) = blkdiag(L, I)
        pad = n_pad - n
        r = jnp.pad(r, ((0, pad), (0, pad)))
        r = r + jnp.pad(
            jnp.eye(pad, dtype=r.dtype), ((n, 0), (n, 0))
        )
    cols = []  # cols[j]: (n_pad - j*block, block) strictly the lower part
    for k in range(nb):
        a_col = r[k * block:, k * block:(k + 1) * block]
        if k:
            # accumulated left-looking update: rows k.., previous columns
            left = jnp.concatenate(
                [c[(k - j) * block:] for j, c in enumerate(cols)], axis=1
            )  # (n_pad - kb, kb)
            top = jnp.concatenate(
                [c[(k - j) * block:(k - j + 1) * block]
                 for j, c in enumerate(cols)],
                axis=1,
            )  # (b, kb)
            a_col = a_col - jnp.matmul(left, top.T, precision=precision)
        lkk = jnp.linalg.cholesky(a_col[:block])
        if panel == "inverse":
            linv = tri_inverse_lower(lkk, precision, block=256)
            below = jnp.matmul(
                a_col[block:], linv.T, precision=precision
            )  # (rows-b, b)
        else:
            below = solve_triangular(
                lkk, a_col[block:].T, lower=True
            ).T  # (rows-b, b)
        cols.append(jnp.concatenate([lkk, below], axis=0))
    out = jnp.concatenate(
        [jnp.pad(c, ((j * block, 0), (0, 0))) for j, c in enumerate(cols)],
        axis=1,
    )
    return out[:n, :n]


def tri_inverse_lower(
    l: jnp.ndarray,
    precision=jax.lax.Precision.HIGHEST,
    block: int = _BASE_BLOCK,
) -> jnp.ndarray:
    """Inverse of a lower-triangular matrix via recursive 2x2 blocking.

    ``precision`` applies to the combine GEMMs (the accuracy-critical
    O(n^3) part); callers that only need a gradient-grade result may relax
    it (see gp/likelihood.py bwd).
    """
    n = l.shape[0]
    if n <= block:
        return solve_triangular(
            l, jnp.eye(n, dtype=l.dtype), lower=True
        )
    k = _split_point(n)
    a = l[:k, :k]
    b = l[k:, :k]
    c = l[k:, k:]
    ai = tri_inverse_lower(a, precision, block)
    ci = tri_inverse_lower(c, precision, block)
    ba = jnp.matmul(b, ai, precision=precision)
    low = -jnp.matmul(ci, ba, precision=precision)
    top = jnp.concatenate(
        [ai, jnp.zeros((k, n - k), dtype=l.dtype)], axis=1
    )
    bot = jnp.concatenate([low, ci], axis=1)
    return jnp.concatenate([top, bot], axis=0)
