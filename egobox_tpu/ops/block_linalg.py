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
