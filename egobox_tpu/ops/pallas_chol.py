"""Pallas TPU blocked Cholesky — an OPT-IN alternative factorization
(``EGOBOX_CHOL=pallas:<block>:<prec>``; native XLA is the default).

MEASURED OUTCOME (v5e, n=10240 f32, tools/prof_chol2.py 2026-08-18):
native XLA `cholesky` runs **20.8 ms** (~17 TFLOP/s — an earlier 48-60 ms
reading was a timing artifact) and this kernel runs 32.1 ms at block=256
(block=512 exceeds the 16M scoped-VMEM limit), with identical f32
accuracy (dlogdet vs f64: +0.344 native / +0.347 pallas). **Native wins;
this module is kept as the fallback-path example of a fused Mosaic
factorization**, not as the default. The design:

- the O(n^3) trailing updates stay XLA GEMMs (left-looking block-column
  form, selectable precision — HIGH/bf16x3 is ~1e-6 relative on the
  Schur complements, ample under the Gershgorin-scaled nugget of
  gp/likelihood.py);
- each panel [diagonal block; sub-diagonal rows] is factorized by ONE
  Pallas kernel (`factor_panel`): an in-VMEM right-looking unblocked
  Cholesky of the b x b diagonal, an in-VMEM forward-substitution
  triangular inverse, and an MXU GEMM applying L00^-T to the rows below.
  One-hot matvecs replace dynamic lane indexing (column extraction via
  `a @ e_j` rides the MXU; placement via broadcast outer products), so
  the kernel needs no transposes and no gather/scatter.

This replaces the reference's LAPACK `potrf` on the n=10k hot path
(crates/gp/src/algorithm.rs:988-1056) with a factorization shaped for the
MXU/VPU split. Numerics: the panel math runs in f32 with HIGHEST-precision
dots; only the trailing-update GEMM precision is caller-selectable.

Row counts are padded to a multiple of `rb` (default 2048) so only a
handful of distinct Mosaic kernels compile per matrix size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: grid row-block: one (TM, b) panel slab per grid step
_TM = 1024
#: panel row counts are padded to a multiple of this to bound the number
#: of distinct kernel shapes (wasted GEMM rows are zeros -> zero output)
_RB = 2048
#: every dot INSIDE the kernel pins HIGHEST (fp32-contract) explicitly:
#: Mosaic only lowers DEFAULT/HIGHEST, and the package-wide
#: jax_default_matmul_precision=high (egobox_tpu.config) otherwise leaks
#: into the kernel trace — observed on v5e as NotImplementedError for
#: plain dots and an infinite _convert_helper recursion for the
#: decomposed ones
_HI = jax.lax.Precision.HIGHEST


def _factor_panel_kernel(b: int, a_ref, out_ref, linv_ref):
    """Grid step i == 0: factorize the (b, b) diagonal block sitting in the
    top rows, store L00 and its inverse; steps i >= 1 (and the remaining
    rows of step 0) apply L00^-T to their row slab via the MXU."""
    i = pl.program_id(0)
    f32 = out_ref.dtype  # f32 on TPU; dtype-faithful under the interpreter
    one = jnp.ones((), f32)
    zero = jnp.zeros((), f32)

    rows = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)  # (b, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)  # (1, b)

    @pl.when(i == 0)
    def _():
        a0 = a_ref[:b, :].astype(f32)

        # the loop index j is NOT used for the one-hot compares: under
        # global x64 (CPU-parity mode) fori_loop indices are int64, and
        # Mosaic's int64<->int32/f32 conversion fallback recurses forever
        # (observed on v5e). An int32 counter carried in the loop state
        # keeps the kernel x64-proof.
        jj0 = jnp.zeros((), jnp.int32)

        def chol_body(_, carry):
            a, l, jj = carry
            # one-hot selectors via where (Mosaic has no bool->f32
            # convert lowering — a bool .astype recurses forever in
            # _convert_helper, observed on v5e)
            e_col = jnp.where(rows == jj, one, zero)  # (b, 1) one-hot
            e_row = jnp.where(cols == jj, one, zero)  # (1, b) one-hot
            col = jnp.dot(a, e_col, precision=_HI,
                          preferred_element_type=f32)  # (b, 1)
            row = jnp.dot(e_row, a, precision=_HI,
                          preferred_element_type=f32)  # (1, b)
            piv = jnp.sum(col * e_col)
            d = jax.lax.rsqrt(piv)
            cjm = jnp.where(rows >= jj, col * d, 0.0)  # masked col j of L
            rjm = jnp.where(cols >= jj, row * d, 0.0)  # its row-vector twin
            l = l + cjm * e_row  # place column j
            a = a - cjm * rjm  # rank-1 Schur update (only k > j read later)
            return a, l, jj + 1

        _, l00, _ = jax.lax.fori_loop(
            0, b, chol_body, (a0, jnp.zeros((b, b), f32), jj0)
        )

        def inv_body(_, carry):
            x, jj = carry
            e_col = jnp.where(rows == jj, one, zero)
            e_row = jnp.where(cols == jj, one, zero)
            lrow = jnp.dot(e_row, l00, precision=_HI,
                           preferred_element_type=f32)  # (1, b)
            piv = jnp.sum(lrow * e_row)
            prod = jnp.dot(lrow, x, precision=_HI,
                           preferred_element_type=f32)  # (1, b)
            xrow = (e_row - prod) / piv
            return x + e_col * xrow, jj + 1  # place row j

        linv, _ = jax.lax.fori_loop(
            0, b, inv_body, (jnp.zeros((b, b), f32), jj0)
        )
        linv_ref[:, :] = linv

        out_ref[:b, :] = l00.astype(out_ref.dtype)
        # remaining rows of this slab: B @ L00^-T (contract both on dim 1)
        below = jax.lax.dot_general(
            a_ref[b:, :].astype(f32), linv,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=_HI, preferred_element_type=f32,
        )
        out_ref[b:, :] = below.astype(out_ref.dtype)

    @pl.when(i > 0)
    def _():
        out_ref[:, :] = jax.lax.dot_general(
            a_ref[:, :].astype(f32), linv_ref[:, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=_HI, preferred_element_type=f32,
        ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(1, 2))
def factor_panel(a_panel: jnp.ndarray, tm: int = _TM,
                 interpret: bool = False) -> jnp.ndarray:
    """Factorize one block column: ``a_panel`` (m, b) holds the symmetric
    diagonal block in its first b rows and the sub-diagonal rows below
    (already left-looking-updated). Returns [L00; B L00^-T] of the same
    shape. m must be a multiple of ``tm`` and tm >= b; f32 on TPU
    (dtype-faithful under the interpreter, so CPU f64 fits stay f64)."""
    m, b = a_panel.shape
    assert m % tm == 0 and tm >= b, (m, tm, b)
    return pl.pallas_call(
        functools.partial(_factor_panel_kernel, b),
        out_shape=jax.ShapeDtypeStruct((m, b), a_panel.dtype),
        grid=(m // tm,),
        in_specs=[
            pl.BlockSpec((tm, b), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, b), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((b, b), a_panel.dtype)],
        interpret=interpret,
    )(a_panel)


def pallas_cholesky(
    r: jnp.ndarray,
    block: int = 256,
    precision=jax.lax.Precision.HIGH,
    interpret: bool = False,
) -> jnp.ndarray:
    """Lower Cholesky of an SPD matrix with Pallas panel factorizations.

    Left-looking block-column loop (same structure as
    ops/block_linalg.blocked_cholesky): per panel one XLA GEMM applies the
    accumulated update, then `factor_panel` factorizes the column in a
    single fused kernel. ``precision`` governs only the trailing-update
    GEMMs. f32; returns the full lower factor (upper garbage zeroed by
    construction of the column assembly)."""
    n = r.shape[0]
    b = block
    if n <= b:
        return jnp.linalg.cholesky(r)
    nb = -(-n // b)
    n_pad = nb * b
    if n_pad != n:
        pad = n_pad - n
        r = jnp.pad(r, ((0, pad), (0, pad)))
        r = r + jnp.pad(jnp.eye(pad, dtype=r.dtype), ((n, 0), (n, 0)))

    def rows_padded(rows):
        q = max(_RB, _TM)
        return -(-rows // q) * q if rows > _TM else _TM

    cols = []  # cols[j]: (n_pad - j*b, b), strictly the lower part
    for k in range(nb):
        a_col = r[k * b:, k * b:(k + 1) * b]
        if k:
            left = jnp.concatenate(
                [c[(k - j) * b:] for j, c in enumerate(cols)], axis=1
            )
            top = jnp.concatenate(
                [c[(k - j) * b:(k - j + 1) * b] for j, c in enumerate(cols)],
                axis=1,
            )
            a_col = a_col - jax.lax.dot_general(
                left, top,
                dimension_numbers=(((1,), (1,)), ((), ())),
                precision=precision,
            )
        rows = a_col.shape[0]
        mp = rows_padded(rows)
        if mp != rows:
            a_col = jnp.pad(a_col, ((0, mp - rows), (0, 0)))
        lcol = factor_panel(a_col, _TM, interpret)[:rows]
        cols.append(lcol)
    out = jnp.concatenate(
        [jnp.pad(c, ((j * b, 0), (0, 0))) for j, c in enumerate(cols)],
        axis=1,
    )
    return out[:n, :n]
