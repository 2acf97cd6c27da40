"""Correlation kernels: squared-exponential, absolute-exponential,
Matern 3/2, Matern 5/2 — all PLS-weighted.

Behavioral parity with crates/gp/src/correlation_models.rs, redesigned for
TPU execution:

- every kernel is expressed in log space as a **sum over input dims** of a
  per-dim contribution, so the (n1, n2) Gram matrix is built by blocked
  vectorized passes instead of the reference's per-pair nested loops;
- the squared-exponential Gram uses the ||a-b||^2 matmul expansion so the
  O(n^2 d) work lands on the MXU;
- kernel *gradients* come free via jax.grad — the reference's hand-written
  jacobians (correlation_models.rs jacobian/valjac) are test oracles only.

``weights`` is the (nx, ncomp) KPLS projection (w_star); ``weights=None``
means identity (no KPLS), in which case theta has length nx and all formulas
collapse to their per-dim diagonal form.

Formulas (d_j = x_j - x'_j, thw = theta-weighted scale):
- sqexp  : prod_{j,l} exp(-0.5 (theta_l w_jl d_j)^2)       (ref :87-146)
- absexp : prod_{j,l} exp(-theta_l |w_jl| |d_j|)           (ref :181-238)
- matern32: prod_{j,l} (1+s3 thw|d_j|) exp(-s3 thw|d_j|), s3=sqrt(3) (:273-413)
- matern52: prod_{j,l} (1+s5 thw|d_j|+5/3 thw^2 d_j^2) exp(-s5 thw|d_j|) (:442-587)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

KERNEL_NAMES = (
    "squared_exponential",
    "absolute_exponential",
    "matern32",
    "matern52",
)

#: (theta lower-influence, upper-influence) factors used for dim-aware theta
#: bounds (ref: correlation_models.rs theta_influence_factors)
THETA_INFLUENCE_FACTORS = {
    "squared_exponential": (0.29, 1.96),
    "absolute_exponential": (0.15, 3.76),
    "matern32": (0.21, 2.74),
    "matern52": (0.23, 2.44),
}

_SQRT3 = 1.7320508075688772
_SQRT5 = 2.23606797749979


def _theta_w(name: str, theta, weights):
    """Per-(dim, comp) length-scale matrix, or per-dim vector when
    weights is None."""
    if weights is None:
        return theta  # (nx,)
    if name == "squared_exponential":
        return theta[None, :] * weights  # sign kept, squared later
    return theta[None, :] * jnp.abs(weights)  # (nx, ncomp)


def _log_corr_terms(name: str, dabs, thw, weights_is_none: bool):
    """log r contribution summed over dims (and comps), dabs (..., nx)."""
    if name == "squared_exponential":
        if weights_is_none:
            c = thw**2  # (nx,)
        else:
            c = jnp.sum(thw**2, axis=1)  # (nx,)
        return -0.5 * jnp.sum(dabs**2 * c, axis=-1)
    if name == "absolute_exponential":
        if weights_is_none:
            c = thw
        else:
            c = jnp.sum(thw, axis=1)
        return -jnp.sum(dabs * c, axis=-1)
    if name == "matern32":
        if weights_is_none:
            u = dabs * thw  # (..., nx)
            return jnp.sum(jnp.log1p(_SQRT3 * u) - _SQRT3 * u, axis=-1)
        u = dabs[..., :, None] * thw  # (..., nx, ncomp)
        return jnp.sum(jnp.log1p(_SQRT3 * u) - _SQRT3 * u, axis=(-2, -1))
    if name == "matern52":
        if weights_is_none:
            u = dabs * thw
            return jnp.sum(
                jnp.log1p(_SQRT5 * u + (5.0 / 3.0) * u * u) - _SQRT5 * u,
                axis=-1,
            )
        u = dabs[..., :, None] * thw
        return jnp.sum(
            jnp.log1p(_SQRT5 * u + (5.0 / 3.0) * u * u) - _SQRT5 * u,
            axis=(-2, -1),
        )
    raise ValueError(f"unknown kernel: {name}")


def corr_value(name: str, d, theta, weights=None):
    """Correlation r for differences ``d`` of shape (..., nx) -> (...).

    Accepts raw (signed) differences; |.| is applied internally like the
    reference."""
    thw = _theta_w(name, theta, weights)
    return jnp.exp(_log_corr_terms(name, jnp.abs(d), thw, weights is None))


def _sqexp_cross_fast(x1, x2, theta, weights):
    """MXU path: weighted squared distances via the matmul expansion."""
    if weights is None:
        c = theta**2
    else:
        c = jnp.sum((theta[None, :] * weights) ** 2, axis=1)
    s = jnp.sqrt(c)
    a = x1 * s
    b = x2 * s
    a2 = jnp.sum(a * a, axis=1)[:, None]
    b2 = jnp.sum(b * b, axis=1)[None, :]
    sq = jnp.maximum(a2 + b2 - 2.0 * (a @ b.T), 0.0)
    return jnp.exp(-0.5 * sq)


# rows per block for the generic blocked Gram construction: keeps the
# (block, n2, nx) broadcast tensor well under VMEM/HBM pressure
_BLOCK_ROWS = 256
# element budget below which we build the full (n1, n2, nx) tensor directly
_DENSE_BUDGET = 8_000_000


@partial(jax.jit, static_argnums=(0,))
def corr_cross(name: str, x1, x2, theta, weights=None):
    """Cross-correlation (Gram) matrix r(x1, x2) of shape (n1, n2).

    sqexp takes the matmul fast path; the other kernels stream row blocks
    through the fused log-space formula (O(block * n2 * nx) live memory).
    """
    if name == "squared_exponential":
        return _sqexp_cross_fast(x1, x2, theta, weights)
    n1, nx = x1.shape
    n2 = x2.shape[0]
    thw = _theta_w(name, theta, weights)
    wnone = weights is None

    # large L1-family Grams on TPU route to the fused Pallas kernel
    # (one VMEM-resident pass per output tile; egobox_tpu/ops/pallas_corr.py)
    if (
        wnone
        and x1.dtype == jnp.float32
        and n1 * n2 * nx > _DENSE_BUDGET
        and jax.default_backend() == "tpu"
        # Mosaic cannot legalize the i64 grid/index maps global x64
        # produces (see gp/likelihood._cholesky) — TPU deployments run
        # EGOBOX_TPU_NO_X64=1
        and not jax.config.jax_enable_x64
    ):
        from ..ops.pallas_corr import corr_cross_pallas

        return corr_cross_pallas(name, x1, x2, theta)

    if n1 * n2 * nx <= _DENSE_BUDGET:
        dabs = jnp.abs(x1[:, None, :] - x2[None, :, :])
        return jnp.exp(_log_corr_terms(name, dabs, thw, wnone))

    # blocked streaming over rows of x1
    block = _BLOCK_ROWS
    n_blocks = -(-n1 // block)
    pad = n_blocks * block - n1
    x1p = jnp.pad(x1, ((0, pad), (0, 0)))

    def one_block(xb):
        dabs = jnp.abs(xb[:, None, :] - x2[None, :, :])
        return jnp.exp(_log_corr_terms(name, dabs, thw, wnone))

    blocks = lax.map(one_block, x1p.reshape(n_blocks, block, nx))
    return blocks.reshape(n_blocks * block, n2)[:n1]


@partial(jax.jit, static_argnums=(0,))
def log_corr_cross(name: str, x1, x2, theta, weights=None):
    """log r(x1, x2) of shape (n1, n2) — the pre-exp log-kernel matrix.
    Used by the analytic likelihood adjoint (gp/likelihood.py), where the
    gradient contraction sum_ij C_ij d log r_ij / d theta is evaluated by
    elementwise autodiff of this function (no linear algebra involved)."""
    n1, nx = x1.shape
    n2 = x2.shape[0]
    thw = _theta_w(name, theta, weights)
    wnone = weights is None
    if n1 * n2 * nx <= _DENSE_BUDGET:
        dabs = jnp.abs(x1[:, None, :] - x2[None, :, :])
        return _log_corr_terms(name, dabs, thw, wnone)
    block = _BLOCK_ROWS
    n_blocks = -(-n1 // block)
    pad = n_blocks * block - n1
    x1p = jnp.pad(x1, ((0, pad), (0, 0)))

    def one_block(xb):
        dabs = jnp.abs(xb[:, None, :] - x2[None, :, :])
        return _log_corr_terms(name, dabs, thw, wnone)

    blocks = lax.map(one_block, x1p.reshape(n_blocks, block, nx))
    return blocks.reshape(n_blocks * block, n2)[:n1]


def corr_gram(name: str, x, theta, weights=None, nugget=0.0):
    """Symmetric Gram matrix R(x, x) with unit diagonal plus nugget
    (ref: algorithm.rs:997-1002 builds eye*(1+nugget) + off-diag corr)."""
    r = corr_cross(name, x, x, theta, weights)
    n = x.shape[0]
    eye = jnp.eye(n, dtype=x.dtype)
    # force exact unit diagonal (self-correlation) then add nugget
    r = r * (1.0 - eye) + eye * (1.0 + nugget)
    return r


#: ThetaTuning::DEFAULT_BOUNDS in the reference (gp/src/parameters.rs)
DEFAULT_THETA_BOUNDS = (1e-2, 1e1)


def theta_bounds_heuristic(names, nx: int):
    """Dim-aware theta bounds for nx >= 10 (Appriou 2023; exact port of
    special_bounds, ref: ego/src/utils/bounds.rs:33-85).

    ``names`` is a kernel name or list of allowed kernel names; their
    influence factors widen the default bounds before the dimensional
    length-scale window is applied."""
    if isinstance(names, str):
        names = [names]
    theta_inf, theta_sup = DEFAULT_THETA_BOUNDS
    for name in names:
        f0, f1 = THETA_INFLUENCE_FACTORS[name]
        theta_inf = min(theta_inf, f0)
        theta_sup = max(theta_sup, f1)

    if nx < 10:
        return DEFAULT_THETA_BOUNDS

    import math

    d = float(nx)
    s = 1.0 / math.sqrt(12.0)  # std of a uniform design on [0, 1]^d
    k = 9.0 / 5.0  # uniform distribution kurtosis
    interval = 1.96 * math.sqrt(2.0 * (k + 1.0) * d)
    rmin = math.sqrt(max(2.0 * d - interval, 1e-12))
    rmax = math.sqrt(2.0 * d + interval)
    lmin = s * rmin * theta_inf
    lmax = s * rmax * theta_sup
    return (1.0 / lmax, 1.0 / lmin)
