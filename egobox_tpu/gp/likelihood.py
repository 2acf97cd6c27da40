"""Concentrated (reduced) GP log-likelihood and GLS inner parameters.

Behavioral parity with crates/gp/src/algorithm.rs:988-1056, rebuilt as one
fused jit-able computation:

- R assembled from the kernel Gram (unit diagonal + nugget), optionally
  masked so a padded design (static shape, n_active <= n) computes the exact
  likelihood of the active rows — this is how egobox_tpu keeps the growing
  EGO DoE compile-once on TPU (SURVEY.md §7 "pad-to-bucket");
- Cholesky / triangular solves / QR via XLA batched linear algebra;
- failures (non-PD R, ill-conditioned Ft) become -inf likelihood via
  jnp.where instead of the reference's Err() so a vmapped multistart simply
  discards those thetas (same semantics as algorithm.rs:893-896).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

import jax

from .kernels import corr_cross, log_corr_cross
from .trends import trend_basis

_LN10 = 2.302585092994046


class GpInnerParams(NamedTuple):
    """GLS byproducts reused by predict (ref: algorithm.rs:47-60)."""

    sigma2: jnp.ndarray  # process variance, denormalized (scalar)
    beta: jnp.ndarray  # (p, 1) GLS trend coefficients
    gamma: jnp.ndarray  # (n, 1) correlation weights
    r_chol: jnp.ndarray  # (n, n) lower Cholesky of R
    ft: jnp.ndarray  # (n, p) L^-1 F
    ft_qr_r: jnp.ndarray  # (p, p) R factor of qr(ft)


def _build_r(corr, x_norm, theta, w_star, nugget, mask):
    """Assemble the regularized correlation matrix R.

    The jitter is ``nugget`` scaled by the largest Gershgorin row sum of R
    (stop-gradient): at small theta the Gram is dense with lambda_max ~ n
    and a constant nugget falls below f32 resolution of the spectrum —
    scaling keeps chol(R) well-posed for ANY theta while leaving
    well-conditioned fits (row sums ~ 1) untouched. With a mask, the padded
    block is the identity (contributes nothing to logdet/solves/GLS)."""
    n = x_norm.shape[0]
    dtype = x_norm.dtype
    eye = jnp.eye(n, dtype=dtype)
    r = corr_cross(corr, x_norm, x_norm, theta, w_star)
    r = r * (1.0 - eye) + eye  # exact unit diagonal
    if mask is not None:
        m = mask.astype(dtype)
        m2 = m[:, None] * m[None, :]
        r = r * m2 + eye * (1.0 - m2 * eye)
    row_max = jax.lax.stop_gradient(jnp.max(jnp.sum(jnp.abs(r), axis=1)))
    return r + eye * (nugget * jnp.maximum(row_max, 1.0))


def reduced_likelihood(
    corr: str,
    trend: str,
    x_norm: jnp.ndarray,
    y_norm: jnp.ndarray,
    y_std: jnp.ndarray,
    theta: jnp.ndarray,
    w_star: Optional[jnp.ndarray],
    nugget: float,
    mask: Optional[jnp.ndarray] = None,
):
    """Return (reduced_likelihood, GpInnerParams).

    ``x_norm`` (n, nx), ``y_norm`` (n, 1) are normalized training data;
    ``mask`` (n,) bool marks active rows (None = all active). The returned
    likelihood is the reference's ``-n (log10 sigma2 + log10 det(R)^{2/n})``.
    """
    n = x_norm.shape[0]
    dtype = x_norm.dtype
    eye = jnp.eye(n, dtype=dtype)

    r = _build_r(corr, x_norm, theta, w_star, nugget, mask)

    fx = trend_basis(trend, x_norm)
    if mask is not None:
        m = mask.astype(dtype)
        fx = fx * m[:, None]
        y_norm = y_norm * m[:, None]
        n_obs = jnp.sum(m)
    else:
        n_obs = jnp.asarray(float(n), dtype)

    l_chol = jnp.linalg.cholesky(r)
    ft = solve_triangular(l_chol, fx, lower=True)
    # GLS normal equations via the tiny (p, p) Gram of Ft instead of a tall
    # QR — identical R factor (up to signs) at a fraction of the compile
    # and runtime cost on TPU; p <= 1 + nx + nx(nx+1)/2
    gram = ft.T @ ft
    c = jnp.linalg.cholesky(gram)  # lower; R_qr = c.T
    r_qr = c.T

    # ill-conditioning guard via the R-factor diagonal (ref SVD cond check,
    # algorithm.rs:1009-1027)
    dq = jnp.abs(jnp.diag(c))
    cond_ok = (jnp.min(dq) / jnp.maximum(jnp.max(dq), 1e-300)) > 1e-10

    yt = solve_triangular(l_chol, y_norm, lower=True)
    fty = ft.T @ yt
    beta = solve_triangular(
        c.T, solve_triangular(c, fty, lower=True), lower=False
    )
    rho = yt - ft @ beta
    gamma = solve_triangular(l_chol.T, rho, lower=False)

    # det(R) = prod diag(L)^2; padded diagonal entries are 1 -> log 0
    logdet = 2.0 * jnp.sum(jnp.log10(jnp.diag(l_chol))) / n_obs
    sigma2_norm = jnp.sum(rho**2) / n_obs
    rlf = -n_obs * (jnp.log10(sigma2_norm) + logdet)

    neg_inf = jnp.asarray(-jnp.inf, dtype)
    rlf = jnp.where(jnp.isfinite(rlf) & cond_ok, rlf, neg_inf)

    inner = GpInnerParams(
        sigma2=sigma2_norm * (y_std.reshape(()) ** 2),
        beta=beta,
        gamma=gamma,
        r_chol=l_chol,
        ft=ft,
        ft_qr_r=r_qr,
    )
    return rlf, inner


def make_neg_reduced_likelihood(
    corr: str,
    trend: str,
    x_norm: jnp.ndarray,
    y_norm: jnp.ndarray,
    y_std: jnp.ndarray,
    w_star: Optional[jnp.ndarray],
    nugget: float,
    mask: Optional[jnp.ndarray] = None,
):
    """Negative reduced likelihood f(theta) with an ANALYTIC custom VJP.

    Autodiff through XLA's blocked Cholesky is prohibitively expensive to
    compile at n ~ 10k on TPU; the concentrated-likelihood gradient has the
    classic closed form instead (envelope theorem over the GLS beta and
    sigma^2):

        d/dtheta [ n ln s2 + ln det R ]
            = sum_ij [ (R^-1 - a a^T / s2) o R ]_ij  d log r_ij / dtheta

    with a = R^-1 (y - F beta) (== gamma). The contraction is evaluated by
    elementwise autodiff of the log-kernel matrix (kernels.log_corr_cross) —
    no linear algebra appears in the backward pass, so compile time stays
    flat in n. This is the TPU equivalent of the reference's derivative-free
    COBYLA objective (gp/src/algorithm.rs:879-897) upgraded with exact
    gradients.
    """
    dtype = x_norm.dtype
    n = x_norm.shape[0]
    if mask is not None:
        m = mask.astype(dtype)
        m2 = m[:, None] * m[None, :]
    else:
        m2 = None

    @jax.custom_vjp
    def neg_rlf(theta):
        rlf, _ = reduced_likelihood(
            corr, trend, x_norm, y_norm, y_std, theta, w_star, nugget, mask
        )
        return -rlf

    def fwd(theta):
        rlf, inner = reduced_likelihood(
            corr, trend, x_norm, y_norm, y_std, theta, w_star, nugget, mask
        )
        sigma2_norm = inner.sigma2 / (y_std.reshape(()) ** 2)
        return -rlf, (theta, inner.r_chol, inner.gamma, sigma2_norm)

    def bwd(res, g):
        theta, l_chol, gamma, sigma2_norm = res
        # L^-1 in column blocks: one giant (n, n)-RHS triangular solve makes
        # XLA materialize every update panel (OOM at n=10k); 512-column
        # panels keep live memory at ~n*block while the MXU matmul
        # assembles R^-1 = L^-T L^-1 afterwards.
        block = min(2048, n)
        nb = -(-n // block)
        cols = jnp.arange(n)

        def solve_block(j):
            e = (cols[:, None] == (j * block + jnp.arange(block))[None, :])
            return solve_triangular(
                l_chol, e.astype(dtype), lower=True
            )  # (n, block)

        li_blocks = jax.lax.map(solve_block, jnp.arange(nb))  # (nb, n, blk)
        li = jnp.moveaxis(li_blocks, 0, 1).reshape(n, nb * block)[:, :n]
        # R^-1 = L^-T L^-1. This n^3 matmul only feeds the GRADIENT's trace
        # contraction — bf16 single-pass accuracy (~1e-3 relative) is ample
        # for a quasi-Newton direction, so skip the multi-pass f32 cost the
        # global matmul-precision default would impose.
        r_inv = jnp.matmul(li.T, li, precision=jax.lax.Precision.DEFAULT)
        r = _build_r(corr, x_norm, theta, w_star, nugget, mask)
        c = (r_inv - (gamma @ gamma.T)
             / jnp.maximum(sigma2_norm, 1e-300)) * r
        if m2 is not None:
            c = c * m2

        def phi(th):
            return jnp.sum(
                c * log_corr_cross(corr, x_norm, x_norm, th, w_star)
            )

        dphi = jax.grad(phi)(theta)
        grad = g * dphi / _LN10
        grad = jnp.where(jnp.isfinite(grad), grad, 0.0)
        return (grad,)

    neg_rlf.defvjp(fwd, bwd)
    return neg_rlf
