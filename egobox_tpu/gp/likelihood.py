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

from .kernels import corr_cross
from .trends import trend_basis


class GpInnerParams(NamedTuple):
    """GLS byproducts reused by predict (ref: algorithm.rs:47-60)."""

    sigma2: jnp.ndarray  # process variance, denormalized (scalar)
    beta: jnp.ndarray  # (p, 1) GLS trend coefficients
    gamma: jnp.ndarray  # (n, 1) correlation weights
    r_chol: jnp.ndarray  # (n, n) lower Cholesky of R
    ft: jnp.ndarray  # (n, p) L^-1 F
    ft_qr_r: jnp.ndarray  # (p, p) R factor of qr(ft)


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

    r = corr_cross(corr, x_norm, x_norm, theta, w_star)
    r = r * (1.0 - eye) + eye * (1.0 + nugget)

    fx = trend_basis(trend, x_norm)
    if mask is not None:
        m = mask.astype(dtype)
        m2 = m[:, None] * m[None, :]
        # padded block becomes the identity -> contributes nothing to
        # logdet, solves, or GLS
        r = r * m2 + eye * (1.0 - m2 * eye)
        fx = fx * m[:, None]
        y_norm = y_norm * m[:, None]
        n_obs = jnp.sum(m)
    else:
        n_obs = jnp.asarray(float(n), dtype)

    l_chol = jnp.linalg.cholesky(r)
    ft = solve_triangular(l_chol, fx, lower=True)
    q, r_qr = jnp.linalg.qr(ft)

    # ill-conditioning guard via the QR diagonal (ref SVD cond check,
    # algorithm.rs:1009-1027)
    dq = jnp.abs(jnp.diag(r_qr))
    cond_ok = (jnp.min(dq) / jnp.maximum(jnp.max(dq), 1e-300)) > 1e-10

    yt = solve_triangular(l_chol, y_norm, lower=True)
    beta = solve_triangular(r_qr, q.T @ yt, lower=False)
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
