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

#: matrices at or below this order always use XLA's native Cholesky — the
#: blocked variant only pays off when the trailing-update GEMMs dominate
_CHOL_NATIVE_MAX = 4096


def _cholesky(r):
    """Cholesky dispatch for the likelihood hot path.

    ``EGOBOX_CHOL`` (read at trace time) selects the implementation for
    large factorizations:

    - unset / ``native``: XLA's ``jnp.linalg.cholesky`` (measured 48 ms at
      n=10k f32 on v5e);
    - ``blk:<panel>:<block>:<prec>`` (e.g. ``blk:inverse:2048:high``): the
      left-looking blocked factorization (ops/block_linalg.py) whose
      trailing updates are explicit MXU GEMMs at the given precision —
      ``high`` (bf16x3) halves the dominant GEMM cost vs ``highest`` with
      ~1e-6 relative factor error, harmless under the Gershgorin-scaled
      nugget (see _build_r);
    - ``pallas:<block>:<prec>`` (e.g. ``pallas:256:high``): the Pallas
      panel-factorization variant (ops/pallas_chol.py) — fused in-VMEM
      diagonal factorization + MXU panel apply, XLA trailing GEMMs at the
      given precision. f32 TPU path only.

    Small matrices (n <= 4096, i.e. every bucketed EGO fit) always take the
    native path.
    """
    import os

    spec = os.environ.get("EGOBOX_CHOL", "native")
    if spec == "native" or r.shape[-1] <= _CHOL_NATIVE_MAX:
        return jnp.linalg.cholesky(r)
    parts = spec.split(":")
    precision = {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }[parts[-1]]
    if parts[0] == "pallas":
        from ..ops.pallas_chol import pallas_cholesky

        # compiled Mosaic path on TPU; interpreter elsewhere (CPU tests).
        # Global x64 ALSO forces the interpreter: Mosaic cannot legalize
        # the i64 grid/index maps x64 produces (even a trivial copy
        # kernel fails with "failed to legalize func.return"; observed
        # on v5e) — TPU deployments run EGOBOX_TPU_NO_X64=1.
        interpret = (
            jax.default_backend() != "tpu" or jax.config.jax_enable_x64
        )
        return pallas_cholesky(
            r, block=int(parts[1]), precision=precision,
            interpret=interpret,
        )
    _tag, panel, block = parts[:3]
    from ..ops.block_linalg import blocked_cholesky

    return blocked_cholesky(
        r, block=int(block), precision=precision, panel=panel
    )


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

    l_chol = _cholesky(r)
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


def _sqexp_dphi(c, x_norm, theta, w_star):
    """Closed-form trace contraction for the squared-exponential kernel:
    phi(theta) = sum C o log r = -1/2 sum_k c_k(theta) S_k with
    S_k = sum_ij C_ij (x_ik - x_jk)^2, expanded into three matmul-shaped
    reductions (no n^2 d broadcast tensor, no autodiff): ~(d+2) n^2 flops
    vs the generic log-kernel vjp's full re-broadcast."""
    u = jnp.sum(c, axis=1)  # C 1
    v = jnp.sum(c, axis=0)  # 1^T C
    x2 = x_norm * x_norm
    w = jnp.matmul(c, x_norm, precision=jax.lax.Precision.HIGHEST)
    s = u @ x2 + v @ x2 - 2.0 * jnp.sum(x_norm * w, axis=0)  # (nx,)
    if w_star is None:
        return -theta * s
    # c_k = sum_l theta_l^2 w_kl^2  ->  dphi/dtheta_l = -theta_l sum_k w_kl^2 S_k
    return -theta * ((w_star**2).T @ s)


def _sqexp_dphi_stoch(x_norm, w_star, theta, l_chol, gamma, sigma2_norm,
                      probes):
    """Hutchinson (stochastic-trace) evaluation of the squared-exponential
    trace contraction s_k = sum_ij C_ij D_k,ij with
    C = (R^-1 - gamma gamma^T / sigma2) o R and D_k,ij = (x_ik - x_jk)^2.

    The exact contraction needs R^-1 explicitly (O(n^3) triangular inverse
    + O(n^3) GEMM, the dominant cost of the analytic adjoint at n ~ 10k,
    measured 114 ms on v5e). This estimator never forms R^-1:

        t_k = tr(R^-1 (R o D_k)) ~= (1/p) sum_z z^T R^-1 (R o D_k) z

    with Rademacher probes z, where every (R o D_k) v product expands into
    plain R-matvecs via D_k,ij = x2_ik + x2_jk - 2 x_ik x_jk:

        (R o D_k) v = x2_k o (R v) + R (x2_k o v) - 2 x_k o (R (x_k o v))

    and every R-matvec rides the SAVED Cholesky factor (R = L L^T), so the
    whole gradient is two batched triangular solves (n, p) plus two GEMMs
    of shape (n, n) @ (n, (d+2)p + d + 1) — O(n^2 d p) instead of O(n^3),
    ~10 ms at n=10k, d=10, p=64. The rank-1 gamma term is exact (p-free).

    The probes are FIXED (static key): every gradient evaluation inside a
    fit sees the same deterministic estimate, so the L-BFGS polish
    optimizes a consistent (slightly perturbed) gradient field and results
    are bitwise reproducible. Acceptance decisions in the line search use
    the EXACT likelihood value, and the polished optimum's likelihood
    deficit is second-order in the gradient noise (quality-gated in
    bench.py).

    Replaces the reference's derivative-free COBYLA probing of the n=10k
    hot loop (crates/gp/src/algorithm.rs:879-948) with an O(n^2)-per-
    iteration quasi-Newton gradient — a TPU-scale addition with no
    reference equivalent.
    """
    n, nx = x_norm.shape
    dtype = x_norm.dtype
    z = jax.random.rademacher(
        jax.random.key(0xE60B0), (n, probes), dtype=dtype
    )
    g = gamma[:, 0]
    # W = R^-1 Z via the saved factor (two batched triangular solves)
    w = solve_triangular(
        l_chol.T, solve_triangular(l_chol, z, lower=True), lower=False
    )
    x2 = x_norm * x_norm
    v3 = (x_norm[:, :, None] * z[:, None, :]).reshape(n, nx * probes)
    v4 = x_norm * g[:, None]
    u = jnp.concatenate([z, w, v3, v4, g[:, None]], axis=1)
    # gradient-grade precision is ample for a quasi-Newton direction (same
    # rationale as the r_inv assembly in the exact path below)
    prec = jax.lax.Precision.DEFAULT
    ru = jnp.matmul(
        l_chol, jnp.matmul(l_chol.T, u, precision=prec), precision=prec
    )
    a = ru[:, :probes]  # R Z
    b = ru[:, probes:2 * probes]  # R W
    gmat = ru[:, 2 * probes:(2 + nx) * probes].reshape(n, nx, probes)
    rv4 = ru[:, (2 + nx) * probes:(2 + nx) * probes + nx]  # R (x_k o g)
    rg = ru[:, -1]  # R g
    # symmetric pair of diagonal-weighted terms:
    #   sum_p w^T [x2_k o (Rz)] + sum_p z^T [x2_k o (Rw)]
    h = jnp.sum(w * a + z * b, axis=1)
    term12 = x2.T @ h  # (nx,)
    # cross term: sum_p (w o x_k)^T R (x_k o z)
    m3 = jnp.sum(w[:, None, :] * gmat, axis=2)  # (n, nx)
    term3 = jnp.sum(x_norm * m3, axis=0)
    t = (term12 - 2.0 * term3) / probes
    # exact rank-1 gamma term: gamma^T (R o D_k) gamma
    q = jnp.sum(v4 * rv4, axis=0)
    ug = 2.0 * (x2.T @ (g * rg)) - 2.0 * q
    s = t - ug / jnp.maximum(sigma2_norm, 1e-300)
    if w_star is None:
        return -theta * s
    # KPLS chain rule: c_k = sum_l theta_l^2 w_kl^2
    return -theta * ((w_star**2).T @ s)


def _grad_trace_core(corr, x_norm, w_star, nugget, mask, theta, l_chol,
                     gamma, sigma2_norm, stoch_probes=0):
    """Shared gradient body: d(-rlf/ln10-adjusted)/dtheta from the
    factorization residuals (theta, L, gamma, sigma2). Used by the
    custom-VJP bwd and by the residual-reuse L-BFGS path
    (optim/lbfgsb.py fun_and_res).

    ``stoch_probes > 0`` routes the squared-exponential kernel to the
    O(n^2 d p) Hutchinson contraction (_sqexp_dphi_stoch) instead of the
    exact O(n^3) inverse — opt-in (fit_gp(grad_probes=...)), kill-switch
    EGOBOX_NO_STOCH_GRAD=1. Other kernels always take the exact path.
    Masked (padded) designs are handled automatically: the padded block of
    R is zero off-diagonal and x_norm's padded rows are pinned to 0, so
    every padded contribution to the estimator vanishes identically."""
    import os

    if (
        stoch_probes
        and corr == "squared_exponential"
        and os.environ.get("EGOBOX_NO_STOCH_GRAD") != "1"
    ):
        return _sqexp_dphi_stoch(
            x_norm, w_star, theta, l_chol, gamma, sigma2_norm, stoch_probes
        )

    n = x_norm.shape[0]
    # measured on v5e n=10k inside the full fused fit program (min-of-3):
    #   panels+contract 1313ms | panels+autodiff 1445 | dc+autodiff 1528 |
    #   dc+contract 1686  -> panel solves + closed-form contraction win in
    # context even though the D&C GEMM inverse is 2x faster STANDALONE
    # (XLA schedules/fuses the panel solves better inside value_and_grad).
    inv_impl = os.environ.get("EGOBOX_GRAD_INV", "panels")
    phi_impl = os.environ.get("EGOBOX_GRAD_PHI", "contract")

    if inv_impl == "panels":
        # L^-1 in column blocks: one giant (n, n)-RHS triangular solve
        # makes XLA materialize every update panel (OOM at n=10k);
        # 2048-column panels keep live memory at ~n*block while the MXU
        # matmul assembles R^-1 = L^-T L^-1 afterwards.
        block = min(2048, n)
        nb = -(-n // block)
        cols = jnp.arange(n)

        def solve_block(j):
            e = (cols[:, None] == (j * block + jnp.arange(block))[None, :])
            return solve_triangular(l_chol, e.astype(x_norm.dtype),
                                    lower=True)

        li_blocks = jax.lax.map(solve_block, jnp.arange(nb))
        li = jnp.moveaxis(li_blocks, 0, 1).reshape(n, nb * block)[:, :n]
    else:
        from ..ops.block_linalg import tri_inverse_lower

        # divide-and-conquer GEMM inverse (block_linalg.py)
        li = tri_inverse_lower(l_chol, precision=jax.lax.Precision.HIGH)
    # R^-1 = L^-T L^-1. This n^3 matmul only feeds the GRADIENT's trace
    # contraction — bf16 single-pass accuracy (~1e-3 relative) is ample
    # for a quasi-Newton direction.
    r_inv = jnp.matmul(li.T, li, precision=jax.lax.Precision.DEFAULT)
    r = _build_r(corr, x_norm, theta, w_star, nugget, mask)
    c = (r_inv - (gamma @ gamma.T)
         / jnp.maximum(sigma2_norm, 1e-300)) * r
    if mask is not None:
        m = mask.astype(x_norm.dtype)
        c = c * (m[:, None] * m[None, :])

    if corr == "squared_exponential" and phi_impl == "contract":
        return _sqexp_dphi(c, x_norm, theta, w_star)

    def phi(th):
        return jnp.sum(
            c * log_corr_cross(corr, x_norm, x_norm, th, w_star)
        )

    return jax.grad(phi)(theta)


def make_neg_reduced_likelihood(
    corr: str,
    trend: str,
    x_norm: jnp.ndarray,
    y_norm: jnp.ndarray,
    y_std: jnp.ndarray,
    w_star: Optional[jnp.ndarray],
    nugget: float,
    mask: Optional[jnp.ndarray] = None,
    stoch_probes: int = 0,
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
        dphi = _grad_trace_core(
            corr, x_norm, w_star, nugget, mask, theta, l_chol, gamma,
            sigma2_norm, stoch_probes,
        )
        grad = g * dphi / _LN10
        grad = jnp.where(jnp.isfinite(grad), grad, 0.0)
        return (grad,)

    neg_rlf.defvjp(fwd, bwd)
    return neg_rlf


def make_neg_rlf_residual_api(
    corr: str,
    trend: str,
    x_norm: jnp.ndarray,
    y_norm: jnp.ndarray,
    y_std: jnp.ndarray,
    w_star: Optional[jnp.ndarray],
    nugget: float,
    mask: Optional[jnp.ndarray] = None,
    stoch_probes: int = 0,
):
    """Residual-reuse objective for the L-BFGS (optim/lbfgsb.py):

    - ``fun_and_res(t_log10) -> (f, (theta, L, gamma, sigma2))`` — the
      plain forward, KEEPING the Cholesky factorization;
    - ``grad_from_res(t_log10, res) -> g`` — the analytic adjoint straight
      from those residuals, with NO forward recomputation.

    The line search evaluates trials with ``fun_and_res``; the accepted
    trial's factorization then feeds the gradient directly — saving one
    full Gram+Cholesky per L-BFGS iteration vs value_and_grad
    (ref hot loop being replaced: gp/src/algorithm.rs:879-948, which pays
    a full likelihood per COBYLA probe)."""

    def fun_and_res(t_log10):
        theta = 10.0**t_log10
        rlf, inner = reduced_likelihood(
            corr, trend, x_norm, y_norm, y_std, theta, w_star, nugget, mask
        )
        # res carries the FULL inner params (not just the adjoint inputs)
        # so the caller can also reuse the accepted point's factorization
        # as the final model state (fit_gp_core residual_api path) — the
        # extra leaves (beta/ft/qr) are O(n p), negligible in the carry.
        return -rlf, (theta, rlf, inner)

    def grad_from_res(t_log10, res):
        theta, _rlf, inner = res
        sigma2_norm = inner.sigma2 / (y_std.reshape(()) ** 2)
        dphi = _grad_trace_core(
            corr, x_norm, w_star, nugget, mask, theta, inner.r_chol,
            inner.gamma, sigma2_norm, stoch_probes,
        )
        # d(-rlf)/dtheta = dphi/ln10; through theta = 10^t the ln10 cancels:
        # d(-rlf)/dt = dphi * theta
        grad = dphi * theta
        return jnp.where(jnp.isfinite(grad), grad, 0.0)

    return fun_and_res, grad_from_res
