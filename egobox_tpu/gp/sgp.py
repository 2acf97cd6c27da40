"""Sparse Gaussian process (FITC / VFE) with inducing points.

TPU-first rebuild of crates/gp/src/sparse_algorithm.rs: the joint
(theta, sigma2[, noise]) MLE runs as one vmapped multistart L-BFGS program
in log10 space (the reference fans COBYLA restarts over rayon and
finite-differences its gradients, :300-335 — here gradients are exact via
autodiff: the heavy matrices are only (M, n) and (M, M), so differentiating
through the small Cholesky is cheap, unlike the dense-GP case).

Likelihood math mirrors fitc() (:695-765) and vfe() (:769-830); prediction
uses the stored Woodbury vector/inverse for O(n M) cost (:237-257).
No x/y normalization — sigma2/noise are in output units like the reference.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct
from jax.scipy.linalg import solve_triangular

from ..optim.lbfgsb import minimize_lbfgsb
from .kernels import corr_cross
from .kpls import pls_rotations

#: SGP defaults (ref: sparse_parameters.rs)
SGP_THETA_BOUNDS = (1e-2, 1e2)
SGP_NOISE_INIT = 1e-2
SGP_NOISE_BOUNDS_EPS_FACTOR = 100.0
SGP_NOISE_UPPER = 1e10


class WoodburyData(NamedTuple):
    vec: jnp.ndarray  # (M, 1)
    inv: jnp.ndarray  # (M, M)


@struct.dataclass
class SgpModel:
    """Trained sparse GP (ref struct: sparse_algorithm.rs:145-169)."""

    theta: jnp.ndarray  # (dim,)
    sigma2: jnp.ndarray  # scalar process variance
    noise: jnp.ndarray  # scalar noise variance
    w_star: Optional[jnp.ndarray]
    z: jnp.ndarray  # (M, nx) inducing points
    w_vec: jnp.ndarray  # (M, 1)
    w_inv: jnp.ndarray  # (M, M)
    likelihood: jnp.ndarray
    corr: str = struct.field(pytree_node=False)
    method: str = struct.field(pytree_node=False)


def _k(corr, a, b, w_star, theta, sigma2):
    """sigma2-scaled kernel (ref: compute_k, sparse_algorithm.rs)."""
    return sigma2 * corr_cross(corr, a, b, theta, w_star)


def _common_uv(corr, theta, sigma2, x, z, w_star, nugget):
    nz = z.shape[0]
    kmm = _k(corr, z, z, w_star, theta, sigma2) + nugget * jnp.eye(
        nz, dtype=x.dtype
    )
    kmn = _k(corr, z, x, w_star, theta, sigma2)
    u = jnp.linalg.cholesky(kmm)
    ui = solve_triangular(u, jnp.eye(nz, dtype=x.dtype), lower=True)
    v = ui @ kmn  # (M, n)
    return u, ui, v, kmn


def fitc_likelihood(corr, theta, sigma2, noise, x, y, z, w_star, nugget):
    """(ref: fitc, sparse_algorithm.rs:695-765). Returns (lkh, WoodburyData).
    """
    n = x.shape[0]
    nz = z.shape[0]
    dtype = x.dtype
    _, ui, v, _ = _common_uv(corr, theta, sigma2, x, z, w_star, nugget)

    knn = jnp.full((n,), sigma2, dtype)
    nu = knn - jnp.sum(v * v, axis=0) + noise
    beta = 1.0 / nu

    a_mat = jnp.eye(nz, dtype=dtype) + (v * beta[None, :]) @ v.T
    l = jnp.linalg.cholesky(a_mat)
    li = solve_triangular(l, jnp.eye(nz, dtype=dtype), lower=True)

    a = y * beta[:, None]  # (n, 1)
    b = (li @ v) @ a  # (M, 1)

    term1 = jnp.sum(jnp.log(nu))
    term2 = 2.0 * jnp.sum(jnp.log(jnp.diag(l)))
    term3 = (a.T @ y)[0, 0]
    term4 = -jnp.sum(b * b)
    lkh = -0.5 * (term1 + term2 + term3 + term4)

    li_ui = li @ ui
    w = WoodburyData(
        vec=li_ui.T @ b,
        inv=ui.T @ ui - li_ui.T @ li_ui,
    )
    return lkh, w


def vfe_likelihood(corr, theta, sigma2, noise, x, y, z, w_star, nugget):
    """(ref: vfe, sparse_algorithm.rs:769-830)."""
    n = x.shape[0]
    nz = z.shape[0]
    dtype = x.dtype
    _, ui, v, _ = _common_uv(corr, theta, sigma2, x, z, w_star, nugget)

    beta = 1.0 / jnp.maximum(noise, nugget)
    a_mat = (v @ v.T) * beta
    b_mat = jnp.eye(nz, dtype=dtype) + a_mat
    l = jnp.linalg.cholesky(b_mat)
    li = solve_triangular(l, jnp.eye(nz, dtype=dtype), lower=True)

    b = (li @ v) @ y * beta  # (M, 1)

    term1 = -n * jnp.log(beta)
    term2 = 2.0 * jnp.sum(jnp.log(jnp.diag(l)))
    term3 = beta * jnp.sum(y * y)
    term4 = -(b.T @ b)[0, 0]
    term5 = n * beta * sigma2
    term6 = -jnp.trace(a_mat)
    lkh = -0.5 * (term1 + term2 + term3 + term4 + term5 + term6)

    li_ui = li @ ui
    bi = jnp.eye(nz, dtype=dtype) + li.T @ li
    w = WoodburyData(
        vec=li_ui.T @ b,
        inv=ui.T @ (bi @ ui),
    )
    return lkh, w


_LIKELIHOODS = {"FITC": fitc_likelihood, "VFE": vfe_likelihood}


def sgp_predict(model: SgpModel, x: jnp.ndarray) -> jnp.ndarray:
    """mean = k(x, Z) w_vec (ref: sparse_algorithm.rs:237-241)."""
    kx = _k(model.corr, jnp.atleast_2d(x), model.z, model.w_star,
            model.theta, model.sigma2)
    return (kx @ model.w_vec)[:, 0]


def sgp_predict_var(model: SgpModel, x: jnp.ndarray) -> jnp.ndarray:
    """var = sigma2 - diag(k^T W_inv k), clipped at 1e-15, + noise
    (ref: sparse_algorithm.rs:245-257)."""
    kx = _k(model.corr, model.z, jnp.atleast_2d(x), model.w_star,
            model.theta, model.sigma2)  # (M, n)
    var = model.sigma2 - jnp.sum((model.w_inv.T @ kx) * kx, axis=0)
    return jnp.maximum(var, 1e-15) + model.noise


def sgp_predict_valvar(model: SgpModel, x: jnp.ndarray):
    return sgp_predict(model, x), sgp_predict_var(model, x)


def sgp_sample(model: SgpModel, x: jnp.ndarray, n_traj: int, key,
               method: str = "eig") -> jnp.ndarray:
    """Draw trajectories at x -> (m, n_traj): posterior mean plus noise with
    the PRIOR covariance sigma2*K(x,x), matching the reference's SGP sample
    (ref: sparse_algorithm.rs:338-361 _sample uses compute_k(x,x), and the
    shared sampler algorithm.rs:1153-1194 with eigenvalues floored at 1e-9).
    """
    x = jnp.atleast_2d(x)
    m = x.shape[0]
    cov = _k(model.corr, x, x, model.w_star, model.theta, model.sigma2)
    if method == "chol":
        c = jnp.linalg.cholesky(
            cov + 1e-9 * model.sigma2 * jnp.eye(m, dtype=cov.dtype)
        )
    else:
        evals, evecs = jnp.linalg.eigh(cov)
        evals = jnp.where(evals < 1e-9, 0.0, evals)
        c = evecs @ (jnp.sqrt(evals)[:, None] * evecs.T)
    mean = sgp_predict(model, x)[:, None]
    z = jax.random.normal(key, (m, n_traj), dtype=cov.dtype)
    return mean + c @ z


def sgp_predict_gradients(model: SgpModel, x: jnp.ndarray) -> jnp.ndarray:
    g = jax.grad(lambda xi: sgp_predict(model, xi[None, :])[0])
    return jax.vmap(g)(jnp.atleast_2d(x))


def sgp_predict_var_gradients(model: SgpModel, x: jnp.ndarray) -> jnp.ndarray:
    g = jax.grad(lambda xi: sgp_predict_var(model, xi[None, :])[0])
    return jax.vmap(g)(jnp.atleast_2d(x))


@partial(
    jax.jit,
    static_argnames=("corr", "method", "kpls_dim", "n_start", "max_iters",
                     "estimate_noise", "ls_batch"),
)
def fit_sgp_core(
    x, y, z, theta0, bounds_lo, bounds_up, noise0, noise_bounds, key,
    *,
    corr: str = "squared_exponential",
    method: str = "FITC",
    kpls_dim: Optional[int] = None,
    n_start: int = 10,
    max_iters: int = 50,
    estimate_noise: bool = True,
    nugget: float = 1e-10,
    ls_batch: int = 0,
    theta0_alt=None,
) -> SgpModel:
    dtype = x.dtype
    dim = theta0.shape[0]
    lik = _LIKELIHOODS[method]

    w_star = None
    if kpls_dim is not None:
        w_star = pls_rotations(x, y, kpls_dim)

    y_var = jnp.var(y, ddof=1)
    sigma2_0 = jnp.maximum(y_var, 1e-12)
    # params p = log10([theta..., sigma2, noise?])
    # sigma2 bounds (1e-12, 9 var(y)) per sparse_algorithm.rs:499-589
    lo_list = [jnp.log10(bounds_lo), jnp.log10(jnp.asarray([1e-12], dtype))]
    up_list = [
        jnp.log10(bounds_up),
        jnp.log10(jnp.asarray([9.0], dtype) * jnp.maximum(y_var, 1e-10)),
    ]
    p0_list = [jnp.log10(theta0), jnp.log10(sigma2_0)[None]]
    if estimate_noise:
        lo_list.append(jnp.log10(noise_bounds[0])[None])
        up_list.append(jnp.log10(noise_bounds[1])[None])
        p0_list.append(jnp.log10(noise0)[None])
    lo = jnp.concatenate(lo_list)
    up = jnp.concatenate(up_list)
    p0 = jnp.concatenate(p0_list)
    p0 = jnp.clip(p0, lo, up)
    # ``theta0_alt``: an extra full-strength init lane at a second theta
    # (the subsample-warmstart path keeps the DEFAULT init alongside the
    # warm one — a dense-subfit theta that lands in a bad basin for the
    # joint SGP objective must not evict the init that works; observed
    # on a 2-d noisy sine: warm-replacing-default diverged into the
    # all-noise optimum, Q2 -0.01, while either lane alone or both
    # together recover Q2 0.99)
    p0s = [p0]
    if theta0_alt is not None:
        p0_alt = jnp.concatenate(
            [jnp.log10(theta0_alt)] + p0_list[1:]
        )
        p0s.append(jnp.clip(p0_alt, lo, up))

    def unpack(p):
        theta = 10.0 ** p[:dim]
        sigma2 = 10.0 ** p[dim]
        noise = 10.0 ** p[dim + 1] if estimate_noise else noise0.reshape(())
        return theta, sigma2, noise

    def neg_lkh(p):
        theta, sigma2, noise = unpack(p)
        lkh, _ = lik(corr, theta, sigma2, noise, x, y, z, w_star, nugget)
        return jnp.where(jnp.isfinite(lkh), -lkh, jnp.inf)

    if n_start > 0:
        from ..doe.lhs import maximin_lhs

        # The LHS multistart SEEDS sample a plausible sub-box, not the
        # full optimization bounds: the raw (sigma2, noise) log box spans
        # [1e-12, 9 var] x [~1e-5, 1e10], and at large n most of that
        # volume drains into the degenerate all-noise basin (observed at
        # n=50k: 2 of 4 fits collapsed to noise ~ 2 var(y), Q2 < 0 —
        # tools/prof_sgp50k.py). Seeds keep theta's full range (the
        # genuine unknown) but pin sigma2 to [1e-2, 9] var(y) and noise
        # to [1e-6, 1e-1] var(y); the L-BFGS itself still optimizes over
        # the FULL bounds, so degenerate optima remain reachable when the
        # data supports them.
        slo, sup = lo, up
        v_log = jnp.log10(jnp.maximum(y_var, 1e-10))
        slo = slo.at[dim].set(jnp.maximum(slo[dim], v_log - 2.0))
        if estimate_noise:
            slo = slo.at[dim + 1].set(
                jnp.clip(v_log - 6.0, slo[dim + 1], up[dim + 1])
            )
            sup = sup.at[dim + 1].set(
                jnp.clip(v_log - 1.0, slo[dim + 1], up[dim + 1])
            )
        seeds = maximin_lhs(key, n_start, p0.shape[0], False, 5, dtype)
        seeds = slo[None, :] + seeds * (sup - slo)[None, :]
        inits = jnp.concatenate([jnp.stack(p0s), seeds], axis=0)
    else:
        inits = jnp.stack(p0s)

    res = jax.vmap(
        lambda p: minimize_lbfgsb(
            neg_lkh, p, lo, up, max_iters=max_iters, ls_batch=ls_batch,
            final_grad=False,
        )
    )(inits)
    best = jnp.argmin(res.fun)
    theta, sigma2, noise = unpack(res.x[best])

    lkh, w = lik(corr, theta, sigma2, noise, x, y, z, w_star, nugget)
    return SgpModel(
        theta=theta,
        sigma2=sigma2,
        noise=noise,
        w_star=w_star,
        z=z,
        w_vec=w.vec,
        w_inv=w.inv,
        likelihood=lkh,
        corr=corr,
        method=method,
    )


def fit_sgp(
    x,
    y,
    *,
    corr: str = "squared_exponential",
    method: str = "FITC",
    n_inducing: int = 10,
    z=None,
    theta_init=None,
    theta_bounds=None,
    theta_fixed: bool = False,
    noise=None,
    noise_bounds=None,
    estimate_noise: bool = True,
    kpls_dim: Optional[int] = None,
    n_start: int = 10,
    max_iters: int = 50,
    seed: int = 0,
    nugget: Optional[float] = None,
    subsample_warmstart: Optional[int] = None,
    ls_batch: int = 0,
) -> SgpModel:
    """User-facing sparse-GP fit (ref: SgpParams + fit,
    sparse_algorithm.rs:416-648).

    ``z`` gives located inducing points; otherwise ``n_inducing`` rows of
    the training set are picked at random (make_inducings, :833-847).
    ``noise`` is the fixed value (estimate_noise=False) or the initial guess.

    ``subsample_warmstart=k`` (extension, no reference counterpart):
    initialize theta from a dense-GP MLE on a k-row random subsample —
    the dense fit estimates length scales robustly where the joint
    (theta, sigma2, noise) SGP landscape is a basin lottery (measured at
    n=50k: 2 of 4 raw multistarts collapsed into the all-noise optimum,
    tools/prof_sgp50k.py). The dense theta is in normalized-x units;
    every kernel multiplies theta into the distance linearly
    (gp/kernels.py), so theta_raw = theta_norm / x_std. The same flag
    defaults the noise init to 1e-1 var(y) (descending from above is
    safe; inits <= 1e-2 var(y) under a still-underfit kernel overshoot
    into the all-noise plateau — see the inline note below). Not
    supported with kpls_dim (the rotation bases of the subsample and
    full data differ)."""
    x = jnp.atleast_2d(jnp.asarray(x))
    dtype = x.dtype
    y = jnp.asarray(y, dtype=dtype)
    if y.ndim == 1:
        y = y[:, None]
    n, nx = x.shape
    dim = kpls_dim if kpls_dim is not None else nx
    if kpls_dim is not None and kpls_dim > nx:
        raise ValueError(f"kpls_dim {kpls_dim} must be <= input dim {nx}")

    key = jax.random.key(seed)
    if z is None:
        kz, key = jax.random.split(key)
        idx = jax.random.permutation(kz, n)[:n_inducing]
        z = x[idx]
    else:
        z = jnp.atleast_2d(jnp.asarray(z, dtype=dtype))

    tb = theta_bounds if theta_bounds is not None else SGP_THETA_BOUNDS
    tb = jnp.asarray(tb, dtype=dtype)
    if tb.ndim == 1:
        tb = jnp.broadcast_to(tb[None, :], (dim, 2))

    theta0_alt = None
    if (
        subsample_warmstart
        and theta_init is None
        and not theta_fixed
    ):
        if kpls_dim is not None:
            raise ValueError(
                "subsample_warmstart does not support kpls_dim (the "
                "subsample's PLS rotation basis differs from the full "
                "data's)"
            )
        from .fit import fit_gp

        ks, key = jax.random.split(key)
        ns = min(int(subsample_warmstart), n)
        sub = jax.random.permutation(ks, n)[:ns]
        # budgeted subfit: with full fit_gp defaults (11 lanes x 50
        # iters, SEQUENTIAL line search) this warm start alone measured
        # 11.6 s of the 18.6 s n=50k SGP fit (tools/prof_sgp_r5.py P0,
        # v5e 2026-08-19). The SGP L-BFGS polishes in ITS OWN parameter
        # space afterwards — the dense theta only has to land in the
        # right basin, so a 3-start/20-iter parallel-line-search fit is
        # plenty (quality guarded by bench.py's Q2 >= 0.98 gate).
        msub = fit_gp(x[sub], y[sub], corr=corr, seed=seed,
                      n_start=3, max_iters=20, ls_batch=8)
        # dense theta lives in normalized-x units; theta enters every
        # kernel linearly against the distance -> divide by x_std
        theta_init = jnp.clip(
            msub.theta / msub.x_std, tb[:, 0], tb[:, 1]
        )
        # keep the DEFAULT init as an extra lane next to the warm one:
        # the dense subfit has no noise term, so on very noisy data its
        # theta can land in a basin from which the joint SGP L-BFGS
        # diverges into the all-noise optimum (fit_sgp_core theta0_alt)
        theta0_alt = jnp.full((dim,), 0.1, dtype=dtype)
        if noise is None:
            # 1e-1 var(y), NOT smaller: a noise init well below the
            # residual scale of the still-underfit kernel produces a
            # huge log-noise gradient whose first line-search step
            # overshoots into the all-noise plateau and never returns
            # (measured grid, 2-d noisy sine n=3k: inits <= 1e-2 var
            # diverge to noise ~ 1e9 from EITHER theta init; 1e-1 var
            # converges from either — descending INTO the optimum from
            # above is safe, ascending from below is not)
            noise = 1e-1 * jnp.var(y, ddof=1)

    theta0 = jnp.broadcast_to(
        jnp.asarray(theta_init if theta_init is not None else 0.1,
                    dtype=dtype),
        (dim,),
    )
    if theta_fixed:
        # ThetaTuning::Fixed: collapse theta bounds so only sigma2/noise
        # are optimized (ref: sparse_algorithm.rs:472)
        tb = jnp.stack([theta0, theta0], axis=1)

    eps = float(jnp.finfo(dtype).eps)
    noise0 = jnp.asarray(
        noise if noise is not None else SGP_NOISE_INIT, dtype=dtype
    )
    nb = noise_bounds if noise_bounds is not None else (
        SGP_NOISE_BOUNDS_EPS_FACTOR * eps, SGP_NOISE_UPPER
    )
    nb = (jnp.asarray(nb[0], dtype=dtype), jnp.asarray(nb[1], dtype=dtype))

    if nugget is None:
        nugget = 1000.0 * eps

    return fit_sgp_core(
        x, y, z, theta0, tb[:, 0], tb[:, 1], noise0, nb, key,
        corr=corr, method=method, kpls_dim=kpls_dim, n_start=n_start,
        max_iters=max_iters, estimate_noise=estimate_noise, nugget=nugget,
        ls_batch=ls_batch, theta0_alt=theta0_alt,
    )
