"""Gaussian-process model: a frozen pytree + functional predict paths.

TPU-first redesign of crates/gp/src/algorithm.rs: the trained model is a
pytree (so it can be vmapped over experts/constraints and donated through
jit), and every prediction path is a pure function of (model, x). Gradients
of the mean/variance come from jax.grad/jacfwd instead of the reference's
hand-written jacobians (algorithm.rs:443-726) — those remain test oracles.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct
from jax.scipy.linalg import solve_triangular

from .kernels import corr_cross
from .likelihood import GpInnerParams
from .trends import trend_basis


@struct.dataclass
class GpModel:
    """Trained GP (ref struct: gp/src/algorithm.rs:174-192).

    Supports row padding: ``mask`` marks active training rows; padded rows
    are exact no-ops in every code path (their gamma entries are zero and
    their Cholesky block is the identity).
    """

    x_norm: jnp.ndarray  # (n, nx) normalized training inputs
    x_mean: jnp.ndarray  # (nx,)
    x_std: jnp.ndarray  # (nx,)
    y_mean: jnp.ndarray  # (1,)
    y_std: jnp.ndarray  # (1,)
    theta: jnp.ndarray  # (dim,)
    w_star: Optional[jnp.ndarray]  # (nx, ncomp) KPLS weights or None
    beta: jnp.ndarray  # (p, 1)
    gamma: jnp.ndarray  # (n, 1)
    r_chol: jnp.ndarray  # (n, n)
    ft: jnp.ndarray  # (n, p)
    ft_qr_r: jnp.ndarray  # (p, p)
    sigma2: jnp.ndarray  # scalar (denormalized process variance)
    likelihood: jnp.ndarray  # scalar reduced likelihood at the optimum
    mask: jnp.ndarray  # (n,) active-row mask
    corr: str = struct.field(pytree_node=False)
    trend: str = struct.field(pytree_node=False)

    # convenience accessors mirroring the reference API
    @property
    def n_train(self):
        return jnp.sum(self.mask)

    @property
    def dims(self):
        nx = self.x_norm.shape[1]
        return (nx, 1)


def _xnorm(model: GpModel, x: jnp.ndarray) -> jnp.ndarray:
    return (x - model.x_mean) / model.x_std


def _corr_to_train(model: GpModel, xnorm: jnp.ndarray) -> jnp.ndarray:
    r = corr_cross(model.corr, xnorm, model.x_norm, model.theta,
                   model.w_star)
    return r * model.mask.astype(r.dtype)[None, :]


def predict(model: GpModel, x: jnp.ndarray) -> jnp.ndarray:
    """Posterior mean at x (n, nx) -> (n,). (ref: algorithm.rs:253-263)"""
    xnorm = _xnorm(model, x)
    f = trend_basis(model.trend, xnorm)
    r = _corr_to_train(model, xnorm)
    y = f @ model.beta + r @ model.gamma
    return (y * model.y_std + model.y_mean)[:, 0]


def _rt_u(model: GpModel, xnorm: jnp.ndarray, r: jnp.ndarray):
    """(ref: algorithm.rs:330-369) rt = L^-1 r^T ; u = Rqr^-T (Ft^T rt - F^T)."""
    rt = solve_triangular(model.r_chol, r.T, lower=True)  # (n, m)
    f = trend_basis(model.trend, xnorm)
    rhs = model.ft.T @ rt - f.T  # (p, m)
    u = solve_triangular(model.ft_qr_r.T, rhs, lower=True)
    return rt, u


def predict_var(model: GpModel, x: jnp.ndarray) -> jnp.ndarray:
    """Posterior variance at x -> (n,), clipped >= 0
    (ref: algorithm.rs:267-307)."""
    xnorm = _xnorm(model, x)
    r = _corr_to_train(model, xnorm)
    rt, u = _rt_u(model, xnorm, r)
    mse = model.sigma2 * (
        1.0 - jnp.sum(rt**2, axis=0) + jnp.sum(u**2, axis=0)
    )
    return jnp.maximum(mse, 0.0)


def predict_valvar(model: GpModel, x: jnp.ndarray):
    """(mean, variance) sharing the correlation work
    (ref: algorithm.rs predict_valvar)."""
    xnorm = _xnorm(model, x)
    f = trend_basis(model.trend, xnorm)
    r = _corr_to_train(model, xnorm)
    y = f @ model.beta + r @ model.gamma
    mean = (y * model.y_std + model.y_mean)[:, 0]
    rt, u = _rt_u(model, xnorm, r)
    mse = model.sigma2 * (
        1.0 - jnp.sum(rt**2, axis=0) + jnp.sum(u**2, axis=0)
    )
    return mean, jnp.maximum(mse, 0.0)


def predict_gradients(model: GpModel, x: jnp.ndarray) -> jnp.ndarray:
    """d mean / dx per row -> (n, nx). Exact derivatives via jax.grad of the
    mean (replaces hand-written jacobians, algorithm.rs:510-550)."""
    g = jax.grad(lambda xi: predict(model, xi[None, :])[0])
    return jax.vmap(g)(x)


def predict_kth_derivatives(model: GpModel, x: jnp.ndarray,
                            kx: int) -> jnp.ndarray:
    """d mean / dx_kx per row -> (n,) (ref: algorithm.rs:443-506 SqExp
    shortcut — here exact for every kernel via the full jacobian)."""
    return predict_gradients(model, x)[:, kx]


def predict_var_gradients(model: GpModel, x: jnp.ndarray) -> jnp.ndarray:
    """d var / dx per row -> (n, nx) (ref: algorithm.rs:554-617)."""
    g = jax.grad(lambda xi: predict_var(model, xi[None, :])[0])
    return jax.vmap(g)(x)


def predict_valvar_gradients(model: GpModel, x: jnp.ndarray):
    """(d mean/dx, d var/dx) (ref: algorithm.rs:712-726)."""
    return predict_gradients(model, x), predict_var_gradients(model, x)


def posterior_cov(model: GpModel, x: jnp.ndarray) -> jnp.ndarray:
    """Posterior covariance matrix at x (m, m), denormalized
    (ref: algorithm.rs:310-326)."""
    xnorm = _xnorm(model, x)
    r = _corr_to_train(model, xnorm)
    rt, u = _rt_u(model, xnorm, r)
    k = corr_cross(model.corr, xnorm, xnorm, model.theta, model.w_star)
    return model.sigma2 * (k - rt.T @ rt + u.T @ u)


def sample(model: GpModel, x: jnp.ndarray, n_traj: int, key,
           method: str = "eig") -> jnp.ndarray:
    """Draw conditioned trajectories at x -> (m, n_traj)
    (ref: algorithm.rs:383-410, 1153-1194)."""
    cov = posterior_cov(model, x)
    m = cov.shape[0]
    if method == "chol":
        c = jnp.linalg.cholesky(
            cov + 1e-9 * model.sigma2 * jnp.eye(m, dtype=cov.dtype)
        )
    else:
        evals, evecs = jnp.linalg.eigh(cov)
        evals = jnp.maximum(evals, 1e-9)
        c = evecs @ (jnp.sqrt(evals)[:, None] * evecs.T)
    mean = predict(model, x)[:, None]
    z = jax.random.normal(key, (m, n_traj), dtype=cov.dtype)
    return mean + c @ z


def inner_params(model: GpModel) -> GpInnerParams:
    return GpInnerParams(
        sigma2=model.sigma2,
        beta=model.beta,
        gamma=model.gamma,
        r_chol=model.r_chol,
        ft=model.ft,
        ft_qr_r=model.ft_qr_r,
    )
