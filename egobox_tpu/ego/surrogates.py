"""Surrogate training for the EGO solver.

TPU-first replacement for the reference's per-output rayon fan-out
(crates/ego/src/solver/solver_impl.rs:636-657 trains 1 objective +
n_cstr constraint mixtures on parallel threads): here the (1 + n_cstr) GP
fits share the same X and run as ONE vmapped program over the output axis —
multistart x outputs all advance in lockstep on-chip.

The ``SurrogateBuilder`` protocol mirrors ego/src/types.rs:145-184 so
alternative surrogates (the MoE mixture, mixed-integer decorators) plug into
the same solver.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..gp.fit import (
    GP_DEFAULT_THETA_BOUNDS,
    GP_DEFAULT_THETA_INIT,
    fit_gp_core,
)
from ..gp.gp import GpModel, predict_valvar


@dataclass(frozen=True)
class GpSpec:
    """Static GP configuration for surrogate training (subset of the
    reference GpConfig, ego/src/solver/egor_config.rs)."""

    corr: str = "squared_exponential"
    trend: str = "constant"
    kpls_dim: Optional[int] = None
    n_start: int = 10
    max_iters: int = 50
    nugget: float = 100.0 * 2.220446049250313e-16
    #: speculative-parallel line-search width for the (small-n) EGO-loop
    #: fits — all alphas evaluated as one batched forward
    #: (optim/lbfgsb.py ls_batch); 0/1 = classic sequential backtracking
    ls_batch: int = 8

    @property
    def theta_dim_of(self):
        return lambda nx: self.kpls_dim if self.kpls_dim is not None else nx


@partial(
    jax.jit,
    static_argnames=("corr", "trend", "kpls_dim", "n_start", "max_iters",
                     "fixed", "nugget", "ls_batch"),
)
def _fit_batch(x, ys, mask, theta0s, lo, up, active, key, *, corr, trend,
               kpls_dim, n_start, max_iters, fixed, nugget, ls_batch=8):
    def fit_one(y, theta0):
        return fit_gp_core(
            x, y[:, None], mask, theta0, lo, up, active, key,
            corr=corr, trend=trend, kpls_dim=kpls_dim, n_start=n_start,
            max_iters=max_iters, fixed=fixed, nugget=nugget,
            ls_batch=ls_batch,
        )

    return jax.vmap(fit_one)(ys, theta0s)


def train_gp_surrogates(
    x: jnp.ndarray,  # (n, nx)
    y_all: jnp.ndarray,  # (n, m) objective + constraints columns
    mask: jnp.ndarray,  # (n,)
    spec: GpSpec,
    theta0s: Optional[jnp.ndarray] = None,  # (m, dim) warm-start inits
    optimize_theta: bool = True,
    theta_bounds=None,
    seed: int = 42,
    active_theta: Optional[jnp.ndarray] = None,  # (dim,) bool
    n_start: Optional[int] = None,  # override spec.n_start (warm refits)
) -> GpModel:
    """Fit one GP per column of ``y_all``; returns a batched GpModel pytree
    with leading axis m.

    ``optimize_theta=False`` reuses ``theta0s`` as fixed hyperparameters —
    the reference's q_optmod thinning (solver_impl.rs:643-645).
    ``active_theta`` restricts the optimization to a subset of theta
    components, the inactive ones staying pinned at their init — CoEGO's
    partial theta tuning (ref: coego.rs:98-126 set_partial_theta_tuning).
    The mask is a traced value, so per-group refits reuse one compilation.
    """
    n, nx = x.shape
    m = y_all.shape[1]
    dtype = x.dtype
    dim = spec.kpls_dim if spec.kpls_dim is not None else nx

    if theta0s is None:
        theta0s = jnp.full((m, dim), GP_DEFAULT_THETA_INIT, dtype=dtype)
    tb = theta_bounds if theta_bounds is not None else GP_DEFAULT_THETA_BOUNDS
    tb = jnp.asarray(tb, dtype=dtype)
    if tb.ndim == 1:
        tb = jnp.broadcast_to(tb[None, :], (dim, 2))
    lo, up = tb[:, 0], tb[:, 1]
    # clip warm-started inits into the bounds
    theta0s = jnp.clip(theta0s, lo[None, :], up[None, :])

    if active_theta is None:
        active_theta = jnp.ones((dim,), dtype=bool)
    key = jax.random.key(seed)
    return _fit_batch(
        x, y_all.T, mask, theta0s, lo, up, active_theta, key,
        corr=spec.corr, trend=spec.trend, kpls_dim=spec.kpls_dim,
        n_start=spec.n_start if n_start is None else n_start,
        max_iters=spec.max_iters,
        fixed=not optimize_theta, nugget=spec.nugget,
        ls_batch=spec.ls_batch,
    )


def surrogate_valvar_single(models, x: jnp.ndarray):
    """Posterior (means, vars) at ONE point for either surrogate container:
    a batched GpModel (leading axis = outputs) or a tuple of MoeModel
    mixtures (one per output). Dispatch happens at trace time."""
    if isinstance(models, tuple):
        from ..moe.moe import moe_predict_valvar_single

        pairs = [moe_predict_valvar_single(m, x) for m in models]
        return (
            jnp.stack([p[0] for p in pairs]),
            jnp.stack([p[1] for p in pairs]),
        )
    return predict_valvar_single(models, x)


def surrogate_valvar_cloud(models, x: jnp.ndarray):
    """Posterior (means, vars) over a cloud: (m, p) pairs for either
    surrogate container."""
    if isinstance(models, tuple):
        from ..moe.moe import moe_predict_valvar_batch

        pairs = [moe_predict_valvar_batch(m, x) for m in models]
        return (
            jnp.stack([p[0] for p in pairs]),
            jnp.stack([p[1] for p in pairs]),
        )
    return predict_valvar_cloud(models, x)


def predict_valvar_single(models: GpModel, x: jnp.ndarray):
    """Posterior (means, variances) of every batched model at ONE point
    x (nx,) -> ((m,), (m,)). Used inside the infill criterion."""
    f = lambda mdl: predict_valvar(mdl, x[None, :])
    means, vrs = jax.vmap(f)(models)
    return means[:, 0], vrs[:, 0]


def predict_valvar_cloud(models: GpModel, x: jnp.ndarray):
    """Posterior (means, variances) of every batched model over a cloud
    x (p, nx) -> ((m, p), (m, p))."""
    f = lambda mdl: predict_valvar(mdl, x)
    return jax.vmap(f)(models)
