"""Fused EGO iteration: train + scaling cloud + infill optimization as ONE
jitted program.

The unfused solver path dispatches 4-5 separate programs per iteration
(surrogate fit, LHS cloud, scaling, infill optimization, virtual point) with
a host sync between training and the rest (theta warm-start fetch). On a
remote-attached TPU each dispatch+fetch pays a tunnel roundtrip (~30-60 ms
measured), so the small-problem Egor loop was latency-bound, not
compute-bound. This module fuses the whole device side of
``select_next_points`` (ref: solver_impl.rs:562-807 — which the reference
runs as separate rayon stages) into one XLA program with ONE host fetch per
iteration: the proposed point, its criterion value, and the fitted thetas
ride back in a single packed row.

Used by EgorSolver.select_next_points when the single-cluster GP surrogate
path applies (no MoE, no CoEGO, no portfolio, q_points=1, no user function
constraints); the general path keeps the phase-per-program structure.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..doe.lhs import LhsKind, lhs_normalized
from ..gp.fit import fit_gp_core
from .infill_optim import compute_scaling, optimize_infill


@partial(
    jax.jit,
    static_argnames=(
        "corr", "trend", "kpls_dim", "gp_n_start", "gp_max_iters", "fixed",
        "nugget", "n_cloud", "crit", "cstr_strategy", "n_cstr",
        "cstr_infill", "feasibility", "optimizer", "ls_batch",
    ),
)
def fused_select_point(
    xp: jnp.ndarray,  # (nb, nx) padded DoE
    yp: jnp.ndarray,  # (nb, m) padded outputs (objective + constraints)
    mask: jnp.ndarray,  # (nb,) active rows
    theta0s: jnp.ndarray,  # (m, dim) warm-start inits (already clipped)
    theta_lo: jnp.ndarray,  # (dim,)
    theta_up: jnp.ndarray,  # (dim,)
    fit_key: jnp.ndarray,  # PRNG key for the fit multistart
    cloud_key: jnp.ndarray,  # PRNG key for the scaling cloud LHS
    starts: jnp.ndarray,  # (k, nx) infill multistart seeds
    lo: jnp.ndarray,  # (nx,) optimization box
    hi: jnp.ndarray,
    fmin: jnp.ndarray,  # scalar: current best objective
    cstr_tols: jnp.ndarray,  # (n_cstr,)
    *,
    corr: str,
    trend: str,
    kpls_dim,
    gp_n_start: int,
    gp_max_iters: int,
    fixed: bool,
    nugget: float,
    n_cloud: int,
    crit: str,
    cstr_strategy: str,
    n_cstr: int,
    cstr_infill: bool,
    feasibility: bool,
    optimizer: str,
    ls_batch: int = 8,
):
    """Returns (packed, models): ``packed = [x_next (nx), -infill_value]``
    so the host fetches everything in one transfer; ``models`` is the
    batched GpModel (stays on device for the warm-start/recorder paths)."""
    nx = xp.shape[1]
    dim = theta0s.shape[1]
    dtype = xp.dtype
    active = jnp.ones((dim,), dtype=bool)
    # clip warm-started inits inside the program (an eager clip would cost
    # a dispatch roundtrip per iteration on a remote-attached device)
    theta0s = jnp.clip(theta0s, theta_lo[None, :], theta_up[None, :])

    def fit_one(y, theta0):
        return fit_gp_core(
            xp, y[:, None], mask, theta0, theta_lo, theta_up, active,
            fit_key, corr=corr, trend=trend, kpls_dim=kpls_dim,
            n_start=gp_n_start, max_iters=gp_max_iters, fixed=fixed,
            nugget=nugget, ls_batch=ls_batch,
        )

    models = jax.vmap(fit_one)(yp.T, theta0s)

    # scaling cloud: maximin LHS over the optimization box
    # (ref: solver_computations.rs:132-193)
    cloud = lhs_normalized(cloud_key, n_cloud, nx, LhsKind.MAXIMIN, dtype)
    cloud = lo[None, :] + cloud * (hi - lo)[None, :]
    scale_infill, scale_cstr, scale_wb2 = compute_scaling(
        models, cloud, fmin, cstr_tols,
        crit=crit, n_cstr=n_cstr, cstr_infill=cstr_infill,
    )

    xk, fk, _ = optimize_infill(
        models, starts, lo, hi, fmin, scale_infill, scale_wb2, scale_cstr,
        cstr_tols, crit=crit, cstr_strategy=cstr_strategy, n_cstr=n_cstr,
        cstr_infill=cstr_infill, feasibility=feasibility,
        optimizer=optimizer,
    )
    packed = jnp.concatenate([xk, fk[None].astype(dtype)])
    return packed, models


@partial(
    jax.jit,
    static_argnames=(
        "corr", "trend", "kpls_dim", "gp_n_start", "gp_max_iters", "fixed",
        "nugget", "n_cloud", "crit", "cstr_strategy", "n_cstr",
        "cstr_infill", "feasibility", "optimizer", "ls_batch",
    ),
)
def fused_select_point_batch(
    xp, yp, mask, theta0s, theta_lo, theta_up, fit_keys, cloud_keys,
    starts, lo, hi, fmin, cstr_tols, **statics,
):
    """vmap of ``fused_select_point`` over a leading problem axis: B
    independent EGO iterations (B surrogate fits + B multistart infill
    optimizations) advance in lockstep as ONE program — the portfolio-scale
    batched Egor (ROADMAP "batched multi-problem Egor"; no reference
    counterpart — the TPU's batch axis replaces running B processes).

    Batched args: xp (B, nb, nx), yp (B, nb, m), mask (B, nb),
    theta0s (B, m, dim), fit_keys/cloud_keys (B,) PRNG keys,
    starts (B, k, nx), lo/hi (B, nx), fmin (B,). Shared: theta bounds,
    cstr_tols."""
    f = partial(fused_select_point, **statics)
    return jax.vmap(
        f, in_axes=(0, 0, 0, 0, None, None, 0, 0, 0, 0, 0, 0, None)
    )(xp, yp, mask, theta0s, theta_lo, theta_up, fit_keys, cloud_keys,
      starts, lo, hi, fmin, cstr_tols)
