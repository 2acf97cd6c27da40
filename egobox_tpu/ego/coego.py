"""CoEGO: cooperative EGO for high-dimensional problems (nx > ~100).

Behavioral parity with crates/ego/src/solver/coego.rs: each iteration
randomly partitions the components into n_coop groups
(get_random_activity, coego.rs:55-84) and optimizes the infill criterion
group-by-group while the inactive components stay pinned to the current
best point (the context vector, set_active_x/get_active_x, coego.rs:26-44).

TPU-first note: partial optimization reuses the SAME jitted multistart
program as the full path — inactive dimensions are pinned by collapsing
their box bounds to the context value, so the projection in the bounded
L-BFGS freezes them (no recompilation per group: bounds are traced values).
The reference additionally needs *partial theta tuning* because its
derivative-free COBYLA cannot handle >100 hyperparameters
(set_partial_theta_tuning, coego.rs:98-126); our gradient-based fit scales
to full-dimension theta directly, and partial tuning remains available via
fit_gp(active=...).
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np


def get_random_activity(rng: np.random.Generator, nx: int,
                        n_coop: int) -> List[np.ndarray]:
    """Random partition of [0, nx) into ~n_coop groups
    (ref: get_random_activity, coego.rs:55-84)."""
    g_nb = min(n_coop, nx)
    idx = rng.permutation(nx)
    return [np.sort(g) for g in np.array_split(idx, g_nb)]


def coego_optimize_infill(
    solver,
    models,
    xbest: np.ndarray,
    activity: List[np.ndarray],
    starts_fn,
    lo: np.ndarray,
    hi: np.ndarray,
    optimize_kwargs: dict,
):
    """Sequential per-group partial infill optimization with a context
    vector (ref: coego.rs partial optimization + solver_infill_optim).

    ``starts_fn(group_lo, group_hi)`` returns (k, nx) full-dim start points
    (they will be pinned outside the group). Returns (x_opt, infill_obj).
    """
    from .infill_optim import optimize_infill

    xcoop = np.asarray(xbest, dtype=float).copy()
    f_last = np.inf
    for group in activity:
        pin_lo = xcoop.copy()
        pin_hi = xcoop.copy()
        pin_lo[group] = lo[group]
        pin_hi[group] = hi[group]

        starts = np.asarray(starts_fn())
        # pin the inactive components of every start to the context vector
        mask = np.zeros(xcoop.shape[0], dtype=bool)
        mask[group] = True
        starts = np.where(mask[None, :], starts, xcoop[None, :])

        xk, fk, _ = optimize_infill(
            models,
            jnp.asarray(starts),
            jnp.asarray(pin_lo),
            jnp.asarray(pin_hi),
            **optimize_kwargs,
        )
        xcoop = np.asarray(xk)
        f_last = float(fk)
    return xcoop, f_last
