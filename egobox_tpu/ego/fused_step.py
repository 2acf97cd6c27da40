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

Round-3 widening (VERDICT r2 item 4):
- ``fcstr_fns``: jax-traceable user function constraints enter the jitted
  optimizer as hard constraints (scale from the cloud, mirroring
  solver_computations.rs:181-189) instead of the host polish;
- ``fused_select_points_q``: q_points > 1 as ONE program — a lax.scan over
  virtual points (KB/KBLB/KBUB/CLMIN imputation,
  solver_computations.rs:261-292) that appends each virtual row to the
  padded DoE and refits, so a q-point iteration still costs one dispatch +
  one fetch.

Used by EgorSolver.select_next_points on the single-cluster GP surrogate
path (no MoE, no CoEGO, no portfolio); the general path keeps the
phase-per-program structure.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..doe.lhs import LhsKind, lhs_normalized, maximin_lhs
from ..gp.fit import fit_gp_core
from .infill_optim import compute_scaling, optimize_infill
from .start_points import middle_picker_starts_traced
from .surrogates import surrogate_valvar_single

_FUSED_STATICS = (
    "corr", "trend", "kpls_dim", "gp_n_start", "gp_max_iters", "fixed",
    "nugget", "n_cloud", "crit", "cstr_strategy", "n_cstr",
    "cstr_infill", "feasibility", "optimizer", "ls_batch", "fcstr_fns",
)


def _select_core(
    xp, yp, mask, theta0s, theta_lo, theta_up, fit_key, cloud_key,
    starts, lo, hi, fmin, cstr_tols, fcstr_tols, feas_flag=None,
    *,
    corr, trend, kpls_dim, gp_n_start, gp_max_iters, fixed, nugget,
    n_cloud, crit, cstr_strategy, n_cstr, cstr_infill, feasibility,
    optimizer, ls_batch, fcstr_fns, do_fit=None,
):
    """Shared traced body: fit surrogates, build the scaling cloud, run the
    multistart infill optimization. Returns (xk, fk, models).

    ``do_fit``: optional TRACED bool (q_optmod inside the whole-run scan,
    ego/fused_run.py): when False, the MLE is skipped via lax.cond and the
    surrogates are merely realized at the carried thetas (fixed=True
    branch) — the in-program mirror of the host loop's
    ``optimize_theta = iter % q_optmod == 0`` (solver.py:537). None keeps
    the static ``fixed`` flag (the fused single-step path, which compiles
    one program per variant)."""
    nx = xp.shape[1]
    dim = theta0s.shape[1]
    dtype = xp.dtype
    active = jnp.ones((dim,), dtype=bool)
    # clip warm-started inits inside the program (an eager clip would cost
    # a dispatch roundtrip per iteration on a remote-attached device)
    theta0s = jnp.clip(theta0s, theta_lo[None, :], theta_up[None, :])

    def fit_one(y, theta0, fx):
        return fit_gp_core(
            xp, y[:, None], mask, theta0, theta_lo, theta_up, active,
            fit_key, corr=corr, trend=trend, kpls_dim=kpls_dim,
            n_start=gp_n_start, max_iters=gp_max_iters, fixed=fx,
            nugget=nugget, ls_batch=ls_batch,
        )

    if do_fit is None:
        models = jax.vmap(partial(fit_one, fx=fixed))(yp.T, theta0s)
    else:
        models = lax.cond(
            do_fit,
            lambda: jax.vmap(partial(fit_one, fx=False))(yp.T, theta0s),
            lambda: jax.vmap(partial(fit_one, fx=True))(yp.T, theta0s),
        )

    # scaling cloud: maximin LHS over the optimization box
    # (ref: solver_computations.rs:132-193)
    cloud = lhs_normalized(cloud_key, n_cloud, nx, LhsKind.MAXIMIN, dtype)
    cloud = lo[None, :] + cloud * (hi - lo)[None, :]
    scale_infill, scale_cstr, scale_wb2 = compute_scaling(
        models, cloud, fmin, cstr_tols,
        crit=crit, n_cstr=n_cstr, cstr_infill=cstr_infill,
    )

    scale_fcstr = None
    if fcstr_fns:
        # scale for the function constraints: max |g| over the scaling
        # cloud (ref: solver_computations.rs:181-189)
        gcloud = jnp.stack(
            [jax.vmap(lambda p, _f=f: jnp.asarray(_f(p), dtype)
                      .reshape(()))(cloud) for f in fcstr_fns]
        )  # (n_fcstr, n_cloud)
        scale_fcstr = jnp.maximum(
            jnp.max(jnp.abs(gcloud), axis=1), 1e-12
        )

    xk, fk, _ = optimize_infill(
        models, starts, lo, hi, fmin, scale_infill, scale_wb2, scale_cstr,
        cstr_tols, 1.0, fcstr_tols, scale_fcstr, feas_flag,
        crit=crit, cstr_strategy=cstr_strategy, n_cstr=n_cstr,
        cstr_infill=cstr_infill, feasibility=feasibility,
        optimizer=optimizer, fcstr_fns=fcstr_fns,
    )
    return xk, fk, models


@partial(jax.jit, static_argnames=_FUSED_STATICS)
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
    fcstr_tols: jnp.ndarray = None,  # (n_fcstr,)
    feas_flag: jnp.ndarray = None,  # traced per-problem feasibility bool
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
    fcstr_fns: tuple = (),
):
    """Returns (packed, models): ``packed = [x_next (nx), -infill_value]``
    so the host fetches everything in one transfer; ``models`` is the
    batched GpModel (stays on device for the warm-start/recorder paths)."""
    dtype = xp.dtype
    xk, fk, models = _select_core(
        xp, yp, mask, theta0s, theta_lo, theta_up, fit_key, cloud_key,
        starts, lo, hi, fmin, cstr_tols, fcstr_tols, feas_flag,
        corr=corr, trend=trend, kpls_dim=kpls_dim, gp_n_start=gp_n_start,
        gp_max_iters=gp_max_iters, fixed=fixed, nugget=nugget,
        n_cloud=n_cloud, crit=crit, cstr_strategy=cstr_strategy,
        n_cstr=n_cstr, cstr_infill=cstr_infill, feasibility=feasibility,
        optimizer=optimizer, ls_batch=ls_batch, fcstr_fns=fcstr_fns,
    )
    packed = jnp.concatenate([xk, fk[None].astype(dtype)])
    return packed, models


@partial(
    jax.jit,
    static_argnames=_FUSED_STATICS + ("q_points", "qei", "use_middle"),
)
def fused_select_points_q(
    xp: jnp.ndarray,  # (nb, nx) padded DoE
    yp: jnp.ndarray,  # (nb, m)
    mask: jnp.ndarray,  # (nb,)
    theta0s: jnp.ndarray,  # (m, dim)
    theta_lo: jnp.ndarray,
    theta_up: jnp.ndarray,
    fit_key: jnp.ndarray,
    cloud_key: jnp.ndarray,
    starts0: jnp.ndarray,  # (k, nx): step-0 multistart seeds (host picker)
    seeds_key: jnp.ndarray,  # PRNG key for the in-scan per-step seeds
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    fmin: jnp.ndarray,
    cstr_tols: jnp.ndarray,
    y_best_row: jnp.ndarray,  # (m,) current best output row (CLMIN liar)
    fcstr_tols: jnp.ndarray = None,
    seed_lo: jnp.ndarray = None,  # (nx,) seed box (TREGO region); None=box
    seed_hi: jnp.ndarray = None,
    *,
    q_points: int,
    qei: str,  # KB | KBLB | KBUB | CLMIN
    use_middle: bool = True,
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
    fcstr_fns: tuple = (),
):
    """q-point batch proposal as ONE program: lax.scan over virtual points.
    Step j fits the surrogates on the DoE augmented with the j virtual
    rows, optimizes the infill criterion, and imputes the new point's
    outputs with the ``qei`` strategy (ref: compute_virtual_point,
    solver_computations.rs:261-292; the reference loops this on the host,
    solver_impl.rs:562-640, paying a full train+optimize dispatch chain per
    point). fmin stays fixed across the virtual steps (parity with the
    unfused q_points loop, solver.py:537-670).

    Multistart seeds: step 0 consumes ``starts0`` (the host MiddlePicker
    on the actual DoE, same as the q=1 path); steps j >= 1 draw their
    seeds IN-PROGRAM from the AUGMENTED DoE via the traceable
    MiddlePicker (start_points.middle_picker_starts_traced) — matching
    the unfused loop's re-run of the picker over DoE + virtual rows
    (solver_impl.rs:566-585) without a host roundtrip. ``use_middle=False``
    (TREGO local steps / env kill-switch) draws plain maximin LHS in the
    ``seed_lo``/``seed_hi`` box instead.

    Returns (packed (q, nx + 1 + m), theta_last (m, dim)): each packed row
    is [x_j (nx), f_j (1), y_virtual_j (m)] so the host fetches all q
    proposals and their imputed outputs in one transfer.
    """
    dtype = xp.dtype
    nx = xp.shape[1]
    m = yp.shape[1]
    q = q_points
    n_start_k = starts0.shape[0]
    if seed_lo is None:
        seed_lo, seed_hi = lo, hi
    # q - 1 extra padded slots for the virtual rows (the padded buffer may
    # be full at bucket boundaries)
    xbuf = jnp.concatenate([xp, jnp.zeros((q - 1, nx), dtype)], axis=0)
    ybuf = jnp.concatenate([yp, jnp.zeros((q - 1, m), dtype)], axis=0)
    mbuf = jnp.concatenate(
        [mask, jnp.zeros((q - 1,), dtype=bool)], axis=0
    )
    n_sub_max = max(xbuf.shape[0] // 10, 2)

    conf = {"KB": 0.0, "KBLB": -3.0, "KBUB": 3.0, "CLMIN": 0.0}[qei]

    def step(carry, j):
        xb, yb, mb, th0 = carry
        kj = jax.random.fold_in(seeds_key, j)
        if use_middle:
            starts_traced = middle_picker_starts_traced(
                kj, xb, mb, seed_lo, seed_hi, n_start_k, n_sub_max
            )
        else:
            fill = maximin_lhs(kj, n_start_k, nx, False, 5, dtype)
            starts_traced = (
                seed_lo[None, :] + fill * (seed_hi - seed_lo)[None, :]
            )
        starts_traced = jnp.clip(starts_traced, lo[None, :], hi[None, :])
        starts_j = jnp.where(j == 0, starts0, starts_traced)
        xk, fk, models = _select_core(
            xb, yb, mb, th0, theta_lo, theta_up,
            jax.random.fold_in(fit_key, j),
            jax.random.fold_in(cloud_key, j),
            starts_j, lo, hi, fmin, cstr_tols, fcstr_tols,
            corr=corr, trend=trend, kpls_dim=kpls_dim,
            gp_n_start=gp_n_start, gp_max_iters=gp_max_iters, fixed=fixed,
            nugget=nugget, n_cloud=n_cloud, crit=crit,
            cstr_strategy=cstr_strategy, n_cstr=n_cstr,
            cstr_infill=cstr_infill, feasibility=feasibility,
            optimizer=optimizer, ls_batch=ls_batch, fcstr_fns=fcstr_fns,
        )
        # virtual outputs at xk (compute_virtual_point)
        means, vrs = surrogate_valvar_single(models, xk)
        if qei == "CLMIN":
            yk = y_best_row
        else:
            obj = means[0] + conf * jnp.sqrt(jnp.maximum(vrs[0], 0.0))
            yk = jnp.concatenate([obj[None], means[1:]])
        idx = jnp.sum(mb)  # active rows form a contiguous prefix
        xb = xb.at[idx].set(xk)
        yb = yb.at[idx].set(yk)
        mb = mb.at[idx].set(True)
        packed_j = jnp.concatenate(
            [xk, fk[None].astype(dtype), yk.astype(dtype)]
        )
        return (xb, yb, mb, models.theta), packed_j

    (_, _, _, theta_last), packed = lax.scan(
        step, (xbuf, ybuf, mbuf, theta0s), jnp.arange(q)
    )
    return packed, theta_last


@partial(
    jax.jit, static_argnames=_FUSED_STATICS + ("k_clusters", "smooth")
)
def fused_select_point_moe(
    xp: jnp.ndarray,  # (nb, nx) padded DoE
    yp: jnp.ndarray,  # (nb, m)
    mask: jnp.ndarray,  # (nb,)
    gmxs: tuple,  # per-output GaussianMixture pytrees (k clusters each)
    theta0s: jnp.ndarray,  # (m, k, dim) per-expert warm-start inits
    theta_lo: jnp.ndarray,
    theta_up: jnp.ndarray,
    fit_key: jnp.ndarray,
    cloud_key: jnp.ndarray,
    starts: jnp.ndarray,
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    fmin: jnp.ndarray,
    cstr_tols: jnp.ndarray,
    fcstr_tols: jnp.ndarray = None,
    feas_flag: jnp.ndarray = None,
    *,
    k_clusters: int,
    smooth: bool,
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
    fcstr_fns: tuple = (),
):
    """The clustered-mixture EGO iteration as ONE program (VERDICT r3
    weak #3: the MoE path paid 4-5 dispatch+sync roundtrips per iteration
    with no fused option). Given the host-side clustering (the gmx
    pytrees from state.clusterings — EM/recluster events stay on the
    host, they happen at most every 10 appended points,
    solver.have_to_recluster), everything per-iteration is traced:

    - cluster assignment of the padded DoE rows (predict_probas argmax),
    - per-(output, cluster) expert fits as one vmapped masked
      fit_gp_core batch (m*k lanes; a cluster with < 3 active rows falls
      back to the full mask, mirroring moe.train_moe_on_clusters),
    - the usual scaling cloud + multistart infill optimization over the
      MoeModel tuple (the criterion machinery already consumes mixtures,
      surrogates.surrogate_valvar_*).

    Restricted to a single regr/corr combo (no CV expert selection
    in-program) and a common k across outputs — the solver gate
    (_fast_path_moe_ok) falls back to the host path otherwise.
    Ref: make_clustered_surrogate, solver_impl.rs:121-296.

    Known divergences from the reference's clustered retrain
    (moe/src/algorithm.rs:179-194), by design:

    - the heaviside factor AND the GMM stay FROZEN between host-side
      recluster events — the reference re-runs the heaviside holdout
      search whenever it retrains smooth mixtures, this path only
      refits the experts (the factor is refreshed at the next
      recluster, every 10 appended points);
    - a cluster with < 3 active rows widens to the FULL valid mask
      (matching moe.train_moe_on_clusters' host fallback, verified
      lane-by-lane in tests/test_fused_moe.py), while train_moe's
      initial fit falls back to all-cluster-rows instead.

    Returns (packed [x (nx), -crit (1)], models tuple, theta_last
    (m, k, dim))."""
    from ..moe.gaussian_mixture import predict_cluster
    from ..moe.moe import MoeModel

    dtype = xp.dtype
    nb, nx = xp.shape
    m = yp.shape[1]
    k = k_clusters
    dim = theta0s.shape[2]
    active = jnp.ones((dim,), dtype=bool)
    theta0s = jnp.clip(
        theta0s, theta_lo[None, None, :], theta_up[None, None, :]
    )

    assigns = jnp.stack(
        [predict_cluster(g, xp) for g in gmxs]
    )  # (m, nb)
    cl = jnp.arange(k)
    masks = (
        mask[None, None, :]
        & (assigns[:, None, :] == cl[None, :, None])
    )  # (m, k, nb)
    cnt = jnp.sum(masks, axis=2, keepdims=True)
    masks = jnp.where(cnt < 3, mask[None, None, :], masks)

    ys_flat = jnp.broadcast_to(
        yp.T[:, None, :], (m, k, nb)
    ).reshape(m * k, nb)
    masks_flat = masks.reshape(m * k, nb)
    th_flat = theta0s.reshape(m * k, dim)

    def fit_one(y, theta0, mc):
        return fit_gp_core(
            xp, y[:, None], mc, theta0, theta_lo, theta_up, active,
            fit_key, corr=corr, trend=trend, kpls_dim=kpls_dim,
            n_start=gp_n_start, max_iters=gp_max_iters, fixed=fixed,
            nugget=nugget, ls_batch=ls_batch,
        )

    experts_bat = jax.vmap(fit_one)(ys_flat, th_flat, masks_flat)

    models = tuple(
        MoeModel(
            experts=tuple(
                jax.tree.map(lambda a, _i=j * k + c: a[_i], experts_bat)
                for c in range(k)
            ),
            gmx=gmxs[j],
            smooth=smooth,
        )
        for j in range(m)
    )

    cloud = lhs_normalized(cloud_key, n_cloud, nx, LhsKind.MAXIMIN, dtype)
    cloud = lo[None, :] + cloud * (hi - lo)[None, :]
    scale_infill, scale_cstr, scale_wb2 = compute_scaling(
        models, cloud, fmin, cstr_tols,
        crit=crit, n_cstr=n_cstr, cstr_infill=cstr_infill,
    )

    scale_fcstr = None
    if fcstr_fns:
        gcloud = jnp.stack(
            [jax.vmap(lambda p, _f=f: jnp.asarray(_f(p), dtype)
                      .reshape(()))(cloud) for f in fcstr_fns]
        )
        scale_fcstr = jnp.maximum(jnp.max(jnp.abs(gcloud), axis=1), 1e-12)

    xk, fk, _ = optimize_infill(
        models, starts, lo, hi, fmin, scale_infill, scale_wb2, scale_cstr,
        cstr_tols, 1.0, fcstr_tols, scale_fcstr, feas_flag,
        crit=crit, cstr_strategy=cstr_strategy, n_cstr=n_cstr,
        cstr_infill=cstr_infill, feasibility=feasibility,
        optimizer=optimizer, fcstr_fns=fcstr_fns,
    )
    packed = jnp.concatenate([xk, fk[None].astype(dtype)])
    theta_last = experts_bat.theta.reshape(m, k, dim)
    return packed, models, theta_last


@partial(jax.jit, static_argnames=_FUSED_STATICS)
def fused_select_point_batch(
    xp, yp, mask, theta0s, theta_lo, theta_up, fit_keys, cloud_keys,
    starts, lo, hi, fmin, cstr_tols, feas_flags=None, **statics,
):
    """vmap of ``fused_select_point`` over a leading problem axis: B
    independent EGO iterations (B surrogate fits + B multistart infill
    optimizations) advance in lockstep as ONE program — the portfolio-scale
    batched Egor (ROADMAP "batched multi-problem Egor"; no reference
    counterpart — the TPU's batch axis replaces running B processes).

    Batched args: xp (B, nb, nx), yp (B, nb, m), mask (B, nb),
    theta0s (B, m, dim), fit_keys/cloud_keys (B,) PRNG keys,
    starts (B, k, nx), lo/hi (B, nx), fmin (B,), optional feas_flags (B,)
    per-problem feasibility-first switches (traced; see
    infill_optim.optimize_infill). Shared: theta bounds, cstr_tols."""
    f = partial(fused_select_point, **statics)
    if feas_flags is None:
        return jax.vmap(
            f, in_axes=(0, 0, 0, 0, None, None, 0, 0, 0, 0, 0, 0, None)
        )(xp, yp, mask, theta0s, theta_lo, theta_up, fit_keys, cloud_keys,
          starts, lo, hi, fmin, cstr_tols)
    return jax.vmap(
        f,
        in_axes=(0, 0, 0, 0, None, None, 0, 0, 0, 0, 0, 0, None, None, 0),
    )(xp, yp, mask, theta0s, theta_lo, theta_up, fit_keys, cloud_keys,
      starts, lo, hi, fmin, cstr_tols, None, feas_flags)
