"""Whole-run fused Egor: K EGO iterations as ONE XLA program.

The fused single-iteration path (ego/fused_step.py) already collapses one
iteration to one dispatch + one fetch, so the Egor loop on a
remote-attached TPU is bound by the per-iteration tunnel roundtrip
(~40-70 ms measured) while the in-program compute is a few ms. When the
user's objective is itself jax-traceable, nothing forces a host visit per
iteration at all: this module runs a CHUNK of K iterations as one
lax.scan — per step it draws multistart seeds from the current DoE with
the traceable MiddlePicker, fits the surrogates, optimizes the infill
criterion, evaluates the objective IN-PROGRAM, imputes non-finite values,
applies the L1 de-dup/retry rule and appends to the padded DoE buffers.
One host fetch per chunk returns the per-step rows; the warm-start thetas
stay on device between chunks.

The reference has no analog — its objective is always a host callback
(crates/ego/src/egor.rs:142-330); the loop structure mirrored here is
ego_step/select_next_points (solver_impl.rs:398-640) with these
documented divergences (all opt-in via ``Egor(traced_run=True)``):

- multistart seeds come from the traceable MiddlePicker keyed on the JAX
  stream (start_points.middle_picker_starts_traced), not the host numpy
  Generator — same semantics, different randomness;
- a duplicate proposal skips the append and the NEXT scan step retries
  with fresh seeds (the host loop re-draws within the same iteration);
  ``max_retries`` consecutive duplicates freeze the run (converged),
  mirroring MAX_POINT_ADDITION_RETRY;
- the de-dup threshold is 100 * eps of the COMPUTE dtype (f32 on TPU),
  not of float64 (utils/misc.rs:44-53 uses f64 eps);
- per-iteration observers/recorders (outdir artifacts, hot-start
  checkpoints) are not written mid-chunk — Egor.minimize falls back to
  the host loop when they are requested;
- ``q_points > 1``: the qEI virtual-point loop (KB/KBLB/KBUB/CLMIN,
  ref: solver_computations.rs:261-292) runs as an inner lax.scan per
  iteration; all q true evaluations happen in-program (vmapped fobj) and
  each proposal de-dups against the live buffer, so intra-batch
  duplicates retry like host-loop ones.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..doe.lhs import maximin_lhs
from .config import MAX_POINT_ADDITION_RETRY as MAX_RETRIES
from .fused_step import _select_core
from .start_points import middle_picker_starts_traced
from .surrogates import surrogate_valvar_single

_RUN_STATICS = (
    "corr", "trend", "kpls_dim", "gp_n_start", "gp_max_iters", "nugget",
    "n_cloud", "crit", "cstr_strategy", "n_cstr", "cstr_infill",
    "optimizer", "ls_batch", "n_iters", "fobj", "n_start", "use_middle",
    "use_feasibility_first", "fcstr_fns", "q_points", "qei", "q_optmod",
    "trego", "n_local_steps",
)


def _best_x(xbuf, ybuf, cbuf, mask, all_tols, n_cstr):
    """x of the (min violation-sum, then min objective) row — the traced
    TREGO trust-region center (host mirror: state.x_data[best_index] with
    find_result.find_best_result_index ordering)."""
    inf = jnp.asarray(jnp.inf, ybuf.dtype)
    obj = jnp.where(mask, ybuf[:, 0], inf)
    c = jnp.concatenate([ybuf[:, 1:1 + n_cstr], cbuf], axis=1)
    if c.shape[1] == 0:
        return xbuf[jnp.argmin(obj)]
    over = jnp.maximum(c - all_tols[None, :], 0.0)
    viol = jnp.where(mask, jnp.sum(over, axis=1), inf)
    vmin = jnp.min(viol)
    return xbuf[jnp.argmin(jnp.where(viol == vmin, obj, inf))]


def _best_fmin(ybuf, cbuf, mask, all_tols, n_cstr):
    """fmin under the constraint-tolerance ordering: the objective of the
    row with (min violation-sum, then min objective) — traced mirror of
    find_result.find_best_result_index (ref: find_result.rs:76-142).
    Constraint columns are the surrogate constraints (ybuf[:, 1:]) then
    the function-constraint evaluations (cbuf); ``all_tols`` covers both.
    Also returns whether any active row is feasible."""
    inf = jnp.asarray(jnp.inf, ybuf.dtype)
    obj = jnp.where(mask, ybuf[:, 0], inf)
    c = jnp.concatenate([ybuf[:, 1:1 + n_cstr], cbuf], axis=1)
    if c.shape[1] == 0:
        return jnp.min(obj), jnp.any(mask)
    over = jnp.maximum(c - all_tols[None, :], 0.0)
    viol = jnp.where(mask, jnp.sum(over, axis=1), inf)
    vmin = jnp.min(viol)
    fmin = jnp.min(jnp.where(viol == vmin, obj, inf))
    feas = jnp.any(mask & (viol == 0.0))
    return fmin, feas


def _best_row(ybuf, mask):
    """The y row with the minimum objective over active rows — the
    constant-liar value for the CLMIN qEI strategy. Deliberately the
    UNCONSTRAINED argmin of y[:, 0]: the reference compute_virtual_point
    (solver_computations.rs:269-274) and this repo's host loop
    (solver.py) both impute the plain objective minimum, not the
    (violation-sum, objective)-ordered best."""
    inf = jnp.asarray(jnp.inf, ybuf.dtype)
    obj = jnp.where(mask, ybuf[:, 0], inf)
    return ybuf[jnp.argmin(obj)]


def _impute_row(yk, ybuf, mask):
    """Non-finite entries of the freshly-evaluated row become a
    worst-observed penalty per column (max + 3 sigma over the active,
    always-finite history) — traced mirror of solver.impute_failed_values.
    """
    dtype = ybuf.dtype
    m = mask.astype(dtype)[:, None]
    cnt = jnp.maximum(jnp.sum(m, axis=0), 1.0)
    mean = jnp.sum(ybuf * m, axis=0) / cnt
    var = jnp.sum((ybuf - mean[None, :]) ** 2 * m, axis=0) / cnt
    colmax = jnp.max(
        jnp.where(mask[:, None], ybuf, -jnp.inf), axis=0
    )
    penalty = colmax + 3.0 * jnp.maximum(jnp.sqrt(var), 1.0)
    return jnp.where(jnp.isfinite(yk), yk, penalty.astype(dtype))


@partial(jax.jit, static_argnames=_RUN_STATICS)
def fused_run_chunk(
    xbuf: jnp.ndarray,  # (nb, nx) padded DoE
    ybuf: jnp.ndarray,  # (nb, m) padded outputs
    cbuf: jnp.ndarray,  # (nb, n_fcstr) function-constraint evaluations
    mask: jnp.ndarray,  # (nb,) active rows
    theta0s: jnp.ndarray,  # (m, dim) warm-start inits
    theta_lo: jnp.ndarray,
    theta_up: jnp.ndarray,
    base_key: jnp.ndarray,  # chunk PRNG key (per-step keys fold in j)
    lo: jnp.ndarray,  # (nx,) optimization box
    hi: jnp.ndarray,
    cstr_tols: jnp.ndarray,  # (n_cstr,) surrogate-constraint tolerances
    fcstr_tols: jnp.ndarray,  # (n_fcstr,) function-constraint tolerances
    retries0: jnp.ndarray,  # int32: remaining duplicate retries
    done0: jnp.ndarray,  # bool: run already frozen (converged / target)
    target: jnp.ndarray,  # scalar: stop when best obj < target
    iter0: jnp.ndarray = None,  # int32 global iteration offset (q_optmod /
    # TREGO modulo schedules; None -> 0)
    trego_state: tuple = None,  # (sigma, in_local, prev_fmin) carried
    # TREGO scheduler state (trego=True only)
    trego_consts: tuple = None,  # (gamma, beta, d0 (nx,), d1 (nx,))
    *,
    n_iters: int,
    fobj,  # jax-traceable (1, nx) -> (1, 1 + n_cstr)
    n_start: int,
    use_middle: bool,
    use_feasibility_first: bool,
    corr: str,
    trend: str,
    kpls_dim,
    gp_n_start: int,
    gp_max_iters: int,
    nugget: float,
    n_cloud: int,
    crit: str,
    cstr_strategy: str,
    n_cstr: int,
    cstr_infill: bool,
    optimizer: str,
    ls_batch: int = 8,
    fcstr_fns: tuple = (),  # jax-traceable (nx,) -> scalar constraints
    q_points: int = 1,
    qei: str = "KB",  # virtual-point strategy for q_points > 1
    q_optmod: int = 1,  # fit thetas every q_optmod-th iteration (lax.cond
    # skips the MLE on the others — mirror of solver.py:537)
    trego: bool = False,  # in-scan TREGO scheduler (trego.py trego_step)
    n_local_steps: int = 4,
):
    """Run ``n_iters`` EGO iterations in-program. Returns
    (rows (n_iters, q, nx + m + n_fcstr + 2), theta_last (m, dim), aux):
    each row is [x_jt, y_jt, c_jt, appended_flag, done_flag] — the host
    replays the appends to advance its numpy state, so ONE fetch per chunk
    suffices; ``aux`` is the carried TREGO scheduler state
    (sigma, in_local, prev_fmin) when ``trego`` else (). The caller must
    size the buffers with at least ``n_iters * q_points`` free slots.

    ``q_optmod > 1``: the surrogate MLE runs only on iterations with
    ``(iter0 + j) % q_optmod == 0``; the others realize the surrogates at
    the carried thetas via lax.cond (in-scan mirror of the host loop's
    optimize_theta flag, solver.py:537 — VERDICT r3 weak #5).

    ``trego=True``: the TREGO scheduler (trego.py trego_step, ref
    egor_solver.rs:454-529) runs inside the scan — sigma/phase/prev-best
    ride the carry, the success test ``fmin < prev_fmin - sigma^2`` is
    scalar math, and local steps draw their multistart seeds from a
    maximin LHS inside [x_best - d0, x_best + d1] ∩ box (the criterion
    still optimizes over the full box, matching trego.rs:53-76).

    ``q_points > 1`` proposes a q-point batch per iteration via an inner
    lax.scan over virtual points (the qEI constant-liar family, ref:
    compute_virtual_point, solver_computations.rs:261-292) — step t fits
    on the DoE augmented with t virtual rows, then ALL q proposals are
    evaluated with the true objective and appended (each de-dup'd against
    the live buffer, so intra-batch duplicates also retry)."""
    dtype = xbuf.dtype
    nx = xbuf.shape[1]
    m = ybuf.shape[1]
    nb = xbuf.shape[0]
    q = q_points
    n_sub_max = max(nb // 10, 2)
    dedup_tol = 100.0 * float(jnp.finfo(dtype).eps)
    all_tols = jnp.concatenate([cstr_tols, fcstr_tols])
    conf = {"KB": 0.0, "KBLB": -3.0, "KBUB": 3.0, "CLMIN": 0.0}[qei]
    it0 = jnp.asarray(0, jnp.int32) if iter0 is None else iter0
    if trego:
        t_gamma, t_beta, t_d0, t_d1 = trego_consts

    def step(carry, j):
        (xb, yb, cb, mb, th0, retries, done, sigma, in_local,
         prev_fmin) = carry
        it = it0 + j
        fmin, feas = _best_fmin(yb, cb, mb, all_tols, n_cstr)
        kj = jax.random.fold_in(base_key, j)
        kfit, kcloud, kseed = jax.random.split(kj, 3)
        feas_flag = feas if use_feasibility_first else None
        y_best = _best_row(yb, mb)
        do_fit = (it % q_optmod == 0) if q_optmod != 1 else None
        if trego:
            # scheduler (trego.py trego_step): success test against the
            # pre-append best of the previous iteration
            last_success = fmin < prev_fmin - sigma**2
            prev_step_ego = ~in_local
            grow, shrink = sigma * t_gamma, sigma * t_beta
            sigma = jnp.where(
                it == 0, sigma,
                jnp.where(
                    ~prev_step_ego,
                    jnp.where(last_success, grow, shrink),
                    jnp.where(last_success, grow, sigma),
                ),
            )
            is_global = (last_success & prev_step_ego) | (
                it % (1 + n_local_steps) == 0
            )
            xbest = _best_x(xb, yb, cb, mb, all_tols, n_cstr)
            loc_lo = jnp.maximum(lo, xbest - t_d0)
            loc_hi = jnp.minimum(hi, xbest + t_d1)

        def qstep(qcarry, t):
            # virtual-point loop: buffers carry the KB/CLMIN-imputed rows
            # (q == 1 keeps the unfolded keys — bit-identical stream to
            # the pre-q implementation)
            xv, yv, mv, thv = qcarry
            kf = kfit if q == 1 else jax.random.fold_in(kfit, t)
            kc = kcloud if q == 1 else jax.random.fold_in(kcloud, t)
            ks = kseed if q == 1 else jax.random.fold_in(kseed, t)
            if use_middle:
                starts = middle_picker_starts_traced(
                    ks, xv, mv, lo, hi, n_start, n_sub_max
                )
            else:
                fill = maximin_lhs(ks, n_start, nx, False, 5, dtype)
                starts = lo[None, :] + fill * (hi - lo)[None, :]
            if trego:
                # local steps seed inside the trust region (global steps
                # keep the picker seeds); criterion box stays lo/hi
                fill_l = maximin_lhs(
                    jax.random.fold_in(ks, 1), n_start, nx, False, 5,
                    dtype,
                )
                starts_local = (
                    loc_lo[None, :] + fill_l * (loc_hi - loc_lo)[None, :]
                )
                starts = jnp.where(is_global, starts, starts_local)
            starts = jnp.clip(starts, lo[None, :], hi[None, :])
            xk, fk, models = _select_core(
                xv, yv, mv, thv, theta_lo, theta_up, kf, kc,
                starts, lo, hi, fmin, cstr_tols,
                fcstr_tols if fcstr_fns else None, feas_flag,
                corr=corr, trend=trend, kpls_dim=kpls_dim,
                gp_n_start=gp_n_start, gp_max_iters=gp_max_iters,
                fixed=False, nugget=nugget, n_cloud=n_cloud, crit=crit,
                cstr_strategy=cstr_strategy, n_cstr=n_cstr,
                cstr_infill=cstr_infill, feasibility=True,
                optimizer=optimizer, ls_batch=ls_batch,
                fcstr_fns=fcstr_fns, do_fit=do_fit,
            )
            if q > 1:
                means, vrs = surrogate_valvar_single(models, xk)
                if qei == "CLMIN":
                    yk_virt = y_best
                else:
                    obj = means[0] + conf * jnp.sqrt(
                        jnp.maximum(vrs[0], 0.0)
                    )
                    yk_virt = jnp.concatenate([obj[None], means[1:]])
                idx = jnp.sum(mv)
                xv = xv.at[idx].set(xk)
                yv = yv.at[idx].set(yk_virt.astype(dtype))
                mv = mv.at[idx].set(True)
            return (xv, yv, mv, models.theta), xk

        (_, _, _, theta_q), xq = lax.scan(
            qstep, (xb, yb, mb, th0), jnp.arange(q)
        )

        if q == 1:
            yq = jnp.asarray(fobj(xq[0][None, :]), dtype).reshape((1, m))
        else:
            yq = jax.vmap(
                lambda r: jnp.asarray(fobj(r[None, :]), dtype).reshape(
                    (m,)
                )
            )(xq)
        if fcstr_fns:
            cq = jax.vmap(
                lambda r: jnp.stack(
                    [jnp.asarray(f(r), dtype).reshape(())
                     for f in fcstr_fns]
                )
            )(xq)
        else:
            cq = jnp.zeros((q, 0), dtype)

        def astep(acarry, inp):
            # append loop: de-dup + imputation against the LIVE buffer so
            # intra-batch duplicates are rejected too
            ab, ayb, acb, amb, any_ok = acarry
            xk, yk, ck = inp
            yk = _impute_row(yk, ayb, amb)
            d = jnp.sum(jnp.abs(ab - xk[None, :]), axis=1)
            dup = jnp.any(amb & (d < dedup_tol))
            ok = ~done & ~dup
            idx = jnp.sum(amb)
            ab = jnp.where(ok, ab.at[idx].set(xk), ab)
            ayb = jnp.where(ok, ayb.at[idx].set(yk), ayb)
            acb = jnp.where(ok, acb.at[idx].set(ck), acb)
            amb = jnp.where(ok, amb.at[idx].set(True), amb)
            row = jnp.concatenate(
                [xk, yk, ck, ok.astype(dtype)[None]]
            )
            return (ab, ayb, acb, amb, any_ok | ok), row

        (xb, yb, cb, mb, any_ok), rows_j = lax.scan(
            astep, (xb, yb, cb, mb, jnp.asarray(False)), (xq, yq, cq)
        )
        retries = jnp.where(
            any_ok, MAX_RETRIES, jnp.where(done, retries, retries - 1)
        )
        fmin2, _ = _best_fmin(yb, cb, mb, all_tols, n_cstr)
        done = done | (retries <= 0) | (fmin2 < target)
        rows_j = jnp.concatenate(
            [rows_j,
             jnp.broadcast_to(done.astype(dtype), (q,))[:, None]],
            axis=1,
        )
        if trego:
            in_local = ~is_global
            prev_fmin = fmin  # next step's success test baseline
        return (
            (xb, yb, cb, mb, theta_q, retries, done, sigma, in_local,
             prev_fmin),
            rows_j,
        )

    if trego_state is not None:
        sigma0, in_local0, prev_fmin0 = trego_state
    else:
        one = jnp.asarray(1.0, dtype)
        sigma0, in_local0 = one, jnp.asarray(False)
        prev_fmin0 = jnp.asarray(jnp.inf, dtype)
    carry0 = (xbuf, ybuf, cbuf, mask, theta0s, retries0, done0,
              sigma0, in_local0, prev_fmin0)
    (_, _, _, _, theta_last, _, _, sigma_l, in_local_l, prev_fmin_l), rows = (
        lax.scan(step, carry0, jnp.arange(n_iters))
    )
    aux = (sigma_l, in_local_l, prev_fmin_l) if trego else ()
    return rows, theta_last, aux


def run_traced(solver, state, fobj, max_iters: int,
               chunk_iters: int | None = None, fcstrs=()):
    """Drive ``fused_run_chunk`` from the host: per chunk, pad the numpy
    state into bucketed device buffers, dispatch one K-iteration program,
    fetch the per-step rows and replay the appends. ``state`` is mutated
    like solver.ego_step would (x/y/c_data, best_index, feasibility,
    iter). Warm-start thetas ride between chunks as device arrays.

    Returns the updated state. Chunk size defaults to the pad bucket, so
    the chunked run hits the same compiled-shape grid as the host loop."""
    from ..config import default_dtype
    from .solver import (
        _bucket, _CRIT_NAME, _CSTR_NAME, _OPT_NAME, _QEI_NAME,
    )

    cfg = solver.config
    dtype = default_dtype()
    chunk = int(chunk_iters or cfg.shape_bucket)
    m = state.y_data.shape[1]
    theta0s, t_lo, t_up = solver._theta_setup(state, m)
    use_middle = not os.environ.get(
        "EGOR_DO_NOT_USE_MIDDLEPICKER_MULTISTARTER"
    )
    use_feas = bool(os.environ.get("EGOR_USE_MAX_PROBA_OF_FEASIBILITY"))
    n_cstr = cfg.n_cstr
    n_fc = len(fcstrs)
    tols = jnp.asarray(state.cstr_tol[:n_cstr], dtype)
    fc_tols = jnp.asarray(
        state.cstr_tol[n_cstr:n_cstr + n_fc], dtype
    )
    lo = jnp.asarray(np.ascontiguousarray(solver.xlimits[:, 0]), dtype)
    hi = jnp.asarray(np.ascontiguousarray(solver.xlimits[:, 1]), dtype)
    target = jnp.asarray(cfg.target, dtype)
    retries = jnp.asarray(state.no_point_added_retries, jnp.int32)
    done = jnp.asarray(False)

    trego_on = bool(cfg.trego.activated)
    trego_state = None
    trego_consts = None
    if trego_on:
        d0, d1 = cfg.trego.d
        nx_t = solver.nx
        trego_consts = (
            jnp.asarray(cfg.trego.gamma, dtype),
            jnp.asarray(cfg.trego.beta, dtype),
            jnp.full((nx_t,), d0, dtype),
            jnp.full((nx_t,), d1, dtype),
        )
        pb = state.prev_best_index
        prev_fmin0 = (
            float(state.y_data[pb, 0]) if pb is not None else np.inf
        )
        trego_state = (
            jnp.asarray(state.sigma, dtype),
            jnp.asarray(bool(state.in_local_phase)),
            jnp.asarray(prev_fmin0, dtype),
        )

    remaining = int(max_iters) - int(state.iter)
    nx = solver.nx
    # warm-refit width: the cold fit (iter 0) runs in its own k=1 first
    # chunk at the full n_start width; chunks starting at iter >= 1
    # re-seed only warm_refit_n_start lanes on top of the carried
    # thetas — the same boundary as the host loop's _gp_n_start(state),
    # so the two paths keep identical streams (solver.py; measured 2.2x
    # constrained traced throughput, tools/prof_g24_stage2.py). Cost:
    # one extra small-chunk program per config (persistent-cached).
    wrns = cfg.warm_refit_n_start
    base_ns = solver.spec.n_start
    crit = _CRIT_NAME[cfg.infill_strategy]
    cstrat = _CSTR_NAME[cfg.cstr_strategy]
    opt = _OPT_NAME[cfg.infill_optimizer]
    q = int(cfg.q_points)
    qei = _QEI_NAME[cfg.q_infill_strategy]
    warm_refit_on = wrns is not None and base_ns > 0
    while remaining > 0:
        if warm_refit_on and int(state.iter) < 1:
            k = 1  # cold fit: full-width MLE in its own chunk
            gp_ns = base_ns
        elif warm_refit_on:
            k = min(chunk, remaining)
            gp_ns = min(base_ns, int(wrns))
        else:
            k = min(chunk, remaining)
            gp_ns = base_ns
        n = state.x_data.shape[0]
        nb = _bucket(n + k * q, cfg.shape_bucket)
        xp = np.zeros((nb, nx))
        xp[:n] = state.x_data
        yp = np.zeros((nb, m))
        yp[:n] = state.y_data
        cp = np.zeros((nb, n_fc))
        cp[:n] = state.c_data
        msk = np.zeros(nb, dtype=bool)
        msk[:n] = True
        rows, theta_last, aux = fused_run_chunk(
            jnp.asarray(xp, dtype), jnp.asarray(yp, dtype),
            jnp.asarray(cp, dtype), jnp.asarray(msk),
            theta0s, t_lo, t_up,
            solver._next_key(), lo, hi, tols, fc_tols, retries, done,
            target,
            jnp.asarray(int(state.iter), jnp.int32),
            trego_state, trego_consts,
            n_iters=k, fobj=fobj, n_start=cfg.n_start,
            use_middle=use_middle, use_feasibility_first=use_feas,
            corr=solver.spec.corr, trend=solver.spec.trend,
            kpls_dim=solver.spec.kpls_dim,
            gp_n_start=gp_ns,
            gp_max_iters=solver.spec.max_iters,
            nugget=solver.spec.nugget,
            n_cloud=min(100 * nx, 1000), crit=crit,
            cstr_strategy=cstrat, n_cstr=n_cstr,
            cstr_infill=cfg.cstr_infill, optimizer=opt,
            ls_batch=solver.spec.ls_batch, fcstr_fns=tuple(fcstrs),
            q_points=q, qei=qei, q_optmod=int(cfg.q_optmod),
            trego=trego_on, n_local_steps=int(cfg.trego.n_local_steps),
        )
        theta0s = theta_last  # stays on device between chunks
        if trego_on:
            trego_state = aux  # device carry rides between chunks
            state.sigma = float(aux[0])
            state.in_local_phase = bool(aux[1])
        arr = np.array(rows)  # (k, q, w): the single fetch per chunk
        app_step = arr[:, :, nx + m + n_fc] > 0.5  # (k, q)
        flat = arr.reshape(k * q, -1)
        appended = flat[:, nx + m + n_fc] > 0.5
        done_flags = flat[:, nx + m + n_fc + 1] > 0.5
        new_x = flat[appended, :nx]
        new_y = flat[appended, nx:nx + m]
        new_c = flat[appended, nx + m:nx + m + n_fc]
        state.x_data = np.vstack([state.x_data, new_x])
        state.y_data = np.vstack([state.y_data, new_y])
        state.c_data = np.vstack([state.c_data, new_c])
        state.prev_added = state.added
        state.added += new_x.shape[0]
        state.iter += k
        remaining -= k
        if done_flags.any():
            # the device carry froze the run (retries exhausted or target
            # reached); report a faithful retry counter
            state.no_point_added_retries = 0
            break
        # replay the retry counter: it resets on every iteration that
        # appended at least one point, so the carried value is MAX_RETRIES
        # minus the trailing all-duplicate iteration streak
        trailing = 0
        for flag in app_step.any(axis=1)[::-1]:
            if flag:
                break
            trailing += 1
        state.no_point_added_retries = MAX_RETRIES - trailing
        retries = jnp.asarray(MAX_RETRIES - trailing, jnp.int32)

    state.theta_inits = theta0s
    from .find_result import find_best_result_index, is_feasible

    best = find_best_result_index(
        state.y_data, state.c_data, state.cstr_tol
    )
    state.prev_best_index = state.best_index
    state.best_index = best
    state.feasibility = state.feasibility or is_feasible(
        state.y_data[best], state.c_data[best], state.cstr_tol
    )
    return state
