"""EgorSolver: the EGO iteration engine.

TPU-first redesign of crates/ego/src/solver/{egor_solver.rs,solver_impl.rs}:
the outer ask/eval/tell loop stays in Python (it calls the user's objective),
while every phase — surrogate training for objective+constraints (vmapped),
scaling-cloud evaluation, and the constrained multistart infill optimization
— is one jit-compiled program. The growing DoE is padded to static shape
buckets so XLA re-uses compilations across iterations (SURVEY.md §7).
"""

from __future__ import annotations

import logging
import os
import time
from functools import partial
from typing import Callable, List, Optional, Sequence

logger = logging.getLogger("egobox_tpu.ego")

import jax
import jax.numpy as jnp
import numpy as np

from ..config import default_dtype
from ..doe.lhs import LhsKind, lhs_normalized, scale_to_xlimits
from ..gp.kernels import theta_bounds_heuristic
from ..types import (
    ConstraintStrategy,
    InfillOptimizer,
    InfillStrategy,
    QInfillStrategy,
)
from .config import MAX_POINT_ADDITION_RETRY, EgorConfig
from .find_result import (
    find_best_result_index,
    find_best_result_index_from,
    is_feasible,
)
from .infill_optim import compute_scaling, optimize_infill, virtual_point
from .recorders import record_gp_models
from .start_points import middle_picker_starts
from .state import EgorState
from .surrogates import GpSpec, train_gp_surrogates

_CRIT_NAME = {
    InfillStrategy.EI: "EI",
    InfillStrategy.WB2: "WB2",
    InfillStrategy.WB2S: "WB2S",
    InfillStrategy.LOG_EI: "LogEI",
}
_CSTR_NAME = {
    ConstraintStrategy.MC: "MC",
    ConstraintStrategy.UTB: "UTB",
}
_QEI_NAME = {
    QInfillStrategy.KB: "KB",
    QInfillStrategy.KBLB: "KBLB",
    QInfillStrategy.KBUB: "KBUB",
    QInfillStrategy.CLMIN: "CLMIN",
}
_OPT_NAME = {
    InfillOptimizer.COBYLA: "COBYLA",
    InfillOptimizer.SLSQP: "SLSQP",
}


class NoMorePointToAddError(RuntimeError):
    """Raised when point-addition retries are exhausted — the solver is
    considered converged (ref: solver_impl.rs:505-515)."""


@partial(jax.jit, static_argnames=("ns", "nx"))
def _lhs_in_prog(key, xlimits, *, ns: int, nx: int):
    """split + maximin LHS + scale as one program (see _lhs_in)."""
    new_key, sub = jax.random.split(key)
    pts = lhs_normalized(sub, ns, nx, LhsKind.MAXIMIN, xlimits.dtype)
    return new_key, scale_to_xlimits(pts, xlimits)


def impute_failed_values(y_new: np.ndarray, y_ref: np.ndarray) -> np.ndarray:
    """Replace non-finite entries of ``y_new`` (rows, cols) with a
    worst-observed penalty per column derived from the finite values of
    ``y_ref`` (max + 3 sigma; a fixed 1e6 when the column has no finite
    reference at all). Shared by the single-problem solver (new points AND
    the initial DoE) and EgorBatch — a NaN/inf anywhere in the history
    would otherwise poison the GP normalization."""
    bad = ~np.isfinite(y_new)
    if not bad.any():
        return y_new
    logger.warning("imputing %d failed objective value(s)",
                   int(bad.sum()))
    y_new = y_new.copy()
    for j in range(y_new.shape[1]):
        col_ref = y_ref[:, j]
        finite = col_ref[np.isfinite(col_ref)]
        if finite.size:
            penalty = finite.max() + 3.0 * max(finite.std(), 1.0)
        else:
            penalty = 1e6
        y_new[bad[:, j], j] = penalty
    return y_new


def _bucket(n: int, b: int) -> int:
    return max(b, ((n + b - 1) // b) * b)


class EgorSolver:
    """Continuous-space EGO solver. Mixed-integer handling wraps this via
    egobox_tpu.ego.mixint (like the reference's MixintGpMixture decorators).
    """

    def __init__(self, config: EgorConfig, xlimits: np.ndarray):
        self.config = config.check()
        self.xlimits = np.asarray(xlimits, dtype=float)
        self.nx = self.xlimits.shape[0]
        gpc = config.gp_config
        dim = gpc.kpls_dim if gpc.kpls_dim is not None else self.nx
        corr = gpc.corr_names[0]
        trend = gpc.regr_names[0]
        self.spec = GpSpec(
            corr=corr,
            trend=trend,
            kpls_dim=gpc.kpls_dim,
            n_start=gpc.n_start,
            max_iters=gpc.max_eval,
        )
        # dim-aware theta bounds for high-dim problems
        # (ref: ego/src/utils/bounds.rs via egor_solver)
        if gpc.theta_bounds is not None:
            self.theta_bounds = np.asarray(gpc.theta_bounds, dtype=float)
        elif dim >= 10:
            lo, up = theta_bounds_heuristic(corr, dim)
            self.theta_bounds = np.array([float(lo), float(up)])
        else:
            self.theta_bounds = np.array([1e-2, 1e1])
        self.theta_init = (
            np.asarray(gpc.theta_init, dtype=float)
            if gpc.theta_init is not None
            else None
        )
        self._key = jax.random.key(
            config.seed if config.seed is not None else 0
        )
        #: optional discrete-casting hook installed by the mixint layer
        #: (ref: MixintGpMixture input casting, gpmix/mixint.rs:295-746)
        self.cast_fn = None
        #: device-array caches for the fused fast path (one-time uploads;
        #: every eager device_put is a dispatch roundtrip on axon)
        self._theta_bounds_dev = None
        self._box_dev = {}
        self._fcstr_trace_cache = {}

    def _cast(self, x: np.ndarray) -> np.ndarray:
        return self.cast_fn(x) if self.cast_fn is not None else x

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _lhs(self, n: int, kind=LhsKind.MAXIMIN) -> np.ndarray:
        pts = lhs_normalized(self._next_key(), n, self.nx, kind,
                             default_dtype())
        return np.asarray(
            scale_to_xlimits(pts, jnp.asarray(self.xlimits))
        )

    def default_n_doe(self) -> int:
        n = self.config.n_doe
        return n if n > 0 else max(self.nx + 1, 5)

    def _pad(self, x: np.ndarray, y: np.ndarray):
        n = x.shape[0]
        nb = _bucket(n, self.config.shape_bucket)
        xp = np.zeros((nb, x.shape[1]))
        xp[:n] = x
        yp = np.zeros((nb, y.shape[1]))
        yp[:n] = y
        mask = np.zeros(nb, dtype=bool)
        mask[:n] = True
        return (
            jnp.asarray(xp),
            jnp.asarray(yp),
            jnp.asarray(mask),
        )

    # ------------------------------------------------------------------
    # initialization (ref: egor_solver.rs:181-348)
    # ------------------------------------------------------------------

    def init_state(
        self,
        fobj: Callable[[np.ndarray], np.ndarray],
        fcstrs: Sequence[Callable] = (),
        doe: Optional[np.ndarray] = None,
        y_doe: Optional[np.ndarray] = None,
    ) -> EgorState:
        cfg = self.config
        if doe is None:
            doe = (
                np.asarray(cfg.doe, dtype=float)
                if cfg.doe is not None
                else self._cast(
                    self._lhs(self.default_n_doe(), LhsKind.OPTIMIZED)
                )
            )
        x_data = np.atleast_2d(np.asarray(doe, dtype=float))
        if y_doe is not None:
            y_data = np.atleast_2d(np.asarray(y_doe, dtype=float))
        else:
            y_data = np.atleast_2d(np.asarray(fobj(x_data), dtype=float))
        if y_data.shape[1] != 1 + cfg.n_cstr:
            raise ValueError(
                f"objective returned {y_data.shape[1]} columns, expected "
                f"1 + n_cstr = {1 + cfg.n_cstr}"
            )
        # failed evaluations in the INITIAL DoE poison the GP normalization
        # exactly like later ones — impute them against the DoE itself
        y_data = impute_failed_values(y_data, y_data)
        c_data = self._eval_fcstrs(fcstrs, x_data)
        cstr_tol = cfg.resolved_cstr_tol(len(fcstrs))

        best = find_best_result_index(y_data, c_data, cstr_tol)
        state = EgorState(
            x_data=x_data,
            y_data=y_data,
            c_data=c_data,
            cstr_tol=cstr_tol,
            best_index=best,
            feasibility=is_feasible(y_data[best], c_data[best], cstr_tol),
            added=x_data.shape[0],
            no_point_added_retries=MAX_POINT_ADDITION_RETRY,
            sigma=cfg.trego.sigma0,
            rng=np.random.default_rng(cfg.seed),
        )
        return state

    def _eval_fcstrs(self, fcstrs, x: np.ndarray) -> np.ndarray:
        if not fcstrs:
            return np.zeros((x.shape[0], 0))
        out = np.zeros((x.shape[0], len(fcstrs)))
        for i, xi in enumerate(x):
            for j, c in enumerate(fcstrs):
                out[i, j] = float(c(xi))
        return out

    # ------------------------------------------------------------------
    # surrogate training (ref: make_clustered_surrogate,
    # solver_impl.rs:121-296 — single-cluster GP path; the MoE path plugs
    # in via egobox_tpu.moe)
    # ------------------------------------------------------------------

    def have_to_recluster(self, state: EgorState) -> bool:
        """Auto-clustered surrogates recluster every 10 added points
        (ref: solver_impl.rs:110-113)."""
        if self.config.gp_config.n_clusters > 0:
            return False
        return (
            state.clusterings is None
            or state.added // 10 > state.prev_added // 10
        )

    def _train(self, state: EgorState, xt: np.ndarray, yt: np.ndarray,
               optimize_theta: bool):
        gpc = self.config.gp_config
        multi_combo = (
            len(gpc.regr_names) > 1 or len(gpc.corr_names) > 1
        )
        if gpc.n_clusters != 1 or multi_combo:
            models = self._train_moe(state, xt, yt, optimize_theta)
        else:
            models = self._train_gp_batched(state, xt, yt, optimize_theta)
        record_gp_models(self.config.outdir, state.iter, models)
        return models

    def _train_moe(self, state: EgorState, xt: np.ndarray, yt: np.ndarray,
                   optimize_theta: bool = True):
        """Clustered-mixture surrogates, one GpMixture per output
        (ref: make_clustered_surrogate, solver_impl.rs:121-296). When
        ``optimize_theta`` is False (q_optmod skip iterations) the previous
        experts' (trend, corr, theta) are reused as FIXED hyperparameters
        (ref: solver_impl.rs:643-645)."""
        from ..moe.moe import expert_params, train_moe, train_moe_on_clusters

        gpc = self.config.gp_config
        m = yt.shape[1]
        recluster = self.have_to_recluster(state)
        mixes = []
        clusterings = [] if recluster or state.clusterings is None else None
        reuse = (
            not optimize_theta
            and clusterings is None
            and state.moe_params is not None
            and len(state.moe_params) == m
        )
        for k in range(m):
            if clusterings is not None:
                mix = train_moe(
                    xt, yt[:, k],
                    n_clusters=gpc.n_clusters,
                    recombination=gpc.recombination,
                    regr_names=gpc.regr_names,
                    corr_names=gpc.corr_names,
                    kpls_dim=gpc.kpls_dim,
                    n_start=gpc.n_start,
                    seed=int(state.rng.integers(0, 2**31)),
                    theta_init=self.theta_init,
                    theta_bounds=self.theta_bounds,
                )
                clusterings.append((mix.gmx, mix.recombination))
            else:
                gmx, recomb = state.clusterings[k]
                fixed = state.moe_params[k] if reuse else None
                if fixed is not None and len(fixed) != gmx.n_clusters:
                    fixed = None
                mix = train_moe_on_clusters(
                    xt, yt[:, k], gmx, recomb,
                    regr_names=gpc.regr_names,
                    corr_names=gpc.corr_names,
                    kpls_dim=gpc.kpls_dim,
                    n_start=gpc.n_start,
                    seed=int(state.rng.integers(0, 2**31)),
                    theta_init=self.theta_init,
                    theta_bounds=self.theta_bounds,
                    fixed_params=fixed,
                )
            mixes.append(mix)
        if clusterings is not None:
            state.clusterings = clusterings
        state.moe_params = [expert_params(mix) for mix in mixes]
        return tuple(mix.to_model() for mix in mixes)

    def _gp_n_start(self, state: EgorState) -> int:
        """Effective MLE multistart width for this iteration's refit.

        The cold fit (iter 0, no carried thetas) keeps the full
        ``n_start`` width; every warm refit (iter >= 1: state.theta_inits
        / the traced-run scan carry exist) re-seeds only
        ``warm_refit_n_start`` lanes — the carry makes full-width LHS
        re-seeding redundant, and the fit is width-bound on TPU, so this
        is the single biggest constrained-EGO throughput lever (measured
        11.1 -> ~24 it/s G24/UTB traced at held quality,
        tools/prof_g24_stage2.py D_ns4 — which held quality with even
        the COLD fit at width 4). run_traced mirrors the boundary by
        running the cold fit in its own k=1 first chunk, so the host
        loop and the traced run keep identical streams. None (or
        n_start <= 0, the fixed-theta convention) disables."""
        w = self.config.warm_refit_n_start
        ns = self.spec.n_start
        if w is None or ns <= 0 or int(state.iter) < 1:
            return ns
        return min(ns, int(w))

    def _train_gp_batched(self, state: EgorState, xt: np.ndarray,
                          yt: np.ndarray, optimize_theta: bool):
        xp, yp, mask = self._pad(xt, yt)
        dim = (
            self.spec.kpls_dim
            if self.spec.kpls_dim is not None
            else self.nx
        )
        m = yt.shape[1]
        theta0s = state.theta_inits
        if theta0s is None or theta0s.shape != (m, dim):
            if self.theta_init is not None:
                theta0s = np.broadcast_to(
                    self.theta_init, (m, dim)
                ).copy()
            else:
                theta0s = np.full((m, dim), 0.1)
        if (
            self.config.coego_n_coop > 1
            and self.config.coego_partial_theta_tuning
            and optimize_theta
            and state.activity is not None
        ):
            # CoEGO partial theta tuning: one fit per activity group, only
            # the group's theta components free, inits accumulating across
            # groups (ref: solver_impl.rs:162-247 + coego.rs:98-126).
            # The active mask is traced, so all groups share one compile.
            from .coego import activity_theta_mask

            models = None
            for group in state.activity:
                models = train_gp_surrogates(
                    xp, yp, mask, self.spec,
                    theta0s=jnp.asarray(theta0s),
                    optimize_theta=True,
                    theta_bounds=jnp.asarray(self.theta_bounds),
                    seed=int(state.rng.integers(0, 2**31)),
                    active_theta=jnp.asarray(
                        activity_theta_mask(group, dim)
                    ),
                    n_start=self._gp_n_start(state),
                )
                theta0s = np.asarray(models.theta)
            state.theta_inits = theta0s
            return models
        models = train_gp_surrogates(
            xp, yp, mask, self.spec,
            theta0s=jnp.asarray(theta0s),
            optimize_theta=optimize_theta,
            theta_bounds=jnp.asarray(self.theta_bounds),
            seed=int(state.rng.integers(0, 2**31)),
            n_start=self._gp_n_start(state),
        )
        state.theta_inits = np.asarray(models.theta)
        return models

    # ------------------------------------------------------------------
    # point selection (ref: select_next_points, solver_impl.rs:562-807)
    # ------------------------------------------------------------------

    def _multistart_seeds(self, state: EgorState, xt: np.ndarray,
                          xlimits: np.ndarray,
                          seed_xlimits: Optional[np.ndarray]) -> np.ndarray:
        """Multistart seeds: middle-picker + LHS completion for global
        steps; pure local LHS inside a TREGO trust region
        (ref: trego.rs LocalLhsMultiStarter). The env kill-switch matches
        EGOR_DO_NOT_USE_MIDDLEPICKER_MULTISTARTER (ref: utils/mod.rs)."""
        cfg = self.config
        use_middle = not os.environ.get(
            "EGOR_DO_NOT_USE_MIDDLEPICKER_MULTISTARTER"
        )
        seed_box = seed_xlimits if seed_xlimits is not None else xlimits
        if seed_box is self.xlimits and use_middle:
            starts = middle_picker_starts(
                state.rng, xt, seed_box, cfg.n_start,
                lambda n: self._lhs_in(n, seed_box),
            )
        else:
            starts = self._lhs_in(cfg.n_start, seed_box)
        return np.clip(starts, xlimits[:, 0], xlimits[:, 1])

    def _fcstrs_traceable(self, fcstrs) -> bool:
        """True when every user function constraint jax-traces to a scalar
        (probed once per function identity with jax.eval_shape) — those
        enter the fused program as hard optimizer constraints; anything
        host-bound (numpy conversions, python branching on x) falls back
        to the derivative-free polish. Kill-switch:
        EGOBOX_NO_FCSTR_TRACE."""
        if os.environ.get("EGOBOX_NO_FCSTR_TRACE"):
            return False
        # key by the function OBJECTS (kept alive by the cache), not ids —
        # a dropped lambda's id gets recycled and would alias cache hits
        key = tuple(fcstrs)
        hit = self._fcstr_trace_cache.get(key)
        if hit is not None:
            return hit
        probe = jax.ShapeDtypeStruct((self.nx,), default_dtype())
        ok = True
        for f in fcstrs:
            try:
                out = jax.eval_shape(f, probe)
                # must reduce to one scalar value (shape () or (1,))
                if (
                    not hasattr(out, "shape")
                    or int(np.prod(out.shape)) != 1
                ):
                    ok = False
                    break
            except Exception:
                ok = False
                break
        if len(self._fcstr_trace_cache) >= 32:
            self._fcstr_trace_cache.clear()
        self._fcstr_trace_cache[key] = ok
        return ok

    def _fast_path_ok(self, fcstrs) -> bool:
        """The fused single-program iteration applies on the
        single-cluster GP path (ego/fused_step.py). Round 3 widened the
        gate: q_points > 1 runs as a lax.scan over virtual points, and
        jax-traceable fcstrs enter the in-program optimizer (the q > 1
        variant returns thetas but not full models, so the GP recorder
        keeps the unfused path)."""
        gpc = self.config.gp_config
        multi_combo = (
            len(gpc.regr_names) > 1 or len(gpc.corr_names) > 1
        )
        q_ok = self.config.q_points == 1 or not os.environ.get(
            "EGOR_USE_GP_RECORDER"
        )
        return (
            q_ok
            and (not fcstrs or self._fcstrs_traceable(fcstrs))
            and gpc.n_clusters == 1
            and not multi_combo
            and self.config.coego_n_coop <= 1
            and not os.environ.get("EGOR_USE_GP_VAR_PORTFOLIO")
            and not os.environ.get("EGOBOX_NO_FUSED_STEP")
        )

    def _fast_path_moe_ok(self, state: EgorState, fcstrs) -> bool:
        """The fused CLUSTERED iteration (fused_select_point_moe) applies
        when the clustering is already established and frozen for this
        iteration (recluster events stay on the host path), a single
        regr/corr combo is configured (no CV expert selection), every
        output shares one (k, recombination), and the usual fused-path
        conditions hold. Kill-switch: EGOBOX_NO_FUSED_MOE (on top of
        EGOBOX_NO_FUSED_STEP). VERDICT r3 weak #3."""
        gpc = self.config.gp_config
        multi_combo = (
            len(gpc.regr_names) > 1 or len(gpc.corr_names) > 1
        )
        if gpc.n_clusters == 1 and not multi_combo:
            return False  # single-cluster fast path handles it
        if multi_combo:
            return False
        if (
            os.environ.get("EGOBOX_NO_FUSED_STEP")
            or os.environ.get("EGOBOX_NO_FUSED_MOE")
            or os.environ.get("EGOR_USE_GP_VAR_PORTFOLIO")
        ):
            return False
        if self.config.q_points != 1 or self.config.coego_n_coop > 1:
            return False
        if fcstrs and not self._fcstrs_traceable(fcstrs):
            return False
        if state.clusterings is None or self.have_to_recluster(state):
            return False
        if len(state.clusterings) != state.y_data.shape[1]:
            return False
        ks = {g.n_clusters for g, _ in state.clusterings}
        recombs = {r for _, r in state.clusterings}
        return len(ks) == 1 and len(recombs) == 1

    def _theta_setup(self, state: EgorState, m: int):
        """Warm-start inits + bounds as device arrays — mirrors
        train_gp_surrogates' preparation without any host/device sync on
        the warm-started thetas (clipping into bounds happens inside the
        fused program). The constant bound arrays are built once and
        cached: on a remote-attached device every eager op is a dispatch
        roundtrip."""
        dim = (
            self.spec.kpls_dim if self.spec.kpls_dim is not None else self.nx
        )
        theta0s = state.theta_inits
        if theta0s is None or tuple(theta0s.shape) != (m, dim):
            base = (
                self.theta_init if self.theta_init is not None
                else np.full((dim,), 0.1)
            )
            theta0s = jnp.asarray(
                np.broadcast_to(np.asarray(base), (m, dim)).copy(),
                default_dtype(),
            )
        elif isinstance(theta0s, np.ndarray):
            theta0s = jnp.asarray(theta0s)
        if self._theta_bounds_dev is None:
            tb = np.asarray(self.theta_bounds, dtype=float)
            if tb.ndim == 1:
                tb = np.broadcast_to(tb[None, :], (dim, 2))
            self._theta_bounds_dev = (
                jnp.asarray(tb[:, 0], default_dtype()),
                jnp.asarray(tb[:, 1], default_dtype()),
            )
        t_lo, t_up = self._theta_bounds_dev
        return theta0s, t_lo, t_up

    def _select_next_point_fused(
        self,
        state: EgorState,
        fmin: float,
        xlimits: np.ndarray,
        seed_xlimits: Optional[np.ndarray],
        crit: str,
        cstrat: str,
        surrogate_tols,
        fcstrs: Sequence[Callable] = (),
        qei: str = "KB",
    ):
        """One fused device program for the whole iteration (train +
        scaling cloud + infill optimization), one host fetch. At
        q_points=1 it consumes the rng/key streams in the same order as
        the unfused path so results are reproducible across both
        (asserted in tests/test_fused_step.py); the q > 1 scan draws its
        step-0 seeds from the host MiddlePicker and every later virtual
        step's seeds IN-PROGRAM from the augmented DoE (traceable
        MiddlePicker, start_points.py) — mirroring the unfused loop's
        per-point picker re-run without extra dispatches."""
        from .fused_step import fused_select_point, fused_select_points_q

        cfg = self.config
        xt, yt = state.x_data, state.y_data
        m = yt.shape[1]
        xp, yp, mask = self._pad(xt, yt)
        theta0s, t_lo, t_up = self._theta_setup(state, m)
        optimize_theta = (state.iter % cfg.q_optmod) == 0
        fit_key = jax.random.key(int(state.rng.integers(0, 2**31)))
        cloud_key = self._next_key()
        starts = jnp.asarray(
            self._multistart_seeds(state, xt, xlimits, seed_xlimits)
        )
        feasibility = state.feasibility or not os.environ.get(
            "EGOR_USE_MAX_PROBA_OF_FEASIBILITY"
        )
        dtype = xp.dtype
        # key on BOTH the box and the tolerances (a mutated cstr_tol must
        # not serve stale device buffers), and bound the cache size
        box_key = (
            xlimits.tobytes(),
            np.ascontiguousarray(surrogate_tols, dtype=float).tobytes(),
        )
        if box_key not in self._box_dev:
            if len(self._box_dev) >= 32:
                self._box_dev.pop(next(iter(self._box_dev)))
            self._box_dev[box_key] = (
                jnp.asarray(np.ascontiguousarray(xlimits[:, 0]), dtype),
                jnp.asarray(np.ascontiguousarray(xlimits[:, 1]), dtype),
                jnp.asarray(surrogate_tols, dtype),
            )
        lo_dev, hi_dev, tols_dev = self._box_dev[box_key]
        n_fcstr = len(fcstrs)
        fcstr_tols = (
            jnp.asarray(state.cstr_tol[cfg.n_cstr:cfg.n_cstr + n_fcstr],
                        dtype)
            if n_fcstr else None
        )
        statics = dict(
            corr=self.spec.corr, trend=self.spec.trend,
            kpls_dim=self.spec.kpls_dim,
            gp_n_start=self._gp_n_start(state),
            gp_max_iters=self.spec.max_iters, fixed=not optimize_theta,
            nugget=self.spec.nugget, ls_batch=self.spec.ls_batch,
            n_cloud=min(100 * self.nx, 1000),
            crit=crit, cstr_strategy=cstrat, n_cstr=cfg.n_cstr,
            cstr_infill=cfg.cstr_infill, feasibility=feasibility,
            optimizer=_OPT_NAME[cfg.infill_optimizer],
            fcstr_fns=tuple(fcstrs),
        )
        if cfg.q_points > 1:
            seeds_key = self._next_key()
            use_middle = (
                seed_xlimits is None
                and xlimits is self.xlimits
                and not os.environ.get(
                    "EGOR_DO_NOT_USE_MIDDLEPICKER_MULTISTARTER"
                )
            )
            if seed_xlimits is not None:
                seed_lo = jnp.asarray(
                    np.ascontiguousarray(seed_xlimits[:, 0]), dtype
                )
                seed_hi = jnp.asarray(
                    np.ascontiguousarray(seed_xlimits[:, 1]), dtype
                )
            else:
                seed_lo = seed_hi = None
            i_min = int(np.argmin(state.y_data[:, 0]))
            y_best = jnp.asarray(state.y_data[i_min], dtype)
            packed, theta_last = fused_select_points_q(
                xp, yp, mask, theta0s, t_lo, t_up, fit_key, cloud_key,
                starts, seeds_key, lo_dev, hi_dev,
                jnp.asarray(fmin, dtype),
                tols_dev, y_best, fcstr_tols, seed_lo, seed_hi,
                q_points=cfg.q_points, qei=qei, use_middle=use_middle,
                **statics,
            )
            state.theta_inits = theta_last  # stays on device (no sync)
            arr = np.asarray(packed)  # the single host fetch
            xk = arr[:, : self.nx]
            infill_value = float(-arr[0, self.nx])
            yk = arr[:, self.nx + 1:]
            return xk, yk, infill_value
        packed, models = fused_select_point(
            xp, yp, mask, theta0s, t_lo, t_up, fit_key, cloud_key,
            starts, lo_dev, hi_dev,
            jnp.asarray(fmin, dtype), tols_dev, fcstr_tols, **statics,
        )
        state.theta_inits = models.theta  # stays on device (no sync)
        record_gp_models(cfg.outdir, state.iter, models)
        arr = np.asarray(packed)  # the single host fetch
        xk = arr[: self.nx]
        infill_value = float(-arr[self.nx])
        return xk[None, :], np.zeros((1, m)), infill_value

    def _select_next_point_fused_moe(
        self,
        state: EgorState,
        fmin: float,
        xlimits: np.ndarray,
        seed_xlimits: Optional[np.ndarray],
        crit: str,
        cstrat: str,
        surrogate_tols,
        fcstrs: Sequence[Callable] = (),
    ):
        """One fused device program for a CLUSTERED iteration: per-expert
        masked fits + mixture infill optimization in-program, one host
        fetch (fused_step.fused_select_point_moe). The clustering itself
        (state.clusterings) was established by the host path and rides in
        as traced gmx pytrees."""
        from ..types import Recombination
        from .fused_step import fused_select_point_moe

        cfg = self.config
        xt, yt = state.x_data, state.y_data
        m = yt.shape[1]
        xp, yp, mask = self._pad(xt, yt)
        gmxs = tuple(g for g, _ in state.clusterings)
        k = int(gmxs[0].n_clusters)
        smooth = state.clusterings[0][1] is Recombination.SMOOTH

        _, t_lo, t_up = self._theta_setup(state, m)
        dim = (
            self.spec.kpls_dim if self.spec.kpls_dim is not None
            else self.nx
        )
        theta0s = state.moe_theta_inits
        if theta0s is None or tuple(theta0s.shape) != (m, k, dim):
            base = (
                self.theta_init if self.theta_init is not None
                else np.full((dim,), 0.1)
            )
            theta0s = jnp.asarray(
                np.broadcast_to(np.asarray(base), (m, k, dim)).copy(),
                default_dtype(),
            )

        optimize_theta = (state.iter % cfg.q_optmod) == 0
        fit_key = jax.random.key(int(state.rng.integers(0, 2**31)))
        cloud_key = self._next_key()
        starts = jnp.asarray(
            self._multistart_seeds(state, xt, xlimits, seed_xlimits)
        )
        feasibility = state.feasibility or not os.environ.get(
            "EGOR_USE_MAX_PROBA_OF_FEASIBILITY"
        )
        dtype = xp.dtype
        box_key = (
            xlimits.tobytes(),
            np.ascontiguousarray(surrogate_tols, dtype=float).tobytes(),
        )
        if box_key not in self._box_dev:
            if len(self._box_dev) >= 32:
                self._box_dev.pop(next(iter(self._box_dev)))
            self._box_dev[box_key] = (
                jnp.asarray(np.ascontiguousarray(xlimits[:, 0]), dtype),
                jnp.asarray(np.ascontiguousarray(xlimits[:, 1]), dtype),
                jnp.asarray(surrogate_tols, dtype),
            )
        lo_dev, hi_dev, tols_dev = self._box_dev[box_key]
        n_fcstr = len(fcstrs)
        fcstr_tols = (
            jnp.asarray(state.cstr_tol[cfg.n_cstr:cfg.n_cstr + n_fcstr],
                        dtype)
            if n_fcstr else None
        )
        packed, models, theta_last = fused_select_point_moe(
            xp, yp, mask, gmxs, theta0s, t_lo, t_up, fit_key, cloud_key,
            starts, lo_dev, hi_dev, jnp.asarray(fmin, dtype), tols_dev,
            fcstr_tols,
            k_clusters=k, smooth=smooth,
            corr=self.spec.corr, trend=self.spec.trend,
            kpls_dim=self.spec.kpls_dim, gp_n_start=self.spec.n_start,
            gp_max_iters=self.spec.max_iters, fixed=not optimize_theta,
            nugget=self.spec.nugget, ls_batch=self.spec.ls_batch,
            n_cloud=min(100 * self.nx, 1000),
            crit=crit, cstr_strategy=cstrat, n_cstr=cfg.n_cstr,
            cstr_infill=cfg.cstr_infill, feasibility=feasibility,
            optimizer=_OPT_NAME[cfg.infill_optimizer],
            fcstr_fns=tuple(fcstrs),
        )
        state.moe_theta_inits = theta_last  # stays on device (no sync)
        # stale host-side expert params must not be reused after fused
        # iterations (they no longer reflect the carried thetas)
        state.moe_params = None
        record_gp_models(cfg.outdir, state.iter, models)
        arr = np.asarray(packed)  # the single host fetch
        xk = arr[: self.nx]
        infill_value = float(-arr[self.nx])
        return xk[None, :], np.zeros((1, m)), infill_value

    def select_next_points(
        self,
        state: EgorState,
        fcstrs: Sequence[Callable] = (),
        init: bool = False,
        xlimits: Optional[np.ndarray] = None,
        seed_xlimits: Optional[np.ndarray] = None,
    ):
        """``seed_xlimits`` restricts only the multistart seed region (the
        TREGO trust region, ref: trego.rs:34-76 LocalLhsMultiStarter) while
        the criterion is still optimized within ``xlimits``; ``xlimits``
        overrides the optimization box itself (mixint subspaces)."""
        cfg = self.config
        xlimits = self.xlimits if xlimits is None else xlimits
        crit = _CRIT_NAME[cfg.infill_strategy]
        cstrat = _CSTR_NAME[cfg.cstr_strategy]
        qei = _QEI_NAME[cfg.q_infill_strategy]
        n_cstr = cfg.n_cstr

        if self._fast_path_ok(fcstrs):
            fmin = float(state.y_data[state.best_index, 0])
            return self._select_next_point_fused(
                state, fmin, xlimits, seed_xlimits, crit, cstrat,
                state.cstr_tol[:n_cstr], fcstrs, qei,
            )

        if self._fast_path_moe_ok(state, fcstrs):
            fmin = float(state.y_data[state.best_index, 0])
            return self._select_next_point_fused_moe(
                state, fmin, xlimits, seed_xlimits, crit, cstrat,
                state.cstr_tol[:n_cstr], fcstrs,
            )

        surrogate_tols = jnp.asarray(state.cstr_tol[:n_cstr])

        x_dat: List[np.ndarray] = []
        y_dat: List[np.ndarray] = []
        infill_value = -np.inf

        fmin = float(state.y_data[state.best_index, 0])
        lo = jnp.asarray(xlimits[:, 0])
        hi = jnp.asarray(xlimits[:, 1])

        if cfg.coego_n_coop > 1:
            # resample the cooperative activity once per iteration so both
            # the partial theta tuning and the partial infill optimization
            # see the same groups (ref: egor_solver.rs:372-377)
            from .coego import get_random_activity

            state.activity = get_random_activity(
                state.rng, self.nx, cfg.coego_n_coop
            )

        for i in range(cfg.q_points):
            if x_dat:
                xt = np.vstack([state.x_data] + x_dat)
                yt = np.vstack([state.y_data] + y_dat)
            else:
                xt, yt = state.x_data, state.y_data

            optimize_theta = (
                (state.iter * cfg.q_points + i) % cfg.q_optmod == 0
            )
            models = self._train(state, xt, yt, optimize_theta)

            # scaling cloud (ref: solver_computations.rs:132-193)
            npts = min(100 * self.nx, 1000)
            cloud = jnp.asarray(self._lhs(npts, LhsKind.MAXIMIN))
            scale_infill, scale_cstr, scale_wb2 = compute_scaling(
                models, cloud, fmin, surrogate_tols,
                crit=crit, n_cstr=n_cstr, cstr_infill=cfg.cstr_infill,
            )

            starts = jnp.asarray(
                self._multistart_seeds(state, xt, xlimits, seed_xlimits)
            )

            # feasibility-first search when no feasible point exists yet
            # (env-gated like the reference: EGOR_USE_MAX_PROBA_OF_FEASIBILITY,
            # utils/mod.rs:22-48)
            feasibility = state.feasibility or not os.environ.get(
                "EGOR_USE_MAX_PROBA_OF_FEASIBILITY"
            )
            crit_kwargs = dict(
                fmin=fmin, scale_infill=scale_infill, scale_wb2=scale_wb2,
                scale_cstr=scale_cstr, cstr_tols=surrogate_tols,
                crit=crit, cstr_strategy=cstrat, n_cstr=n_cstr,
                cstr_infill=cfg.cstr_infill, feasibility=feasibility,
                optimizer=_OPT_NAME[cfg.infill_optimizer],
            )
            if (
                os.environ.get("EGOR_USE_GP_VAR_PORTFOLIO")
                and cfg.q_points == 1
            ):
                # sigma-weight portfolio: re-optimize the criterion with 13
                # log-spaced weights on the GP std, DBSCAN-cluster the
                # proposals, evaluate one representative per cluster
                # (ref: solver_impl.rs:585-610, utils/portfolio.rs)
                from .portfolio import SIGMA_WEIGHTS, select_from_portfolio

                props = []
                for sw in SIGMA_WEIGHTS:
                    s_inf, s_cstr, s_wb2 = compute_scaling(
                        models, cloud, fmin, surrogate_tols, sw,
                        crit=crit, n_cstr=n_cstr,
                        cstr_infill=cfg.cstr_infill,
                    )
                    xk_w, _, _ = optimize_infill(
                        models, starts, lo, hi, fmin, s_inf, s_wb2,
                        s_cstr, surrogate_tols, sw,
                        crit=crit, cstr_strategy=cstrat, n_cstr=n_cstr,
                        cstr_infill=cfg.cstr_infill,
                        feasibility=feasibility,
                        optimizer=_OPT_NAME[cfg.infill_optimizer],
                    )
                    props.append(np.asarray(xk_w))
                props = np.stack(props)
                keep_idx = select_from_portfolio(props)
                i_min = int(np.argmin(state.y_data[:, 0]))
                for ki in keep_idx:
                    xk_i = jnp.asarray(props[ki])
                    yk_i = virtual_point(
                        models, xk_i, jnp.asarray(state.y_data[i_min]),
                        strategy=qei,
                    )
                    x_dat.append(np.asarray(xk_i)[None, :])
                    y_dat.append(np.asarray(yk_i)[None, :])
                infill_value = np.nan
                break  # portfolio replaces the q_points loop

            if cfg.coego_n_coop > 1:
                # cooperative partial optimization for high dimensions
                # (ref: coego.rs; the per-iteration activity was sampled
                # above, before surrogate training)
                from .coego import coego_optimize_infill

                starts_np = np.asarray(starts)
                xb, yb, cb = state.best()
                xk_np, fk = coego_optimize_infill(
                    self, models, (xb, yb, cb), state.activity,
                    lambda: starts_np, xlimits[:, 0], xlimits[:, 1],
                    crit_kwargs,
                    cstr_tols=state.cstr_tol,
                    fcstrs=fcstrs,
                )
                xk = jnp.asarray(xk_np)
            else:
                xk, fk, _ = optimize_infill(
                    models, starts, lo, hi, **crit_kwargs
                )
            infill_value = float(-fk)

            if fcstrs:
                # user function constraints join the optimization as host
                # callbacks via a native derivative-free polish around the
                # jitted optimum (ref: cstr_funcs threading,
                # solver_impl.rs:716-741; scaling solver_computations.rs:
                # 181-189)
                xk = self._fcstr_polish(
                    np.asarray(xk), models, fcstrs, cloud, crit_kwargs,
                    xlimits,
                )
                xk = jnp.asarray(xk)

            i_min = int(np.argmin(state.y_data[:, 0]))
            yk = virtual_point(
                models, xk, jnp.asarray(state.y_data[i_min]),
                strategy=qei,
            )
            x_dat.append(np.asarray(xk)[None, :])
            y_dat.append(np.asarray(yk)[None, :])

        return np.vstack(x_dat), np.vstack(y_dat), infill_value

    def _lhs_in(self, n: int, xlimits: np.ndarray) -> np.ndarray:
        """Maximin-LHS seeds in ``xlimits`` — key split + sampling + box
        scaling fused in one jitted program (``_lhs_in_prog``) so the
        per-iteration seed completion costs one dispatch + one fetch
        instead of 3-4 tunnel roundtrips. Bit-identical values and key
        stream to the previous eager split + sample + scale sequence."""
        self._key, pts = _lhs_in_prog(
            self._key, jnp.asarray(xlimits, default_dtype()), ns=n,
            nx=self.nx,
        )
        return np.asarray(pts)

    # ------------------------------------------------------------------
    # one EGO iteration (ref: ego_step, solver_impl.rs:398-555)
    # ------------------------------------------------------------------

    def ego_step(
        self,
        state: EgorState,
        fobj: Callable[[np.ndarray], np.ndarray],
        fcstrs: Sequence[Callable] = (),
        xlimits: Optional[np.ndarray] = None,
    ) -> EgorState:
        t_start = time.perf_counter()
        while True:
            x_dat, _, infill_value = self.select_next_points(
                state, fcstrs, init=(state.iter == 0), xlimits=xlimits
            )
            x_dat = self._cast(x_dat)
            keep = [
                i
                for i in range(x_dat.shape[0])
                if self._is_new(state.x_data, x_dat[i])
            ]
            if keep:
                break
            state.no_point_added_retries -= 1
            if state.no_point_added_retries <= 0:
                raise NoMorePointToAddError(
                    "max retries without adding a point — converged"
                )

        x_new = x_dat[keep]
        y_new = np.atleast_2d(np.asarray(fobj(x_new), dtype=float))
        y_new = self._impute_failures(state, y_new)
        c_new = self._eval_fcstrs(fcstrs, x_new)

        offset = state.x_data.shape[0]
        state.x_data = np.vstack([state.x_data, x_new])
        state.y_data = np.vstack([state.y_data, y_new])
        state.c_data = np.vstack([state.c_data, c_new])

        state.prev_added = state.added
        state.added += x_new.shape[0]
        state.no_point_added_retries = MAX_POINT_ADDITION_RETRY

        best = find_best_result_index_from(
            state.best_index, offset, state.y_data, state.c_data,
            state.cstr_tol,
        )
        state.prev_best_index = state.best_index
        state.best_index = best
        state.feasibility = state.feasibility or is_feasible(
            state.y_data[best], state.c_data[best], state.cstr_tol
        )
        state.iter += 1
        logger.info(
            "iter %d: +%d point(s), total %d, best y=%.6g, infill=%.4g "
            "(%.2fs)",
            state.iter, x_new.shape[0], state.x_data.shape[0],
            state.y_data[best, 0], infill_value,
            time.perf_counter() - t_start,
        )
        return state

    def _fcstr_polish(self, xk: np.ndarray, models, fcstrs, cloud,
                      crit_kwargs: dict, xlimits: np.ndarray) -> np.ndarray:
        """Native derivative-free local polish honoring user function
        constraints g_i(x) <= cstr_tol (host callbacks can't enter the
        jitted optimizer). Surrogate constraints stay active via their
        scaled means (ref: InfillOptProblem, solver_infill_optim.rs)."""
        from ..native import minimize_dfo_constrained
        from .infill_optim import eval_infill_and_cstrs

        n_cstr = crit_kwargs["n_cstr"]
        scale_cstr_np = np.asarray(crit_kwargs["scale_cstr"])

        # scale for the function constraints: max |g| over the scaling
        # cloud (ref: solver_computations.rs:181-189)
        cloud_np = np.asarray(cloud)[:: max(1, cloud.shape[0] // 100)]
        fvals = self._eval_fcstrs(fcstrs, cloud_np)
        scale_fc = np.maximum(np.max(np.abs(fvals), axis=0), 1e-12)

        def obj_and_cstrs(x):
            return eval_infill_and_cstrs(
                models, x, crit_kwargs["fmin"],
                crit_kwargs["scale_infill"], crit_kwargs["scale_wb2"],
                crit_kwargs["cstr_tols"],
                crit=crit_kwargs["crit"],
                cstr_infill=crit_kwargs["cstr_infill"],
                feasibility=crit_kwargs["feasibility"],
            )

        def fun(x):
            o, _ = obj_and_cstrs(jnp.asarray(x))
            return float(o)

        cstr_list = []
        for i in range(n_cstr):
            def surr_c(x, _i=i):
                # target g <= 0 unshifted; tol is acceptance slack only
                # (ref: optimizers/optimizer.rs:108, see infill_optim)
                _, m = obj_and_cstrs(jnp.asarray(x))
                return float(m[_i]) / scale_cstr_np[_i]

            cstr_list.append(surr_c)
        for j, fc in enumerate(fcstrs):
            def user_c(x, _fc=fc, _s=scale_fc[j]):
                return float(_fc(x)) / _s

            cstr_list.append(user_c)

        x_pol, f_pol = minimize_dfo_constrained(
            fun, cstr_list, xk, xlimits[:, 0], xlimits[:, 1],
            max_eval=400, n_penalty_rounds=3,
        )
        return x_pol

    @staticmethod
    def _impute_failures(state: EgorState, y_new: np.ndarray) -> np.ndarray:
        """Failed objective evaluations (NaN/inf) would poison the GP
        normalization; impute them with a worst-observed penalty per column
        so the surrogate learns to avoid the region (optimizer-level
        robustness, cf. the reference's likelihood-failure handling,
        SURVEY.md §5)."""
        return impute_failed_values(y_new, state.y_data)

    @staticmethod
    def _is_new(x_data: np.ndarray, x: np.ndarray) -> bool:
        """L1 de-dup rule (ref: utils/misc.rs:44-53)."""
        d = np.sum(np.abs(x_data - x[None, :]), axis=1)
        return bool(np.all(d >= 100.0 * np.finfo(float).eps))

    # ------------------------------------------------------------------
    # ask-and-tell (ref: EgorService suggest, solver_impl.rs:56-101)
    # ------------------------------------------------------------------

    def suggest(self, x_doe: np.ndarray, y_doe: np.ndarray,
                fcstrs: Sequence[Callable] = ()) -> np.ndarray:
        cfg = self.config
        x_doe = np.atleast_2d(np.asarray(x_doe, dtype=float))
        y_doe = np.atleast_2d(np.asarray(y_doe, dtype=float))
        c_data = self._eval_fcstrs(fcstrs, x_doe)
        cstr_tol = cfg.resolved_cstr_tol(len(fcstrs))
        best = find_best_result_index(y_doe, c_data, cstr_tol)
        state = EgorState(
            x_data=x_doe,
            y_data=y_doe,
            c_data=c_data,
            cstr_tol=cstr_tol,
            best_index=best,
            rng=np.random.default_rng(cfg.seed),
        )
        x_dat, _, _ = self.select_next_points(state, fcstrs, init=True)
        return self._cast(x_dat)
