"""EgorBatch: B independent EGO optimizations advancing in lockstep.

A TPU-native capability with no reference counterpart: where egobox runs one
optimization per process, the batch axis here vmaps the entire fused EGO
iteration (surrogate training + scaling + multistart infill optimization,
ego/fused_step.py) over B problems, so a portfolio of optimizations costs
ONE program dispatch per iteration (ROADMAP "batched multi-problem Egor for
portfolio-scale serving").

Scope: the fused fast-path feature set — single-cluster GP surrogates,
EI/LogEI/WB2/WB2S infill, surrogate constraints (MC/UTB or cstr_infill),
q_points=1, continuous variables. Problems share nx, n_cstr, and the
iteration budget; xlimits may differ per problem (they are traced values).

The EGOR_USE_MAX_PROBA_OF_FEASIBILITY feasibility-first search IS threaded
through the batched call: per-problem feasibility is a traced (B,) bool
fed to the one compiled program (infill_optim feas_flag), so lanes without
a feasible point maximize the probability of feasibility while feasible
lanes optimize the criterion — same env gate as the single-problem solver.

Known divergences from the single-problem solver (documented, by design):
- Middle-picker LHS completion draws the first n rows of one precomputed
  n_start-point maximin pool per problem rather than a fresh n-point LHS
  (a truncated LHS has weaker stratification; acceptable for seed points,
  and it keeps the fill at one program dispatch per iteration).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Callable, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import default_dtype
from ..doe.lhs import LhsKind, lhs_normalized
from ..gp.kernels import theta_bounds_heuristic
from ..types import (
    ConstraintStrategy,
    InfillOptimizer,
    InfillStrategy,
    OptimResult,
)
from .config import EgorConfig, GpConfig
from .find_result import find_best_result_index, is_feasible
from .fused_step import fused_select_point_batch
from .solver import (
    _CRIT_NAME,
    _CSTR_NAME,
    _OPT_NAME,
    _bucket,
    impute_failed_values,
)
from .start_points import middle_picker_starts
from .surrogates import GpSpec


@partial(jax.jit, static_argnames=("ns", "nx"))
def _fill_pool_prog(key, lo, hi, *, ns: int, nx: int):
    """One maximin-LHS seed pool per problem, as ONE program: per-problem
    fills fetched one-by-one would serialize B tunnel roundtrips per
    iteration (measured: the dominant cost of EgorBatch at B=8)."""
    keys = jax.random.split(key, lo.shape[0])
    u = jax.vmap(
        lambda k: lhs_normalized(k, ns, nx, LhsKind.MAXIMIN, lo.dtype)
    )(keys)
    return lo[:, None, :] + u * (hi - lo)[:, None, :]


class EgorBatch:
    """Batched Egor over B independent problems.

    ``fobj`` is either a batched callable mapping (B, nx) -> (B, 1 + n_cstr)
    (one point per problem per call) or a list of B per-problem callables,
    each mapping (n, nx) -> (n, 1 + n_cstr).
    """

    def __init__(
        self,
        fobj: Union[Callable, Sequence[Callable]],
        xlimits: np.ndarray,  # (nx, 2) shared or (B, nx, 2)
        n_problems: Optional[int] = None,
        n_cstr: int = 0,
        cstr_tol: Optional[Sequence[float]] = None,
        n_start: int = 20,
        n_doe: int = 0,
        infill_strategy: InfillStrategy = InfillStrategy.LOG_EI,
        cstr_strategy: ConstraintStrategy = ConstraintStrategy.MC,
        cstr_infill: bool = False,
        infill_optimizer: InfillOptimizer = InfillOptimizer.COBYLA,
        gp_config: Optional[GpConfig] = None,
        seed: Optional[int] = None,
        mesh=None,
    ):
        """``mesh``: optional 1-D ``jax.sharding.Mesh`` — the problem axis
        shards across its devices, so a portfolio of B optimizations runs
        B/D per chip with no cross-problem communication (the per-problem
        programs are independent; GSPMD partitions the vmapped iteration
        along the batch axis). B must be divisible by the mesh size."""
        from ..types import XSpec
        from .mixint import MixintContext, parse_xspecs

        # mixed-integer portfolios: a shared XSpec list runs the same
        # fold/unfold/cast transforms as the single-problem Egor along
        # the batch axis (ref mixint.rs; VERDICT r2 item 7)
        self.mixint = None
        if (
            not isinstance(xlimits, np.ndarray)
            and any(isinstance(s, XSpec) for s in xlimits)
        ):
            self.mixint = MixintContext(parse_xspecs(xlimits))
            xlimits = self.mixint.continuous_xlimits()

        if callable(fobj):
            if n_problems is None:
                xl = np.asarray(xlimits, dtype=float)
                if xl.ndim != 3:
                    raise ValueError(
                        "n_problems is required with a batched fobj and "
                        "shared xlimits"
                    )
                n_problems = xl.shape[0]
            self._fobjs = None
            self._fobj_batched = fobj
        else:
            self._fobjs = list(fobj)
            self._fobj_batched = None
            n_problems = len(self._fobjs)
        self.n_problems = n_problems

        xl = np.asarray(xlimits, dtype=float)
        if xl.ndim == 2:
            xl = np.broadcast_to(xl, (n_problems,) + xl.shape).copy()
        if xl.shape[0] != n_problems:
            raise ValueError("xlimits batch size != n_problems")
        self.xlimits = xl  # (B, nx, 2)
        self.nx = xl.shape[1]

        self.config = EgorConfig(
            n_cstr=n_cstr,
            cstr_tol=None if cstr_tol is None else np.asarray(cstr_tol),
            n_start=n_start,
            n_doe=n_doe,
            infill_strategy=infill_strategy,
            cstr_strategy=cstr_strategy,
            cstr_infill=cstr_infill,
            infill_optimizer=infill_optimizer,
            gp_config=gp_config or GpConfig(),
            seed=seed,
        ).check()
        gpc = self.config.gp_config
        if gpc.n_clusters != 1 or len(gpc.regr_names) > 1 or len(
            gpc.corr_names
        ) > 1:
            raise ValueError(
                "EgorBatch supports the single-cluster GP surrogate path"
            )
        dim = gpc.kpls_dim if gpc.kpls_dim is not None else self.nx
        corr = gpc.corr_names[0]
        if gpc.theta_bounds is not None:
            self.theta_bounds = np.asarray(gpc.theta_bounds, dtype=float)
        elif dim >= 10:
            lo, up = theta_bounds_heuristic(corr, dim)
            self.theta_bounds = np.array([float(lo), float(up)])
        else:
            self.theta_bounds = np.array([1e-2, 1e1])
        self._dim = dim
        self._seed = seed if seed is not None else 0
        self._key = jax.random.key(self._seed)
        self._rngs = [
            np.random.default_rng(self._seed + 1000 * b)
            for b in range(n_problems)
        ]
        self._mesh = mesh
        if mesh is not None and n_problems % mesh.devices.size != 0:
            raise ValueError(
                f"n_problems={n_problems} must be divisible by the "
                f"{mesh.devices.size}-device mesh"
            )
        # per-problem convergence (ref retry-then-converge semantics,
        # solver_impl.rs:505-515): converged slots stop proposing/
        # evaluating instead of degrading to random fill
        from .config import MAX_POINT_ADDITION_RETRY

        self._max_retries = MAX_POINT_ADDITION_RETRY
        self.converged = np.zeros(n_problems, dtype=bool)
        self._retries = np.full(n_problems, self._max_retries)
        # lane compaction (VERDICT r3 weak #6): once lanes converge, the
        # batched program re-dispatches over a power-of-two sub-batch of
        # LIVE lanes only, so a portfolio at 10% live lanes stops paying
        # the 100% program. Each distinct sub-batch size compiles once
        # (<= log2(B) variants). Kill-switch: EGOBOX_NO_BATCH_COMPACTION.
        self._compactions = 0

    def _cast(self, x: np.ndarray) -> np.ndarray:
        """Snap continuous-relaxed proposals onto valid discrete values
        (B, nx) — identity for continuous portfolios."""
        if self.mixint is None:
            return x
        return self.mixint.cast_continuous(np.atleast_2d(x))

    def _to_user(self, x: np.ndarray) -> np.ndarray:
        """Continuous layout -> user (folded/discrete) space for
        objective evaluation; rows of a (n, nx) block."""
        if self.mixint is None:
            return x
        return self.mixint.to_discrete_space(np.atleast_2d(x))

    def _shard(self, arr):
        """Place a (B, ...) array with the problem axis split over the
        mesh (no-op without a mesh)."""
        if self._mesh is None:
            return arr
        from jax.sharding import NamedSharding, PartitionSpec as P

        ax = self._mesh.axis_names[0]
        return jax.device_put(arr, NamedSharding(self._mesh, P(ax)))

    # ------------------------------------------------------------------

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _eval(self, x: np.ndarray) -> np.ndarray:
        """x (B, nx) continuous layout -> y (B, 1 + n_cstr); the user's
        objective sees the folded/discrete space (mixint parity with
        Egor._wrap_fun)."""
        xu = self._to_user(x)
        if self._fobj_batched is not None:
            y = np.asarray(self._fobj_batched(xu), dtype=float)
            return y.reshape(self.n_problems, 1 + self.config.n_cstr)
        rows = [
            np.asarray(f(xu[b][None, :]), dtype=float).reshape(-1)
            for b, f in enumerate(self._fobjs)
        ]
        return np.stack(rows)

    def _eval_doe(self, x: np.ndarray) -> np.ndarray:
        """x (B, n, nx) -> y (B, n, 1 + n_cstr)."""
        if self._fobj_batched is not None:
            cols = [self._eval(x[:, i]) for i in range(x.shape[1])]
            return np.stack(cols, axis=1)
        return np.stack([
            np.atleast_2d(
                np.asarray(f(self._to_user(x[b])), dtype=float)
            )
            for b, f in enumerate(self._fobjs)
        ])

    def default_n_doe(self) -> int:
        n = self.config.n_doe
        return n if n > 0 else max(self.nx + 1, 5)

    def _init_doe(self) -> np.ndarray:
        n = self.default_n_doe()
        dtype = default_dtype()
        pts = []
        for b in range(self.n_problems):
            u = lhs_normalized(
                self._next_key(), n, self.nx, LhsKind.OPTIMIZED, dtype
            )
            lo, hi = self.xlimits[b, :, 0], self.xlimits[b, :, 1]
            pts.append(np.asarray(u) * (hi - lo) + lo)
        return np.stack(pts)  # (B, n, nx)

    def _pad(self, x: np.ndarray, y: np.ndarray, n_active=None):
        """Pad to the shape bucket; ``n_active`` (B,) marks each problem's
        live prefix (converged problems stop growing theirs, so their
        surrogates ignore the frozen placeholder rows)."""
        B, n = x.shape[:2]
        nb = _bucket(n, self.config.shape_bucket)
        xp = np.zeros((B, nb, x.shape[2]))
        xp[:, :n] = x
        yp = np.zeros((B, nb, y.shape[2]))
        yp[:, :n] = y
        mask = np.zeros((B, nb), dtype=bool)
        if n_active is None:
            mask[:, :n] = True
        else:
            for b in range(B):
                mask[b, : int(n_active[b])] = True
        return jnp.asarray(xp), jnp.asarray(yp), jnp.asarray(mask)

    # ------------------------------------------------------------------

    def _propose(self, x_data: np.ndarray, y_data: np.ndarray, theta0s,
                 n_active=None, optimize_theta: bool = True,
                 lanes: Optional[np.ndarray] = None,
                 real: Optional[np.ndarray] = None):
        """One batched selection step: (B, n, .) histories -> (B, nx) next
        points (de-duplicated, writable) + the fitted thetas (on device,
        fed back as warm starts). ``n_active`` (B,) limits each problem's
        live prefix (rows beyond it are frozen placeholders of converged
        problems).

        ``lanes``: sub-batch -> original problem index (lane compaction);
        the data arrays are already gathered to len(lanes) rows by the
        caller. ``real`` marks genuine rows — padding rows (repeats that
        round the sub-batch up to a power of two) skip every host-side
        per-problem side effect (rng draws, retry bookkeeping)."""
        cfg = self.config
        gpc = cfg.gp_config
        if lanes is None:
            lanes = np.arange(self.n_problems)
        if real is None:
            real = np.ones(len(lanes), dtype=bool)
        B = len(lanes)
        dtype = default_dtype()
        cstr_tol = cfg.resolved_cstr_tol(0)

        tb = jnp.asarray(self.theta_bounds, dtype)
        if tb.ndim == 1:
            tb = jnp.broadcast_to(tb[None, :], (self._dim, 2))
        t_lo, t_up = tb[:, 0], tb[:, 1]
        crit = _CRIT_NAME[cfg.infill_strategy]
        cstrat = _CSTR_NAME[cfg.cstr_strategy]
        tols = jnp.asarray(cstr_tol[: cfg.n_cstr], dtype)
        xlimits = self.xlimits[lanes]
        lo_all = jnp.asarray(xlimits[:, :, 0], dtype)
        hi_all = jnp.asarray(xlimits[:, :, 1], dtype)

        if n_active is None:
            n_active = np.full(B, x_data.shape[1])
        xp, yp, mask = self._pad(x_data, y_data, n_active)
        theta0s = jnp.clip(theta0s, t_lo[None, None], t_up[None, None])

        best_idx = [
            find_best_result_index(
                y_data[b, : int(n_active[b])],
                np.zeros((int(n_active[b]), 0)), cstr_tol,
            )
            for b in range(B)
        ]
        fmin = jnp.asarray(
            [y_data[b, best_idx[b], 0] for b in range(B)], dtype
        )

        # per-problem feasibility-first search (same env gate as the
        # single-problem solver; ref solver_computations.rs:409-417) —
        # traced (B,) flags, so the one compiled program serves lanes in
        # both modes
        feas_flags = None
        if cfg.n_cstr > 0 and os.environ.get(
            "EGOR_USE_MAX_PROBA_OF_FEASIBILITY"
        ):
            feas_flags = jnp.asarray([
                is_feasible(
                    y_data[b, best_idx[b], :1],
                    y_data[b, best_idx[b], 1:],
                    cstr_tol[: cfg.n_cstr],
                )
                for b in range(B)
            ])

        pool = np.asarray(_fill_pool_prog(
            self._next_key(), lo_all, hi_all, ns=cfg.n_start,
            nx=self.nx,
        ))  # (B, n_start, nx): one dispatch + one fetch for ALL fills
        pad_rng = np.random.default_rng(0)  # padding rows: throwaway draws
        starts = np.stack([
            np.clip(
                middle_picker_starts(
                    self._rngs[lanes[i]] if real[i] else pad_rng,
                    x_data[i, : int(n_active[i])],
                    xlimits[i], cfg.n_start,
                    lambda n, _i=i: pool[_i][:n],
                ),
                xlimits[i, :, 0], xlimits[i, :, 1],
            )
            for i in range(B)
        ])
        fit_seeds = jnp.asarray(
            [
                int(self._rngs[lanes[i]].integers(0, 2**31))
                if real[i] else 0
                for i in range(B)
            ],
            jnp.uint32,
        )
        fit_keys = jax.vmap(jax.random.key)(fit_seeds)
        cloud_keys = jax.random.split(self._next_key(), B)

        packed, models = fused_select_point_batch(
            self._shard(xp), self._shard(yp), self._shard(mask),
            self._shard(theta0s), t_lo, t_up, self._shard(fit_keys),
            self._shard(cloud_keys),
            self._shard(jnp.asarray(starts, dtype)),
            self._shard(lo_all), self._shard(hi_all),
            self._shard(fmin), tols,
            None if feas_flags is None else self._shard(feas_flags),
            corr=gpc.corr_names[0], trend=gpc.regr_names[0],
            kpls_dim=gpc.kpls_dim, gp_n_start=gpc.n_start,
            gp_max_iters=gpc.max_eval, fixed=not optimize_theta,
            nugget=GpSpec().nugget,
            n_cloud=min(100 * self.nx, 1000), crit=crit,
            cstr_strategy=cstrat, n_cstr=cfg.n_cstr,
            cstr_infill=cfg.cstr_infill, feasibility=True,
            optimizer=_OPT_NAME[cfg.infill_optimizer],
        )
        arr = np.asarray(packed)  # single host fetch per iteration
        # writable copy: the de-dup branch below replaces rows, and a
        # view of the fetched device buffer is read-only
        x_new = self._cast(np.array(arr[:, : self.nx]))

        # de-dup with retry-then-converge semantics (ref retry loop,
        # solver_impl.rs:505-515): a duplicate/non-finite proposal first
        # retries with a random point; after MAX_POINT_ADDITION_RETRY
        # consecutive failures the problem is marked converged and stops
        # proposing (the random point keeps THIS iteration's batch shape;
        # the minimize loop freezes converged slots from the next one)
        for i in range(B):
            b = int(lanes[i])
            if not real[i] or self.converged[b]:
                continue
            na = int(n_active[i])
            d = np.sum(
                np.abs(x_data[i, :na] - x_new[i][None, :]), axis=1
            )
            if not np.all(np.isfinite(x_new[i])) or np.any(
                d < 100.0 * np.finfo(float).eps
            ):
                self._retries[b] -= 1
                if self._retries[b] <= 0:
                    self.converged[b] = True
                    continue
                u = self._rngs[b].uniform(size=self.nx)
                x_new[i] = self._cast(
                    (xlimits[i, :, 0]
                     + u * (xlimits[i, :, 1]
                            - xlimits[i, :, 0]))[None, :]
                )[0]
            else:
                self._retries[b] = self._max_retries
        return x_new, models.theta

    def suggest(self, x_doe: np.ndarray, y_doe: np.ndarray) -> np.ndarray:
        """Batched ask-and-tell (the EgorService role,
        solver_impl.rs:56-101, vmapped over problems): given each
        problem's evaluation history ``x_doe`` (B, n, nx) /
        ``y_doe`` (B, n, 1 + n_cstr), propose the next point per problem
        as one fused program — (B, nx)."""
        x = np.asarray(x_doe, dtype=float)
        y = np.asarray(y_doe, dtype=float)
        if x.ndim != 3 or x.shape[0] != self.n_problems:
            raise ValueError(
                f"x_doe must be (B={self.n_problems}, n, nx), got {x.shape}"
            )
        m = 1 + self.config.n_cstr
        y = y.reshape(self.n_problems, x.shape[1], m)
        theta0s = jnp.full(
            (self.n_problems, m, self._dim), 0.1, dtype=default_dtype()
        )
        x_new, _ = self._propose(x, y, theta0s)
        return x_new

    def minimize(self, max_iters: int = 20) -> List[OptimResult]:
        cfg = self.config
        B = self.n_problems
        m = 1 + cfg.n_cstr
        dtype = default_dtype()
        cstr_tol = cfg.resolved_cstr_tol(0)

        x_data = self._cast_doe(self._init_doe())  # (B, n, nx)
        y_data = self._eval_doe(x_data)  # (B, n, m)
        # failed initial-DoE evaluations are imputed per problem (shared
        # penalty rule with the single-problem solver) so they cannot
        # poison the GP normalization or the incumbent bookkeeping
        for b in range(B):
            y_data[b] = impute_failed_values(y_data[b], y_data[b])
        theta0s = jnp.full((B, m, self._dim), 0.1, dtype=dtype)
        n_active = np.full(B, x_data.shape[1])

        compact_ok = not os.environ.get("EGOBOX_NO_BATCH_COMPACTION")
        min_lanes = (
            self._mesh.devices.size if self._mesh is not None else 1
        )
        for it in range(max_iters):
            if self.converged.all():
                break
            optimize_theta = it % cfg.q_optmod == 0
            live = np.nonzero(~self.converged)[0]
            n_live = len(live)
            # lane compaction: dispatch the fused program over a
            # power-of-two sub-batch of live lanes once enough lanes
            # converge (each distinct size compiles once; padding rows
            # repeat live[0] and are discarded). Live lanes keep their
            # own per-problem rng streams; only the shared cloud/pool
            # key fan-out width changes, a statistical-only divergence.
            bc = max(1 << (n_live - 1).bit_length(), min_lanes)
            if compact_ok and bc < B and bc % min_lanes == 0:
                self._compactions += 1
                gidx = np.concatenate(
                    [live, np.full(bc - n_live, live[0], dtype=int)]
                )
                realm = np.arange(bc) < n_live
                x_sub, th_sub = self._propose(
                    np.ascontiguousarray(x_data[gidx]),
                    np.ascontiguousarray(y_data[gidx]),
                    theta0s[jnp.asarray(gidx)],
                    n_active[gidx], optimize_theta=optimize_theta,
                    lanes=gidx, real=realm,
                )
                x_new = np.zeros((B, x_data.shape[2]))
                x_new[live] = x_sub[:n_live]
                # scatter warm-started thetas back on-device (no sync)
                theta0s = theta0s.at[jnp.asarray(live)].set(
                    th_sub[:n_live]
                )
            else:
                # q_optmod theta-thinning, same cadence as the
                # single-problem solver (iterations between theta
                # re-optimizations reuse warm-started thetas fixed=True)
                x_new, theta0s = self._propose(
                    x_data, y_data, theta0s, n_active,
                    optimize_theta=optimize_theta,
                )
            # converged problems stop evaluating: their slot carries the
            # incumbent best forward (frozen placeholder, masked out of
            # the surrogate fits) instead of a random-search point
            frozen = {}
            for b in np.nonzero(self.converged)[0]:
                i = find_best_result_index(
                    y_data[b, : int(n_active[b])],
                    np.zeros((int(n_active[b]), 0)), cstr_tol,
                )
                x_new[b] = x_data[b, i]
                frozen[b] = y_data[b, i]
            y_new = self._eval(x_new)
            for b, yb in frozen.items():  # no re-evaluation noise
                y_new[b] = yb
            if not np.all(np.isfinite(y_new)):
                # shared penalty rule with the single-problem solver
                # (solver.impute_failed_values): worst finite + 3 sigma
                # per column, per problem
                for b in range(B):
                    y_new[b:b + 1] = impute_failed_values(
                        y_new[b:b + 1], y_data[b]
                    )
            x_data = np.concatenate([x_data, x_new[:, None]], axis=1)
            y_data = np.concatenate([y_data, y_new[:, None]], axis=1)
            n_active = np.where(
                self.converged, n_active, x_data.shape[1]
            )

        results = []
        for b in range(B):
            na = int(n_active[b])
            i = find_best_result_index(
                y_data[b, :na], np.zeros((na, 0)), cstr_tol
            )
            results.append(OptimResult(
                x_opt=self._to_user(x_data[b, i][None, :])[0],
                y_opt=y_data[b, i],
                x_doe=self._to_user(x_data[b, :na]),
                y_doe=y_data[b, :na],
            ))
        return results

    def _cast_doe(self, x: np.ndarray) -> np.ndarray:
        if self.mixint is None:
            return x
        return np.stack([self._cast(x[b]) for b in range(x.shape[0])])

