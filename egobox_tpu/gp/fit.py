"""GP hyperparameter fit: vmapped multistart MLE on log10(theta).

TPU-first redesign of crates/gp/src/algorithm.rs:785-980 +
optimization.rs:26-71:

- the (n_start+1) restarts (user init + maximin-LHS seeds over the log10
  bounds, ref optimization.rs:26-71) advance in lockstep as ONE vmapped
  bounded L-BFGS program — the reference fans them out over rayon threads
  and uses derivative-free COBYLA; here the exact likelihood gradient comes
  from jax.grad through Cholesky/QR;
- ThetaTuning Fixed/Full/Partial (ref gp/src/parameters.rs:14-78) maps to a
  static fixed flag and an ``active`` mask whose inactive bounds collapse to
  the init value (the box projection then pins them — this is also how
  CoEGO's partial tuning composes, ref ego/src/solver/coego.rs:98-126);
- padding: ``n_active`` rows of a statically-shaped design are fitted
  exactly via the masked likelihood, so the growing EGO DoE re-uses one
  compiled program per shape bucket.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..doe.lhs import maximin_lhs
from ..optim.lbfgsb import minimize_lbfgsb, minimize_tr
from .gp import GpModel
from .kpls import pls_rotations
from .likelihood import (
    make_neg_reduced_likelihood,
    make_neg_rlf_residual_api,
    reduced_likelihood,
)

#: COBYLA eval clamp in the reference (algorithm.rs:33-37); used here as the
#: L-BFGS iteration budget
GP_DEFAULT_N_START = 10
GP_DEFAULT_THETA_INIT = 0.1
GP_DEFAULT_THETA_BOUNDS = (1e-2, 1e1)


class GpFitError(RuntimeError):
    """Unrecoverable GP fit: likelihood non-finite after nugget escalation
    (mirrors the reference's LikelihoodComputationError,
    gp/src/algorithm.rs:1009-1027)."""


def _masked_norm(v, m, n_obs):
    mean = jnp.sum(v * m[:, None], axis=0) / n_obs
    var = jnp.sum(((v - mean) ** 2) * m[:, None], axis=0) / jnp.maximum(
        n_obs - 1.0, 1.0
    )
    std = jnp.sqrt(var)
    std = jnp.where(std <= 0, 1.0, std)
    return mean, std


@partial(
    jax.jit,
    static_argnames=(
        "corr", "trend", "kpls_dim", "n_start", "max_iters",
        "ls_batch",
    ),
)
def _warmstart_theta(
    x_sub: jnp.ndarray,  # (m, nx) fit subsample
    y_sub: jnp.ndarray,  # (m, 1)
    x_rank: jnp.ndarray,  # (r, nx) ranking subsample (r >= m)
    y_rank: jnp.ndarray,  # (r, 1)
    theta0: jnp.ndarray,
    bounds_lo: jnp.ndarray,
    bounds_up: jnp.ndarray,
    key,
    *,
    corr: str,
    trend: str,
    kpls_dim: Optional[int],
    n_start: int,
    max_iters: int,
    nugget: float,
    ls_batch: int = 0,
) -> jnp.ndarray:
    """Multi-fidelity warm start with CANDIDATE RANKING: run the vmapped
    multistart MLE on the m-point subsample, then re-rank ALL restart
    optima by their exact likelihood on the larger r-point subsample and
    return the winner. The subsample likelihood routinely misranks theta
    basins (measured on v5e: the 2k-ranked basin was up to 5.8% below the
    direct-fit optimum depending on seed, with the true basin present
    among the restarts) — ranking on more data before the expensive
    full-data polish fixes exactly that, for the cost of (1 + n_start)
    O(r^3) forwards. One jitted program, nothing fetched to host."""
    dtype = x_sub.dtype
    dim = theta0.shape[0]

    def norm(x, y):
        x_mean, x_std = jnp.mean(x, axis=0), jnp.std(x, axis=0, ddof=1)
        x_std = jnp.where(x_std <= 0, 1.0, x_std)
        y_mean, y_std = jnp.mean(y, axis=0), jnp.std(y, axis=0, ddof=1)
        y_std = jnp.where(y_std <= 0, 1.0, y_std)
        return (x - x_mean) / x_std, (y - y_mean) / y_std, y_std

    xs_norm, ys_norm, ys_std = norm(x_sub, y_sub)
    xr_norm, yr_norm, yr_std = norm(x_rank, y_rank)

    w_sub = w_rank = None
    if kpls_dim is not None:
        w_sub = pls_rotations(x_sub, y_sub, kpls_dim)
        w_rank = pls_rotations(x_rank, y_rank, kpls_dim)

    lo = jnp.log10(bounds_lo)
    up = jnp.log10(bounds_up)
    t0 = jnp.log10(theta0)
    seeds = maximin_lhs(key, n_start, dim, False, 5, dtype)
    seeds = lo[None, :] + seeds * (up - lo)[None, :]
    inits = jnp.concatenate([t0[None, :], seeds], axis=0)

    # residual routing (value-only line-search trials, adjoint from the
    # kept factorization): at subsample sizes the loop-carry of the
    # (m, m) factor is cheap and the 2.4x value_and_grad recompute
    # overhead dominates instead
    fun_and_res, grad_from_res = make_neg_rlf_residual_api(
        corr, trend, xs_norm, ys_norm, ys_std, w_sub, nugget, None
    )

    res = jax.vmap(
        lambda t: minimize_lbfgsb(
            lambda tt: fun_and_res(tt)[0], t, lo, up,
            max_iters=max_iters, ls_batch=ls_batch,
            fun_and_res=fun_and_res, grad_from_res=grad_from_res,
            final_grad=False,
        )
    )(inits)
    thetas = 10.0 ** res.x  # (1 + n_start, dim)

    def rank_rlf(theta):
        rlf, _ = reduced_likelihood(
            corr, trend, xr_norm, yr_norm, yr_std, theta, w_rank, nugget
        )
        return rlf

    rlfs = jax.vmap(rank_rlf)(thetas)
    rlfs = jnp.where(jnp.isfinite(rlfs), rlfs, -jnp.inf)
    return thetas[jnp.argmax(rlfs)]


@partial(
    jax.jit,
    static_argnames=(
        "corr", "trend", "kpls_dim", "n_start", "max_iters", "sub_m",
        "polish_iters", "residual", "grad_probes", "polish_tr",
        "sub_draws", "sub_m2",
    ),
)
def _fit_mf_fused(
    x: jnp.ndarray,  # (n, nx)
    y: jnp.ndarray,  # (n, 1)
    theta0: jnp.ndarray,
    bounds_lo: jnp.ndarray,
    bounds_up: jnp.ndarray,
    active: jnp.ndarray,
    key,
    *,
    corr: str,
    trend: str,
    kpls_dim: Optional[int],
    n_start: int,
    max_iters: int,
    sub_m: int,
    polish_iters: int,
    nugget,
    residual: bool,
    grad_probes: int,
    polish_tr: bool = False,
    sub_draws: int = 1,
    sub_m2: int = 0,
) -> GpModel:
    """The default multi-fidelity recipe (subsample draw -> multistart
    subfit -> full-data polish) as ONE compiled program. The host version
    of the same recipe pays ~8 eager dispatches (key split, permutation,
    gathers, clip) plus two separate program dispatch+fetch chains — on a
    remote-attached TPU each costs a tunnel roundtrip (CLAUDE.md axon
    dispatch model), which is pure latency at n=10k. Key-stream order
    matches the host recipe exactly (split -> permutation(ksub) ->
    subfit(key) -> polish(key, unused at n_start=0)).
    Kill-switch: EGOBOX_NO_FUSED_FIT=1.

    ``sub_draws > 1`` / ``sub_m2 > 0`` enable the MULTI-DRAW warm start
    (ROADMAP "mixed subsample sizes"): the subsample basin is a seed
    lottery (measured n=10k worst-seed likelihood deficits of 2.4-2.7%
    from one 2k draw), so draw ``sub_draws`` independent ``sub_m``-point
    subsamples (one vmapped subfit advances all draws in lockstep) plus
    optionally one ``sub_m2``-point draw at a different fidelity, then
    polish ALL candidates on the full data as one vmapped multi-init
    solve and keep the best final likelihood — the polish's own exact
    full-data objective does the basin selection, no separate ranking
    forwards. Candidate count stays small (2-4): each polish lane carries
    an (n, n) factorization."""
    n = x.shape[0]
    ksub, key = jax.random.split(key)
    sub_mask = jnp.ones((sub_m,), dtype=bool)

    def subfit(k_draw, k_fit):
        idx = jax.random.permutation(k_draw, n)[:sub_m]
        m0 = fit_gp_core(
            x[idx], y[idx], sub_mask, theta0, bounds_lo, bounds_up,
            active, k_fit, corr=corr, trend=trend, kpls_dim=kpls_dim,
            n_start=n_start, max_iters=max_iters, fixed=False,
            nugget=nugget,
        )
        return jnp.clip(m0.theta, bounds_lo, bounds_up)

    if sub_draws == 1 and not sub_m2:
        # default single-draw recipe — key stream identical to the host
        # (EGOBOX_NO_FUSED_FIT) recipe: split -> permutation(ksub) ->
        # subfit(key)
        theta_w = subfit(ksub, key)
    else:
        dkeys = jax.random.split(ksub, 2 * sub_draws)
        theta_w = jax.vmap(subfit)(
            dkeys[:sub_draws], dkeys[sub_draws:]
        )  # (k, dim)
        if sub_m2:
            k2d, k2f = jax.random.split(jax.random.fold_in(ksub, 7))
            idx2 = jax.random.permutation(k2d, n)[:sub_m2]
            m2 = fit_gp_core(
                x[idx2], y[idx2], jnp.ones((sub_m2,), dtype=bool), theta0,
                bounds_lo, bounds_up, active, k2f,
                corr=corr, trend=trend, kpls_dim=kpls_dim,
                n_start=n_start, max_iters=max_iters, fixed=False,
                nugget=nugget,
            )
            theta2 = jnp.clip(m2.theta, bounds_lo, bounds_up)
            theta_w = jnp.concatenate([theta_w, theta2[None]], axis=0)

    full_mask = jnp.ones((n,), dtype=bool)
    return fit_gp_core(
        x, y, full_mask, theta_w, bounds_lo, bounds_up, active, key,
        corr=corr, trend=trend, kpls_dim=kpls_dim, n_start=0,
        max_iters=polish_iters, fixed=False, nugget=nugget,
        residual_api=residual or polish_tr, grad_probes=grad_probes,
        tr=polish_tr,
    )


@partial(
    jax.jit,
    static_argnames=(
        "corr", "trend", "kpls_dim", "n_start", "max_iters", "fixed",
        "ls_batch", "residual_api", "grad_probes", "tr",
    ),
)
def fit_gp_core(
    x: jnp.ndarray,  # (n, nx)
    y: jnp.ndarray,  # (n, 1)
    mask: jnp.ndarray,  # (n,) bool
    theta0: jnp.ndarray,  # (dim,)
    bounds_lo: jnp.ndarray,  # (dim,)
    bounds_up: jnp.ndarray,  # (dim,)
    active: jnp.ndarray,  # (dim,) bool
    key,
    *,
    corr: str = "squared_exponential",
    trend: str = "constant",
    kpls_dim: Optional[int] = None,
    n_start: int = GP_DEFAULT_N_START,
    max_iters: int = 50,
    fixed: bool = False,
    nugget: float = 0.0,
    ls_batch: int = 0,
    residual_api: bool = False,
    grad_probes: int = 0,
    tr: bool = False,
) -> GpModel:
    n, nx = x.shape
    dtype = x.dtype
    m = mask.astype(dtype)
    n_obs = jnp.sum(m)

    x_mean, x_std = _masked_norm(x, m, n_obs)
    y_mean, y_std = _masked_norm(y, m, n_obs)
    # padded rows pinned to the mean (zero in normalized space) so they can
    # never produce inf/nan kernel values
    x_norm = ((x - x_mean) / x_std) * m[:, None]
    y_norm = ((y - y_mean) / y_std) * m[:, None]

    w_star = None
    if kpls_dim is not None:
        w_star = pls_rotations(x * m[:, None], y * m[:, None], kpls_dim)

    if fixed:
        theta_opt = theta0
    else:
        dim = theta0.shape[-1]
        lo = jnp.log10(bounds_lo)
        up = jnp.log10(bounds_up)
        t0 = jnp.log10(theta0)
        # inactive components: collapse the box so projection pins them
        # (broadcasts per-lane when theta0 is a (k, dim) init stack)
        lo = jnp.where(active, lo, t0)
        up = jnp.where(active, up, t0)

        if theta0.ndim == 2:
            # multi-init stack (multi-draw warm start): each lane keeps
            # its own collapsed box
            if n_start > 0:
                raise ValueError(
                    "fit_gp_core: a (k, dim) theta0 init stack requires "
                    "n_start=0 (LHS seeding and multi-init are exclusive)"
                )
            inits = t0
            lo_l, up_l = lo, up
        elif n_start > 0:
            seeds = maximin_lhs(key, n_start, dim, False, 5, dtype)
            seeds = lo[None, :] + seeds * (up - lo)[None, :]
            inits = jnp.concatenate([t0[None, :], seeds], axis=0)
            lo_l = jnp.broadcast_to(lo, inits.shape)
            up_l = jnp.broadcast_to(up, inits.shape)
        else:
            inits = t0[None, :]
            lo_l = lo[None, :]
            up_l = up[None, :]

        # objective with analytic adjoint (no autodiff through Cholesky).
        # Two routings with identical math:
        # - value_and_grad (default): XLA fuses fwd+bwd into one program
        #   per gradient call — best for the many-iteration multistart
        #   phase (measured round 2);
        # - residual_api=True: line-search trials are value-only forwards
        #   and the accepted trial's factorization feeds the adjoint
        #   directly. On v5e at n=10k the fused value_and_grad costs
        #   295 ms vs 62 (fwd) + 114 (adjoint-from-residuals) — the
        #   fusion RECOMPUTES the forward inside the bwd — so the
        #   few-iteration polish phase routes here (~300 ms saved per
        #   gradient).
        if residual_api:
            fun_and_res, grad_from_res = make_neg_rlf_residual_api(
                corr, trend, x_norm, y_norm, y_std, w_star, nugget, mask,
                stoch_probes=grad_probes,
            )
            if tr:
                # trust-region: ONE forward per iteration (accepted or
                # not) vs Armijo's ~3 trial forwards — the polish phase
                # is line-search-trial dominated (tools/prof_r3b.py)
                solve = lambda t, lo, up: minimize_tr(  # noqa: E731
                    t, lo, up, fun_and_res=fun_and_res,
                    grad_from_res=grad_from_res, max_iters=max_iters,
                    final_grad=False,
                )
            else:
                solve = lambda t, lo, up: minimize_lbfgsb(  # noqa: E731
                    lambda tt: fun_and_res(tt)[0], t, lo, up,
                    max_iters=max_iters, ls_batch=ls_batch,
                    fun_and_res=fun_and_res, grad_from_res=grad_from_res,
                    final_grad=False,
                )
        else:
            neg_rlf_theta = make_neg_reduced_likelihood(
                corr, trend, x_norm, y_norm, y_std, w_star, nugget, mask,
                stoch_probes=grad_probes,
            )

            def neg_rlf(t_log10):
                return neg_rlf_theta(10.0**t_log10)

            # final_grad=False: the solve's gradients are discarded after
            # argmin — skipping the last iteration's O(n^3) adjoint saves
            # a full trace-term evaluation per restart
            solve = lambda t, lo, up: minimize_lbfgsb(  # noqa: E731
                neg_rlf, t, lo, up, max_iters=max_iters,
                ls_batch=ls_batch, final_grad=False,
            )

        res = jax.vmap(solve)(inits, lo_l, up_l)
        best = jnp.argmin(res.fun)
        theta_opt = 10.0 ** res.x[best]
        if residual_api:
            # the winning lane's residuals ARE the final model state — no
            # closing forward needed (saves one O(n^3) factorization)
            _, rlf, inner = jax.tree_util.tree_map(
                lambda a: a[best], res.res
            )
            return _model_from_inner(
                x_norm, x_mean, x_std, y_mean, y_std, theta_opt, w_star,
                inner, rlf, mask, corr, trend,
            )

    rlf, inner = reduced_likelihood(
        corr, trend, x_norm, y_norm, y_std, theta_opt, w_star, nugget, mask
    )
    return _model_from_inner(
        x_norm, x_mean, x_std, y_mean, y_std, theta_opt, w_star, inner,
        rlf, mask, corr, trend,
    )


def _model_from_inner(x_norm, x_mean, x_std, y_mean, y_std, theta, w_star,
                      inner, rlf, mask, corr, trend) -> GpModel:
    return GpModel(
        x_norm=x_norm,
        x_mean=x_mean,
        x_std=x_std,
        y_mean=y_mean,
        y_std=y_std,
        theta=theta,
        w_star=w_star,
        beta=inner.beta,
        gamma=inner.gamma,
        r_chol=inner.r_chol,
        ft=inner.ft,
        ft_qr_r=inner.ft_qr_r,
        sigma2=inner.sigma2,
        likelihood=rlf,
        mask=mask,
        corr=corr,
        trend=trend,
    )


def fit_gp(
    x,
    y,
    *,
    corr: str = "squared_exponential",
    trend: str = "constant",
    theta_init=None,
    theta_bounds=None,
    n_start: int = GP_DEFAULT_N_START,
    max_iters: int = 50,
    kpls_dim: Optional[int] = None,
    nugget: Optional[float] = None,
    seed: int = 42,
    mask=None,
    theta_fixed: bool = False,
    active=None,
    subsample_warmstart: Optional[int] = None,
    polish_iters: int = 3,
    rank_warmstart: Optional[int] = None,
    mesh=None,
    dist_bp: Optional[int] = None,
    mesh_materialize: bool = False,
    grad_probes: int = 0,
    polish_residual: Optional[bool] = None,
    polish_tr: bool = False,
    sub_draws: int = 1,
    subsample_warmstart2: Optional[int] = None,
    ls_batch: int = 0,
) -> GpModel:
    """User-facing fit (ref: GpParams + Fit, gp/src/algorithm.rs:785-980).

    ``x`` (n, nx), ``y`` (n,) or (n, 1). ``theta_init``/``theta_bounds``
    accept scalars or per-dim arrays; dim = kpls_dim or nx.

    ``subsample_warmstart=m``: multi-fidelity initialization for large n —
    run the full multistart MLE on a random m-point subsample (O(m^3)
    likelihoods), then polish theta with ``polish_iters`` L-BFGS iterations
    on the full data. The final model is the exact full-data GP at the
    polished theta. (No reference equivalent — the reference is O(hours) at
    n=10k; this is a TPU-scale addition.)

    ``mesh``: optional 1-D ``jax.sharding.Mesh`` — the theta MLE (likelihood
    value AND analytic gradient) runs distributed on the row shards
    (parallel/dist_fit.py: block-cyclic Cholesky, sharded trace
    contraction), so no single device ever holds the (n, n) factorization
    during optimization. Requires a full mask and n divisible by the mesh
    size (KPLS is supported: the PLS rotations are replicated and the MLE
    runs in the reduced theta space); ``dist_bp`` overrides the Cholesky
    panel size. The returned model is a ``DistGpModel``
    (parallel/dist_model.py) whose (n, n) factor, gamma, and whitened
    trend basis STAY row-sharded on the mesh — predict/predict_var run
    distributed too, so fit -> serve never materializes an (n, n) buffer
    on one device. Pass ``mesh_materialize=True`` to instead gather into
    a plain single-device ``GpModel`` after the distributed MLE (the
    round-3 behavior; only sensible when (n, n) fits one HBM).

    ``grad_probes=p``: squared-exponential fits only — evaluate the MLE
    gradient's trace contraction with a p-probe Hutchinson estimator
    (likelihood._sqexp_dphi_stoch, O(n^2 d p)) instead of the exact
    O(n^3) triangular inverse. Likelihood VALUES (line-search acceptance,
    restarts ranking, the final model) stay exact; only the quasi-Newton
    direction is stochastic (fixed probes, deterministic). Intended for
    the large-n polish phase where the exact adjoint dominates wall time.

    ``polish_residual``: route the full-data polish through the
    residual-reuse L-BFGS (value-only line-search trials, adjoint from the
    kept factorization, final model from the accepted residuals — no
    closing forward). Default None = automatic (True for the
    rank_warmstart mode, False otherwise: measured fastest end-to-end on
    v5e with the exact adjoint; re-measure when combining with
    ``grad_probes``).

    ``polish_tr``: run the full-data polish with the trust-region L-BFGS
    (optim/lbfgsb.minimize_tr) instead of Armijo backtracking — exactly
    one O(n^3) forward per polish iteration instead of ~3 line-search
    trials (the measured dominant cost of the polish phase). Implies the
    residual routing. Only affects the ``subsample_warmstart`` polish;
    plain fits keep the line search (whose trials are cheap at small n).

    ``sub_draws`` / ``subsample_warmstart2``: multi-draw warm start (the
    subsample basin is a seed lottery): run the subsample multistart on
    ``sub_draws`` independent draws of ``subsample_warmstart`` points
    (one vmapped program), plus optionally one draw of
    ``subsample_warmstart2`` points at a second fidelity; ALL candidate
    thetas are then polished on the full data as one vmapped multi-init
    solve and the best final likelihood wins. Fused-recipe only (the
    EGOBOX_NO_FUSED_FIT / rank_warmstart paths fall back to one draw).
    """
    x = jnp.asarray(x)
    dtype = x.dtype
    y = jnp.asarray(y, dtype=dtype)
    if y.ndim == 1:
        y = y[:, None]
    if y.shape[1] != 1:
        raise ValueError(
            "multi-output training not supported (one output expected, "
            f"got {y.shape[1]}) — mirror of the reference Gpx behavior"
        )
    n, nx = x.shape
    dim = kpls_dim if kpls_dim is not None else nx
    if kpls_dim is not None and kpls_dim > nx:
        raise ValueError(
            f"kpls_dim {kpls_dim} must be <= input dim {nx}"
        )

    # host-side prep stays NUMPY: every eager jnp op here would cost a
    # dispatch roundtrip on a remote-attached TPU (CLAUDE.md axon model);
    # numpy arguments upload inside the jit call RPC instead
    theta0 = np.ascontiguousarray(np.broadcast_to(
        np.asarray(
            theta_init if theta_init is not None else GP_DEFAULT_THETA_INIT,
            dtype=dtype,
        ),
        (dim,),
    ))
    tb = theta_bounds if theta_bounds is not None else GP_DEFAULT_THETA_BOUNDS
    tb = np.asarray(tb, dtype=dtype)
    if tb.ndim == 1:
        tb = np.broadcast_to(tb[None, :], (dim, 2))
    bounds_lo = np.ascontiguousarray(tb[:, 0])
    bounds_up = np.ascontiguousarray(tb[:, 1])

    if mask is None:
        mask = np.ones((n,), dtype=bool)
    else:
        mask = np.asarray(mask, dtype=bool)
    if active is None:
        active_mask = np.ones((dim,), dtype=bool)
    else:
        active_mask = np.zeros((dim,), dtype=bool)
        active_mask[np.asarray(active)] = True

    if nugget is None:
        nugget = 100.0 * float(jnp.finfo(dtype).eps)

    key = jax.random.key(seed)

    if mesh is not None:
        if not bool(np.all(mask)):
            raise ValueError(
                "fit_gp(mesh=...) requires a full mask (no padding)"
            )
        if not theta_fixed:
            from ..parallel.dist_fit import fit_theta_distributed

            theta_dist, _ = fit_theta_distributed(
                mesh, x, y, corr=corr, trend=trend,
                theta0=None if theta_init is None and subsample_warmstart
                else theta0,
                theta_bounds=np.stack([bounds_lo, bounds_up], axis=1),
                max_iters=max_iters, nugget=nugget, bp=dist_bp,
                subsample_warmstart=subsample_warmstart,
                polish_iters=polish_iters, seed=seed, kpls_dim=kpls_dim,
                grad_probes=grad_probes,
            )
            theta0 = jnp.clip(theta_dist, bounds_lo, bounds_up)
            theta_fixed = True
        if not mesh_materialize:
            # realize + serve on the shards: no (n, n) buffer ever lands
            # on a single device (VERDICT r3 item 1)
            from ..parallel.dist_model import realize_dist_model

            dn = nugget
            for _ in range(3):
                dmodel = realize_dist_model(
                    mesh, x, y, theta0, corr=corr, trend=trend,
                    nugget=dn, bp=dist_bp, kpls_dim=kpls_dim,
                )
                if bool(jnp.isfinite(dmodel.likelihood)):
                    return dmodel
                dn *= 100.0
            raise GpFitError(
                "distributed GP fit failed: likelihood non-finite after "
                f"3 nugget escalations (final nugget={dn:.3g})"
            )

    auto_polish_residual = polish_residual
    polish_residual = False
    use_fused_recipe = False
    if (
        subsample_warmstart
        and not theta_fixed
        and n > subsample_warmstart
        and bool(np.all(mask))
    ):
        if not rank_warmstart and not os.environ.get("EGOBOX_NO_FUSED_FIT"):
            # default recipe as ONE program (_fit_mf_fused): the key split
            # and subsample draw happen in-program, same stream order
            use_fused_recipe = True
        else:
            if sub_draws > 1 or subsample_warmstart2:
                import warnings

                warnings.warn(
                    "fit_gp: sub_draws/subsample_warmstart2 are only "
                    "honored by the fused recipe — falling back to a "
                    "single subsample draw", stacklevel=2,
                )
            ksub, key = jax.random.split(key)
        if use_fused_recipe:
            pass
        elif rank_warmstart:
            # opt-in candidate ranking: the subsample likelihood misranks
            # theta basins, so re-rank all restarts on a larger subset
            # before the polish commits to a basin (improves worst-case
            # quality ~2.4% -> ~2.1% on the n=10k bench problem at
            # +0.4-0.6 s — quality-over-speed mode)
            perm = jax.random.permutation(ksub, n)
            idx = perm[:subsample_warmstart]
            r = min(n, max(rank_warmstart, subsample_warmstart))
            ridx = perm[:r]
            theta_warm = _warmstart_theta(
                x[idx], y[idx], x[ridx], y[ridx], theta0, bounds_lo,
                bounds_up, key,
                corr=corr, trend=trend, kpls_dim=kpls_dim,
                n_start=max(n_start, 3), max_iters=max(max_iters, 8),
                nugget=nugget,
            )
            theta0 = jnp.clip(theta_warm, bounds_lo, bounds_up)
            polish_residual = True
        else:
            # default recipe (round-2 measured fastest end-to-end on v5e:
            # ~0.9 s total at n=10k): best-of-multistart on the subsample
            # via the fused value_and_grad route, then polish
            idx = jax.random.permutation(ksub, n)[:subsample_warmstart]
            sub_mask = jnp.ones((subsample_warmstart,), dtype=bool)
            m0 = fit_gp_core(
                x[idx], y[idx], sub_mask, theta0, bounds_lo, bounds_up,
                active_mask, key,
                corr=corr, trend=trend, kpls_dim=kpls_dim,
                n_start=n_start, max_iters=max_iters, fixed=False,
                nugget=nugget, ls_batch=ls_batch,
            )
            theta0 = jnp.clip(m0.theta, bounds_lo, bounds_up)
        if not use_fused_recipe:
            n_start = 0
            max_iters = polish_iters

    if auto_polish_residual is not None:
        polish_residual = bool(auto_polish_residual)

    # nugget-escalation retry: if the optimum lands where the f32/f64
    # Cholesky fails (likelihood -inf), refit with a 100x larger nugget.
    # nugget is a traced argument, so retries re-use the compiled program
    # (robustness parity with the reference's ill-conditioning guards,
    # gp/src/algorithm.rs:1009-1027).
    model = None
    for _ in range(3):
        if use_fused_recipe:
            model = _fit_mf_fused(
                x, y, theta0, bounds_lo, bounds_up, active_mask, key,
                corr=corr, trend=trend, kpls_dim=kpls_dim,
                n_start=n_start, max_iters=max_iters,
                sub_m=int(subsample_warmstart), polish_iters=polish_iters,
                nugget=nugget, residual=polish_residual,
                grad_probes=grad_probes, polish_tr=polish_tr,
                sub_draws=int(sub_draws),
                sub_m2=int(subsample_warmstart2 or 0),
            )
        else:
            # polish_tr only applies to a polish phase (n_start was zeroed
            # by the warm-start block above when one ran)
            in_polish = bool(
                polish_tr and subsample_warmstart and n_start == 0
            )
            model = fit_gp_core(
                x, y, mask, theta0, bounds_lo, bounds_up, active_mask,
                key,
                corr=corr, trend=trend, kpls_dim=kpls_dim,
                n_start=n_start, max_iters=max_iters, fixed=theta_fixed,
                nugget=nugget, ls_batch=ls_batch,
                residual_api=polish_residual or in_polish,
                grad_probes=grad_probes, tr=in_polish,
            )
        if bool(jnp.isfinite(model.likelihood)):
            return model
        nugget *= 100.0
    # retries exhausted with a non-finite likelihood: the Cholesky failed at
    # every escalated nugget — surface the failure instead of silently
    # returning a garbage surrogate (the reference errors out of fit,
    # gp/src/algorithm.rs:1009-1027 LikelihoodComputationError)
    raise GpFitError(
        "GP fit failed: reduced likelihood is non-finite after 3 "
        f"nugget escalations (final nugget={nugget:.3g}, n={int(n)}, "
        f"corr={corr}, trend={trend}). The training design is likely "
        "degenerate (duplicated or collinear points)."
    )
