"""GpMixture: mixture of GP experts.

TPU-first rebuild of crates/moe/src/algorithm.rs:

- clustering: joint (x, y) GMM (vmapped-restart EM, moe/gmm.py) replaces
  linfa GMM; hard assignment splits the data (sort_by_cluster,
  moe/src/clustering.rs:33-56);
- expert selection per cluster (find_best_expert, algorithm.rs:209-347):
  5-fold CV over the allowed trend x kernel grid, where each combo's five
  fold-fits run as ONE vmapped masked-fit batch (the reference generates
  sequential macro code per combo);
- smooth recombination with heaviside-factor grid search over
  linspace(0.1, 2.1, 20) on a 1-in-5 holdout (algorithm.rs:349-378), then a
  final retrain on the full data;
- prediction: smooth = sum_k proba_k * pred_k (variance with proba^2
  weights), hard = expert of the argmax cluster (algorithm.rs:411-423,
  662-685, 879-935).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..gp.fit import fit_gp
from ..gp.gp import (
    GpModel,
    predict as gp_predict,
    predict_gradients as gp_predict_gradients,
    predict_valvar as gp_predict_valvar,
    predict_var as gp_predict_var,
    predict_var_gradients as gp_predict_var_gradients,
    sample as gp_sample,
)
from ..gp.sgp import (
    SgpModel,
    fit_sgp,
    sgp_predict,
    sgp_predict_gradients,
    sgp_predict_valvar,
    sgp_predict_var,
    sgp_predict_var_gradients,
)
from ..types import Recombination


def _e_predict(e, x):
    return sgp_predict(e, x) if isinstance(e, SgpModel) else gp_predict(e, x)


def _e_valvar(e, x):
    if isinstance(e, SgpModel):
        return sgp_predict_valvar(e, x)
    return gp_predict_valvar(e, x)


def _e_var(e, x):
    if isinstance(e, SgpModel):
        return sgp_predict_var(e, x)
    return gp_predict_var(e, x)


def _e_grad(e, x):
    if isinstance(e, SgpModel):
        return sgp_predict_gradients(e, x)
    return gp_predict_gradients(e, x)


def _e_vargrad(e, x):
    if isinstance(e, SgpModel):
        return sgp_predict_var_gradients(e, x)
    return gp_predict_var_gradients(e, x)
from .gaussian_mixture import (
    GaussianMixture,
    from_gmm_x_marginal,
    predict_cluster,
    predict_probas,
    predict_probas_derivatives,
)
from .gmm import fit_gmm, gmm_log_prob


from functools import partial

from ..gp.fit import GP_DEFAULT_THETA_BOUNDS, fit_gp_core


def _fit_bucket() -> int:
    import os

    return int(os.environ.get("EGOBOX_SHAPE_BUCKET", "8"))


def _pad_xy(x: np.ndarray, y: np.ndarray):
    """Pad (x, y) rows up to the shape bucket with masked rows so the
    expert fits of a GROWING design reuse XLA compilations (the masked
    likelihood is exact; same pad-to-bucket scheme as the EGO solver).
    Returns (x_pad, y_pad, valid_mask)."""
    n = x.shape[0]
    b = _fit_bucket()
    nb = max(b, -(-n // b) * b)
    valid = np.zeros(nb, dtype=bool)
    valid[:n] = True
    if nb == n:
        return x, y, valid
    xp = np.zeros((nb, x.shape[1]), dtype=x.dtype)
    xp[:n] = x
    yp = np.zeros(nb, dtype=y.dtype)
    yp[:n] = y
    return xp, yp, valid


@partial(
    jax.jit,
    static_argnames=("corr", "trend", "kpls_dim", "n_start", "max_iters"),
)
def _cv_folds_error(x, y, masks, valid, theta0, lo, up, key, *, corr, trend,
                    kpls_dim, n_start, max_iters):
    """All k fold-fits advance as ONE vmapped masked-fit batch; the
    held-out error is computed on the real (valid) complementary rows."""
    active = jnp.ones_like(theta0, dtype=bool)

    def one_fold(mask):
        model = fit_gp_core(
            x, y[:, None], mask, theta0, lo, up, active, key,
            corr=corr, trend=trend, kpls_dim=kpls_dim, n_start=n_start,
            max_iters=max_iters, nugget=100.0 * jnp.finfo(x.dtype).eps,
        )
        pred = gp_predict(model, x)  # (n,)
        test = (~mask) & valid
        w = test.astype(x.dtype)
        return jnp.sum((pred - y) ** 2 * w) / jnp.maximum(jnp.sum(w), 1.0)

    return jax.vmap(one_fold)(masks)  # (k,) per-fold MSE


def _cv_error(x: np.ndarray, y: np.ndarray, corr: str, trend: str,
              kpls_dim, n_start: int, seed: int, n_folds: int = 5) -> float:
    """k-fold CV RMSE of one (trend, corr) combo using masked fits — the
    folds share one compiled vmapped program
    (ref: expertise_macros.rs:14-130 generates sequential per-combo code).
    """
    n = x.shape[0]
    n_folds = min(n_folds, n)
    idx = np.arange(n)
    rng = np.random.default_rng(seed)
    rng.shuffle(idx)
    xp, yp, valid = _pad_xy(x, y)
    masks = np.zeros((n_folds, xp.shape[0]), dtype=bool)
    masks[:, :n] = True
    for f in range(n_folds):
        masks[f, idx[f::n_folds]] = False

    dim = kpls_dim if kpls_dim is not None else x.shape[1]
    dtype = jnp.asarray(x).dtype
    theta0 = jnp.full((dim,), 0.1, dtype)
    lo = jnp.full((dim,), GP_DEFAULT_THETA_BOUNDS[0], dtype)
    up = jnp.full((dim,), GP_DEFAULT_THETA_BOUNDS[1], dtype)
    try:
        errs = _cv_folds_error(
            jnp.asarray(xp), jnp.asarray(yp), jnp.asarray(masks),
            jnp.asarray(valid), theta0, lo, up, jax.random.key(seed),
            corr=corr, trend=trend, kpls_dim=kpls_dim,
            n_start=min(n_start, 5), max_iters=20,
        )
        errs = np.asarray(errs)
        errs = np.where(np.isfinite(errs), errs, np.inf)
    except Exception:
        return np.inf
    return float(np.sqrt(np.mean(errs)))


def _min_points(trend: str, dim: int) -> int:
    """(ref: check_number_of_points, algorithm.rs:381-405)"""
    if trend == "quadratic":
        return (dim + 1) * (dim + 2) // 2
    if trend == "linear":
        return dim + 1
    return 1


def _sgp_cv_error(x, y, corr, n_inducing, sparse_method, n_start, seed,
                  n_folds: int = 5) -> float:
    """k-fold CV RMSE for a sparse-GP expert candidate (host loop; the
    reference generates this via declare_sgp_surrogate! macros)."""
    n = x.shape[0]
    n_folds = min(n_folds, max(n // 10, 2))
    idx = np.arange(n)
    rng = np.random.default_rng(seed)
    rng.shuffle(idx)
    errs = []
    for f in range(n_folds):
        test = idx[f::n_folds]
        train = np.setdiff1d(idx, test)
        try:
            m = fit_sgp(
                jnp.asarray(x[train]), jnp.asarray(y[train]), corr=corr,
                method=sparse_method,
                n_inducing=min(n_inducing, train.size),
                n_start=min(n_start, 3), max_iters=20, seed=seed,
            )
            pred = np.asarray(sgp_predict(m, jnp.asarray(x[test])))
            errs.append(np.mean((pred - y[test]) ** 2))
        except Exception:
            errs.append(np.inf)
    return float(np.sqrt(np.mean(errs)))


def find_best_expert(
    x: np.ndarray,
    y: np.ndarray,
    regr_names: Sequence[str],
    corr_names: Sequence[str],
    kpls_dim=None,
    n_start: int = 10,
    seed: int = 42,
    theta_init=None,
    theta_bounds=None,
    gp_type: str = "full",
    n_inducing: int = 10,
    sparse_method: str = "FITC",
):
    """CV-select the (trend, kernel) combo and train it on all data
    (ref: find_best_expert, algorithm.rs:209-347). ``gp_type="sparse"``
    selects sparse-GP experts (constant trend only, like the reference's
    declare_sgp_surrogate registry, surrogates.rs:266-422)."""
    n, nx = x.shape
    dim = kpls_dim if kpls_dim is not None else nx

    if gp_type == "sparse":
        if len(corr_names) == 1:
            corr = corr_names[0]
        else:
            errors = {
                c: _sgp_cv_error(x, y, c, n_inducing, sparse_method,
                                 n_start, seed)
                for c in corr_names
            }
            corr = min(errors, key=errors.get)
        return fit_sgp(
            jnp.asarray(x), jnp.asarray(y), corr=corr,
            method=sparse_method, n_inducing=min(n_inducing, n),
            kpls_dim=kpls_dim, n_start=n_start, seed=seed,
            theta_init=theta_init, theta_bounds=theta_bounds,
        )

    allowed = [
        (t, c)
        for t in regr_names
        if n >= _min_points(t, dim) + 1
        for c in corr_names
    ]
    if not allowed:
        allowed = [("constant", corr_names[0])]

    if len(allowed) == 1:
        trend, corr = allowed[0]
    else:
        errors = {
            (t, c): _cv_error(x, y, c, t, kpls_dim, n_start, seed)
            for t, c in allowed
        }
        trend, corr = min(errors, key=errors.get)

    xp, yp, valid = _pad_xy(x, y)
    return fit_gp(
        jnp.asarray(xp), jnp.asarray(yp), corr=corr, trend=trend,
        kpls_dim=kpls_dim, n_start=n_start, seed=seed,
        theta_init=theta_init, theta_bounds=theta_bounds,
        mask=jnp.asarray(valid),
    )


from flax import struct


@struct.dataclass
class MoeModel:
    """jit-friendly pytree form of a trained mixture: experts as pytree
    children (their corr/trend are static aux data), recombination static.
    Used inside the jitted EGO infill optimization; the host-facing
    ``GpMixture`` wraps the same data with a method API."""

    experts: tuple  # Tuple[GpModel, ...]
    gmx: GaussianMixture
    smooth: bool = struct.field(pytree_node=False, default=True)


def moe_predict_valvar_single(model: MoeModel, x: jnp.ndarray):
    """(mean, var) of one MoeModel at ONE point x (nx,) — scalar pair.
    Smooth recombination: mean = sum p_k mu_k, var = sum p_k^2 var_k
    (ref: algorithm.rs:662-685); hard: argmax-cluster expert."""
    xq = x[None, :]
    mvs = [_e_valvar(e, xq) for e in model.experts]
    means = jnp.stack([m[0] for m, _ in mvs])  # (k,)
    vrs = jnp.stack([v[0] for _, v in mvs])
    if len(model.experts) == 1:
        return means[0], vrs[0]
    probas = predict_probas(model.gmx, xq)[0]  # (k,)
    if model.smooth:
        return jnp.sum(probas * means), jnp.sum(probas**2 * vrs)
    c = jnp.argmax(probas)
    return means[c], vrs[c]


def moe_predict_valvar_batch(model: MoeModel, x: jnp.ndarray):
    """(means, vars) of one MoeModel over a cloud x (p, nx) -> ((p,), (p,))."""
    mvs = [_e_valvar(e, x) for e in model.experts]
    means = jnp.stack([m for m, _ in mvs])  # (k, p)
    vrs = jnp.stack([v for _, v in mvs])
    if len(model.experts) == 1:
        return means[0], vrs[0]
    probas = predict_probas(model.gmx, x)  # (p, k)
    if model.smooth:
        return (
            jnp.sum(probas.T * means, axis=0),
            jnp.sum((probas.T**2) * vrs, axis=0),
        )
    c = jnp.argmax(probas, axis=1)  # (p,)
    take = lambda a: jnp.take_along_axis(a, c[None, :], axis=0)[0]
    return take(means), take(vrs)


@dataclass
class GpMixture:
    """Trained mixture (ref struct: moe/src/algorithm.rs:430-443)."""

    experts: List[GpModel]
    gmx: GaussianMixture
    recombination: Recombination = Recombination.SMOOTH

    def to_model(self) -> MoeModel:
        return MoeModel(
            experts=tuple(self.experts),
            gmx=self.gmx,
            smooth=self.recombination is Recombination.SMOOTH,
        )

    @property
    def n_clusters(self) -> int:
        return len(self.experts)

    # -- prediction -----------------------------------------------------

    def _expert_preds(self, x: jnp.ndarray):
        means = jnp.stack([_e_predict(e, x) for e in self.experts])
        return means  # (k, n)

    def _expert_valvars(self, x: jnp.ndarray):
        mvs = [_e_valvar(e, x) for e in self.experts]
        means = jnp.stack([m for m, _ in mvs])
        vrs = jnp.stack([v for _, v in mvs])
        return means, vrs

    def predict(self, x) -> jnp.ndarray:
        x = jnp.atleast_2d(jnp.asarray(x))
        if self.n_clusters == 1:
            return _e_predict(self.experts[0], x)
        if self.recombination is Recombination.HARD:
            return self._predict_hard(x)
        return self._predict_smooth(x)

    def _predict_smooth(self, x):
        """(ref: predict_smooth, algorithm.rs:662-685)"""
        probas = predict_probas(self.gmx, x)  # (n, k)
        means = self._expert_preds(x)  # (k, n)
        return jnp.sum(probas.T * means, axis=0)

    def _predict_hard(self, x):
        """(ref: predict_hard, algorithm.rs:879-935)"""
        cl = predict_cluster(self.gmx, x)  # (n,)
        means = self._expert_preds(x)  # (k, n)
        return jnp.take_along_axis(means, cl[None, :], axis=0)[0]

    def predict_var(self, x) -> jnp.ndarray:
        x = jnp.atleast_2d(jnp.asarray(x))
        if self.n_clusters == 1:
            return _e_var(self.experts[0], x)
        _, vrs = self._expert_valvars(x)
        if self.recombination is Recombination.HARD:
            cl = predict_cluster(self.gmx, x)
            return jnp.take_along_axis(vrs, cl[None, :], axis=0)[0]
        probas = predict_probas(self.gmx, x)  # (n, k)
        # smooth variance uses squared responsibilities
        # (ref: algorithm.rs:670-685)
        return jnp.sum((probas.T**2) * vrs, axis=0)

    def predict_valvar(self, x):
        return self.predict(x), self.predict_var(x)

    def predict_gradients(self, x) -> jnp.ndarray:
        x = jnp.atleast_2d(jnp.asarray(x))
        if self.n_clusters == 1:
            return _e_grad(self.experts[0], x)
        grads = jnp.stack(
            [_e_grad(e, x) for e in self.experts]
        )  # (k, n, nx)
        if self.recombination is Recombination.HARD:
            cl = predict_cluster(self.gmx, x)
            return grads[cl, jnp.arange(x.shape[0])]
        # product rule: d(sum p_k y_k) = sum (dp_k y_k + p_k dy_k)
        # (ref: algorithm.rs:691-783)
        probas = predict_probas(self.gmx, x)  # (n, k)
        dprobas = predict_probas_derivatives(self.gmx, x)  # (n, k, nx)
        means = self._expert_preds(x)  # (k, n)
        term1 = jnp.einsum("nkd,kn->nd", dprobas, means)
        term2 = jnp.einsum("nk,knd->nd", probas, grads)
        return term1 + term2

    def predict_var_gradients(self, x) -> jnp.ndarray:
        x = jnp.atleast_2d(jnp.asarray(x))
        if self.n_clusters == 1:
            return _e_vargrad(self.experts[0], x)
        vgrads = jnp.stack(
            [_e_vargrad(e, x) for e in self.experts]
        )
        if self.recombination is Recombination.HARD:
            cl = predict_cluster(self.gmx, x)
            return vgrads[cl, jnp.arange(x.shape[0])]
        probas = predict_probas(self.gmx, x)
        dprobas = predict_probas_derivatives(self.gmx, x)
        _, vrs = self._expert_valvars(x)
        term1 = 2.0 * jnp.einsum("nk,nkd,kn->nd", probas, dprobas, vrs)
        term2 = jnp.einsum("nk,knd->nd", probas**2, vgrads)
        return term1 + term2

    def sample(self, x, n_traj: int, key=None):
        """Trajectory sampling, mono-cluster only
        (ref: algorithm.rs:550-558)."""
        if self.n_clusters != 1:
            raise ValueError("sampling requires a single cluster")
        key = key if key is not None else jax.random.key(0)
        return gp_sample(self.experts[0], jnp.atleast_2d(jnp.asarray(x)),
                         n_traj, key)


def _predict_smooth_with(experts, gmx, x):
    probas = predict_probas(gmx, x)
    means = jnp.stack([_e_predict(e, x) for e in experts])
    return jnp.sum(probas.T * means, axis=0)


def optimize_heaviside_factor(experts, gmx, xtest, ytest) -> float:
    """Grid-search the smoothing factor on held-out data
    (ref: optimize_heaviside_factor, algorithm.rs:349-378)."""
    factors = np.linspace(0.1, 2.1, 20)
    denom = float(np.sqrt(np.sum(np.asarray(xtest) ** 2)))
    errors = []
    for f in factors:
        g2 = gmx.with_heaviside(float(f))
        pred = np.asarray(_predict_smooth_with(experts, g2, xtest))
        errors.append(
            float(np.sqrt(np.sum((pred - np.asarray(ytest)) ** 2)))
            / max(denom, 1e-300)
        )
    errors = np.asarray(errors)
    if errors.max() < 1e-6:
        return 1.0
    return float(factors[int(np.argmin(errors))])


def expert_params(mix: GpMixture) -> list:
    """Extract per-expert (trend, corr, theta) so a later refit can reuse
    them as Fixed hyperparameters (ref: solver_impl.rs:643-645 q_optmod
    theta reuse). Sparse experts return None (always retrained)."""
    out = []
    for e in mix.experts:
        if isinstance(e, SgpModel):
            out.append(None)
        else:
            out.append((e.trend, e.corr, np.asarray(e.theta).tolist()))
    return out


def train_moe_on_clusters(
    x,
    y,
    gmx: GaussianMixture,
    recombination: Recombination = Recombination.SMOOTH,
    *,
    regr_names: Sequence[str] = ("constant",),
    corr_names: Sequence[str] = ("squared_exponential",),
    kpls_dim: Optional[int] = None,
    n_start: int = 10,
    seed: int = 42,
    theta_init=None,
    theta_bounds=None,
    fixed_params: Optional[list] = None,
) -> GpMixture:
    """Retrain experts on an EXISTING clustering (ref: train_on_clusters,
    moe/src/algorithm.rs) — used by the EGO solver between reclusterings.

    ``fixed_params``: per-cluster (trend, corr, theta) from a previous fit;
    when given, each expert is refit on the new data at those FIXED
    hyperparameters (no CV selection, no multistart) — the q_optmod
    hyperparameter-reuse mode (ref: solver_impl.rs:643-645)."""
    x = np.atleast_2d(np.asarray(x, dtype=float))
    y = np.asarray(y, dtype=float).reshape(x.shape[0])
    k = gmx.n_clusters

    def fit_cluster(xc, yc, c):
        p = fixed_params[c] if fixed_params is not None else None
        if p is not None:
            trend, corr, theta = p
            xp, yp, valid = _pad_xy(xc, yc)
            return fit_gp(
                jnp.asarray(xp), jnp.asarray(yp), corr=corr, trend=trend,
                kpls_dim=kpls_dim, theta_init=jnp.asarray(theta),
                theta_fixed=True, seed=seed, theta_bounds=theta_bounds,
                mask=jnp.asarray(valid),
            )
        return find_best_expert(
            xc, yc, regr_names, corr_names, kpls_dim, n_start, seed,
            theta_init, theta_bounds,
        )

    if k == 1:
        return GpMixture([fit_cluster(x, y, 0)], gmx, recombination)
    assign = np.asarray(predict_cluster(gmx, jnp.asarray(x)))
    experts = []
    for c in range(k):
        sel = assign == c
        if sel.sum() < 3:
            sel = np.ones(x.shape[0], dtype=bool)
        experts.append(fit_cluster(x[sel], y[sel], c))
    return GpMixture(experts, gmx, recombination)


def train_moe(
    x,
    y,
    *,
    n_clusters: int = 1,
    recombination: Recombination = Recombination.SMOOTH,
    regr_names: Sequence[str] = ("constant",),
    corr_names: Sequence[str] = ("squared_exponential",),
    kpls_dim: Optional[int] = None,
    n_start: int = 10,
    heaviside_factor: Optional[float] = None,
    seed: int = 42,
    theta_init=None,
    theta_bounds=None,
    gp_type: str = "full",
    n_inducing: int = 10,
    sparse_method: str = "FITC",
) -> GpMixture:
    """Train a mixture of GP experts (ref: train, algorithm.rs:70-205).

    ``n_clusters``: >0 fixed; 0 auto; <0 auto with max = -n_clusters.
    ``gp_type``: "full" dense kriging experts or "sparse" FITC/VFE experts
    with ``n_inducing`` points (ref: GpType, moe/src/parameters.rs:98-108).
    """
    x = np.atleast_2d(np.asarray(x, dtype=float))
    y = np.asarray(y, dtype=float).reshape(x.shape[0])
    n, nx = x.shape

    if n_clusters <= 0:
        from .clustering import find_best_number_of_clusters

        max_k = (n // 10 + 1) if n_clusters == 0 else -n_clusters
        k, recombination = find_best_number_of_clusters(
            x, y, max_k, regr_names, corr_names, kpls_dim, seed
        )
    else:
        k = n_clusters

    key = jax.random.key(seed)

    expert_kwargs = dict(
        gp_type=gp_type, n_inducing=n_inducing, sparse_method=sparse_method,
    )
    if k == 1:
        expert = find_best_expert(
            x, y, regr_names, corr_names, kpls_dim, n_start, seed,
            theta_init, theta_bounds, **expert_kwargs,
        )
        gmm = fit_gmm(key, jnp.asarray(np.hstack([x, y[:, None]])), 1)
        gmx = from_gmm_x_marginal(gmm, nx)
        return GpMixture([expert], gmx, recombination)

    data = jnp.asarray(np.hstack([x, y[:, None]]))
    gmm = fit_gmm(key, data, k, n_runs=20)
    gmx = from_gmm_x_marginal(gmm, nx)

    # hard assignment on the joint (x, y) space (ref: sort_by_cluster)
    logp = gmm_log_prob(data, gmm.means, gmm.precisions_chol) + jnp.log(
        jnp.maximum(gmm.weights, 1e-300)
    )
    assign = np.asarray(jnp.argmax(logp, axis=1))

    smooth_opt = (
        recombination is Recombination.SMOOTH and heaviside_factor is None
        and k > 1
    )
    if smooth_opt:
        # hold out 1-in-5 points for heaviside search, retrain after
        # (ref: algorithm.rs:106-205)
        test_idx = np.arange(n)[::5]
        train_mask = np.ones(n, dtype=bool)
        train_mask[test_idx] = False
    else:
        train_mask = np.ones(n, dtype=bool)

    def fit_experts(sel_mask):
        experts = []
        for c in range(k):
            sel = (assign == c) & sel_mask
            if sel.sum() < 3:
                sel = assign == c  # too few points: use all cluster points
            experts.append(
                find_best_expert(
                    x[sel], y[sel], regr_names, corr_names, kpls_dim,
                    n_start, seed, theta_init, theta_bounds,
                    **expert_kwargs,
                )
            )
        return experts

    experts = fit_experts(train_mask)

    if smooth_opt:
        factor = optimize_heaviside_factor(
            experts, gmx, jnp.asarray(x[test_idx]), jnp.asarray(y[test_idx])
        )
        gmx = gmx.with_heaviside(factor)
        experts = fit_experts(np.ones(n, dtype=bool))
    elif heaviside_factor is not None:
        gmx = gmx.with_heaviside(heaviside_factor)

    return GpMixture(experts, gmx, recombination)
