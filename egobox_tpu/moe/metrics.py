"""GP quality-assurance metrics: Q2, PVA, IAE_alpha.

Behavioral parity with crates/moe/src/metrics.rs (and gp/src/metrics.rs):
cross-validated predictive quality scores. For dense-GP hooks the k
fold-fits run as ONE vmapped masked-fit program (``gp_fit_predict``);
sparse-GP hooks fall back to a per-fold host loop because the SGP fit has
no masked path (reference refits sequentially in both cases).

- Q2        = 1 - PRESS / TSS (1 is perfect)
- PVA       = |ln( mean (y - yhat)^2 / var_hat )| (0 is perfect)
- IAE_alpha = mean over 20 alphas of |empirical CI coverage - (1 - alpha)|
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np


def _norm_ppf(q):
    """Inverse standard normal CDF (statrs Normal::inverse_cdf in the
    reference). Implemented via jax erfinv — no scipy dependency."""
    import jax.scipy.special as jss

    q = jnp.asarray(q)
    return jnp.sqrt(2.0) * jss.erfinv(2.0 * q - 1.0)


def _cv_masks(n: int, kfold: int) -> np.ndarray:
    masks = np.ones((kfold, n), dtype=bool)
    idx = np.arange(n)
    for f in range(kfold):
        masks[f, idx[f::kfold]] = False
    return masks


def _cv_pred_valvar(x: np.ndarray, y: np.ndarray, fit_predict, kfold: int,
                    seed: int = 0):
    """Generic k-fold CV: returns per-fold (y_true, pred, var).

    Two hook protocols:

    - batched (``fit_predict.batched`` truthy):
      ``fit_predict(x, y, masks (k, n)) -> (preds (k, n), vars (k, n))`` —
      ALL fold-fits advance as one vmapped masked-fit program (see
      ``gp_fit_predict``); the reference refits sequentially
      (moe/src/metrics.rs k-fold loop);
    - per-fold fallback for models without masked fits (sparse GP):
      ``fit_predict(x, y, mask, x_test) -> (pred, var)``.
    """
    n = x.shape[0]
    kfold = min(kfold, n)
    masks = _cv_masks(n, kfold)
    if getattr(fit_predict, "batched", False):
        preds, vrs = fit_predict(x, y, masks)
        preds = np.asarray(preds)
        vrs = np.asarray(vrs)
        return [
            (y[~masks[f]], preds[f][~masks[f]], vrs[f][~masks[f]])
            for f in range(kfold)
        ]
    outs = []
    for f in range(kfold):
        test = ~masks[f]
        pred, var = fit_predict(x, y, masks[f], x[test])
        outs.append((y[test], np.asarray(pred), np.asarray(var)))
    return outs


def q2_score(x, y, fit_predict, kfold: Optional[int] = None,
             seed: int = 0) -> float:
    """(ref: metrics.rs q2_k_score / q2_score; LOO when kfold is None)"""
    x = np.atleast_2d(np.asarray(x, dtype=float))
    y = np.asarray(y, dtype=float).ravel()
    kfold = kfold if kfold is not None else x.shape[0]
    y_mean = y.mean()
    outs = _cv_pred_valvar(x, y, fit_predict, kfold, seed)
    press = sum(float(np.sum((yt - p) ** 2)) for yt, p, _ in outs)
    tss = sum(float(np.sum((yt - y_mean) ** 2)) for yt, _, _ in outs)
    return 1.0 - press / tss


def pva_score(x, y, fit_predict, kfold: Optional[int] = None,
              seed: int = 0) -> float:
    """(ref: metrics.rs pva_k_score)"""
    x = np.atleast_2d(np.asarray(x, dtype=float))
    y = np.asarray(y, dtype=float).ravel()
    kfold = kfold if kfold is not None else x.shape[0]
    outs = _cv_pred_valvar(x, y, fit_predict, kfold, seed)
    varss = 0.0
    n = 0
    for yt, p, v in outs:
        varss += float(np.sum((yt - p) ** 2 / np.maximum(v, 1e-300)))
        n += yt.shape[0]
    return abs(float(np.log(varss / n)))


def iae_alpha_score(x, y, fit_predict, kfold: Optional[int] = None,
                    seed: int = 0, n_alpha: int = 20) -> float:
    """(ref: metrics.rs iae_alpha_k_score / iae_alpha:146-195)"""
    x = np.atleast_2d(np.asarray(x, dtype=float))
    y = np.asarray(y, dtype=float).ravel()
    kfold = kfold if kfold is not None else x.shape[0]
    alphas = np.linspace(0.02, 0.98, n_alpha)
    q = np.asarray(_norm_ppf(1.0 - alphas / 2.0))

    outs = _cv_pred_valvar(x, y, fit_predict, kfold, seed)
    iaes = []
    for yt, p, v in outs:
        sigma = np.sqrt(np.maximum(v, 0.0))
        offset = sigma[:, None] * q[None, :]  # (n_test, n_alpha)
        inside = (yt[:, None] >= p[:, None] - offset) & (
            yt[:, None] <= p[:, None] + offset
        )
        coverage = inside.mean(axis=0)  # (n_alpha,)
        iaes.append(np.mean(np.abs(coverage - (1.0 - alphas))))
    return float(np.mean(iaes))


def iae_alpha_with_plot(x, y, fit_predict, kfold: Optional[int] = None,
                        seed: int = 0, n_alpha: int = 20):
    """IAE_alpha plus the per-alpha empirical coverages for the gpqa table
    (ref: GpMetric::IAEAlphaWithPlot, gpqa/src/main.rs:41-60).
    Returns (score, alphas, coverages)."""
    x = np.atleast_2d(np.asarray(x, dtype=float))
    y = np.asarray(y, dtype=float).ravel()
    kfold = kfold if kfold is not None else x.shape[0]
    alphas = np.linspace(0.02, 0.98, n_alpha)
    q = np.asarray(_norm_ppf(1.0 - alphas / 2.0))

    outs = _cv_pred_valvar(x, y, fit_predict, kfold, seed)
    yt = np.concatenate([o[0] for o in outs])
    p = np.concatenate([o[1] for o in outs])
    v = np.concatenate([o[2] for o in outs])
    sigma = np.sqrt(np.maximum(v, 0.0))
    offset = sigma[:, None] * q[None, :]
    inside = (yt[:, None] >= p[:, None] - offset) & (
        yt[:, None] <= p[:, None] + offset
    )
    coverage = inside.mean(axis=0)  # (n_alpha,)
    score = iae_alpha_score(x, y, fit_predict, kfold, seed, n_alpha)
    return score, alphas, coverage


def gp_fit_predict(corr: str = "squared_exponential",
                   trend: str = "constant", n_start: int = 5,
                   kpls_dim=None, seed: int = 42,
                   max_iters: int = 20) -> Callable:
    """Batched fit_predict hook for a plain GP (used by Gpx metrics): the k
    fold-fits run as ONE jitted vmapped masked-fit program, predicting at
    the full design (test values are selected per fold by the caller)."""
    import jax

    from ..gp.fit import (
        GP_DEFAULT_THETA_BOUNDS,
        GP_DEFAULT_THETA_INIT,
        fit_gp_core,
    )
    from ..gp.gp import predict_valvar
    from functools import partial

    @partial(
        jax.jit,
        static_argnames=("_corr", "_trend", "_kpls", "_ns", "_mi"),
    )
    def _folds(xj, yj, masksj, key, *, _corr, _trend, _kpls, _ns, _mi):
        dtype = xj.dtype
        dim = _kpls if _kpls is not None else xj.shape[1]
        theta0 = jnp.full((dim,), GP_DEFAULT_THETA_INIT, dtype)
        lo = jnp.full((dim,), GP_DEFAULT_THETA_BOUNDS[0], dtype)
        up = jnp.full((dim,), GP_DEFAULT_THETA_BOUNDS[1], dtype)
        active = jnp.ones((dim,), dtype=bool)
        nugget = 100.0 * jnp.finfo(dtype).eps

        def one(mask):
            model = fit_gp_core(
                xj, yj[:, None], mask, theta0, lo, up, active, key,
                corr=_corr, trend=_trend, kpls_dim=_kpls, n_start=_ns,
                max_iters=_mi, nugget=nugget,
            )
            return predict_valvar(model, xj)

        return jax.vmap(one)(masksj)

    def fp(x, y, masks):
        return _folds(
            jnp.asarray(x), jnp.asarray(np.ravel(y)), jnp.asarray(masks),
            jax.random.key(seed),
            _corr=corr, _trend=trend, _kpls=kpls_dim, _ns=n_start,
            _mi=max_iters,
        )

    fp.batched = True
    return fp


def sgp_fit_predict(corr: str = "squared_exponential",
                    method: str = "FITC", n_inducing: int = 10,
                    n_start: int = 5, max_iters: int = 25,
                    seed: int = 0) -> Callable:
    """Batched fit_predict hook for a SPARSE GP: the k fold-refits run as
    ONE vmapped program (closes the round-2 weak spot where SGP QA folds
    were a sequential host loop — the reference also refits sequentially,
    moe/src/metrics.rs). The SGP fit has no masked path, so each fold's
    training subset is gathered into a (k, n_tr, d) stack with n_tr =
    the smallest fold size — unequal folds lose at most one training
    point each, which is noise at QA fidelity. Inducing points are drawn
    per fold from that fold's training rows."""
    import jax

    from ..gp.sgp import (
        SGP_NOISE_BOUNDS_EPS_FACTOR,
        SGP_NOISE_INIT,
        SGP_NOISE_UPPER,
        SGP_THETA_BOUNDS,
        fit_sgp_core,
        sgp_predict_valvar,
    )

    def hook(x, y, masks):
        x = jnp.asarray(np.atleast_2d(np.asarray(x, dtype=float)))
        yv = np.asarray(y, dtype=float).ravel()
        masks = np.asarray(masks, dtype=bool)
        k, n = masks.shape
        d = x.shape[1]
        dtype = x.dtype
        n_tr = int(masks.sum(axis=1).min())
        idx = np.stack([np.nonzero(m)[0][:n_tr] for m in masks])
        xtr = x[idx]  # (k, n_tr, d)
        ytr = jnp.asarray(yv)[idx][..., None]  # (k, n_tr, 1)

        m = min(n_inducing, n_tr)
        rng = np.random.default_rng(seed)
        zidx = np.stack([rng.permutation(n_tr)[:m] for _ in range(k)])
        z = xtr[np.arange(k)[:, None], zidx]  # (k, m, d)

        theta0 = jnp.full((d,), 0.1, dtype)
        lo = jnp.full((d,), SGP_THETA_BOUNDS[0], dtype)
        up = jnp.full((d,), SGP_THETA_BOUNDS[1], dtype)
        eps = float(jnp.finfo(dtype).eps)
        noise0 = jnp.asarray(SGP_NOISE_INIT, dtype)
        nb = (
            jnp.asarray(SGP_NOISE_BOUNDS_EPS_FACTOR * eps, dtype),
            jnp.asarray(SGP_NOISE_UPPER, dtype),
        )
        # split from one master key: raw key(i) seeds can produce
        # degenerate maximin-LHS theta inits (measured: a 3-restart fit
        # from key(0) landed 250 likelihood units below the optimum)
        keys = jax.random.split(jax.random.key(seed), k)

        def fit_one(xt, yt, zz, kk):
            mdl = fit_sgp_core(
                xt, yt, zz, theta0, lo, up, noise0, nb, kk,
                corr=corr, method=method, n_start=n_start,
                max_iters=max_iters, estimate_noise=True,
                nugget=1000.0 * eps,
            )
            p, v = sgp_predict_valvar(mdl, x)
            return p.reshape(-1), v.reshape(-1)

        preds, vrs = jax.vmap(fit_one)(xtr, ytr, z, keys)
        return np.asarray(preds), np.asarray(vrs)

    hook.batched = True
    return hook
