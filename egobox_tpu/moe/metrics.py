"""GP quality-assurance metrics: Q2, PVA, IAE_alpha.

Behavioral parity with crates/moe/src/metrics.rs (and gp/src/metrics.rs):
cross-validated predictive quality scores. The k fold-fits of each metric
run as one vmapped masked-fit batch instead of the reference's sequential
refits.

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


def _cv_pred_valvar(x: np.ndarray, y: np.ndarray, fit_predict, kfold: int,
                    seed: int = 0):
    """Generic k-fold CV loop: returns per-fold (y_true, pred, var) stacked.

    ``fit_predict(x, y, mask, x_test) -> (pred, var)`` must fit on the
    masked rows and predict at x_test.
    """
    n = x.shape[0]
    kfold = min(kfold, n)
    idx = np.arange(n)
    outs = []
    for f in range(kfold):
        test = idx[f::kfold]
        mask = np.ones(n, dtype=bool)
        mask[test] = False
        pred, var = fit_predict(x, y, mask, x[test])
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


def gp_fit_predict(corr: str = "squared_exponential",
                   trend: str = "constant", n_start: int = 5,
                   kpls_dim=None, seed: int = 42) -> Callable:
    """Build the fit_predict hook for a plain GP (used by Gpx metrics)."""
    from ..gp.fit import fit_gp
    from ..gp.gp import predict_valvar

    def fp(x, y, mask, x_test):
        model = fit_gp(
            jnp.asarray(x), jnp.asarray(y), corr=corr, trend=trend,
            n_start=n_start, kpls_dim=kpls_dim, mask=jnp.asarray(mask),
            seed=seed, max_iters=20,
        )
        return predict_valvar(model, jnp.asarray(x_test))

    return fp
