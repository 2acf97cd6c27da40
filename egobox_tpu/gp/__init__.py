"""Gaussian-process regression (Kriging), KPLS, sparse GP, metrics.

TPU-native rebuild of the egobox `gp` crate (crates/gp in /root/reference).
"""

from .fit import GpFitError, fit_gp, fit_gp_core
from .gp import (
    GpModel,
    predict_kth_derivatives,
    posterior_cov,
    predict,
    predict_gradients,
    predict_valvar,
    predict_valvar_gradients,
    predict_var,
    predict_var_gradients,
    sample,
)
from .kernels import (
    KERNEL_NAMES,
    THETA_INFLUENCE_FACTORS,
    corr_cross,
    corr_value,
    theta_bounds_heuristic,
)
from .kpls import pls_rotations
from .likelihood import (
    GpInnerParams,
    make_neg_reduced_likelihood,
    reduced_likelihood,
)
from .sgp import (
    SgpModel,
    fit_sgp,
    fitc_likelihood,
    sgp_predict,
    sgp_predict_gradients,
    sgp_predict_valvar,
    sgp_predict_var,
    sgp_predict_var_gradients,
    vfe_likelihood,
)
from .trends import TREND_NAMES, n_basis, trend_basis, trend_jacobian


def kriging(x, y, **kwargs):
    """Kriging convenience fit: constant trend + squared-exponential kernel
    (ref alias: gp/src/algorithm.rs:200-207 ``Kriging<F>``)."""
    kwargs.setdefault("corr", "squared_exponential")
    kwargs.setdefault("trend", "constant")
    return fit_gp(x, y, **kwargs)


def sparse_kriging(x, y, **kwargs):
    """SparseKriging convenience fit: squared-exponential sparse GP
    (ref alias: gp/src/sparse_algorithm.rs:172-179)."""
    kwargs.setdefault("corr", "squared_exponential")
    return fit_sgp(x, y, **kwargs)

__all__ = [
    "GpFitError",
    "GpInnerParams",
    "SgpModel",
    "fit_sgp",
    "fitc_likelihood",
    "make_neg_reduced_likelihood",
    "sgp_predict",
    "sgp_predict_gradients",
    "sgp_predict_valvar",
    "sgp_predict_var",
    "sgp_predict_var_gradients",
    "vfe_likelihood",
    "GpModel",
    "KERNEL_NAMES",
    "THETA_INFLUENCE_FACTORS",
    "TREND_NAMES",
    "corr_cross",
    "corr_value",
    "fit_gp",
    "kriging",
    "sparse_kriging",
    "fit_gp_core",
    "n_basis",
    "pls_rotations",
    "posterior_cov",
    "predict",
    "predict_gradients",
    "predict_kth_derivatives",
    "predict_valvar",
    "predict_valvar_gradients",
    "predict_var",
    "predict_var_gradients",
    "reduced_likelihood",
    "sample",
    "theta_bounds_heuristic",
    "trend_basis",
    "trend_jacobian",
]
