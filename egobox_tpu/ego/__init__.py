"""Egor: efficient global (Bayesian) optimization.

TPU-native rebuild of the egobox `ego` crate (crates/ego in /root/reference).
"""

from .batch import EgorBatch
from .config import EgorConfig, GpConfig, TregoConfig
from .criteria import ei, log_ei, log_ei_helper, log_pof, pof, wb2, wb2s_scale
from .egor import Egor
from .find_result import (
    find_best_result_index,
    find_best_result_index_from,
    is_feasible,
)
from .infill_optim import compute_scaling, optimize_infill, virtual_point
from .mixint import MixintContext, parse_xspecs
from .solver import EgorSolver, NoMorePointToAddError
from .state import EgorState
from .surrogates import GpSpec, train_gp_surrogates

__all__ = [
    "Egor",
    "EgorBatch",
    "EgorConfig",
    "EgorSolver",
    "EgorState",
    "GpConfig",
    "GpSpec",
    "MixintContext",
    "NoMorePointToAddError",
    "TregoConfig",
    "compute_scaling",
    "ei",
    "find_best_result_index",
    "find_best_result_index_from",
    "is_feasible",
    "log_ei",
    "log_ei_helper",
    "log_pof",
    "optimize_infill",
    "parse_xspecs",
    "pof",
    "train_gp_surrogates",
    "virtual_point",
    "wb2",
    "wb2s_scale",
]
