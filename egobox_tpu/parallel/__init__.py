"""Multi-chip scaling via jax.sharding (SURVEY.md §2.6 TPU replacements)."""

from .dist_chol import (
    cholesky_rowsharded,
    reduced_likelihood_distributed,
    solve_lower_rowsharded,
)
from .sharding import (
    corr_cross_multichip,
    fit_gp_multichip,
    make_mesh,
    multistart_neg_rlf_minimize,
    reduced_likelihood_rowsharded,
    replicated,
    shard_rows,
    shard_starts,
)

__all__ = [
    "cholesky_rowsharded",
    "corr_cross_multichip",
    "fit_gp_multichip",
    "shard_rows",
    "make_mesh",
    "multistart_neg_rlf_minimize",
    "reduced_likelihood_distributed",
    "reduced_likelihood_rowsharded",
    "replicated",
    "shard_starts",
    "solve_lower_rowsharded",
]
