"""Multi-chip scaling via jax.sharding (SURVEY.md §2.6 TPU replacements)."""

from .sharding import (
    fit_gp_multichip,
    make_mesh,
    multistart_neg_rlf_minimize,
    replicated,
    shard_starts,
)

__all__ = [
    "fit_gp_multichip",
    "make_mesh",
    "multistart_neg_rlf_minimize",
    "replicated",
    "shard_starts",
]
