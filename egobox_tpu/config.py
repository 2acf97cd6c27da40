"""Global numeric configuration for egobox_tpu.

The reference library (egobox) computes everything in f64 on CPU. On TPU the
MXU/VPU are f32/bf16 hardware, so we make the working dtype configurable:

- x64 is enabled at import so CPU runs (tests, parity checks) default to
  float64 like the reference.
- On TPU the high-level APIs default to float32 (native hardware dtype);
  pass ``dtype=`` explicitly to override.

Set env ``EGOBOX_TPU_NO_X64=1`` to skip enabling x64 (e.g. for pure-TPU
deployments where f64 emulation must never be touched).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

if not os.environ.get("EGOBOX_TPU_NO_X64"):
    jax.config.update("jax_enable_x64", True)

# f32 matmuls on TPU default to single-pass bf16 on the MXU — catastrophic
# for GP numerics (the Gram matmul trick, GLS products, R^-1 assembly lose
# ~5 decimal digits and constrained EGO visibly degrades; measured: G24
# lands at -3.9 instead of -5.5). "high" = bf16_3x passes, ~f32-accurate
# at a fraction of the "highest" cost — the right default for GP-grade
# linear algebra on the MXU.
jax.config.update("jax_default_matmul_precision", "high")

# Persistent compilation cache: the EGO loop re-uses a handful of jitted
# programs per shape bucket; caching them across processes removes the
# dominant cold-start cost on TPU. TPU-only: CPU AOT artifacts are
# machine-feature-specific and loading them across processes on this host
# SIGILLs (observed), so the cache must never apply to the CPU backend.
if not os.environ.get("EGOBOX_TPU_NO_COMPILATION_CACHE"):
    try:
        _backend = jax.default_backend()
    except Exception:  # pragma: no cover
        _backend = "cpu"
    if _backend in ("tpu", "axon"):
        _cache_dir = os.environ.get(
            "EGOBOX_TPU_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "egobox_tpu_xla"),
        )
        try:
            os.makedirs(_cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", _cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )
        except Exception:  # pragma: no cover - cache is best-effort
            pass


# Logging: EGOBOX_LOG env controls the package log level, mirroring the
# reference's env_logger initialization from EGOBOX_LOG
# (ref: ego/src/solver/solver_impl.rs:38-42, python/src/lib.rs:26-30).
import logging as _logging

logger = _logging.getLogger("egobox_tpu")
_level = os.environ.get("EGOBOX_LOG")
if _level:
    _handler = _logging.StreamHandler()
    _handler.setFormatter(
        _logging.Formatter("[%(levelname)s %(name)s] %(message)s")
    )
    logger.addHandler(_handler)
    logger.setLevel(getattr(_logging, _level.upper(), _logging.INFO))


def default_dtype():
    """float64 when x64 is live (CPU parity mode), else float32 (TPU)."""
    if jax.config.jax_enable_x64:
        try:
            platform = jax.default_backend()
        except Exception:  # pragma: no cover
            platform = "cpu"
        if platform not in ("tpu", "axon"):
            return jnp.float64
    return jnp.float32


def asdtype(x, dtype=None):
    dtype = dtype or default_dtype()
    return jnp.asarray(x, dtype=dtype)
