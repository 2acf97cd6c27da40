"""egobox_tpu — TPU-native Bayesian optimization & Gaussian-process toolbox.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
`egobox <https://github.com/relf/egobox>`_ (reference @ /root/reference):

- ``doe``   — DoE sampling (LHS incl. ESE-optimized, FullFactorial, Random)
- ``gp``    — GP regression (Kriging), KPLS, sparse GP (FITC/VFE), metrics
- ``moe``   — mixture of GP experts (GMM clustering, hard/smooth recombination)
- ``ego``   — Egor Bayesian optimizer (infill criteria, constraints, TREGO,
              CoEGO, mixed-integer, qEI, checkpointing)

All numerics are functional JAX: multistart/expert/constraint fan-out runs
as vmapped batches on-chip, scaling to multiple TPU chips via
``jax.sharding`` (see ``egobox_tpu.parallel``).
"""

from . import config as _config  # noqa: F401  (enables x64 on import)

__version__ = "0.1.0"

from .types import (  # noqa: E402
    ConstraintStrategy,
    CorrelationSpec,
    ExpectedOptimum,
    GpFileFormat,
    HotStartMode,
    InfillOptimizer,
    InfillStrategy,
    OptimResult,
    QInfillStrategy,
    Recombination,
    RegressionSpec,
    RunInfo,
    Sampling,
    SparseMethod,
    XSpec,
    XType,
)

from . import doe  # noqa: E402
from .api import (  # noqa: E402
    GpMix,
    Gpx,
    SparseGpMix,
    SparseGpx,
    lhs,
    sampling,
)
from .ego import Egor, EgorBatch, GpConfig  # noqa: E402
from . import gp, moe, ego, parallel  # noqa: E402

__all__ = [
    "Egor",
    "EgorBatch",
    "GpConfig",
    "GpMix",
    "Gpx",
    "SparseGpMix",
    "SparseGpx",
    "ego",
    "gp",
    "lhs",
    "moe",
    "parallel",
    "sampling",
    "ConstraintStrategy",
    "CorrelationSpec",
    "ExpectedOptimum",
    "GpFileFormat",
    "HotStartMode",
    "InfillOptimizer",
    "InfillStrategy",
    "OptimResult",
    "QInfillStrategy",
    "Recombination",
    "RegressionSpec",
    "RunInfo",
    "Sampling",
    "SparseMethod",
    "XSpec",
    "XType",
    "doe",
]
