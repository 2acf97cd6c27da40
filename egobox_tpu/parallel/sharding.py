"""Multi-chip execution: shard the embarrassingly-parallel axes of the EGO
workload over a jax.sharding.Mesh.

The reference is a single-process rayon library (SURVEY.md §2.6); its three
fan-outs map onto a device mesh as pure batch parallelism riding ICI:

- multistart theta optimization  -> restarts sharded over the mesh
  (gp/src/algorithm.rs:928-945 rayon par_iter)
- objective+constraint surrogate training -> output axis sharded
  (ego/src/solver/solver_impl.rs:636-657)
- infill multistart optimization -> starts sharded
  (ego/src/solver/solver_infill_optim.rs:219-232)

XLA inserts the (tiny) argmin/all-gather collectives automatically from the
input shardings; no hand-written communication is needed at these sizes.
For n >= 10k training points the Gram-matrix row-block axis can additionally
be sharded (``shard_rows``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..gp.fit import fit_gp_core
from ..gp.likelihood import reduced_likelihood
from ..optim.lbfgsb import minimize_lbfgsb


def make_mesh(n_devices: Optional[int] = None, axis: str = "starts") -> Mesh:
    """Build a 1-D mesh over the first ``n_devices`` devices. If the platform
    has fewer devices than asked, degrade to all available ones with a
    warning (to actually provision virtual host devices, reconfigure
    ``jax_platforms=cpu`` + ``jax_num_cpu_devices`` before any jax op — see
    ``__graft_entry__._ensure_n_devices``)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        import warnings

        warnings.warn(
            f"make_mesh: asked for {n} devices, have {len(devs)} on "
            f"platform '{devs[0].platform}' — degrading to a "
            f"{len(devs)}-device mesh",
            stacklevel=2,
        )
        n = len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_starts(mesh: Mesh, arr: jnp.ndarray) -> jnp.ndarray:
    """Place a (k, ...) batch with its leading axis split over the mesh."""
    return jax.device_put(arr, NamedSharding(mesh, P(mesh.axis_names[0])))


def replicated(mesh: Mesh, arr) -> jnp.ndarray:
    return jax.device_put(arr, NamedSharding(mesh, P()))


def shard_rows(mesh: Mesh, arr: jnp.ndarray) -> jnp.ndarray:
    """Alias of shard_starts for data-axis sharding (row blocks of a
    training set / Gram matrix)."""
    return shard_starts(mesh, arr)


def corr_cross_multichip(mesh: Mesh, name: str, x1, x2, theta,
                         weights=None):
    """Cross-correlation Gram with the x1 rows sharded over the mesh: each
    device builds its row block against the replicated x2 — the n^2 d work
    of the reference's rayon pdist/cdist (doe/src/utils.rs) spread over
    chips. The output keeps the row sharding."""
    from ..gp.kernels import corr_cross

    n1 = x1.shape[0]
    n_dev = mesh.devices.size
    if n1 % n_dev != 0:
        raise ValueError(
            f"n1={n1} must be divisible by the {n_dev}-device mesh"
        )
    x1 = shard_rows(mesh, x1)
    x2 = replicated(mesh, x2)
    theta = replicated(mesh, theta)
    return corr_cross(name, x1, x2, theta, weights)


@partial(jax.jit, static_argnames=("corr", "trend"))
def _rlf_value(x_norm, y_norm, y_std, theta, nugget, mask, *, corr, trend):
    rlf, _ = reduced_likelihood(
        corr, trend, x_norm, y_norm, y_std, theta, None, nugget, mask
    )
    return rlf


def reduced_likelihood_rowsharded(
    mesh: Mesh,
    x: jnp.ndarray,  # (n, nx)
    y: jnp.ndarray,  # (n,) or (n, 1)
    theta: jnp.ndarray,
    *,
    corr: str = "squared_exponential",
    trend: str = "constant",
    nugget: Optional[float] = None,
):
    """Exact reduced likelihood with the training rows sharded over the
    mesh: the O(n^2 d) Gram assembly and the quadratic forms distribute
    across devices (XLA GSPMD partitions the kernel matmuls along the
    sharded row axis); the Cholesky factorization itself is gathered by
    the compiler (n^3/3 on one device). This removes the Gram-build
    bottleneck for n >= 50k; a block-cyclic distributed factorization is
    the remaining scale axis (ROADMAP).

    n is padded up to a multiple of the mesh size with masked rows — the
    masked likelihood is exact (gp/likelihood.py), so padding does not
    change the value. Replaces the reference's rayon pdist fan-out
    (doe/src/utils.rs) + sequential per-process likelihood
    (gp/src/algorithm.rs:988-1056).
    """
    x = jnp.atleast_2d(x)
    dtype = x.dtype
    y = jnp.asarray(y, dtype=dtype)
    if y.ndim == 1:
        y = y[:, None]
    n = x.shape[0]
    n_dev = mesh.devices.size
    n_pad = -(-n // n_dev) * n_dev
    mask = jnp.arange(n_pad) < n
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
        y = jnp.pad(y, ((0, n_pad - n), (0, 0)))

    if nugget is None:
        nugget = 100.0 * float(jnp.finfo(dtype).eps)

    m = mask.astype(dtype)
    n_obs = jnp.sum(m)
    x_mean = jnp.sum(x * m[:, None], axis=0) / n_obs
    x_var = jnp.sum((x - x_mean) ** 2 * m[:, None], axis=0) / jnp.maximum(
        n_obs - 1, 1
    )
    x_std = jnp.where(x_var <= 0, 1.0, jnp.sqrt(x_var))
    y_mean = jnp.sum(y * m[:, None], axis=0) / n_obs
    y_var = jnp.sum((y - y_mean) ** 2 * m[:, None], axis=0) / jnp.maximum(
        n_obs - 1, 1
    )
    y_std = jnp.where(y_var <= 0, 1.0, jnp.sqrt(y_var))
    x_norm = (x - x_mean) / x_std * m[:, None]
    y_norm = (y - y_mean) / y_std * m[:, None]

    x_norm = shard_rows(mesh, x_norm)
    y_norm = shard_rows(mesh, y_norm)
    mask = shard_rows(mesh, mask)
    theta = replicated(mesh, theta)
    return _rlf_value(
        x_norm, y_norm, y_std, theta, nugget, mask, corr=corr, trend=trend
    )


@partial(
    jax.jit,
    static_argnames=("corr", "trend", "max_iters"),
)
def multistart_neg_rlf_minimize(
    x_norm, y_norm, y_std, inits, lo, up, mask,
    *, corr: str, trend: str, max_iters: int = 50, nugget: float = 1e-10,
):
    """Minimize the negative reduced likelihood from ``inits`` (k, dim) in
    log10-theta space. When ``inits`` carries a sharded leading axis the
    restarts execute data-parallel across the mesh; the final argmin is the
    only cross-device reduction."""

    def neg_rlf(t):
        rlf, _ = reduced_likelihood(
            corr, trend, x_norm, y_norm, y_std, 10.0**t, None, nugget, mask
        )
        return -rlf

    res = jax.vmap(
        lambda t: minimize_lbfgsb(neg_rlf, t, lo, up, max_iters=max_iters)
    )(inits)
    best = jnp.argmin(res.fun)
    return res.x[best], res.fun[best]


def fit_gp_multichip(
    mesh: Mesh,
    x: jnp.ndarray,
    y: jnp.ndarray,
    inits: jnp.ndarray,  # (k, dim) log10-theta starts, k % n_devices == 0
    theta_bounds=(1e-2, 1e1),
    *,
    corr: str = "squared_exponential",
    trend: str = "constant",
    max_iters: int = 30,
    mask: Optional[jnp.ndarray] = None,
    nugget: Optional[float] = None,
):
    """GP MLE with the multistart axis sharded over the mesh. Returns the
    fitted GpModel (replicated)."""
    n = x.shape[0]
    dtype = x.dtype
    if mask is None:
        mask = jnp.ones((n,), dtype=bool)
    m = mask.astype(dtype)
    n_obs = jnp.sum(m)
    x_mean = jnp.sum(x * m[:, None], axis=0) / n_obs
    x_var = jnp.sum((x - x_mean) ** 2 * m[:, None], axis=0) / jnp.maximum(
        n_obs - 1, 1
    )
    x_std = jnp.where(x_var <= 0, 1.0, jnp.sqrt(x_var))
    if y.ndim == 1:
        y = y[:, None]
    y_mean = jnp.sum(y * m[:, None], axis=0) / n_obs
    y_var = jnp.sum((y - y_mean) ** 2 * m[:, None], axis=0) / jnp.maximum(
        n_obs - 1, 1
    )
    y_std = jnp.where(y_var <= 0, 1.0, jnp.sqrt(y_var))
    x_norm = (x - x_mean) / x_std * m[:, None]
    y_norm = (y - y_mean) / y_std * m[:, None]

    lo = jnp.full(inits.shape[1], jnp.log10(theta_bounds[0]), dtype)
    up = jnp.full(inits.shape[1], jnp.log10(theta_bounds[1]), dtype)

    inits = shard_starts(mesh, inits)
    x_norm = replicated(mesh, x_norm)
    y_norm = replicated(mesh, y_norm)

    if nugget is None:
        nugget = 100.0 * float(jnp.finfo(dtype).eps)
    t_best, _ = multistart_neg_rlf_minimize(
        x_norm, y_norm, y_std, inits, lo, up, mask,
        corr=corr, trend=trend, max_iters=max_iters, nugget=nugget,
    )
    theta = 10.0**t_best
    # final fixed-theta fit assembles the model
    return fit_gp_core(
        x, y, mask, theta, 10.0**lo, 10.0**up,
        jnp.ones_like(theta, dtype=bool), jax.random.key(0),
        corr=corr, trend=trend, fixed=True, nugget=nugget,
    )
