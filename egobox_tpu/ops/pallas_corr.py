"""Pallas TPU kernel for cross-correlation (Gram) matrix construction.

The L1-family kernels (absexp, Matern 3/2, Matern 5/2) cannot use the
matmul expansion the squared-exponential enjoys, so the plain XLA path
streams a (block, n2, d) broadcast tensor through HBM per row block. This
kernel fuses the whole computation — |x1 - x2| per dim, the log-space
kernel terms, the sum over dims, and the final exp — into one VMEM-resident
pass per (TM, TN) output tile: each input row is read once per tile row,
the (TM, TN, d) intermediate never exists.

This is the BASELINE.json headline component ("batched Pallas kernels for
cross-distance/correlation matrix construction"). Identity-weight
(non-KPLS) path; KPLS inputs are pre-projected by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT3 = 1.7320508075688772
_SQRT5 = 2.23606797749979

# output tile: aligned to the VPU lane layout
_TM = 256
_TN = 256


def _tile_kernel(name: str, x1_ref, x2_ref, thw_ref, out_ref):
    """One (TM, TN) output tile. x1_ref (TM, d), x2_ref (TN, d) live in
    VMEM; loop over the (small) feature dim accumulating log r."""
    d = x1_ref.shape[1]
    tm, tn = out_ref.shape
    acc = jnp.zeros((tm, tn), jnp.float32)
    for j in range(d):  # d is static and small (<= ~64)
        a = x1_ref[:, j][:, None]  # (TM, 1)
        b = x2_ref[:, j][None, :]  # (1, TN)
        u = jnp.abs(a - b) * thw_ref[0, j]
        if name == "absolute_exponential":
            acc = acc - u
        elif name == "matern32":
            v = _SQRT3 * u
            acc = acc + jnp.log1p(v) - v
        elif name == "matern52":
            v = _SQRT5 * u
            acc = acc + jnp.log1p(v + (5.0 / 3.0) * u * u) - v
        else:  # squared_exponential (rarely routed here; matmul path wins)
            acc = acc - 0.5 * u * u
    out_ref[:, :] = jnp.exp(acc)


@functools.partial(jax.jit, static_argnums=(0,))
def corr_cross_pallas(name: str, x1, x2, theta_w):
    """r(x1, x2) of shape (n1, n2); ``theta_w`` is the per-dim length-scale
    vector (theta for identity weights). float32 in/out (TPU-native)."""
    n1, d = x1.shape
    n2 = x2.shape[0]
    f32 = jnp.float32
    x1 = x1.astype(f32)
    x2 = x2.astype(f32)
    thw = theta_w.astype(f32)[None, :]  # (1, d) — 2D for TPU layout

    pad1 = (-n1) % _TM
    pad2 = (-n2) % _TN
    x1p = jnp.pad(x1, ((0, pad1), (0, 0)))
    x2p = jnp.pad(x2, ((0, pad2), (0, 0)))
    m1, m2 = n1 + pad1, n2 + pad2

    out = pl.pallas_call(
        functools.partial(_tile_kernel, name),
        out_shape=jax.ShapeDtypeStruct((m1, m2), f32),
        grid=(m1 // _TM, m2 // _TN),
        in_specs=[
            pl.BlockSpec((_TM, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TM, _TN), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )(x1p, x2p, thw)
    return out[:n1, :n2]
