"""Blocked/recursive triangular linear algebra (ops/block_linalg.py):
the MXU-shaped building blocks for the GP likelihood gradient and the
future distributed factorization."""

import jax.numpy as jnp
import numpy as np

from egobox_tpu.ops.block_linalg import blocked_cholesky, tri_inverse_lower


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n))
    return a @ a.T + n * np.eye(n)


def test_blocked_cholesky_matches_native():
    for n, b in [(300, 128), (1000, 256), (1024, 1024)]:
        r = _spd(n, seed=n)
        l_ref = np.linalg.cholesky(r)
        l = np.asarray(blocked_cholesky(jnp.asarray(r), block=b))
        np.testing.assert_allclose(np.tril(l), l_ref, rtol=1e-10,
                                   atol=1e-10 * n)


def test_tri_inverse_lower_exact():
    for n in (100, 700, 1500):
        r = _spd(n, seed=n)
        l = np.linalg.cholesky(r)
        li = np.asarray(tri_inverse_lower(jnp.asarray(l), block=256))
        resid = np.max(np.abs(l @ li - np.eye(n)))
        assert resid < 1e-10 * n, f"n={n}: residual {resid}"
