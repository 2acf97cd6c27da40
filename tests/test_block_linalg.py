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


def test_likelihood_chol_dispatch_matches_native(monkeypatch):
    """EGOBOX_CHOL routes large factorizations through blocked_cholesky
    without changing the likelihood value — exercised at small n by
    lowering the native-path threshold, including under vmap (the
    multistart fan-out batches the whole likelihood)."""
    import jax

    from egobox_tpu.gp import likelihood as lk

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(size=(300, 3)))
    y = jnp.asarray(rng.standard_normal((300, 1)))
    y_std = jnp.ones(())
    thetas = jnp.asarray([[0.3, 0.1, 0.5], [1.0, 0.7, 0.2]])

    def rlf_all(theta):
        v, inner = lk.reduced_likelihood(
            "squared_exponential", "constant", x, y, y_std, theta, None,
            1e-6,
        )
        return v, inner.r_chol

    ref_v, ref_l = jax.vmap(rlf_all)(thetas)

    monkeypatch.setattr(lk, "_CHOL_NATIVE_MAX", 64)
    for spec in ("blk:solve:128:highest", "blk:inverse:128:high"):
        monkeypatch.setenv("EGOBOX_CHOL", spec)
        v, l = jax.vmap(rlf_all)(thetas)
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(ref_v), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.tril(np.asarray(l)), np.tril(np.asarray(ref_l)),
            rtol=1e-4, atol=1e-6,
        )


def test_tri_inverse_lower_exact():
    for n in (100, 700, 1500):
        r = _spd(n, seed=n)
        l = np.linalg.cholesky(r)
        li = np.asarray(tri_inverse_lower(jnp.asarray(l), block=256))
        resid = np.max(np.abs(l @ li - np.eye(n)))
        assert resid < 1e-10 * n, f"n={n}: residual {resid}"
