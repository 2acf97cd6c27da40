"""Pallas blocked Cholesky (ops/pallas_chol.py) — interpret-mode parity.

On CPU the kernel runs through the Pallas interpreter; the TPU path is
exercised by the EGOBOX_CHOL dispatch + tools/prof_chol2.py. Parity target
is XLA's native Cholesky at f32."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egobox_tpu.ops.pallas_chol import factor_panel, pallas_cholesky


def _spd(key, n, dtype=jnp.float32):
    a = jax.random.normal(key, (n, n), dtype) / np.sqrt(n)
    return a @ a.T + 2.0 * jnp.eye(n, dtype=dtype)


def test_factor_panel_matches_native():
    n, b = 1024, 256
    r = _spd(jax.random.key(0), n).astype(jnp.float32)
    panel = r[:, :b]
    out = factor_panel(panel, 1024, True)
    l_ref = np.linalg.cholesky(np.asarray(r, np.float64))
    # diagonal block
    np.testing.assert_allclose(
        np.asarray(out[:b]), np.tril(l_ref[:b, :b]), rtol=0, atol=5e-5
    )
    # sub-diagonal rows: B L00^-T
    np.testing.assert_allclose(
        np.asarray(out[b:]), l_ref[b:, :b], rtol=0, atol=5e-5
    )


@pytest.mark.parametrize("n", [512, 1280])
def test_pallas_cholesky_matches_native(n):
    # n=512 takes the native fallback (n <= block); n=1280 runs 5 panels
    # including a non-multiple-of-RB row padding
    r = _spd(jax.random.key(n), n).astype(jnp.float32)
    l = pallas_cholesky(r, block=256, interpret=True)
    l_ref = np.linalg.cholesky(np.asarray(r, np.float64))
    np.testing.assert_allclose(
        np.asarray(l), np.tril(l_ref), rtol=0, atol=2e-4
    )


def test_likelihood_pallas_dispatch(monkeypatch):
    """EGOBOX_CHOL=pallas:<b>:<prec> routes the likelihood factorization
    through the Pallas kernel (interpreter off-TPU) without changing the
    value."""
    from egobox_tpu.gp import likelihood as lk

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(size=(160, 3)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((160, 1)), jnp.float32)
    theta = jnp.asarray([0.4, 0.2, 0.8], jnp.float32)

    def rlf(theta):
        # bench-grade nugget: at 1e-6 the f32 Gram is ill-conditioned
        # enough that native-vs-pallas rounding noise dominates the check
        v, _ = lk.reduced_likelihood(
            "squared_exponential", "constant", x, y, jnp.ones(()), theta,
            None, 1e-3,
        )
        return v

    ref = rlf(theta)
    monkeypatch.setattr(lk, "_CHOL_NATIVE_MAX", 64)
    monkeypatch.setenv("EGOBOX_CHOL", "pallas:128:high")
    got = rlf(theta)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-3)


def test_pallas_cholesky_vmapped():
    # the 3-lane TR polish vmaps the likelihood forward over theta lanes
    rs = jnp.stack([_spd(jax.random.key(7 + i), 640) for i in range(3)])
    f = jax.vmap(lambda r: pallas_cholesky(r, block=256, interpret=True))
    ls = f(rs)
    for i in range(3):
        l_ref = np.linalg.cholesky(np.asarray(rs[i], np.float64))
        np.testing.assert_allclose(
            np.asarray(ls[i]), np.tril(l_ref), rtol=0, atol=2e-4
        )
