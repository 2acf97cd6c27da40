"""Distributed Cholesky / solves / likelihood on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egobox_tpu.parallel import (
    cholesky_rowsharded,
    make_mesh,
    reduced_likelihood_distributed,
    solve_lower_rowsharded,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, axis="rows")


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n))
    return jnp.asarray(a @ a.T + n * np.eye(n))


def test_cholesky_rowsharded_matches_dense(mesh):
    r = _spd(256)
    l_ref = jnp.linalg.cholesky(r)
    l_sh = cholesky_rowsharded(mesh, r)
    np.testing.assert_allclose(
        np.asarray(l_sh), np.asarray(l_ref), rtol=1e-9, atol=1e-9
    )


def test_solve_lower_rowsharded_matches_dense(mesh):
    from jax.scipy.linalg import solve_triangular

    r = _spd(128, seed=1)
    l = jnp.linalg.cholesky(r)
    rhs = jnp.asarray(
        np.random.default_rng(2).standard_normal((128, 5))
    )
    x_ref = solve_triangular(l, rhs, lower=True)
    x_sh = solve_lower_rowsharded(mesh, l, rhs)
    np.testing.assert_allclose(
        np.asarray(x_sh), np.asarray(x_ref), rtol=1e-9, atol=1e-9
    )


def test_distributed_likelihood_matches_single_device(mesh):
    from egobox_tpu.gp.likelihood import reduced_likelihood

    n, d = 256, 3
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(size=(n, d)))
    y = jnp.sin(3.0 * x[:, 0]) + x[:, 1] ** 2 + 0.1 * x[:, 2]
    theta = jnp.asarray([0.5, 0.8, 1.2])

    rlf_dist = reduced_likelihood_distributed(mesh, x, y, theta)

    # single-device oracle on the same normalized data
    xs = (x - x.mean(0)) / x.std(0, ddof=1)
    yy = y[:, None]
    ys = (yy - yy.mean(0)) / yy.std(0, ddof=1)
    rlf_ref, _ = reduced_likelihood(
        "squared_exponential", "constant", xs, ys,
        yy.std(0, ddof=1), theta, None,
        100.0 * float(jnp.finfo(x.dtype).eps),
    )
    assert np.isfinite(float(rlf_dist))
    np.testing.assert_allclose(
        float(rlf_dist), float(rlf_ref), rtol=1e-8
    )
