"""Kernel/trend tests with SMT-derived reference constants
(ref: crates/gp/src/correlation_models.rs:597-641) and
analytic-vs-finite-difference gradient checks (SURVEY.md §4 idiom 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egobox_tpu.gp import corr_cross, corr_value, trend_basis, trend_jacobian


def _pairs(xt):
    """(i<j) ordered pair differences like the reference DiffMatrix."""
    n = xt.shape[0]
    out = []
    for i in range(n):
        for j in range(i + 1, n):
            out.append(xt[i] - xt[j])
    return jnp.stack(out)


def test_squared_exponential_smt_constants():
    xt = jnp.array([[4.5], [1.2], [2.0], [3.0], [4.0]])
    d = _pairs(xt)
    r = corr_value("squared_exponential", d, jnp.array([np.sqrt(0.2)]),
                   jnp.array([[1.0]]))
    expected = [
        0.336552878364737, 0.5352614285189903, 0.7985162187593771,
        0.9753099120283326, 0.9380049995307295, 0.7232502423798424,
        0.4565760496233148, 0.9048374180359595, 0.6703200460356393,
        0.9048374180359595,
    ]
    np.testing.assert_allclose(np.asarray(r), expected, atol=1e-6)


def test_squared_exponential_2d_smt_constants():
    xt = jnp.array([[0.0, 1.0], [2.0, 3.0], [4.0, 5.0]])
    d = _pairs(xt)
    r = corr_value("squared_exponential", d,
                   jnp.array([np.sqrt(2.0), 2.0]), jnp.eye(2))
    expected = [6.14421235e-06, 1.42516408e-21, 6.14421235e-06]
    np.testing.assert_allclose(np.asarray(r), expected, atol=1e-6)


def test_matern32_2d_smt_constants():
    xt = jnp.array([[0.0, 1.0], [2.0, 3.0], [4.0, 5.0]])
    d = _pairs(xt)
    r = corr_value("matern32", d, jnp.array([1.0, 2.0]), jnp.eye(2))
    expected = [1.08539595e-03, 1.10776401e-07, 1.08539595e-03]
    np.testing.assert_allclose(np.asarray(r), expected, atol=1e-6)


def test_identity_weights_equivalence():
    """weights=None (no KPLS) must equal explicit identity weights."""
    key = jax.random.key(0)
    d = jax.random.normal(key, (7, 3))
    theta = jnp.array([0.5, 1.5, 0.3])
    for name in ("squared_exponential", "absolute_exponential", "matern32",
                 "matern52"):
        a = corr_value(name, d, theta, None)
        b = corr_value(name, d, theta, jnp.eye(3))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_matern52_analytic():
    """Independent closed-form check of the Matern 5/2 product formula."""
    d = jnp.array([[0.7, -1.3]])
    theta = np.array([0.8, 1.1])
    r = corr_value("matern52", d, jnp.asarray(theta), None)
    expected = 1.0
    for j, dj in enumerate([0.7, 1.3]):
        u = theta[j] * dj
        expected *= (1 + np.sqrt(5) * u + 5.0 / 3.0 * u**2) * np.exp(
            -np.sqrt(5) * u
        )
    np.testing.assert_allclose(float(r[0]), expected, rtol=1e-12)


@pytest.mark.parametrize(
    "name",
    ["squared_exponential", "absolute_exponential", "matern32", "matern52"],
)
@pytest.mark.parametrize("kpls", [False, True])
def test_kernel_gradients_vs_fdiff(name, kpls):
    """jax.grad of the kernel vs central finite differences
    (ref idiom: correlation_models.rs test_correlation! macro)."""
    xt = jnp.array([[-9.375, -5.625], [1.25, 3.125], [4.0, -1.0]])
    x = jnp.array([3.0, 5.0])
    theta = jnp.array([0.2, 0.7]) if not kpls else jnp.array([0.4])
    w = None if not kpls else jnp.array([[0.6], [0.8]])

    def f(xx):
        return jnp.sum(corr_value(name, xx[None, :] - xt, theta, w))

    g = jax.grad(f)(x)
    eps = 1e-6
    for k in range(2):
        e = jnp.zeros(2).at[k].set(eps)
        fd = (f(x + e) - f(x - e)) / (2 * eps)
        np.testing.assert_allclose(float(g[k]), float(fd), rtol=1e-5,
                                   atol=1e-8)


def test_corr_cross_matches_value():
    key = jax.random.key(1)
    x1 = jax.random.normal(key, (5, 3))
    x2 = jax.random.normal(jax.random.key(2), (4, 3))
    theta = jnp.array([0.5, 1.0, 2.0])
    for name in ("squared_exponential", "matern52"):
        g = corr_cross(name, x1, x2, theta, None)
        d = x1[:, None, :] - x2[None, :, :]
        v = corr_value(name, d, theta, None)
        np.testing.assert_allclose(np.asarray(g), np.asarray(v), rtol=1e-10)


def test_trend_bases():
    x = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    c = trend_basis("constant", x)
    np.testing.assert_allclose(np.asarray(c), [[1.0], [1.0]])
    lin = trend_basis("linear", x)
    np.testing.assert_allclose(np.asarray(lin), [[1, 1, 2], [1, 3, 4]])
    q = trend_basis("quadratic", x)
    # [1, x1, x2, x1^2, x1*x2, x2^2]
    np.testing.assert_allclose(
        np.asarray(q), [[1, 1, 2, 1, 2, 4], [1, 3, 4, 9, 12, 16]]
    )


def test_trend_jacobian_vs_fdiff():
    x1 = jnp.array([0.7, -1.2])
    for name in ("constant", "linear", "quadratic"):
        jac = trend_jacobian(name, x1)
        eps = 1e-6
        for k in range(2):
            e = jnp.zeros(2).at[k].set(eps)
            fd = (trend_basis(name, (x1 + e)[None, :])[0]
                  - trend_basis(name, (x1 - e)[None, :])[0]) / (2 * eps)
            np.testing.assert_allclose(np.asarray(jac[:, k]), np.asarray(fd),
                                       atol=1e-6)
