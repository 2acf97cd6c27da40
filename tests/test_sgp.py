"""Sparse GP (FITC/VFE) tests (ref: crates/gp/src/sparse_algorithm.rs tests
+ python test_sgpmix.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egobox_tpu.gp import (
    fit_sgp,
    sgp_predict,
    sgp_predict_gradients,
    sgp_predict_valvar,
    sgp_predict_var,
)


def _noisy_sine(n=200, noise_std=0.1, seed=42):
    rng = np.random.RandomState(seed)
    x = np.sort(rng.uniform(0, 4 * np.pi, (n, 1)), axis=0)
    f = np.sin(x[:, 0])
    y = f + rng.normal(0, noise_std, n)
    return x, y, f


@pytest.mark.parametrize("method", ["FITC", "VFE"])
def test_sgp_noise_estimation(method):
    """Noise var = 0.01 ± 0.015 with 30 inducing points on n=200 noisy sine
    (ref: sparse_algorithm.rs:1004-1057); Q2 = 1 ± 2e-2."""
    x, y, f = _noisy_sine()
    m = fit_sgp(jnp.asarray(x), jnp.asarray(y), method=method,
                n_inducing=30, seed=0)
    assert abs(float(m.noise) - 0.01) < 0.015
    pred = np.asarray(sgp_predict(m, jnp.asarray(x)))
    q2 = 1 - np.sum((pred - f) ** 2) / np.sum((f - f.mean()) ** 2)
    assert abs(q2 - 1.0) < 2e-2


def test_sgp_located_inducings():
    """Located (user-given) inducing points (ref: Inducings::Located)."""
    x, y, f = _noisy_sine(150)
    z = np.linspace(0, 4 * np.pi, 25)[:, None]
    m = fit_sgp(jnp.asarray(x), jnp.asarray(y), z=jnp.asarray(z),
                method="VFE")
    np.testing.assert_allclose(np.asarray(m.z), z)
    pred = np.asarray(sgp_predict(m, jnp.asarray(x)))
    assert np.sqrt(np.mean((pred - f) ** 2)) < 0.1


def test_sgp_variance_positive_and_grows_off_data():
    x, y, _ = _noisy_sine(100)
    m = fit_sgp(jnp.asarray(x), jnp.asarray(y), n_inducing=20, seed=1)
    var_in = float(np.mean(np.asarray(
        sgp_predict_var(m, jnp.asarray(x[:10]))
    )))
    var_out = float(np.asarray(
        sgp_predict_var(m, jnp.asarray([[30.0]]))
    )[0])
    assert var_in > 0
    assert var_out > var_in  # far from data -> larger variance


def test_sgp_fixed_noise():
    x, y, _ = _noisy_sine(100)
    m = fit_sgp(jnp.asarray(x), jnp.asarray(y), n_inducing=20,
                noise=0.05, estimate_noise=False)
    np.testing.assert_allclose(float(m.noise), 0.05)


def test_sgp_valvar_and_gradients():
    x, y, _ = _noisy_sine(100)
    m = fit_sgp(jnp.asarray(x), jnp.asarray(y), n_inducing=20, seed=2)
    xq = jnp.asarray([[1.0], [2.0]])
    mean, var = sgp_predict_valvar(m, xq)
    assert mean.shape == (2,) and var.shape == (2,)
    g = sgp_predict_gradients(m, xq)
    eps = 1e-6
    fd = (float(sgp_predict(m, jnp.asarray([[1.0 + eps]]))[0])
          - float(sgp_predict(m, jnp.asarray([[1.0 - eps]]))[0])) / (2 * eps)
    assert abs(float(g[0, 0]) - fd) < 1e-3 * max(1.0, abs(fd))


def test_sgp_kpls():
    rng = np.random.RandomState(0)
    n, d = 120, 8
    x = rng.uniform(-1, 1, (n, d))
    y = np.sin(2 * x[:, 0]) + 0.5 * x[:, 1] + rng.normal(0, 0.05, n)
    m = fit_sgp(jnp.asarray(x), jnp.asarray(y), kpls_dim=2, n_inducing=30,
                seed=3)
    assert m.theta.shape == (2,)
    pred = np.asarray(sgp_predict(m, jnp.asarray(x)))
    assert np.corrcoef(pred, y)[0, 1] > 0.9


def test_sgp_fixed_theta():
    """ThetaTuning::Fixed for SGP: theta pinned, sigma2/noise still
    optimized (ref: sparse_algorithm.rs:472)."""
    x, y, _ = _noisy_sine(100)
    m = fit_sgp(jnp.asarray(x), jnp.asarray(y), n_inducing=20,
                theta_init=0.37, theta_fixed=True, seed=1)
    np.testing.assert_allclose(np.asarray(m.theta), [0.37], rtol=1e-6)
    assert float(m.noise) > 0


def test_sgp_subsample_warmstart():
    """Dense-subsample theta warm start (fit_sgp subsample_warmstart):
    the fit stays in a data-fitting basin (noise well below var(y)) and
    predicts the held-out signal."""
    x, y, _ = _noisy_sine(400)
    m = fit_sgp(jnp.asarray(x), jnp.asarray(y), n_inducing=30,
                subsample_warmstart=100, n_start=3, seed=0)
    assert float(m.noise) < 0.5 * float(jnp.var(jnp.asarray(y)))
    xt = jnp.linspace(0.0, 1.0, 50)[:, None] * (
        jnp.asarray(x).max() - jnp.asarray(x).min()
    ) + jnp.asarray(x).min()
    pred = np.asarray(sgp_predict(m, xt))
    assert np.all(np.isfinite(pred))


def test_sgp_subsample_warmstart_kpls_rejected():
    x, y, _ = _noisy_sine(120)
    x2 = np.concatenate([x, x**2], axis=1)
    with pytest.raises(ValueError, match="subsample_warmstart"):
        fit_sgp(jnp.asarray(x2), jnp.asarray(y), kpls_dim=1,
                n_inducing=20, subsample_warmstart=50)


def test_sgp_warmstart_robust_to_bad_dense_basin():
    """Round-5 robustness regression (measured on a 2-d noisy sine,
    n=3000): the dense subfit has no noise term, so on wiggly noisy data
    its theta can land where the joint SGP L-BFGS diverges into the
    all-noise plateau (noise -> 1e9, Q2 ~ 0). Two guards now hold:
    (1) the DEFAULT theta init rides along as an extra lane
    (fit_sgp_core theta0_alt), (2) the warm noise init is 1e-1 var(y) —
    starting BELOW the underfit kernel's residual scale overshoots into
    the plateau on the first line search. This config reproduced the
    collapse before both fixes."""
    rng = np.random.default_rng(0)
    xs = rng.uniform(-1, 1, (1200, 2))
    ys = (np.sin(3 * xs[:, 0]) * np.cos(2 * xs[:, 1])
          + 0.05 * rng.standard_normal(1200))
    m = fit_sgp(jnp.asarray(xs), jnp.asarray(ys), n_inducing=40,
                n_start=2, seed=0, subsample_warmstart=400)
    # the all-noise plateau has noise >> var(y); a healthy fit sits well
    # below it and explains the held-in signal
    assert float(m.noise) < 0.5 * float(jnp.var(jnp.asarray(ys)))
    yp = np.asarray(sgp_predict(m, jnp.asarray(xs[:300])))
    q2 = 1.0 - ((ys[:300] - yp) ** 2).sum() / (
        (ys[:300] - ys[:300].mean()) ** 2
    ).sum()
    assert q2 > 0.9, q2
