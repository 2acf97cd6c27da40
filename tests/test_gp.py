"""GP fit/predict tests, mirroring the reference test strategy
(crates/gp/src/algorithm.rs tests + python test_gpmix.py):
combinatorial trend×kernel fits, interpolation exactness, point-value
goldens, analytic-vs-fdiff gradients, KPLS on griewank, masked-padding
equivalence (TPU bucketing path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egobox_tpu import gp


def griewank(x):
    x = np.atleast_2d(np.asarray(x))
    s = np.sum(x**2 / 4000.0, axis=1)
    p = np.prod(np.cos(x / np.sqrt(np.arange(1, x.shape[1] + 1))), axis=1)
    return s - p + 1.0


@pytest.fixture(scope="module")
def kriging_1d():
    xt = jnp.array([[0.0], [1.0], [2.0], [3.0], [4.0]])
    yt = jnp.array([0.0, 1.0, 1.5, 0.9, 1.0])
    return gp.fit_gp(xt, yt), xt, yt


def test_kriging_interpolation(kriging_1d):
    model, xt, yt = kriging_1d
    yp = gp.predict(model, xt)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yt), atol=1e-8)
    vp = gp.predict_var(model, xt)
    np.testing.assert_allclose(np.asarray(vp), 0.0, atol=1e-8)


def test_kriging_point_goldens(kriging_1d):
    """Reference accuracy goldens (test_gpmix.py:38-52):
    predict(1.1)=1.1163±1e-3, grad(1.1)=1.1204±1e-3,
    var_grad(1.1)=0.0145±1e-3."""
    model, _, _ = kriging_1d
    x = jnp.array([[1.1]])
    assert abs(float(gp.predict(model, x)[0]) - 1.1163) < 1e-3
    assert abs(float(gp.predict_var(model, x)[0])) < 1e-3
    assert abs(float(gp.predict_gradients(model, x)[0, 0]) - 1.1204) < 1e-3
    assert abs(float(gp.predict_var_gradients(model, x)[0, 0]) - 0.0145) < 1e-3


@pytest.mark.parametrize("trend", ["constant", "linear", "quadratic"])
@pytest.mark.parametrize(
    "corr",
    ["squared_exponential", "absolute_exponential", "matern32", "matern52"],
)
def test_gp_combinatorial(trend, corr):
    """All 12 trend×kernel combos must fit and interpolate
    (ref macro: gp/src/algorithm.rs:1239-1303)."""
    rng = np.random.RandomState(0)
    xt = jnp.asarray(np.sort(rng.uniform(0, 25, (12, 1)), axis=0))
    yt = jnp.asarray(
        ((xt[:, 0] - 3.5) * np.sin((xt[:, 0] - 3.5) / np.pi))
    )
    model = gp.fit_gp(xt, yt, corr=corr, trend=trend, n_start=5)
    yp = gp.predict(model, xt)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yt), atol=1e-4)


def test_gp_gradients_vs_fdiff(kriging_1d):
    model, _, _ = kriging_1d
    x0 = 1.3
    eps = 1e-6
    g = float(gp.predict_gradients(model, jnp.array([[x0]]))[0, 0])
    fd = (
        float(gp.predict(model, jnp.array([[x0 + eps]]))[0])
        - float(gp.predict(model, jnp.array([[x0 - eps]]))[0])
    ) / (2 * eps)
    assert abs(g - fd) < 1e-5
    gv = float(gp.predict_var_gradients(model, jnp.array([[x0]]))[0, 0])
    fdv = (
        float(gp.predict_var(model, jnp.array([[x0 + eps]]))[0])
        - float(gp.predict_var(model, jnp.array([[x0 - eps]]))[0])
    ) / (2 * eps)
    assert abs(gv - fdv) < 1e-5


def test_masked_fit_matches_unpadded():
    """Padding rows with mask=False must give the same model outputs —
    the core guarantee behind compile-once bucketing on TPU."""
    rng = np.random.RandomState(1)
    x = rng.uniform(0, 10, (9, 2))
    y = np.sin(x[:, 0]) + 0.5 * x[:, 1]

    x_pad = np.vstack([x, np.full((7, 2), 123.0)])
    y_pad = np.concatenate([y, np.full(7, -99.0)])
    mask = np.concatenate([np.ones(9, bool), np.zeros(7, bool)])
    xq = jnp.asarray(rng.uniform(0, 10, (6, 2)))

    # 1) the masking contract in isolation: at a FIXED theta the padded
    #    model must be numerically indistinguishable from the unpadded one
    theta = np.array([0.3, 0.7])
    f_ref = gp.fit_gp(jnp.asarray(x), jnp.asarray(y), theta_init=theta,
                      theta_fixed=True)
    f_pad = gp.fit_gp(jnp.asarray(x_pad), jnp.asarray(y_pad),
                      mask=jnp.asarray(mask), theta_init=theta,
                      theta_fixed=True)
    np.testing.assert_allclose(
        np.asarray(gp.predict(f_ref, xq)),
        np.asarray(gp.predict(f_pad, xq)), rtol=1e-10, atol=1e-12,
    )
    np.testing.assert_allclose(
        float(f_ref.likelihood), float(f_pad.likelihood), rtol=1e-10
    )

    # 2) through the optimizer: different static shapes fuse differently,
    #    so the two MLE trajectories stop at fp-separated points in the
    #    same basin — model outputs agree to optimizer-noise tolerance
    m_ref = gp.fit_gp(jnp.asarray(x), jnp.asarray(y), n_start=3)
    m_pad = gp.fit_gp(jnp.asarray(x_pad), jnp.asarray(y_pad),
                      mask=jnp.asarray(mask), n_start=3)
    np.testing.assert_allclose(
        np.asarray(gp.predict(m_ref, xq)),
        np.asarray(gp.predict(m_pad, xq)),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(gp.predict_var(m_ref, xq)),
        np.asarray(gp.predict_var(m_pad, xq)),
        rtol=1e-3, atol=1e-8,
    )
    np.testing.assert_allclose(
        float(m_ref.likelihood), float(m_pad.likelihood), rtol=1e-6
    )


def test_kpls_griewank():
    """KPLS-3 GP on griewank d=50 (ref: test_gpmix.py:91-120, rel err<5e-1;
    crates/gp algorithm.rs:1319-1372 NRMSE<1e-2 at d=5)."""
    from egobox_tpu import doe

    n_dim, n_train = 50, 100
    key = jax.random.key(42)
    x_train = doe.lhs_normalized(key, n_train, n_dim,
                                 doe.LhsKind.MAXIMIN) * 1200.0 - 600.0
    y_train = jnp.asarray(griewank(np.asarray(x_train)))
    rng = np.random.RandomState(0)
    x_test = jnp.asarray(rng.uniform(-600, 600, (5, n_dim)))
    y_test = griewank(np.asarray(x_test))

    model = gp.fit_gp(x_train, y_train, kpls_dim=3, n_start=5)
    y_pred = np.asarray(gp.predict(model, x_test))
    err = np.linalg.norm(y_pred - y_test) / np.linalg.norm(y_test)
    assert err < 5e-1


def test_kpls_griewank_d5_nrmse():
    from egobox_tpu import doe

    n_dim, n_train = 5, 100
    key = jax.random.key(0)
    x_train = doe.lhs_normalized(key, n_train, n_dim,
                                 doe.LhsKind.MAXIMIN) * 1200.0 - 600.0
    y_train = jnp.asarray(griewank(np.asarray(x_train)))
    rng = np.random.RandomState(1)
    x_test = jnp.asarray(rng.uniform(-600, 600, (20, n_dim)))
    y_test = griewank(np.asarray(x_test))

    model = gp.fit_gp(x_train, y_train, kpls_dim=3, n_start=5)
    y_pred = np.asarray(gp.predict(model, x_test))
    nrmse = np.sqrt(np.mean((y_pred - y_test) ** 2)) / (
        y_test.max() - y_test.min()
    )
    assert nrmse < 1e-2


def test_gp_sampling(kriging_1d):
    model, xt, yt = kriging_1d
    xq = jnp.linspace(0.0, 4.0, 30)[:, None]
    traj = gp.sample(model, xq, 200, jax.random.key(3))
    assert traj.shape == (30, 200)
    mean = gp.predict(model, xq)
    emp_mean = jnp.mean(traj, axis=1)
    # trajectories scatter around the posterior mean
    np.testing.assert_allclose(
        np.asarray(emp_mean), np.asarray(mean), atol=0.2
    )
    # at training points the variance is ~0 so trajectories pin down
    traj_t = gp.sample(model, xt, 50, jax.random.key(4))
    np.testing.assert_allclose(
        np.asarray(traj_t.std(axis=1)), 0.0, atol=1e-3
    )


def test_fixed_theta():
    xt = jnp.array([[0.0], [1.0], [2.0], [3.0], [4.0]])
    yt = jnp.array([0.0, 1.0, 1.5, 0.9, 1.0])
    model = gp.fit_gp(xt, yt, theta_init=0.42, theta_fixed=True)
    np.testing.assert_allclose(np.asarray(model.theta), [0.42])


def test_multioutput_rejected():
    xt = jnp.zeros((5, 1))
    yt = jnp.zeros((5, 2))
    with pytest.raises(ValueError):
        gp.fit_gp(xt, yt)


def test_unrecoverable_fit_raises():
    """Nugget-escalation retries that still yield a non-finite likelihood
    must raise GpFitError instead of silently returning a garbage model
    (ref behavior: gp/src/algorithm.rs:1009-1027 errors out of fit)."""
    xt = jnp.array([[0.0], [1.0], [jnp.nan], [3.0], [4.0]])
    yt = jnp.array([0.0, 1.0, 1.5, 0.9, 1.0])
    with pytest.raises(gp.GpFitError, match="non-finite"):
        gp.fit_gp(xt, yt, n_start=1, max_iters=3)


def test_multidraw_warmstart():
    """Multi-draw warm start (sub_draws / subsample_warmstart2): all
    candidate thetas are polished on the full data and the best final
    likelihood wins, so the result can never be worse than the
    single-draw recipe by more than optimizer noise (the polish's exact
    full-data objective does the basin selection)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-2.0, 2.0, (700, 4)))
    y = jnp.asarray(
        (np.sum(np.sin(2.0 * np.asarray(x)), axis=1)
         + 0.1 * rng.standard_normal(700))[:, None]
    )
    kw = dict(n_start=1, max_iters=6, nugget=1e-6,
              subsample_warmstart=200, polish_iters=3, polish_tr=True,
              seed=2)
    m1 = gp.fit_gp(x, y, **kw)
    m3 = gp.fit_gp(x, y, sub_draws=2, subsample_warmstart2=400, **kw)
    lk1, lk3 = float(m1.likelihood), float(m3.likelihood)
    assert np.isfinite(lk3)
    assert lk3 >= lk1 - 0.005 * abs(lk1), (lk1, lk3)


def test_multi_init_requires_no_lhs_seeds():
    """A (k, dim) theta0 init stack is exclusive with LHS multistart."""
    from egobox_tpu.gp.fit import fit_gp_core

    x = jnp.zeros((8, 2))
    y = jnp.zeros((8, 1))
    mask = jnp.ones((8,), bool)
    with pytest.raises(ValueError, match="init stack"):
        fit_gp_core(
            x, y, mask, jnp.full((3, 2), 0.1), jnp.full((2,), 1e-2),
            jnp.full((2,), 10.0), jnp.ones((2,), bool),
            jax.random.key(0), n_start=2,
        )
