"""Mixture-of-experts tests (ref: crates/moe tests + python test_gpmix.py
n_clusters paths)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egobox_tpu.moe import (
    GpMixture,
    fit_gmm,
    from_gmm_x_marginal,
    predict_cluster,
    predict_probas,
    q2_score,
    gp_fit_predict,
    train_moe,
)
from egobox_tpu.types import Recombination


def _two_regime(n=60, seed=0):
    """Piecewise function with an obvious cluster structure
    (the reference uses similar discontinuous test functions)."""
    rng = np.random.RandomState(seed)
    x = np.sort(rng.uniform(0, 1, (n, 1)), axis=0)
    y = np.where(x[:, 0] < 0.5, 10.0 + 2.0 * x[:, 0],
                 -5.0 * x[:, 0] + 1.0)
    return x, y


def test_gmm_separates_clusters():
    rng = np.random.RandomState(0)
    a = rng.normal(0.0, 0.3, (100, 2))
    b = rng.normal(5.0, 0.3, (100, 2))
    x = jnp.asarray(np.vstack([a, b]))
    gmm = fit_gmm(jax.random.key(0), x, 2, n_runs=5)
    assert gmm.weights.shape == (2,)
    np.testing.assert_allclose(np.sort(np.asarray(gmm.weights)), [0.5, 0.5],
                               atol=0.05)
    means = np.sort(np.asarray(gmm.means)[:, 0])
    np.testing.assert_allclose(means, [0.0, 5.0], atol=0.3)


def test_gaussian_mixture_probas():
    rng = np.random.RandomState(1)
    a = rng.normal(0.0, 0.3, (50, 1))
    b = rng.normal(5.0, 0.3, (50, 1))
    xy = np.hstack([np.vstack([a, b]),
                    np.vstack([a * 0, b * 0 + 1])])
    gmm = fit_gmm(jax.random.key(0), jnp.asarray(xy), 2, n_runs=5)
    gmx = from_gmm_x_marginal(gmm, 1)
    p = predict_probas(gmx, jnp.array([[0.0], [5.0]]))
    assert p.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(p.sum(axis=1)), 1.0, atol=1e-9)
    # each query point overwhelmingly in its own cluster
    assert float(p[0].max()) > 0.99 and float(p[1].max()) > 0.99
    cl = predict_cluster(gmx, jnp.array([[0.0], [5.0]]))
    assert cl[0] != cl[1]


def test_moe_single_cluster_matches_gp():
    x, y = _two_regime(30)
    mix = train_moe(x, y, n_clusters=1, n_start=5)
    assert mix.n_clusters == 1
    pred = np.asarray(mix.predict(x))
    np.testing.assert_allclose(pred, y, atol=1e-3)


@pytest.mark.slow
def test_moe_two_clusters_beats_one_on_discontinuity():
    x, y = _two_regime(60)
    xq = np.linspace(0.05, 0.95, 40)[:, None]
    yq = np.where(xq[:, 0] < 0.5, 10.0 + 2.0 * xq[:, 0],
                  -5.0 * xq[:, 0] + 1.0)

    mix2 = train_moe(x, y, n_clusters=2, n_start=5,
                     recombination=Recombination.SMOOTH)
    assert mix2.n_clusters == 2
    err2 = np.sqrt(np.mean((np.asarray(mix2.predict(xq)) - yq) ** 2))

    mix1 = train_moe(x, y, n_clusters=1, n_start=5)
    err1 = np.sqrt(np.mean((np.asarray(mix1.predict(xq)) - yq) ** 2))
    assert err2 < err1


def test_moe_hard_vs_smooth():
    x, y = _two_regime(60)
    mix = train_moe(x, y, n_clusters=2, n_start=5,
                    recombination=Recombination.HARD)
    pred_h = np.asarray(mix.predict(x))
    assert np.sqrt(np.mean((pred_h - y) ** 2)) < 1.0
    var = np.asarray(mix.predict_var(x))
    assert var.shape == (60,)
    assert np.all(var >= 0)


@pytest.mark.slow
def test_moe_gradients_vs_fdiff():
    x, y = _two_regime(40)
    mix = train_moe(x, y, n_clusters=2, n_start=3)
    x0 = np.array([[0.31]])
    g = float(np.asarray(mix.predict_gradients(jnp.asarray(x0)))[0, 0])
    # the smooth-mixture product-rule formula must equal autodiff exactly
    g_auto = float(jax.grad(
        lambda xi: mix.predict(xi[None, :])[0]
    )(jnp.asarray(x0[0]))[0])
    assert abs(g - g_auto) < 1e-8 * max(1.0, abs(g_auto))
    # and match central differences (eps large enough to beat the fd noise
    # of the chained GP solves)
    eps = 1e-4
    fd = (
        float(mix.predict(jnp.asarray(x0 + eps))[0])
        - float(mix.predict(jnp.asarray(x0 - eps))[0])
    ) / (2 * eps)
    assert abs(g - fd) < 1e-4 * max(1.0, abs(fd))


@pytest.mark.slow
def test_moe_auto_clusters():
    x, y = _two_regime(60)
    mix = train_moe(x, y, n_clusters=0, n_start=3)
    assert mix.n_clusters >= 1
    pred = np.asarray(mix.predict(x))
    assert np.sqrt(np.mean((pred - y) ** 2)) < 2.0


@pytest.mark.slow
def test_moe_sample_mono_cluster():
    x, y = _two_regime(20)
    mix = train_moe(x, y, n_clusters=1, n_start=3)
    traj = mix.sample(x[:5], 10)
    assert traj.shape == (5, 10)
    with pytest.raises(ValueError):
        train_moe(x, y, n_clusters=2, n_start=3).sample(x[:5], 10)


def test_q2_metric():
    """Q2 ~ 1 for a well-modeled smooth function
    (ref: gp/src/metrics.rs:117-146 Q2 = 1 ± 1e-2 on griewank)."""
    rng = np.random.RandomState(0)
    x = rng.uniform(0, 1, (40, 2))
    y = np.sin(3 * x[:, 0]) + x[:, 1] ** 2
    fp = gp_fit_predict(n_start=3)
    q2 = q2_score(x, y, fp, kfold=5)
    assert q2 > 0.98


@pytest.mark.slow
def test_moe_sparse_experts():
    """Sparse-GP experts inside the mixture (ref: GpType::SparseGp,
    moe/src/parameters.rs:98-108 + declare_sgp_surrogate registry)."""
    from egobox_tpu.gp.sgp import SgpModel

    rng = np.random.RandomState(0)
    n = 240
    x = np.sort(rng.uniform(0, 1, (n, 1)), axis=0)
    y = (np.where(x[:, 0] < 0.5, 10.0 + 2 * x[:, 0], -5 * x[:, 0] + 1.0)
         + rng.normal(0, 0.05, n))
    mix = train_moe(x, y, n_clusters=2, gp_type="sparse", n_inducing=25,
                    sparse_method="VFE", n_start=3,
                    recombination=Recombination.HARD)
    assert all(isinstance(e, SgpModel) for e in mix.experts)
    pred = np.asarray(mix.predict(x))
    # at the noise floor away from the cluster boundary
    inner = np.abs(x[:, 0] - 0.5) > 0.05
    rmse = np.sqrt(np.mean((pred[inner] - y[inner]) ** 2))
    assert rmse < 0.1
    assert np.all(np.asarray(mix.predict_var(x)) >= 0)
