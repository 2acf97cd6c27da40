"""Distributed GP model: sharded realization + predict parity.

VERDICT r3 item 1: fit_gp(mesh=...) must yield a model whose (n, n) state
stays sharded AND whose predict/predict_var match the single-device paths
to fp tolerance on the 8-device CPU mesh."""

import jax.numpy as jnp
import numpy as np
import pytest

from egobox_tpu.gp.fit import fit_gp
from egobox_tpu.gp.gp import predict, predict_valvar, predict_var
from egobox_tpu.parallel import (
    DistGpModel,
    block_cyclic_perm,
    make_mesh,
    pick_panel_size,
    realize_dist_model,
    solve_upperT_blockcyclic,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, axis="rows")


def _problem(n=256, d=3, seed=3):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(size=(n, d)))
    y = jnp.sin(3.0 * x[:, 0]) + x[:, 1] ** 2 + 0.1 * x[:, -1]
    return x, y[:, None]


def test_solve_upperT_blockcyclic_matches_dense(mesh):
    n, p = 128, 3
    rng = np.random.default_rng(1)
    a = rng.standard_normal((n, n))
    r = jnp.asarray(a @ a.T + n * np.eye(n))
    l_ref = jnp.linalg.cholesky(r)
    b = jnp.asarray(rng.standard_normal((n, p)))
    bp = pick_panel_size(n, 8)
    perm = block_cyclic_perm(n, 8, bp)
    x_feed = solve_upperT_blockcyclic(
        mesh, l_ref[perm, :], b[perm, :], bp
    )
    x_ref = np.linalg.solve(np.asarray(l_ref).T, np.asarray(b))
    np.testing.assert_allclose(
        np.asarray(x_feed), x_ref[perm, :], rtol=1e-8, atol=1e-9
    )


def test_dist_model_predict_parity(mesh):
    """realize + predict/predict_var at a FIXED theta match the
    single-device GpModel exactly (same theta -> same posterior)."""
    x, y = _problem(n=128, d=2, seed=7)
    theta = jnp.asarray([0.8, 1.7])
    m_ref = fit_gp(x, y, theta_init=theta, theta_fixed=True)
    dm = realize_dist_model(mesh, x, y, theta)
    xq = jnp.asarray(
        np.random.default_rng(0).uniform(size=(17, 2))
    )
    # reduction orders differ across the shards: ~1e-7 relative noise
    np.testing.assert_allclose(
        np.asarray(dm.predict(xq)), np.asarray(predict(m_ref, xq)),
        rtol=1e-6, atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(dm.predict_var(xq)), np.asarray(predict_var(m_ref, xq)),
        rtol=1e-5, atol=1e-7,
    )
    mv, vv = dm.predict_valvar(xq)
    mr, vr = predict_valvar(m_ref, xq)
    np.testing.assert_allclose(np.asarray(mv), np.asarray(mr), rtol=1e-6)
    # posterior variance cancels 1 - rt2 + u2 between O(1) terms: at
    # training-adjacent queries the true value is ~0 and the shard
    # reduction-order noise is ABSOLUTE (~1e-8 at f64), not relative
    np.testing.assert_allclose(
        np.asarray(vv), np.asarray(vr), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        float(dm.likelihood), float(m_ref.likelihood), rtol=1e-6
    )
    # sigma2 accumulates shard reduction-order noise through the solves:
    # observed 2.4e-6 rel on the 8-device CPU mesh
    np.testing.assert_allclose(
        float(dm.sigma2), float(m_ref.sigma2), rtol=1e-5
    )


def test_fit_gp_mesh_returns_dist_model_end_to_end(mesh):
    """fit_gp(mesh=...) runs MLE -> realization -> predict with nothing
    gathered; posterior parity vs the single-device fit_gp at the same
    converged theta basin."""
    x, y = _problem(n=128, d=2, seed=11)
    m_ref = fit_gp(x, y, n_start=0, max_iters=25)
    dm = fit_gp(x, y, n_start=0, max_iters=25, mesh=mesh)
    assert isinstance(dm, DistGpModel)
    # O(n^2) state is sharded over the mesh, not replicated
    shard_shape = dm.l_feed.sharding.shard_shape(dm.l_feed.shape)
    assert shard_shape[0] == dm.l_feed.shape[0] // 8
    xq = jnp.asarray(np.random.default_rng(5).uniform(size=(9, 2)))
    np.testing.assert_allclose(
        np.asarray(dm.predict(xq)), np.asarray(predict(m_ref, xq)),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(dm.predict_var(xq)),
        np.asarray(predict_var(m_ref, xq)),
        rtol=5e-3, atol=1e-8,
    )


def test_fit_gp_mesh_materialize_opt_out(mesh):
    """mesh_materialize=True keeps the round-3 behavior: a plain GpModel
    assembled on one device after the distributed MLE."""
    from egobox_tpu.gp.gp import GpModel

    x, y = _problem(n=64, d=2, seed=2)
    m = fit_gp(x, y, n_start=0, max_iters=10, mesh=mesh,
               mesh_materialize=True)
    assert isinstance(m, GpModel)


def test_dist_model_kpls(mesh):
    """KPLS-reduced theta space on the distributed realize/predict path."""
    x, y = _problem(n=128, d=5, seed=13)
    theta = jnp.asarray([0.5, 1.2])
    m_ref = fit_gp(x, y, theta_init=theta, theta_fixed=True, kpls_dim=2)
    dm = realize_dist_model(mesh, x, y, theta, kpls_dim=2)
    xq = jnp.asarray(np.random.default_rng(3).uniform(size=(11, 5)))
    np.testing.assert_allclose(
        np.asarray(dm.predict(xq)), np.asarray(predict(m_ref, xq)),
        rtol=1e-6, atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(dm.predict_var(xq)), np.asarray(predict_var(m_ref, xq)),
        rtol=1e-6, atol=1e-9,
    )


def test_dist_posterior_cov_and_sample_parity(mesh):
    """posterior_cov matches the single-device posterior_cov at the same
    theta; sample draws reproduce the single-device trajectories exactly
    (same key, same (q, q) covariance -> same root up to shard noise).
    VERDICT r4 weak #7: the serving boundary grows sample()."""
    import jax

    from egobox_tpu.gp.gp import posterior_cov, sample

    x, y = _problem(n=128, d=2, seed=7)
    theta = jnp.asarray([0.8, 1.7])
    m_ref = fit_gp(x, y, theta_init=theta, theta_fixed=True)
    dm = realize_dist_model(mesh, x, y, theta)
    xq = jnp.asarray(np.random.default_rng(4).uniform(size=(13, 2)))
    cov_d = np.asarray(dm.posterior_cov(xq))
    cov_r = np.asarray(posterior_cov(m_ref, xq))
    np.testing.assert_allclose(cov_d, cov_r, rtol=1e-4, atol=1e-8)
    # symmetric PSD up to shard reduction noise
    np.testing.assert_allclose(cov_d, cov_d.T, atol=1e-10)
    key = jax.random.key(0)
    tr_d = np.asarray(dm.sample(xq, 5, key))
    tr_r = np.asarray(sample(m_ref, xq, 5, key))
    np.testing.assert_allclose(tr_d, tr_r, rtol=1e-3, atol=1e-5)


def test_dist_model_save_raises_with_guidance(mesh):
    """The unsupported edge is loud and tells the user the way out
    (VERDICT r4 weak #7: 'nothing tells a user which GpModel
    capabilities the distributed model lacks')."""
    x, y = _problem(n=64, d=2, seed=2)
    dm = realize_dist_model(mesh, x, y, jnp.asarray([1.0, 1.0]))
    with pytest.raises(NotImplementedError, match="mesh_materialize"):
        dm.save("/tmp/never_written.json")
