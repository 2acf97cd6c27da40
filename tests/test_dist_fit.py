"""Distributed GP fit: block-cyclic Cholesky + sharded analytic adjoint.

Closes VERDICT r2 item 1: the distributed likelihood now has a gradient,
so a multi-chip MLE actually runs — parity is asserted against the
single-device residual-reuse objective (gp/likelihood.py) on the 8-device
CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egobox_tpu.gp.likelihood import make_neg_rlf_residual_api
from egobox_tpu.optim.lbfgsb import minimize_lbfgsb
from egobox_tpu.parallel import (
    block_cyclic_perm,
    cholesky_blockcyclic,
    dist_likelihood_parts,
    fit_theta_distributed,
    make_mesh,
    make_neg_rlf_distributed,
    pick_panel_size,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, axis="rows")


def _problem(n=256, d=3, seed=3):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(size=(n, d)))
    y = jnp.sin(3.0 * x[:, 0]) + x[:, 1] ** 2 + 0.1 * x[:, -1]
    return x, y[:, None]


def _normalized(x, y):
    xs = (x - x.mean(0)) / x.std(0, ddof=1)
    ys = (y - y.mean(0)) / y.std(0, ddof=1)
    return xs, ys


def test_blockcyclic_chol_matches_dense(mesh):
    n = 256
    rng = np.random.default_rng(0)
    a = rng.standard_normal((n, n))
    r = jnp.asarray(a @ a.T + n * np.eye(n))
    bp = pick_panel_size(n, 8)
    assert bp < n // 8, "cyclic layout should use >1 panel per device"
    perm = block_cyclic_perm(n, 8, bp)
    l_ref = np.asarray(jnp.linalg.cholesky(r))
    l_feed = cholesky_blockcyclic(mesh, r[perm, :], bp)
    np.testing.assert_allclose(
        np.asarray(l_feed), l_ref[perm, :], rtol=1e-9, atol=1e-9
    )


@pytest.mark.parametrize("corr", ["squared_exponential", "matern32"])
def test_dist_grad_matches_single_device(mesh, corr):
    x, y = _problem()
    xs, ys = _normalized(x, y)
    nug = 100.0 * float(jnp.finfo(x.dtype).eps)
    t10 = jnp.log10(jnp.asarray([0.5, 0.8, 1.2]))

    f_ref, g_ref = make_neg_rlf_residual_api(
        corr, "constant", xs, ys, y.std(0, ddof=1), None, nug
    )
    fref, res_ref = f_ref(t10)
    gref = g_ref(t10, res_ref)

    fd, gd = make_neg_rlf_distributed(mesh, x, y, corr=corr, nugget=nug)
    fv, res_d = fd(t10)
    gv = gd(t10, res_d)

    np.testing.assert_allclose(float(fv), float(fref), rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(gv), np.asarray(gref), rtol=1e-6, atol=1e-8
    )


def test_dist_stoch_grad_matches_single_device(mesh):
    """The distributed Hutchinson gradient (grad_probes, the memory-light
    path mandatory at n >= 16k on one chip) reuses the single-device
    estimator's FIXED probe key, and every contraction is row-permutation
    invariant — so both paths compute the SAME estimate up to fp
    reduction order."""
    x, y = _problem()
    xs, ys = _normalized(x, y)
    nug = 100.0 * float(jnp.finfo(x.dtype).eps)
    t10 = jnp.log10(jnp.asarray([0.5, 0.8, 1.2]))

    f_ref, g_ref = make_neg_rlf_residual_api(
        "squared_exponential", "constant", xs, ys, y.std(0, ddof=1),
        None, nug, stoch_probes=16,
    )
    _, res_ref = f_ref(t10)
    gref = g_ref(t10, res_ref)

    fd, gd = make_neg_rlf_distributed(
        mesh, x, y, corr="squared_exponential", nugget=nug, grad_probes=16
    )
    _, res_d = fd(t10)
    gv = gd(t10, res_d)

    np.testing.assert_allclose(
        np.asarray(gv), np.asarray(gref), rtol=1e-6, atol=1e-8
    )


def test_dist_fit_theta_matches_single_device(mesh):
    x, y = _problem(n=128, d=2, seed=7)
    xs, ys = _normalized(x, y)
    nug = 100.0 * float(jnp.finfo(x.dtype).eps)
    d = x.shape[1]
    t0 = jnp.log10(jnp.full((d,), 0.1, x.dtype))
    lo = jnp.log10(jnp.full((d,), 1e-2, x.dtype))
    up = jnp.log10(jnp.full((d,), 1e1, x.dtype))

    fun_and_res, grad_from_res = make_neg_rlf_residual_api(
        "squared_exponential", "constant", xs, ys, y.std(0, ddof=1),
        None, nug,
    )
    res_single = minimize_lbfgsb(
        lambda t: fun_and_res(t)[0], t0, lo, up, max_iters=25,
        fun_and_res=fun_and_res, grad_from_res=grad_from_res,
    )

    theta_dist, res_dist = fit_theta_distributed(
        mesh, x, y, theta0=jnp.full((d,), 0.1, x.dtype),
        max_iters=25, nugget=nug,
    )

    # identical objective + identical optimizer: the optima agree to the
    # converged-neighborhood tolerance (reduction-order fp noise steers
    # slightly different line-search accept boundaries over 25 iterations
    # — measured log10-theta gap ~5e-4, likelihood gap ~2e-9)
    np.testing.assert_allclose(
        np.log10(np.asarray(theta_dist)), np.asarray(res_single.x),
        rtol=5e-3, atol=2e-3,
    )
    np.testing.assert_allclose(
        float(res_dist.fun), float(res_single.fun), rtol=1e-6
    )


def test_dist_likelihood_failure_returns_neg_inf(mesh):
    # duplicated design with zero nugget: singular Gram must surface as
    # -inf (NOT NaN) so fit_gp's nugget-escalation retry semantics hold
    # (parity with the single-device guard, gp/likelihood.py)
    n, d = 64, 2
    rng = np.random.default_rng(1)
    half = rng.uniform(size=(n // 2, d))
    x = jnp.asarray(np.concatenate([half, half], axis=0))
    y = jnp.asarray(rng.standard_normal((n, 1)))
    xs, ys = _normalized(x, y)
    rlf, _ = dist_likelihood_parts(
        mesh, xs, ys, jnp.asarray([1.0, 1.0]), nugget=0.0,
    )
    assert float(rlf) == -np.inf


def test_fit_gp_mesh_matches_single_device(mesh):
    from egobox_tpu.gp.fit import fit_gp

    x, y = _problem(n=128, d=2, seed=11)
    m_ref = fit_gp(x, y, n_start=0, max_iters=25)
    m_dist = fit_gp(x, y, n_start=0, max_iters=25, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(m_dist.theta), np.asarray(m_ref.theta),
        rtol=5e-3, atol=1e-4,
    )
    # the two optimizers stop at fp-noise-separated points in the same
    # basin: thetas agree to ~5e-4, likelihoods to ~1e-5 (linear
    # sensitivity away from the exact stationary point)
    np.testing.assert_allclose(
        float(m_dist.likelihood), float(m_ref.likelihood), rtol=1e-4
    )


def test_block_cyclic_perm_properties():
    """feedperm is a permutation; device d's shard holds panels
    d, d+D, 2D+d, ... of the elimination order, each contiguous."""
    from egobox_tpu.parallel import block_cyclic_perm, pick_panel_size

    for n, ndev in ((128, 8), (96, 4), (64, 2)):
        bp = pick_panel_size(n, ndev)
        assert n % (bp * ndev) == 0
        perm = block_cyclic_perm(n, ndev, bp)
        assert sorted(perm.tolist()) == list(range(n))
        n_loc = n // ndev
        for d in range(ndev):
            shard = perm[d * n_loc:(d + 1) * n_loc]
            pans = (shard // bp).reshape(-1, bp)
            # each local panel is one global panel, owner cycles by D
            assert np.all(pans == pans[:, :1])
            assert np.all(pans[:, 0] % ndev == d)


def test_fit_gp_mesh_input_validation(mesh):
    from egobox_tpu.gp.fit import fit_gp

    x, y = _problem(n=64, d=2, seed=0)
    with pytest.raises(ValueError, match="full mask"):
        m = np.ones(64, bool)
        m[:5] = False
        fit_gp(x, y, mesh=mesh, mask=jnp.asarray(m))
    with pytest.raises(ValueError, match="divisible"):
        fit_gp(x[:63], y[:63], mesh=mesh)


def test_fit_gp_mesh_kpls_matches_single_device(mesh):
    """KPLS on the distributed path (ROADMAP r4 parity item): the MLE runs
    in the reduced theta space with replicated PLS rotations — same theta
    and likelihood as the single-device KPLS fit."""
    from egobox_tpu.gp.fit import fit_gp

    x, y = _problem(n=128, d=5, seed=13)
    m_ref = fit_gp(x, y, n_start=0, max_iters=25, kpls_dim=2)
    m_dist = fit_gp(x, y, n_start=0, max_iters=25, kpls_dim=2, mesh=mesh)
    assert m_dist.theta.shape == (2,)
    np.testing.assert_allclose(
        np.asarray(m_dist.theta), np.asarray(m_ref.theta),
        rtol=5e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        float(m_dist.likelihood), float(m_ref.likelihood), rtol=1e-4
    )
