"""Box-constrained L-BFGS (optim/lbfgsb.py), incl. the speculative
parallel line search (ls_batch) and the trust-region variant
(minimize_tr)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egobox_tpu.optim.lbfgsb import (
    minimize_lbfgsb,
    minimize_tr,
    multistart_minimize,
)


def _vg_api(fun):
    """fun_and_res/grad_from_res pair from a plain scalar function."""
    def fun_and_res(x):
        return fun(x), ()

    def grad_from_res(x, res):
        return jax.grad(fun)(x)

    return fun_and_res, grad_from_res


def rosen(x):
    return jnp.sum(
        100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2
    )


@pytest.mark.parametrize("ls_batch", [0, 8])
def test_rosenbrock_box(ls_batch):
    lo = jnp.full(4, -2.0)
    hi = jnp.full(4, 2.0)
    res = minimize_lbfgsb(
        rosen, jnp.full(4, -1.0), lo, hi, max_iters=200, ls_batch=ls_batch
    )
    np.testing.assert_allclose(np.asarray(res.x), np.ones(4), atol=2e-4)


@pytest.mark.parametrize("ls_batch", [0, 8])
def test_active_box_face(ls_batch):
    # unconstrained minimum at (3, 3) is outside the box -> solution pinned
    fun = lambda x: jnp.sum((x - 3.0) ** 2)  # noqa: E731
    lo, hi = jnp.zeros(2), jnp.full(2, 2.0)
    res = minimize_lbfgsb(
        fun, jnp.full(2, 0.5), lo, hi, max_iters=100, ls_batch=ls_batch
    )
    np.testing.assert_allclose(np.asarray(res.x), np.full(2, 2.0), atol=1e-8)


def test_parallel_matches_sequential_on_quadratic():
    """On a well-scaled problem (unit step always accepted) the parallel
    line search must take exactly the same trajectory as sequential
    backtracking (both accept alpha=1 each iteration)."""
    q = jnp.asarray(np.diag([1.0, 4.0, 9.0]))
    fun = lambda x: 0.5 * x @ q @ x  # noqa: E731
    lo, hi = jnp.full(3, -10.0), jnp.full(3, 10.0)
    x0 = jnp.asarray([5.0, -3.0, 2.0])
    r_seq = minimize_lbfgsb(fun, x0, lo, hi, max_iters=60, ls_batch=0)
    r_par = minimize_lbfgsb(fun, x0, lo, hi, max_iters=60, ls_batch=8)
    np.testing.assert_allclose(
        np.asarray(r_seq.x), np.asarray(r_par.x), atol=1e-10
    )
    np.testing.assert_allclose(float(r_seq.fun), float(r_par.fun),
                               atol=1e-12)


def test_multistart_vmap_with_parallel_ls():
    x0s = jnp.asarray(np.random.default_rng(0).uniform(-2, 2, (6, 4)))
    lo, hi = jnp.full(4, -2.0), jnp.full(4, 2.0)
    xb, fb, _ = multistart_minimize(
        rosen, x0s, lo, hi, max_iters=150, ls_batch=8
    )
    assert float(fb) < 1e-6


def test_tr_rosenbrock_box():
    """The trust-region solver reaches the same optimum as the
    line-search solver on the banana (given enough iterations — TR pays
    one eval per iteration, so its iteration count is the line search's
    TRIAL count)."""
    fr, gr = _vg_api(rosen)
    lo, hi = jnp.full(4, -2.0), jnp.full(4, 2.0)
    res = minimize_tr(
        jnp.full(4, -1.0), lo, hi, fun_and_res=fr, grad_from_res=gr,
        max_iters=500,
    )
    np.testing.assert_allclose(np.asarray(res.x), np.ones(4), atol=2e-4)


def test_tr_active_box_face():
    fun = lambda x: jnp.sum((x - 3.0) ** 2)  # noqa: E731
    fr, gr = _vg_api(fun)
    lo, hi = jnp.zeros(2), jnp.full(2, 2.0)
    res = minimize_tr(
        jnp.full(2, 0.5), lo, hi, fun_and_res=fr, grad_from_res=gr,
        max_iters=100,
    )
    np.testing.assert_allclose(np.asarray(res.x), np.full(2, 2.0),
                               atol=1e-6)


def test_tr_polish_economy_on_quadratic():
    """Warm-started polish use case: few iterations from near the optimum
    must make real progress (radius adapts instead of re-probing step
    scale), and the solver is vmappable."""
    q = jnp.asarray(np.diag([1.0, 4.0, 9.0]))
    fun = lambda x: 0.5 * x @ q @ x  # noqa: E731
    fr, gr = _vg_api(fun)
    lo, hi = jnp.full(3, -10.0), jnp.full(3, 10.0)
    x0s = jnp.asarray([[0.3, -0.2, 0.1], [0.05, 0.04, -0.03]])
    res = jax.vmap(
        lambda x0: minimize_tr(
            x0, lo, hi, fun_and_res=fr, grad_from_res=gr, max_iters=6
        )
    )(x0s)
    f0s = jax.vmap(fun)(x0s)
    assert np.all(np.asarray(res.fun) < 0.05 * np.asarray(f0s))


def test_tr_nan_region():
    """Non-finite trials are +inf: rejected, radius shrinks, solver stays
    in the valid region."""
    def fun(x):
        v = jnp.sum((x - 1.0) ** 2)
        return jnp.where(x[0] > 1.5, jnp.nan, v)

    fr, gr = _vg_api(fun)
    lo, hi = jnp.full(2, -3.0), jnp.full(2, 3.0)
    res = minimize_tr(jnp.zeros(2), lo, hi, fun_and_res=fr,
                      grad_from_res=gr, max_iters=120, delta0=2.0)
    assert np.isfinite(float(res.fun))
    np.testing.assert_allclose(np.asarray(res.x), np.ones(2), atol=1e-4)


def test_tr_polish_fit_matches_line_search():
    """fit_gp(polish_tr=True) reaches the line-search polish's likelihood
    on the bench-path recipe in miniature (subsample warm start + few
    polish iterations) — the TR polish must not change the basin, only
    the per-iteration forward count."""
    from egobox_tpu.gp.fit import fit_gp

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(-2.0, 2.0, (900, 4)))
    y = jnp.asarray(
        (np.sum(np.sin(2.0 * np.asarray(x)), axis=1)
         + 0.1 * rng.standard_normal(900))[:, None]
    )
    kw = dict(n_start=1, max_iters=6, nugget=1e-6,
              subsample_warmstart=300, polish_iters=3, seed=2)
    m_ls = fit_gp(x, y, **kw)
    m_tr = fit_gp(x, y, polish_tr=True, **kw)
    lk_ls, lk_tr = float(m_ls.likelihood), float(m_tr.likelihood)
    assert np.isfinite(lk_tr)
    assert lk_tr >= lk_ls - 0.005 * abs(lk_ls), (lk_ls, lk_tr)


def test_nan_objective_region():
    """NaN regions are treated as +inf; the solver stays in the valid
    region (mirrors likelihood-failure robustness)."""
    def fun(x):
        v = jnp.sum((x - 1.0) ** 2)
        return jnp.where(x[0] > 1.5, jnp.nan, v)

    lo, hi = jnp.full(2, -3.0), jnp.full(2, 3.0)
    res = minimize_lbfgsb(fun, jnp.zeros(2), lo, hi, max_iters=100,
                          ls_batch=8)
    assert np.isfinite(float(res.fun))
    np.testing.assert_allclose(np.asarray(res.x), np.ones(2), atol=1e-5)
