"""Box-constrained L-BFGS (optim/lbfgsb.py), incl. the speculative
parallel line search (ls_batch)."""

import jax.numpy as jnp
import numpy as np
import pytest

from egobox_tpu.optim.lbfgsb import minimize_lbfgsb, multistart_minimize


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
