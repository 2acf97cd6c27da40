"""Infill criteria tests: LogEI helper goldens (trieste-derived constants,
ref: logei_helper.rs tests), analytic-vs-fdiff gradients, EI/PoF sanity."""

import jax
import jax.numpy as jnp
import numpy as np

from egobox_tpu.ego.criteria import (
    ei,
    log_ei,
    log_ei_helper,
    log_pof,
    pof,
    wb2,
)


def test_log_ei_helper_goldens():
    """Values from the trieste implementation (logei_helper.rs:75-84)."""
    vals = jnp.array([-2.0, -1.0, 0.0, 1.0, 2.0])
    expected = [-4.7687836, -2.4851208, -0.9189385, 0.08002624, 0.69738346]
    got = log_ei_helper(vals)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-6)


def test_log_ei_helper_grad_vs_fdiff():
    """(ref: logei_helper.rs test_d_log_ei, atol 1e-3 over [-10, 10])"""
    xs = np.linspace(-10.0, 10.0, 100)
    g = jax.vmap(jax.grad(log_ei_helper))(jnp.asarray(xs))
    eps = 1e-6
    fd = (log_ei_helper(jnp.asarray(xs + eps))
          - log_ei_helper(jnp.asarray(xs - eps))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), np.asarray(fd), atol=1e-3)


def test_log_ei_helper_extreme_negative():
    # must stay finite and monotone far into the left tail
    vals = jnp.array([-50.0, -1e3, -1e7])
    got = np.asarray(log_ei_helper(vals))
    assert np.all(np.isfinite(got))
    assert got[0] > got[1] > got[2]


def test_log_ei_consistent_with_ei():
    mean, var, fmin = 0.3, 0.5, 0.1
    v_ei = float(ei(mean, var, fmin))
    v_log = float(log_ei(mean, var, fmin))
    np.testing.assert_allclose(np.log(v_ei), v_log, rtol=1e-10)


def test_ei_zero_at_training_point():
    assert float(ei(0.5, 0.0, 1.0)) == 0.0
    assert float(log_ei(0.5, 0.0, 1.0)) == -700.0


def test_ei_grad_vs_fdiff():
    fmin = 0.1

    def f(z):
        mean = z[0]
        var = jnp.abs(z[1])
        return ei(mean, var, fmin)

    z0 = jnp.array([0.4, 0.3])
    g = jax.grad(f)(z0)
    eps = 1e-6
    for k in range(2):
        e = jnp.zeros(2).at[k].set(eps)
        fd = (f(z0 + e) - f(z0 - e)) / (2 * eps)
        np.testing.assert_allclose(float(g[k]), float(fd), rtol=1e-5)


def test_pof():
    # mean far below tol with small var -> certainly feasible
    assert float(pof(-10.0, 0.01, 0.0)) > 0.999
    # mean far above tol -> infeasible
    assert float(pof(10.0, 0.01, 0.0)) < 1e-6
    # zero variance -> 0 by convention (ref: cstr_pof.rs:15-21)
    assert float(pof(-1.0, 0.0, 0.0)) == 0.0
    np.testing.assert_allclose(
        float(log_pof(0.5, 1.0, 0.0)), np.log(float(pof(0.5, 1.0, 0.0))),
        rtol=1e-10,
    )


def test_wb2():
    mean, var, fmin = 0.4, 0.2, 0.1
    v = float(wb2(mean, var, fmin, scale=2.0))
    np.testing.assert_allclose(v, 2.0 * float(ei(mean, var, fmin)) - mean,
                               rtol=1e-12)
