"""Stochastic-trace (Hutchinson) likelihood gradient: estimator accuracy
against the exact analytic adjoint, and end-to-end fit equivalence.

The estimator (gp/likelihood.py _sqexp_dphi_stoch) replaces the exact
O(n^3) trace contraction of the squared-exponential MLE gradient with an
O(n^2 d p) probe evaluation riding the saved Cholesky factor. These tests
pin (a) the estimate converges to the exact contraction, (b) a polish fit
driven by the stochastic gradient reaches the same likelihood as the exact
one, (c) masks and KPLS are handled, (d) the kill-switch works.
(Reference hot loop being accelerated: crates/gp/src/algorithm.rs:879-948.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from egobox_tpu.gp.fit import fit_gp
from egobox_tpu.gp.likelihood import (
    _grad_trace_core,
    reduced_likelihood,
)


def _data(seed, n, d):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-2.0, 2.0, (n, d))
    y = (np.sum(np.sin(2.0 * x), axis=1) + 0.1 * rng.standard_normal(n))[
        :, None
    ]
    return jnp.asarray(x), jnp.asarray(y)


def _norm(x, y):
    xm, xs = jnp.mean(x, axis=0), jnp.std(x, axis=0, ddof=1)
    ym, ys = jnp.mean(y, axis=0), jnp.std(y, axis=0, ddof=1)
    return (x - xm) / xs, (y - ym) / ys, ys


def _grads(n=256, d=4, probes=0, theta_val=0.8, w_star=None, mask=None):
    x, y = _data(0, n, d)
    x_norm, y_norm, y_std = _norm(x, y)
    if mask is not None:
        m = mask.astype(x_norm.dtype)
        x_norm = x_norm * m[:, None]
        y_norm = y_norm * m[:, None]
    dim = d if w_star is None else w_star.shape[1]
    theta = jnp.full((dim,), theta_val)
    nugget = 1e-8
    rlf, inner = reduced_likelihood(
        "squared_exponential", "constant", x_norm, y_norm, y_std, theta,
        w_star, nugget, mask,
    )
    sigma2_norm = inner.sigma2 / (y_std.reshape(()) ** 2)
    return _grad_trace_core(
        "squared_exponential", x_norm, w_star, nugget, mask, theta,
        inner.r_chol, inner.gamma, sigma2_norm, probes,
    )


def test_estimator_converges_to_exact():
    exact = np.asarray(_grads(probes=0))
    est = np.asarray(_grads(probes=1024))
    assert np.linalg.norm(exact) > 0
    rel = np.linalg.norm(est - exact) / np.linalg.norm(exact)
    assert rel < 0.08, (exact, est)
    cos = np.dot(est, exact) / (
        np.linalg.norm(est) * np.linalg.norm(exact)
    )
    assert cos > 0.995


def test_estimator_low_probe_direction():
    """Even a cheap p=64 estimate must give a usable descent direction."""
    exact = np.asarray(_grads(probes=0))
    est = np.asarray(_grads(probes=64))
    cos = np.dot(est, exact) / (
        np.linalg.norm(est) * np.linalg.norm(exact)
    )
    assert cos > 0.9


def test_estimator_masked_padding_invariant():
    """Estimator on a padded design == estimator on the trimmed one: the
    padded block contributes exactly zero (R off-diag pad rows are 0 and
    x_norm pads are pinned to 0)."""
    n, d = 200, 3
    x, y = _data(3, n, d)
    x_norm, y_norm, y_std = _norm(x, y)
    theta = jnp.full((d,), 0.6)
    nugget = 1e-8

    def grad_for(xn, yn, mask):
        if mask is not None:
            m = mask.astype(xn.dtype)
            xn = xn * m[:, None]
            yn = yn * m[:, None]
        rlf, inner = reduced_likelihood(
            "squared_exponential", "constant", xn, yn, y_std, theta,
            None, nugget, mask,
        )
        s2 = inner.sigma2 / (y_std.reshape(()) ** 2)
        return _grad_trace_core(
            "squared_exponential", xn, None, nugget, mask, theta,
            inner.r_chol, inner.gamma, s2, 128,
        )

    # trimmed: first 160 rows, no mask; padded: all 200 rows, mask[160:]=0.
    # x/y normalization must match, so normalize on the 160 active rows.
    xa, ya = x[:160], y[:160]
    xan, yan, ys_a = _norm(xa, ya)
    g_trim = grad_for(xan, yan, None)
    mask = jnp.arange(n) < 160
    x_pad = jnp.concatenate([xan, jnp.zeros((40, d))], axis=0)
    y_pad = jnp.concatenate([yan, jnp.zeros((40, 1))], axis=0)
    y_std = ys_a
    g_pad = grad_for(x_pad, y_pad, mask)
    np.testing.assert_allclose(
        np.asarray(g_pad), np.asarray(g_trim), rtol=1e-5, atol=1e-8
    )


def test_estimator_kpls_projection():
    d, ncomp = 6, 2
    rng = np.random.default_rng(5)
    w_star = jnp.asarray(
        np.linalg.qr(rng.standard_normal((d, ncomp)))[0]
    )
    exact = np.asarray(_grads(d=d, probes=0, w_star=w_star))
    est = np.asarray(_grads(d=d, probes=1024, w_star=w_star))
    rel = np.linalg.norm(est - exact) / max(np.linalg.norm(exact), 1e-12)
    # the projected contraction has a smaller |s| against the same probe
    # variance, so the relative band is wider than the identity case
    assert rel < 0.25
    cos = np.dot(est, exact) / (
        np.linalg.norm(est) * np.linalg.norm(exact)
    )
    assert cos > 0.98


def test_kill_switch(monkeypatch):
    monkeypatch.setenv("EGOBOX_NO_STOCH_GRAD", "1")
    exact = np.asarray(_grads(probes=0))
    forced = np.asarray(_grads(probes=8))  # p=8 would be visibly off
    np.testing.assert_allclose(forced, exact, rtol=1e-6)


def test_fit_quality_with_stochastic_polish():
    """fit_gp(grad_probes=...) must reach the exact-gradient fit's
    likelihood within a small tolerance on a subsample+polish recipe —
    the bench-path configuration in miniature."""
    x, y = _data(11, 900, 4)
    kw = dict(
        n_start=1, max_iters=6, nugget=1e-6,
        subsample_warmstart=300, polish_iters=3, seed=2,
    )
    m_exact = fit_gp(x, y, **kw)
    m_stoch = fit_gp(x, y, grad_probes=64, **kw)
    lk_e = float(m_exact.likelihood)
    lk_s = float(m_stoch.likelihood)
    assert np.isfinite(lk_s)
    # same basin, near-identical optimum
    assert lk_s >= lk_e - 0.005 * abs(lk_e), (lk_e, lk_s)


def test_grad_probes_ignored_for_matern():
    """Non-sqexp kernels must silently take the exact path."""
    x, y = _data(7, 300, 3)
    m = fit_gp(x, y, corr="matern52", n_start=1, max_iters=5,
               nugget=1e-6, grad_probes=32)
    assert np.isfinite(float(m.likelihood))


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-v"]))
