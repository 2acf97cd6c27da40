"""Warm-refit multistart width (EgorConfig.warm_refit_n_start).

The cold fit (iter 0) keeps the full n_start width; every warm refit
(iter >= 1) re-seeds only warm_refit_n_start LHS lanes on top of the
carried theta warm starts. The traced run mirrors the boundary by
running the cold fit in its own k=1 first chunk
(fused_run.run_traced), so both paths reduce at the same step.
Measured on v5e (tools/prof_g24_stage2.py): the in-EGO fit is
width-bound — G24/UTB traced 11.1 -> ~24 it/s at held optimum quality.
"""
import numpy as np
import pytest

import egobox_tpu as egx


def xsinx(x):
    x = np.atleast_2d(x)
    return ((x - 3.5) * np.sin((x - 3.5) / np.pi)).reshape(-1, 1)


def xsinx_traced(x):
    import jax.numpy as jnp

    return ((x - 3.5) * jnp.sin((x - 3.5) / jnp.pi)).reshape(-1, 1)


def test_gp_n_start_reduces_after_cold_fit(monkeypatch):
    monkeypatch.setenv("EGOBOX_SHAPE_BUCKET", "4")
    egor = egx.Egor([[0.0, 25.0]], seed=1, n_doe=4)
    solver = egor.solver
    state = solver.init_state(xsinx)
    assert solver.config.shape_bucket == 4
    # cold start (no theta carry yet): full width
    state.iter = 0
    assert solver._gp_n_start(state) == solver.spec.n_start
    # warm refits: reduced width
    state.iter = 1
    assert solver._gp_n_start(state) == 4
    state.iter = 17
    assert solver._gp_n_start(state) == 4


def test_gp_n_start_opt_outs(monkeypatch):
    monkeypatch.setenv("EGOBOX_SHAPE_BUCKET", "4")
    egor = egx.Egor([[0.0, 25.0]], seed=1, n_doe=4,
                    warm_refit_n_start=None)
    solver = egor.solver
    state = solver.init_state(xsinx)
    state.iter = 20
    assert solver._gp_n_start(state) == solver.spec.n_start
    # n_start <= 0 is the fixed-theta convention — never touched
    egor2 = egx.Egor([[0.0, 25.0]], seed=1, n_doe=4,
                     gp_config=egx.GpConfig(n_start=0))
    solver2 = egor2.solver
    state2 = solver2.init_state(xsinx)
    state2.iter = 20
    assert solver2._gp_n_start(state2) == 0


def test_host_and_traced_reduce_at_same_boundary(monkeypatch):
    """With the reduction engaged the host loop and the traced run must
    still land the same optimum: same refit widths at the same
    iterations (the traced run isolates the cold fit in a k=1 chunk)."""
    monkeypatch.setenv("EGOBOX_SHAPE_BUCKET", "4")
    r_host = egx.Egor([[0.0, 25.0]], seed=3, n_doe=4).minimize(
        xsinx, max_iters=10)
    r_traced = egx.Egor(
        [[0.0, 25.0]], seed=3, n_doe=4, traced_run=True
    ).minimize(xsinx_traced, max_iters=10)
    # same stream up to jit-fusion fp noise (CLAUDE.md: never assert
    # bitwise equality across program layouts)
    assert abs(r_host.x_opt[0] - r_traced.x_opt[0]) < 1e-3
    assert abs(r_host.y_opt[0] - r_traced.y_opt[0]) < 1e-6
    assert r_host.x_doe.shape == r_traced.x_doe.shape


def test_warm_refit_quality_held(monkeypatch):
    """10 warm-refit iterations at width 4 still nail the xsinx optimum
    (-15.125 @ 18.935)."""
    monkeypatch.setenv("EGOBOX_SHAPE_BUCKET", "4")
    res = egx.Egor([[0.0, 25.0]], seed=42, n_doe=4).minimize(
        xsinx, max_iters=10)
    assert abs(res.y_opt[0] + 15.125) < 5e-2
