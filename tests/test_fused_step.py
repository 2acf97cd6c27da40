"""Fused single-program EGO iteration (ego/fused_step.py).

The fused fast path must propose the same points as the unfused
phase-per-program path: both consume the rng/key streams in the same order,
so with a fixed seed the proposals agree to float tolerance.
"""

import numpy as np
import pytest

from egobox_tpu.ego.config import EgorConfig, GpConfig
from egobox_tpu.ego.solver import EgorSolver


def xsinx(x):
    x = np.atleast_2d(x)
    return ((x - 3.5) * np.sin((x - 3.5) / np.pi)).reshape(-1, 1)


def g24(x):
    x = np.atleast_2d(x)
    f = -x[:, 0] - x[:, 1]
    g1 = -2.0 * x[:, 0] ** 4 + 8.0 * x[:, 0] ** 3 - 8.0 * x[:, 0] ** 2 + x[:, 1] - 2.0
    g2 = -4.0 * x[:, 0] ** 4 + 32.0 * x[:, 0] ** 3 - 88.0 * x[:, 0] ** 2 + 96.0 * x[:, 0] + x[:, 1] - 36.0
    return np.stack([f, g1, g2], axis=1)


def _one_step_points(monkeypatch, fused: bool, n_cstr: int = 0):
    if fused:
        monkeypatch.delenv("EGOBOX_NO_FUSED_STEP", raising=False)
    else:
        monkeypatch.setenv("EGOBOX_NO_FUSED_STEP", "1")
    cfg = EgorConfig(
        seed=7, n_cstr=n_cstr, n_start=4,
        gp_config=GpConfig(n_start=2, max_eval=10),
    )
    if n_cstr:
        xlimits = np.array([[0.0, 3.0], [0.0, 4.0]])
        fobj = g24
    else:
        xlimits = np.array([[0.0, 25.0]])
        fobj = xsinx
    solver = EgorSolver(cfg, xlimits)
    state = solver.init_state(fobj)
    x_dat, _, infill = solver.select_next_points(state)
    return np.asarray(x_dat), infill


def test_fused_matches_unfused_unconstrained(monkeypatch):
    x_f, v_f = _one_step_points(monkeypatch, fused=True)
    x_u, v_u = _one_step_points(monkeypatch, fused=False)
    assert np.allclose(x_f, x_u, atol=1e-6)
    assert np.isclose(v_f, v_u, rtol=1e-5, atol=1e-8)


def test_fused_matches_unfused_constrained(monkeypatch):
    x_f, _ = _one_step_points(monkeypatch, fused=True, n_cstr=2)
    x_u, _ = _one_step_points(monkeypatch, fused=False, n_cstr=2)
    assert np.allclose(x_f, x_u, atol=1e-5)


def test_fused_xsinx_golden():
    """The fused path is the default route for Egor.minimize on plain GP
    problems — it must still hit the xsinx golden (BASELINE.md)."""
    from egobox_tpu import Egor

    egor = Egor([[0.0, 25.0]], seed=42)
    res = egor.minimize(xsinx, max_iters=20)
    assert res.y_opt[0] == pytest.approx(-15.125, abs=1e-3)
    assert res.x_opt[0] == pytest.approx(18.935, abs=1e-2)


def test_fast_path_gating(monkeypatch):
    """MoE/CoEGO/portfolio configurations keep the general path; since
    round 3 traceable fcstrs and q_points > 1 ride the fused program."""
    xlimits = np.array([[0.0, 25.0]])
    s = EgorSolver(EgorConfig(seed=1), xlimits)
    assert s._fast_path_ok(())
    # jax-traceable constraint: enters the fused in-program optimizer
    assert s._fast_path_ok((lambda x: x[0] - 18.0,))
    # host-bound constraint (float() forces a concrete value): fallback
    assert not s._fast_path_ok((lambda x: float(np.asarray(x)[0]),))
    # explicit kill-switch for fcstr tracing
    monkeypatch.setenv("EGOBOX_NO_FCSTR_TRACE", "1")
    s_kill = EgorSolver(EgorConfig(seed=1), xlimits)
    assert not s_kill._fast_path_ok((lambda x: x[0] - 18.0,))
    monkeypatch.delenv("EGOBOX_NO_FCSTR_TRACE")
    # q_points > 1 is fused now — except under the GP recorder (the q scan
    # returns thetas, not full models)
    s2 = EgorSolver(EgorConfig(seed=1, q_points=2), xlimits)
    assert s2._fast_path_ok(())
    monkeypatch.setenv("EGOR_USE_GP_RECORDER", "1")
    assert not s2._fast_path_ok(())
    monkeypatch.delenv("EGOR_USE_GP_RECORDER")
    s3 = EgorSolver(
        EgorConfig(seed=1, gp_config=GpConfig(n_clusters=0)), xlimits
    )
    assert not s3._fast_path_ok(())
    s4 = EgorSolver(EgorConfig(seed=1, coego_n_coop=4), xlimits)
    assert not s4._fast_path_ok(())
    monkeypatch.setenv("EGOBOX_NO_FUSED_STEP", "1")
    assert not s._fast_path_ok(())


def test_fused_traceable_fcstr():
    """A jax-traceable user constraint enters the fused in-program
    optimizer as a hard constraint (round-3 widening; ref CstrFn
    threading, optimizers/optimizer.rs:122-223). Constrained optimum of
    xsinx s.t. x <= 18."""
    from egobox_tpu import Egor

    def cstr(x):
        return x[0] - 18.0  # traceable: no float()/numpy coercion

    egor = Egor([[0.0, 25.0]], seed=42)
    solver = egor.solver
    assert solver._fast_path_ok((cstr,))
    res = egor.minimize(xsinx, fcstrs=[cstr], max_iters=15)
    true_y = float(xsinx(np.array([[18.0]]))[0, 0])
    assert res.x_opt[0] <= 18.0 + 1e-3
    assert abs(res.y_opt[0] - true_y) < 0.5


def test_fused_qei_one_dispatch(monkeypatch):
    """q_points=2 rides the fused scan: one select_next_points call
    returns 2 distinct in-box proposals with virtual outputs."""
    cfg = EgorConfig(
        seed=7, q_points=2, n_start=4,
        gp_config=GpConfig(n_start=2, max_eval=10),
    )
    xlimits = np.array([[0.0, 25.0]])
    solver = EgorSolver(cfg, xlimits)
    state = solver.init_state(xsinx)
    x_dat, y_dat, _ = solver.select_next_points(state)
    assert x_dat.shape == (2, 1)
    assert y_dat.shape[0] == 2
    assert np.all(x_dat >= 0.0) and np.all(x_dat <= 25.0)
    assert abs(x_dat[0, 0] - x_dat[1, 0]) > 1e-8
    assert np.all(np.isfinite(y_dat))


@pytest.mark.slow
def test_g24_with_traceable_fcstrs():
    """Reference accuracy golden solved entirely via USER function
    constraints (ref: test_egor.py test_g24_with_fcstrs — the objective
    is bare, both constraints are fcstrs): the traceable constraints
    enter the fused in-program optimizer and must reach the constrained
    optimum -5.508 at (2.3295, 3.1785)."""
    from egobox_tpu import Egor

    def g24_bare(point):
        p = np.atleast_2d(point)
        return (-p[:, 0] - p[:, 1]).reshape(-1, 1)

    def g24_c1(x):
        return (-2.0 * x[0] ** 4 + 8.0 * x[0] ** 3 - 8.0 * x[0] ** 2
                + x[1] - 2.0)

    def g24_c2(x):
        return (-4.0 * x[0] ** 4 + 32.0 * x[0] ** 3 - 88.0 * x[0] ** 2
                + 96.0 * x[0] + x[1] - 36.0)

    n_doe, max_iters = 5, 20
    egor = Egor(
        [[0.0, 3.0], [0.0, 4.0]], seed=42, q_optmod=2, n_doe=n_doe,
    )
    assert egor.solver._fast_path_ok((g24_c1, g24_c2))
    res = egor.minimize(g24_bare, fcstrs=[g24_c1, g24_c2],
                        max_iters=max_iters)
    assert res.y_opt[0] == pytest.approx(-5.5080, abs=5e-2)
    assert res.x_opt[0] == pytest.approx(2.3295, abs=5e-2)
    assert res.x_opt[1] == pytest.approx(3.1785, abs=5e-2)
    assert res.x_doe.shape == (n_doe + max_iters, 2)
    assert res.y_doe.shape == (n_doe + max_iters, 1)
