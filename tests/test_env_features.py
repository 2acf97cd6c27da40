"""Env-gated feature tests (ref: crates/ego/src/utils/mod.rs:22-48 env
flags: portfolio, middle-picker kill-switch, feasibility-first,
recorders)."""

import json
import os

import numpy as np
import pytest

from egobox_tpu.ego import Egor
from egobox_tpu.ego.portfolio import (
    SIGMA_WEIGHTS,
    dbscan_labels,
    logspace,
    select_from_portfolio,
)


def xsinx(x):
    x = np.atleast_2d(x)
    return ((x - 3.5) * np.sin((x - 3.5) / np.pi)).reshape(-1, 1)


def test_logspace_endpoints():
    vals = logspace(0.1, 100.0, 5)
    assert abs(vals[0] - 0.1) < 1e-12
    assert abs(vals[-1] - 100.0) < 1e-12


def test_sigma_weights_table():
    # logspace(0.1, 100, 13) with 1.0 moved in front (solver_impl.rs:588)
    assert SIGMA_WEIGHTS[0] == 1.0
    assert len(SIGMA_WEIGHTS) == 13
    rest = sorted(SIGMA_WEIGHTS[1:])
    np.testing.assert_allclose(
        rest, sorted(set(logspace(0.1, 100, 13)) - {1.0} | {0.1, 100.0})[:12],
        rtol=1e-9,
    )


def test_dbscan_clusters_and_noise():
    x = np.array([[0.0], [0.1], [0.2], [5.0], [5.1], [20.0]])
    labels = dbscan_labels(x, eps=0.5, min_pts=2)
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4]
    assert labels[0] != labels[3]
    assert labels[5] is None  # noise
    reps = select_from_portfolio(x)
    assert len(reps) == 2


def test_portfolio_env(monkeypatch):
    monkeypatch.setenv("EGOR_USE_GP_VAR_PORTFOLIO", "1")
    egor = Egor([[0.0, 25.0]], seed=42)
    res = egor.minimize(xsinx, max_iters=6)
    # portfolio may add several points per iteration
    assert res.x_doe.shape[0] >= 5 + 6
    assert res.y_opt[0] < -14.0


@pytest.mark.slow
def test_middlepicker_killswitch(monkeypatch):
    monkeypatch.setenv("EGOR_DO_NOT_USE_MIDDLEPICKER_MULTISTARTER", "1")
    egor = Egor([[0.0, 25.0]], seed=42)
    res = egor.minimize(xsinx, max_iters=10)
    assert res.y_opt[0] < -14.0


@pytest.mark.slow
def test_feasibility_first(monkeypatch):
    """With no feasible point, the infill maximizes PoF first
    (EGOR_USE_MAX_PROBA_OF_FEASIBILITY)."""
    monkeypatch.setenv("EGOR_USE_MAX_PROBA_OF_FEASIBILITY", "1")

    def prob(x):
        p = np.atleast_2d(x)
        obj = p[:, 0]
        # feasible only near x >= 20 (most of the initial DoE infeasible)
        cstr = 20.0 - p[:, 0]
        return np.stack([obj, cstr], axis=1)

    egor = Egor([[0.0, 25.0]], n_cstr=1, seed=0, n_doe=4,
                doe=np.array([[1.0], [5.0], [10.0], [15.0]]))
    res = egor.minimize(prob, max_iters=10)
    # must have discovered the feasible region
    assert np.any(res.y_doe[:, 1] <= 1e-3)
