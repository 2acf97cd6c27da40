"""MoE surrogate-path state: clustering checkpointing and q_optmod
hyperparameter reuse (ref: egor_state.rs:25-105 clusterings serde,
solver_impl.rs:643-645 theta reuse)."""

import json

import numpy as np
import pytest

from egobox_tpu.ego.config import EgorConfig, GpConfig
from egobox_tpu.ego.solver import EgorSolver
from egobox_tpu.ego.state import EgorState
from egobox_tpu.types import Recombination


def _f(x):
    x = np.atleast_2d(x)
    return (np.sin(x[:, 0]) + 0.3 * x[:, 0]).reshape(-1, 1)


@pytest.fixture(scope="module")
def moe_solver_state():
    cfg = EgorConfig(
        gp_config=GpConfig(n_clusters=2, n_start=3),
        seed=0,
    )
    solver = EgorSolver(cfg, np.array([[0.0, 12.0]]))
    state = solver.init_state(_f)
    # populate clusterings + moe_params via a real training pass
    models = solver._train_moe(state, state.x_data, state.y_data,
                               optimize_theta=True)
    return solver, state, models


def test_clusterings_checkpoint_roundtrip(moe_solver_state):
    """Hot-start resume must restore the identical clustering (gmx) without
    retraining it."""
    _, state, _ = moe_solver_state
    assert state.clusterings is not None and len(state.clusterings) == 1
    payload = json.loads(json.dumps(state.to_dict()))
    restored = EgorState.from_dict(payload)

    g0, r0 = state.clusterings[0]
    g1, r1 = restored.clusterings[0]
    assert r1 is r0
    np.testing.assert_allclose(np.asarray(g1.weights),
                               np.asarray(g0.weights), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g1.means),
                               np.asarray(g0.means), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g1.precisions_chol),
                               np.asarray(g0.precisions_chol), rtol=1e-12)
    assert restored.moe_params == state.moe_params


def test_q_optmod_reuses_fixed_thetas(moe_solver_state):
    """On a q_optmod skip iteration the experts are refit at the PREVIOUS
    (trend, corr, theta) — thetas must come out exactly equal."""
    solver, state, _ = moe_solver_state
    stored = [list(p) for p in state.moe_params]

    # more data, same clustering, optimize_theta=False -> fixed reuse
    x_new = np.vstack([state.x_data, [[6.1], [7.3]]])
    y_new = np.vstack([state.y_data, _f(np.array([[6.1], [7.3]]))])
    models = solver._train_moe(state, x_new, y_new, optimize_theta=False)

    for k, model in enumerate(models):
        for c, expert in enumerate(model.experts):
            trend, corr, theta = stored[k][c]
            assert expert.trend == trend and expert.corr == corr
            np.testing.assert_allclose(
                np.asarray(expert.theta), np.asarray(theta), rtol=1e-12,
                err_msg="skip iteration must reuse fixed thetas",
            )


def test_recluster_reoptimizes(moe_solver_state):
    """After a reclustering trigger the thetas are re-optimized (not pinned
    to the stale values)."""
    solver, state, _ = moe_solver_state
    state.clusterings = None  # force recluster
    rng = np.random.default_rng(5)
    x_new = np.sort(rng.uniform(0, 12, (30, 1)), axis=0)
    y_new = _f(x_new)
    models = solver._train_moe(state, x_new, y_new, optimize_theta=True)
    assert state.clusterings is not None
    assert all(len(m.experts) >= 1 for m in models)
    assert state.clusterings[0][1] in (Recombination.HARD,
                                       Recombination.SMOOTH)


def test_sparse_expert_mixture_roundtrip(tmp_path):
    """Save/load parity across ALL expert types (VERDICT r2 item 6): a
    mixture holding sparse-GP experts serializes with the typed expert
    registry (ref typetag registry, crates/moe/src/surrogates.rs:266-422)
    and predicts identically after a JSON and a binary round trip."""
    import numpy as np

    from egobox_tpu.api import Gpx
    from egobox_tpu.gp.sgp import SgpModel
    from egobox_tpu.moe.moe import train_moe

    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0, 12, (80, 1)), axis=0)
    y = _f(x).ravel()
    mix = train_moe(
        x, y, n_clusters=2, gp_type="sparse", n_inducing=15, n_start=3,
        seed=0,
    )
    assert any(isinstance(e, SgpModel) for e in mix.experts)
    gpx = Gpx(mix, (x, y[:, None]))
    xq = rng.uniform(0, 12, (20, 1))
    ref = gpx.predict(xq)

    for name in ("m.json", "m.bin"):
        path = str(tmp_path / name)
        assert gpx.save(path)
        loaded = Gpx.load(path)
        np.testing.assert_allclose(
            loaded.predict(xq), ref, rtol=1e-8, atol=1e-10
        )
        assert any(
            isinstance(e, SgpModel) for e in loaded._mixture.experts
        )
