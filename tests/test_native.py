"""Native C++ derivative-free optimizer tests (role parity with the
reference's COBYLA crates)."""

import numpy as np
import pytest

from egobox_tpu.native import minimize_dfo_constrained, nelder_mead


def test_quadratic():
    x, f, n = nelder_mead(
        lambda x: float(np.sum((x - 0.3) ** 2)),
        np.zeros(3), -np.ones(3), np.ones(3),
    )
    np.testing.assert_allclose(x, 0.3, atol=1e-4)
    assert f < 1e-7
    assert n > 0


def test_rosenbrock_2d():
    def rosen(x):
        return float(100 * (x[1] - x[0] ** 2) ** 2 + (1 - x[0]) ** 2)

    x, f, _ = nelder_mead(rosen, np.array([-1.2, 1.0]),
                          np.array([-5.0, -5.0]), np.array([5.0, 5.0]),
                          max_eval=4000)
    np.testing.assert_allclose(x, [1.0, 1.0], atol=1e-3)


def test_box_active():
    """Optimum outside the box -> solution sits on the bound."""
    x, f, _ = nelder_mead(
        lambda x: float(np.sum((x - 2.0) ** 2)),
        np.zeros(2), -np.ones(2), np.ones(2),
    )
    np.testing.assert_allclose(x, 1.0, atol=1e-6)


def test_constrained():
    """min x0+x1 s.t. 1 - x0 <= 0, i.e. x0 >= 1."""
    x, f = minimize_dfo_constrained(
        lambda x: float(x[0] + x[1]),
        [lambda x: 1.0 - x[0]],
        np.array([2.0, 2.0]), np.zeros(2), 3 * np.ones(2),
        max_eval=2000,
    )
    np.testing.assert_allclose(x[0], 1.0, atol=1e-2)
    np.testing.assert_allclose(x[1], 0.0, atol=1e-2)


def test_objective_exception_propagates():
    def bad(x):
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        nelder_mead(bad, np.zeros(2), -np.ones(2), np.ones(2), max_eval=50)
