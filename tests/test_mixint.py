"""Mixed-integer Egor tests (ref: python/egobox/tests/test_mixintegor.py)."""

import numpy as np
import pytest

import egobox_tpu as egx
from egobox_tpu.ego import Egor, MixintContext
from egobox_tpu.types import XSpec, XType


def xsinx(x):
    x = np.atleast_2d(x)
    return ((x - 3.5) * np.sin((x - 3.5) / np.pi)).reshape(-1, 1)


def mixobj(X):
    x1 = X[:, 0]
    c1 = X[:, 1]
    x2, x3, x4 = c1 == 0, c1 == 1, c1 == 2
    c2 = X[:, 2]
    x5, x6 = c2 == 0, c2 == 1
    i = X[:, 3]
    y = ((x2 + 2 * x3 + 3 * x4) * x5 * x1
         + (x2 + 2 * x3 + 3 * x4) * x6 * 0.95 * x1 + i)
    return y.reshape(-1, 1)


def test_mixint_context_roundtrip():
    specs = [
        XSpec(XType.FLOAT, [-5.0, 5.0]),
        XSpec(XType.ENUM, tags=["blue", "red", "green"]),
        XSpec(XType.ENUM, xlimits=[2]),
        XSpec(XType.ORD, [0, 2, 3]),
    ]
    ctx = MixintContext(specs)
    assert ctx.n_folded == 4
    assert ctx.n_continuous == 1 + 3 + 2 + 1
    lim = ctx.continuous_xlimits()
    assert lim.shape == (7, 2)
    np.testing.assert_allclose(lim[0], [-5.0, 5.0])
    np.testing.assert_allclose(lim[6], [0.0, 3.0])

    x_folded = np.array([[1.5, 2.0, 0.0, 2.0]])
    x_cont = ctx.to_continuous_space(x_folded)
    assert x_cont.shape == (1, 7)
    np.testing.assert_allclose(x_cont[0], [1.5, 0, 0, 1, 1, 0, 2.0])
    back = ctx.to_discrete_space(x_cont)
    np.testing.assert_allclose(back, x_folded)


def test_mixint_casting():
    specs = [
        XSpec(XType.INT, [0, 10]),
        XSpec(XType.ORD, [0, 2, 3]),
    ]
    ctx = MixintContext(specs)
    x = np.array([[3.7, 2.6]])
    casted = ctx.cast_continuous(x)
    np.testing.assert_allclose(casted, [[4.0, 3.0]])


def test_int_xsinx():
    """INT variable optimum: y=-15.125±5e-3 at x=19±1
    (test_mixintegor.py test_int)."""
    egor = Egor(
        [XSpec(XType.INT, [0.0, 25.0])],
        infill_strategy=egx.InfillStrategy.EI,
        seed=42,
        doe=np.array([[0.0], [7.0], [25.0]]),
    )
    res = egor.minimize(xsinx, max_iters=10)
    assert abs(res.y_opt[0] - (-15.125)) < 5e-3
    assert abs(res.x_opt[0] - 19) <= 1


@pytest.mark.slow
def test_ord_enum_mixobj():
    """Mixed ORD/ENUM problem (test_mixintegor.py:52-65). The reference
    golden is y=-14.25 at (-5, green, enum1, 0), but the true lattice
    optimum is y=-15 at (-5, green, enum0, 0) — we assert match-or-beat."""
    xtypes = [
        XSpec(XType.FLOAT, [-5.0, 5.0]),
        XSpec(XType.ENUM, tags=["blue", "red", "green"]),
        XSpec(XType.ENUM, xlimits=[2]),
        XSpec(XType.ORD, [0, 2, 3]),
    ]
    egor = Egor(xtypes, infill_strategy=egx.InfillStrategy.WB2, seed=42)
    res = egor.minimize(mixobj, max_iters=20)
    assert res.y_opt[0] <= -14.25
    assert abs(res.x_opt[0] - (-5)) < 1e-9
    assert res.x_opt[1] == 2  # "green"
    assert res.x_opt[3] == 0
