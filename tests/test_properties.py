"""Property-based tests (hypothesis): invariants that hold for ANY input,
per ROADMAP robustness items."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from egobox_tpu.ego.mixint import MixintContext
from egobox_tpu.types import XSpec, XType


@st.composite
def xspec_lists(draw):
    n = draw(st.integers(min_value=1, max_value=5))
    specs = []
    for _ in range(n):
        kind = draw(st.sampled_from(["float", "int", "ord", "enum"]))
        if kind == "float":
            lo = draw(st.floats(-100, 100))
            width = draw(st.floats(0.1, 100))
            specs.append(XSpec(XType.FLOAT, [lo, lo + width]))
        elif kind == "int":
            lo = draw(st.integers(-50, 50))
            specs.append(XSpec(XType.INT, [lo, lo + draw(
                st.integers(1, 20))]))
        elif kind == "ord":
            vals = sorted(draw(st.lists(
                st.integers(-20, 20), min_size=2, max_size=6, unique=True)))
            specs.append(XSpec(XType.ORD, vals))
        else:
            specs.append(XSpec(XType.ENUM, xlimits=[draw(
                st.integers(2, 5))]))
    return specs


@given(xspec_lists(), st.integers(0, 2**31 - 1))
@settings(max_examples=50, deadline=None)
def test_mixint_fold_unfold_roundtrip(specs, seed):
    """fold(cast(unfold(x_folded))) == x_folded for any valid folded point
    (ref invariant of gpmix/mixint.rs fold/unfold/cast)."""
    ctx = MixintContext(specs)
    rng = np.random.default_rng(seed)
    # build a valid folded point
    row = []
    for s in specs:
        if s.xtype is XType.FLOAT:
            row.append(rng.uniform(s.xlimits[0], s.xlimits[1]))
        elif s.xtype is XType.INT:
            row.append(float(rng.integers(s.xlimits[0], s.xlimits[1] + 1)))
        elif s.xtype is XType.ORD:
            row.append(float(rng.choice([float(v) for v in s.xlimits])))
        else:
            row.append(float(rng.integers(0, s.n_levels)))
    x = np.array([row])

    x_cont = ctx.to_continuous_space(x)
    assert x_cont.shape == (1, ctx.n_continuous)
    back = ctx.to_discrete_space(x_cont)
    np.testing.assert_allclose(back, x, atol=1e-12)


@given(xspec_lists(), st.integers(0, 2**31 - 1))
@settings(max_examples=25, deadline=None)
def test_mixint_cast_idempotent(specs, seed):
    """cast(cast(x)) == cast(x) for any continuous point."""
    ctx = MixintContext(specs)
    rng = np.random.default_rng(seed)
    lim = ctx.continuous_xlimits()
    x = rng.uniform(lim[:, 0], lim[:, 1], size=(3, lim.shape[0]))
    c1 = ctx.cast_continuous(x)
    c2 = ctx.cast_continuous(c1)
    np.testing.assert_allclose(c2, c1, atol=1e-12)


@given(st.integers(2, 30), st.integers(1, 4), st.integers(0, 2**31 - 1))
@settings(max_examples=20, deadline=None)
@pytest.mark.slow
def test_lhs_latin_invariant(ns, nx, seed):
    """Classic LHS places exactly one point per stratum per column for any
    (ns, nx, seed)."""
    import jax

    from egobox_tpu import doe

    x = np.asarray(doe.classic_lhs(jax.random.key(seed), ns, nx))
    assert np.all((x >= 0) & (x <= 1))
    for j in range(nx):
        bins = np.clip(np.floor(x[:, j] * ns).astype(int), 0, ns - 1)
        assert sorted(bins.tolist()) == list(range(ns))
