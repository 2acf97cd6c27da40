"""DoE tests modeled on crates/doe/src tests (tolerance-based; goldens are
re-pinned for the threefry RNG per SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egobox_tpu import doe
from egobox_tpu.doe.lhs import LhsKind


def _check_lhs_structure(x, ns):
    """Every column must place exactly one point in each of ns strata."""
    for j in range(x.shape[1]):
        bins = np.floor(np.asarray(x[:, j]) * ns).astype(int)
        bins = np.clip(bins, 0, ns - 1)
        assert sorted(bins.tolist()) == list(range(ns))


@pytest.mark.parametrize(
    "kind",
    [LhsKind.CLASSIC, LhsKind.CENTERED, LhsKind.MAXIMIN,
     LhsKind.CENTERED_MAXIMIN, LhsKind.OPTIMIZED],
)
def test_lhs_is_latin(kind):
    key = jax.random.key(42)
    x = doe.lhs_normalized(key, 10, 3, kind)
    assert x.shape == (10, 3)
    assert jnp.all((x >= 0) & (x <= 1))
    _check_lhs_structure(x, 10)


def test_lhs_deterministic_under_key():
    key = jax.random.key(7)
    a = doe.lhs_normalized(key, 8, 2, LhsKind.OPTIMIZED)
    b = doe.lhs_normalized(key, 8, 2, LhsKind.OPTIMIZED)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_optimized_improves_maximin_criterion():
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    classic = doe.classic_lhs(k1, 20, 2)
    opt = doe.optimized_lhs(k1, 20, 2)
    # ESE optimization should not produce a worse min-distance design than
    # the classic draw it starts from
    assert float(doe.min_pdist_sq(opt)) >= float(doe.min_pdist_sq(classic))
    del k2


def test_lhs_scaling():
    xlimits = jnp.array([[5.0, 10.0], [-3.0, 3.0]])
    lhs = doe.Lhs(xlimits, kind=LhsKind.CLASSIC, seed=42)
    x = lhs.sample(12)
    assert x.shape == (12, 2)
    assert jnp.all(x[:, 0] >= 5.0) and jnp.all(x[:, 0] <= 10.0)
    assert jnp.all(x[:, 1] >= -3.0) and jnp.all(x[:, 1] <= 3.0)


def test_full_factorial():
    x = doe.full_factorial_normalized(9, 2)
    assert x.shape == (9, 2)
    # 3x3 grid expected for ns=9, nx=2
    np.testing.assert_allclose(
        np.unique(np.asarray(x[:, 0])), [0.0, 0.5, 1.0], atol=1e-12
    )


def test_full_factorial_truncates():
    x = doe.full_factorial_normalized(7, 2)
    assert x.shape == (7, 2)


def test_random():
    xlimits = jnp.array([[0.0, 1.0], [0.0, 1.0], [0.0, 1.0]])
    r = doe.Random(xlimits, seed=1)
    x = r.sample(50)
    assert x.shape == (50, 3)
    assert jnp.all((x >= 0) & (x <= 1))


def test_pdist_cdist():
    x = jnp.array([[0.0, 0.0], [3.0, 4.0], [0.0, 1.0]])
    d = doe.pdist(x)
    np.testing.assert_allclose(
        np.asarray(d), [5.0, 1.0, np.sqrt(18.0)], rtol=1e-12
    )
    c = doe.cdist(x[:1], x)
    np.testing.assert_allclose(np.asarray(c), [[0.0, 5.0, 1.0]], atol=1e-12)
