"""Pallas correlation-Gram kernel: correctness vs the XLA path
(interpret mode on CPU; the compiled kernel is exercised on real TPU by
bench/perf runs)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from egobox_tpu.gp.kernels import corr_cross
from egobox_tpu.ops import pallas_corr as pc


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    # the module call site binds pl.pallas_call at call time, so patching
    # the pl module attribute is enough
    monkeypatch.setattr(
        pc.pl, "pallas_call",
        functools.partial(pl.pallas_call, interpret=True),
    )


@pytest.mark.parametrize(
    "name", ["matern52", "matern32", "absolute_exponential"]
)
def test_pallas_gram_matches_xla(name):
    n1, n2, d = 300, 200, 4
    x1 = jax.random.uniform(jax.random.key(0), (n1, d), dtype=jnp.float32)
    x2 = jax.random.uniform(jax.random.key(1), (n2, d), dtype=jnp.float32)
    theta = jnp.asarray([0.7, 0.3, 1.2, 0.5], jnp.float32)
    r_p = pc.corr_cross_pallas(name, x1, x2, theta)
    r_x = corr_cross(name, x1, x2, theta, None)
    np.testing.assert_allclose(
        np.asarray(r_p), np.asarray(r_x), atol=2e-6
    )


def test_pallas_gram_unaligned_shapes():
    """Shapes not multiples of the tile size pad/crop correctly."""
    x1 = jax.random.uniform(jax.random.key(2), (37, 3), dtype=jnp.float32)
    x2 = jax.random.uniform(jax.random.key(3), (41, 3), dtype=jnp.float32)
    theta = jnp.full((3,), 0.9, jnp.float32)
    r_p = pc.corr_cross_pallas("matern52", x1, x2, theta)
    assert r_p.shape == (37, 41)
    r_x = corr_cross("matern52", x1, x2, theta, None)
    np.testing.assert_allclose(np.asarray(r_p), np.asarray(r_x), atol=2e-6)
