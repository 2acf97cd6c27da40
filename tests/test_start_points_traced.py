"""Traceable MiddlePicker (ego/start_points.py middle_picker_starts_traced)
— the in-program seed generator for the fused q>1 virtual-point scan."""

import numpy as np

import jax
import jax.numpy as jnp

from egobox_tpu.ego.start_points import (
    middle_picker_starts_traced,
    start_points,
)


def _padded_design(seed, n_active, n_pad, nx):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0.0, 1.0, (n_active, nx))
    xp = np.concatenate([x, np.zeros((n_pad, nx))], axis=0)
    mask = np.arange(n_active + n_pad) < n_active
    return jnp.asarray(xp), jnp.asarray(mask)


def test_traced_picker_shapes_and_bounds():
    xp, mask = _padded_design(0, 37, 11, 3)
    lo = jnp.zeros(3)
    hi = jnp.ones(3)
    f = jax.jit(
        middle_picker_starts_traced, static_argnames=("n_start", "n_sub_max")
    )
    out = f(jax.random.key(1), xp, mask, lo, hi, n_start=6, n_sub_max=8)
    assert out.shape == (6, 3)
    a = np.asarray(out)
    assert np.all(a >= -1e-12) and np.all(a <= 1 + 1e-12)
    # seeds should not be duplicated
    assert len({tuple(np.round(r, 12)) for r in a}) == 6


def test_traced_picker_midpoints_are_pair_midpoints():
    """Every non-LHS row must be the midpoint of two active training
    points (the greedy keeps midpoints verbatim)."""
    xp, mask = _padded_design(3, 40, 8, 2)
    lo, hi = jnp.zeros(2), jnp.ones(2)
    out = np.asarray(
        middle_picker_starts_traced(
            jax.random.key(2), xp, mask, lo, hi, n_start=4, n_sub_max=8
        )
    )
    x = np.asarray(xp)[np.asarray(mask)]
    mids = (x[:, None, :] + x[None, :, :]) / 2.0
    mids = mids.reshape(-1, 2)
    n_mid = sum(
        1 for r in out if np.min(np.linalg.norm(mids - r, axis=1)) < 1e-9
    )
    # at least one midpoint must have been accepted (n_sub >= 2 pairs) —
    # the rest may be LHS completion
    assert n_mid >= 1


def test_traced_picker_greedy_matches_host_on_forced_subset():
    """With n_sub_max == nt//10 the subset differs only by rng; force a
    tiny design (nt < 20 -> n_sub = 2, one pair) where subset choice
    cannot change the single accepted midpoint's property: it is the
    midpoint of the 2 chosen points."""
    xp, mask = _padded_design(7, 12, 4, 2)
    lo, hi = jnp.zeros(2), jnp.ones(2)
    out = np.asarray(
        middle_picker_starts_traced(
            jax.random.key(5), xp, mask, lo, hi, n_start=3, n_sub_max=2
        )
    )
    x = np.asarray(xp)[np.asarray(mask)]
    mids = ((x[:, None, :] + x[None, :, :]) / 2.0).reshape(-1, 2)
    assert np.min(
        np.linalg.norm(mids - out[0][None, :], axis=1)
    ) < 1e-9


def test_host_picker_unchanged_reference_behavior():
    """Regression guard: the host start_points greedy still matches the
    documented ref behavior (closest-pair midpoint accepted first)."""
    x = np.array([[0.0, 0.0], [0.1, 0.0], [1.0, 1.0]])
    mids = start_points(x, np.zeros(2), np.ones(2))
    assert np.allclose(mids[0], [0.05, 0.0])
