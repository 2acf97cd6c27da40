"""Latin Hypercube sampling, TPU-native.

Re-implements the behavior of crates/doe/src/lhs.rs (kinds Classic, Centered,
Maximin, CenteredMaximin, Optimized/ESE) on top of jax.random. The ESE
(enhanced stochastic evolutionary) maximin optimization (_maximin_ese,
lhs.rs:120-185) becomes a jit-compiled ``lax.fori_loop`` nest in which the 20
candidate swaps of each inner step are evaluated **in parallel** with vmap and
the phi_p criterion is updated incrementally (O(n) per candidate instead of
O(n^2), same math as _phip_swap lhs.rs:191-234).

All functions are deterministic under a jax.random key (threefry), so goldens
are pinned per this library (reference goldens pin Xoshiro256Plus and cannot
transfer — see SURVEY.md §4).
"""

from __future__ import annotations

import enum
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..config import default_dtype
from .utils import cdist_sq, min_pdist_sq, pdist


class LhsKind(enum.Enum):
    """ref: crates/doe/src/lhs.rs:19-33."""

    CLASSIC = "classic"
    CENTERED = "centered"
    MAXIMIN = "maximin"
    CENTERED_MAXIMIN = "centered_maximin"
    OPTIMIZED = "optimized"


# ---------------------------------------------------------------------------
# basic LHS constructions
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(1, 2, 3))
def classic_lhs(key, ns: int, nx: int, dtype=None):
    """One point uniformly inside each of ns strata, independently permuted
    per column (ref: lhs.rs:236-257)."""
    dtype = dtype or default_dtype()
    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, (ns, nx), dtype=dtype)
    strata = (jnp.arange(ns, dtype=dtype) / ns)[:, None]
    pts = strata + u / ns
    perms = jax.vmap(lambda k: jax.random.permutation(k, ns))(
        jax.random.split(k2, nx)
    )  # (nx, ns)
    return jnp.take_along_axis(pts, perms.T, axis=0)


@partial(jax.jit, static_argnums=(1, 2, 3))
def centered_lhs(key, ns: int, nx: int, dtype=None):
    """Stratum centers, independently permuted per column (ref: lhs.rs:259-274)."""
    dtype = dtype or default_dtype()
    centers = (jnp.arange(ns, dtype=dtype) + 0.5) / ns
    perms = jax.vmap(lambda k: jax.random.permutation(k, ns))(
        jax.random.split(key, nx)
    )
    return centers[perms].T


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def maximin_lhs(key, ns: int, nx: int, centered: bool = False, n_draws: int = 5,
                dtype=None):
    """Best of ``n_draws`` random LHS by min pairwise distance
    (ref: lhs.rs:276-297). The draws are vmapped — they run batched on-chip
    instead of the reference's sequential loop."""
    dtype = dtype or default_dtype()
    build = centered_lhs if centered else classic_lhs
    keys = jax.random.split(key, n_draws)
    draws = jax.vmap(lambda k: build(k, ns, nx, dtype))(keys)
    scores = jax.vmap(min_pdist_sq)(draws)
    return draws[jnp.argmax(scores)]


# ---------------------------------------------------------------------------
# ESE maximin optimization (kind = Optimized, the default)
# ---------------------------------------------------------------------------


def _phip(x, p):
    return jnp.sum(pdist(x) ** (-p)) ** (1.0 / p)


def _candidate_phip(x, phip_p, i1, i2, k, p):
    """phi_p^p after swapping entries [i1,k] <-> [i2,k], via the incremental
    update of lhs.rs:191-234 vectorized over all other rows."""
    n = x.shape[0]
    row_mask = (jnp.arange(n) != i1) & (jnp.arange(n) != i2)
    d1_sq = cdist_sq(x[i1][None, :], x)[0]  # (n,)
    d2_sq = cdist_sq(x[i2][None, :], x)[0]
    m1 = (x[:, k] - x[i1, k]) ** 2
    m2 = (x[:, k] - x[i2, k]) ** 2
    new1 = d1_sq - m1 + m2
    new2 = d2_sq + m1 - m2
    half = p / 2.0
    delta = jnp.where(
        row_mask,
        new1 ** (-half) - d1_sq ** (-half) + new2 ** (-half) - d2_sq ** (-half),
        0.0,
    ).sum()
    return phip_p + delta


def _apply_swap(x, i1, i2, k):
    v1, v2 = x[i1, k], x[i2, k]
    x = x.at[i1, k].set(v2)
    return x.at[i2, k].set(v1)


@partial(jax.jit, static_argnums=(2, 3, 4))
def maximin_ese(key, lhs0, outer_loop: int, inner_loop: int, j_range: int = 20):
    """ESE optimization of the phi_p(p=10) maximin criterion
    (ref: lhs.rs:120-185). Outer loop adapts an acceptance temperature; each
    inner step proposes ``j_range`` single-column swaps (vmapped), takes the
    best, and accepts per a simulated-annealing threshold."""
    p = 10.0
    tol = 1e-3
    n, nx = lhs0.shape
    dtype = lhs0.dtype
    phip0 = _phip(lhs0, p)
    t0 = 0.005 * phip0

    def inner_body(i, carry):
        x, phip, x_best, phip_best, n_acpt, n_imp, t, key = carry
        k = (i + 1) % nx
        key, k_i1, k_i2, k_acc = jax.random.split(key, 4)
        i1 = jax.random.randint(k_i1, (j_range,), 0, n)
        i2_raw = jax.random.randint(k_i2, (j_range,), 0, n - 1)
        i2 = jnp.where(i2_raw >= i1, i2_raw + 1, i2_raw)  # i2 != i1

        phip_p = phip**p
        cand_pp = jax.vmap(
            lambda a, b: _candidate_phip(x, phip_p, a, b, k, p)
        )(i1, i2)
        cand = jnp.maximum(cand_pp, 0.0) ** (1.0 / p)
        j = jnp.argmin(cand)
        phip_try = cand[j]

        accept = (phip_try - phip) <= t * jax.random.uniform(
            k_acc, dtype=dtype
        )
        x_new = _apply_swap(x, i1[j], i2[j], k)
        x = jnp.where(accept, x_new, x)
        phip = jnp.where(accept, phip_try, phip)
        n_acpt = n_acpt + accept.astype(dtype)

        improved = accept & (phip_try < phip_best)
        x_best = jnp.where(improved, x_new, x_best)
        n_imp = n_imp + improved.astype(dtype)
        phip_best = jnp.where(improved, phip_try, phip_best)
        return (x, phip, x_best, phip_best, n_acpt, n_imp, t, key)

    def outer_body(_, carry):
        x, phip, x_best, phip_best, t, key = carry
        zero = jnp.asarray(0.0, dtype)
        (x, phip, x_best, phip_best, n_acpt, n_imp, t, key) = lax.fori_loop(
            0, inner_loop, inner_body,
            (x, phip, x_best, phip_best, zero, zero, t, key),
        )
        p_accpt = n_acpt / inner_loop
        p_imp = n_imp / inner_loop
        # temperature schedule (ref: lhs.rs:168-182)
        exploring = (phip - phip_best) > tol
        t_explore = jnp.where(
            (p_accpt >= 0.1) & (p_imp < p_accpt),
            t * 0.8,
            jnp.where((p_accpt >= 0.1) & (p_imp >= p_accpt), t, t / 0.8),
        )
        t_exploit = jnp.where(p_accpt <= 0.1, t / 0.7, t * 0.9)
        t = jnp.where(exploring, t_explore, t_exploit)
        return (x, phip, x_best, phip_best, t, key)

    carry = (lhs0, phip0, lhs0, phip0, t0, key)
    carry = lax.fori_loop(0, outer_loop, outer_body, carry)
    return carry[2]


@partial(jax.jit, static_argnums=(1, 2, 3))
def optimized_lhs(key, ns: int, nx: int, dtype=None):
    """Classic LHS refined by ESE (the reference default kind).
    Loop sizes per lhs.rs:81-83."""
    dtype = dtype or default_dtype()
    k1, k2 = jax.random.split(key)
    lhs0 = classic_lhs(k1, ns, nx, dtype)
    if ns < 2:
        return lhs0
    outer = min(int(1.5 * nx), 30)
    inner = min(20 * nx, 100)
    return maximin_ese(k2, lhs0, max(outer, 1), inner)


# ---------------------------------------------------------------------------
# public sampler
# ---------------------------------------------------------------------------


def lhs_normalized(key, ns: int, nx: int, kind: LhsKind = LhsKind.OPTIMIZED,
                   dtype=None):
    """Sample ns points in [0,1]^nx."""
    dtype = dtype or default_dtype()
    if kind is LhsKind.CLASSIC:
        return classic_lhs(key, ns, nx, dtype)
    if kind is LhsKind.CENTERED:
        return centered_lhs(key, ns, nx, dtype)
    if kind is LhsKind.MAXIMIN:
        return maximin_lhs(key, ns, nx, False, 5, dtype)
    if kind is LhsKind.CENTERED_MAXIMIN:
        return maximin_lhs(key, ns, nx, True, 5, dtype)
    if kind is LhsKind.OPTIMIZED:
        return optimized_lhs(key, ns, nx, dtype)
    raise ValueError(f"unknown LHS kind: {kind}")


def scale_to_xlimits(samples, xlimits):
    """Affine map [0,1]^nx -> xlimits (ref: doe/src/traits.rs:30-46)."""
    lo = xlimits[:, 0]
    hi = xlimits[:, 1]
    return samples * (hi - lo) + lo


class Lhs:
    """Object API mirroring egobox_doe::Lhs (ref: doe/src/lhs.rs).

    ``xlimits`` is an (nx, 2) array of [lower, upper] rows.
    """

    def __init__(self, xlimits, kind: LhsKind = LhsKind.OPTIMIZED, seed=None):
        self.xlimits = jnp.asarray(xlimits, dtype=default_dtype())
        if self.xlimits.ndim != 2 or self.xlimits.shape[1] != 2:
            raise ValueError("xlimits must have shape (nx, 2)")
        self.kind = kind
        self._key = jax.random.key(0 if seed is None else seed)

    def normalized_sample(self, ns: int):
        self._key, sub = jax.random.split(self._key)
        return lhs_normalized(sub, ns, self.xlimits.shape[0], self.kind,
                              self.xlimits.dtype)

    def sample(self, ns: int):
        return scale_to_xlimits(self.normalized_sample(ns), self.xlimits)
