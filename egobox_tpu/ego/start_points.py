"""Multistart seed selection for infill optimization.

Ports the behavior of crates/ego/src/utils/start_points.rs (midpoints between
training points that are farther from every other point) and the
MiddlePickerMultiStarter (solver_computations.rs:56-124). The greedy midpoint
scan is O(n^2) on a handful of points and inherently sequential — it stays on
host (numpy); the LHS completion is the jitted sampler.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def start_points(x: np.ndarray, xl: np.ndarray, xu: np.ndarray,
                 n_max: int | None = None) -> np.ndarray:
    """Midpoints of training-point pairs, closest pairs first, keeping a
    midpoint only if no other training point or already-kept midpoint is
    closer to it than its parents (ref: start_points.rs:7-85)."""
    x = np.asarray(x, dtype=float)
    n, d = x.shape
    xrange = np.asarray(xu, dtype=float) - np.asarray(xl, dtype=float)
    xrange = np.where(xrange == 0, 1.0, xrange)

    pairs = []
    for i in range(1, n):
        for j in range(i):
            dist = np.linalg.norm((x[i] - x[j]) / xrange)
            pairs.append((i, j, dist))
    pairs.sort(key=lambda t: t[2])

    xstart: list[np.ndarray] = []
    for i, j, _ in pairs:
        xij = (x[i] + x[j]) / 2.0
        d_ij = np.linalg.norm((x[i] - xij) / xrange)
        good = True
        for k in range(n):
            if k in (i, j):
                continue
            if np.linalg.norm((x[k] - xij) / xrange) < d_ij:
                good = False
                break
        if good:
            for xk in xstart:
                if np.linalg.norm((xk - xij) / xrange) < d_ij:
                    good = False
                    break
        if good:
            xstart.append(xij)
        if n_max is not None and len(xstart) >= n_max:
            break

    if not xstart:
        return np.zeros((0, d))
    return np.stack(xstart)


def middle_picker_starts(rng: np.random.Generator, x_train: np.ndarray,
                         xlimits: np.ndarray, n_start: int,
                         lhs_fill) -> np.ndarray:
    """MiddlePicker multistart: midpoints of a random subset of training
    points, completed with maximin LHS (ref: solver_computations.rs:62-114).

    ``lhs_fill(n)`` must return (n, nx) maximin-LHS points in xlimits.
    """
    nt = x_train.shape[0]
    n_sub = max(nt // 10, 2)
    idx = rng.permutation(nt)[:n_sub]
    mids = start_points(
        x_train[idx], xlimits[:, 0], xlimits[:, 1], n_max=n_start
    )
    missing = n_start - mids.shape[0]
    if missing <= 0:
        return mids[:n_start]
    fill = np.asarray(lhs_fill(max(missing, 3)))[:missing]
    if mids.shape[0] == 0:
        return fill
    return np.concatenate([mids, fill], axis=0)


def middle_picker_starts_traced(
    key,
    xp: jnp.ndarray,  # (nb, nx) padded training design
    mask: jnp.ndarray,  # (nb,) active rows
    lo: jnp.ndarray,  # (nx,) seed box
    hi: jnp.ndarray,
    n_start: int,
    n_sub_max: int,
):
    """Fully jit-traceable MiddlePicker (semantic mirror of
    ``middle_picker_starts`` / ``start_points`` above, ref:
    solver_computations.rs:62-114 + start_points.rs:7-85) for use INSIDE
    fused programs — the virtual-point scan of fused_select_points_q draws
    its per-step multistart seeds from the AUGMENTED DoE without a host
    roundtrip (the augmented rows only exist on device mid-scan).

    Same greedy midpoint selection on a random n_sub = clip(nt // 10, 2,
    n_sub_max) subset, completed with maximin LHS; static shapes
    throughout (pair buffers sized by ``n_sub_max``, invalid pairs masked
    to +inf in the sort). The subset draw uses the JAX key stream rather
    than the host numpy Generator, so seeds are reproducible per key but
    not bitwise identical to the host picker.
    """
    nb, nx = xp.shape
    dtype = xp.dtype
    s = int(n_sub_max)
    nt = jnp.sum(mask)
    n_sub = jnp.clip(nt // 10, 2, s)

    ksub, kfill = jax.random.split(key)
    scores = jnp.where(
        mask, jax.random.uniform(ksub, (nb,), dtype=dtype), jnp.inf
    )
    order = jnp.argsort(scores)
    sub_idx = order[:s]
    sub = xp[sub_idx]  # (s, nx)
    in_sub = (jnp.arange(s) < n_sub) & mask[sub_idx]

    xrange = jnp.where(hi - lo == 0, 1.0, hi - lo)
    subn = sub / xrange[None, :]

    iu, ju = np.triu_indices(s, k=1)  # static
    diff = subn[iu] - subn[ju]
    pd = jnp.sqrt(jnp.sum(diff * diff, axis=-1))  # (P,)
    valid = in_sub[iu] & in_sub[ju]
    porder = jnp.argsort(jnp.where(valid, pd, jnp.inf))
    pi = jnp.asarray(iu)[porder]
    pj = jnp.asarray(ju)[porder]
    mids = (sub[pi] + sub[pj]) / 2.0  # (P, nx) sorted by pair distance
    dij = pd[porder] / 2.0
    pvalid = valid[porder]

    # reject midpoints with some non-parent subset point closer than the
    # parents (vectorized: pair-independent of the greedy state)
    dist_pm = jnp.linalg.norm(
        (sub[None, :, :] - mids[:, None, :]) / xrange[None, None, :],
        axis=-1,
    )  # (P, s)
    kidx = jnp.arange(s)[None, :]
    is_parent = (kidx == pi[:, None]) | (kidx == pj[:, None])
    other_close = jnp.any(
        (dist_pm < dij[:, None]) & in_sub[None, :] & ~is_parent, axis=1
    )

    p_total = iu.shape[0]
    buf0 = jnp.zeros((n_start, nx), dtype)

    def body(p, carry):
        buf, cnt = carry
        mid = mids[p]
        d_acc = jnp.linalg.norm((buf - mid[None, :]) / xrange, axis=1)
        acc_rows = jnp.arange(n_start) < cnt
        ok = (
            pvalid[p]
            & ~other_close[p]
            & (cnt < n_start)
            & ~jnp.any((d_acc < dij[p]) & acc_rows)
        )
        buf = jnp.where(ok, buf.at[cnt].set(mid), buf)
        return buf, cnt + ok.astype(cnt.dtype)

    buf, cnt = jax.lax.fori_loop(
        0, p_total, body, (buf0, jnp.asarray(0, jnp.int32))
    )

    from ..doe.lhs import maximin_lhs

    fill = maximin_lhs(kfill, n_start, nx, False, 5, dtype)
    fill = lo[None, :] + fill * (hi - lo)[None, :]
    rows = jnp.arange(n_start)
    fill_rows = jnp.take(
        fill, jnp.clip(rows - cnt, 0, n_start - 1), axis=0
    )
    return jnp.where((rows < cnt)[:, None], buf, fill_rows)
